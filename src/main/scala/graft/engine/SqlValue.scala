package graft.engine

/** Client-side SQL literal rendering + query templating.
  *
  * Mirrors `TroughClient.sql_value` (reference trough/client.py:110-131)
  * and the `sql_tmpl %% tuple(...)` positional substitution
  * (trough/client.py:237-240). Spark 4 has real parameterized SQL
  * (`spark.sql(text, args)`) which the engine prefers internally; this
  * renderer exists for byte-compatibility with the reference client's
  * literal splicing (logs, recorded queries, round-trip tests).
  */
object SqlValue {

  /** Python datetime.isoformat() shape: seconds are ALWAYS present (Java's
    * LocalDateTime.toString drops ":ss" when zero — '2024-01-01T12:00' vs
    * the reference's '2024-01-01T12:00:00'), microseconds only when
    * nonzero, always 6 digits. */
  private val isoSeconds =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  private def pyIso(dt: java.time.LocalDateTime): String = {
    val base = dt.format(isoSeconds)
    if (dt.getNano == 0) base else f"$base.${dt.getNano / 1000}%06d"
  }

  /** Render one value as a SQL literal, trough-style. Unknown types throw
    * (client.py:128-131 semantics). */
  def render(x: Any): String = x match {
    case null => "null"
    case None => "null"
    case dt: java.time.LocalDateTime => s"datetime('${pyIso(dt)}')"
    case ts: java.sql.Timestamp => s"datetime('${pyIso(ts.toLocalDateTime)}')"
    case b: Boolean => if (b) "1" else "0"
    case s: String => "'" + s.replace("'", "''") + "'"
    case bs: Array[Byte] => "'" + new String(bs, "UTF-8").replace("'", "''") + "'"
    case _: Int | _: Long | _: Short | _: Byte | _: Float | _: Double |
        _: java.math.BigDecimal | _: BigDecimal => x.toString
    case other =>
      throw new IllegalArgumentException(
        s"don't know how to make an sql value from $other (${other.getClass})")
  }

  /** Positional `%s` substitution: each `%s` in the template is replaced
    * with the rendered literal for the matching parameter. `%%` escapes a
    * literal percent (Python `%`-operator semantics for the subset the
    * reference client uses). */
  def template(tmpl: String, params: Seq[Any]): String = {
    val out = new StringBuilder
    var i = 0
    var p = 0
    while (i < tmpl.length) {
      val c = tmpl.charAt(i)
      if (c == '%' && i + 1 < tmpl.length) {
        tmpl.charAt(i + 1) match {
          case 's' =>
            require(p < params.length, s"not enough parameters for template: $tmpl")
            out.append(render(params(p))); p += 1; i += 2
          case '%' => out.append('%'); i += 2
          case other =>
            throw new IllegalArgumentException(s"unsupported format directive %$other")
        }
      } else { out.append(c); i += 1 }
    }
    require(p == params.length, s"too many parameters for template: $tmpl")
    out.toString
  }
}
