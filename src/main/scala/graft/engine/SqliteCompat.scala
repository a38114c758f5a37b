package graft.engine

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Concat, ConcatWs, EqualTo, Expression, FormatString, GetJsonObject, Greatest, If, IsNull, Least, Literal, Log10, Logarithm, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, Max, Min, Sum}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType}

/** SQLite dialect compat shims registered on every engine session.
  *
  * The reference delegates its entire read dialect to SQLite through
  * `cursor.execute(query)` (trough/read.py:63-67), so the SQLite builtin
  * surface its users rely on is part of the contract. This object
  * registers the SQLite names whose *semantics* Spark already has under
  * different names, plus the date/time function family
  * (`datetime`/`date`/`time`/`julianday`/`strftime` — the load-bearing
  * one: the reference client emits `datetime('<iso>')` literals,
  * client.py:114-115, and real archive queries use `strftime`
  * pervasively). Operator-level dialect differences (ASCII-nocase LIKE,
  * integer division, infix GLOB) are handled by [[SqliteDialect]]'s
  * parse-tree rewrite, not here.
  *
  * Error contract: SQLite's date/time functions return NULL on
  * unparseable input or unknown modifiers; these shims do the same
  * (golden-tested against sqlite3 in EngineSpec).
  *
  * Documented deviations (each golden-tested for the supported side):
  *  - invalid calendar dates (`'2023-02-29'`) are NULL here; SQLite
  *    accepts and echoes them without validation.
  *  - `json_extract` (single scalar path) and `->>` return TEXT for
  *    scalar matches; SQLite returns the SQL-typed value. Cast at the
  *    call site when the type matters. Same root cause: a Spark column
  *    has ONE static type, SQLite values carry a per-value storage
  *    class.
  *  - `CAST(text AS NUMERIC)` renders REAL here; SQLite folds to
  *    INTEGER when the REAL→INT conversion is lossless (lang_expr
  *    §CAST) — the same static-vs-dynamic typing boundary.
  *  - `upper`/`lower` are Spark's Unicode versions; SQLite's are
  *    ASCII-only.
  */
object SqliteCompat {

  // ------------------------------------------------------ time value core

  /** Julian Day Number of the Unix epoch (1970-01-01T00:00:00Z). */
  private val EpochJd = 2440587.5

  /** Parse a SQLite timevalue + modifiers into a UTC LocalDateTime, or
    * null where SQLite would yield NULL (bad input, unknown modifier,
    * out-of-range julian day). Numeric timevalues are julian day numbers
    * unless a `unixepoch` modifier marks them as epoch seconds — the
    * SQLite rule (sqlite.org/lang_datefunc.html). */
  def applyModifiers(s: String, modifiers: Seq[String]): LocalDateTime = {
    if (s == null) return null
    val trimmed = s.trim
    val numeric = trimmed.matches("[-+]?\\d+(\\.\\d+)?")
    val wantsEpoch = modifiers.exists(_.trim.equalsIgnoreCase("unixepoch"))
    if (wantsEpoch && !numeric) return null // SQLite: NULL, not an error
    var ldt: LocalDateTime =
      try {
        if (trimmed.equalsIgnoreCase("now")) LocalDateTime.now(ZoneOffset.UTC)
        else if (numeric && wantsEpoch) fromEpochSeconds(trimmed.toDouble)
        else if (numeric) fromJulian(trimmed.toDouble)
        else if (trimmed.matches("\\d{4}-\\d{2}-\\d{2}")) // date-only → midnight
          LocalDate.parse(trimmed).atStartOfDay
        else if (trimmed.matches("\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?")) // time-only → 2000-01-01
          LocalDateTime.parse(s"2000-01-01T$trimmed")
        else LocalDateTime.parse(trimmed.replace(" ", "T"))
      } catch { case _: Exception => return null }
    if (ldt == null) return null

    val modRe = "(?i)^([+-]?\\d+(?:\\.\\d+)?)\\s+(day|hour|minute|second|month|year)s?$".r
    val weekdayRe = "(?i)^weekday\\s+([0-6])$".r
    // same try/return-null contract as the timevalue parse above:
    // modifier arithmetic can also leave java.time's year range
    // (datetime('2024-01-01','+20000 years')) where SQLite yields NULL
    try modifiers.map(_.trim).filter(_.nonEmpty).foreach {
      case m if m.equalsIgnoreCase("unixepoch") ||
        m.equalsIgnoreCase("localtime") || m.equalsIgnoreCase("utc") => ()
      case m if m.equalsIgnoreCase("start of day") =>
        ldt = ldt.toLocalDate.atStartOfDay
      case m if m.equalsIgnoreCase("start of month") =>
        ldt = ldt.toLocalDate.withDayOfMonth(1).atStartOfDay
      case m if m.equalsIgnoreCase("start of year") =>
        ldt = ldt.toLocalDate.withDayOfYear(1).atStartOfDay
      case weekdayRe(n) =>
        // advance 0-6 days forward to the requested weekday (0=Sunday)
        val want = n.toInt
        val cur = ldt.getDayOfWeek.getValue % 7 // java: Mon=1..Sun=7 → Sun=0
        ldt = ldt.plusDays(((want - cur) % 7 + 7) % 7)
      case modRe(n, unit) =>
        val amount = n.toDouble
        val whole = amount.toLong
        val frac = amount - whole
        ldt = unit.toLowerCase match {
          case "day" => ldt.plusDays(whole).plusNanos((frac * 86400e9).round)
          case "hour" => ldt.plusHours(whole).plusNanos((frac * 3600e9).round)
          case "minute" => ldt.plusMinutes(whole).plusNanos((frac * 60e9).round)
          case "second" => ldt.plusNanos((amount * 1e9).round)
          // SQLite normalizes month/year overflow (Jan 31 + 1 month =
          // Mar 2) where java's plusMonths would clamp to Feb 29 —
          // add to the month field with day kept, then normalize by
          // day-arithmetic from the 1st
          case "month" => addMonthsSqlite(ldt, whole)
          case "year" => addMonthsSqlite(ldt, whole * 12)
        }
      case _ => return null // SQLite: unknown modifier → NULL
    } catch { case _: Exception => return null }
    // modifier arithmetic can exit SQLite's supported julian range
    // (golden: datetime('2024-01-01','+8000 years') is NULL even though
    // java.time would happily represent year 10024)
    val jd = toJulian(ldt)
    if (jd < 0 || jd > 5373484.5) return null
    ldt
  }

  private def addMonthsSqlite(ldt: LocalDateTime, months: Long): LocalDateTime = {
    val m0 = ldt.getYear.toLong * 12 + (ldt.getMonthValue - 1) + months
    val y = Math.floorDiv(m0, 12).toInt
    val m = Math.floorMod(m0, 12).toInt + 1
    LocalDate.of(y, m, 1).plusDays(ldt.getDayOfMonth - 1)
      .atTime(ldt.toLocalTime)
  }

  private def fromEpochSeconds(sec: Double): LocalDateTime = {
    val whole = math.floor(sec).toLong
    val nanos = ((sec - whole) * 1e9).round
    LocalDateTime.ofEpochSecond(whole, nanos.toInt, ZoneOffset.UTC)
  }

  /** Julian day number → UTC datetime; NULL outside SQLite's supported
    * range (0 .. 5373484.5, i.e. years -4713..9999). */
  private def fromJulian(jd: Double): LocalDateTime = {
    if (jd < 0 || jd > 5373484.5) return null
    fromEpochSeconds((jd - EpochJd) * 86400.0)
  }

  /** Fractional julian day of a UTC datetime. */
  def toJulian(ldt: LocalDateTime): Double =
    (ldt.toEpochSecond(ZoneOffset.UTC).toDouble +
      ldt.getNano / 1e9) / 86400.0 + EpochJd

  // ---------------------------------------------------- rendered functions

  def datetimeCompat(s: String): String = datetimeCompat(s, Seq.empty)

  /** `datetime(timevalue, modifier, ...)` → 'YYYY-MM-DD HH:MM:SS'. */
  def datetimeCompat(s: String, modifiers: Seq[String]): String = {
    val ldt = applyModifiers(s, modifiers)
    if (ldt == null) null
    else f"${dateStr(ldt)} ${timeStr(ldt)}"
  }

  /** `date(timevalue, ...)` → 'YYYY-MM-DD'. */
  def dateCompat(s: String, modifiers: Seq[String]): String = {
    val ldt = applyModifiers(s, modifiers)
    if (ldt == null) null else dateStr(ldt)
  }

  /** `time(timevalue, ...)` → 'HH:MM:SS'. */
  def timeCompat(s: String, modifiers: Seq[String]): String = {
    val ldt = applyModifiers(s, modifiers)
    if (ldt == null) null else timeStr(ldt)
  }

  /** `julianday(timevalue, ...)` → fractional julian day (REAL). */
  def juliandayCompat(s: String, modifiers: Seq[String]): java.lang.Double = {
    val ldt = applyModifiers(s, modifiers)
    if (ldt == null) null else toJulian(ldt)
  }

  private def dateStr(ldt: LocalDateTime): String =
    f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d"
  private def timeStr(ldt: LocalDateTime): String =
    f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"

  /** `strftime(format, timevalue, ...)` with SQLite's specifier set
    * (%d %f %H %j %J %m %M %s %S %w %W %Y %%); unknown specifiers pass
    * through literally. */
  def strftimeCompat(fmt: String, s: String, modifiers: Seq[String]): String = {
    if (fmt == null) return null
    val ldt = applyModifiers(s, modifiers)
    if (ldt == null) return null
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'd' => sb.append(f"${ldt.getDayOfMonth}%02d")
          case 'f' => sb.append(f"${ldt.getSecond}%02d.${ldt.getNano / 1000000}%03d")
          case 'H' => sb.append(f"${ldt.getHour}%02d")
          case 'j' => sb.append(f"${ldt.getDayOfYear}%03d")
          case 'J' =>
            val jd = toJulian(ldt)
            sb.append(if (jd == jd.floor) s"${jd.toLong}.0" else jd.toString)
          case 'm' => sb.append(f"${ldt.getMonthValue}%02d")
          case 'M' => sb.append(f"${ldt.getMinute}%02d")
          case 's' => sb.append(ldt.toEpochSecond(ZoneOffset.UTC).toString)
          case 'S' => sb.append(f"${ldt.getSecond}%02d")
          case 'w' => sb.append((ldt.getDayOfWeek.getValue % 7).toString)
          case 'W' =>
            // C strftime %W: Monday-first week of year, 00-53
            val mondayBased = (ldt.getDayOfWeek.getValue % 7 + 6) % 7
            sb.append(f"${(ldt.getDayOfYear - 1 + 7 - mondayBased) / 7}%02d")
          case 'Y' => sb.append(f"${ldt.getYear}%04d")
          case '%' => sb.append('%')
          case other => sb.append('%').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ----------------------------------------------------------------- glob

  /** SQLite GLOB pattern → Java regex: `*` → `.*`, `?` → `.`,
    * `[set]` / `[^set]` character classes pass through, everything else
    * is matched literally. Case-sensitive, whole-string anchored —
    * SQLite's glob semantics (unlike LIKE, which is case-insensitive). */
  def globToRegex(pattern: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          // ']' first in the set (after optional '^') is literal
          val searchFrom =
            if (i + 1 < pattern.length && pattern.charAt(i + 1) == '^') i + 3 else i + 2
          val close = pattern.indexOf(']', searchFrom)
          if (close < 0) { sb.append("\\["); }
          else {
            val body = pattern.substring(i + 1, close)
            val (neg, set) = if (body.startsWith("^")) ("^", body.drop(1)) else ("", body)
            sb.append('[').append(neg)
              .append(set.replace("\\", "\\\\")) // backslash is literal in SQLite sets
              .append(']')
            i = close
          }
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    sb.toString
  }

  /** `glob(pattern, string)` — SQLite's function form of `x GLOB y`
    * (`glob(Y, X)` ⇔ `X GLOB Y`); NULL in → NULL out. */
  def glob(pattern: String, s: String): java.lang.Boolean = {
    if (pattern == null || s == null) return null
    java.util.regex.Pattern.compile(globToRegex(pattern)).matcher(s).matches()
  }

  // ----------------------------------------------------------- registration

  private def timeFn(mode: SqliteTimeExpr.Mode)(exprs: Seq[Expression]): Expression = {
    val minArity = if (mode == SqliteTimeExpr.Strftime) 2 else 1
    require(exprs.length >= minArity, s"${mode.name} requires at least $minArity argument(s)")
    SqliteTimeExpr(mode, exprs)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def fn(name: String)(builder: Seq[Expression] => Expression): Unit =
      registry.createOrReplaceTempFunction(name, builder, "built-in")

    // --- fts5 MATCH compilation targets (Fts5.scala)
    fn("fts5_tokens") { exprs =>
      require(exprs.length == 1 || exprs.length == 2,
        "fts5_tokens takes 1 or 2 arguments")
      // optional second literal = tokenizer config: a Tok.spec string
      // (the MATCH/bm25 compilers emit fts5_tokens(col, 'spec') for
      // non-default tables) or the r11-r13 packed-int modes
      // (0 unicode61, 1 porter, 2-4 trigram variants), kept for the
      // SQL surface's backward compatibility
      val tok = exprs.lift(1).map {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType)
            if v != null =>
          Fts5.Tok.parse(v.toString)
        case Literal(v, _) if v != null && v.toString.matches("-?[0-9]+") =>
          Fts5.Tok.fromLegacy(v.toString.toInt)
        case other => throw new IllegalArgumentException(
          "fts5_tokens tokenizer must be a spec-string or integer-mode " +
            s"literal, got $other")
      }.getOrElse(Fts5.Tok.u61)
      Fts5Tokens(Cast(exprs.head, StringType), tok)
    }
    fn("fts5_match_phrase") { exprs =>
      require(exprs.length == 3, "fts5_match_phrase takes exactly 3 arguments")
      Fts5PhraseMatch(exprs(0), exprs(1), exprs(2))
    }
    fn("fts5_near") { exprs =>
      require(exprs.length == 4, "fts5_near takes exactly 4 arguments")
      Fts5NearMatch(exprs(0), exprs(1), exprs(2), exprs(3))
    }
    fn("fts5_bm25") { exprs =>
      require(exprs.length == 10, "fts5_bm25 takes exactly 10 arguments")
      // normalize the literal-folded constant children so the scorer
      // unpacks fixed primitive shapes regardless of how the dialect
      // typed the literals (ints may arrive as int or long)
      import org.apache.spark.sql.types.{ArrayType, IntegerType}
      Fts5Bm25(Seq(
        exprs(0),
        Cast(exprs(1), ArrayType(ArrayType(StringType))),
        Cast(exprs(2), ArrayType(IntegerType)),
        Cast(exprs(3), ArrayType(LongType)),
        Cast(exprs(4), ArrayType(DoubleType)),
        Cast(exprs(5), DoubleType),
        Cast(exprs(6), ArrayType(DoubleType)),
        Cast(exprs(7), ArrayType(IntegerType)),
        Cast(exprs(8), ArrayType(LongType)),
        Cast(exprs(9), ArrayType(IntegerType))))
    }
    fn("fts5_aux_text") { exprs =>
      // optional 14th argument = tokenizer spec string ([[Fts5.Tok.spec]])
      require(exprs.length == 13 || exprs.length == 14,
        "fts5_aux_text takes 13 or 14 arguments")
      import org.apache.spark.sql.types.{ArrayType, IntegerType}
      Fts5AuxText(Seq(
        Cast(exprs(0), ArrayType(StringType)),
        Cast(exprs(1), ArrayType(ArrayType(StringType))),
        Cast(exprs(2), ArrayType(IntegerType)),
        Cast(exprs(3), ArrayType(LongType)),
        Cast(exprs(4), ArrayType(IntegerType)),
        Cast(exprs(5), ArrayType(LongType)),
        Cast(exprs(6), ArrayType(IntegerType)),
        Cast(exprs(7), IntegerType),
        Cast(exprs(8), IntegerType),
        Cast(exprs(9), StringType),
        Cast(exprs(10), StringType),
        Cast(exprs(11), StringType),
        Cast(exprs(12), IntegerType)) ++
        exprs.lift(13).map(Cast(_, StringType)))
    }

    // --- date/time family: variadic like SQLite (one name, any arity)
    fn("datetime")(timeFn(SqliteTimeExpr.Datetime))
    fn("date")(timeFn(SqliteTimeExpr.Date))
    fn("time")(timeFn(SqliteTimeExpr.Time))
    fn("julianday")(timeFn(SqliteTimeExpr.Julianday))
    fn("strftime")(timeFn(SqliteTimeExpr.Strftime))

    // --- scalar min/max: SQLite's 2+-arg form is least/greatest that
    // yields NULL when ANY argument is NULL (golden-tested); 1-arg stays
    // the aggregate, so this shadows the builtins compatibly
    def scalarOrAgg(exprs: Seq[Expression], scalar: Seq[Expression] => Expression,
        agg: Expression => Expression): Expression = {
      // clean parse error, not a NoSuchElementException, on zero args
      require(exprs.nonEmpty, "min/max require at least one argument")
      if (exprs.length <= 1) agg(exprs.head)
      else If(exprs.map(IsNull(_): Expression).reduce(Or), Literal(null), scalar(exprs))
    }
    fn("min")(e => scalarOrAgg(e, Least(_), Min(_)))
    fn("max")(e => scalarOrAgg(e, Greatest(_), Max(_)))

    // --- SQLite aggregate names
    fn("group_concat") { exprs =>
      require(exprs.nonEmpty && exprs.length <= 2, "group_concat takes 1 or 2 arguments")
      val sep = if (exprs.length == 2) exprs(1) else Literal(",")
      org.apache.spark.sql.catalyst.expressions.ArrayJoin(
        CollectList(Cast(exprs.head, StringType)).toAggregateExpression(), sep, None)
    }
    fn("total") { exprs =>
      require(exprs.length == 1, "total takes exactly 1 argument")
      Coalesce(Seq(Sum(Cast(exprs.head, DoubleType)).toAggregateExpression(), Literal(0.0)))
    }

    // --- SQLite scalar names
    // the NOCASE collation's folding function (SqliteDialect.rewriteCollate
    // emits it); cast keeps non-string collated operands text-affine
    fn("ascii_lower") { exprs =>
      require(exprs.length == 1, "ascii_lower takes exactly 1 argument")
      AsciiLower(Cast(exprs.head, StringType))
    }
    fn("iif") { exprs =>
      require(exprs.length == 3, "iif takes exactly 3 arguments")
      If(Cast(exprs(0), BooleanType), exprs(1), exprs(2))
    }
    fn("typeof") { exprs =>
      require(exprs.length == 1, "typeof takes exactly 1 argument")
      SqliteTypeOf(exprs.head)
    }
    fn("quote") { exprs =>
      require(exprs.length == 1, "quote takes exactly 1 argument")
      SqliteQuote(exprs.head)
    }
    // SQLite's substr edge rules (Y=0/negative, NEGATIVE length) — the
    // substring alias arrived in SQLite 3.34
    Seq("substr", "substring").foreach { name =>
      fn(name) { exprs =>
        require(exprs.length == 2 || exprs.length == 3,
          s"$name takes (X, Y[, Z])")
        SqliteSubstr(Cast(exprs.head, StringType) +:
          exprs.tail.map(e => Cast(e, LongType): Expression))
      }
    }
    // abs dispatches on storage class (INTEGER stays INTEGER, NULL stays
    // integral-typed so enclosing integral exprs don't widen to REAL)
    fn("abs") { exprs =>
      require(exprs.length == 1, "abs takes exactly 1 argument")
      SqliteAbs(exprs.head)
    }
    // sign answers INTEGER (Spark's signum: DOUBLE) and NULL for text
    fn("sign") { exprs =>
      require(exprs.length == 1, "sign takes exactly 1 argument")
      SqliteSign(exprs.head)
    }
    // hex renders non-blobs to TEXT first and maps NULL to ''
    fn("hex") { exprs =>
      require(exprs.length == 1, "hex takes exactly 1 argument")
      SqliteHex(exprs.head)
    }
    // replace('x', '', anything) answers 'x' BEFORE the replacement
    // argument's NULL can poison it (probed); otherwise Spark's
    // codegen'd StringReplace has SQLite's semantics
    fn("replace") { exprs =>
      require(exprs.length == 3, "replace takes exactly 3 arguments")
      val Seq(x, y, z) =
        exprs.map(e => Cast(e, StringType): Expression).toSeq
      If(EqualTo(y, Literal("")), x,
        org.apache.spark.sql.catalyst.expressions.StringReplace(x, y, z))
    }

    // --- json1 names (semantics already proven via q22; these register
    // the reference-compatible NAMES for raw reads)
    fn("json_extract") { exprs =>
      require(exprs.length >= 2, "json_extract takes (json, path, ...)")
      if (exprs.length == 2) GetJsonObject(exprs(0), exprs(1))
      // multi-path form answers a JSON array of the selected nodes
      else SqliteJsonExtractMulti(Cast(exprs.head, StringType) +: exprs.tail)
    }
    fn("json_patch") { exprs =>
      require(exprs.length == 2, "json_patch takes (target, patch)")
      SqliteJsonPatch(Cast(exprs(0), StringType), Cast(exprs(1), StringType))
    }
    fn("json") { exprs =>
      require(exprs.length == 1, "json takes exactly 1 argument")
      SqliteJsonFormat(Seq(Cast(exprs.head, StringType)), "json")
    }
    fn("json_pretty") { exprs =>
      require(exprs.length == 1 || exprs.length == 2,
        "json_pretty takes (json[, indent])")
      SqliteJsonFormat(Cast(exprs.head, StringType) +: exprs.tail, "pretty")
    }
    fn("json_error_position") { exprs =>
      require(exprs.length == 1, "json_error_position takes exactly 1 argument")
      SqliteJsonFormat(Seq(Cast(exprs.head, StringType)), "error_position")
    }
    // the -> / ->> operators arrive as these calls via the dialect's
    // textual rewrite (SqliteDialect.rewriteJsonArrows)
    fn("json_arrow") { exprs =>
      require(exprs.length == 2, "json_arrow takes (json, path)")
      SqliteJsonArrow(Cast(exprs(0), StringType), exprs(1), sqlValue = false)
    }
    fn("json_arrow_text") { exprs =>
      require(exprs.length == 2, "json_arrow_text takes (json, path)")
      SqliteJsonArrow(Cast(exprs(0), StringType), exprs(1), sqlValue = true)
    }
    // json1 modification + interrogation family (Jackson-backed; every
    // behavior sqlite3-differential golden-tested in SqliteFunctionsSpec)
    Seq("set", "insert", "replace").foreach { m =>
      fn(s"json_$m") { exprs =>
        require(exprs.length >= 3 && exprs.length % 2 == 1,
          s"json_$m takes (json, path, value, ...)")
        SqliteJsonModify(Cast(exprs.head, StringType) +: exprs.tail, m)
      }
    }
    fn("json_remove") { exprs =>
      require(exprs.length >= 2, "json_remove takes (json, path, ...)")
      SqliteJsonModify(Cast(exprs.head, StringType) +: exprs.tail, "remove")
    }
    fn("json_type") { exprs =>
      require(exprs.length == 1 || exprs.length == 2, "json_type takes (json[, path])")
      SqliteJsonInfo(Cast(exprs.head, StringType) +: exprs.tail, "type")
    }
    fn("json_valid") { exprs =>
      require(exprs.length == 1, "json_valid takes exactly 1 argument")
      SqliteJsonInfo(Seq(Cast(exprs.head, StringType)), "valid")
    }
    fn("json_array_length") { exprs =>
      require(exprs.length == 1 || exprs.length == 2,
        "json_array_length takes (json[, path])")
      SqliteJsonInfo(Cast(exprs.head, StringType) +: exprs.tail, "array_length")
    }
    fn("json_quote") { exprs =>
      require(exprs.length == 1, "json_quote takes exactly 1 argument")
      SqliteJsonQuote(exprs.head)
    }
    // aggregates: build on json_quote's null-safety ('null' TEXT, never
    // SQL NULL — CollectList silently drops SQL NULLs, json1 keeps them)
    fn("json_group_array") { exprs =>
      require(exprs.length == 1, "json_group_array takes exactly 1 argument")
      Concat(Seq(Literal("["),
        org.apache.spark.sql.catalyst.expressions.ArrayJoin(
          CollectList(SqliteJsonQuote(exprs.head)).toAggregateExpression(),
          Literal(","), None),
        Literal("]")))
    }
    fn("json_group_object") { exprs =>
      require(exprs.length == 2, "json_group_object takes (name, value)")
      val pair = Concat(Seq(
        SqliteJsonQuote(Cast(exprs.head, StringType)), Literal(":"),
        SqliteJsonQuote(exprs(1))))
      Concat(Seq(Literal("{"),
        org.apache.spark.sql.catalyst.expressions.ArrayJoin(
          CollectList(pair).toAggregateExpression(), Literal(","), None),
        Literal("}")))
    }
    // kernel behind the dialect's json_each FROM-clause rewrite
    // (SqliteDialect.rewriteJsonEach); also callable directly
    fn("json_each_entries") { exprs =>
      require(exprs.length == 1 || exprs.length == 2,
        "json_each takes (json[, path])")
      SqliteJsonEachEntries(Cast(exprs.head, StringType) +: exprs.tail)
    }
    fn("json_tree_entries") { exprs =>
      require(exprs.length == 1 || exprs.length == 2,
        "json_tree takes (json[, path])")
      SqliteJsonEachEntries(Cast(exprs.head, StringType) +: exprs.tail,
        recursive = true)
    }
    fn("json_array")(exprs => SqliteJsonRender(exprs, obj = false))
    fn("json_object") { exprs =>
      require(exprs.length % 2 == 0, "json_object requires label/value pairs")
      SqliteJsonRender(exprs, obj = true)
    }

    // --- scalar-surface gaps where Spark's same-named builtin DIVERGES
    // from SQLite (each probed against the sandbox sqlite3; goldens in
    // SqliteFunctionsSpec):
    // SQLite log(X) is BASE-10 (Spark's is natural); log(B,X) is base B
    fn("log") { exprs =>
      exprs match {
        case Seq(x) => Log10(Cast(x, DoubleType))
        case Seq(b, x) => Logarithm(Cast(b, DoubleType), Cast(x, DoubleType))
        case _ => throw new IllegalArgumentException("log takes 1 or 2 arguments")
      }
    }
    // numeric truncation toward zero (Spark's trunc is DATE truncation),
    // and floor/ceil preserving the argument's storage class (Spark's
    // are always LONG; SQLite keeps REAL in → REAL out)
    Seq("trunc", "floor", "ceil", "ceiling").foreach { name =>
      val mode = if (name == "ceiling") "ceil" else name
      fn(name) { exprs =>
        require(exprs.length == 1, s"$name takes exactly 1 argument")
        SqliteRound(exprs.head, mode)
      }
    }
    // SQLite concat IGNORES null arguments (3.44); Spark's yields NULL
    fn("concat")(exprs => ConcatWs(Literal("") +: exprs))
    // multi-argument unicode CODE POINTS (Spark chr is single byte-range)
    fn("char")(exprs => SqliteChar(exprs))
    fn("unicode") { exprs =>
      require(exprs.length == 1, "unicode takes exactly 1 argument")
      SqliteUnicode(Cast(exprs.head, StringType))
    }
    // SQLite printf and its 3.38 alias — verb-by-verb evaluation
    // ([[SqlitePrintf]], r15): C-style %g zero-stripping, NULL/missing
    // arguments as 0/'', text-prefix numeric coercions, %u unsigned,
    // %c first-char, and the %q/%Q/%w SQL-escape verbs; the plain
    // %s %d %f %x %e %% behaviors delegate to Java per-verb and stay
    // golden-identical
    fn("printf")(exprs =>
      SqlitePrintf(exprs.head +: exprs.tail.map(DecimalNormalize)))
    fn("format")(exprs =>
      SqlitePrintf(exprs.head +: exprs.tail.map(DecimalNormalize)))
    // planner hints: identity pass-throughs, as in SQLite itself
    fn("likely") { exprs =>
      require(exprs.length == 1, "likely takes exactly 1 argument"); exprs.head
    }
    fn("unlikely") { exprs =>
      require(exprs.length == 1, "unlikely takes exactly 1 argument"); exprs.head
    }
    fn("likelihood") { exprs =>
      require(exprs.length == 2, "likelihood takes exactly 2 arguments"); exprs.head
    }
    // unixepoch(...) (3.38) ≡ strftime('%s', ...) as INTEGER; bare call
    // defaults to 'now' like the rest of the family
    fn("unixepoch") { exprs =>
      val args = if (exprs.isEmpty) Seq(Literal("now")) else exprs
      Cast(timeFn(SqliteTimeExpr.Strftime)(Literal("%s") +: args), LongType)
    }

    spark.udf.register("glob", (p: String, s: String) => glob(p, s))
    // SQLite random(): signed 64-bit integer (Spark's rand() is a double
    // in [0,1) — different type AND name)
    val rng = new java.security.SecureRandom()
    spark.udf.register("random", udf(() => rng.nextLong()).asNondeterministic())
    spark.udf.register("zeroblob", (n: Int) => new Array[Byte](math.max(n, 0)))
    spark.udf.register("randomblob", udf((n: Int) => {
      val b = new Array[Byte](math.max(n, 0)); rng.nextBytes(b); b
    }).asNondeterministic())
  }
}
