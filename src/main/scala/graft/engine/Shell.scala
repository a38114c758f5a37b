package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Shell-facing facades: SHOW commands (reference `do_show`,
  * trough/shell/__init__.py:136-190) and the tabular result formatter
  * (`TroughShell.table`, shell/__init__.py:66-100) with the reference's
  * exact column-ordering rule and `<null>` rendering, plus the per-segment
  * fan-out banner (shell/__init__.py:233-240).
  */
object Shell {

  // ------------------------------------------------------------------ SHOW

  /** SHOW TABLES — the reference rewrites this to a sqlite_master SELECT;
    * ours reads the segment catalog directly. */
  def showTables(engine: TroughEngine, segmentId: String): Seq[String] =
    engine.store.tables(segmentId)

  /** SHOW CREATE TABLE — reconstructed from table metadata (the
    * round-trippable subset: types by affinity + primary key). */
  def showCreateTable(engine: TroughEngine, segmentId: String, table: String): String = {
    val meta = engine.store.tableMeta(segmentId, table)
    val cols = meta.schema.fields.map { f =>
      val sqliteType = f.dataType.typeName match {
        case "long" => "INTEGER"
        case "double" => "REAL"
        case "binary" => "BLOB"
        case _ => "TEXT"
      }
      val pkSuffix =
        if (meta.primaryKey == Seq(f.name)) {
          " PRIMARY KEY" + (if (meta.autoIncrement.contains(f.name)) " AUTOINCREMENT" else "")
        } else ""
      s"  ${f.name} $sqliteType$pkSuffix"
    }
    val tablePk =
      if (meta.primaryKey.size > 1) Seq(s"  PRIMARY KEY (${meta.primaryKey.mkString(", ")})")
      else Seq.empty
    s"CREATE TABLE $table (\n${(cols ++ tablePk).mkString(",\n")}\n)"
  }

  def showSegments(engine: TroughEngine, regex: String = ".*"): Seq[String] =
    engine.store.listSegments(regex)

  def showSchemas(engine: TroughEngine): Seq[String] = engine.schemas.list()

  // ------------------------------------------------- connections (stateful)

  /** One row of SHOW CONNECTIONS: segment id plus the engine-side analogs
    * of the reference's read/write urls — whether the segment is readable
    * (exists) and who holds its write lock (shell/__init__.py:157-172;
    * urls themselves dissolve with the HTTP topology). */
  final case class ConnectionInfo(
      segmentId: String, readable: Boolean, writeLockHolder: Option[String])

  /** Stateful shell session: a connected-segment set driving fan-out
    * selects, mirroring the reference shell's CONNECT / CONNECT MATCHING
    * / SHOW CONNECTIONS loop (shell/__init__.py:157-172, 192-212).
    * CONNECT *replaces* the set (reference semantics, not additive).
    * FORMAT TABLE|PRETTY|RAW selects the display mode (do_format,
    * shell/__init__.py:214-231). */
  final class Session(engine: TroughEngine) {
    private var connectedIds: Seq[String] = Seq.empty
    private var fmt: String = "table"

    def format: String = fmt

    /** FORMAT [table|pretty|raw] — no argument reports the current mode;
      * an unknown mode is rejected (the reference re-prints help). */
    def setFormat(arg: String): String = arg.trim.toLowerCase match {
      case "" => s"Format is '$fmt'"
      case a @ ("table" | "pretty" | "raw") => fmt = a; s"Format is now '$fmt'"
      case other =>
        throw new IllegalArgumentException(s"unknown format: $other (TABLE|PRETTY|RAW)")
    }

    /** CONNECT segment [segment...] — replaces the connected set. */
    def connect(segments: Seq[String]): Seq[String] = {
      connectedIds = segments.map(_.trim).filter(_.nonEmpty).distinct
      connectedIds
    }

    /** CONNECT MATCHING <regex> — replaces the set with matching readable
      * segments (client.read_urls_for_regex semantics). */
    def connectMatching(regex: String): Seq[String] = {
      connectedIds = engine.store.listSegments(regex).sorted
      connectedIds
    }

    def connected: Seq[String] = connectedIds

    /** SHOW CONNECTIONS — sorted by segment id like the reference. */
    def connections(): Seq[ConnectionInfo] =
      connectedIds.sorted.map { seg =>
        ConnectionInfo(seg, engine.store.segmentExists(seg), engine.writeLockHolder(seg))
      }

    /** Fan-out SELECT over the connected set (do_select → async_fanout). */
    def select(sql: String): TroughEngine#FanoutResult = {
      require(connectedIds.nonEmpty, "not connected to any segments")
      engine.fanout(connectedIds, sql)
    }
  }

  // ------------------------------------------------------------- formatter

  /** Column-width table rendering, porting the reference's ordering rule
    * exactly (shell/__init__.py:77-83): `id` first, then ascending
    * max-rendered-width with column name as tiebreak; nulls render as
    * `<null>`. Works entirely by column INDEX — duplicate result names
    * (`SELECT a.id, b.id`) are distinct columns with their own widths
    * and cells (a by-name lookup rendered the first `id` twice). */
  def table(rows: Seq[Row], schema: StructType): String = {
    require(rows.nonEmpty, "table() requires at least one row")
    val names = schema.fieldNames
    // reference cells render via python str() — repr shape for floats
    def render(v: Any): String = v match {
      case null => "<null>"
      case d: java.lang.Double => JsonShape.pyFloat(d)
      case f: java.lang.Float => JsonShape.pyFloat(f.doubleValue())
      case other => other.toString
    }
    val widths: IndexedSeq[Int] = names.indices.map { i =>
      (Seq(names(i).length) ++ rows.map(r => render(r.get(i)).length)).max
    }
    val ordered: Seq[Int] = names.indices
      .sortBy(i => if (names(i) == "id") (0, "!", i) else (widths(i), names(i), i))
    val border = "+" + ordered.map(i => "-" * (widths(i) + 2)).mkString("+") + "+\n"
    def line(vals: Seq[String]): String =
      "| " + ordered.zip(vals).map { case (i, v) => v.padTo(widths(i), ' ') }
        .mkString(" | ") + " |\n"
    val sb = new StringBuilder
    sb.append(border).append(line(ordered.map(names(_)))).append(border)
    rows.foreach { r =>
      sb.append(line(ordered.map(i => render(r.get(i)))))
    }
    sb.append(border)
    sb.toString
  }

  /** The shell's three display modes (display(), shell/__init__.py:102-124):
    * `table` renders [[table]]; `raw` is python `json.dumps(rows)` (one
    * line, `", "`/`": "` separators); `pretty` is `json.dumps(rows,
    * indent=2)`. All three print `<no results>` for an empty set. Scalar
    * rendering reuses the engine's ujson-shaped values (ensure_ascii
    * escaping — python json.dumps defaults match). */
  def display(rows: Seq[Row], schema: StructType, format: String = "table"): String =
    format match {
      // validate the format BEFORE the empty-set shortcut — an unknown
      // format must error regardless of whether the query returned rows
      case "table" | "raw" | "pretty" if rows.isEmpty => "<no results>\n"
      case "table" => table(rows, schema)
      case "raw" =>
        rows.map(r => rowJsonSpaced(r, schema, None)).mkString("[", ", ", "]") + "\n"
      case "pretty" =>
        rows.map(r => rowJsonSpaced(r, schema, Some(2)))
          .mkString("[\n", ",\n", "\n]") + "\n"
      case other =>
        throw new IllegalArgumentException(s"unknown format: $other (TABLE|PRETTY|RAW)")
    }

  /** One row as a python-json.dumps-shaped object: `", "`/`": "`
    * separators flat, or indent-aware with 2-space nesting. */
  private def rowJsonSpaced(row: Row, schema: StructType, indent: Option[Int]): String = {
    val kvs = JsonShape.fields(row, schema)
      .map { case (n, v) => JsonShape.str(n) + ": " + JsonShape.value(v) }
    indent match {
      case None => kvs.mkString("{", ", ", "}")
      case Some(n) =>
        val pad = " " * n
        val inner = " " * (2 * n)
        kvs.map(inner + _).mkString(pad + "{\n", ",\n", "\n" + pad + "}")
    }
  }

  /** Fan-out display: per-segment result blocks with the reference's
    * banner, errors reported inline without failing other segments, total
    * row count last (shell/__init__.py:233-262). `format` selects the
    * per-block display mode (table/pretty/raw — the Session's FORMAT). */
  def fanoutReport(result: TroughEngine#FanoutResult, format: String = "table"): String = {
    val sb = new StringBuilder
    result.perSegment.foreach { case (seg, rowsTry) =>
      sb.append(s"+++++ results from segment $seg +++++\n")
      rowsTry match {
        case scala.util.Success(rows) =>
          if (rows.isEmpty) sb.append("<no results>\n")
          else sb.append(display(rows, rows.head.schema, format))
        case scala.util.Failure(e) =>
          sb.append(s"error: ${e.getMessage}\n")
      }
    }
    sb.append(s"total rows: ${result.totalRows}\n")
    sb.toString
  }
}
