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
    * CONNECT *replaces* the set (reference semantics, not additive). */
  final class Session(engine: TroughEngine) {
    private var connectedIds: Seq[String] = Seq.empty

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
    * `<null>`. */
  def table(rows: Seq[Row], schema: StructType): String = {
    require(rows.nonEmpty, "table() requires at least one row")
    val names = schema.fieldNames.toSeq
    def render(v: Any): String = if (v == null) "<null>" else v.toString
    val maxLengths: Map[String, Int] = names.map { n =>
      val idx = names.indexOf(n)
      n -> (Seq(n.length) ++ rows.map(r => render(r.get(idx)).length)).max
    }.toMap
    val ordered = names.sortBy(k => if (k == "id") (0, "!") else (maxLengths(k), k))
    val border = "+" + ordered.map(k => "-" * (maxLengths(k) + 2)).mkString("+") + "+\n"
    def line(vals: Seq[String]): String =
      "| " + ordered.zip(vals).map { case (k, v) => v.padTo(maxLengths(k), ' ') }
        .mkString(" | ") + " |\n"
    val sb = new StringBuilder
    sb.append(border).append(line(ordered)).append(border)
    rows.foreach { r =>
      sb.append(line(ordered.map(k => render(r.get(names.indexOf(k))))))
    }
    sb.append(border)
    sb.toString
  }

  /** Fan-out display: per-segment result blocks with the reference's
    * banner, errors reported inline without failing other segments, total
    * row count last (shell/__init__.py:233-262). */
  def fanoutReport(result: TroughEngine#FanoutResult): String = {
    val sb = new StringBuilder
    result.perSegment.foreach { case (seg, rowsTry) =>
      sb.append(s"+++++ results from segment $seg +++++\n")
      rowsTry match {
        case scala.util.Success(rows) =>
          if (rows.isEmpty) sb.append("<no results>\n")
          else sb.append(table(rows, rows.head.schema))
        case scala.util.Failure(e) =>
          sb.append(s"error: ${e.getMessage}\n")
      }
    }
    sb.append(s"total rows: ${result.totalRows}\n")
    sb.toString
  }
}
