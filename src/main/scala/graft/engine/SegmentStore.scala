package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import com.fasterxml.jackson.databind.ObjectMapper

/** Partitioned storage for trough segments.
  *
  * A *segment* (reference trough/sync.py:179-253 — one SQLite file, the
  * unit of sharding/replication/locking) maps to one directory of
  * per-table parquet data:
  *
  * {{{ dataRoot/<segmentId>/<table>/meta.json   # schema + pk + autoincrement
  *     dataRoot/<segmentId>/<table>/data/       # parquet files }}}
  *
  * Scale: a directory-per-segment layout is exactly a hive-partitioned
  * table keyed on segment_id — executors read only the segments a query
  * names (partition pruning), and a 1000-node cluster splits segments by
  * the same directory boundaries. Trough's placement ring / replication
  * (sync.py:511-650) dissolves into the durable store; what this class
  * keeps is the *observable* lifecycle: provision / promote (durable
  * copy with the `._COPYING_` → rename convention, sync.py:1129-1146) /
  * delete-refuses-while-locked (sync.py:452-456) / cold read-only tier
  * (sync.py:218-224, 693-697).
  */
object SegmentStore {
  final case class TableMeta(
      schema: StructType, primaryKey: Seq[String], autoIncrement: Option[String])
}

class SegmentStore(
    val spark: SparkSession,
    val dataRoot: String,
    val coldRoot: Option[String] = None,
    val coldPredicate: String => Boolean = _ => false) {
  import SegmentStore.TableMeta

  private val mapper = new ObjectMapper()

  /** Per-segment monitor serializing directory swaps with the read-side
    * crash self-heal: without it the mid-swap state (data absent,
    * data_old present) is indistinguishable from a crash, and a
    * concurrent read restoring data_old would make the in-flight
    * data_tmp→data rename throw, leaving a multi-table transaction
    * partially swapped. Scope: mutual exclusion is PER INSTANCE (a JVM
    * monitor) — concurrent writers must share one SegmentStore, which
    * is the single-writer-per-segment model the engine enforces via
    * write locks anyway (reference sync.py's one-writer placement).
    * Entries are removed in [[deleteSegment]]. */
  private val swapLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def swapLock(segmentId: String): Object =
    swapLocks.computeIfAbsent(segmentId, _ => new Object)

  // ------------------------------------------------------------------ paths

  def isCold(segmentId: String): Boolean = coldPredicate(segmentId)

  private def rootFor(segmentId: String): Path = {
    val root = if (isCold(segmentId)) {
      coldRoot.getOrElse(
        throw new IllegalStateException(s"segment $segmentId is cold but no cold root configured"))
    } else dataRoot
    Paths.get(root, segmentId)
  }

  private def tableDir(segmentId: String, table: String): Path =
    rootFor(segmentId).resolve(table)

  // -------------------------------------------------------------- lifecycle

  def segmentExists(segmentId: String): Boolean = Files.isDirectory(rootFor(segmentId))

  /** All known segment ids (hot + cold tiers). */
  def listSegments(): Seq[String] = {
    def ls(root: String): Seq[String] = {
      val p = Paths.get(root)
      if (!Files.isDirectory(p)) Seq.empty
      else {
        val stream = Files.list(p)
        try stream.iterator.asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString).toSeq
        finally stream.close() // directory streams leak fds until GC otherwise
      }
    }
    (ls(dataRoot) ++ coldRoot.toSeq.flatMap(ls)).distinct.sorted
  }

  /** Segment discovery by regex — reference `readable_segments(regex)`
    * (trough/client.py:203-218) / shell `CONNECT MATCHING`. Resolved
    * driver-side so downstream reads prune to exactly these directories. */
  def listSegments(regex: String): Seq[String] = {
    val p = java.util.regex.Pattern.compile(regex)
    listSegments().filter(id => p.matcher(id).find())
  }

  /** Create the segment and apply its schema DDL if absent (idempotent —
    * reference Segment.provision_local_segment, sync.py:243-251). */
  def provision(segmentId: String, schemaSql: String): Unit = {
    if (isCold(segmentId))
      throw new IllegalStateException(
        s"cannot provision segment $segmentId: cold storage is read-only")
    if (!segmentExists(segmentId)) {
      Files.createDirectories(rootFor(segmentId))
      SqlScript.split(schemaSql).foreach { stmt =>
        SqlScript.firstWord(stmt) match {
          case "CREATE" if stmt.toUpperCase.matches("(?s)\\s*CREATE\\s+(UNIQUE\\s+)?INDEX.*") =>
            () // indexes are physical hints; parquet+Catalyst has its own
          case "CREATE" =>
            val td = SqliteDdl.parseCreateTable(stmt)
            createTable(segmentId, td.name, TableMeta(td.schema, td.primaryKey, td.autoIncrement),
              failIfExists = !td.ifNotExists)
          case "" => ()
          case other =>
            throw new IllegalArgumentException(s"schema sql must be DDL, got: $other")
        }
      }
    }
  }

  /** Drop the whole segment (reference "shred", sync.py:439-509). The
    * caller (engine) enforces refuse-while-write-locked. */
  def deleteSegment(segmentId: String): Unit = {
    val dir = rootFor(segmentId)
    if (Files.isDirectory(dir)) deleteRecursively(dir)
    // drop the segment's swap monitor with it — long-lived stores cycling
    // many segments would otherwise grow this map without bound (the
    // lock's mutual exclusion is per-instance; see swapLocks scaladoc)
    swapLocks.remove(segmentId)
  }

  /** Durable copy of every table of a segment, with the temp-name-then-
    * rename convention the reference uses for HDFS promotion
    * (`foo._COPYING_` → `foo`, sync.py:1129-1146; same idea as Hadoop
    * output committers). Returns the remote segment path. */
  def promote(segmentId: String, durableRoot: String): String = {
    val src = rootFor(segmentId)
    require(Files.isDirectory(src), s"segment $segmentId does not exist")
    val dstFinal = Paths.get(durableRoot, segmentId)
    val dstTmp = Paths.get(durableRoot, segmentId + "._COPYING_")
    if (Files.exists(dstTmp)) deleteRecursively(dstTmp)
    copyRecursively(src, dstTmp)
    if (Files.exists(dstFinal)) deleteRecursively(dstFinal)
    Files.move(dstTmp, dstFinal, StandardCopyOption.ATOMIC_MOVE)
    dstFinal.toString
  }

  // ----------------------------------------------------------------- tables

  /** Visible tables of a segment. Visibility is keyed on meta.json
    * presence, NOT the bare directory: prepareTableData creates the
    * directory (and data_tmp) for in-transaction CREATEs *before* the
    * commit point, and meta.json lands only at swap time — so a crash
    * between prepare and swap must leave the half-prepared dir
    * invisible (readers would otherwise see a phantom table whose
    * loadTable throws, and a retried CREATE would refuse with "already
    * exists"), upholding WriteTxn's aborts-leave-no-visible-change
    * contract. */
  def tables(segmentId: String): Seq[String] = {
    val dir = rootFor(segmentId)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator.asScala
        .filter(p => Files.isRegularFile(p.resolve("meta.json")))
        .map(_.getFileName.toString).toSeq.sorted
      finally stream.close()
    }
  }

  /** meta.json-keyed, like [[tables]] — a half-prepared dir is not a table. */
  def tableExists(segmentId: String, table: String): Boolean =
    Files.isRegularFile(tableDir(segmentId, table).resolve("meta.json"))

  def tableMeta(segmentId: String, table: String): TableMeta = {
    val metaPath = tableDir(segmentId, table).resolve("meta.json")
    val node = mapper.readTree(Files.readString(metaPath))
    TableMeta(
      DataType.fromJson(node.get("schema").asText()).asInstanceOf[StructType],
      (0 until node.get("pk").size()).map(node.get("pk").get(_).asText()),
      if (node.hasNonNull("autoIncrement")) Some(node.get("autoIncrement").asText()) else None)
  }

  def createTable(
      segmentId: String, table: String, meta: TableMeta, failIfExists: Boolean): Unit = {
    val dir = tableDir(segmentId, table)
    // existence = visibility (meta.json), not the bare dir: a leftover
    // half-prepared dir from an aborted transaction must not block a
    // retried CREATE — create through it (stale data_tmp is overwritten
    // by the next prepare; createDirectories is idempotent)
    if (tableExists(segmentId, table)) {
      if (failIfExists)
        throw new IllegalStateException(s"table $table already exists")
      return
    }
    Files.createDirectories(dir.resolve("data"))
    writeMeta(segmentId, table, meta)
  }

  private def writeMeta(segmentId: String, table: String, meta: TableMeta): Unit = {
    val root = mapper.createObjectNode()
    root.put("schema", meta.schema.json)
    val pk = root.putArray("pk")
    meta.primaryKey.foreach(pk.add)
    meta.autoIncrement match {
      case Some(c) => root.put("autoIncrement", c)
      case None => root.putNull("autoIncrement")
    }
    Files.writeString(tableDir(segmentId, table).resolve("meta.json"), root.toString)
  }

  /** Read a table; explicit schema from meta.json so empty tables (no
    * parquet files yet) still resolve. `session` lets callers bind the
    * scan into an isolated child session (per-read temp view scoping). */
  def loadTable(segmentId: String, table: String,
      session: SparkSession = spark): DataFrame = {
    val meta = tableMeta(segmentId, table)
    val dir = tableDir(segmentId, table)
    // crash recovery: replaceTableData's swap has a window between
    // moving data→data_old and data_tmp→data; if a crash landed there,
    // serve (and restore) the previous committed state. Taken under the
    // segment's swap lock: with an in-flight swap serialized out, the
    // (data absent, data_old present) state can only mean a crash.
    if (!Files.isDirectory(dir.resolve("data"))) swapLock(segmentId).synchronized {
      if (!Files.isDirectory(dir.resolve("data")) && Files.isDirectory(dir.resolve("data_old")))
        Files.move(dir.resolve("data_old"), dir.resolve("data"), StandardCopyOption.ATOMIC_MOVE)
    }
    session.read.schema(meta.schema).parquet(dir.resolve("data").toString)
  }

  /** Atomically replace a table's data: write to a temp dir, then swap
    * directories. Segments are small by design (reference README.rst:23-25)
    * so a partition rewrite is the intended cost model for UPDATE/DELETE
    * over immutable parquet. */
  def replaceTableData(
      segmentId: String, table: String, df: DataFrame, newMeta: Option[TableMeta] = None): Unit = {
    prepareTableData(segmentId, table, df)
    swapPreparedData(segmentId, table, newMeta)
  }

  /** Phase 1 of the replace: write the new data to `data_tmp`. Any
    * failure here leaves the live `data` dir untouched (a stale tmp dir
    * is overwritten by the next prepare). Split out so a multi-table
    * transaction can prepare every table before swapping any —
    * shrinking the non-atomic window from "all parquet writes" to "a
    * few directory renames" (WriteTxn.commit). Creates the table dir on
    * demand so tables CREATEd inside the transaction can be prepared
    * before any storage-visible create happens. */
  def prepareTableData(segmentId: String, table: String, df: DataFrame): Unit = {
    val dir = tableDir(segmentId, table)
    Files.createDirectories(dir)
    val tmp = dir.resolve("data_tmp")
    if (Files.exists(tmp)) deleteRecursively(tmp)
    df.write.mode("overwrite").parquet(tmp.toString)
  }

  /** Phase 2: swap `data_tmp` into place (per-segment lock — see
    * [[swapLock]]). The data→data_old / data_tmp→data rename pair has a
    * crash window with no `data` dir; loadTable self-heals from
    * `data_old` if it finds that state. A table with no live `data` dir
    * yet (first commit after an in-transaction CREATE) degenerates to a
    * single rename. */
  def swapPreparedData(
      segmentId: String, table: String, newMeta: Option[TableMeta] = None): Unit =
    swapLock(segmentId).synchronized {
      val dir = tableDir(segmentId, table)
      val old = dir.resolve("data_old")
      if (Files.exists(old)) deleteRecursively(old)
      if (Files.isDirectory(dir.resolve("data"))) {
        Files.move(dir.resolve("data"), old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(dir.resolve("data_tmp"), dir.resolve("data"), StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
      } else {
        Files.move(dir.resolve("data_tmp"), dir.resolve("data"), StandardCopyOption.ATOMIC_MOVE)
      }
      newMeta.foreach(writeMeta(segmentId, table, _))
    }

  def dropTable(segmentId: String, table: String): Unit = {
    val dir = tableDir(segmentId, table)
    if (!tableExists(segmentId, table)) // phantom dirs are not tables
      throw new IllegalStateException(s"no such table: $table")
    deleteRecursively(dir)
  }

  // ------------------------------------------------------------------ utils

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator.asScala.foreach(deleteRecursively)
      finally stream.close()
    }
    Files.deleteIfExists(p)
  }

  private def copyRecursively(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    val stream = Files.walk(src)
    try stream.iterator.asScala.foreach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
    } finally stream.close()
  }
}
