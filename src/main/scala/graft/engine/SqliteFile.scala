package graft.engine

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.Path

/** Read-only parser of the public SQLite database file format
  * (https://www.sqlite.org/fileformat2.html) — header page, table B-tree
  * interior/leaf pages, varints, record serial types, overflow-page
  * chains, UTF-8/UTF-16 text encodings.
  *
  * Why it exists: the reference's entire data universe is `.sqlite`
  * segment files (`Segment.local_path()` = `{LOCAL_DATA}/{id}.sqlite`,
  * /root/reference/trough/sync.py:237-240; HDFS listings filter
  * `*.sqlite`, sync.py:365-369). A real deployment switching to this
  * engine must bulk-load that data, and no JDBC driver is resolvable in
  * this build — so the stable, documented on-disk format is parsed
  * directly. Scope is exactly what ingest needs: rowid table B-trees
  * ([[rows]]) and the index-B-tree storage of WITHOUT ROWID tables
  * ([[indexRows]]). The freelist, secondary-index trees, and pointer-map
  * pages carry no row data and are skipped.
  *
  * A non-empty `-wal` sidecar (fileformat2.html §WAL) is applied as a
  * PAGE OVERLAY: committed frames supersede main-file pages, exactly
  * as SQLite's own reader recovers an uncheckpointed database — a
  * trough write node can crash with every recent transaction only in
  * the WAL (the main file may not even contain the schema yet), and
  * ingest must see what `sqlite3` would see. Frames after the last
  * valid commit (torn tail, stale post-checkpoint frames with old
  * salts, checksum breaks) are ignored per the recovery algorithm; a
  * malformed WAL HEADER is a clean error.
  *
  * Memory shape: pages are read on demand through a [[PageSource]] —
  * a positioned-read seam over either a local NIO channel or any Hadoop
  * filesystem (hdfs://, s3a://, file:// — how executor tasks reach the
  * reference's HDFS migration universe) —
  * one page resident per walk step plus the overflow chain of the
  * current cell — so a segment file never needs to fit in driver
  * memory (the WAL overlay keeps only a page→offset map, one entry per
  * distinct committed page). The row walk is a lazy iterator for the
  * same reason.
  */
object SqliteFile {

  /** One row of `sqlite_master` (fileformat2.html §2.6: the schema table
    * rooted at page 1 with columns type, name, tbl_name, rootpage, sql). */
  final case class MasterRow(
      tpe: String, name: String, tblName: String, rootPage: Int, sql: String)

  // built as text + explicit NUL: a raw 0x00 in the string literal
  // would make git/diff tools treat this source file as binary
  private val Magic =
    "SQLite format 3".getBytes(StandardCharsets.ISO_8859_1) :+ 0.toByte

  def open(path: Path): SqliteFile =
    new SqliteFile(SqlitePageStore.Local(path))

  /** Scheme-aware open: a bare POSIX path reads through NIO; a
    * scheme-qualified URI (`hdfs://`, `s3a://`, `file://`) reads through
    * the Hadoop FileSystem API with `conf` — the form executor tasks use
    * for the reference's HDFS migration universe (sync.py:365-369).
    * Sidecars resolve through the same access path as the main file. */
  def open(path: String, conf: org.apache.hadoop.conf.Configuration): SqliteFile =
    new SqliteFile(SqlitePageStore.forPath(path, conf))

  /** Decode a big-endian varint (fileformat2.html §"Variable-length
    * integers"): 1–8 bytes of 7 value bits each, a 9th byte contributing
    * all 8 bits. Returns (value, bytesConsumed). */
  private[engine] def varint(buf: ByteBuffer, at: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = buf.get(at + i) & 0xFF
      v = (v << 7) | (b & 0x7F)
      i += 1
      if ((b & 0x80) == 0) return (v, i)
    }
    ((v << 8) | (buf.get(at + 8) & 0xFF), 9)
  }

  /** WITHOUT ROWID tables are stored as index B-trees keyed on the
    * PRIMARY KEY; only the DDL text says which shape a table uses.
    * Table options after the closing paren form a comma-separated list
    * in EITHER order ("WITHOUT ROWID, STRICT" / "STRICT, WITHOUT
    * ROWID"), so the token is matched anywhere in that list, not only
    * as a suffix. */
  def isWithoutRowid(sql: String): Boolean =
    sql != null && {
      val tail = sql.lastIndexOf(')') match {
        case -1 => "" // no column list ⇒ no option list (CREATE TABLE t AS …)
        case i => sql.substring(i + 1)
      }
      tail.toUpperCase.split(',')
        .exists(_.replaceAll("\\s+", " ").trim == "WITHOUT ROWID")
    }

  /** Byte length of a record value for a serial type (§"Record Format"). */
  private[engine] def serialLen(t: Long): Int = t match {
    case 0 | 8 | 9 => 0
    case 1 => 1
    case 2 => 2
    case 3 => 3
    case 4 => 4
    case 5 => 6
    case 6 | 7 => 8
    case 10 | 11 =>
      throw new IllegalArgumentException(s"reserved serial type $t in record")
    case n => ((n - 12) / 2).toInt
  }
}

final class SqliteFile private (store: SqlitePageStore) extends AutoCloseable {
  import SqliteFile._

  private val path: String = store.describe
  private val channel: PageSource = store.openMain()

  // ---- 100-byte header (fileformat2.html §1.3) ----
  // Creation-time invariants (magic, page size, reserved bytes) come
  // from the MAIN file's header: SQLite forbids changing page geometry
  // in WAL mode, so these never live only in the WAL. Mutable header
  // state (text encoding) is re-read through the overlay below — page 1
  // itself can be superseded by a WAL frame.
  private val header: ByteBuffer = {
    val b = ByteBuffer.allocate(100)
    if (channel.read(b, 0L) < 100)
      throw new IllegalArgumentException(s"$path is too small to be a SQLite database")
    b.flip(); b
  }
  {
    val magic = new Array[Byte](16)
    header.get(0, magic)
    require(java.util.Arrays.equals(magic, Magic),
      s"$path is not a SQLite database (bad magic)")
  }
  /** Page size: u16 at offset 16; the value 1 encodes 65536. Validated
    * here so a corrupt header is a descriptive error, not a divide-by-
    * zero downstream. */
  val pageSize: Int = {
    val raw = header.getShort(16) & 0xFFFF
    val size = if (raw == 1) 65536 else raw
    require(size >= 512 && size <= 65536 && Integer.bitCount(size) == 1,
      s"$path: invalid page size $size in header (corrupt database)")
    size
  }
  private val reservedBytes: Int = header.get(20) & 0xFF
  /** Bytes of each page usable for cell content (§1.3.2). */
  private val usableSize: Int = pageSize - reservedBytes

  /** Committed-frame overlay from a `-wal` sidecar, if one is present
    * with at least one committed transaction (§WAL). */
  private val wal: Option[WalOverlay] = WalOverlay.open(store, pageSize)

  /** Pre-image overlay from a HOT `-journal` sidecar (§The Rollback
    * Journal): the database crashed mid-transaction in rollback mode,
    * and the journaled originals + truncation restore the last
    * committed state — what `sqlite3` itself would recover on open. */
  private val journal: Option[JournalOverlay] = JournalOverlay.open(store, pageSize)
  if (wal.nonEmpty && journal.nonEmpty)
    throw new IllegalArgumentException(
      s"$path has BOTH a committed WAL and a hot rollback journal — " +
        "a database is in one journal mode at a time (corrupt sidecars)")
  journal.filter(_.dbSize == 0).foreach { _ =>
    throw new IllegalArgumentException(
      s"$path: hot journal rolls back to an EMPTY database (the crash " +
        "interrupted initial creation); nothing to ingest")
  }

  override def close(): Unit = {
    channel.close()
    wal.foreach(_.close())
    journal.foreach(_.close())
  }

  /** Pages in the database: after the last WAL commit the authoritative
    * size is that commit's db-size field (the main file can be SHORTER
    * — pages past its end exist only as WAL frames); under a hot
    * rollback journal it is the FIRST journal header's pre-transaction
    * size (pages appended by the interrupted transaction don't exist —
    * rollback truncates them); otherwise by main file size (header
    * page-count fields may be stale in legacy files). */
  private val pageCount: Long =
    wal.map(_.dbSize.toLong)
      .orElse(journal.map(_.dbSize.toLong))
      .getOrElse(channel.size / pageSize)

  /** Corruption guards shared by both walks. Depth first: a cycle only
    * ever DEEPENS these walks (they descend on every page transition),
    * so a depth bound fails in O(1) time and memory — before a cyclic
    * multi-GB file can OOM the frame stack or overflow the JVM stack.
    * A valid SQLite B-tree is a few levels deep (fan-out ≥ 4 even on
    * 512-byte pages ⇒ depth ≤ ~16 at the 2^48-page format limit); 64
    * is comfortably past any legal file. The visited bound catches
    * non-deepening corruption (many cells aimed at the same subtree). */
  private val MaxTreeDepth = 64
  private def checkWalkBounds(depth: Int, visited: Long): Unit = {
    if (depth > MaxTreeDepth)
      throw new IllegalArgumentException(
        s"B-tree deeper than $MaxTreeDepth levels: cyclic child pointers " +
          "(corrupt database)")
    if (visited > pageCount + 1)
      throw new IllegalArgumentException(
        s"B-tree walk visited more pages than the file holds ($pageCount): " +
          "duplicated child pointers (corrupt database)")
  }

  /** Read page `n` (1-based), preferring the WAL overlay: the latest
    * committed frame for a page supersedes the main file. One
    * allocation per call — the walk holds at most one tree page plus
    * overflow pages of the current cell. */
  private def page(n: Int): ByteBuffer = {
    require(n >= 1, s"bad page number $n")
    require(n <= pageCount,
      s"bad page number $n: past the end of the ${pageCount}-page database")
    val b = ByteBuffer.allocate(pageSize)
    val read = wal.flatMap(_.frameOffset(n)) match {
      case Some(off) => wal.get.read(b, off)
      case None => journal.flatMap(_.preImageOffset(n)) match {
        // the journaled ORIGINAL supersedes whatever the interrupted
        // transaction left in the main file
        case Some(off) => journal.get.read(b, off)
        case None => channel.read(b, (n.toLong - 1) * pageSize)
      }
    }
    require(read == pageSize, s"truncated read of page $n (got $read of $pageSize bytes)")
    b.flip(); b
  }

  /** Text encoding: u32 at 56 — 1 UTF-8, 2 UTF-16le, 3 UTF-16be
    * (§1.3.7). 0 appears in zero-table databases that never stored
    * text. Read through the overlay: the encoding is set when the
    * FIRST table is created, which may have happened entirely inside
    * the WAL (a freshly-created WAL-mode database's main file is one
    * encoding-0 header page). */
  private val charset: java.nio.charset.Charset = page(1).getInt(56) match {
    case 0 | 1 => StandardCharsets.UTF_8
    case 2 => StandardCharsets.UTF_16LE
    case 3 => StandardCharsets.UTF_16BE
    case other => throw new IllegalArgumentException(s"unknown text encoding $other")
  }

  // ------------------------------------------------------------ B-tree walk

  /** All rows of the table B-tree rooted at `root`, in rowid order:
    * (rowid, decoded record values). Lazy — rows decode as consumed. */
  def rows(root: Int): Iterator[(Long, IndexedSeq[Any])] = new Iterator[(Long, IndexedSeq[Any])] {
    // explicit page stack instead of recursion: segment files can nest a
    // few levels, but the iterator must be resumable between next() calls
    private final case class Frame(pg: ByteBuffer, base: Int, cells: Int, var next: Int,
        rightMost: Int, leaf: Boolean)
    // corruption guards — see checkWalkBounds: the stack depth (one
    // Frame + page buffer per level) is what a cycle grows, so it is
    // checked against the O(1) depth bound at every push
    private var framesOpened = 0L
    private var stack: List[Frame] = List(frame(root, 1))

    private def frame(pageNo: Int, depth: Int): Frame = {
      framesOpened += 1
      checkWalkBounds(depth, framesOpened)
      val pg = page(pageNo)
      // page 1 carries the 100-byte file header before its b-tree header
      val base = if (pageNo == 1) 100 else 0
      val tpe = pg.get(base) & 0xFF
      tpe match {
        case 5 => // interior table page: 12-byte header, right-most pointer at +8
          Frame(pg, base, pg.getShort(base + 3) & 0xFFFF, 0, pg.getInt(base + 8), leaf = false)
        case 13 => // leaf table page: 8-byte header
          Frame(pg, base, pg.getShort(base + 3) & 0xFFFF, 0, 0, leaf = true)
        case 2 | 10 =>
          throw new IllegalArgumentException(
            "index B-tree page encountered where a rowid table was expected " +
              "(WITHOUT ROWID tables walk via indexRows)")
        case other =>
          throw new IllegalArgumentException(s"unknown B-tree page type $other")
      }
    }

    private def cellPointer(f: Frame, i: Int): Int = {
      val headerLen = if (f.leaf) 8 else 12
      f.pg.getShort(f.base + headerLen + 2 * i) & 0xFFFF
    }

    /** Advance until the top of the stack is a leaf with a cell left. */
    private def descend(): Unit = {
      var done = false
      while (!done) stack match {
        case Nil => done = true
        case f :: rest if f.leaf =>
          if (f.next < f.cells) done = true
          else stack = rest
        case f :: rest =>
          if (f.next < f.cells) {
            // interior table cell: 4-byte left-child page, then key varint
            val child = f.pg.getInt(cellPointer(f, f.next))
            f.next += 1
            stack = frame(child, rest.length + 2) :: f :: rest
          } else if (f.next == f.cells) {
            f.next += 1
            stack = frame(f.rightMost, rest.length + 2) :: f :: rest
          } else stack = rest
      }
    }

    def hasNext: Boolean = { descend(); stack.nonEmpty }

    def next(): (Long, IndexedSeq[Any]) = {
      if (!hasNext) throw new NoSuchElementException
      val f = stack.head
      val at = cellPointer(f, f.next)
      f.next += 1
      // leaf table cell: payload-length varint, rowid varint, payload
      val (payloadLen, n1) = varint(f.pg, at)
      val (rowid, n2) = varint(f.pg, at + n1)
      val payload = readPayload(f.pg, at + n1 + n2, payloadLen)
      (rowid, decodeRecord(payload))
    }
  }

  /** All entries of the INDEX B-tree rooted at `root`, in key order —
    * the storage shape of WITHOUT ROWID tables. Unlike table trees,
    * interior cells carry REAL entries (the divider between their left
    * child's subtree and the rest), so the walk is a full in-order
    * traversal: child₀, cell₀, child₁, cell₁, …, right-most child.
    * Index pages use the 64/255 embedded-payload threshold. Eager per
    * call (recursion keeps the code honest; WITHOUT ROWID segments are
    * small by the same argument as every other segment). */
  def indexRows(root: Int): Seq[IndexedSeq[Any]] = {
    val out = scala.collection.mutable.ArrayBuffer[IndexedSeq[Any]]()
    var visited = 0L
    // depth rides the recursion (checkWalkBounds trips long before the
    // JVM stack would — a cycle deepens every call)
    def walk(pageNo: Int, depth: Int): Unit = {
      visited += 1
      checkWalkBounds(depth, visited)
      val pg = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val tpe = pg.get(base) & 0xFF
      val cells = pg.getShort(base + 3) & 0xFFFF
      val headerLen = if (tpe == 2) 12 else 8
      def cellAt(i: Int): Int = pg.getShort(base + headerLen + 2 * i) & 0xFFFF
      tpe match {
        case 10 =>
          (0 until cells).foreach { i =>
            val at = cellAt(i)
            val (len, n) = varint(pg, at)
            out += decodeRecord(readPayload(pg, at + n, len, indexThreshold))
          }
        case 2 =>
          (0 until cells).foreach { i =>
            val at = cellAt(i)
            walk(pg.getInt(at), depth + 1) // left child first (in-order)
            val (len, n) = varint(pg, at + 4)
            out += decodeRecord(readPayload(pg, at + 4 + n, len, indexThreshold))
          }
          walk(pg.getInt(base + 8), depth + 1) // right-most child
        case 5 | 13 =>
          throw new IllegalArgumentException(
            "table B-tree page encountered where an index was expected")
        case other =>
          throw new IllegalArgumentException(s"unknown B-tree page type $other")
      }
    }
    walk(root, 1)
    out.toSeq
  }

  private def indexThreshold: Int = (usableSize - 12) * 64 / 255 - 23

  /** Assemble a cell payload, following the overflow chain when the
    * payload spills (§1.6: table-leaf threshold X = U-35 by default,
    * index pages pass their 64/255 threshold; M = (U-12)*32/255-23,
    * K = M + (P-M) mod (U-4); local part is K if K<=X else M, and a
    * 4-byte first-overflow-page pointer follows the local bytes). */
  private def readPayload(
      pg: ByteBuffer, at: Int, payloadLen: Long, threshold: Int = -1): ByteBuffer = {
    val u = usableSize
    val x = if (threshold >= 0) threshold else u - 35
    if (payloadLen <= x) {
      val out = new Array[Byte](payloadLen.toInt)
      pg.get(at, out)
      ByteBuffer.wrap(out)
    } else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + ((payloadLen - m) % (u - 4)).toInt
      val local = if (k <= x) k else m
      val out = new Array[Byte](payloadLen.toInt)
      pg.get(at, out, 0, local)
      var copied = local
      var overflow = pg.getInt(at + local)
      while (copied < payloadLen) {
        require(overflow != 0,
          s"overflow chain ended after $copied of $payloadLen payload bytes")
        val op = page(overflow)
        val chunk = math.min(u - 4, (payloadLen - copied).toInt)
        op.get(4, out, copied, chunk)
        copied += chunk
        overflow = op.getInt(0)
      }
      ByteBuffer.wrap(out)
    }
  }

  /** Decode a record (§"Record Format"): header-size varint, serial-type
    * varints, then the body. NULL→null, ints→Long, float→Double,
    * text→String (file encoding), blob→Array[Byte]. */
  private def decodeRecord(payload: ByteBuffer): IndexedSeq[Any] = {
    val (headerLen, n0) = varint(payload, 0)
    var at = n0
    val types = Vector.newBuilder[Long]
    while (at < headerLen) {
      val (t, n) = varint(payload, at)
      types += t
      at += n
    }
    var body = headerLen.toInt
    types.result().map { t =>
      val len = serialLen(t)
      val v: Any = t match {
        case 0 => null
        case 8 => 0L
        case 9 => 1L
        case 7 => payload.getDouble(body)
        case n if n >= 1 && n <= 6 => // big-endian two's-complement int of `len` bytes
          var acc = payload.get(body).toLong // sign-extends
          var i = 1
          while (i < len) { acc = (acc << 8) | (payload.get(body + i) & 0xFFL); i += 1 }
          acc
        case n if n >= 12 && n % 2 == 0 =>
          val bytes = new Array[Byte](len)
          payload.get(body, bytes)
          bytes
        case n if n >= 13 =>
          val bytes = new Array[Byte](len)
          payload.get(body, bytes)
          new String(bytes, charset)
      }
      body += len
      v
    }
  }

  // -------------------------------------------------------------- catalog

  /** The schema table: `sqlite_master` rows, decoded from the table
    * B-tree rooted at page 1. Record shape (type, name, tbl_name,
    * rootpage, sql); `rootpage`/`sql` are NULL for entries with no
    * storage (views, auto-indexes on expressions). */
  def master: Seq[MasterRow] =
    rows(1).map { case (_, vals) =>
      def str(i: Int): String = vals.lift(i).orNull match {
        case s: String => s
        case null => null
        case other => other.toString
      }
      val root = vals.lift(3).orNull match {
        case l: Long => l.toInt
        case _ => 0
      }
      MasterRow(str(0), str(1), str(2), root, str(4))
    }.toSeq

  /** User tables: type='table', not SQLite-internal (`sqlite_sequence`
    * et al.). Both storage shapes are readable: rowid tables via
    * [[rows]], WITHOUT ROWID tables (see [[SqliteFile.isWithoutRowid]])
    * via [[indexRows]]. Virtual tables (CREATE VIRTUAL TABLE — FTS,
    * rtree, …) are cataloged with type='table' but carry NO storage of
    * their own (rootpage 0); they are excluded so the storage-carrying
    * tables of such a file — including a vtab's shadow tables — still
    * ingest instead of the whole file aborting on a bad page number. */
  def userTables: Seq[MasterRow] =
    master.filter(m => m.tpe == "table" && !m.name.startsWith("sqlite_") &&
      m.rootPage >= 2)
}

private[engine] object WalOverlay {
  /** Open the `-wal` sidecar of the store's database if it exists with
    * at least one COMMITTED frame; `None` for absent, empty, or
    * checkpointed-and-reset WALs (header only / no valid commit —
    * nothing supersedes the main file then). A malformed header or
    * geometry mismatch throws. */
  def open(store: SqlitePageStore, pageSize: Int): Option[WalOverlay] =
    store.openSidecar("-wal", minBytes = 32).flatMap { src =>
      val o = new WalOverlay(src, store.sidecarName("-wal"), pageSize)
      if (o.frames.isEmpty) { o.close(); None } else Some(o)
    }
}

/** Write-ahead-log reader (fileformat2.html §WAL): 32-byte header, then
  * frames of 24-byte header + one page image. Recovery semantics match
  * SQLite's own: frames are valid while their salts equal the header
  * salts and the CUMULATIVE checksum (seeded by the header checksum)
  * holds; the scan stops at the first invalid frame, and only frames up
  * to the last valid COMMIT record (non-zero db-size field) overlay the
  * database — a torn tail or an uncommitted trailing transaction is
  * invisible, exactly as it is to `sqlite3`. */
private[engine] final class WalOverlay(
    ch: PageSource, walPath: String, pageSize: Int) extends AutoCloseable {

  private def be32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xFFL) << 24) | ((b(at + 1) & 0xFFL) << 16) |
      ((b(at + 2) & 0xFFL) << 8) | (b(at + 3) & 0xFFL)

  /** The WAL checksum (§WAL "Checksum Algorithm"): a running pair over
    * 32-bit words — s0 += x(i) + s1; s1 += x(i+1) + s0 — with the WORD
    * byte order chosen by the magic's low bit. Stored checksum VALUES
    * are always big-endian. `len` must be a multiple of 8. */
  private def checksum(
      b: Array[Byte], off: Int, len: Int, in0: Long, in1: Long,
      bigEndianWords: Boolean): (Long, Long) = {
    def word(at: Int): Long =
      if (bigEndianWords) be32(b, at)
      else ((b(at + 3) & 0xFFL) << 24) | ((b(at + 2) & 0xFFL) << 16) |
        ((b(at + 1) & 0xFFL) << 8) | (b(at) & 0xFFL)
    var s0 = in0
    var s1 = in1
    var i = off
    val end = off + len
    while (i < end) {
      s0 = (s0 + word(i) + s1) & 0xFFFFFFFFL
      s1 = (s1 + word(i + 4) + s0) & 0xFFFFFFFFL
      i += 8
    }
    (s0, s1)
  }

  private def readFully(buf: Array[Byte], at: Long): Unit = {
    val bb = ByteBuffer.wrap(buf)
    var off = at
    while (bb.hasRemaining) {
      val n = ch.read(bb, off)
      require(n > 0, s"$walPath: truncated read at offset $off")
      off += n
    }
  }

  /** page number → file offset of the LATEST committed frame's page
    * image, plus the database size (in pages) after the last commit. */
  val (frames: Map[Int, Long], dbSize: Int) = {
    val hdr = new Array[Byte](32)
    readFully(hdr, 0L)
    val magic = be32(hdr, 0)
    if (magic != 0x377F0682L && magic != 0x377F0683L)
      throw new IllegalArgumentException(
        s"$walPath: bad WAL magic 0x${magic.toHexString} (corrupt WAL header)")
    val bigEndianWords = magic == 0x377F0683L
    val version = be32(hdr, 4)
    if (version != 3007000L)
      throw new IllegalArgumentException(
        s"$walPath: unsupported WAL format version $version")
    val walPageSize = be32(hdr, 8)
    if (walPageSize != pageSize)
      throw new IllegalArgumentException(
        s"$walPath: WAL page size $walPageSize != database page size $pageSize")
    val salt1 = be32(hdr, 16)
    val salt2 = be32(hdr, 20)
    var (s0, s1) = checksum(hdr, 0, 24, 0L, 0L, bigEndianWords)
    if (s0 != be32(hdr, 24) || s1 != be32(hdr, 28))
      throw new IllegalArgumentException(
        s"$walPath: WAL header checksum mismatch (corrupt WAL header)")

    val frameSize = 24L + pageSize
    val total = ch.size
    val committed = scala.collection.mutable.Map[Int, Long]()
    val pending = scala.collection.mutable.Map[Int, Long]()
    var size = 0
    var off = 32L
    val f = new Array[Byte](24 + pageSize)
    var valid = true
    while (valid && off + frameSize <= total) {
      readFully(f, off)
      // stale frames (post-checkpoint reuse) carry old salts; a torn
      // write breaks the cumulative checksum — either ends the scan
      if (be32(f, 8) != salt1 || be32(f, 12) != salt2) valid = false
      else {
        val (t0, t1) = checksum(f, 0, 8, s0, s1, bigEndianWords)
        val (u0, u1) = checksum(f, 24, pageSize, t0, t1, bigEndianWords)
        if (u0 != be32(f, 16) || u1 != be32(f, 20)) valid = false
        else {
          s0 = u0; s1 = u1
          val pgno = be32(f, 0)
          require(pgno >= 1 && pgno <= Int.MaxValue.toLong,
            s"$walPath: bad page number $pgno in WAL frame")
          pending.put(pgno.toInt, off + 24)
          val commitSize = be32(f, 4)
          if (commitSize != 0) { // commit record: publish the transaction
            committed ++= pending
            pending.clear()
            size = commitSize.toInt
          }
          off += frameSize
        }
      }
    }
    (committed.toMap, size)
  }

  def frameOffset(pgno: Int): Option[Long] = frames.get(pgno)

  def read(dst: ByteBuffer, at: Long): Int = ch.read(dst, at)

  override def close(): Unit = ch.close()
}

private[engine] object JournalOverlay {
  // d9 d5 05 f9 20 a1 63 d7 (fileformat2.html §The Rollback Journal)
  private val Magic =
    Array(0xd9, 0xd5, 0x05, 0xf9, 0x20, 0xa1, 0x63, 0xd7).map(_.toByte)

  /** Open the `-journal` sidecar of `dbPath` if it is HOT: present,
    * and its first header carries the journal magic. A journal left
    * behind by `journal_mode=PERSIST` after a clean commit has its
    * header zeroed and is correctly ignored (`None`), as is an empty
    * or truncated-below-header file. */
  def open(store: SqlitePageStore, pageSize: Int): Option[JournalOverlay] =
    store.openSidecar("-journal", minBytes = 28).flatMap { ch =>
      val head = ByteBuffer.allocate(8)
      val ok = ch.read(head, 0L) == 8 &&
        java.util.Arrays.equals(head.array(), Magic)
      if (!ok) { ch.close(); None }
      else Some(new JournalOverlay(store.sidecarName("-journal"), ch, pageSize))
    }
}

/** Hot rollback-journal reader (fileformat2.html §The Rollback Journal):
  * the journal holds PRE-IMAGES of every page about to be modified, so
  * recovering a database that crashed mid-transaction means (a) serving
  * each journaled page's ORIGINAL content over the main file and (b)
  * truncating to the pre-transaction page count from the first header
  * (pages appended during the transaction have no pre-image — undoing
  * the append IS the truncation). This matches SQLite's own playback:
  * segments of `sector-size`-aligned headers (magic, record count,
  * checksum nonce, initial db size, sector size, page size) each
  * followed by records of (page#, page image, checksum); playback walks
  * records while checksums hold and stops at the first invalid header
  * or record, exactly as `sqlite3` treats a torn journal tail. A record
  * count of 0xFFFFFFFF means read-to-EOF (written under
  * `synchronous=OFF`). The FIRST pre-image of a page wins — within one
  * transaction SQLite journals a page once, but a later segment's
  * re-journaled copy must never override the original. */
private[engine] final class JournalOverlay(
    path: String, ch: PageSource, pageSize: Int) extends AutoCloseable {

  private def readFully(buf: Array[Byte], at: Long): Boolean = {
    val bb = ByteBuffer.wrap(buf)
    var off = at
    while (bb.hasRemaining) {
      val n = ch.read(bb, off)
      if (n <= 0) return false
      off += n
    }
    true
  }

  /** page number → journal-file offset of its pre-image, plus the
    * database size in pages BEFORE the interrupted transaction. */
  val (preImages: Map[Int, Long], dbSize: Int) = {
    val total = ch.size
    val found = scala.collection.mutable.Map[Int, Long]()
    var initialDbSize = -1
    val hdr = new Array[Byte](28)
    val rec = new Array[Byte](4 + pageSize + 4)
    var off = 0L
    var live = true
    while (live && off + 28 <= total && readFully(hdr, off)) {
      val bb = ByteBuffer.wrap(hdr)
      val magicOk = (0 until 8).forall(i => hdr(i) == JournalOverlay.Magic(i))
      if (!magicOk) live = false // zero-padding or garbage: end of journal
      else {
        val nRec = bb.getInt(8) // -1 (0xFFFFFFFF) = read to EOF
        val cksumInit = bb.getInt(12)
        val hdrDbSize = bb.getInt(16)
        val sectorSize = bb.getInt(20)
        val hdrPageSize = bb.getInt(24)
        // geometry sanity — SQLite stops playback on a header it cannot
        // trust rather than guessing at record boundaries
        if (sectorSize < 32 || sectorSize > 65536 ||
            Integer.bitCount(sectorSize) != 1 ||
            (hdrPageSize != pageSize && hdrPageSize != 0)) live = false
        else {
          if (initialDbSize < 0) initialDbSize = hdrDbSize
          var recOff = off + sectorSize // the header owns a full sector
          var i = 0
          var segmentLive = true
          while (segmentLive && (nRec == -1 || i < nRec)) {
            if (recOff + rec.length > total || !readFully(rec, recOff)) {
              segmentLive = false; live = false // torn tail
            } else {
              val rb = ByteBuffer.wrap(rec)
              val pgno = rb.getInt(0)
              // pager_cksum: nonce + every 200th byte from the tail
              var ck = cksumInit
              var j = pageSize - 200
              while (j > 0) { ck += rec(4 + j) & 0xFF; j -= 200 }
              if (pgno < 1 || ck != rb.getInt(4 + pageSize)) {
                segmentLive = false; live = false // invalid record
              } else {
                if (!found.contains(pgno)) found(pgno) = recOff + 4
                recOff += rec.length
                i += 1
              }
            }
          }
          // next segment header sits at the next sector boundary
          if (live)
            off = ((recOff + sectorSize - 1) / sectorSize) * sectorSize
        }
      }
    }
    (found.toMap, math.max(initialDbSize, 0))
  }

  def preImageOffset(pgno: Int): Option[Long] = preImages.get(pgno)

  def read(dst: ByteBuffer, at: Long): Int = ch.read(dst, at)

  override def close(): Unit = ch.close()
}
