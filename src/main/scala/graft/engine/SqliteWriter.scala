package graft.engine

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala writer of the public SQLite database file format
  * (https://www.sqlite.org/fileformat2.html) — the inverse of
  * [[SqliteFile]], making segment migration bidirectional: a segment
  * exported here is a well-formed rowid-table database that the real
  * `sqlite3` opens, integrity-checks, and queries (the specs verify
  * exactly that), so a trough deployment can move data back out of
  * this engine without any SQLite linkage in the JVM.
  *
  * Scope mirrors the reader plus what a valid schema REQUIRES: rowid
  * table B-trees built bottom-up (packed leaves, interior levels over
  * (child, max-rowid) pairs, root pinned — the `sqlite_master` root
  * lives on page 1 by definition), record serial types chosen
  * minimally, overflow chains for payloads past the spill thresholds,
  * UTF-8 text, no freelist/WAL. A non-rowid-alias PRIMARY KEY in the
  * DDL implies a `sqlite_autoindex_<t>_1` UNIQUE index whose B-tree
  * must physically exist (`integrity_check` counts its entries), so
  * index B-trees are written too: key-record leaf cells with divider
  * entries PROMOTED into interior levels (an index entry lives exactly
  * once in the whole tree, unlike table interior keys), keys ordered
  * by SQLite's BINARY semantics (storage class rank, numeric value,
  * UTF-8 memcmp, blob memcmp, rowid tiebreak).
  */
object SqliteWriter {

  /** One table to write: `rows` must be sorted by rowid, ascending and
    * unique (the B-tree key); the rowid-alias column, if any, should
    * hold null in `values` (SQLite stores it as NULL in the record).
    * `autoIndexCols`: value indices of a non-rowid-alias PRIMARY KEY —
    * the implied `sqlite_autoindex` B-tree is built over them. */
  final case class TableData(
      name: String, ddl: String, rows: Seq[(Long, IndexedSeq[Any])],
      autoIndexCols: Seq[Int] = Nil)

  def write(path: Path, tables: Seq[TableData], pageSize: Int = 4096): Unit = {
    val w = new SqliteWriter(pageSize)
    // sqlite_master (§2.6): (type, name, tbl_name, rootpage, sql) with
    // the root pinned at page 1; a table's auto-index row follows its
    // table row with sql NULL, as SQLite itself catalogs them
    val masterRows = ArrayBuffer[IndexedSeq[Any]]()
    tables.foreach { t =>
      val root = w.buildTableTree(t.rows)
      masterRows += IndexedSeq[Any]("table", t.name, t.name, root.toLong, t.ddl)
      if (t.autoIndexCols.nonEmpty) {
        val ixRoot = w.buildIndexTree(t.rows.map { case (rowid, vals) =>
          (t.autoIndexCols.map(vals(_)) :+ rowid).toIndexedSeq
        })
        masterRows += IndexedSeq[Any](
          "index", s"sqlite_autoindex_${t.name}_1", t.name, ixRoot.toLong, null)
      }
    }
    w.buildMasterTree(masterRows.toSeq.zipWithIndex.map { case (r, i) => (i + 1L, r) })
    Files.write(path, w.render())
  }

  /** SQLite BINARY ordering over storage values (§ "Sort Order"):
    * NULL < numeric < text < blob; numerics by value across int/real;
    * text by UTF-8 memcmp (NOT String.compareTo — UTF-16 surrogate
    * order diverges above U+FFFF); blobs by unsigned memcmp. */
  private[engine] val valueOrdering: Ordering[Any] = new Ordering[Any] {
    private def rank(v: Any): Int = v match {
      case null => 0
      case _: Long | _: Double => 1
      case _: String => 2
      case _: Array[Byte] => 3
      case other => throw new IllegalArgumentException(s"unorderable: $other")
    }
    private def memcmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xFF) - (b(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    def compare(a: Any, b: Any): Int = {
      val (ra, rb) = (rank(a), rank(b))
      if (ra != rb) ra - rb
      else ra match {
        case 0 => 0
        case 1 => (a, b) match {
          case (x: Long, y: Long) => java.lang.Long.compare(x, y)
          case _ =>
            // cross-class numeric compare exact via BigDecimal (a large
            // long is not exactly representable as double)
            def bd(v: Any) = v match {
              case l: Long => java.math.BigDecimal.valueOf(l)
              case d: Double => java.math.BigDecimal.valueOf(d)
            }
            bd(a).compareTo(bd(b))
        }
        case 2 => memcmp(
          a.asInstanceOf[String].getBytes(StandardCharsets.UTF_8),
          b.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
        case _ => memcmp(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      }
    }
  }

  private[engine] val keyOrdering: Ordering[IndexedSeq[Any]] =
    (x: IndexedSeq[Any], y: IndexedSeq[Any]) => {
      var i = 0
      var r = 0
      while (r == 0 && i < math.min(x.length, y.length)) {
        r = valueOrdering.compare(x(i), y(i))
        i += 1
      }
      if (r != 0) r else x.length - y.length
    }
}

final class SqliteWriter(pageSize: Int) {
  require(pageSize >= 512 && pageSize <= 65536 && Integer.bitCount(pageSize) == 1,
    s"page size must be a power of two in [512, 65536], got $pageSize")
  private val usable = pageSize // reserved bytes = 0

  // page store, 1-indexed; page 1 reserved up front for the master root
  private val pages = ArrayBuffer[Array[Byte]](new Array[Byte](pageSize))
  private def alloc(): Int = { pages += new Array[Byte](pageSize); pages.length }

  // ------------------------------------------------------------- primitives

  private def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v < 0x80) Array(v.toByte)
    else {
      // 9-byte form when the value needs more than 8×7 bits
      val need9 = (v >>> 56) != 0 || v < 0
      if (need9) {
        val out = new Array[Byte](9)
        out(8) = v.toByte
        var x = v >>> 8
        var i = 7
        while (i >= 0) { out(i) = ((x & 0x7F) | 0x80).toByte; x >>>= 7; i -= 1 }
        out
      } else {
        val tmp = new Array[Byte](8)
        var x = v
        var n = 0
        while (x != 0) { tmp(n) = (x & 0x7F).toByte; x >>>= 7; n += 1 }
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) {
          out(i) = (tmp(n - 1 - i) | (if (i < n - 1) 0x80 else 0)).toByte
          i += 1
        }
        out
      }
    }
  }

  /** Record format (§"Record Format"): minimal serial types. Serial
    * types 8/9 (integer 0/1) require schema format ≥ 4 — the header
    * declares 4. */
  private def encodeRecord(values: Seq[Any]): Array[Byte] = {
    val parts = values.map {
      case null => (0L, Array.emptyByteArray)
      case l: Long =>
        if (l == 0) (8L, Array.emptyByteArray)
        else if (l == 1) (9L, Array.emptyByteArray)
        else {
          val width =
            if (l >= -128 && l <= 127) 1
            else if (l >= -32768 && l <= 32767) 2
            else if (l >= -(1L << 23) && l < (1L << 23)) 3
            else if (l >= Int.MinValue && l <= Int.MaxValue) 4
            else if (l >= -(1L << 47) && l < (1L << 47)) 6
            else 8
          val b = new Array[Byte](width)
          var i = 0
          while (i < width) { b(i) = (l >>> (8 * (width - 1 - i))).toByte; i += 1 }
          // serial types: widths 1,2,3,4 -> 1..4; width 6 -> 5; width 8 -> 6
          val serial = if (width <= 4) width.toLong else if (width == 6) 5L else 6L
          (serial, b)
        }
      case d: Double =>
        val b = new Array[Byte](8)
        ByteBuffer.wrap(b).putDouble(d)
        (7L, b)
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        (13L + 2L * b.length, b)
      case b: Array[Byte] => (12L + 2L * b.length, b)
      case other =>
        throw new IllegalArgumentException(
          s"cannot encode ${other.getClass.getSimpleName} as a SQLite storage class")
    }
    val typeVarints = parts.map(p => varint(p._1))
    val typesLen = typeVarints.map(_.length).sum
    // the header-size varint includes its own length — iterate to the
    // fixpoint (converges in ≤ 3 steps at the varint width boundaries)
    var headerLen = typesLen + 1
    var hl = varint(headerLen.toLong).length
    while (typesLen + hl != headerLen) {
      headerLen = typesLen + hl
      hl = varint(headerLen.toLong).length
    }
    val out = ArrayBuffer[Byte]()
    out ++= varint(headerLen.toLong)
    typeVarints.foreach(out ++= _)
    parts.foreach(out ++= _._2)
    out.toArray
  }

  private def be4(v: Int): Array[Byte] = {
    val b = new Array[Byte](4); ByteBuffer.wrap(b).putInt(v); b
  }

  /** Allocate and fill an overflow chain for `payload(local..)`;
    * returns the first chain page (each page: 4-byte next, then data). */
  private def spillChain(payload: Array[Byte], local: Int): Int = {
    val perPage = usable - 4
    val spill = payload.length - local
    val nPages = (spill + perPage - 1) / perPage
    val chain = (0 until nPages).map(_ => alloc())
    var off = local
    chain.zipWithIndex.foreach { case (pg, i) =>
      val buf = pages(pg - 1)
      ByteBuffer.wrap(buf).putInt(0, if (i == nPages - 1) 0 else chain(i + 1))
      val n = math.min(perPage, payload.length - off)
      System.arraycopy(payload, off, buf, 4, n)
      off += n
    }
    chain.head
  }

  /** §1.6 local-payload size for a page whose max embedded fraction
    * gives threshold `x`: the whole payload if it fits, else K or M. */
  private def localLen(p: Int, x: Int): Int = {
    if (p <= x) p
    else {
      val m = (usable - 12) * 32 / 255 - 23
      val k = m + ((p - m) % (usable - 4))
      if (k <= x) k else m
    }
  }

  /** Table-leaf cell: payload-len varint, rowid varint, local payload,
    * and a 4-byte first-overflow pointer when the payload spills
    * (§1.6 table-leaf threshold X = U−35, mirrored from the reader). */
  private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val p = payload.length
    val local = localLen(p, usable - 35)
    if (local == p) varint(p.toLong) ++ varint(rowid) ++ payload
    else varint(p.toLong) ++ varint(rowid) ++ payload.take(local) ++
      be4(spillChain(payload, local))
  }

  /** Index cell (leaf: no prefix; interior: 4-byte child prefix):
    * payload-len varint + local payload + overflow pointer if spilled.
    * Index pages use the 64/255 embedded-payload threshold (§1.6).
    * Sizing is separate from construction: building a cell ALLOCATES
    * its overflow chain, so speculative size checks must use
    * [[indexCellLen]] or discarded candidates would orphan pages
    * (`integrity_check` flags never-used pages). */
  private def indexCell(prefix: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    val p = payload.length
    val local = localLen(p, (usable - 12) * 64 / 255 - 23)
    if (local == p) prefix ++ varint(p.toLong) ++ payload
    else prefix ++ varint(p.toLong) ++ payload.take(local) ++
      be4(spillChain(payload, local))
  }

  private def indexCellLen(prefixLen: Int, payloadLen: Int): Int = {
    val local = localLen(payloadLen, (usable - 12) * 64 / 255 - 23)
    prefixLen + varint(payloadLen.toLong).length + local + (if (local == payloadLen) 0 else 4)
  }

  // ---------------------------------------------------------- tree building

  /** Write one B-tree page: `base` is 100 on page 1, 0 elsewhere.
    * Cells are placed back-to-front from the end of the page; the
    * pointer array (cell order = key order) follows the header. */
  private def writePage(
      pageNo: Int, base: Int, pageType: Int, cells: Seq[Array[Byte]],
      rightMost: Int = 0): Unit = {
    val interior = pageType == 2 || pageType == 5
    val headerLen = if (interior) 12 else 8 // leaves (10, 13): no right-most field
    require(base + headerLen + 2 * cells.length + cells.map(_.length).sum <= usable,
      s"page $pageNo overfull: ${cells.length} cells of ${cells.map(_.length).sum} bytes")
    val buf = pages(pageNo - 1)
    val bb = ByteBuffer.wrap(buf)
    bb.put(base, pageType.toByte)
    bb.putShort(base + 1, 0.toShort) // first freeblock
    bb.putShort(base + 3, cells.length.toShort)
    bb.put(base + 7, 0.toByte) // fragmented free bytes
    if (interior) bb.putInt(base + 8, rightMost)
    var content = usable
    cells.zipWithIndex.foreach { case (cell, i) =>
      content -= cell.length
      System.arraycopy(cell, 0, buf, content, cell.length)
      bb.putShort(base + headerLen + 2 * i, content.toShort)
    }
    // content offset 0 encodes 65536 on a cell-less 64 KiB page
    bb.putShort(base + 5, (if (content == 65536) 0 else content).toShort)
  }

  /** Greedy pack: max cells per page under the pointer-array + content
    * budget. Every cell fits alone by construction (local payload is
    * capped below usable−35). */
  private def packPages(cells: Seq[Array[Byte]], base0: Int, headerLen: Int)
      : Seq[Seq[Array[Byte]]] = {
    val budget = usable - base0 - headerLen
    val groups = ArrayBuffer[ArrayBuffer[Array[Byte]]]()
    var cur = ArrayBuffer[Array[Byte]]()
    var used = 0
    cells.foreach { c =>
      val cost = c.length + 2
      // base0 only applies to a root page; packing conservatively with
      // it keeps a single-group result valid wherever the root lands
      if (cur.nonEmpty && used + cost > budget) {
        groups += cur; cur = ArrayBuffer[Array[Byte]](); used = 0
      }
      cur += c; used += cost
    }
    groups += cur
    // an interior node must keep ≥ 2 children (a lone right-most child
    // with zero cells is degenerate); rebalance a trailing singleton
    // from the previous group when the moved cell still fits
    if (groups.length > 1 && groups.last.length == 1) {
      val prev = groups(groups.length - 2)
      val moved = prev.remove(prev.length - 1)
      if (groups.last.map(_.length + 2).sum + moved.length + 2 <= budget)
        groups.last.prepend(moved)
      else prev += moved // can't fit (huge leaf cells): put it back
    }
    groups.map(_.toSeq).toSeq
  }

  /** Build a table B-tree from (rowid, record-values) rows sorted by
    * rowid; returns the root page number. `rootAt` pins the root (page
    * 1 for sqlite_master). */
  private def buildTree(rows: Seq[(Long, IndexedSeq[Any])], rootAt: Option[Int]): Int = {
    val rootBase = if (rootAt.contains(1)) 100 else 0
    val cells = rows.map { case (rowid, vals) => leafCell(rowid, encodeRecord(vals)) }
    val keys = rows.map(_._1)
    val leafGroups = packPages(cells, rootBase, 8)
    // packPages admits a first cell unconditionally, so a single group
    // can still exceed a PINNED root's budget (page 1 loses 100 header
    // bytes a fresh page has — one near-threshold sqlite_master cell,
    // e.g. an ~8 KB DDL whose local part lands near U−35, overflows it)
    val rootFits = leafGroups.length == 1 &&
      rootBase + 8 + leafGroups.head.map(_.length + 2).sum <= usable
    if (rootFits) {
      val root = rootAt.getOrElse(alloc())
      writePage(root, if (root == 1) 100 else 0, 13, leafGroups.head)
      root
    } else {
      // multi-level: leaves on fresh pages, then interior levels over
      // (childPage, maxKeyInChild) until one node remains
      var keyIdx = 0
      var level: Seq[(Int, Long)] = leafGroups.map { g =>
        val pg = alloc()
        writePage(pg, 0, 13, g)
        keyIdx += g.length
        (pg, keys(keyIdx - 1))
      }
      if (level.length == 1) {
        // one leaf that cannot live on the pinned root: a cell-less
        // interior root pointing at it right-most — the shape SQLite's
        // own balance_deeper() produces for an overfull root page
        val root = rootAt.getOrElse(alloc())
        writePage(root, if (root == 1) 100 else 0, 5, Nil, rightMost = level.head._1)
        return root
      }
      while (level.length > 1) {
        // interior cell: 4-byte child + varint(max rowid of child);
        // the group's LAST child becomes the right-most pointer
        val interiorCells = level.map { case (child, key) =>
          val b = new Array[Byte](4); ByteBuffer.wrap(b).putInt(child)
          b ++ varint(key)
        }
        val groups = packPages(interiorCells, rootBase, 12)
        val isRootLevel = groups.length == 1
        var idx = 0
        level = groups.map { g =>
          val children = level.slice(idx, idx + g.length)
          idx += g.length
          val pg = if (isRootLevel) rootAt.getOrElse(alloc()) else alloc()
          // the group's LAST child becomes the right-most pointer; its
          // cell is dropped (per the interior-page format)
          writePage(pg, if (pg == 1) 100 else 0, 5,
            g.init, rightMost = children.last._1)
          (pg, children.last._2)
        }
      }
      level.head._1
    }
  }

  private[engine] def buildTableTree(rows: Seq[(Long, IndexedSeq[Any])]): Int = {
    require(rows.iterator.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "rows must be sorted by rowid, strictly ascending")
    buildTree(rows, rootAt = None)
  }

  private[engine] def buildMasterTree(rows: Seq[(Long, IndexedSeq[Any])]): Unit =
    buildTree(rows, rootAt = Some(1))

  /** Build an index B-tree over key tuples (last element = rowid
    * tiebreak). Unlike table trees, every entry lives exactly ONCE in
    * the whole tree: when a leaf fills, the next entry is PROMOTED to
    * become the divider cell in the parent level — and likewise
    * between interior pages, recursively. Returns the root page. */
  private[engine] def buildIndexTree(keys: Seq[IndexedSeq[Any]]): Int = {
    val payloads = keys.sorted(SqliteWriter.keyOrdering).map(encodeRecord)
    if (payloads.isEmpty) {
      val pg = alloc()
      writePage(pg, 0, 10, Nil)
      return pg
    }
    // Leaf level planned by SIZE first, cells built after: building a
    // cell allocates its overflow chain, so constructing cells for
    // entries that end up promoted would orphan pages. The structural
    // invariant is dividers == leaves − 1 (a promoted entry divides the
    // flushed leaf from the one that FOLLOWS it), which the split-on-
    // final-entry below preserves where plain promotion could not.
    val budget = usable - 8
    val ranges = ArrayBuffer[(Int, Int)]() // payload [from, until) per leaf
    val promotedIdx = ArrayBuffer[Int]() // divider payload after each leaf
    var start = 0
    var used = 0
    var i = 0
    while (i < payloads.length) {
      val cellLen = indexCellLen(0, payloads(i).length) + 2
      if (i > start && used + cellLen > budget) {
        ranges += ((start, i)); promotedIdx += i
        start = i + 1; used = 0
      } else used += cellLen
      i += 1
    }
    if (start < payloads.length) ranges += ((start, payloads.length))
    else {
      // the FINAL entry was promoted with nothing after it — a divider
      // with no following leaf leaves the tree with one divider too few
      // (f+1 children over f−1 dividers). Split the last leaf instead:
      // its final entry becomes the divider, the promoted entry becomes
      // the right-most leaf, restoring dividers == leaves − 1.
      val p = promotedIdx.remove(promotedIdx.length - 1)
      val (s, e) = ranges.remove(ranges.length - 1)
      require(e - s >= 2, "index leaf underflow (cell larger than half a page?)")
      ranges += ((s, e - 1))
      promotedIdx += (e - 1)
      ranges += ((p, payloads.length))
    }
    val leafPages: Seq[Int] = ranges.toSeq.map { case (s, e) =>
      val pg = alloc()
      writePage(pg, 0, 10,
        (s until e).map(j => indexCell(Array.emptyByteArray, payloads(j))))
      pg
    }
    val promoted: Seq[Array[Byte]] = promotedIdx.toSeq.map(payloads(_))

    // interior levels: children c_0..c_n with dividers d_i between c_i
    // and c_{i+1}; a page over [a..b] stores cells (c_i, d_i) for
    // i<b, right-most c_b, and promotes d_b to the level above
    var children: Seq[Int] = leafPages
    var divs: Seq[Array[Byte]] = promoted
    while (children.length > 1) {
      val ibudget = usable - 12
      // group children into ranges first so the trailing range can be
      // rebalanced to ≥ 2 children (a cell-less interior page with
      // only a right-most pointer is degenerate)
      val ranges = ArrayBuffer[(Int, Int)]()
      var a = 0
      while (a < children.length) {
        var b = a
        var iused = 0
        var fits = true
        while (fits && b + 1 < children.length) {
          val cellLen = indexCellLen(4, divs(b).length) + 2
          if (iused + cellLen > ibudget) fits = false
          else { iused += cellLen; b += 1 }
        }
        ranges += ((a, b))
        a = b + 1
      }
      if (ranges.length > 1 && ranges.last._1 == ranges.last._2) {
        val (pa, pb) = ranges(ranges.length - 2)
        ranges(ranges.length - 2) = (pa, pb - 1)
        ranges(ranges.length - 1) = (pb, ranges.last._2)
      }
      val nextChildren = ArrayBuffer[Int]()
      val nextDivs = ArrayBuffer[Array[Byte]]()
      ranges.foreach { case (ra, rb) =>
        val cells = (ra until rb).map(j => indexCell(be4(children(j)), divs(j)))
        val pg = alloc()
        writePage(pg, 0, 2, cells, rightMost = children(rb))
        nextChildren += pg
        if (rb < children.length - 1) nextDivs += divs(rb) // promote
      }
      children = nextChildren.toSeq
      divs = nextDivs.toSeq
    }
    children.head
  }

  // ---------------------------------------------------------------- render

  /** Assemble the file: 100-byte header (§1.3) into page 1, then all
    * pages in order. */
  private[engine] def render(): Array[Byte] = {
    val h = ByteBuffer.wrap(pages(0))
    h.put(0, "SQLite format 3".getBytes(StandardCharsets.ISO_8859_1) :+ 0.toByte)
    h.putShort(16, (if (pageSize == 65536) 1 else pageSize).toShort)
    h.put(18, 1.toByte) // write version: legacy journal
    h.put(19, 1.toByte) // read version
    h.put(20, 0.toByte) // reserved bytes per page
    h.put(21, 64.toByte) // max embedded payload fraction (must be 64)
    h.put(22, 32.toByte) // min embedded payload fraction (must be 32)
    h.put(23, 32.toByte) // leaf payload fraction (must be 32)
    h.putInt(24, 1) // file change counter
    h.putInt(28, pages.length) // database size in pages
    h.putInt(32, 0) // freelist trunk
    h.putInt(36, 0) // freelist count
    h.putInt(40, 1) // schema cookie
    h.putInt(44, 4) // schema format (4: serial types 8/9 allowed)
    h.putInt(48, 0) // default page cache size
    h.putInt(52, 0) // largest root page (auto-vacuum off)
    h.putInt(56, 1) // text encoding: UTF-8
    h.putInt(60, 0) // user version
    h.putInt(64, 0) // incremental vacuum
    h.putInt(68, 0) // application id
    h.putInt(92, 1) // version-valid-for (= change counter)
    h.putInt(96, 3040001) // sqlite version number stamp
    val out = new Array[Byte](pages.length * pageSize)
    pages.zipWithIndex.foreach { case (p, i) =>
      System.arraycopy(p, 0, out, i * pageSize, pageSize)
    }
    out
  }
}
