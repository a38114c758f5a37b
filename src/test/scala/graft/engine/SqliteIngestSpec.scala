package graft.engine

import java.nio.file.{Files, Path}

import scala.sys.process._

import graft.SparkSpecBase

/** Native `.sqlite` segment ingest: fixtures are generated with the
  * sandbox's real sqlite3 CLI, so every byte the [[SqliteFile]] reader
  * parses was written by SQLite itself — header, B-tree pages, varints,
  * record serial types, overflow chains, both text encodings. */
class SqliteIngestSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-sqlite-ingest").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  /** Run a SQL script through the sqlite3 CLI into a fresh db file. The
    * script goes in via stdin as UTF-8 bytes — argv would be re-encoded
    * with the platform charset (ASCII in this container), mangling
    * non-ASCII fixture text before SQLite ever saw it. */
  private def makeDb(name: String, sql: String): Path = {
    val dir = Files.createTempDirectory("sqlite-fixture")
    val db = dir.resolve(s"$name.sqlite")
    val rc = SqliteCli.run(db.toString, sql)
    assert(rc == 0, s"sqlite3 exited $rc")
    db
  }

  test("reference test shape round-trips byte-exactly through read() (test_read.py:21-27)") {
    // the reference's own read-test DDL + row
    val db = makeDb("refshape",
      "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4));" +
        "INSERT INTO test (test) VALUES ('test');")
    val tables = engine.store.ingestSqliteSegment(db.toString, "ref-shape")
    assert(tables == Seq("test"))
    // identical wire JSON to a natively-provisioned segment (test_read.py:36-57)
    val json = engine.resultJson(engine.read("ref-shape", "SELECT * FROM test;"))
    assert(json == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("multi-table db: all five storage classes decode to the declared affinities") {
    val db = makeDb("classes",
      """CREATE TABLE vals (id INTEGER PRIMARY KEY, i INTEGER, r REAL, t TEXT, b BLOB);
        |INSERT INTO vals VALUES (1, 0, 1.5, 'héllo', X'DEADBEEF');
        |INSERT INTO vals VALUES (2, 1, -2.25, '', X'');
        |INSERT INTO vals VALUES (3, NULL, NULL, NULL, NULL);
        |INSERT INTO vals VALUES (4, 127, 3e18, 'x', NULL);          -- 1-byte int
        |INSERT INTO vals VALUES (5, -129, 0.0, 'y', NULL);          -- 2-byte int
        |INSERT INTO vals VALUES (6, 40000, 0.0, 'z', NULL);         -- 3-byte int
        |INSERT INTO vals VALUES (7, 2147483647, 0.0, 'w', NULL);    -- 4-byte int
        |INSERT INTO vals VALUES (8, 140737488355327, 0.0, 'v', NULL); -- 6-byte int
        |INSERT INTO vals VALUES (9, 9223372036854775807, 0.0, 'u', NULL); -- 8-byte int
        |INSERT INTO vals VALUES (10, -9223372036854775808, 0.0, 's', NULL);
        |CREATE TABLE other (k INTEGER PRIMARY KEY, name TEXT);
        |INSERT INTO other VALUES (7, 'seven');""".stripMargin)
    val tables = engine.store.ingestSqliteSegment(db.toString, "classes")
    assert(tables.sorted == Seq("other", "vals"))
    val rows = engine.read("classes", "SELECT * FROM vals ORDER BY id;").collect()
    assert(rows.length == 10)
    val r1 = rows(0)
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 0L && r1.getDouble(2) == 1.5)
    assert(r1.getString(3) == "héllo")
    assert(r1.getAs[Array[Byte]](4).toSeq ==
      Array(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte).toSeq)
    assert(rows(1).getDouble(2) == -2.25 && rows(1).getString(3) == "")
    assert(rows(1).getAs[Array[Byte]](4).length == 0)
    assert((0 to 4).forall(rows(2).isNullAt)== false) // id materialized from rowid
    assert(rows(2).getLong(0) == 3L && rows(2).isNullAt(1) && rows(2).isNullAt(3))
    // integer width ladder incl. Long.MinValue/MaxValue
    assert(rows(3).getLong(1) == 127L && rows(4).getLong(1) == -129L)
    assert(rows(5).getLong(1) == 40000L && rows(6).getLong(1) == 2147483647L)
    assert(rows(7).getLong(1) == 140737488355327L)
    assert(rows(8).getLong(1) == Long.MaxValue && rows(9).getLong(1) == Long.MinValue)
    assert(rows(3).getDouble(2) == 3e18)
    val other = engine.read("classes", "SELECT * FROM other;").collect()
    assert(other.head.getLong(0) == 7L && other.head.getString(1) == "seven")
  }

  test("overflow-page TEXT reassembles across the chain") {
    // default 4096-byte pages; 100 kB of text spans ~25 overflow pages
    val big = "abcdefghij" * 10000
    val db = makeDb("overflow",
      s"CREATE TABLE doc (id INTEGER PRIMARY KEY, body TEXT);" +
        s"INSERT INTO doc VALUES (1, '$big');" +
        s"INSERT INTO doc VALUES (2, 'small');")
    engine.store.ingestSqliteSegment(db.toString, "overflow")
    val rows = engine.read("overflow", "SELECT id, length(body) AS n, body FROM doc ORDER BY id;")
      .collect()
    assert(rows(0).getInt(1) == 100000)
    assert(rows(0).getString(2) == big) // content, not just length
    assert(rows(1).getString(2) == "small")
  }

  test("multi-page B-tree (interior pages) walks every leaf in rowid order") {
    // 512-byte pages force a multi-level table B-tree at 5000 rows
    val inserts = (1 to 5000).map(i => s"($i, 'name-$i', ${i * 2})").mkString(",")
    val db = makeDb("btree",
      "PRAGMA page_size=512;" +
        "CREATE TABLE big (id INTEGER PRIMARY KEY, name TEXT, v INTEGER);" +
        s"INSERT INTO big VALUES $inserts;")
    engine.store.ingestSqliteSegment(db.toString, "btree")
    val rows = engine.read("btree",
      "SELECT count(*) AS n, sum(v) AS s, min(id) AS lo, max(id) AS hi FROM big;").collect()
    assert(rows.head.getLong(0) == 5000L)
    assert(rows.head.getLong(1) == 5000L * 5001L) // sum(2i) = n(n+1)
    assert(rows.head.getLong(2) == 1L && rows.head.getLong(3) == 5000L)
    val spot = engine.read("btree", "SELECT name FROM big WHERE id = 4321;").collect()
    assert(spot.head.getString(0) == "name-4321")
  }

  test("UTF-16 encoded database text decodes correctly") {
    val db = makeDb("utf16",
      "PRAGMA encoding='UTF-16le';" +
        "CREATE TABLE t (id INTEGER PRIMARY KEY, s TEXT);" +
        "INSERT INTO t VALUES (1, 'ascii'), (2, 'späß — 日本語');")
    engine.store.ingestSqliteSegment(db.toString, "utf16")
    val rows = engine.read("utf16", "SELECT s FROM t ORDER BY id;").collect()
    assert(rows(0).getString(0) == "ascii")
    assert(rows(1).getString(0) == "späß — 日本語")
  }

  test("table-constraint rowid alias: PRIMARY KEY(x) over an INTEGER column materializes x") {
    // both alias spellings store NULL in the record slot; missing the
    // table-constraint form would silently ingest the key column as
    // all NULLs. 'INT PRIMARY KEY' (inexact type name) is NOT an alias
    // and keeps its record values.
    val db = makeDb("aliasforms",
      "CREATE TABLE tc (x INTEGER, v TEXT, PRIMARY KEY (x));" +
        "INSERT INTO tc VALUES (10, 'ten'), (20, 'twenty');" +
        "CREATE TABLE nonalias (y INT PRIMARY KEY, v TEXT);" +
        "INSERT INTO nonalias VALUES (77, 'a'), (3, 'b');")
    engine.store.ingestSqliteSegment(db.toString, "aliasforms")
    val tc = engine.read("aliasforms", "SELECT x, v FROM tc ORDER BY x;").collect()
    assert(tc.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((10L, "ten"), (20L, "twenty")))
    val na = engine.read("aliasforms", "SELECT y, v FROM nonalias ORDER BY y;").collect()
    assert(na.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((3L, "b"), (77L, "a")))
  }

  test("rows predating ALTER TABLE ADD COLUMN read the missing slot as null") {
    val db = makeDb("altered",
      "CREATE TABLE t (id INTEGER PRIMARY KEY, a TEXT);" +
        "INSERT INTO t VALUES (1, 'old');" + // 2-column record on disk
        "ALTER TABLE t ADD COLUMN b INTEGER;" +
        "INSERT INTO t VALUES (2, 'new', 42);") // 3-column record
    engine.store.ingestSqliteSegment(db.toString, "altered")
    val rows = engine.read("altered", "SELECT id, a, b FROM t ORDER BY id;").collect()
    assert(rows(0).getString(1) == "old" && rows(0).isNullAt(2))
    assert(rows(1).getString(1) == "new" && rows(1).getLong(2) == 42L)
  }

  test("WITHOUT ROWID tables ingest via the index-tree walk (pk-first record order)") {
    // pk declared LAST and out of insert order: the index B-tree sorts
    // by key and stores records pk-first — ingest must reorder back
    val db = makeDb("worid",
      "CREATE TABLE w (v INTEGER, note TEXT, k TEXT PRIMARY KEY) WITHOUT ROWID;" +
        "INSERT INTO w VALUES (3, 'see', 'c'), (1, 'ay', 'a'), (2, 'bee', 'b');")
    assert(engine.store.ingestSqliteSegment(db.toString, "worid") == Seq("w"))
    val rows = engine.read("worid", "SELECT k, v, note FROM w ORDER BY k;").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("a", 1L, "ay"), ("b", 2L, "bee"), ("c", 3L, "see")))
  }

  test("WITHOUT ROWID at interior-page scale: divider entries are real rows") {
    // small pages force a multi-level index B-tree, where some entries
    // live in INTERIOR cells — an in-order walk must emit them too
    // (a leaves-only walk would silently drop one row per leaf split)
    val db = makeDb("woridBig",
      "PRAGMA page_size=512;" +
        "CREATE TABLE wb (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID;" +
        "BEGIN;" +
        (1 to 2000).map(i => f"INSERT INTO wb VALUES ('k$i%05d', $i);").mkString("") +
        "COMMIT;")
    engine.store.ingestSqliteSegment(db.toString, "worid-big")
    val row = engine.read("worid-big",
      "SELECT count(*) AS n, sum(v) AS s FROM wb;").collect()(0)
    assert(row.getLong(0) == 2000L)
    assert(row.getLong(1) == 2000L * 2001 / 2)
  }

  test("table options in either order: WITHOUT ROWID, STRICT / STRICT, WITHOUT ROWID") {
    // the option list after the closing paren is comma-separated and
    // unordered (lang_createtable.html §table-options) — 'WITHOUT
    // ROWID, STRICT' does not END with WITHOUT ROWID, and misreading it
    // as a rowid table fails the walk with an index-page-type error
    val db = makeDb("wropts",
      """CREATE TABLE wr1 (a TEXT, b INTEGER, PRIMARY KEY(a)) WITHOUT ROWID, STRICT;
        |INSERT INTO wr1 VALUES ('k1', 5), ('k2', 7);
        |CREATE TABLE wr2 (a TEXT, b INTEGER, PRIMARY KEY(a)) STRICT, WITHOUT ROWID;
        |INSERT INTO wr2 VALUES ('m', 1);
        |CREATE TABLE plain_strict (id INTEGER PRIMARY KEY, t TEXT) STRICT;
        |INSERT INTO plain_strict VALUES (3, 'x');""".stripMargin)
    val tables = engine.store.ingestSqliteSegment(db.toString, "wr-opts")
    assert(tables.sorted == Seq("plain_strict", "wr1", "wr2"))
    val r1 = engine.read("wr-opts", "SELECT a, b FROM wr1 ORDER BY a;").collect()
    assert(r1.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("k1", 5L), ("k2", 7L)))
    assert(engine.read("wr-opts", "SELECT b FROM wr2;").collect()(0).getLong(0) == 1L)
    // STRICT alone must NOT flip a rowid table to the index-tree walk,
    // and its rowid alias still materializes
    val r3 = engine.read("wr-opts", "SELECT id, t FROM plain_strict;").collect()(0)
    assert(r3.getLong(0) == 3L && r3.getString(1) == "x")
  }

  test("mixed storage classes in one column: error by default, widened on opt-in") {
    // trough's write path runs arbitrary scripts (write.py:28-40), and
    // SQLite's INTEGER affinity keeps unconvertible text as TEXT class
    // — so a real segment can hold 1, 2.5 and 'abc' in one INTEGER
    // column
    val sql =
      """CREATE TABLE m (id INTEGER PRIMARY KEY, x INTEGER);
        |INSERT INTO m VALUES (1, 1), (2, 2.5), (3, 'abc'), (4, NULL);""".stripMargin
    val db = makeDb("mixed", sql)
    // default: clean per-cell error naming table/rowid/column
    val e = intercept[IllegalArgumentException] {
      engine.store.ingestSqliteSegment(db.toString, "mixed-strict")
    }
    assert(e.getMessage.contains("table m") && e.getMessage.contains("column x"))
    assert(!engine.store.segmentExists("mixed-strict")) // no phantom segment
    // opt-in: the column widens to STRING (int+real+text lattice) and
    // every value is preserved as its text rendering
    assert(engine.store.ingestSqliteSegment(db.toString, "mixed-widen", widen = true)
      == Seq("m"))
    val meta = engine.store.tableMeta("mixed-widen", "m")
    assert(meta.schema("x").dataType == org.apache.spark.sql.types.StringType)
    val rows = engine.read("mixed-widen", "SELECT id, x FROM m ORDER BY id;").collect()
    assert(rows.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ==
      Seq("1", "2.5", "abc", null))
    // the JSON boundary serves the same bytes sqlite3 would print
    assert(engine.resultJson(engine.read("mixed-widen",
      "SELECT x FROM m WHERE id = 3;")).contains("\"abc\""))
  }

  test("widen mode: numeric-only mixes widen numerically, not to text") {
    val db = makeDb("numwide",
      """CREATE TABLE n (id INTEGER PRIMARY KEY, v INTEGER, r REAL);
        |INSERT INTO n VALUES (1, 10, 1), (2, 2.5, 2.5);""".stripMargin)
    engine.store.ingestSqliteSegment(db.toString, "num-widen", widen = true)
    val meta = engine.store.tableMeta("num-widen", "n")
    // v saw {int, real} → DOUBLE; r is declared REAL and stays DOUBLE
    // even though SQLite stored its lossless cells with integer class
    assert(meta.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    assert(meta.schema("r").dataType == org.apache.spark.sql.types.DoubleType)
    val rows = engine.read("num-widen", "SELECT v, r FROM n ORDER BY id;").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(10.0, 2.5))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.0, 2.5))
  }

  test("fts5 virtual tables materialize searchable; storage-carrying tables still ingest") {
    // an FTS5 table catalogs as type='table' with rootpage 0 and no
    // storage of its own — its shadow tables (real B-trees, typeless
    // columns) load under widen mode, and (r11) the virtual table
    // itself materializes from ft_content so MATCH works over a
    // reference-written file
    val db = makeDb("vtab",
      """CREATE VIRTUAL TABLE ft USING fts5(content);
        |INSERT INTO ft VALUES ('hello world'), ('goodbye world');
        |CREATE TABLE real_t (id INTEGER PRIMARY KEY, v TEXT);
        |INSERT INTO real_t VALUES (1, 'x'), (2, 'y');""".stripMargin)
    val tables = engine.store.ingestSqliteSegment(db.toString, "vtab-seg", widen = true)
    assert(tables.contains("ft")) // materialized, searchable (r11)
    assert(tables.contains("real_t"))
    assert(tables.contains("ft_content")) // fts5 shadow table, real storage
    // the materialized table answers both plain SELECTs and MATCH,
    // byte-identical to real fts5 over the SAME file
    assert(engine.read("vtab-seg",
      "SELECT content FROM ft WHERE ft MATCH 'hello';")
      .collect().map(_.getString(0)).toSeq == Seq("hello world"))
    assert(SqliteCli.query(db.toString,
      "SELECT content FROM ft WHERE ft MATCH 'hello';") == "hello world")
    assert(engine.read("vtab-seg",
      "SELECT count(*) AS n FROM ft WHERE ft MATCH 'world';")
      .collect()(0).getLong(0) == 2L)
    val rows = engine.read("vtab-seg", "SELECT v FROM real_t ORDER BY id;").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("x", "y"))
    // typeless shadow columns took their types from observed classes:
    // ft_idx.segid holds only integers and reads back LONG, not bytes
    val idxMeta = engine.store.tableMeta("vtab-seg", "ft_idx")
    assert(idxMeta.schema("segid").dataType == org.apache.spark.sql.types.LongType)
    assert(engine.read("vtab-seg", "SELECT count(*) AS n FROM ft_content;")
      .collect()(0).getLong(0) == 2L)
  }

  test("real-world page layouts: freelist pages (deletes) and auto_vacuum ptrmap pages") {
    // deletes leave freelist pages the tree walk must simply never
    // visit; the b-tree still holds exactly the surviving rows
    val db = makeDb("freelist",
      "PRAGMA page_size=512;" +
        "CREATE TABLE f (id INTEGER PRIMARY KEY, pad TEXT);" +
        "BEGIN;" +
        (1 to 800).map(i => s"INSERT INTO f VALUES ($i, '${"x" * 120}');").mkString("") +
        "COMMIT;" +
        "DELETE FROM f WHERE id % 3 != 0;")
    engine.store.ingestSqliteSegment(db.toString, "freelist")
    val r = engine.read("freelist", "SELECT count(*) AS n, min(id) AS lo FROM f;").collect()(0)
    assert(r.getLong(0) == 266L && r.getLong(1) == 3L)

    // auto_vacuum interleaves pointer-map pages into the page numbering;
    // tree pointers already account for them, so the walk is unaffected
    val db2 = makeDb("autovac",
      "PRAGMA auto_vacuum=FULL;" +
        "CREATE TABLE av (id INTEGER PRIMARY KEY, v TEXT);" +
        "INSERT INTO av VALUES (1, 'one'), (2, '" + ("y" * 9000) + "');")
    engine.store.ingestSqliteSegment(db2.toString, "autovac")
    val rows = engine.read("autovac", "SELECT id, length(v) AS n FROM av ORDER BY id;")
      .collect()
    assert(rows.map(r0 => (r0.getLong(0), r0.getInt(1))).toSeq == Seq((1L, 3), (2L, 9000)))
  }

  test("corrupt file with cyclic child pointers is a clean error, not an infinite walk") {
    val db = makeDb("cyclic",
      "PRAGMA page_size=512;" +
        "CREATE TABLE c (id INTEGER PRIMARY KEY, v TEXT);" +
        "BEGIN;" +
        (1 to 1500).map(i => s"INSERT INTO c VALUES ($i, 'v$i');").mkString("") +
        "COMMIT;")
    // find the table's interior root, then patch its right-most child
    // pointer to point back at itself — the classic corruption loop
    val (rootPage, pageSize) = {
      val f = SqliteFile.open(db)
      try (f.userTables.head.rootPage, f.pageSize) finally f.close()
    }
    val bytes = Files.readAllBytes(db)
    val base = (rootPage - 1) * pageSize
    assert((bytes(base) & 0xFF) == 5, "fixture must have an interior root")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(base + 8, rootPage) // right-most pointer -> self
    Files.write(db, bytes)
    val e = intercept[IllegalArgumentException](
      engine.store.ingestSqliteSegment(db.toString, "cyclic"))
    // either guard may trip first (visited bound on small files, depth
    // bound on large ones) — both name the corruption
    assert(e.getMessage.contains("corrupt database"), e.getMessage)
    // the failed ingest must not leave a phantom segment behind
    // (registered, zero tables — reads would then say "no such table"
    // instead of "no such segment")
    assert(!engine.store.segmentExists("cyclic"))
  }

  /** Capture an UNCHECKPOINTED db+wal pair: `.shell cp` runs while the
    * sqlite3 session is still open, before the close-time checkpoint —
    * the copy's main file may not even contain the schema yet. */
  private def makeWalDb(name: String, sql: String, prelude: String = ""): Path = {
    val dir = Files.createTempDirectory("sqlite-wal-fixture")
    val live = dir.resolve("live.sqlite")
    val snap = dir.resolve(s"$name.sqlite")
    // prelude runs BEFORE entering WAL mode (page_size is frozen once
    // the journal mode flips)
    val script =
      s"""$prelude
         |PRAGMA journal_mode=WAL;
         |$sql
         |.shell cp "$live" "$snap"
         |.shell cp "$live-wal" "$snap-wal"
         |""".stripMargin
    val rc = SqliteCli.run(live.toString, script)
    assert(rc == 0, s"sqlite3 exited $rc")
    assert(Files.size(snap.resolveSibling(s"$name.sqlite-wal")) > 32, "WAL empty — fixture broken")
    snap
  }

  /** What the real sqlite3 reads from this db+wal pair — run on a COPY,
    * because opening recovers + checkpoints (mutating the files). */
  private def sqlite3Reads(db: Path, query: String): Seq[String] = {
    val dir = Files.createTempDirectory("sqlite-wal-check")
    val cp = dir.resolve("check.sqlite")
    Files.copy(db, cp)
    val wal = db.resolveSibling(db.getFileName.toString + "-wal")
    if (Files.isRegularFile(wal)) Files.copy(wal, dir.resolve("check.sqlite-wal"))
    val jrn = db.resolveSibling(db.getFileName.toString + "-journal")
    if (Files.isRegularFile(jrn)) Files.copy(jrn, dir.resolve("check.sqlite-journal"))
    SqliteCli.query(cp.toString, query).split("\n").toSeq.filter(_.nonEmpty)
  }

  test("uncheckpointed WAL: committed frames overlay the main file") {
    // the snapshot's MAIN file predates even the CREATE TABLE — schema
    // and rows exist only as WAL frames, the shape a crashed trough
    // write node leaves behind
    val db = makeWalDb("walbasic",
      """CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);
        |INSERT INTO t VALUES (1,'a'),(2,'b');
        |UPDATE t SET v='B' WHERE id=2;
        |INSERT INTO t VALUES (3,'c');
        |DELETE FROM t WHERE id=1;""".stripMargin)
    assert(engine.store.ingestSqliteSegment(db.toString, "wal-basic") == Seq("t"))
    val got = engine.read("wal-basic", "SELECT id, v FROM t ORDER BY id;").collect()
      .map(r => s"${r.getLong(0)}|${r.getString(1)}").toSeq
    assert(got == sqlite3Reads(db, "SELECT id, v FROM t ORDER BY id;"))
    assert(got == Seq("2|B", "3|c")) // latest frame per page won
  }

  test("WAL growing past the main file: db size comes from the commit record") {
    // enough rows that the B-tree spans pages that exist ONLY in the
    // WAL (the main file stays one page long)
    val db = makeWalDb("walbig",
      "CREATE TABLE big (id INTEGER PRIMARY KEY, s TEXT);\n" +
        "BEGIN;\n" +
        (1 to 3000).map(i => s"INSERT INTO big VALUES ($i, 'row-$i-${"pad" * 10}');")
          .mkString("\n") + "\nCOMMIT;")
    assert(Files.size(db) <= 4096L, "fixture: main file should be a single page")
    engine.store.ingestSqliteSegment(db.toString, "wal-big")
    val r = engine.read("wal-big",
      "SELECT count(*) AS n, sum(id) AS s FROM big;").collect()(0)
    assert(r.getLong(0) == 3000L && r.getLong(1) == 3000L * 3001 / 2)
  }

  test("torn WAL tail: ingest matches sqlite3's own recovery, not the torn bytes") {
    val db = makeWalDb("waltorn",
      """CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);
        |INSERT INTO t VALUES (1,'committed');
        |INSERT INTO t VALUES (2,'also committed');""".stripMargin)
    // tear mid-frame: drop the last 100 bytes of the WAL
    val wal = db.resolveSibling(db.getFileName.toString + "-wal")
    val bytes = Files.readAllBytes(wal)
    Files.write(wal, bytes.take(bytes.length - 100))
    engine.store.ingestSqliteSegment(db.toString, "wal-torn")
    val ours = engine.read("wal-torn", "SELECT id, v FROM t ORDER BY id;").collect()
      .map(r => s"${r.getLong(0)}|${r.getString(1)}").toSeq
    assert(ours == sqlite3Reads(db, "SELECT id, v FROM t ORDER BY id;"))
    assert(ours == Seq("1|committed")) // the torn transaction vanished
  }

  test("WAL across page sizes and churn: latest committed frame per page wins") {
    // non-default page sizes change the frame geometry (24 + page), and
    // update/delete churn makes the SAME page appear in many frames —
    // the overlay must serve the LATEST committed image of each
    for (pageSize <- Seq(512, 1024, 8192)) {
      val db = makeWalDb(s"walps$pageSize",
        s"""CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);
           |BEGIN;
           |${(1 to 200).map(i => s"INSERT INTO t VALUES ($i, 'v$i');").mkString("\n")}
           |COMMIT;
           |UPDATE t SET v = 'updated' WHERE id % 7 = 0;
           |DELETE FROM t WHERE id % 11 = 0;
           |UPDATE t SET v = 'twice' WHERE id % 14 = 0;""".stripMargin,
        prelude = s"PRAGMA page_size=$pageSize;")
      engine.store.ingestSqliteSegment(db.toString, s"wal-ps$pageSize")
      val got = engine.read(s"wal-ps$pageSize",
        "SELECT count(*) AS n, sum(CASE WHEN v='updated' THEN 1 ELSE 0 END) AS u, " +
          "sum(CASE WHEN v='twice' THEN 1 ELSE 0 END) AS w FROM t;").collect()(0)
      val expect = sqlite3Reads(db,
        "SELECT count(*) || '|' || sum(CASE WHEN v='updated' THEN 1 ELSE 0 END) " +
          "|| '|' || sum(CASE WHEN v='twice' THEN 1 ELSE 0 END) FROM t;").head
      assert(s"${got.getLong(0)}|${got.getLong(1)}|${got.getLong(2)}" == expect,
        s"page size $pageSize diverged from sqlite3's own recovery")
    }
  }

  test("corrupt WAL header is a clean error naming the sidecar") {
    val db = makeDb("walhdr", "CREATE TABLE t (id INTEGER PRIMARY KEY); INSERT INTO t VALUES (1);")
    val wal = db.resolveSibling(db.getFileName.toString + "-wal")
    Files.write(wal, Array.fill[Byte](4120)(0x42)) // 32-byte header + noise, bad magic
    val e = intercept[IllegalArgumentException](
      engine.store.ingestSqliteSegment(db.toString, "wal-hdr"))
    assert(e.getMessage.contains("WAL") && e.getMessage.contains(wal.getFileName.toString))
    // a checkpointed-then-reset WAL (valid header, zero frames) is NOT
    // an error: nothing supersedes the main file
    Files.write(wal, bytesOfResetWal())
    assert(engine.store.ingestSqliteSegment(db.toString, "wal-reset") == Seq("t"))
    assert(engine.read("wal-reset", "SELECT id FROM t;").collect()(0).getLong(0) == 1L)
  }

  /** A header-only WAL as `PRAGMA wal_checkpoint(RESTART)` leaves it:
    * produced by checkpointing a real one and truncating to 32 bytes. */
  private def bytesOfResetWal(): Array[Byte] = {
    val db = makeWalDb("walreset", "CREATE TABLE r (id INTEGER PRIMARY KEY);")
    val wal = db.resolveSibling(db.getFileName.toString + "-wal")
    Files.readAllBytes(wal).take(32)
  }

  /** Capture a db + HOT `-journal` pair: committed state first, then a
    * transaction interrupted by `.shell cp` mid-flight (a tiny page
    * cache forces dirty pages to spill into the main file, so the
    * snapshot's db really does hold uncommitted content that only the
    * journal's pre-images can undo — the shape a crashed rollback-mode
    * trough write node leaves behind). */
  private def makeHotJournalDb(name: String, committed: String,
      interrupted: String, prelude: String = ""): Path = {
    val dir = Files.createTempDirectory("sqlite-journal-fixture")
    val live = dir.resolve("live.sqlite")
    val snap = dir.resolve(s"$name.sqlite")
    val script =
      s"""$prelude
         |PRAGMA journal_mode=DELETE;
         |PRAGMA cache_size=2;
         |$committed
         |BEGIN;
         |$interrupted
         |.shell cp "$live" "$snap"
         |.shell cp "$live-journal" "$snap-journal"
         |ROLLBACK;
         |""".stripMargin
    val rc = SqliteCli.run(live.toString, script)
    assert(rc == 0, s"sqlite3 exited $rc")
    assert(Files.size(snap.resolveSibling(s"$name.sqlite-journal")) >= 28,
      "journal empty — fixture broken")
    snap
  }

  test("hot rollback journal: pre-images + truncation restore the last commit") {
    val db = makeHotJournalDb("hotj",
      committed = "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);\nBEGIN;\n" +
        (1 to 2000).map(i => s"INSERT INTO t VALUES ($i, 'orig-$i');").mkString("\n") +
        "\nCOMMIT;",
      // the UPDATE dirties every page; with cache_size=2 most spill into
      // the main file before the snapshot — and the snapshot is LARGER
      // than the pre-txn db, so rollback must also truncate
      interrupted = "UPDATE t SET v = 'mutated-' || id;")
    val ours = engine.store.ingestSqliteSegment(db.toString, "hot-journal")
    assert(ours == Seq("t"))
    val got = engine.read("hot-journal",
      "SELECT count(*) AS n, sum(CASE WHEN v LIKE 'orig-%' THEN 1 ELSE 0 END) AS o, " +
        "sum(CASE WHEN v LIKE 'mutated-%' THEN 1 ELSE 0 END) AS m FROM t;").collect()(0)
    // every row rolled back to its committed content — none of the
    // interrupted transaction's spilled pages leaked through
    assert(got.getLong(0) == 2000L && got.getLong(1) == 2000L && got.getLong(2) == 0L)
    val expect = sqlite3Reads(db,
      "SELECT count(*) || '|' || sum(v LIKE 'orig-%') || '|' || sum(v LIKE 'mutated-%') FROM t;")
    assert(s"${got.getLong(0)}|${got.getLong(1)}|${got.getLong(2)}" == expect.head,
      "diverged from sqlite3's own hot-journal recovery")
  }

  test("hot journal under synchronous=OFF: nRec=-1 headers read to EOF") {
    val db = makeHotJournalDb("hotjoff",
      committed = "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);\nBEGIN;\n" +
        (1 to 500).map(i => s"INSERT INTO t VALUES ($i, 'keep-$i');").mkString("\n") +
        "\nCOMMIT;",
      interrupted = "DELETE FROM t WHERE id % 2 = 0;",
      prelude = "PRAGMA synchronous=OFF;")
    engine.store.ingestSqliteSegment(db.toString, "hot-journal-off")
    val got = engine.read("hot-journal-off",
      "SELECT count(*) AS n FROM t;").collect()(0).getLong(0)
    assert(got == 500L, s"expected full rollback of the DELETE, got $got rows")
    assert(got.toString == sqlite3Reads(db, "SELECT count(*) FROM t;").head)
  }

  test("PERSIST-mode leftover journal (zeroed header) is cold: ignored") {
    val dir = Files.createTempDirectory("sqlite-persist-fixture")
    val live = dir.resolve("persist.sqlite")
    val script =
      s"""PRAGMA journal_mode=PERSIST;
         |CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);
         |INSERT INTO t VALUES (1, 'committed'), (2, 'also');
         |""".stripMargin
    assert(SqliteCli.run(live.toString, script) == 0)
    val jrn = dir.resolve("persist.sqlite-journal")
    assert(Files.isRegularFile(jrn), "fixture: PERSIST should leave the journal file")
    assert(Files.readAllBytes(jrn).take(8).forall(_ == 0),
      "fixture: a committed PERSIST journal has a zeroed header")
    engine.store.ingestSqliteSegment(live.toString, "persist-cold")
    assert(engine.read("persist-cold", "SELECT count(*) AS n FROM t;")
      .collect()(0).getLong(0) == 2L)
  }

  test("journal rolling back to an empty database is a clean error") {
    // the crash interrupted the FIRST transaction ever: pre-txn size 0.
    // Real spill order leaves the main file without a valid header
    // (page 1 may never have been written), so ingest fails the header
    // check — a clean per-file error either way, with no phantom state
    val db = makeHotJournalDb("hotjempty",
      committed = "",
      interrupted = "CREATE TABLE t (id INTEGER PRIMARY KEY, pad TEXT);\n" +
        (1 to 2000).map(i => s"INSERT INTO t VALUES ($i, '${"x" * 80}');").mkString("\n"))
    intercept[IllegalArgumentException](
      engine.store.ingestSqliteSegment(db.toString, "hot-journal-empty"))
    assert(!engine.store.segmentExists("hot-journal-empty"))

    // when page 1 DID spill (valid header) the journal's dbSize=0 is
    // the only witness that the whole file is uncommitted — pin the
    // explicit EMPTY-database refusal with a synthetic journal
    val db2 = makeDb("hotjempty2",
      "CREATE TABLE t (id INTEGER PRIMARY KEY); INSERT INTO t VALUES (1);")
    val jrn = db2.resolveSibling(db2.getFileName.toString + "-journal")
    val hdr = java.nio.ByteBuffer.allocate(512)
    hdr.put(Array(0xd9, 0xd5, 0x05, 0xf9, 0x20, 0xa1, 0x63, 0xd7).map(_.toByte))
    hdr.putInt(8, 0)    // nRec
    hdr.putInt(12, 0)   // nonce
    hdr.putInt(16, 0)   // initial db size: EMPTY
    hdr.putInt(20, 512) // sector size
    hdr.putInt(24, 4096)
    Files.write(jrn, hdr.array())
    val e = intercept[IllegalArgumentException](
      engine.store.ingestSqliteSegment(db2.toString, "hot-journal-empty2"))
    assert(e.getMessage.contains("EMPTY database"))
    assert(!engine.store.segmentExists("hot-journal-empty2"))
  }

  test("bulk ingest: parallel over files, per-file error isolation") {
    val dbs = (1 to 6).map { i =>
      f"bulk-$i%02d" -> makeDb(s"bulk$i",
        s"CREATE TABLE m (id INTEGER PRIMARY KEY, v INTEGER); " +
          s"INSERT INTO m VALUES (1, ${i * 100});").toString
    }.toMap
    // one deliberately-corrupt file in the batch
    val badDir = Files.createTempDirectory("sqlite-bad")
    val bad = badDir.resolve("bad.sqlite")
    Files.write(bad, "not a sqlite file at all".getBytes)
    val results = engine.store.ingestSqliteSegments(
      dbs + ("bulk-bad" -> bad.toString), parallelism = 4)
    assert(results("bulk-bad").isFailure)
    dbs.keys.foreach(seg => assert(results(seg) == scala.util.Success(Seq("m")), seg))
    // all six good segments landed and scan as one relation
    val sum = engine.readAll("SELECT sum(v) AS s FROM m;", "^bulk-")
      .collect()(0).getLong(0)
    assert(sum == (1 to 6).map(_ * 100).sum.toLong)
    assert(!engine.store.segmentExists("bulk-bad") ||
      engine.store.tables("bulk-bad").isEmpty) // the bad file committed nothing
  }

  test("ingested segment is a first-class citizen: readAll, promote, write all work") {
    val db = makeDb("firstclass",
      "CREATE TABLE ev (id INTEGER PRIMARY KEY, x INTEGER);" +
        "INSERT INTO ev VALUES (1, 10), (2, 20);")
    engine.store.ingestSqliteSegment(db.toString, "ing-a")
    // cross-segment scan sees it next to natively-provisioned segments
    engine.schemas.put("ev-ddl", "CREATE TABLE ev (id INTEGER PRIMARY KEY, x INTEGER);")
    engine.provisionWritable("ing-b", "ev-ddl")
    engine.write("ing-b", "INSERT INTO ev (id, x) VALUES (3, 30);")
    val all = engine.readAll(
      "SELECT segment_id, sum(x) AS s FROM ev GROUP BY segment_id ORDER BY segment_id;",
      "^ing-")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(all == Seq(("ing-a", 30L), ("ing-b", 30L)))
    // writes apply on top of ingested data after taking the lock
    engine.provisionWritable("ing-a", "default")
    engine.write("ing-a", "UPDATE ev SET x = x + 1 WHERE id = 1;")
    val rows = engine.read("ing-a", "SELECT x FROM ev ORDER BY id;").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(11L, 20L))
  }
}
