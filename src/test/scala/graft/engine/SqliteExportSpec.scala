package graft.engine

import java.nio.file.{Files, Path}

import scala.sys.process._

import graft.SparkSpecBase

/** Export-side validation of the pure-Scala SQLite writer: every test
  * hands the produced bytes to the REAL `sqlite3` CLI — if the page
  * layout, record encoding, varints, or overflow chains were wrong,
  * `PRAGMA integrity_check` or the SELECTs would fail there, not in
  * our own reader. */
class SqliteExportSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-sqlite-export").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  /** Run SQL against a db with the sqlite3 CLI, return stdout lines.
    * stdout goes through a file read back as UTF-8 — ProcessLogger
    * would decode it with the platform charset (ASCII here), mangling
    * non-ASCII values. */
  private def sqlite3(db: Path, sql: String): Seq[String] = {
    // SqliteCli uses the JDK's native fd-level redirects — no pump
    // threads to lose under a parallel test run (see its scaladoc)
    SqliteCli.query(db.toString, sql).split("\n").toSeq.filter(_.nonEmpty)
  }

  private def exportDir(): Path = Files.createTempDirectory("sqlite-export")

  test("sqlite3 integrity-checks and reads an exported multi-type segment") {
    engine.schemas.put("exp-mix",
      "CREATE TABLE mixed (id INTEGER PRIMARY KEY AUTOINCREMENT, " +
        "i INTEGER, r REAL, t TEXT, b BLOB);")
    engine.provisionWritable("exp-a", "exp-mix")
    engine.write("exp-a",
      "INSERT INTO mixed (i, r, t, b) VALUES " +
        "(0, 1.5, 'héllo wörld', X'DEADBEEF'), " +
        "(1, -2.25, '', X''), " +
        "(NULL, NULL, NULL, NULL), " +
        "(9223372036854775807, 3e18, 'quote '' in text', X'00FF'), " +
        "(-9223372036854775808, -0.0, 'line\nbreak', NULL);")
    val db = exportDir().resolve("expA.sqlite")
    val tables = engine.store.exportSqliteSegment("exp-a", db.toString)
    assert(tables == Seq("mixed"))

    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db, "SELECT count(*) FROM mixed;") == Seq("5"))
    // typed round trip through the real engine, incl. NULLs and typeof
    // (the 3e18 double compares by value — its text rendering varies
    // across sqlite versions)
    assert(sqlite3(db,
      "SELECT id, i, r, t, hex(b) FROM mixed WHERE id = 1;") ==
      Seq("1|0|1.5|héllo wörld|DEADBEEF"))
    assert(sqlite3(db,
      "SELECT i, r = 3e18, t, hex(b) FROM mixed WHERE id = 4;") ==
      Seq("9223372036854775807|1|quote ' in text|00FF"))
    assert(sqlite3(db, "SELECT typeof(i), typeof(r), typeof(t), typeof(b) " +
      "FROM mixed WHERE id = 1;") == Seq("integer|real|text|blob"))
    assert(sqlite3(db, "SELECT i, r, t FROM mixed WHERE id = 3;") == Seq("||"))
    // rowid-alias semantics survived: id IS the rowid
    assert(sqlite3(db, "SELECT rowid = id FROM mixed WHERE id = 5;") == Seq("1"))
    // the exported DDL parses as a rowid table sqlite will write to
    assert(sqlite3(db,
      "INSERT INTO mixed (t) VALUES ('post-export insert'); " +
        "SELECT id, t FROM mixed WHERE id = 6;") == Seq("6|post-export insert"))
  }

  test("multi-page B-tree and overflow chains validate in sqlite3") {
    engine.schemas.put("exp-big",
      "CREATE TABLE big (id INTEGER PRIMARY KEY, name TEXT, v INTEGER);")
    engine.provisionWritable("exp-b", "exp-big")
    // chunked: a single 3000-tuple VALUES parses as one huge expression
    // tree and overflows Spark's parser stack
    (1 to 3000).grouped(500).foreach { chunk =>
      val inserts = chunk.map(i => s"($i, 'name-$i', ${i * 3})").mkString(", ")
      engine.write("exp-b", s"INSERT INTO big (id, name, v) VALUES $inserts;")
    }
    // one row with a 100 kB body forces an overflow chain
    val long = "abcdefghij" * 10000
    engine.write("exp-b", s"INSERT INTO big (id, name, v) VALUES (5000, '$long', 1);")
    val db = exportDir().resolve("expB.sqlite")
    engine.store.exportSqliteSegment("exp-b", db.toString)

    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db, "SELECT count(*), sum(v) FROM big;") ==
      Seq(s"3001|${3L * 3000 * 3001 / 2 + 1}"))
    assert(sqlite3(db, "SELECT length(name) FROM big WHERE id = 5000;") == Seq("100000"))
    assert(sqlite3(db, "SELECT name FROM big WHERE id = 2718;") == Seq("name-2718"))
    // interior pages exist (3000 rows ≫ one leaf; ~15 leaves + the
    // 100 kB overflow chain ≈ 40 pages) and the b-tree is seekable by
    // rowid from sqlite's side
    assert(Files.size(db) > 30 * 4096L)
  }

  test("export → ingest round trip preserves every row byte-for-byte") {
    engine.schemas.put("exp-rt",
      "CREATE TABLE rt (id INTEGER PRIMARY KEY, a TEXT, x REAL); " +
        "CREATE TABLE rt2 (k INTEGER PRIMARY KEY, s TEXT);")
    engine.provisionWritable("exp-c", "exp-rt")
    engine.write("exp-c",
      "INSERT INTO rt (id, a, x) VALUES (1, 'alpha', 0.5), (2, NULL, -1.25), (7, 'ζ', 0.0); " +
        "INSERT INTO rt2 (k, s) VALUES (10, 'ten');")
    val db = exportDir().resolve("expC.sqlite")
    engine.store.exportSqliteSegment("exp-c", db.toString)
    val tables = engine.store.ingestSqliteSegment(db.toString, "exp-c2")
    assert(tables.sorted == Seq("rt", "rt2"))
    for (t <- Seq("rt", "rt2")) {
      val orig = engine.resultJson(engine.read("exp-c", s"SELECT * FROM $t ORDER BY 1;"))
      val back = engine.resultJson(engine.read("exp-c2", s"SELECT * FROM $t ORDER BY 1;"))
      assert(orig == back, s"round trip diverged for $t")
    }
  }

  test("fuzz: random tables round-trip writer → reader and writer → sqlite3") {
    val rnd = new scala.util.Random(0x517e)
    // serial-width boundary ints are the values most likely to expose an
    // off-by-one in the record encoder
    val edgeInts = Seq(0L, 1L, -1L, 127L, 128L, -128L, -129L, 32767L, 32768L,
      -32768L, -32769L, (1L << 23) - 1, 1L << 23, -(1L << 23), -(1L << 23) - 1,
      Int.MaxValue.toLong, Int.MaxValue + 1L, Int.MinValue.toLong, Int.MinValue - 1L,
      (1L << 47) - 1, 1L << 47, -(1L << 47), -(1L << 47) - 1, Long.MaxValue, Long.MinValue)
    def randValue(tpe: Int): Any = tpe match {
      case 0 => if (rnd.nextBoolean()) edgeInts(rnd.nextInt(edgeInts.length))
        else rnd.nextLong()
      case 1 => rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => -0.0
        case 2 => rnd.nextDouble() * 1e18
        case _ => rnd.nextGaussian()
      }
      case 2 =>
        val len = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(8) // short
          case 1 => rnd.nextInt(200)
          case 2 => 1500 + rnd.nextInt(500) // near page boundary
          case _ => 5000 + rnd.nextInt(8000) // forces overflow
        }
        val chars = "aé日\n'\"\\x ~ÿ"
        (0 until len).map(_ => chars(rnd.nextInt(chars.length))).mkString
      case _ => Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
    }
    for (trial <- 1 to 5) {
      val nCols = 2 + rnd.nextInt(4)
      val colTypes = Seq.fill(nCols)(rnd.nextInt(4))
      val nRows = rnd.nextInt(250)
      val rows = (1 to nRows).map { i =>
        (i.toLong, colTypes.map(t =>
          if (rnd.nextInt(8) == 0) null else randValue(t)).toIndexedSeq)
      }
      val colDefs = colTypes.zipWithIndex.map { case (t, j) =>
        val ty = Seq("INTEGER", "REAL", "TEXT", "BLOB")(t)
        s""""c$j" $ty"""
      }.mkString(", ")
      val db = exportDir().resolve(s"fuzz$trial.sqlite")
      SqliteWriter.write(db,
        Seq(SqliteWriter.TableData("fz", s"""CREATE TABLE "fz" ($colDefs)""", rows)))

      // the real sqlite3 validates structure and row count
      assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"), s"trial $trial")
      assert(sqlite3(db, "SELECT count(*) FROM fz;") == Seq(nRows.toString), s"trial $trial")

      // our reader must recover every value exactly
      val f = SqliteFile.open(db)
      try {
        val m = f.userTables.head
        val got = f.rows(m.rootPage).toSeq
        assert(got.length == nRows, s"trial $trial row count")
        got.zip(rows).foreach { case ((gRowid, gVals), (eRowid, eVals)) =>
          assert(gRowid == eRowid)
          gVals.zip(eVals).foreach {
            case (g: Array[Byte], e: Array[Byte]) => assert(g.sameElements(e), s"trial $trial blob")
            case (g: Double, e: Double) =>
              assert(java.lang.Double.doubleToLongBits(g) ==
                java.lang.Double.doubleToLongBits(e), s"trial $trial double")
            case (g, e) => assert(g == e, s"trial $trial: $g != $e")
          }
        }
      } finally f.close()
    }
  }

  test("autoindex divider promotion at the final key keeps the tree valid") {
    // 6 uniform ~90-byte keys at 512-byte pages land the LAST key
    // exactly on a leaf flush — the regression shape where promoting it
    // (with no leaf following) left f+1 leaves over f−1 dividers and
    // the interior build indexed dividers out of bounds
    def key(i: Int) = "k" * 88 + f"$i%02d"
    val rows = (1 to 6).map(i => (i.toLong, IndexedSeq[Any](key(i), i.toLong)))
    val db = exportDir().resolve("lastpromote.sqlite")
    SqliteWriter.write(db, Seq(SqliteWriter.TableData(
      "t", "CREATE TABLE t (a TEXT, v INTEGER, PRIMARY KEY (a))", rows, Seq(0))),
      pageSize = 512)
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db, "SELECT count(*) FROM t;") == Seq("6"))
    // the autoindex answers point lookups for every key, incl. the
    // split-off last one
    (1 to 6).foreach { i =>
      assert(sqlite3(db, s"SELECT v FROM t WHERE a = '${key(i)}';") == Seq(i.toString))
    }
  }

  test("fuzz: autoindex trees round-trip through sqlite3 across page sizes") {
    val rnd = new scala.util.Random(0xA11C)
    for (trial <- 1 to 9) {
      val pageSize = Seq(512, 1024, 4096)(trial % 3)
      val n = 1 + rnd.nextInt(300)
      val keys = (1 to n).map { i =>
        val len = rnd.nextInt(4) match {
          case 0 => 1 + rnd.nextInt(10)
          case 1 => 40 + rnd.nextInt(120)
          case 2 => 200 + rnd.nextInt(400)
          case _ => 2000 + rnd.nextInt(3000) // spills at small pages
        }
        f"$i%06d-" + ("x" * len) // unique ordered prefix
      }
      val rows = keys.zipWithIndex.map { case (k, i) =>
        ((i + 1).toLong, IndexedSeq[Any](k, i.toLong * 7))
      }
      val db = exportDir().resolve(s"fuzzidx$trial.sqlite")
      SqliteWriter.write(db, Seq(SqliteWriter.TableData(
        "fz", "CREATE TABLE fz (a TEXT, v INTEGER, PRIMARY KEY (a))", rows, Seq(0))),
        pageSize)
      assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"),
        s"trial $trial (page $pageSize, n=$n)")
      assert(sqlite3(db, "SELECT count(*) FROM fz;") == Seq(n.toString), s"trial $trial")
      val probe = rnd.nextInt(n)
      assert(sqlite3(db, s"SELECT v FROM fz WHERE a = '${keys(probe)}';") ==
        Seq((probe * 7L).toString), s"trial $trial probe")
    }
  }

  test("near-threshold sqlite_master cells push the schema root below page 1") {
    // DDL sizes swept across the window where the master cell's local
    // payload (K near U−35) no longer fits page 1's 100-byte-header
    // budget. Real SQLite answers with a cell-less interior root
    // (balance_deeper) — verified against sqlite 3.51: pads 8040–8100
    // give page-1 type 5 with 0 cells — and so does the writer.
    for (pad <- 7950 to 8150 by 25) {
      val ddl = s"CREATE TABLE t (a TEXT DEFAULT '${"x" * pad}')"
      val db = exportDir().resolve(s"bigddl$pad.sqlite")
      SqliteWriter.write(db, Seq(SqliteWriter.TableData(
        "t", ddl, Seq((1L, IndexedSeq[Any]("row1"))))))
      assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"), s"pad $pad")
      assert(sqlite3(db, "SELECT a FROM t;") == Seq("row1"), s"pad $pad")
      assert(sqlite3(db, "SELECT length(sql) FROM sqlite_master;") ==
        Seq(ddl.length.toString), s"pad $pad")
      // our own reader walks the deepened master tree too
      val f = SqliteFile.open(db)
      try assert(f.userTables.map(_.name) == Seq("t"), s"pad $pad") finally f.close()
    }
  }

  test("non-alias integer PK exports without accidentally becoming a rowid alias") {
    // 'id INT PRIMARY KEY' is NOT a rowid alias in SQLite (the alias
    // needs the exact type name INTEGER) — the export must not render
    // DDL that real SQLite would alias, or SELECT id would return
    // sequential rowids instead of the stored values
    engine.schemas.put("exp-intpk",
      "CREATE TABLE ip (id INT PRIMARY KEY, v TEXT);")
    engine.provisionWritable("exp-e", "exp-intpk")
    engine.write("exp-e",
      "INSERT INTO ip (id, v) VALUES (500, 'five hundred'), (42, 'answer');")
    val db = exportDir().resolve("expE.sqlite")
    engine.store.exportSqliteSegment("exp-e", db.toString)
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    // the stored values, not rowids — and the PK index works for seeks
    assert(sqlite3(db, "SELECT id, v FROM ip ORDER BY id;") ==
      Seq("42|answer", "500|five hundred"))
    assert(sqlite3(db, "SELECT v FROM ip WHERE id = 500;") == Seq("five hundred"))
    // re-ingesting our own export keeps the values too
    engine.store.ingestSqliteSegment(db.toString, "exp-e2")
    val back = engine.read("exp-e2", "SELECT id FROM ip ORDER BY id;").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(42L, 500L))
  }

  test("recorded CREATE INDEX materializes on export and sqlite3's planner uses it") {
    engine.schemas.put("exp-ix",
      "CREATE TABLE ev (id INTEGER PRIMARY KEY, host TEXT, status INTEGER); " +
        "CREATE INDEX ix_ev_host ON ev (host); " +
        "CREATE UNIQUE INDEX ix_ev_hs ON ev (host, status);")
    engine.provisionWritable("exp-ix", "exp-ix")
    (1 to 1200).grouped(400).foreach { chunk =>
      engine.write("exp-ix", "INSERT INTO ev (host, status) VALUES " +
        chunk.map(i => s"('host-${i % 97}.example', ${200 + i})").mkString(", ") + ";")
    }
    val db = exportDir().resolve("expIx.sqlite")
    engine.store.exportSqliteSegment("exp-ix", db.toString)
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    // both indexes exist in the catalog with their original DDL
    assert(sqlite3(db,
      "SELECT name FROM sqlite_master WHERE type='index' ORDER BY name;") ==
      Seq("ix_ev_host", "ix_ev_hs"))
    // the planner SEEKS through the exported tree (and gets right answers)
    val plan = sqlite3(db,
      "EXPLAIN QUERY PLAN SELECT count(*) FROM ev WHERE host = 'host-13.example';")
    assert(plan.exists(_.contains("USING")) && plan.exists(_.contains("ix_ev_h")),
      s"planner ignored the index: $plan")
    assert(sqlite3(db,
      "SELECT count(*) FROM ev WHERE host = 'host-13.example';") ==
      Seq((1 to 1200).count(_ % 97 == 13).toString))
    assert(sqlite3(db,
      "SELECT status FROM ev WHERE host = 'host-13.example' AND status = 213;") ==
      Seq("213"))
  }

  test("CREATE INDEX in a write script records and round-trips through export → ingest") {
    engine.schemas.put("exp-ix2",
      "CREATE TABLE doc (id INTEGER PRIMARY KEY, tag TEXT);")
    engine.provisionWritable("exp-ix2", "exp-ix2")
    engine.write("exp-ix2",
      "INSERT INTO doc (tag) VALUES ('a'), ('b'), ('a'); " +
        "CREATE INDEX ix_doc_tag ON doc (tag); " +
        // non-plain shapes stay accepted as no-op hints
        "CREATE INDEX ix_doc_desc ON doc (tag DESC); " +
        "CREATE INDEX ix_doc_part ON doc (tag) WHERE tag = 'a';")
    val db = exportDir().resolve("expIx2.sqlite")
    engine.store.exportSqliteSegment("exp-ix2", db.toString)
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db, "SELECT name FROM sqlite_master WHERE type='index';") ==
      Seq("ix_doc_tag"))
    // ingest of our own export keeps the definition for the NEXT export
    engine.store.ingestSqliteSegment(db.toString, "exp-ix2-back")
    val meta = engine.store.tableMeta("exp-ix2-back", "doc")
    assert(meta.indexes.map(_.name) == Seq("ix_doc_tag"))
    val db2 = exportDir().resolve("expIx2b.sqlite")
    engine.store.exportSqliteSegment("exp-ix2-back", db2.toString)
    assert(sqlite3(db2, "SELECT name FROM sqlite_master WHERE type='index';") ==
      Seq("ix_doc_tag"))
    assert(sqlite3(db2, "PRAGMA integrity_check;") == Seq("ok"))
    // duplicate index name errors like SQLite unless IF NOT EXISTS
    val e = intercept[Exception](engine.write("exp-ix2",
      "CREATE INDEX ix_doc_tag ON doc (tag);"))
    assert(e.getMessage.contains("already exists"))
    engine.write("exp-ix2", "CREATE INDEX IF NOT EXISTS ix_doc_tag ON doc (tag);")
  }

  test("indexes survive ALTER TABLE: RENAME retargets the DDL, ADD COLUMN keeps them") {
    engine.schemas.put("exp-ix4",
      "CREATE TABLE t0 (id INTEGER PRIMARY KEY, host TEXT); " +
        "CREATE INDEX ix_t_host ON t0 (host);")
    engine.provisionWritable("exp-ix4", "exp-ix4")
    engine.write("exp-ix4",
      "INSERT INTO t0 (host) VALUES ('a'), ('b'); " +
        "ALTER TABLE t0 ADD COLUMN note TEXT DEFAULT 'n'; " + // must not drop the index
        "ALTER TABLE t0 RENAME TO t1;")
    val meta = engine.store.tableMeta("exp-ix4", "t1")
    assert(meta.indexes.map(_.name) == Seq("ix_t_host"))
    assert(meta.indexes.head.table == "t1")
    val db = exportDir().resolve("expIx4.sqlite")
    engine.store.exportSqliteSegment("exp-ix4", db.toString)
    // a stale `ON t0` in the index sql would be a malformed schema here
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db,
      "SELECT tbl_name FROM sqlite_master WHERE name='ix_t_host';") == Seq("t1"))
    assert(sqlite3(db, "SELECT note FROM t1 WHERE host = 'b';") == Seq("n"))
    val plan = sqlite3(db, "EXPLAIN QUERY PLAN SELECT id FROM t1 WHERE host = 'a';")
    assert(plan.exists(_.contains("ix_t_host")), s"planner ignored the index: $plan")
    // sqlite's reserved-prefix refusal applies in both recording paths
    val e = intercept[Exception](engine.write("exp-ix4",
      "CREATE INDEX sqlite_autoindex_t1_1 ON t1 (host);"))
    assert(e.getMessage.contains("reserved"))
  }

  test("secondary index over NULLs and duplicates keeps integrity and seeks") {
    // SQLite stores index entries for NULL keys (rank 0, before all
    // values) and duplicates disambiguate by the rowid tiebreak — both
    // must survive export or integrity_check counts a mismatch
    engine.schemas.put("exp-ix5",
      "CREATE TABLE n5 (id INTEGER PRIMARY KEY, tag TEXT); " +
        "CREATE INDEX ix_n5_tag ON n5 (tag);")
    engine.provisionWritable("exp-ix5", "exp-ix5")
    engine.write("exp-ix5",
      "INSERT INTO n5 (tag) VALUES ('b'), (NULL), ('a'), ('b'), (NULL), ('a'), ('b');")
    val db = exportDir().resolve("expIx5.sqlite")
    engine.store.exportSqliteSegment("exp-ix5", db.toString)
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db, "SELECT count(*) FROM n5 WHERE tag = 'b';") == Seq("3"))
    assert(sqlite3(db, "SELECT count(*) FROM n5 WHERE tag IS NULL;") == Seq("2"))
    val plan = sqlite3(db, "EXPLAIN QUERY PLAN SELECT id FROM n5 WHERE tag = 'a';")
    assert(plan.exists(_.contains("ix_n5_tag")), s"planner ignored the index: $plan")
  }

  test("secondary index on a table WITHOUT a rowid alias (positional rowids)") {
    engine.schemas.put("exp-ix3",
      "CREATE TABLE na (name TEXT, score REAL, PRIMARY KEY (name)); " +
        "CREATE INDEX ix_na_score ON na (score);")
    engine.provisionWritable("exp-ix3", "exp-ix3")
    engine.write("exp-ix3",
      "INSERT INTO na (name, score) VALUES ('c', 3.0), ('a', 1.0), ('b', 2.0);")
    val db = exportDir().resolve("expIx3.sqlite")
    engine.store.exportSqliteSegment("exp-ix3", db.toString)
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    // autoindex (PK) and the secondary both answer
    assert(sqlite3(db, "SELECT score FROM na WHERE name = 'b';") == Seq("2.0"))
    assert(sqlite3(db, "SELECT name FROM na WHERE score = 3.0;") == Seq("c"))
    assert(sqlite3(db,
      "SELECT count(*) FROM sqlite_master WHERE type='index';") == Seq("2"))
  }

  test("writer streams pages while consuming the row iterator, not after") {
    // the O(tree-depth + one page) memory claim, pinned structurally: by
    // the time HALF the rows have been pulled from the iterator, a
    // proportional share of the file must already be on disk — a writer
    // that buffers the table (the old shape) writes everything at the
    // end and fails this by construction
    val n = 20000
    val db = exportDir().resolve("streamy.sqlite")
    var sizeAtHalf = -1L
    def rows(): Iterator[(Long, IndexedSeq[Any])] = (1 to n).iterator.map { i =>
      if (i == n / 2) sizeAtHalf = Files.size(db)
      (i.toLong, IndexedSeq[Any]("x" * 100 + i))
    }
    SqliteWriter.writeStreamed(db, Seq(
      SqliteWriter.StreamedTable("t", "CREATE TABLE t (a TEXT)", rows _)))
    val total = Files.size(db)
    assert(sizeAtHalf > total / 3,
      s"only $sizeAtHalf of $total bytes on disk at half-consumption — buffering")
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db, "SELECT count(*) FROM t;") == Seq(n.toString))
  }

  test("bulk export: parallel over segments, per-segment error isolation") {
    engine.schemas.put("exp-bulk",
      "CREATE TABLE b (id INTEGER PRIMARY KEY, v TEXT);")
    (1 to 6).foreach { i =>
      engine.provisionWritable(s"exp-bulk-$i", "exp-bulk")
      engine.write(s"exp-bulk-$i", s"INSERT INTO b (v) VALUES ('seg$i');")
    }
    val out = exportDir()
    val res = engine.store.exportSqliteSegments(
      (1 to 6).map(i => s"exp-bulk-$i") :+ "exp-bulk-missing", out.toString)
    assert(res("exp-bulk-missing").isFailure)
    assert(res("exp-bulk-missing").failed.get.getMessage.contains("does not exist"))
    (1 to 6).foreach { i =>
      val db = Path.of(res(s"exp-bulk-$i").get)
      assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
      assert(sqlite3(db, "SELECT v FROM b;") == Seq(s"seg$i"))
    }
  }

  test("empty tables and tables without a rowid alias export validly") {
    engine.schemas.put("exp-empty",
      "CREATE TABLE empty_t (id INTEGER PRIMARY KEY, v TEXT); " +
        "CREATE TABLE noalias (name TEXT, score REAL, PRIMARY KEY (name));")
    engine.provisionWritable("exp-d", "exp-empty")
    engine.write("exp-d",
      "INSERT INTO noalias (name, score) VALUES ('a', 1.0), ('b', 2.0);")
    val db = exportDir().resolve("expD.sqlite")
    engine.store.exportSqliteSegment("exp-d", db.toString)
    assert(sqlite3(db, "PRAGMA integrity_check;") == Seq("ok"))
    assert(sqlite3(db, "SELECT count(*) FROM empty_t;") == Seq("0"))
    assert(sqlite3(db, "SELECT name, score FROM noalias ORDER BY name;") ==
      Seq("a|1.0", "b|2.0"))
  }
}
