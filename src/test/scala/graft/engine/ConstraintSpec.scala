package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** Column constraints and defaults through the write path: NOT NULL
  * enforcement with SQLite's exact failure texts, DEFAULT clauses
  * (literals, expressions, CURRENT_* keywords) filled on omitted
  * columns and `DEFAULT VALUES`, ALTER TABLE ADD COLUMN recording, and
  * the `.sqlite` export round trip re-rendering the clauses so real
  * sqlite3 enforces them. Behaviors probed against the sandbox CLI. */
class ConstraintSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-constraint").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"cons-$n"
    engine.schemas.put(s"cons-schema-$n", schema)
    engine.provisionWritable(id, s"cons-schema-$n")
    id
  }

  test("INSERT of NULL into a NOT NULL column: SQLite's text, nothing commits") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT NOT NULL);")
    // sqlite3: Error: NOT NULL constraint failed: t.v
    val e = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (1, 'ok'); INSERT INTO t VALUES (2, NULL);"))
    assert(e.getMessage == "NOT NULL constraint failed: t.v")
    assert(engine.read(id, "SELECT count(*) AS n FROM t;").collect()(0).getLong(0) == 0L)
  }

  test("omitting a NOT NULL column without a default fails the same way") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT NOT NULL);")
    val e = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t (k) VALUES (1);"))
    assert(e.getMessage == "NOT NULL constraint failed: t.v")
  }

  test("DEFAULT literals and expressions fill omitted columns (sqlite3-checked shapes)") {
    // sqlite3: INSERT INTO t (a) VALUES (5) → 5|hello world|3
    val id = seg("CREATE TABLE t (a INTEGER, b TEXT DEFAULT 'hello world', " +
      "n INTEGER DEFAULT (1+2));")
    engine.write(id, "INSERT INTO t (a) VALUES (5);")
    val r = engine.read(id, "SELECT a, b, n FROM t;").collect()(0)
    assert((r.getLong(0), r.getString(1), r.getLong(2)) == ((5L, "hello world", 3L)))
  }

  test("NOT NULL plus DEFAULT: the default satisfies the constraint") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, " +
      "status TEXT NOT NULL DEFAULT 'new');")
    engine.write(id, "INSERT INTO t (k) VALUES (1);")
    assert(engine.read(id, "SELECT status FROM t;").collect()(0).getString(0) == "new")
  }

  test("INSERT ... DEFAULT VALUES, incl. the rowid-alias auto-assign") {
    val id = seg("CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT, " +
      "v TEXT DEFAULT 'd', n INTEGER DEFAULT -7);")
    engine.write(id, "INSERT INTO t DEFAULT VALUES; INSERT INTO t DEFAULT VALUES;")
    val rows = engine.read(id, "SELECT id, v, n FROM t ORDER BY id;").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "d", -7L), (2L, "d", -7L)))
  }

  test("DEFAULT CURRENT_TIMESTAMP fills SQLite's text shape") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, " +
      "at TEXT DEFAULT CURRENT_TIMESTAMP);")
    engine.write(id, "INSERT INTO t (k) VALUES (1);")
    val at = engine.read(id, "SELECT at FROM t;").collect()(0).getString(0)
    assert(at.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"), at)
  }

  test("ALTER ADD COLUMN: default backfills AND applies to later inserts; " +
      "NOT-NULL-no-default refused only when rows exist") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY);")
    engine.write(id, "INSERT INTO t VALUES (1);" +
      "ALTER TABLE t ADD COLUMN v TEXT DEFAULT 'filled';" +
      "INSERT INTO t (k) VALUES (2);")
    assert(engine.read(id, "SELECT k, v FROM t ORDER BY k;").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "filled"), (2L, "filled")))
    // sqlite3 (3.35+): refused with rows present, fine on empty tables
    val e = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t ADD COLUMN w TEXT NOT NULL;"))
    assert(e.getMessage == "Cannot add a NOT NULL column with default value NULL")
    engine.write(id, "CREATE TABLE empty_t (k INTEGER);" +
      "ALTER TABLE empty_t ADD COLUMN w TEXT NOT NULL;")
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO empty_t (k) VALUES (1);"))
    assert(e2.getMessage == "NOT NULL constraint failed: empty_t.w")
  }

  test("inline and table-level UNIQUE constraints enforced with SQLite's text") {
    val id = seg("CREATE TABLE z (id INTEGER PRIMARY KEY, v TEXT UNIQUE, " +
      "a INTEGER, b INTEGER, UNIQUE (a, b));")
    engine.write(id, "INSERT INTO z VALUES (1, 'a', 1, 1);")
    // sqlite3: Error: UNIQUE constraint failed: z.v
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO z VALUES (2, 'a', 2, 2);"))
    assert(e1.getMessage == "UNIQUE constraint failed: z.v")
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO z VALUES (2, 'b', 1, 1);"))
    assert(e2.getMessage == "UNIQUE constraint failed: z.a, z.b")
    // distinct-NULLs rule and non-conflicting rows pass
    engine.write(id,
      "INSERT INTO z VALUES (2, NULL, 1, 2); INSERT INTO z VALUES (3, NULL, 2, 1);")
    assert(engine.read(id, "SELECT count(*) AS n FROM z;").collect()(0).getLong(0) == 3L)
  }

  test("UNIQUE dedup mirrors SQLite: a list equal to the PK or an earlier UNIQUE is dropped") {
    // probed: PRIMARY KEY(a), UNIQUE(a), UNIQUE(b), UNIQUE(b) catalogs
    // exactly two autoindexes (the PK's and one for b)
    val td = SqliteDdl.parseCreateTable(
      "CREATE TABLE x (a TEXT, b INT, PRIMARY KEY(a), UNIQUE(a), UNIQUE(b), UNIQUE(b))")
    assert(td.uniques == Seq(Seq("b")))
  }

  test("ALTER ADD COLUMN refuses UNIQUE and PRIMARY KEY like SQLite") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY);")
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t ADD COLUMN u INT UNIQUE;"))
    assert(e1.getMessage == "Cannot add a UNIQUE column")
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t ADD COLUMN p INT PRIMARY KEY;"))
    assert(e2.getMessage == "Cannot add a PRIMARY KEY column")
  }

  test("export materializes UNIQUE autoindex trees real sqlite3 verifies and uses") {
    val id = seg("CREATE TABLE z (id INTEGER PRIMARY KEY, v TEXT UNIQUE, " +
      "a INTEGER, b INTEGER, UNIQUE (a, b));")
    engine.write(id, "INSERT INTO z VALUES (1, 'x', 1, 10), (2, 'y', 2, 20), " +
      "(3, NULL, 3, 30);")
    val db = Files.createTempDirectory("cons-uexport").resolve("u.sqlite")
    engine.store.exportSqliteSegment(id, db.toString)
    assert(SqliteCli.query(db.toString, "PRAGMA integrity_check;") == "ok")
    // both constraint trees cataloged, numbered in declaration order
    assert(SqliteCli.query(db.toString,
      "SELECT name FROM sqlite_master WHERE type='index' ORDER BY name;") ==
      "sqlite_autoindex_z_1\nsqlite_autoindex_z_2")
    // sqlite3's planner answers a point lookup THROUGH the v autoindex
    assert(SqliteCli.query(db.toString,
      "EXPLAIN QUERY PLAN SELECT id FROM z WHERE v = 'y';")
      .contains("sqlite_autoindex_z_1"))
    assert(SqliteCli.query(db.toString, "SELECT id FROM z WHERE v = 'y';") == "2")
    // and sqlite3 itself enforces the exported constraint
    assert(SqliteCli.run(db.toString, "INSERT INTO z VALUES (9, 'x', 9, 9);") != 0)
    // re-ingest recovers the records for our own gate
    engine.store.ingestSqliteSegment(db.toString, s"cons-uback-$n")
    assert(engine.store.tableMeta(s"cons-uback-$n", "z").uniques
      .map(_.map(_.toLowerCase)) == Seq(Seq("v"), Seq("a", "b")))
  }

  test("CHECK constraints: sqlite3's labels, NULL passes, column + table + named forms") {
    val id = seg("CREATE TABLE t (a INTEGER CHECK (a > 0), b INTEGER, " +
      "CONSTRAINT bpos CHECK (b > a), CHECK (b < 100));")
    // sqlite3: CHECK constraint failed: a > 0
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (-1, 5);"))
    assert(e1.getMessage == "CHECK constraint failed: a > 0")
    // sqlite3: CHECK constraint failed: bpos (the named form)
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (2, 1);"))
    assert(e2.getMessage == "CHECK constraint failed: bpos")
    val e3 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (1, 500);"))
    assert(e3.getMessage == "CHECK constraint failed: b < 100")
    // a NULL operand makes the check pass (probed: sqlite3 accepts)
    engine.write(id, "INSERT INTO t VALUES (NULL, 5);")
    assert(engine.read(id, "SELECT count(*) AS n FROM t;").collect()(0).getLong(0) == 1L)
    // UPDATEs that break a check fail the same gate
    engine.write(id, "INSERT INTO t VALUES (3, 7);")
    val e4 = intercept[IllegalArgumentException](engine.write(id,
      "UPDATE t SET a = -3 WHERE a = 3;"))
    assert(e4.getMessage == "CHECK constraint failed: a > 0")
  }

  test("CHECK with a QUOTED-identifier column ref stays in the UPDATE statement gate") {
    // r19 (r18 advice): the UPDATE gate is narrowed to constraints the
    // assigned columns can break; that mention-scan must see a column
    // referenced as "c" (quoted identifier). Pre-fix, blankLiterals
    // erased the quoted name, the CHECK dropped out of the statement
    // gate, and a later statement in the same script washed the commit
    // gate — silently committing a state sqlite3 rejects mid-script.
    val id = seg("""CREATE TABLE t (id INTEGER PRIMARY KEY, c INTEGER, CHECK("c" > 0));""")
    engine.write(id, "INSERT INTO t VALUES (1, 5);")
    // sqlite3 (3.51.2, probed): errors at the first UPDATE with the
    // DEQUOTED label `c` (unnamed-CHECK names dequote like
    // identifiers); the wash statement never runs
    val e = intercept[IllegalArgumentException](engine.write(id,
      "UPDATE t SET c = -1 WHERE id = 1; UPDATE t SET c = 7 WHERE id = 1;"))
    assert(e.getMessage == "CHECK constraint failed: c")
    assert(engine.read(id, "SELECT c FROM t;").collect()(0).getLong(0) == 5L)
    // backtick form resolves (and labels) the same way
    val id2 = seg("CREATE TABLE t (id INTEGER PRIMARY KEY, c INTEGER, CHECK(`c` > 0));")
    engine.write(id2, "INSERT INTO t VALUES (1, 5);")
    val e2 = intercept[IllegalArgumentException](engine.write(id2,
      "UPDATE t SET c = -1 WHERE id = 1; UPDATE t SET c = 7 WHERE id = 1;"))
    assert(e2.getMessage == "CHECK constraint failed: c")
    assert(engine.read(id2, "SELECT c FROM t;").collect()(0).getLong(0) == 5L)
  }

  test("export re-renders CHECK constraints so real sqlite3 enforces them") {
    val id = seg("CREATE TABLE t (a INTEGER CHECK (a > 0), " +
      "CONSTRAINT cap CHECK (a < 1000));")
    engine.write(id, "INSERT INTO t VALUES (5);")
    val db = Files.createTempDirectory("cons-cexport").resolve("c.sqlite")
    engine.store.exportSqliteSegment(id, db.toString)
    assert(SqliteCli.query(db.toString, "PRAGMA integrity_check;") == "ok")
    assert(SqliteCli.run(db.toString, "INSERT INTO t VALUES (-2);") != 0)
    assert(SqliteCli.run(db.toString, "INSERT INTO t VALUES (5000);") != 0)
    assert(SqliteCli.run(db.toString, "INSERT INTO t VALUES (6);") == 0)
    engine.store.ingestSqliteSegment(db.toString, s"cons-cback-$n")
    // column-attachment survives the round trip (r9): the inline CHECK
    // re-ingests as a's own constraint — what makes DROP COLUMN behave
    // like sqlite3's on re-exported files
    assert(engine.store.tableMeta(s"cons-cback-$n", "t").checks ==
      Seq(SqliteDdl.CheckDef("a > 0", "a > 0", ownerCol = "a"),
        SqliteDdl.CheckDef("cap", "a < 1000")))
  }

  test("export re-renders NOT NULL and DEFAULT so real sqlite3 enforces them") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, " +
      "v TEXT NOT NULL DEFAULT 'dflt', n INTEGER DEFAULT (2*3));")
    engine.write(id, "INSERT INTO t (k) VALUES (1);")
    val db = Files.createTempDirectory("cons-export").resolve("out.sqlite")
    engine.store.exportSqliteSegment(id, db.toString)
    // the exported DDL carries the clauses, and sqlite3 itself applies
    // them: defaults on insert-with-omission, refusal on NULL
    assert(SqliteCli.query(db.toString,
      "INSERT INTO t (k) VALUES (9); SELECT v, n FROM t WHERE k = 9;") == "dflt|6")
    val rc = SqliteCli.run(db.toString, "INSERT INTO t (k, v) VALUES (10, NULL);")
    assert(rc != 0, "sqlite3 should refuse NULL into the exported NOT NULL column")
    // and a re-ingest of the exported file recovers the constraint records
    engine.store.ingestSqliteSegment(db.toString, s"cons-back-$n")
    val meta = engine.store.tableMeta(s"cons-back-$n", "t")
    assert(meta.notNull.map(_.toLowerCase) == Seq("v"))
    assert(meta.defaults.map { case (k, v) => k.toLowerCase -> v } ==
      Map("v" -> "'dflt'", "n" -> "(2*3)"))
  }
}
