package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** SQLite generated columns (3.31, lang_createtable.html#gencol)
  * end-to-end, DIFFERENTIAL against the sandbox `sqlite3` CLI:
  * computation (VIRTUAL + STORED, forward references), the prepare-
  * time refusals with SQLite's exact texts, constraint interaction,
  * ALTER ADD, RETURNING, and the `.sqlite` boundary both ways — the
  * exported record layout must OMIT virtual slots (real sqlite3
  * re-derives them), and ingest must re-derive them from a file the
  * real CLI wrote. */
class GeneratedColumnsSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-gencol").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"gc-$n"
    engine.schemas.put(s"gc-schema-$n", schema)
    engine.provisionWritable(id, s"gc-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("gc-cli", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString, schema) == 0)
    db
  }

  private def runBoth(id: String, db: Path, script: String): Unit = {
    engine.write(id, script)
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") == 0, s"sqlite3 failed: $script")
  }

  private def render(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map { i =>
      if (r.isNullAt(i)) ""
      else r.get(i) match {
        case l: Long => l.toString
        case d: Double => d.toString
        case s: String => s
        case other => other.toString
      }
    }.mkString("|")

  private def same(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map(render).mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- sqlite3 --\n$cliSide\n-- for --\n$select")
  }

  private val schema =
    "CREATE TABLE t (a INTEGER, b INTEGER, " +
      "s INTEGER GENERATED ALWAYS AS (a + b) STORED, " +
      "v TEXT AS (upper(c) || a), c TEXT);"

  test("VIRTUAL and STORED columns compute on INSERT and read back") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, "INSERT INTO t (a, b, c) VALUES (1, 2, 'x'), (3, 4, 'y');")
    same(id, db, "SELECT a, b, s, v, c FROM t ORDER BY a;")
    // bare VALUES takes the BASE columns only
    runBoth(id, db, "INSERT INTO t VALUES (7, 8, 'q');")
    same(id, db, "SELECT a, b, s, v, c FROM t ORDER BY a;")
  }

  test("UPDATE of a base column recomputes dependents; direct writes refused") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, "INSERT INTO t (a, b, c) VALUES (1, 2, 'x'), (3, 4, 'y');")
    runBoth(id, db, "UPDATE t SET a = 100 WHERE c = 'x';")
    same(id, db, "SELECT a, b, s, v, c FROM t ORDER BY a;")
    // SQLite's exact refusals (probed)
    val e1 = intercept[Exception] {
      engine.write(id, "INSERT INTO t (a, b, s, c) VALUES (1, 2, 99, 'z');")
    }
    assert(e1.getMessage.contains("""cannot INSERT into generated column "s""""))
    val e2 = intercept[Exception] { engine.write(id, "UPDATE t SET s = 5;") }
    assert(e2.getMessage.contains("""cannot UPDATE generated column "s""""))
  }

  test("prepare-time refusals: DEFAULT, PRIMARY KEY, subquery") {
    def bad(ddl: String, msg: String): Unit = {
      val e = intercept[Exception] { SqliteDdl.parseCreateTable(ddl) }
      assert(e.getMessage.contains(msg), s"$ddl -> ${e.getMessage}")
    }
    bad("CREATE TABLE g (a INT, s INT AS (a+1) DEFAULT 3)",
      "cannot use DEFAULT on a generated column")
    bad("CREATE TABLE g (a INT, s INT AS (a+1) PRIMARY KEY)",
      "generated columns cannot be part of the PRIMARY KEY")
    bad("CREATE TABLE g (a INT, s INT AS (a+1), PRIMARY KEY (s))",
      "generated columns cannot be part of the PRIMARY KEY")
    bad("CREATE TABLE g (a INT, s INT AS ((SELECT 1)))",
      "subqueries prohibited in generated columns")
  }

  test("forward reference works; a circular reference errors at write time") {
    val fwd = "CREATE TABLE g4 (a INT, s1 INT AS (s2 + 1), s2 INT AS (a * 2));"
    val id = seg(fwd); val db = cliDb(fwd)
    runBoth(id, db, "INSERT INTO g4 (a) VALUES (5);")
    same(id, db, "SELECT a, s1, s2 FROM g4;")
    // CREATE succeeds, the first write errors — SQLite's own staging
    val loop = "CREATE TABLE g6 (a INT, s1 INT AS (s2+1), s2 INT AS (s1*2));"
    val id2 = seg(loop)
    val e = intercept[Exception] {
      engine.write(id2, "INSERT INTO g6 (a) VALUES (1);")
    }
    assert(e.getMessage.contains("generated column loop on"))
  }

  test("NOT NULL and CHECK constraints gate generated values") {
    val s = "CREATE TABLE g7 (a INT, s INT AS (a + 1) NOT NULL);"
    val id = seg(s)
    val e = intercept[Exception] { engine.write(id, "INSERT INTO g7 (a) VALUES (NULL);") }
    assert(e.getMessage.contains("NOT NULL constraint failed: g7.s"))
    val s2 = "CREATE TABLE g8 (a INT, s INT AS (a + 1) CHECK (s < 10));"
    val id2 = seg(s2)
    engine.write(id2, "INSERT INTO g8 (a) VALUES (1);")
    val e2 = intercept[Exception] { engine.write(id2, "INSERT INTO g8 (a) VALUES (20);") }
    assert(e2.getMessage.contains("CHECK constraint failed"))
  }

  test("ALTER TABLE ADD COLUMN: VIRTUAL backfills, STORED refused") {
    val s = "CREATE TABLE t2 (a INTEGER, b INTEGER);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, "INSERT INTO t2 VALUES (1, 10), (2, 20);")
    runBoth(id, db, "ALTER TABLE t2 ADD COLUMN z3 INT AS (a + 100);")
    same(id, db, "SELECT a, b, z3 FROM t2 ORDER BY a;")
    val e = intercept[Exception] {
      engine.write(id, "ALTER TABLE t2 ADD COLUMN z4 INT AS (a+1) STORED;")
    }
    assert(e.getMessage.contains("cannot add a STORED column"))
  }

  test("RETURNING reports computed generated values") {
    val id = seg(schema)
    val rets = engine.writeReturning(id,
      "INSERT INTO t (a, b, c) VALUES (10, 20, 'kk') RETURNING s, v;")
    assert(rets.length == 1)
    assert(rets.head._2.map(render) == Seq("30|KK10"))
  }

  test("UPDATE…FROM recomputes generated columns too") {
    val s = "CREATE TABLE inv (k INTEGER PRIMARY KEY, qty INTEGER, " +
      "dbl INTEGER AS (qty * 2));\n" +
      "CREATE TABLE d (k INTEGER PRIMARY KEY, amt INTEGER);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db,
      "INSERT INTO inv (k, qty) VALUES (1, 10), (2, 20);\nINSERT INTO d VALUES (1, 5);")
    runBoth(id, db, "UPDATE inv SET qty = qty - d.amt FROM d WHERE inv.k = d.k;")
    same(id, db, "SELECT k, qty, dbl FROM inv ORDER BY k;")
  }

  test("export: real sqlite3 reads virtual+stored values from our bytes") {
    val id = seg(schema)
    engine.write(id, "INSERT INTO t (a, b, c) VALUES (1, 2, 'x'), (3, 4, 'y');")
    val out = Files.createTempDirectory("gc-export").resolve("t.sqlite")
    engine.store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    assert(SqliteCli.query(out.toString,
      "SELECT a, b, s, v, c FROM t ORDER BY a;") == "1|2|3|X1|x\n3|4|7|Y3|y")
    // the DDL itself must carry the clauses for sqlite3 to re-derive
    val ddl = SqliteCli.query(out.toString,
      "SELECT sql FROM sqlite_master WHERE name = 't';")
    assert(ddl.toUpperCase.contains("STORED") && ddl.toUpperCase.contains("VIRTUAL"))
  }

  test("ingest: virtual slots re-derive from a file the real CLI wrote") {
    val db = cliDb(schema)
    assert(SqliteCli.run(db.toString,
      "INSERT INTO t (a, b, c) VALUES (1, 2, 'x'), (3, 4, 'y'), (5, 6, NULL);") == 0)
    val tables = engine.store.ingestSqliteSegment(db.toString, "gc-ing-1")
    assert(tables == Seq("t"))
    val got = engine.read("gc-ing-1",
      "SELECT a, b, s, v, c FROM t ORDER BY a;").collect().map(render).mkString("\n")
    assert(got == SqliteCli.query(db.toString, "SELECT a, b, s, v, c FROM t ORDER BY a;"))
  }

  test("export→ingest round trip preserves generated definitions") {
    val id = seg(schema)
    engine.write(id, "INSERT INTO t (a, b, c) VALUES (9, 1, 'rt');")
    val out = Files.createTempDirectory("gc-rt").resolve("t.sqlite")
    engine.store.exportSqliteSegment(id, out.toString)
    engine.store.ingestSqliteSegment(out.toString, "gc-rt-2")
    // acquire the write lock on the ingested segment
    engine.schemas.put("gc-rt-lock", "CREATE TABLE unused_ (x INTEGER);")
    engine.provisionWritable("gc-rt-2", "gc-rt-lock")
    // definitions survived: INSERT computes, direct write still refused
    engine.write("gc-rt-2", "INSERT INTO t (a, b, c) VALUES (2, 3, 'zz');")
    val got = engine.read("gc-rt-2",
      "SELECT a, b, s, v, c FROM t ORDER BY a;").collect().map(render).mkString("\n")
    assert(got == "2|3|5|ZZ2|zz\n9|1|10|RT9|rt")
    val e = intercept[Exception] { engine.write("gc-rt-2", "UPDATE t SET s = 1;") }
    assert(e.getMessage.contains("cannot UPDATE generated column"))
  }
}
