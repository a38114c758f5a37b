package graft.engine

import java.nio.file.{Files, Path}

import scala.sys.process._

import graft.SparkSpecBase

/** SQL views end to end: write-script CREATE/DROP VIEW, read-time
  * resolution (single-segment, cross-segment, fanout), atomicity,
  * error-message parity with SQLite, `.sqlite` ingest of catalog views,
  * export of views into `sqlite_master`, and lifecycle travel
  * (promote/import/delete). SQLite's contract throughout: a view is
  * stored TEXT resolved at query time (sqlite.org/lang_createview.html),
  * which is exactly what the segment view registry holds. */
class ViewSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-views").toString
  private lazy val durable = Files.createTempDirectory("graft-views-durable").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private val ddl =
    "CREATE TABLE items (id INTEGER PRIMARY KEY, name TEXT, qty INTEGER);"

  private def freshSeg(id: String): String = {
    engine.schemas.put("view-schema", ddl)
    engine.provisionWritable(id, "view-schema")
    engine.write(id,
      """INSERT INTO items VALUES (1, 'apple', 5);
        |INSERT INTO items VALUES (2, 'banana', 0);
        |INSERT INTO items VALUES (3, 'cherry', 12);""".stripMargin)
    id
  }

  private def rows(seg: String, sql: String): String =
    engine.resultJson(engine.read(seg, sql))

  // ----------------------------------------------------- write-script DDL

  test("CREATE VIEW via write script; reads resolve it like a table") {
    val seg = freshSeg("v-basic")
    engine.write(seg, "CREATE VIEW in_stock AS SELECT name, qty FROM items WHERE qty > 0;")
    assert(rows(seg, "SELECT * FROM in_stock ORDER BY name;") ==
      "[{\"name\":\"apple\",\"qty\":5},\n{\"name\":\"cherry\",\"qty\":12}]\n")
    // views compose with the rest of the read surface
    assert(rows(seg, "SELECT count(*) AS n, sum(qty) AS total FROM in_stock;") ==
      "[{\"n\":2,\"total\":17}]\n")
  }

  test("view column rename list (CREATE VIEW v(a,b) AS ...)") {
    val seg = freshSeg("v-cols")
    engine.write(seg, "CREATE VIEW pairs (label, amount) AS SELECT name, qty FROM items;")
    assert(rows(seg, "SELECT label, amount FROM pairs WHERE amount = 12;") ==
      "[{\"label\":\"cherry\",\"amount\":12}]\n")
  }

  test("view-on-view resolves in creation order") {
    val seg = freshSeg("v-nested")
    engine.write(seg,
      """CREATE VIEW in_stock AS SELECT name, qty FROM items WHERE qty > 0;
        |CREATE VIEW big_stock AS SELECT name FROM in_stock WHERE qty > 6;""".stripMargin)
    assert(rows(seg, "SELECT * FROM big_stock;") == "[{\"name\":\"cherry\"}]\n")
  }

  test("views visible to later statements in the SAME transaction") {
    val seg = freshSeg("v-same-txn")
    engine.write(seg,
      """CREATE VIEW in_stock AS SELECT name, qty FROM items WHERE qty > 0;
        |CREATE TABLE snapshot (name TEXT, qty INTEGER);
        |INSERT INTO snapshot SELECT name, qty FROM in_stock;""".stripMargin)
    assert(rows(seg, "SELECT count(*) AS n FROM snapshot;") == "[{\"n\":2}]\n")
  }

  test("DROP VIEW removes it; IF EXISTS tolerates absence") {
    val seg = freshSeg("v-drop")
    engine.write(seg, "CREATE VIEW v1 AS SELECT name FROM items;")
    engine.write(seg, "DROP VIEW v1;")
    intercept[Exception](engine.read(seg, "SELECT * FROM v1;"))
    engine.write(seg, "DROP VIEW IF EXISTS v1;") // no error
    val e = intercept[Exception](engine.write(seg, "DROP VIEW v1;"))
    assert(e.getMessage.contains("no such view: v1"))
  }

  test("failed script leaves no view behind (transaction atomicity)") {
    val seg = freshSeg("v-atomic")
    intercept[Exception](engine.write(seg,
      """CREATE VIEW ghost AS SELECT name FROM items;
        |INSERT INTO nosuch VALUES (1);""".stripMargin))
    assert(!engine.store.viewExists(seg, "ghost"))
    intercept[Exception](engine.read(seg, "SELECT * FROM ghost;"))
  }

  // --------------------------------------------- SQLite error-text parity

  test("namespace and modify errors match SQLite's messages") {
    val seg = freshSeg("v-errors")
    engine.write(seg, "CREATE VIEW w AS SELECT name FROM items;")
    // collisions (sqlite3: "table items already exists" / "view w already exists")
    assert(intercept[Exception](engine.write(seg, "CREATE VIEW items AS SELECT 1;"))
      .getMessage.contains("table items already exists"))
    assert(intercept[Exception](engine.write(seg, "CREATE TABLE w (x INTEGER);"))
      .getMessage.contains("view w already exists"))
    // wrong DROP flavor
    assert(intercept[Exception](engine.write(seg, "DROP TABLE w;"))
      .getMessage.contains("use DROP VIEW to delete view w"))
    assert(intercept[Exception](engine.write(seg, "DROP VIEW items;"))
      .getMessage.contains("use DROP TABLE to delete table items"))
    // DML against a view
    assert(intercept[Exception](engine.write(seg, "INSERT INTO w VALUES ('x');"))
      .getMessage.contains("cannot modify w because it is a view"))
    assert(intercept[Exception](engine.write(seg, "UPDATE w SET name = 'x';"))
      .getMessage.contains("cannot modify w because it is a view"))
    assert(intercept[Exception](engine.write(seg, "DELETE FROM w;"))
      .getMessage.contains("cannot modify w because it is a view"))
    assert(intercept[Exception](engine.write(seg, "CREATE INDEX ix ON w (name);"))
      .getMessage.contains("views may not be indexed"))
    // duplicate view: error without IF NOT EXISTS, quiet with
    assert(intercept[Exception](engine.write(seg, "CREATE VIEW w AS SELECT 2;"))
      .getMessage.contains("view w already exists"))
    engine.write(seg, "CREATE VIEW IF NOT EXISTS w AS SELECT 2;")
    assert(rows(seg, "SELECT count(*) AS n FROM w;") == "[{\"n\":3}]\n")
  }

  test("dangling view: legal to hold, errors only when referenced (SQLite contract)") {
    val seg = freshSeg("v-dangling")
    engine.write(seg,
      """CREATE TABLE doomed (x INTEGER);
        |INSERT INTO doomed VALUES (7);
        |CREATE VIEW over_doomed AS SELECT x FROM doomed;""".stripMargin)
    assert(rows(seg, "SELECT * FROM over_doomed;") == "[{\"x\":7}]\n")
    engine.write(seg, "DROP TABLE doomed;")
    // other reads on the segment still work
    assert(rows(seg, "SELECT count(*) AS n FROM items;") == "[{\"n\":3}]\n")
    // using the broken view surfaces its resolution error, named
    val e = intercept[Exception](engine.read(seg, "SELECT * FROM over_doomed;"))
    assert(e.getMessage.contains("over_doomed"))
  }

  // ------------------------------------------------------- provision path

  test("provision schema may declare views (segment-manager scripts)") {
    engine.schemas.put("schema-with-view",
      ddl + " CREATE VIEW named AS SELECT name FROM items;")
    engine.provisionWritable("v-provisioned", "schema-with-view")
    engine.write("v-provisioned", "INSERT INTO items VALUES (1, 'kiwi', 1);")
    assert(rows("v-provisioned", "SELECT * FROM named;") == "[{\"name\":\"kiwi\"}]\n")
  }

  // ------------------------------------------------- cross-segment reads

  test("readAll resolves views consistent across matched segments") {
    freshSeg("vall-1"); freshSeg("vall-2")
    Seq("vall-1", "vall-2").foreach(s => engine.write(s,
      "CREATE VIEW in_stock AS SELECT name, qty FROM items WHERE qty > 0;"))
    val df = engine.readAll(
      "SELECT count(*) AS n FROM in_stock;", segmentRegex = "^vall-")
    assert(df.collect().head.getLong(0) == 4)
    // conflicting definitions error only when the view is referenced
    engine.write("vall-2",
      "DROP VIEW in_stock; CREATE VIEW in_stock AS SELECT name FROM items;")
    val e = intercept[Exception](engine.readAll(
      "SELECT count(*) AS n FROM in_stock;", segmentRegex = "^vall-"))
    assert(e.getMessage.contains("conflicting definitions"))
    val ok = engine.readAll(
      "SELECT count(*) AS n FROM items;", segmentRegex = "^vall-")
    assert(ok.collect().head.getLong(0) == 6)
  }

  test("fanout (isolated mode) reads per-segment views") {
    freshSeg("vfan-1"); freshSeg("vfan-2")
    Seq("vfan-1", "vfan-2").foreach(s => engine.write(s,
      "CREATE VIEW in_stock AS SELECT name FROM items WHERE qty > 0;"))
    val res = engine.fanout(Seq("vfan-1", "vfan-2"), "SELECT count(*) AS n FROM in_stock;")
    assert(res.perSegment.size == 2 &&
      res.perSegment.forall(_._2.get.head.getLong(0) == 2))
  }

  // ------------------------------------------------------ .sqlite ingest

  private def makeDb(name: String, sql: String): Path = {
    val dir = Files.createTempDirectory("sqlite-view-fixture")
    val db = dir.resolve(s"$name.sqlite")
    val rc = SqliteCli.run(db.toString, sql)
    assert(rc == 0, s"sqlite3 exited $rc")
    db
  }

  test("ingest carries sqlite_master views into the segment registry") {
    val db = makeDb("withview",
      """CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER);
        |INSERT INTO t VALUES (1, 10), (2, 20), (3, 30);
        |CREATE VIEW doubled AS SELECT id, v * 2 AS dv FROM t;""".stripMargin)
    engine.store.ingestSqliteSegment(db.toString, "v-ingested")
    assert(rows("v-ingested", "SELECT dv FROM doubled WHERE id = 2;") ==
      "[{\"dv\":40}]\n")
  }

  test("distributed bulk ingest carries views too") {
    val dbs = (1 to 3).map { i =>
      s"v-bulk-$i" -> makeDb(s"bulk$i",
        s"""CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER);
           |INSERT INTO t VALUES (1, ${i * 100});
           |CREATE VIEW vv AS SELECT v + 1 AS v1 FROM t;""".stripMargin).toString
    }.toMap
    val res = engine.store.ingestSqliteSegmentsDistributed(dbs)
    assert(res.values.forall(_.isSuccess))
    assert(rows("v-bulk-2", "SELECT v1 FROM vv;") == "[{\"v1\":201}]\n")
  }

  // ------------------------------------------------------ .sqlite export

  test("export writes views into sqlite_master; real sqlite3 queries them") {
    val seg = freshSeg("v-export")
    engine.write(seg,
      "CREATE VIEW in_stock AS SELECT name, qty FROM items WHERE qty > 0;")
    val out = Files.createTempDirectory("view-export").resolve("seg.sqlite")
    engine.store.exportSqliteSegment(seg, out.toString)
    def q(sql: String): String = Seq(SqliteCli.binary, out.toString, sql).!!.trim
    assert(q("PRAGMA integrity_check;") == "ok")
    assert(q("SELECT type FROM sqlite_master WHERE name = 'in_stock';") == "view")
    assert(q("SELECT name FROM in_stock ORDER BY name;") == "apple\ncherry")
  }

  test("view round trip: export -> re-ingest preserves definition") {
    val seg = freshSeg("v-round")
    engine.write(seg, "CREATE VIEW totals AS SELECT sum(qty) AS s FROM items;")
    val out = Files.createTempDirectory("view-round").resolve("seg.sqlite")
    engine.store.exportSqliteSegment(seg, out.toString)
    engine.store.ingestSqliteSegment(out.toString, "v-round-back")
    assert(rows("v-round-back", "SELECT s FROM totals;") == "[{\"s\":17}]\n")
  }

  // ----------------------------------------------------- lifecycle travel

  test("views travel with promote/import and die with deleteSegment") {
    val seg = freshSeg("v-life")
    engine.write(seg, "CREATE VIEW named AS SELECT name FROM items;")
    engine.store.promote(seg, durable)
    engine.store.deleteSegment(seg)
    assert(!engine.store.segmentExists(seg) && !engine.store.viewExists(seg, "named"))
    engine.store.importSegment(seg, durable)
    assert(rows(seg, "SELECT count(*) AS n FROM named;") == "[{\"n\":3}]\n")
  }
}
