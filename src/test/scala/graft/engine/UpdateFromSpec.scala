package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** SQLite 3.33's `UPDATE … FROM` (lang_update.html §2) through the
  * write path, DIFFERENTIAL against the sandbox `sqlite3` CLI: the same
  * script runs on both engines and the resulting tables must render
  * identically. Fixtures keep join matches unique per target row — the
  * one corner SQLite itself leaves unspecified (which of several
  * matching FROM rows supplies the values) is exactly the corner the
  * docs tell users not to rely on, and both engines pick *a* row there.
  * (Reference write surface: trough/wsgi/write.py:28-40 accepts any
  * script the host libsqlite3 does — UPDATE…FROM included.) */
class UpdateFromSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-updfrom").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"uf-$n"
    engine.schemas.put(s"uf-schema-$n", schema)
    engine.provisionWritable(id, s"uf-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("uf-cli", ".db")
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

  private val invSchema =
    "CREATE TABLE inventory (itemid INTEGER PRIMARY KEY, qty INTEGER, note TEXT);\n" +
      "CREATE TABLE sales (saleid INTEGER PRIMARY KEY, itemid INTEGER, quantity INTEGER);"

  private val invSeed =
    "INSERT INTO inventory VALUES (1, 50, 'a'), (2, 30, 'b'), (3, 10, 'c'), (4, 5, 'd');\n" +
      "INSERT INTO sales VALUES (100, 1, 7), (101, 2, 30), (102, 3, 4);"

  test("join update: matched rows updated from the FROM row, others untouched") {
    val id = seg(invSchema); val db = cliDb(invSchema)
    runBoth(id, db, invSeed)
    val upd = "UPDATE inventory SET qty = qty - sales.quantity " +
      "FROM sales WHERE inventory.itemid = sales.itemid;"
    runBoth(id, db, upd)
    same(id, db, "SELECT itemid, qty, note FROM inventory ORDER BY itemid;")
  }

  test("FROM a grouped subquery — the documented aggregate-update pattern") {
    val id = seg(invSchema); val db = cliDb(invSchema)
    runBoth(id, db, invSeed +
      "\nINSERT INTO sales VALUES (103, 1, 3), (104, 1, 2);")
    val upd = "UPDATE inventory SET qty = qty - daily.amt, note = 'sold' " +
      "FROM (SELECT itemid AS i, sum(quantity) AS amt FROM sales GROUP BY itemid) AS daily " +
      "WHERE inventory.itemid = daily.i;"
    runBoth(id, db, upd)
    same(id, db, "SELECT itemid, qty, note FROM inventory ORDER BY itemid;")
  }

  test("target alias + self-join FROM") {
    val schema = "CREATE TABLE chain (k INTEGER PRIMARY KEY, v TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, "INSERT INTO chain VALUES (1,'one'),(2,'two'),(3,'three');")
    // each row takes its successor's label; row 3 has no successor
    val upd = "UPDATE chain AS a SET v = b.v FROM chain AS b WHERE a.k = b.k - 1;"
    runBoth(id, db, upd)
    same(id, db, "SELECT k, v FROM chain ORDER BY k;")
  }

  test("NULL values from the matched row really overwrite (hit-flag, not coalesce)") {
    val schema = "CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT);\n" +
      "CREATE TABLE u (k INTEGER PRIMARY KEY, v TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "INSERT INTO t VALUES (1,'keep'),(2,'kill');\nINSERT INTO u VALUES (2, NULL);")
    runBoth(id, db, "UPDATE t SET v = u.v FROM u WHERE t.k = u.k;")
    same(id, db, "SELECT k, coalesce(v, '<null>') FROM t ORDER BY k;")
  }

  test("SET expressions see the PRE-update target row") {
    val schema = "CREATE TABLE t (k INTEGER PRIMARY KEY, a INTEGER, b INTEGER);\n" +
      "CREATE TABLE m (k INTEGER PRIMARY KEY, d INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, "INSERT INTO t VALUES (1, 10, 20);\nINSERT INTO m VALUES (1, 5);")
    // b = a + d must use the ORIGINAL a even though a is also assigned
    runBoth(id, db, "UPDATE t SET a = a + m.d, b = a + m.d FROM m WHERE t.k = m.k;")
    same(id, db, "SELECT k, a, b FROM t ORDER BY k;")
  }

  test("WHERE-less FROM: a nonempty FROM relation updates every target row") {
    val schema = "CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER);\n" +
      "CREATE TABLE one (x INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, "INSERT INTO t VALUES (1, 1), (2, 2);\nINSERT INTO one VALUES (100);")
    runBoth(id, db, "UPDATE t SET v = v + one.x FROM one;")
    same(id, db, "SELECT k, v FROM t ORDER BY k;")
  }

  test("UPDATE…FROM fires UPDATE triggers per matched row") {
    val schema = "CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER);\n" +
      "CREATE TABLE m (k INTEGER PRIMARY KEY, d INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "INSERT INTO t VALUES (1, 10), (2, 20), (3, 30);\n" +
        "INSERT INTO m VALUES (1, 100), (3, 300);\n" +
        "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('k=' || OLD.k || ' ' || OLD.v || '->' || NEW.v); END;")
    runBoth(id, db, "UPDATE t SET v = m.d FROM m WHERE t.k = m.k;")
    same(id, db, "SELECT k, v FROM t ORDER BY k;")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
  }

  test("no-match FROM leaves the table byte-identical") {
    val id = seg(invSchema); val db = cliDb(invSchema)
    runBoth(id, db, invSeed)
    runBoth(id, db,
      "UPDATE inventory SET qty = 0 FROM sales WHERE inventory.itemid = sales.itemid + 999;")
    same(id, db, "SELECT itemid, qty, note FROM inventory ORDER BY itemid;")
  }
}
