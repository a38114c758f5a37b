package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** SQLite 3.35's `RETURNING` clause (lang_returning.html) through the
  * write path, DIFFERENTIAL against the sandbox `sqlite3` CLI, which
  * prints RETURNING rows to stdout. Row ORDER is documented as
  * unspecified, so both sides compare as sorted multisets. The wire
  * write path continues to DISCARD the rows, exactly as the
  * reference's executescript call does (trough/wsgi/write.py:40);
  * capture is the embedded `writeReturning` surface. */
class ReturningSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-returning").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"ret-$n"
    engine.schemas.put(s"ret-schema-$n", schema)
    engine.provisionWritable(id, s"ret-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("ret-cli", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString, schema) == 0)
    db
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

  /** Run `script` on both engines; the engine's captured RETURNING rows
    * must equal (as a sorted multiset) what the sqlite3 CLI printed. */
  private def sameReturning(id: String, db: Path, script: String): Unit = {
    val engineRows = engine.writeReturning(id, script)
      .flatMap(_._2).map(render).sorted
    val cliOut = {
      val out = Files.createTempFile("ret-cli-out", ".txt")
      try {
        val rc = SqliteCli.run(db.toString,
          s".bail on\nBEGIN;\n$script\nCOMMIT;\n", Some(out))
        assert(rc == 0, s"sqlite3 failed: $script")
        new String(Files.readAllBytes(out),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty).sorted
      } finally Files.deleteIfExists(out)
    }
    assert(engineRows == cliOut,
      s"\n-- engine --\n${engineRows.mkString("\n")}\n-- sqlite3 --\n${cliOut.mkString("\n")}")
  }

  /** Final table states must also agree (RETURNING must not perturb
    * the mutation itself). */
  private def sameTable(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map(render).mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- sqlite3 --\n$cliSide\n-- for --\n$select")
  }

  private val schema =
    "CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT, " +
      "amt INTEGER DEFAULT 7);"

  test("INSERT … RETURNING * reports generated rowids and defaults") {
    val id = seg(schema); val db = cliDb(schema)
    sameReturning(id, db,
      "INSERT INTO t (v) VALUES ('a'), ('b') RETURNING *;")
    sameTable(id, db, "SELECT id, v, amt FROM t ORDER BY id;")
  }

  test("RETURNING expressions: bare column, AS alias, computed") {
    val id = seg(schema); val db = cliDb(schema)
    val rets = engine.writeReturning(id,
      "INSERT INTO t (v, amt) VALUES ('x', 10) " +
        "RETURNING v, amt * 2 AS twice, upper(v);")
    assert(rets.length == 1)
    val (sch, rows) = rets.head
    // SQLite's output naming: bare column name, the alias, the expr text
    assert(sch.fieldNames.toSeq == Seq("v", "twice", "upper(v)"))
    assert(rows.map(render) == Seq("x|20|X"))
  }

  test("UPDATE … RETURNING reports the post-update image of changed rows") {
    val id = seg(schema); val db = cliDb(schema)
    val seed = "INSERT INTO t (v, amt) VALUES ('a', 1), ('b', 2), ('c', 3);"
    engine.write(id, seed); SqliteCli.run(db.toString, seed)
    sameReturning(id, db,
      "UPDATE t SET amt = amt * 100 WHERE v <> 'b' RETURNING id, v, amt;")
    sameTable(id, db, "SELECT id, v, amt FROM t ORDER BY id;")
  }

  test("DELETE … RETURNING reports the old image of removed rows") {
    val id = seg(schema); val db = cliDb(schema)
    val seed = "INSERT INTO t (v, amt) VALUES ('a', 1), ('b', 2), ('c', 3);"
    engine.write(id, seed); SqliteCli.run(db.toString, seed)
    sameReturning(id, db, "DELETE FROM t WHERE amt >= 2 RETURNING v, amt;")
    sameTable(id, db, "SELECT id, v, amt FROM t ORDER BY id;")
  }

  test("upsert DO UPDATE … RETURNING: post-update conflict row + fresh insert") {
    val s = "CREATE TABLE u (k INTEGER PRIMARY KEY, v TEXT, n INTEGER);"
    val id = seg(s); val db = cliDb(s)
    val seed = "INSERT INTO u VALUES (1, 'a', 1);"
    engine.write(id, seed); SqliteCli.run(db.toString, seed)
    sameReturning(id, db,
      "INSERT INTO u VALUES (1, 'b', 5), (2, 'c', 7) " +
        "ON CONFLICT(k) DO UPDATE SET v = excluded.v, n = n + excluded.n " +
        "RETURNING k, v, n;")
    sameTable(id, db, "SELECT k, v, n FROM u ORDER BY k;")
  }

  test("INSERT OR IGNORE … RETURNING reports only the rows actually kept") {
    val s = "CREATE TABLE u (k INTEGER PRIMARY KEY, v TEXT);"
    val id = seg(s); val db = cliDb(s)
    val seed = "INSERT INTO u VALUES (1, 'old');"
    engine.write(id, seed); SqliteCli.run(db.toString, seed)
    sameReturning(id, db,
      "INSERT OR IGNORE INTO u VALUES (1, 'dup'), (2, 'new') RETURNING *;")
    sameTable(id, db, "SELECT k, v FROM u ORDER BY k;")
  }

  test("UPDATE … FROM … RETURNING composes") {
    val s = "CREATE TABLE inv (k INTEGER PRIMARY KEY, qty INTEGER);\n" +
      "CREATE TABLE d (k INTEGER PRIMARY KEY, amt INTEGER);"
    val id = seg(s); val db = cliDb(s)
    val seed = "INSERT INTO inv VALUES (1, 10), (2, 20), (3, 30);\n" +
      "INSERT INTO d VALUES (1, 5), (3, 7);"
    engine.write(id, seed); SqliteCli.run(db.toString, seed)
    sameReturning(id, db,
      "UPDATE inv SET qty = qty - d.amt FROM d WHERE inv.k = d.k " +
        "RETURNING k, qty;")
    sameTable(id, db, "SELECT k, qty FROM inv ORDER BY k;")
  }

  test("multi-statement scripts attribute rows to their statement") {
    val s = "CREATE TABLE u (k INTEGER PRIMARY KEY, v TEXT);"
    val id = seg(s)
    val rets = engine.writeReturning(id,
      "INSERT INTO u VALUES (1, 'a') RETURNING k;\n" +
        "CREATE INDEX iu ON u (v);\n" + // non-DML between: must not re-report
        "INSERT INTO u VALUES (2, 'b'), (3, 'c') RETURNING k;\n" +
        "DELETE FROM u WHERE k = 2;") // no RETURNING: contributes nothing
    assert(rets.length == 2)
    assert(rets(0)._2.map(_.getLong(0)) == Seq(1L))
    assert(rets(1)._2.map(_.getLong(0)).sorted == Seq(2L, 3L))
  }

  test("RETURNING on a trigger-firing statement is refused loudly") {
    val s = "CREATE TABLE u (k INTEGER PRIMARY KEY, v TEXT);\n" +
      "CREATE TABLE log (m TEXT);"
    val id = seg(s)
    engine.write(id,
      "CREATE TRIGGER tg AFTER INSERT ON u BEGIN " +
        "INSERT INTO log VALUES (NEW.v); END;")
    val e = intercept[UnsupportedOperationException] {
      engine.writeReturning(id, "INSERT INTO u VALUES (1, 'x') RETURNING k;")
    }
    assert(e.getMessage.contains("RETURNING"))
  }

  test("the wire write path accepts RETURNING and discards the rows") {
    val s = "CREATE TABLE u (k INTEGER PRIMARY KEY, v TEXT);"
    val id = seg(s)
    assert(engine.write(id,
      "INSERT INTO u VALUES (1, 'a') RETURNING *;") == "OK\n")
    assert(engine.read(id, "SELECT count(*) FROM u;").collect()(0).getLong(0) == 1L)
  }
}
