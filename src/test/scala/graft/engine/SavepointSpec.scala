package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** SAVEPOINT / RELEASE / ROLLBACK TO inside write scripts
  * (sqlite.org/lang_savepoint.html): nested rollback points over the
  * transaction's staged state. SQLite's stack semantics — repeated
  * names address the most recent, ROLLBACK TO keeps the savepoint
  * alive, RELEASE keeps the changes — and SQLite's error text. */
class SavepointSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-savepoint").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private var n = 0
  private def seg(): String = {
    n += 1
    val id = s"sp-$n"
    engine.schemas.put("sp-schema", "CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT);")
    engine.provisionWritable(id, "sp-schema")
    id
  }

  private def vals(id: String): Seq[String] =
    engine.read(id, "SELECT v FROM t ORDER BY k;").collect().map(_.getString(0)).toSeq

  test("ROLLBACK TO discards work after the savepoint, keeps work before it") {
    val id = seg()
    engine.write(id,
      """INSERT INTO t VALUES (1, 'keep');
        |SAVEPOINT sp1;
        |INSERT INTO t VALUES (2, 'discard');
        |UPDATE t SET v = 'mutated' WHERE k = 1;
        |ROLLBACK TO sp1;
        |INSERT INTO t VALUES (3, 'after');""".stripMargin)
    assert(vals(id) == Seq("keep", "after"))
  }

  test("the savepoint survives its own rollback; RELEASE keeps changes") {
    val id = seg()
    engine.write(id,
      """SAVEPOINT a;
        |INSERT INTO t VALUES (1, 'first-try');
        |ROLLBACK TO a;
        |INSERT INTO t VALUES (1, 'second-try');
        |ROLLBACK TO a;
        |INSERT INTO t VALUES (1, 'third-try');
        |RELEASE a;""".stripMargin)
    assert(vals(id) == Seq("third-try"))
  }

  test("nested savepoints: outer rollback discards inner work too") {
    val id = seg()
    engine.write(id,
      """SAVEPOINT outer;
        |INSERT INTO t VALUES (1, 'outer-work');
        |SAVEPOINT inner;
        |INSERT INTO t VALUES (2, 'inner-work');
        |ROLLBACK TO outer;
        |INSERT INTO t VALUES (3, 'final');""".stripMargin)
    assert(vals(id) == Seq("final"))
    // the inner savepoint was popped with the outer rollback
    val e = intercept[Exception](engine.write(id,
      "SAVEPOINT outer; ROLLBACK TO inner;"))
    assert(e.getMessage.contains("no such savepoint: inner"))
  }

  test("repeated names address the most recent (SQLite stack rule)") {
    val id = seg()
    engine.write(id,
      """INSERT INTO t VALUES (1, 'one');
        |SAVEPOINT x;
        |INSERT INTO t VALUES (2, 'two');
        |SAVEPOINT x;
        |INSERT INTO t VALUES (3, 'three');
        |ROLLBACK TO x;
        |RELEASE x;
        |ROLLBACK TO x;""".stripMargin)
    // first ROLLBACK TO x hit the inner x (drops 'three'); RELEASE
    // popped it; the second ROLLBACK TO x hit the OUTER x (drops 'two')
    assert(vals(id) == Seq("one"))
  }

  test("RELEASE of an unknown savepoint: SQLite's error, script aborts") {
    val id = seg()
    val e = intercept[Exception](engine.write(id,
      "INSERT INTO t VALUES (1, 'x'); RELEASE nope;"))
    assert(e.getMessage.contains("no such savepoint: nope"))
    assert(vals(id).isEmpty) // whole-script atomicity preserved
  }

  test("plain ROLLBACK discards all staged work; later statements still run") {
    val id = seg()
    engine.write(id, "INSERT INTO t VALUES (1, 'pre-existing');")
    engine.write(id,
      """INSERT INTO t VALUES (2, 'doomed');
        |SAVEPOINT sp;
        |ROLLBACK;
        |INSERT INTO t VALUES (3, 'survivor');""".stripMargin)
    assert(vals(id) == Seq("pre-existing", "survivor"))
  }

  test("savepoints cover DDL and views, not just DML") {
    val id = seg()
    engine.write(id,
      """SAVEPOINT ddl;
        |CREATE TABLE extra (x INTEGER);
        |CREATE VIEW tv AS SELECT v FROM t;
        |ROLLBACK TO ddl;""".stripMargin)
    intercept[Exception](engine.read(id, "SELECT * FROM extra;"))
    assert(!engine.store.viewExists(id, "tv"))
  }
}
