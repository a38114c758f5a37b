package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** INSTEAD OF triggers (lang_createtrigger.html §4) through the write
  * path: DML on a view fires the trigger programs per affected row and
  * performs no base write. Pairing rules, the "cannot modify … because
  * it is a view" refusals (incl. the UPDATE OF filter), NEW./OLD.
  * binding to VIEW columns, WHEN gates, DROP VIEW cascade, and the
  * `.sqlite` export round trip are all probed against sqlite3 3.51. */
class InsteadOfTriggerSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-iof").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"iof-$n"
    engine.schemas.put(s"iof-schema-$n", schema)
    engine.provisionWritable(id, s"iof-schema-$n")
    id
  }

  test("pairing rules: INSTEAD OF needs a view, BEFORE/AFTER need a table") {
    val id = seg("CREATE TABLE t (a INTEGER);")
    engine.write(id, "CREATE VIEW v AS SELECT a FROM t;")
    // sqlite3: cannot create BEFORE trigger on view: v
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "CREATE TRIGGER tr BEFORE INSERT ON v BEGIN SELECT 1; END;"))
    assert(e1.getMessage == "cannot create BEFORE trigger on view: v")
    // sqlite3: cannot create INSTEAD OF trigger on table: t
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "CREATE TRIGGER tr INSTEAD OF INSERT ON t BEGIN SELECT 1; END;"))
    assert(e2.getMessage == "cannot create INSTEAD OF trigger on table: t")
  }

  test("view DML without a matching trigger: SQLite's cannot-modify text") {
    val id = seg("CREATE TABLE t (a INTEGER);")
    engine.write(id, "CREATE VIEW v AS SELECT a FROM t;" +
      // a DELETE trigger exists — INSERT still refuses (event mismatch)
      "CREATE TRIGGER trd INSTEAD OF DELETE ON v BEGIN " +
      "DELETE FROM t WHERE a = OLD.a; END;")
    val e = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO v VALUES (1);"))
    assert(e.getMessage == "cannot modify v because it is a view")
    // UPDATE whose SET misses the trigger's OF filter refuses too
    val id2 = seg("CREATE TABLE t (a INTEGER, b INTEGER);")
    engine.write(id2, "CREATE VIEW v AS SELECT a, b FROM t;" +
      "CREATE TRIGGER tru INSTEAD OF UPDATE OF b ON v BEGIN " +
      "UPDATE t SET b = NEW.b WHERE a = OLD.a; END;")
    val e2 = intercept[IllegalArgumentException](engine.write(id2,
      "UPDATE v SET a = 9 WHERE a = 1;"))
    assert(e2.getMessage == "cannot modify v because it is a view")
  }

  test("INSTEAD OF INSERT: NEW binds view columns, the program writes") {
    val id = seg("CREATE TABLE t (a INTEGER);")
    // view renames the column — NEW.x must resolve the VIEW's shape
    engine.write(id, "CREATE VIEW v AS SELECT a AS x FROM t;" +
      "CREATE TRIGGER tr INSTEAD OF INSERT ON v BEGIN " +
      "INSERT INTO t VALUES (NEW.x * 10); END;")
    engine.write(id, "INSERT INTO v VALUES (5);" +
      "INSERT INTO v (x) VALUES (7);") // column-list form
    val rows = engine.read(id, "SELECT a FROM t ORDER BY a;").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 70L))
  }

  test("INSTEAD OF UPDATE: OLD/NEW per matching row; WHERE bounds the set") {
    val id = seg("CREATE TABLE t (a INTEGER, b TEXT);")
    engine.write(id, "INSERT INTO t VALUES (1, 'x'); INSERT INTO t VALUES (2, 'y');" +
      "CREATE VIEW v AS SELECT a, b FROM t;" +
      "CREATE TRIGGER tr INSTEAD OF UPDATE ON v BEGIN " +
      "UPDATE t SET b = NEW.b WHERE a = OLD.a; END;")
    engine.write(id, "UPDATE v SET b = 'z' WHERE a = 2;")
    val rows = engine.read(id, "SELECT a, b FROM t ORDER BY a;").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "x"), (2L, "z")))
  }

  test("INSTEAD OF DELETE: OLD per matching row") {
    val id = seg("CREATE TABLE t (a INTEGER);")
    engine.write(id,
      "INSERT INTO t VALUES (1); INSERT INTO t VALUES (2); INSERT INTO t VALUES (3);" +
        "CREATE VIEW v AS SELECT a FROM t;" +
        "CREATE TRIGGER tr INSTEAD OF DELETE ON v BEGIN " +
        "DELETE FROM t WHERE a = OLD.a; END;")
    engine.write(id, "DELETE FROM v WHERE a > 1;")
    val rows = engine.read(id, "SELECT a FROM t;").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("WHEN gate filters rows (probed: only NEW.a > 0 inserts land)") {
    val id = seg("CREATE TABLE t (a INTEGER);")
    engine.write(id, "CREATE VIEW v AS SELECT a FROM t;" +
      "CREATE TRIGGER tr INSTEAD OF INSERT ON v WHEN NEW.a > 0 BEGIN " +
      "INSERT INTO t VALUES (NEW.a); END;")
    engine.write(id, "INSERT INTO v VALUES (-1); INSERT INTO v VALUES (3);")
    val rows = engine.read(id, "SELECT a FROM t;").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("DROP VIEW drops its INSTEAD OF triggers (SQLite's cascade)") {
    val id = seg("CREATE TABLE t (a INTEGER);")
    engine.write(id, "CREATE VIEW v AS SELECT a FROM t;" +
      "CREATE TRIGGER tr INSTEAD OF INSERT ON v BEGIN " +
      "INSERT INTO t VALUES (NEW.a); END;")
    engine.write(id, "DROP VIEW v; CREATE VIEW v AS SELECT a FROM t;")
    // the old trigger is gone: the fresh view refuses inserts
    val e = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO v VALUES (1);"))
    assert(e.getMessage == "cannot modify v because it is a view")
  }

  test("export round trip: real sqlite3 fires the exported INSTEAD OF trigger") {
    val id = seg("CREATE TABLE t (a INTEGER);")
    engine.write(id, "CREATE VIEW v AS SELECT a AS x FROM t;" +
      "CREATE TRIGGER tr INSTEAD OF INSERT ON v BEGIN " +
      "INSERT INTO t VALUES (NEW.x + 100); END;")
    engine.write(id, "INSERT INTO v VALUES (1);")
    val db = Files.createTempDirectory("iof-exp").resolve("s.sqlite")
    engine.store.exportSqliteSegment(id, db.toString)
    assert(SqliteCli.query(db.toString, "PRAGMA integrity_check;") == "ok")
    // the CLI inserts THROUGH the view — the trigger must fire natively
    assert(SqliteCli.run(db.toString, "INSERT INTO v VALUES (2);") == 0)
    assert(SqliteCli.query(db.toString, "SELECT a FROM t ORDER BY a;") == "101\n102")
    // and ingesting back keeps the trigger live in the engine
    engine.store.ingestSqliteSegment(db.toString, "iof-back")
    engine.schemas.put("iof-back-schema",
      "CREATE TABLE IF NOT EXISTS t (a INTEGER);")
    engine.provisionWritable("iof-back", "iof-back-schema")
    engine.write("iof-back", "INSERT INTO v VALUES (3);")
    val rows = engine.read("iof-back", "SELECT a FROM t ORDER BY a;").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L, 102L, 103L))
  }
}
