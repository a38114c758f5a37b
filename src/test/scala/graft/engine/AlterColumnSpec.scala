package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** SQLite 3.35 `ALTER TABLE … DROP COLUMN` and 3.25 `RENAME COLUMN`
  * through the write path. The drop refusal matrix and every error
  * text are probed against the sandbox CLI (3.51): PK/inline-UNIQUE
  * members refuse at prepare, references from other checks / generated
  * columns / indexes / views / this table's triggers refuse with the
  * step-time texts, and a column's OWN attached CHECK (plus NOT
  * NULL/DEFAULT records) drops silently with it. RENAME rewrites the
  * references real SQLite rewrites (checks, generated expressions,
  * index DDL, trigger bodies, views) at identifier-token level.
  *
  * Documented deviation: a single-column TABLE-LEVEL `UNIQUE(b)`
  * refuses with the inline-unique prepare text rather than SQLite's
  * step-time table error — same refusal, different label. */
class AlterColumnSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-altercol").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"ac-$n"
    engine.schemas.put(s"ac-schema-$n", schema)
    engine.provisionWritable(id, s"ac-schema-$n")
    id
  }

  test("DROP COLUMN: data survives, records drop with the column") {
    val id = seg("CREATE TABLE t (a INTEGER PRIMARY KEY, " +
      "b INTEGER NOT NULL DEFAULT 5 CHECK (b > 0), c TEXT);")
    engine.write(id, "INSERT INTO t VALUES (1, 7, 'x'); " +
      "INSERT INTO t VALUES (2, 8, 'y');")
    engine.write(id, "ALTER TABLE t DROP COLUMN b;")
    val rows = engine.read(id, "SELECT a, c FROM t ORDER BY a;").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "x"), (2L, "y")))
    // the own-column CHECK and NOT NULL went with it: b is gone, and no
    // residual constraint blocks later writes
    engine.write(id, "INSERT INTO t VALUES (3, 'z');")
    val e = intercept[Exception](engine.read(id, "SELECT b FROM t;"))
    assert(e.getMessage.toLowerCase.contains("b"))
    // exported DDL lost the column (and sqlite3 accepts the file)
    val db = Files.createTempDirectory("ac-exp").resolve("s.sqlite")
    engine.store.exportSqliteSegment(id, db.toString)
    val ddl = SqliteCli.query(db.toString,
      "SELECT sql FROM sqlite_master WHERE name='t';")
    assert(!ddl.contains("\"b\""), ddl)
    assert(SqliteCli.query(db.toString, "PRAGMA integrity_check;") == "ok")
  }

  test("DROP COLUMN prepare-time refusals: SQLite's exact texts") {
    val id = seg("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT UNIQUE, c INT);")
    // sqlite3: Error: no such column: "z"
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t DROP COLUMN z;"))
    assert(e1.getMessage == """no such column: "z"""")
    // sqlite3: Error: cannot drop PRIMARY KEY column: "a"
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t DROP COLUMN a;"))
    assert(e2.getMessage == """cannot drop PRIMARY KEY column: "a"""")
    // sqlite3: Error: cannot drop UNIQUE column: "b"
    val e3 = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t DROP COLUMN b;"))
    assert(e3.getMessage == """cannot drop UNIQUE column: "b"""")
    // sqlite3: Error: cannot drop column "a": no other columns exist
    val one = seg("CREATE TABLE u (a INT);")
    val e4 = intercept[IllegalArgumentException](engine.write(one,
      "ALTER TABLE u DROP COLUMN a;"))
    assert(e4.getMessage == """cannot drop column "a": no other columns exist""")
    // WITHOUT ROWID composite PK member refuses the same way
    val wr = seg("CREATE TABLE w (a INT, b INT, c INT, PRIMARY KEY(a, b)) WITHOUT ROWID;")
    val e5 = intercept[IllegalArgumentException](engine.write(wr,
      "ALTER TABLE w DROP COLUMN b;"))
    assert(e5.getMessage == """cannot drop PRIMARY KEY column: "b"""")
  }

  test("DROP COLUMN step-time refusals: checks, generated, index, view, trigger") {
    // another column's CHECK referencing b (probed: table error)
    val id1 = seg("CREATE TABLE t (a INT CHECK (b > 0), b INT);")
    val e1 = intercept[IllegalArgumentException](engine.write(id1,
      "ALTER TABLE t DROP COLUMN b;"))
    assert(e1.getMessage == "error in table t after drop column: no such column: b")
    // a string literal 'b' is NOT a reference (probed: drop succeeds)
    val id2 = seg("CREATE TABLE t (a TEXT CHECK (a <> 'b'), b INT);")
    engine.write(id2, "ALTER TABLE t DROP COLUMN b;")
    // generated column referencing b
    val id3 = seg("CREATE TABLE t (a INT, b INT, c INTEGER AS (b + 1));")
    val e3 = intercept[IllegalArgumentException](engine.write(id3,
      "ALTER TABLE t DROP COLUMN b;"))
    assert(e3.getMessage == "error in table t after drop column: no such column: b")
    // the generated column ITSELF is droppable (probed)
    engine.write(id3, "ALTER TABLE t DROP COLUMN c; INSERT INTO t VALUES (1, 2);")
    // recorded secondary index
    val id4 = seg("CREATE TABLE t (a INT, b INT);")
    engine.write(id4, "CREATE INDEX ib ON t(b);")
    val e4 = intercept[IllegalArgumentException](engine.write(id4,
      "ALTER TABLE t DROP COLUMN b;"))
    assert(e4.getMessage == "error in index ib after drop column: no such column: b")
    // view referencing the column; a `SELECT a` view does not block
    val id5 = seg("CREATE TABLE t (a INT, b INT);")
    engine.write(id5, "CREATE VIEW v AS SELECT b FROM t;")
    val e5 = intercept[IllegalArgumentException](engine.write(id5,
      "ALTER TABLE t DROP COLUMN b;"))
    assert(e5.getMessage == "error in view v after drop column: no such column: b")
    engine.write(id5, "DROP VIEW v; CREATE VIEW v2 AS SELECT a FROM t;" +
      "ALTER TABLE t DROP COLUMN b;")
    // trigger on the table referencing NEW.b (probed message echoes the
    // qualified reference)
    val id6 = seg("CREATE TABLE t (a INT, b INT);" +
      "CREATE TABLE log (x INT);")
    engine.write(id6, "CREATE TRIGGER tr AFTER INSERT ON t BEGIN " +
      "INSERT INTO log VALUES (NEW.b); END;")
    val e6 = intercept[IllegalArgumentException](engine.write(id6,
      "ALTER TABLE t DROP COLUMN b;"))
    assert(e6.getMessage ==
      "error in trigger tr after drop column: no such column: NEW.b")
  }

  test("RENAME COLUMN: data, DDL, constraints, and generated exprs follow") {
    val id = seg("CREATE TABLE t (a INTEGER PRIMARY KEY, " +
      "b INTEGER CHECK (b > 0), c INTEGER AS (b * 2) VIRTUAL);")
    engine.write(id, "INSERT INTO t (a, b) VALUES (1, 10);" +
      "ALTER TABLE t RENAME COLUMN b TO bb;")
    val r = engine.read(id, "SELECT a, bb, c FROM t;").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 10L, 20L)))
    // the CHECK follows the rename (still enforced under the new name)
    val e = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t (a, bb) VALUES (2, -5);"))
    assert(e.getMessage.startsWith("CHECK constraint failed"))
    // the generated expression recomputes from the renamed column
    engine.write(id, "INSERT INTO t (a, bb) VALUES (3, 7);")
    assert(engine.read(id, "SELECT c FROM t WHERE a = 3;")
      .collect()(0).getLong(0) == 14L)
    // bare (no COLUMN keyword) form parses too — sqlite3 accepts both
    engine.write(id, "ALTER TABLE t RENAME bb TO b2;")
    assert(engine.read(id, "SELECT b2 FROM t WHERE a = 1;")
      .collect()(0).getLong(0) == 10L)
  }

  test("RENAME COLUMN refusals: nonexistent and duplicate names") {
    val id = seg("CREATE TABLE t (a INT, b INT);")
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t RENAME COLUMN z TO y;"))
    assert(e1.getMessage == """no such column: "z"""")
    // sqlite3: error in table t after rename: duplicate column name: a
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t RENAME COLUMN b TO a;"))
    assert(e2.getMessage ==
      "error in table t after rename: duplicate column name: a")
  }

  test("RENAME COLUMN rewrites index DDL, trigger bodies, and views " +
      "(sqlite3-checked rewrite shapes)") {
    val id = seg("CREATE TABLE t (a INTEGER PRIMARY KEY, b INTEGER);" +
      "CREATE TABLE log (x INTEGER);")
    engine.write(id, "CREATE INDEX ib ON t(b);" +
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN " +
      "INSERT INTO log VALUES (NEW.b + 1); END;" +
      "CREATE VIEW v AS SELECT b FROM t;")
    engine.write(id, "ALTER TABLE t RENAME COLUMN b TO bb;")
    // the trigger still fires, bound to the renamed column
    engine.write(id, "INSERT INTO t VALUES (1, 41);")
    assert(engine.read(id, "SELECT x FROM log;").collect()(0).getLong(0) == 42L)
    // the view resolves through the rewritten text
    assert(engine.read(id, "SELECT bb FROM v;").collect()(0).getLong(0) == 41L)
    // exported catalog carries the rewritten DDL, as sqlite3's does:
    // CREATE INDEX ib ON t(bb) / NEW.bb / SELECT bb FROM t
    val db = Files.createTempDirectory("ac-ren").resolve("s.sqlite")
    engine.store.exportSqliteSegment(id, db.toString)
    val ix = SqliteCli.query(db.toString,
      "SELECT sql FROM sqlite_master WHERE name='ib';")
    assert(ix.matches("""(?i)CREATE INDEX "?ib"? ON "?t"? \("?bb"?\)"""), ix)
    val tr = SqliteCli.query(db.toString,
      "SELECT sql FROM sqlite_master WHERE name='tr';")
    assert(tr.contains("NEW.bb"), tr)
    val vw = SqliteCli.query(db.toString,
      "SELECT sql FROM sqlite_master WHERE type='view';")
    assert(vw.toLowerCase.contains("select bb from t"), vw)
    // and real sqlite3 runs the renamed schema end to end
    assert(SqliteCli.run(db.toString,
      "INSERT INTO t VALUES (2, 10); SELECT 1;") == 0)
    assert(SqliteCli.query(db.toString,
      "SELECT x FROM log ORDER BY x;") == "11\n42")
  }
}
