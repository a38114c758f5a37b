package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** SQLite triggers through the write path, DIFFERENTIAL against the
  * sandbox `sqlite3` CLI: the same script runs on both engines (the
  * CLI side wrapped `.bail on` + BEGIN…COMMIT to mirror the
  * reference's one-transaction-per-script contract, write.py:33-40)
  * and the resulting tables must render identically. Covers firing
  * order (reverse creation), per-row interleaving, BEFORE/AFTER,
  * UPDATE OF, WHEN, NEW./OLD., RAISE(ABORT/IGNORE), conflict-mode
  * firing shapes, cascades, recursion suppression, TEMP triggers,
  * DROP semantics, and the export/ingest round trips
  * (reference write surface: trough/wsgi/write.py:28-40 accepts any
  * script sqlite3 does — triggers included). */
class TriggerSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-trigger").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"trg-$n"
    engine.schemas.put(s"trg-schema-$n", schema)
    engine.provisionWritable(id, s"trg-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("trg-cli", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString, schema) == 0)
    db
  }

  /** Run `script` on both engines; both must succeed. */
  private def runBoth(id: String, db: Path, script: String): Unit = {
    engine.write(id, script)
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") == 0, s"sqlite3 failed: $script")
  }

  /** Render one engine row the way the sqlite3 CLI prints it. */
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

  /** The differential assertion: `select` must render identically on
    * the engine segment and the CLI database. */
  private def same(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map(render).mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- sqlite3 --\n$cliSide\n-- for --\n$select")
  }

  private val auditSchema =
    "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, amt REAL);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"

  test("AFTER INSERT audit trigger: one program per row, NEW values visible") {
    val id = seg(auditSchema); val db = cliDb(auditSchema)
    runBoth(id, db,
      "CREATE TRIGGER ai AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('ins ' || NEW.id || ' ' || NEW.v || ' ' || NEW.amt); END;" +
        "INSERT INTO t VALUES (1, 'a', 1.5), (2, 'b', 2.0), (3, 'c''x', 3.25);")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
    same(id, db, "SELECT id, v, amt FROM t ORDER BY id;")
  }

  test("firing order is reverse creation order (probed SQLite behavior)") {
    val id = seg(auditSchema); val db = cliDb(auditSchema)
    runBoth(id, db,
      "CREATE TRIGGER m_mid AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('m_mid'); END;" +
        "CREATE TRIGGER a_first AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('a_first'); END;" +
        "CREATE TRIGGER z_last AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('z_last'); END;" +
        "INSERT INTO t VALUES (1, 'x', 0.0);")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
  }

  test("per-row interleaving: an AFTER body reading the target sees 1,2,3") {
    val id = seg(auditSchema); val db = cliDb(auditSchema)
    runBoth(id, db,
      "CREATE TRIGGER tm AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) SELECT 'n=' || count(*) FROM t; END;" +
        "INSERT INTO t VALUES (1, 'a', 0.0), (2, 'b', 0.0), (3, 'c', 0.0);")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
  }

  test("BEFORE INSERT sees defaults applied and -1 for the omitted rowid alias; AFTER sees the assigned id") {
    val schema = "CREATE TABLE d (id INTEGER PRIMARY KEY, v TEXT DEFAULT 'dflt', n INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER db_ BEFORE INSERT ON d BEGIN " +
        "INSERT INTO log (msg) VALUES ('before ' || coalesce(NEW.id, 'NULL') || ' ' || NEW.v); END;" +
        "CREATE TRIGGER da AFTER INSERT ON d BEGIN " +
        "INSERT INTO log (msg) VALUES ('after ' || NEW.id || ' ' || NEW.v); END;" +
        "INSERT INTO d (n) VALUES (42); INSERT INTO d (n) VALUES (43);")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
    same(id, db, "SELECT id, v, n FROM d ORDER BY id;")
  }

  test("WHEN gates per row; RAISE(IGNORE) in BEFORE INSERT drops the row") {
    val schema = "CREATE TABLE u (x INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER tbu BEFORE INSERT ON u WHEN NEW.x < 0 BEGIN SELECT RAISE(IGNORE); END;" +
        "INSERT INTO u VALUES (-1), (2), (-3), (4);")
    same(id, db, "SELECT x FROM u ORDER BY x;")
  }

  test("RAISE(ABORT, msg) aborts the whole script with the bare message; nothing commits") {
    val schema = "CREATE TABLE t (x INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER guard BEFORE INSERT ON t WHEN NEW.x < 0 BEGIN " +
        "SELECT RAISE(ABORT, 'no negatives'); END;")
    val script = "INSERT INTO t VALUES (5); INSERT INTO t VALUES (-2);"
    val e = intercept[IllegalArgumentException](engine.write(id, script))
    assert(e.getMessage == "no negatives")
    // CLI side: .bail aborts before COMMIT → the open txn rolls back
    SqliteCli.run(db.toString, s".bail on\nBEGIN;\n$script\nCOMMIT;\n")
    same(id, db, "SELECT count(*) AS n FROM t;")
    assert(engine.read(id, "SELECT count(*) AS n FROM t;").collect()(0).getLong(0) == 0L)
  }

  test("the idiomatic CASE WHEN … THEN RAISE(ABORT) guard shape works") {
    val schema = "CREATE TABLE t (x INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER guard BEFORE INSERT ON t BEGIN " +
        "SELECT CASE WHEN NEW.x > 100 THEN RAISE(ABORT, 'too big') END; END;" +
        "INSERT INTO t VALUES (7);")
    same(id, db, "SELECT x FROM t;")
    val e = intercept[IllegalArgumentException](
      engine.write(id, "INSERT INTO t VALUES (101);"))
    assert(e.getMessage == "too big")
  }

  test("UPDATE triggers: OLD/NEW images; UPDATE OF fires on the SET list, not value change") {
    val schema = "CREATE TABLE c (x INTEGER, y INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "INSERT INTO c VALUES (1, 10), (2, 20);" +
        "CREATE TRIGGER tc AFTER UPDATE OF y ON c BEGIN " +
        "INSERT INTO log (msg) VALUES ('y ' || OLD.y || '->' || NEW.y); END;" +
        "UPDATE c SET y = 10 WHERE x = 1;" + // same value, y in SET → fires
        "UPDATE c SET x = x + 10;") // y not in SET → silent
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
    same(id, db, "SELECT x, y FROM c ORDER BY x;")
  }

  test("RAISE(IGNORE) in BEFORE UPDATE leaves that row unchanged") {
    val schema = "CREATE TABLE c (x INTEGER, y INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "INSERT INTO c VALUES (1, 10), (2, 20), (3, 30);" +
        "CREATE TRIGGER freeze BEFORE UPDATE ON c WHEN OLD.x = 2 BEGIN SELECT RAISE(IGNORE); END;" +
        "UPDATE c SET y = y + 1;")
    same(id, db, "SELECT x, y FROM c ORDER BY x;")
  }

  test("DELETE triggers: OLD image; RAISE(IGNORE) in BEFORE DELETE keeps the row") {
    val schema = "CREATE TABLE c (x INTEGER, y INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "INSERT INTO c VALUES (1, 10), (2, 20), (3, 30);" +
        "CREATE TRIGGER td AFTER DELETE ON c BEGIN " +
        "INSERT INTO log (msg) VALUES ('del ' || OLD.x); END;" +
        "CREATE TRIGGER keep BEFORE DELETE ON c WHEN OLD.x = 2 BEGIN SELECT RAISE(IGNORE); END;" +
        "DELETE FROM c WHERE y >= 10;")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
    same(id, db, "SELECT x, y FROM c ORDER BY x;")
  }

  test("cascades fire across tables; direct recursion is suppressed") {
    val schema = "CREATE TABLE a (x INTEGER);\nCREATE TABLE b (x INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER ta AFTER INSERT ON a BEGIN INSERT INTO b VALUES (NEW.x * 10); END;" +
        "CREATE TRIGGER tb AFTER INSERT ON b BEGIN INSERT INTO log (msg) VALUES ('b got ' || NEW.x); END;" +
        "CREATE TRIGGER ra AFTER INSERT ON a WHEN NEW.x < 3 BEGIN INSERT INTO a VALUES (NEW.x + 1); END;" +
        "INSERT INTO a VALUES (0);")
    // ra fires once (0→1) and does not re-fire for its own insert;
    // ta cascades for both a-rows; tb cascades for both b-rows
    same(id, db, "SELECT x FROM a ORDER BY x;")
    same(id, db, "SELECT x FROM b ORDER BY x;")
    same(id, db, "SELECT msg FROM log ORDER BY msg;")
  }

  test("conflict modes: OR REPLACE fires only INSERT programs; OR IGNORE fires BEFORE but not AFTER; upsert DO UPDATE diverts to UPDATE programs") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER bi BEFORE INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('bi ' || NEW.id); END;" +
        "CREATE TRIGGER ai AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('ai ' || NEW.id); END;" +
        "CREATE TRIGGER bu BEFORE UPDATE ON t BEGIN INSERT INTO log (msg) VALUES ('bu ' || OLD.v || '->' || NEW.v); END;" +
        "CREATE TRIGGER au AFTER UPDATE ON t BEGIN INSERT INTO log (msg) VALUES ('au ' || NEW.v); END;" +
        "INSERT INTO t VALUES (1, 'a');" +
        "INSERT OR IGNORE INTO t VALUES (1, 'dup');" +
        "INSERT OR REPLACE INTO t VALUES (1, 'rep');" +
        "INSERT INTO t VALUES (1, 'up') ON CONFLICT(id) DO UPDATE SET v = excluded.v || '!';" +
        "INSERT INTO t VALUES (2, 'n') ON CONFLICT(id) DO UPDATE SET v = 'never';")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
    same(id, db, "SELECT id, v FROM t ORDER BY id;")
  }

  test("upsert DO UPDATE ... WHERE false: no update, no UPDATE programs") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, nup INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER au AFTER UPDATE ON t BEGIN INSERT INTO log (msg) VALUES ('au ' || NEW.id); END;" +
        "INSERT INTO t VALUES (1, 'a', 0);" +
        "INSERT INTO t VALUES (1, 'b', 0) ON CONFLICT(id) DO UPDATE SET v = excluded.v WHERE nup = 99;")
    same(id, db, "SELECT msg FROM log ORDER BY lid;")
    same(id, db, "SELECT id, v FROM t ORDER BY id;")
  }

  test("an accumulator body (UPDATE counters) runs once per affected row") {
    val schema = "CREATE TABLE t (x INTEGER);\nCREATE TABLE counters (n INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "INSERT INTO counters VALUES (0);" +
        "CREATE TRIGGER cnt AFTER INSERT ON t BEGIN UPDATE counters SET n = n + 1; END;" +
        "INSERT INTO t VALUES (1), (2), (3), (4);")
    same(id, db, "SELECT n FROM counters;")
  }

  test("TEMP triggers fire within their script and are not persisted") {
    val id = seg(auditSchema); val db = cliDb(auditSchema)
    engine.write(id,
      "CREATE TEMP TRIGGER tt AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('temp ' || NEW.id); END;" +
        "INSERT INTO t VALUES (1, 'a', 0.0);")
    engine.write(id, "INSERT INTO t VALUES (2, 'b', 0.0);")
    val msgs = engine.read(id, "SELECT msg FROM log ORDER BY lid;")
      .collect().map(_.getString(0)).toSeq
    assert(msgs == Seq("temp 1")) // second script: trigger gone
    assert(store.triggers(id).isEmpty)
    val _ = db
  }

  test("DROP TRIGGER; DROP TABLE drops its triggers; errors match sqlite3") {
    val id = seg(auditSchema)
    engine.write(id,
      "CREATE TRIGGER x1 AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('x'); END;")
    assert(store.triggers(id).map(_.name) == Seq("x1"))
    engine.write(id, "DROP TRIGGER x1;")
    assert(store.triggers(id).isEmpty)
    // sqlite3: Error: no such trigger: missing
    val e1 = intercept[IllegalArgumentException](engine.write(id, "DROP TRIGGER missing;"))
    assert(e1.getMessage == "no such trigger: missing")
    engine.write(id, "DROP TRIGGER IF EXISTS missing;") // silent
    engine.write(id,
      "CREATE TRIGGER x2 AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('x'); END;")
    engine.write(id, "DROP TABLE t;")
    assert(store.triggers(id).isEmpty) // trigger went with its table
  }

  test("creation errors carry sqlite3's texts; IF NOT EXISTS suppresses") {
    val id = seg(auditSchema)
    // sqlite3: Error: in prepare, no such table: main.nope
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "CREATE TRIGGER z AFTER INSERT ON nope BEGIN SELECT 1; END;"))
    assert(e1.getMessage == "no such table: main.nope")
    engine.write(id, "CREATE VIEW vv AS SELECT * FROM t;")
    // sqlite3: Error: in prepare, cannot create AFTER trigger on view: vv
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "CREATE TRIGGER z AFTER INSERT ON vv BEGIN SELECT 1; END;"))
    assert(e2.getMessage == "cannot create AFTER trigger on view: vv")
    engine.write(id, "CREATE TRIGGER z AFTER INSERT ON t BEGIN SELECT 1; END;")
    // sqlite3: Error: in prepare, trigger z already exists
    val e3 = intercept[IllegalStateException](engine.write(id,
      "CREATE TRIGGER z AFTER INSERT ON t BEGIN SELECT 2; END;"))
    assert(e3.getMessage == "trigger z already exists")
    engine.write(id, "CREATE TRIGGER IF NOT EXISTS z AFTER INSERT ON t BEGIN SELECT 2; END;")
    // INSTEAD OF on a view now creates (r9 — InsteadOfTriggerSpec); on
    // a TABLE it refuses with sqlite3's text
    engine.write(id,
      "CREATE TRIGGER iv INSTEAD OF INSERT ON vv BEGIN SELECT 1; END;")
    val e4 = intercept[IllegalArgumentException](engine.write(id,
      "CREATE TRIGGER iv2 INSTEAD OF INSERT ON t BEGIN SELECT 1; END;"))
    assert(e4.getMessage == "cannot create INSTEAD OF trigger on table: t")
  }

  test("a failed script leaves no trigger behind; ROLLBACK TO discards one") {
    val id = seg(auditSchema)
    intercept[Exception](engine.write(id,
      "CREATE TRIGGER r1 AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('r'); END;" +
        "INSERT INTO nope VALUES (1);"))
    assert(store.triggers(id).isEmpty)
    engine.write(id,
      "SAVEPOINT sp;" +
        "CREATE TRIGGER r2 AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('r'); END;" +
        "ROLLBACK TO sp;" +
        "INSERT INTO t VALUES (1, 'quiet', 0.0);")
    assert(store.triggers(id).isEmpty)
    assert(engine.read(id, "SELECT count(*) AS n FROM log;").collect()(0).getLong(0) == 0L)
  }

  test("sqlite_master catalogs triggers on the read path") {
    val id = seg(auditSchema)
    val ddl = "CREATE TRIGGER audit AFTER INSERT ON t BEGIN " +
      "INSERT INTO log (msg) VALUES ('i'); END"
    engine.write(id, ddl + ";")
    val r = engine.read(id,
      "SELECT type, name, tbl_name, sql FROM sqlite_master WHERE type = 'trigger';")
      .collect()
    assert(r.length == 1)
    assert((r(0).getString(0), r(0).getString(1), r(0).getString(2)) ==
      (("trigger", "audit", "t")))
    assert(r(0).getString(3) == ddl)
  }

  test("export round trip: real sqlite3 fires the exported trigger natively") {
    val id = seg(auditSchema)
    engine.write(id,
      "CREATE TRIGGER audit AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('native ' || NEW.id); END;" +
        "INSERT INTO t VALUES (1, 'a', 0.5);")
    val out = Files.createTempDirectory("trg-export").resolve(s"$id.sqlite")
    store.exportSqliteSegment(id, out.toString)
    // the exported catalog row is intact…
    assert(SqliteCli.query(out.toString,
      "SELECT name, tbl_name FROM sqlite_master WHERE type = 'trigger';") == "audit|t")
    // …and the trigger FIRES inside real sqlite3
    assert(SqliteCli.run(out.toString, "INSERT INTO t VALUES (2, 'b', 1.5);") == 0)
    assert(SqliteCli.query(out.toString, "SELECT msg FROM log ORDER BY lid;") ==
      "native 1\nnative 2")
  }

  test("ingest round trip: a trigger authored in real sqlite3 fires in the engine") {
    val db = cliDb(auditSchema)
    assert(SqliteCli.run(db.toString,
      "CREATE TRIGGER audit AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('eng ' || NEW.id); END;" +
        "INSERT INTO t VALUES (1, 'a', 0.5);") == 0)
    val id = "trg-ingested"
    store.ingestSqliteSegment(db.toString, id)
    assert(store.triggers(id).map(_.name) == Seq("audit"))
    // acquire the write lock (provision is a no-op on an existing segment)
    engine.schemas.put("trg-ing-schema", "CREATE TABLE unused_ (x INTEGER);")
    engine.provisionWritable(id, "trg-ing-schema")
    engine.write(id, "INSERT INTO t VALUES (2, 'b', 1.5);")
    val msgs = engine.read(id, "SELECT msg FROM log ORDER BY lid;")
      .collect().map(_.getString(0)).toSeq
    assert(msgs == Seq("eng 1", "eng 2"))
  }

  test("ALTER TABLE RENAME retargets the trigger's ON clause") {
    val id = seg(auditSchema)
    engine.write(id,
      "CREATE TRIGGER audit AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('r ' || NEW.id); END;" +
        "ALTER TABLE t RENAME TO t2;" +
        "INSERT INTO t2 VALUES (1, 'a', 0.0);")
    assert(store.triggers(id).head.table == "t2")
    assert(engine.read(id, "SELECT msg FROM log;").collect()(0).getString(0) == "r 1")
  }

  test("RAISE(IGNORE)d rows consume no rowid-alias ids (contiguous allocation, both firing paths)") {
    // probed: sqlite3 allocates 1,2 for the two survivors of a filtered
    // 4-row insert — abandoned rows must not leave id gaps
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT, x INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    // vectorized shape: pure WHEN filter + pure appender reading NEW.id
    // (forces the two-phase eval: ids depend on the filter verdicts)
    val id1 = seg(schema); val db1 = cliDb(schema)
    runBoth(id1, db1,
      "CREATE TRIGGER f BEFORE INSERT ON t WHEN NEW.x < 0 BEGIN SELECT RAISE(IGNORE); END;" +
        "CREATE TRIGGER a AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('id=' || NEW.id || ' x=' || NEW.x); END;" +
        "INSERT INTO t (x) VALUES (-1), (2), (-3), (4);")
    same(id1, db1, "SELECT id, x FROM t ORDER BY id;")
    same(id1, db1, "SELECT msg FROM log ORDER BY lid;")
    // general shape: the appender body UPDATEs a counter too — not a
    // single-tuple INSERT, so the row-at-a-time loop runs instead
    val schema2 = schema + "\nCREATE TABLE n (c INTEGER);"
    val id2 = seg(schema2); val db2 = cliDb(schema2)
    runBoth(id2, db2,
      "INSERT INTO n VALUES (0);" +
        "CREATE TRIGGER f BEFORE INSERT ON t WHEN NEW.x < 0 BEGIN SELECT RAISE(IGNORE); END;" +
        "CREATE TRIGGER a AFTER INSERT ON t BEGIN " +
        "INSERT INTO log (msg) VALUES ('id=' || NEW.id || ' x=' || NEW.x); UPDATE n SET c = c + 1; END;" +
        "INSERT INTO t (x) VALUES (-1), (2), (-3), (4);")
    same(id2, db2, "SELECT id, x FROM t ORDER BY id;")
    same(id2, db2, "SELECT msg FROM log ORDER BY lid;")
    same(id2, db2, "SELECT c FROM n;")
    // and both engine paths rendered the identical audit trail
    assert(engine.read(id1, "SELECT msg FROM log ORDER BY lid;").collect().map(_.getString(0)).toSeq ==
      engine.read(id2, "SELECT msg FROM log ORDER BY lid;").collect().map(_.getString(0)).toSeq)
  }

  test("vectorized and general UPDATE/DELETE firing agree (same scenario, forced paths)") {
    val schema = "CREATE TABLE c (x INTEGER, y INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);"
    def script(generalize: Boolean): String = {
      // the SELECT-count body statement mentions no other table but is
      // not a single-tuple INSERT, forcing the general loop
      val extra = if (generalize)
        "CREATE TRIGGER g AFTER UPDATE ON c BEGIN " +
          "INSERT INTO log (msg) SELECT 'seen ' || NEW.x; END;"
      else
        "CREATE TRIGGER g AFTER UPDATE ON c BEGIN " +
          "INSERT INTO log (msg) VALUES ('seen ' || NEW.x); END;"
      "INSERT INTO c VALUES (1, 10), (2, 20), (3, 30);" + extra +
        "CREATE TRIGGER u AFTER UPDATE ON c WHEN NEW.y > 25 BEGIN " +
        "INSERT INTO log (msg) VALUES (OLD.y || '->' || NEW.y); END;" +
        "UPDATE c SET y = y + 10 WHERE x >= 2;"
    }
    val idV = seg(schema); val dbV = cliDb(schema)
    runBoth(idV, dbV, script(generalize = false))
    same(idV, dbV, "SELECT msg FROM log ORDER BY lid;")
    same(idV, dbV, "SELECT x, y FROM c ORDER BY x;")
    val idG = seg(schema); val dbG = cliDb(schema)
    runBoth(idG, dbG, script(generalize = true))
    same(idG, dbG, "SELECT msg FROM log ORDER BY lid;")
    same(idG, dbG, "SELECT x, y FROM c ORDER BY x;")
  }

  test("the general row loop is UNCAPPED (r17): 1,024 non-vectorizable " +
      "firings stream in batches, differential vs sqlite3") {
    val schema = "CREATE TABLE big (x INTEGER);\nCREATE TABLE log2 (msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    // 32 seed rows doubled 5× = 1024 rows, built set-based (no triggers
    // exist yet, so the bulk inserts stay on the fast path)
    val build = "INSERT INTO big VALUES " +
      (1 to 32).map(i => s"($i)").mkString(", ") + ";" +
      (1 to 5).map(k =>
        s"INSERT INTO big SELECT x + ${k * 100000} FROM big;").mkString
    runBoth(id, db, build)
    // an INSERT…SELECT body is row-local DML the vectorized tier does
    // not compile — the general loop used to refuse past 1,000 rows;
    // since r17 it streams uncapped (SQLite has no cap either)
    runBoth(id, db,
      "CREATE TRIGGER tb AFTER DELETE ON big BEGIN " +
        "INSERT INTO log2 SELECT 'd'; END;" +
        "DELETE FROM big;")
    same(id, db, "SELECT count(*) AS n FROM big;")
    same(id, db, "SELECT count(*) AS n FROM log2;")
    // the vectorizable shape runs distributed — and matches real
    // sqlite3 over all 1024 firings
    val id2 = seg(schema); val db2 = cliDb(schema)
    runBoth(id2, db2, build)
    runBoth(id2, db2, "CREATE TRIGGER tv AFTER DELETE ON big " +
      "BEGIN INSERT INTO log2 VALUES ('d ' || OLD.x); END;" +
      "DELETE FROM big WHERE x % 2 = 0;")
    same(id2, db2, "SELECT count(*) AS n FROM big;")
    same(id2, db2, "SELECT msg FROM log2 ORDER BY msg;")
  }

  test("self-read aggregate subqueries fire vectorized: count/sum/max, " +
      "BEFORE/AFTER, WHERE, filters (VERDICT r10 #7)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, x INTEGER);\n" +
      "CREATE TABLE audit (n INTEGER, s INTEGER, m INTEGER, v INTEGER);"
    // AFTER: the subquery sees the just-inserted row (probed 1,2,3)
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t), (SELECT sum(x) FROM t), " +
        "(SELECT max(x) FROM t WHERE x < 25), NEW.x); END;" +
        "INSERT INTO t VALUES (1,10),(2,20),(3,30);")
    same(id, db, "SELECT n, s, m, v FROM audit ORDER BY n;")

    // BEFORE: the row is not yet inserted (probed 0,1,2)
    val id2 = seg(schema); val db2 = cliDb(schema)
    runBoth(id2, db2,
      "CREATE TRIGGER tb BEFORE INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t), NULL, NULL, NEW.x); END;" +
        "INSERT INTO t VALUES (1,10),(2,20),(3,30);")
    same(id2, db2, "SELECT n, v FROM audit ORDER BY v;")

    // a RAISE(IGNORE)d row never enters the count (probed 1,2)
    val id3 = seg(schema); val db3 = cliDb(schema)
    runBoth(id3, db3,
      "CREATE TRIGGER f BEFORE INSERT ON t WHEN NEW.x = 20 " +
        "BEGIN SELECT RAISE(IGNORE); END;" +
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t), NULL, NULL, NEW.x); END;" +
        "INSERT INTO t VALUES (1,10),(2,20),(3,30);")
    same(id3, db3, "SELECT n, v FROM audit ORDER BY n;")

    // avg/min/total over a non-empty base (prior committed rows);
    // REAL audit columns — avg/total answer REAL, and an INTEGER-
    // affinity parquet column would truncate where sqlite3 keeps 17.5
    val schema4 = "CREATE TABLE t (id INTEGER PRIMARY KEY, x INTEGER);\n" +
      "CREATE TABLE audit (n INTEGER, s REAL, m REAL, v INTEGER);"
    val id4 = seg(schema4); val db4 = cliDb(schema4)
    runBoth(id4, db4, "INSERT INTO t VALUES (1, 7), (2, 14);")
    runBoth(id4, db4,
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT min(x) FROM t), (SELECT total(x) FROM t), " +
        "(SELECT avg(x) FROM t WHERE x > 7), NEW.x); END;" +
        "INSERT INTO t VALUES (3,21),(4,2);")
    same(id4, db4, "SELECT n, s, m, v FROM audit ORDER BY v;")
  }

  test("self-reading body past the old 1,000-row cap: 1,500 firings, " +
      "differential vs sqlite3 (VERDICT r10 #7 done-bar)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, x INTEGER);\n" +
      "CREATE TABLE audit (n INTEGER, v INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    // three 500-row statements (a single 1,500-tuple VALUES trips
    // Spark's parse-complexity guard); the trigger's running count
    // spans statements, so the differential still covers 1,500 firings
    val script =
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t), NEW.x); END;" +
        (0 until 3).map { b =>
          "INSERT INTO t (x) VALUES " +
            (1 to 500).map(i => s"(${(b * 500 + i) % 97})").mkString(", ") + ";"
        }.mkString
    runBoth(id, db, script)
    same(id, db, "SELECT count(*) AS rows_in, max(n) AS maxn FROM audit;")
    same(id, db, "SELECT n, v FROM audit ORDER BY n LIMIT 20;")
    same(id, db, "SELECT n, v FROM audit ORDER BY n DESC LIMIT 5;")
  }

  test("correlated self-read shapes answer correctly (vectorized since r16)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, x INTEGER);\n" +
      "CREATE TABLE audit (n INTEGER, v INTEGER);"
    // `c = NEW.c` correlations vectorize via a key-partitioned window
    // (r16); same results as the general loop had for small statements
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t WHERE x = NEW.x), NEW.x); END;" +
        "INSERT INTO t VALUES (1,5),(2,5),(3,9);")
    same(id, db, "SELECT n, v FROM audit ORDER BY v, n;")
  }

  test("CORRELATED self-read body past the 1,000-row cap: 1,500 firings, " +
      "differential vs sqlite3 (VERDICT r15 #3 done-bar)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, g INTEGER, x INTEGER);\n" +
      "CREATE TABLE audit (n INTEGER, s INTEGER, mx INTEGER, a REAL, g INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    // per-key running count/sum/max/avg, with a residual uncorrelated
    // conjunct beside the correlation and BOTH spellings of the
    // equality; 3×500 rows over 23 keys → every firing past the old
    // cap exercises the key-partitioned window
    val script =
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t WHERE g = NEW.g), " +
        "(SELECT sum(x) FROM t WHERE NEW.g = g AND x < 40), " +
        "(SELECT max(x) FROM t WHERE g = NEW.g), " +
        "(SELECT avg(x) FROM t WHERE g = NEW.g AND x % 2 = 0), " +
        "NEW.g); END;" +
        (0 until 3).map { b =>
          "INSERT INTO t (g, x) VALUES " +
            (1 to 500).map { i =>
              val k = b * 500 + i
              s"(${k % 23}, ${k % 97})"
            }.mkString(", ") + ";"
        }.mkString
    runBoth(id, db, script)
    same(id, db, "SELECT count(*) AS rows_in, max(n) AS maxn, " +
      "sum(s) AS sums, max(mx) AS maxmx FROM audit;")
    same(id, db, "SELECT n, s, mx, printf('%.9e', a), g FROM audit " +
      "ORDER BY g, n LIMIT 40;")
    same(id, db, "SELECT n, s, mx, g FROM audit ORDER BY g DESC, n DESC " +
      "LIMIT 10;")
    // a BEFORE-timing correlated count (bounds exclude the current row)
    val id2 = seg(schema); val db2 = cliDb(schema)
    val script2 =
      "CREATE TRIGGER tb BEFORE INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t WHERE g = NEW.g), NULL, NULL, NULL, " +
        "NEW.g); END;" +
        "INSERT INTO t (g, x) VALUES " +
        (1 to 600).map(i => s"(${i % 7}, $i)").mkString(", ") + ";"
    runBoth(id2, db2, script2)
    same(id2, db2, "SELECT count(*) AS c, max(n) AS mx FROM audit;")
    same(id2, db2, "SELECT n, g FROM audit ORDER BY g, n LIMIT 30;")
    // NULL correlation keys match nothing (SQL equality) — both sides
    val id3 = seg(schema); val db3 = cliDb(schema)
    runBoth(id3, db3,
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t WHERE g = NEW.g), NULL, NULL, NULL, " +
        "NEW.g); END;" +
        "INSERT INTO t (g, x) VALUES (NULL, 1), (5, 2), (NULL, 3), (5, 4);")
    same(id3, db3, "SELECT n, g FROM audit ORDER BY n;")
    // different-column correlations still take the general tier
    val id4 = seg(schema); val db4 = cliDb(schema)
    runBoth(id4, db4,
      "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT count(*) FROM t WHERE x = NEW.g), NULL, NULL, NULL, " +
        "NEW.g); END;" +
        "INSERT INTO t (g, x) VALUES (1, 2), (2, 1), (1, 1);")
    same(id4, db4, "SELECT n, g FROM audit ORDER BY n, g;")
  }

  test("UPDATE/DELETE self-read bodies past the cap: delta windows, 1,200 firings (r16)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, g INTEGER, x INTEGER);\n" +
      "CREATE TABLE audit (s INTEGER, sg INTEGER, c INTEGER, a REAL, v INTEGER);"
    def fill(id: String, db: Path): Unit =
      (0 until 3).foreach { b =>
        runBoth(id, db, "INSERT INTO t (g, x) VALUES " +
          (1 to 400).map { i =>
            val k = b * 400 + i
            s"(${k % 19}, ${k % 83})"
          }.mkString(", ") + ";")
      }
    // AFTER UPDATE: each firing sees previously-updated rows' NEW
    // values and later rows' OLD values — the delta-window shape
    val id = seg(schema); val db = cliDb(schema)
    fill(id, db)
    val upd =
      "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT sum(x) FROM t), " +
        "(SELECT sum(x) FROM t WHERE g = NEW.g), " +
        "(SELECT count(*) FROM t WHERE x < 40), " +
        "(SELECT avg(x) FROM t WHERE g = NEW.g AND x % 2 = 0), " +
        "NEW.id); END;" +
        "UPDATE t SET x = x + 3 WHERE x % 5 < 4;"
    runBoth(id, db, upd)
    same(id, db, "SELECT count(*) AS fired, sum(s) AS ss, sum(sg) AS ssg, " +
      "max(c) AS mc FROM audit;")
    same(id, db, "SELECT s, sg, c, printf('%.9e', a), v FROM audit " +
      "ORDER BY v LIMIT 40;")
    same(id, db, "SELECT s, sg, c, v FROM audit ORDER BY v DESC LIMIT 10;")
    // BEFORE DELETE: counts shrink as the scan deletes; OLD-correlated
    val id2 = seg(schema); val db2 = cliDb(schema)
    fill(id2, db2)
    val del =
      "CREATE TRIGGER td BEFORE DELETE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT sum(x) FROM t), " +
        "(SELECT sum(x) FROM t WHERE g = OLD.g), " +
        "(SELECT count(*) FROM t), NULL, OLD.id); END;" +
        "DELETE FROM t WHERE x % 3 = 0;"
    runBoth(id2, db2, del)
    same(id2, db2, "SELECT count(*) AS fired, min(c) AS minc, " +
      "sum(s) AS ss, sum(sg) AS ssg FROM audit;")
    same(id2, db2, "SELECT s, sg, c, v FROM audit ORDER BY v LIMIT 30;")
    same(id2, db2, "SELECT count(*) AS left_n, sum(x) AS left_s FROM t;")
    // an UPDATE that reassigns the correlation key takes the general
    // tier (small statement — still correct)
    val id3 = seg(schema); val db3 = cliDb(schema)
    runBoth(id3, db3,
      "INSERT INTO t (g, x) VALUES (1, 10), (2, 20), (1, 30);" +
        "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "NULL, (SELECT sum(x) FROM t WHERE g = NEW.g), NULL, NULL, " +
        "NEW.id); END;" +
        "UPDATE t SET g = g + 1, x = x + 1;")
    same(id3, db3, "SELECT sg, v FROM audit ORDER BY v;")
  }

  test("min/max self-reads vectorize under UPDATE/DELETE (r17): exact decomposition") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, g INTEGER, x INTEGER);\n" +
      "CREATE TABLE audit (mn INTEGER, mx INTEGER, mg INTEGER, v INTEGER);"
    val seed = "INSERT INTO t (g, x) VALUES " +
      "(1,10),(2,25),(1,30),(2,5),(1,40),(2,60),(1,22),(2,18);"
    // AFTER UPDATE: each firing sees already-updated rows' NEW x and
    // later rows' OLD x — the prefix/suffix decomposition
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, seed +
      "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT min(x) FROM t), (SELECT max(x) FROM t), " +
        "(SELECT max(x) FROM t WHERE g = NEW.g), NEW.id); END;" +
        "UPDATE t SET x = x - 7 WHERE x > 20;")
    same(id, db, "SELECT mn, mx, mg, v FROM audit ORDER BY v;")
    same(id, db, "SELECT id, g, x FROM t ORDER BY id;")
    // BEFORE DELETE: the global min moves as the scan deletes; the
    // correlated max partitions by the (stable) OLD key
    val id2 = seg(schema); val db2 = cliDb(schema)
    runBoth(id2, db2, seed +
      "CREATE TRIGGER td BEFORE DELETE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT min(x) FROM t), (SELECT max(x) FROM t WHERE g = OLD.g), " +
        "NULL, OLD.id); END;" +
        "DELETE FROM t WHERE x < 35;")
    same(id2, db2, "SELECT mn, mx, v FROM audit ORDER BY v;")
    same(id2, db2, "SELECT id, g, x FROM t ORDER BY id;")
    // RAISE(IGNORE)-abandoned rows keep their OLD values visible at
    // every later firing (the whole-frame window term)
    val id3 = seg(schema); val db3 = cliDb(schema)
    runBoth(id3, db3, seed +
      "CREATE TRIGGER tf BEFORE UPDATE ON t WHEN NEW.x % 2 = 1 " +
        "BEGIN SELECT RAISE(IGNORE); END;" +
        "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT min(x) FROM t), (SELECT max(x) FROM t), NULL, NEW.id); END;" +
        "UPDATE t SET x = x * 2 - 25;")
    same(id3, db3, "SELECT mn, mx, v FROM audit ORDER BY v;")
    same(id3, db3, "SELECT id, g, x FROM t ORDER BY id;")
    // min over TEXT follows BINARY (byte) order through the same windows
    val schemaT = "CREATE TABLE s (id INTEGER PRIMARY KEY, w TEXT);\n" +
      "CREATE TABLE audit (mn TEXT, mx TEXT, v INTEGER);"
    val id4 = seg(schemaT); val db4 = cliDb(schemaT)
    runBoth(id4, db4,
      "INSERT INTO s (w) VALUES ('pear'),('Apple'),('fig'),('date'),('kiwi');" +
        "CREATE TRIGGER su AFTER UPDATE ON s BEGIN INSERT INTO audit VALUES (" +
        "(SELECT min(w) FROM s), (SELECT max(w) FROM s), NEW.id); END;" +
        "UPDATE s SET w = upper(w) WHERE length(w) > 3;")
    same(id4, db4, "SELECT mn, mx, v FROM audit ORDER BY v;")
  }

  test("min/max self-read bodies past the cap: 1,200 firings under UPDATE and DELETE (r17 done-bar)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, g INTEGER, x INTEGER);\n" +
      "CREATE TABLE audit (mn INTEGER, mxg INTEGER, v INTEGER);"
    def fill(id: String, db: Path): Unit =
      (0 until 3).foreach { b =>
        runBoth(id, db, "INSERT INTO t (g, x) VALUES " +
          (1 to 400).map { i =>
            val k = b * 400 + i
            s"(${k % 19}, ${k % 83})"
          }.mkString(", ") + ";")
      }
    val id = seg(schema); val db = cliDb(schema)
    fill(id, db)
    runBoth(id, db,
      "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT min(x) FROM t), (SELECT max(x) FROM t WHERE g = NEW.g), " +
        "NEW.id); END;" +
        "UPDATE t SET x = x + 5;")
    same(id, db, "SELECT count(*) AS fired, min(mn) AS mmn, sum(mxg) AS smx " +
      "FROM audit;")
    same(id, db, "SELECT mn, mxg, v FROM audit ORDER BY v LIMIT 40;")
    same(id, db, "SELECT mn, mxg, v FROM audit ORDER BY v DESC LIMIT 10;")
    val id2 = seg(schema); val db2 = cliDb(schema)
    fill(id2, db2)
    runBoth(id2, db2,
      "CREATE TRIGGER td BEFORE DELETE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT min(x) FROM t), (SELECT max(x) FROM t WHERE g = OLD.g), " +
        "OLD.id); END;" +
        "DELETE FROM t;")
    same(id2, db2, "SELECT count(*) AS fired, min(mn) AS mmn, sum(mxg) AS smx " +
      "FROM audit;")
    same(id2, db2, "SELECT mn, mxg, v FROM audit ORDER BY v LIMIT 40;")
    same(id2, db2, "SELECT count(*) AS left_n FROM t;")
  }

  test("reassigned-key correlated self-reads vectorize (r17): event-stream deltas") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, g INTEGER, x INTEGER);\n" +
      "CREATE TABLE audit (sn INTEGER, so INTEGER, c INTEGER, a REAL, v INTEGER);"
    val seed = "INSERT INTO t (g, x) VALUES " +
      "(1,10),(2,20),(1,30),(3,40),(2,50),(1,60);"
    // the NEW.g and OLD.g spellings now evaluate at DIFFERENT keys
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, seed +
      "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT sum(x) FROM t WHERE g = NEW.g), " +
        "(SELECT sum(x) FROM t WHERE g = OLD.g), " +
        "(SELECT count(*) FROM t WHERE g = NEW.g), " +
        "(SELECT avg(x) FROM t WHERE g = NEW.g AND x % 2 = 0), " +
        "NEW.id); END;" +
        "UPDATE t SET g = g + 1, x = x + 1;")
    same(id, db, "SELECT sn, so, c, printf('%.9e', a), v FROM audit ORDER BY v;")
    same(id, db, "SELECT id, g, x FROM t ORDER BY id;")
    // BEFORE timing: the firing's own key move hasn't applied yet
    val id2 = seg(schema); val db2 = cliDb(schema)
    runBoth(id2, db2, seed +
      "CREATE TRIGGER tb BEFORE UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT sum(x) FROM t WHERE g = NEW.g), " +
        "(SELECT count(*) FROM t WHERE g = OLD.g), NULL, NULL, NEW.id); END;" +
        "UPDATE t SET g = g * 2;")
    same(id2, db2, "SELECT sn, so, v FROM audit ORDER BY v;")
    // a key reassigned TO NULL matches nothing; rows moving off a key
    // stop counting there
    val id3 = seg(schema); val db3 = cliDb(schema)
    runBoth(id3, db3, seed +
      "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT sum(x) FROM t WHERE g = NEW.g), " +
        "(SELECT count(*) FROM t WHERE g = NEW.g), NULL, NULL, NEW.id); END;" +
        "UPDATE t SET g = CASE WHEN x = 30 THEN NULL ELSE g + 1 END;")
    same(id3, db3, "SELECT sn, c, v FROM audit ORDER BY v;")
  }

  test("reassigned-key correlated body past the cap: 1,200 firings (r17 done-bar)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, g INTEGER, x INTEGER);\n" +
      "CREATE TABLE audit (sn INTEGER, so INTEGER, c INTEGER, a REAL, v INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    (0 until 3).foreach { b =>
      runBoth(id, db, "INSERT INTO t (g, x) VALUES " +
        (1 to 400).map { i =>
          val k = b * 400 + i
          s"(${k % 19}, ${k % 83})"
        }.mkString(", ") + ";")
    }
    runBoth(id, db,
      "CREATE TRIGGER tu AFTER UPDATE ON t BEGIN INSERT INTO audit VALUES (" +
        "(SELECT sum(x) FROM t WHERE g = NEW.g), " +
        "(SELECT sum(x) FROM t WHERE g = OLD.g), " +
        "(SELECT count(*) FROM t WHERE g = NEW.g), " +
        "(SELECT avg(x) FROM t WHERE g = NEW.g AND x % 2 = 0), " +
        "NEW.id); END;" +
        "UPDATE t SET g = (g * 7 + x) % 13, x = x + 2;")
    same(id, db, "SELECT count(*) AS fired, sum(sn) AS ssn, sum(so) AS sso, " +
      "max(c) AS mc FROM audit;")
    same(id, db, "SELECT sn, so, c, printf('%.9e', a), v FROM audit " +
      "ORDER BY v LIMIT 40;")
    same(id, db, "SELECT sn, so, c, v FROM audit ORDER BY v DESC LIMIT 10;")
    same(id, db, "SELECT g, count(*) AS n, sum(x) AS s FROM t GROUP BY g ORDER BY g;")
  }

  test("cascades into triggered tables vectorize (r17): depth-first order, " +
      "sub-WHEN, sub-IGNORE, 1,500 firings past the cap") {
    val schema = "CREATE TABLE a (id INTEGER PRIMARY KEY, x INTEGER);\n" +
      "CREATE TABLE b (id INTEGER PRIMARY KEY, ax INTEGER);\n" +
      "CREATE TABLE c (id INTEGER PRIMARY KEY, note TEXT, v INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    // firing order on b is reverse creation: t3 (BEFORE), tb (BEFORE,
    // the IGNORE filter), t2 (AFTER) — so 'beforeB' logs even for rows
    // tb subsequently abandons, no b id is consumed for those, t2
    // skips them, and t1's second body statement still runs (probed)
    val script =
      "CREATE TRIGGER t1 AFTER INSERT ON a BEGIN " +
        "INSERT INTO b (ax) VALUES (NEW.x * 10); " +
        "INSERT INTO c (note, v) VALUES ('postA', NEW.x); END;" +
      "CREATE TRIGGER tb BEFORE INSERT ON b WHEN NEW.ax % 70 = 20 " +
        "BEGIN SELECT RAISE(IGNORE); END;" +
      "CREATE TRIGGER t2 AFTER INSERT ON b BEGIN " +
        "INSERT INTO c (note, v) VALUES ('afterB', NEW.ax); END;" +
      "CREATE TRIGGER t3 BEFORE INSERT ON b WHEN NEW.ax % 3 = 0 BEGIN " +
        "INSERT INTO c (note, v) VALUES ('beforeB', NEW.ax); END;" +
        (0 until 3).map { bk =>
          "INSERT INTO a (x) VALUES " +
            (1 to 500).map(i => s"(${(bk * 500 + i) % 97})").mkString(", ") + ";"
        }.mkString
    runBoth(id, db, script)
    same(id, db, "SELECT count(*) AS n, max(id) AS mx FROM b;")
    same(id, db, "SELECT id, ax FROM b ORDER BY id LIMIT 25;")
    same(id, db, "SELECT count(*) AS n, max(id) AS mx FROM c;")
    same(id, db, "SELECT id, note, v FROM c ORDER BY id LIMIT 40;")
    same(id, db, "SELECT id, note, v FROM c ORDER BY id DESC LIMIT 10;")
  }

  test("self-appending triggers vectorize (r17): suppressed recursion, " +
      "interleaved rowid-alias ids, sibling trigger fires for appended rows") {
    val schema = "CREATE TABLE a (id INTEGER PRIMARY KEY, x INTEGER, src TEXT);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY, ax INTEGER, s TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    // t appends into its own target (runs once per firing row —
    // recursive_triggers OFF); u, a sibling on the same table, fires
    // for BOTH main and appended rows; id allocation interleaves
    // main/append in firing order (probed: 1,2,3,4). The WHEN makes
    // per-row id consumption vary (1 or 2), exercising the unified
    // consumption stream past the old 1,000-row cap.
    val script =
      "CREATE TRIGGER t AFTER INSERT ON a WHEN NEW.x % 5 < 3 BEGIN " +
        "INSERT INTO a (x, src) VALUES (NEW.x + 1000, 'trg'); END;" +
      "CREATE TRIGGER u AFTER INSERT ON a BEGIN " +
        "INSERT INTO log (ax, s) VALUES (NEW.x, NEW.src); END;" +
        (0 until 3).map { bk =>
          "INSERT INTO a (x, src) VALUES " +
            (1 to 500).map(i => s"(${(bk * 500 + i) % 97}, 'main')").mkString(", ") + ";"
        }.mkString
    runBoth(id, db, script)
    same(id, db, "SELECT count(*) AS n, max(id) AS mx FROM a;")
    same(id, db, "SELECT id, x, src FROM a ORDER BY id LIMIT 30;")
    same(id, db, "SELECT id, x, src FROM a ORDER BY id DESC LIMIT 10;")
    same(id, db, "SELECT count(*) AS n FROM log;")
    same(id, db, "SELECT ax, s, count(*) AS n FROM log GROUP BY ax, s " +
      "ORDER BY ax, s LIMIT 30;")
  }

  test("BEFORE self-append takes its id before the main row (r17, probed)") {
    val schema = "CREATE TABLE a (id INTEGER PRIMARY KEY, x INTEGER, src TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER t BEFORE INSERT ON a WHEN NEW.src = 'main' BEGIN " +
        "INSERT INTO a (x, src) VALUES (NEW.x + 100, 'trg'); END;" +
        "INSERT INTO a (x, src) VALUES (1, 'main'), (2, 'main');")
    same(id, db, "SELECT id, x, src FROM a ORDER BY id;")
  }

  test("uncapped general INSERT loop (r17): OR IGNORE / OR REPLACE with a " +
      "collated secondary UNIQUE stream past 1,000 rows, batched prescans") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, c1 TEXT COLLATE NOCASE UNIQUE, " +
      "x INTEGER);\nCREATE TABLE log2 (msg TEXT);"
    val id = seg(schema); val db = cliDb(schema)
    // conflict modes force the general loop whenever triggers are
    // active; c1 cycles a 83-value pool with case variants, so NOCASE
    // collisions land both inside one 1,000-row prescan batch and
    // ACROSS batches (the incremental-prescan resurrection guard)
    def c1(i: Int): String = { val k = i % 83; if (k % 2 == 0) s"'K$k'" else s"'k$k'" }
    val seed = "INSERT INTO t (c1, x) VALUES " +
      (1 to 40).map(i => s"(${c1(i)}, $i)").mkString(", ") + ";"
    val ign = (0 until 3).map { b =>
      "INSERT OR IGNORE INTO t (c1, x) VALUES " +
        (1 to 370).map { i => val k = b * 370 + i + 40; s"(${c1(k)}, $k)" }
          .mkString(", ") + ";"
    }.mkString
    val rep = "INSERT OR REPLACE INTO t (c1, x) VALUES " +
      (1 to 60).map(i => s"(${c1(i * 7)}, ${9000 + i})").mkString(", ") + ";"
    runBoth(id, db,
      "CREATE TRIGGER tg AFTER INSERT ON t BEGIN " +
        "INSERT INTO log2 VALUES ('I' || NEW.x); END;" + seed + ign + rep)
    same(id, db, "SELECT count(*) AS n, max(id) AS mx FROM t;")
    same(id, db, "SELECT c1, x FROM t ORDER BY id LIMIT 50;")
    same(id, db, "SELECT c1, x FROM t ORDER BY id DESC LIMIT 20;")
    same(id, db, "SELECT count(*) AS n FROM log2;")
  }

  test("cascade back into the statement target (A→B→A) vectorizes (r17)") {
    val schema = "CREATE TABLE a (id INTEGER PRIMARY KEY, x INTEGER, src TEXT);\n" +
      "CREATE TABLE b (id INTEGER PRIMARY KEY, ax INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    // the echoed A row fires neither t1 (WHEN filters it; t1 is also on
    // the firing stack — suppressed either way) nor re-enters the
    // cascade; ids interleave main/echo (probed: 1,2,3,4)
    val script =
      "CREATE TRIGGER t1 AFTER INSERT ON a WHEN NEW.src = 'main' BEGIN " +
        "INSERT INTO b (ax) VALUES (NEW.x); END;" +
      "CREATE TRIGGER t2 AFTER INSERT ON b BEGIN " +
        "INSERT INTO a (x, src) VALUES (NEW.ax + 500, 'echo'); END;" +
        (0 until 2).map { bk =>
          "INSERT INTO a (x, src) VALUES " +
            (1 to 400).map(i => s"(${(bk * 400 + i) % 89}, 'main')").mkString(", ") + ";"
        }.mkString
    runBoth(id, db, script)
    same(id, db, "SELECT count(*) AS n, max(id) AS mx FROM a;")
    same(id, db, "SELECT id, x, src FROM a ORDER BY id LIMIT 30;")
    same(id, db, "SELECT count(*) AS n, max(id) AS mx FROM b;")
    same(id, db, "SELECT id, ax FROM b ORDER BY id LIMIT 15;")
  }

  test("self-row UPDATE bodies vectorize (r18): composition, WHEN gates, " +
      "filters, appends — 1,500 firings differential vs sqlite3") {
    // the shape behind the r18 general-tier throughput fix: AFTER
    // INSERT programs that touch the just-inserted row up via
    // `UPDATE t SET … WHERE id = NEW.id`. Two programs compose (the
    // second's bare column reads see the first's effect; NEW. stays
    // the fixed insert image), a WHEN gates per row, a BEFORE
    // RAISE(IGNORE) filter drops rows before any firing, and an audit
    // append rides alongside. 1,500 firings — far past anything the
    // measured ~10 firings/s general tier could differential-test.
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, c INTEGER);\n" +
      "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);\n" +
      "CREATE TABLE src (k INTEGER PRIMARY KEY);"
    val id = seg(schema); val db = cliDb(schema)
    val build = "INSERT INTO src VALUES " +
      (1 to 1500).map(k => s"($k)").mkString(", ") + ";"
    val script = build +
      // creation order = reverse firing order is already covered
      // elsewhere; keep creation order = firing order here
      "CREATE TRIGGER f0 BEFORE INSERT ON t WHEN NEW.id % 97 = 0 BEGIN " +
        "SELECT RAISE(IGNORE); END;" +
      "CREATE TRIGGER u1 AFTER INSERT ON t WHEN NEW.id % 3 = 0 BEGIN " +
        "UPDATE t SET c = c + NEW.id, v = v || '+' WHERE id = NEW.id; END;" +
      "CREATE TRIGGER u2 AFTER INSERT ON t BEGIN " +
        // bare c reads u1's composed effect; NEW.id the fixed image;
        // two assignments in ONE statement read the same pre-state
        "UPDATE t SET c = c * 2, v = v || length(v) WHERE id = NEW.id; " +
        "INSERT INTO log (msg) VALUES ('saw ' || NEW.id); END;" +
      "INSERT INTO t SELECT k, 'v' || k, k % 7 FROM src;"
    runBoth(id, db, script)
    same(id, db, "SELECT count(*) AS n, sum(c) AS s FROM t;")
    same(id, db, "SELECT id, v, c FROM t ORDER BY id LIMIT 40;")
    same(id, db, "SELECT id, v, c FROM t WHERE id % 211 = 0 ORDER BY id;")
    same(id, db, "SELECT count(*) AS n FROM log;")
    same(id, db, "SELECT lid, msg FROM log ORDER BY lid LIMIT 20;")
  }

  test("self-row UPDATE: vectorized and general tiers agree with sqlite3 " +
      "(same scenario, an extra WHERE conjunct forces the general loop)") {
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, c INTEGER);"
    def script(generalize: Boolean): String = {
      // the extra conjunct is semantically inert but outside the
      // compiled shape (exactly `id = NEW.id`), forcing the general tier
      val where = if (generalize) "id = NEW.id AND NEW.id >= 0" else "id = NEW.id"
      "CREATE TRIGGER u AFTER INSERT ON t BEGIN " +
        s"UPDATE t SET c = c + 10 WHERE $where; END;" +
        "INSERT INTO t VALUES " +
        (1 to 60).map(i => s"($i, $i)").mkString(", ") + ";"
    }
    val idV = seg(schema); val dbV = cliDb(schema)
    runBoth(idV, dbV, script(generalize = false))
    same(idV, dbV, "SELECT id, c FROM t ORDER BY id;")
    val idG = seg(schema); val dbG = cliDb(schema)
    runBoth(idG, dbG, script(generalize = true))
    same(idG, dbG, "SELECT id, c FROM t ORDER BY id;")
  }

  test("self-row UPDATE residual shapes stay correct on the general tier") {
    // cross-row predicate: each firing increments EVERY earlier row —
    // per-row interleaving is observable, outside the vectorized shape
    val schema = "CREATE TABLE t (id INTEGER PRIMARY KEY, c INTEGER);"
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db,
      "CREATE TRIGGER u AFTER INSERT ON t BEGIN " +
        "UPDATE t SET c = c + 1 WHERE id <= NEW.id; END;" +
        "INSERT INTO t VALUES " +
        (1 to 40).map(i => s"($i, 0)").mkString(", ") + ";")
    same(id, db, "SELECT id, c FROM t ORDER BY id;")
    same(id, db, "SELECT sum(c) AS s FROM t;")
  }
}
