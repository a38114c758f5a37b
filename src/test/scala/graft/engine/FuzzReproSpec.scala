package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** Pinned reproducers for divergences the r17 high-volume write fuzz
  * (1,000 scripts, seed 20260816) surfaced — kept as permanent
  * regression differentials:
  *
  *  - [552]/[836] INSERT OR IGNORE with triggers: the general firing
  *    loop tracked conflicts only on the PRIMARY KEY, so a collated
  *    secondary-UNIQUE collision slipped through to a spurious
  *    commit-time UNIQUE error where sqlite3 silently drops the row.
  *  - [724] the vectorized INSERT firing tier skipped statement-time
  *    NOT NULL/CHECK enforcement, accepting an explicit NULL sqlite3
  *    rejects.
  *  - [749] a plain UPDATE whose WHERE compares a COLLATE RTRIM
  *    column against a trailing-space literal missed the match.
  */
class FuzzReproSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-frepro").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0

  /** Run `script` against a fresh segment + a fresh sqlite3 db over
    * `ddl`; outcomes (error vs success) must agree, and on success the
    * full content of `tables` must render identically. */
  private def differential(ddl: String, script: String,
      tables: Seq[String]): Unit = {
    n += 1
    val segId = s"frepro-$n"
    engine.schemas.put(s"frepro-schema-$n", ddl)
    engine.provisionWritable(segId, s"frepro-schema-$n")
    val db = Files.createTempDirectory(s"frepro-$n").resolve("f.sqlite")
    assert(SqliteCli.run(db.toString, ddl) == 0)
    val engineErr = scala.util.Try(engine.write(segId, script)).failed.toOption
    val rc = SqliteCli.run(db.toString,
      ".bail on\nBEGIN;\n" + script + "\nCOMMIT;")
    assert(engineErr.isDefined == (rc != 0),
      s"outcome diverged: engine=${engineErr.map(_.getMessage)} sqlite3 rc=$rc")
    if (engineErr.isEmpty) tables.foreach { tbl =>
      val q = s"SELECT * FROM $tbl ORDER BY 1;"
      val ours = engine.read(segId, q).collect().map { r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
      }.mkString("\n")
      val theirs = SqliteCli.query(db.toString, q)
      assert(ours == theirs, s"$tbl diverged\n-- engine --\n$ours\n-- sqlite3 --\n$theirs")
    }
  }

  test("[552] OR IGNORE drops a NOCASE-UNIQUE collision with triggers active") {
    differential(
      "CREATE TABLE t (id INTEGER PRIMARY KEY, c1 TEXT COLLATE NOCASE UNIQUE, " +
        "c2 TEXT COLLATE RTRIM, c3 REAL) STRICT;\n" +
        "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);",
      "INSERT  INTO t VALUES (2, 't0', 'bb ', -2);" +
        "CREATE TRIGGER tg1 AFTER INSERT ON t WHEN NEW.id > 4 BEGIN " +
        "INSERT INTO log (msg) VALUES ((SELECT count(id) FROM t) || '@' || NEW.id); END;" +
        "ALTER TABLE t RENAME COLUMN c1 TO c1r;" +
        "INSERT OR IGNORE  INTO t VALUES (3, 'bb', 'bb', 2);" +
        "INSERT OR IGNORE  INTO t VALUES (4, 'bb', 'aa', 9);" +
        "INSERT INTO t VALUES (2, 'bb  ', 'bb ', -3) ON CONFLICT(id) DO UPDATE SET c2 = excluded.c2;",
      Seq("t", "log"))
  }

  test("[836] OR IGNORE drops a NOCASE-UNIQUE collision (AFTER + DELETE triggers)") {
    differential(
      "CREATE TABLE t (id INTEGER PRIMARY KEY, c1 TEXT COLLATE NOCASE DEFAULT 't2' UNIQUE, " +
        "c2 INTEGER, c3 TEXT COLLATE RTRIM NOT NULL DEFAULT 't2', c4 REAL) STRICT;\n" +
        "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);",
      "INSERT  INTO t VALUES (2, 'T0', -4, 'AA', 6.225);" +
        "CREATE TRIGGER tg1 AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('I' || NEW.id); END;" +
        "INSERT  INTO t VALUES (3, 'aa', -1, 'T0', 9);" +
        "INSERT OR IGNORE  INTO t VALUES (1, 'T0', -5, 't0', 9);" +
        "CREATE TRIGGER tg2 BEFORE DELETE ON t BEGIN INSERT INTO log (msg) VALUES ('D' || OLD.id); END;" +
        "DELETE FROM t WHERE c1 = 'c c';" +
        "UPDATE t SET c3 = 't1' WHERE id % 2 = 0;",
      Seq("t", "log"))
  }

  test("[724] explicit NULL into NOT NULL errors on the vectorized trigger tier") {
    differential(
      "CREATE TABLE t (id INTEGER PRIMARY KEY, c1 TEXT, c2 INTEGER, " +
        "c3 TEXT COLLATE NOCASE NOT NULL DEFAULT 'Aa' UNIQUE, c4 INTEGER);\n" +
        "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);",
      "DELETE FROM t WHERE c1 = 'bb  ';" +
        "DELETE FROM t WHERE id > 3;" +
        "CREATE TRIGGER tg1 AFTER INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('I' || NEW.id); END;" +
        "INSERT OR REPLACE  INTO t VALUES (2, 't1', 5, 't1', 5);" +
        "CREATE VIEW v (vid, vc) AS SELECT id, c1 FROM t WHERE id % 4 = 0;" +
        "INSERT  INTO t VALUES (3, 'AA', 12, NULL, 7);" +
        "UPDATE t SET c3 = 'bb ' WHERE id % 3 = 0;",
      Seq("t", "log"))
  }

  test("[749] UPDATE WHERE applies a declared RTRIM collation") {
    differential(
      "CREATE TABLE t (id INTEGER PRIMARY KEY, c1 TEXT COLLATE NOCASE DEFAULT 'bb ', " +
        "c2 INTEGER, c3 TEXT COLLATE RTRIM);\n" +
        "CREATE TABLE log (lid INTEGER PRIMARY KEY AUTOINCREMENT, msg TEXT);",
      "INSERT  INTO t VALUES (2, 'T0', 12, 'aa');" +
        "INSERT  INTO t VALUES (3, 'c c', 3, 't0');" +
        "UPDATE t SET c3 = 't1' WHERE id % 3 = 0;" +
        "INSERT OR IGNORE  INTO t VALUES (4, 'AA', 19, 'bb');" +
        "UPDATE t SET c2 = 1 WHERE c3 = 'bb  ';" +
        "CREATE TRIGGER tg1 BEFORE INSERT ON t BEGIN INSERT INTO log (msg) VALUES ('I' || NEW.id); END;" +
        "UPDATE t SET c3 = 'c c' WHERE c1 = 't2';" +
        "CREATE TRIGGER tg2 BEFORE UPDATE ON t BEGIN INSERT INTO log (msg) VALUES ('U' || NEW.id); END;",
      Seq("t", "log"))
  }
}
