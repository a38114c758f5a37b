package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** fts5 `content=` tables (r15), DIFFERENTIAL against the sandbox
  * sqlite3: external content (`content='src'`, values resolved from
  * the named table by `content_rowid`) and contentless (`content=''`,
  * column reads answer NULL). The index state lives in a hidden
  * rowid-bearing backing table maintained by the fts DML surface —
  * INSERT (explicit or auto rowid), the 'delete' / 'delete-all' /
  * 'rebuild' commands (fts5.html §4.4.3), UPDATE/DELETE by rowid on
  * external content — while reads resolve values per real fts5's
  * probed shapes: non-MATCH scans of an external-content table read
  * the CONTENT table (even never-indexed rows), MATCH answers from
  * the INDEX, and the canonical sync-trigger deployment keeps both
  * aligned. The reference delegates all of fts5 to libsqlite3
  * (trough/read.py:63-67, write.py:40), where content= is the most
  * common real-world deployment shape. */
class ContentFtsSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-cfts").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"cf-$n"
    engine.schemas.put(s"cf-schema-$n", schema)
    engine.provisionWritable(id, s"cf-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("cfts-cli", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString, schema) == 0)
    db
  }

  private def runBoth(id: String, db: Path, script: String): Unit = {
    engine.write(id, script)
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") == 0, s"sqlite3 failed: $script")
  }

  private def same(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
    }.mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- sqlite3 --\n$cliSide\n-- for --\n$select")
  }

  private val extSchema =
    "CREATE TABLE src(id INTEGER PRIMARY KEY, title TEXT, body TEXT);\n" +
      "CREATE VIRTUAL TABLE t USING fts5(title, body, content='src', " +
      "content_rowid='id');"
  private val extFill =
    "INSERT INTO src VALUES (1,'one','hello world'), " +
      "(2,'two','goodbye world'), (3,'three','hello again');\n" +
      "INSERT INTO t(rowid, title, body) SELECT id, title, body FROM src;"

  test("external content: MATCH answers from the index, values from src") {
    val id = seg(extSchema); val db = cliDb(extSchema)
    runBoth(id, db, extFill)
    same(id, db, "SELECT title, body FROM t WHERE t MATCH 'hello' " +
      "ORDER BY title;")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'world' ORDER BY title;")
    same(id, db, "SELECT count(*) FROM t;")
    same(id, db, "SELECT title FROM t ORDER BY title;")
    // bm25 / highlight / snippet read index stats + content text
    same(id, db, "SELECT title, printf('%.4f', bm25(t)) FROM t " +
      "WHERE t MATCH 'hello' ORDER BY title;")
    same(id, db, "SELECT highlight(t, 1, '[', ']') FROM t " +
      "WHERE t MATCH 'hello' ORDER BY title;")
    same(id, db, "SELECT snippet(t, 1, '[', ']', '…', 3) FROM t " +
      "WHERE t MATCH 'hello' ORDER BY title;")
    // rowid reads: the external-content join-back idiom (r15)
    same(id, db, "SELECT rowid, title FROM t WHERE t MATCH 'hello' " +
      "ORDER BY rowid;")
    same(id, db, "SELECT t.rowid FROM t WHERE t MATCH 'world' " +
      "ORDER BY t.rowid;")
    same(id, db, "SELECT x.rowid, x.title FROM t AS x " +
      "WHERE x.t MATCH 'hello' ORDER BY x.rowid;")
    same(id, db, "SELECT s.title FROM src s JOIN t ON s.id = t.rowid " +
      "WHERE t MATCH 'hello' ORDER BY s.title;")
  }

  test("external content: out-of-sync rows — content scan vs index MATCH") {
    val id = seg(extSchema); val db = cliDb(extSchema)
    runBoth(id, db, extFill)
    // a row added to content but never indexed: non-MATCH scans see
    // it, MATCH does not (probed)
    runBoth(id, db, "INSERT INTO src VALUES (4,'four','hello four');")
    same(id, db, "SELECT count(*) FROM t;")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    same(id, db, "SELECT title FROM t ORDER BY title;")
  }

  test("external content: the 'delete' command unindexes one rowid") {
    val id = seg(extSchema); val db = cliDb(extSchema)
    runBoth(id, db, extFill)
    runBoth(id, db,
      "INSERT INTO t(t, rowid, title, body) " +
        "VALUES('delete', 1, 'one', 'hello world');")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    // 'rebuild' resyncs the whole index from src
    runBoth(id, db, "INSERT INTO t(t) VALUES('rebuild');")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    // 'delete-all' empties the index; content still scans
    runBoth(id, db, "INSERT INTO t(t) VALUES('delete-all');")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    same(id, db, "SELECT count(*) FROM t;")
    // 'optimize' is accepted
    runBoth(id, db, "INSERT INTO t(t) VALUES('optimize');")
  }

  test("external content: UPDATE/DELETE address the index by rowid") {
    val id = seg(extSchema); val db = cliDb(extSchema)
    runBoth(id, db, extFill)
    runBoth(id, db, "DELETE FROM t WHERE rowid = 1;")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    runBoth(id, db, "UPDATE t SET body = 'changed text' WHERE rowid = 3;")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'changed' ORDER BY title;")
  }

  test("external content: the canonical sync-trigger deployment") {
    val triggers =
      "CREATE TRIGGER src_ai AFTER INSERT ON src BEGIN\n" +
        "  INSERT INTO t(rowid, title, body) VALUES (new.id, new.title, new.body);\n" +
        "END;\n" +
        "CREATE TRIGGER src_ad AFTER DELETE ON src BEGIN\n" +
        "  INSERT INTO t(t, rowid, title, body) VALUES('delete', old.id, old.title, old.body);\n" +
        "END;\n" +
        "CREATE TRIGGER src_au AFTER UPDATE ON src BEGIN\n" +
        "  INSERT INTO t(t, rowid, title, body) VALUES('delete', old.id, old.title, old.body);\n" +
        "  INSERT INTO t(rowid, title, body) VALUES (new.id, new.title, new.body);\n" +
        "END;"
    val id = seg(extSchema); val db = cliDb(extSchema)
    runBoth(id, db, triggers)
    runBoth(id, db,
      "INSERT INTO src VALUES (1,'one','hello world'), (2,'two','goodbye');")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    runBoth(id, db, "UPDATE src SET body='fresh hello' WHERE id=2;")
    same(id, db, "SELECT title, body FROM t WHERE t MATCH 'hello' ORDER BY title;")
    runBoth(id, db, "DELETE FROM src WHERE id=1;")
    same(id, db, "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
    same(id, db, "SELECT count(*) FROM t;")
  }

  // ------------------------------------------------------ contentless

  private val clSchema = "CREATE VIRTUAL TABLE t USING fts5(a, b, content='');"

  test("contentless: MATCH works, column reads answer NULL") {
    val id = seg(clSchema); val db = cliDb(clSchema)
    runBoth(id, db, "INSERT INTO t(rowid, a, b) VALUES " +
      "(10,'hello world','x'), (20,'goodbye world','y');")
    same(id, db, "SELECT count(*) FROM t;")
    same(id, db, "SELECT a, b FROM t;")
    same(id, db, "SELECT rowid FROM t ORDER BY rowid;")
    same(id, db, "SELECT rowid FROM t WHERE t MATCH 'hello' ORDER BY rowid;")
    same(id, db, "SELECT coalesce(a, 'NULL') FROM t WHERE t MATCH 'hello';")
    same(id, db, "SELECT count(*) FROM t WHERE t MATCH 'world';")
    same(id, db, "SELECT printf('%.4f', bm25(t)) FROM t WHERE t MATCH 'hello';")
    same(id, db, "SELECT highlight(t, 0, '[', ']') IS NULL FROM t " +
      "WHERE t MATCH 'hello';")
    same(id, db, "SELECT snippet(t, 0, '[', ']', 'E', 3) IS NULL FROM t " +
      "WHERE t MATCH 'hello';")
    // auto-assigned rowid continues from the max (probed)
    runBoth(id, db, "INSERT INTO t(a, b) VALUES ('auto assigned','z');")
    same(id, db, "SELECT count(*) FROM t WHERE t MATCH 'auto';")
  }

  test("contentless: DML errors and command surface match real fts5") {
    val id = seg(clSchema)
    engine.write(id, "INSERT INTO t(rowid, a, b) VALUES (1,'hello','x');")
    val eDel = intercept[Exception](
      engine.write(id, "DELETE FROM t WHERE rowid=1;"))
    assert(eDel.getMessage.contains("cannot DELETE from contentless fts5 table"))
    val eUpd = intercept[Exception](
      engine.write(id, "UPDATE t SET a='y' WHERE rowid=1;"))
    assert(eUpd.getMessage.contains("cannot UPDATE contentless fts5 table"))
    val eReb = intercept[Exception](
      engine.write(id, "INSERT INTO t(t) VALUES('rebuild');"))
    assert(eReb.getMessage.contains(
      "'rebuild' may not be used with a contentless fts5 table"))
    // the 'delete' command IS allowed (probed on 3.51)
    engine.write(id,
      "INSERT INTO t(t, rowid, a, b) VALUES('delete', 1, 'hello', 'x');")
    assert(engine.read(id,
      "SELECT count(*) FROM t WHERE t MATCH 'hello';")
      .collect()(0).getLong(0) == 0L)
  }

  test("contentless_delete=1: rowid DELETE/UPDATE allowed, 'delete' refused (r16)") {
    val s = "CREATE VIRTUAL TABLE c USING fts5(x, content='', " +
      "contentless_delete=1);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, "INSERT INTO c(rowid, x) VALUES (1, 'alpha beta'), " +
      "(2, 'beta gamma'), (3, 'alpha gamma');")
    runBoth(id, db, "DELETE FROM c WHERE rowid = 1;")
    same(id, db, "SELECT rowid FROM c WHERE c MATCH 'alpha';")
    runBoth(id, db, "UPDATE c SET x = 'zeta' WHERE rowid = 2;")
    same(id, db, "SELECT rowid FROM c WHERE c MATCH 'beta';")
    same(id, db, "SELECT rowid FROM c WHERE c MATCH 'zeta';")
    // the 'delete' command is the one surface the option REMOVES
    val e = intercept[Exception](engine.write(id,
      "INSERT INTO c(c, rowid, x) VALUES ('delete', 3, 'alpha gamma');"))
    assert(e.getMessage.contains(
      "'delete' may not be used with a contentless_delete=1 table"),
      e.getMessage)
    assert(SqliteCli.run(db.toString,
      "INSERT INTO c(c, rowid, x) VALUES ('delete', 3, 'alpha gamma');") != 0)
    // delete-all still works
    runBoth(id, db, "INSERT INTO c(c) VALUES ('delete-all');")
    same(id, db, "SELECT count(*) FROM c WHERE c MATCH 'gamma';")
  }

  test("command-surface errors on plain fts tables match real fts5") {
    val plain = "CREATE VIRTUAL TABLE p USING fts5(a);"
    val id = seg(plain)
    engine.write(id, "INSERT INTO p VALUES ('hello');")
    val eDel = intercept[Exception](engine.write(id,
      "INSERT INTO p(p, rowid, a) VALUES('delete', 1, 'hello');"))
    assert(eDel.getMessage.contains("SQL logic error"))
    val eDelAll = intercept[Exception](engine.write(id,
      "INSERT INTO p(p) VALUES('delete-all');"))
    assert(eDelAll.getMessage.contains(
      "'delete-all' may only be used with a contentless or external"))
    val eBogus = intercept[Exception](engine.write(id,
      "INSERT INTO p(p) VALUES('bogus');"))
    assert(eBogus.getMessage.contains("SQL logic error"))
    // accepted maintenance no-ops
    engine.write(id, "INSERT INTO p(p) VALUES('rebuild');")
    engine.write(id, "INSERT INTO p(p) VALUES('optimize');")
    engine.write(id, "INSERT INTO p(p, rank) VALUES('pgsz', 4096);")
    assert(engine.read(id, "SELECT count(*) FROM p WHERE p MATCH 'hello';")
      .collect()(0).getLong(0) == 1L)
  }

  test("fuzz: 60 random sync-command sequences agree with real fts5") {
    val id = seg(extSchema); val db = cliDb(extSchema)
    val rng = new scala.util.Random(20260815L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "hello", "world")
    var nextId = 1L
    val live = scala.collection.mutable.ArrayBuffer[Long]()
    def words() =
      Seq.fill(2 + rng.nextInt(4))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    (1 to 60).foreach { i =>
      val op = rng.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // content insert + index sync (the contract)
          val rid = nextId; nextId += 1; live += rid
          val (t1, b1) = (words(), words())
          s"INSERT INTO src VALUES ($rid, '$t1', '$b1');\n" +
            s"INSERT INTO t(rowid, title, body) VALUES ($rid, '$t1', '$b1');"
        case 4 | 5 if live.nonEmpty => // the 'delete' sync command
          val rid = live.remove(rng.nextInt(live.length))
          s"INSERT INTO t(t, rowid, title, body) " +
            s"SELECT 'delete', id, title, body FROM src WHERE id = $rid;\n" +
            s"DELETE FROM src WHERE id = $rid;"
        case 6 if live.nonEmpty => // rowid-addressed index delete + resync
          val rid = live(rng.nextInt(live.length))
          s"DELETE FROM t WHERE rowid = $rid;\n" +
            "INSERT INTO t(t) VALUES('rebuild');"
        case 7 => "INSERT INTO t(t) VALUES('rebuild');"
        case 8 => "INSERT INTO t(t) VALUES('optimize');"
        case _ if live.nonEmpty => // content update + delete/insert resync
          val rid = live(rng.nextInt(live.length))
          val (t2, b2) = (words(), words())
          s"INSERT INTO t(t, rowid, title, body) " +
            s"SELECT 'delete', id, title, body FROM src WHERE id = $rid;\n" +
            s"UPDATE src SET title = '$t2', body = '$b2' WHERE id = $rid;\n" +
            s"INSERT INTO t(rowid, title, body) VALUES ($rid, '$t2', '$b2');"
        case _ => "INSERT INTO t(t) VALUES('optimize');"
      }
      runBoth(id, db, op)
      if (i % 5 == 0) {
        val w = vocab(rng.nextInt(vocab.length))
        same(id, db, s"SELECT title, body FROM t " +
          s"WHERE t MATCH '$w' ORDER BY title, body;")
        same(id, db, "SELECT count(*) FROM t;")
        same(id, db, s"SELECT title, printf('%.4f', bm25(t)) FROM t " +
          s"WHERE t MATCH '$w OR hello' ORDER BY title, 2;")
      }
    }
  }

  // --------------------------------------------- export round trip

  test("export: external-content index + content table read back in sqlite3") {
    val id = seg(extSchema)
    engine.write(id, extFill)
    val out = Files.createTempFile("cfts-export", ".sqlite")
    Files.delete(out)
    store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    assert(SqliteCli.query(out.toString,
      "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;") ==
      "one\nthree")
    assert(SqliteCli.query(out.toString,
      "SELECT count(*) FROM t;") == "3")
    // ingest the exported file back: the index state rebuilds from the
    // content table (synced by construction here)
    val id2 = "cf-roundtrip"
    store.ingestSqliteSegment(out.toString, id2)
    val got = engine.read(id2,
      "SELECT title FROM t WHERE t MATCH 'hello' ORDER BY title;")
      .collect().map(_.getString(0)).mkString(",")
    assert(got == "one,three", got)
  }

  test("write-path rowid rewrite is scoped: subqueries over OTHER tables untouched") {
    val id = seg(extSchema); val db = cliDb(extSchema)
    runBoth(id, db, extFill)
    // a subquery over ANOTHER table: its columns stay its own — r16,
    // the rewrite must not reach inside the parenthesized SELECT (and
    // the txn's tables are now visible to write-path subqueries at all)
    runBoth(id, db, "DELETE FROM t WHERE rowid IN " +
      "(SELECT id FROM src WHERE title = 'two');")
    same(id, db, "SELECT rowid, title FROM t ORDER BY rowid;")
    // qualified references: the target's rewrites, others stay theirs
    runBoth(id, db, "DELETE FROM t WHERE t.rowid IN " +
      "(SELECT src.id FROM src WHERE src.body LIKE 'hello a%');")
    same(id, db, "SELECT rowid, title FROM t ORDER BY rowid;")
    // a subquery over the TARGET fts table itself: its bare rowid DOES
    // bind to the target and must still rewrite
    runBoth(id, db, "INSERT INTO t(rowid, title, body) VALUES " +
      "(2, 'two', 'goodbye world'), (3, 'three', 'hello again');")
    runBoth(id, db, "DELETE FROM t WHERE rowid IN " +
      "(SELECT rowid FROM t WHERE title = 'two');")
    same(id, db, "SELECT rowid, title FROM t ORDER BY rowid;")
    // UPDATE with a scalar subquery over another table
    runBoth(id, db, "UPDATE t SET title = 'X' WHERE rowid = " +
      "(SELECT max(id) FROM src WHERE id < 99);")
    same(id, db, "SELECT rowid, title FROM t ORDER BY rowid;")
  }

  test("rowid surfaces only when PROJECTED; WHERE/ORDER BY uses never leak it") {
    val id = seg(extSchema); val db = cliDb(extSchema)
    runBoth(id, db, extFill)
    // star + rowid in WHERE: real fts5 shows ONLY the declared columns
    // (r16 — the hidden __rid#t column must drop, not rename)
    same(id, db, "SELECT * FROM t WHERE rowid = 2;")
    assert(engine.read(id, "SELECT * FROM t WHERE rowid = 2;")
      .columns.toSeq == Seq("title", "body"))
    // explicit projections still surface under SQLite's column name
    same(id, db, "SELECT rowid, title FROM t WHERE rowid >= 2 ORDER BY rowid;")
    same(id, db, "SELECT t.rowid FROM t WHERE t MATCH 'hello' ORDER BY 1;")
    // ORDER BY-only use resolves but produces no column
    same(id, db, "SELECT title FROM t ORDER BY rowid;")
    assert(engine.read(id, "SELECT title FROM t ORDER BY rowid;")
      .columns.toSeq == Seq("title"))
    // a subquery's projected rowid doesn't rename the outer star leak
    same(id, db, "SELECT * FROM t WHERE rowid IN (SELECT rowid FROM t " +
      "WHERE title = 'two');")
    assert(engine.read(id, "SELECT * FROM t WHERE rowid IN " +
      "(SELECT rowid FROM t WHERE title = 'two');")
      .columns.toSeq == Seq("title", "body"))
  }
}
