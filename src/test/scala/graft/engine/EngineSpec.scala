package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** End-to-end behavioral port of the reference's read/write/lifecycle
  * tests (tests/test_read.py, tests/test_write.py,
  * tests/wsgi/test_segment_manager.py) against the Spark engine. */
class EngineSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-engine").toString
  private lazy val durable = Files.createTempDirectory("graft-durable").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root,
      coldRoot = None, coldPredicate = _.startsWith("cold"))
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private val testDdl =
    "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4));"

  // ------------------------------------------------------- schema registry

  test("schema registry: default schema is the empty string (sync.py:159-164)") {
    assert(engine.schemas.get("default").contains(""))
  }

  test("schema registry: valid DDL registers, invalid is rejected (segment_manager 400s)") {
    engine.schemas.put("seg-schema", testDdl)
    assert(engine.schemas.get("seg-schema").contains(testDdl))
    intercept[Exception](engine.schemas.put("bad id!", testDdl))
    intercept[Exception](engine.schemas.put("bad-sql", "INSERT INTO x VALUES (1);"))
    intercept[Exception](engine.schemas.put("bad-ddl", "CREATE GIBBERISH"))
  }

  // ----------------------------------------------- read path (test_read.py)

  test("empty read: provisioned table, no rows -> [] (test_read.py:18-35)") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("seg-empty", "s1")
    val json = engine.resultJson(engine.read("seg-empty", "SELECT * FROM \"test\";"))
    assert(json == "[]\n")
  }

  test("single-row round trip to JSON (test_read.py:36-57)") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("seg-read", "s1")
    engine.write("seg-read", "INSERT INTO test (test) VALUES ('test');")
    val json = engine.resultJson(engine.read("seg-read", "SELECT * FROM test;"))
    assert(json == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("rows stream in the reference's wire shape: [ , \\n separators, ]\\n") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("seg-multi", "s1")
    engine.write("seg-multi",
      "INSERT INTO test (test) VALUES ('a'); INSERT INTO test (test) VALUES ('b');")
    val json = engine.resultJson(engine.read("seg-multi", "SELECT * FROM test ORDER BY id;"))
    assert(json == "[{\"id\":1,\"test\":\"a\"},\n{\"id\":2,\"test\":\"b\"}]\n")
  }

  test("null rendering in JSON results") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("seg-null", "s1")
    engine.write("seg-null", "INSERT INTO test (id, test) VALUES (7, null);")
    val json = engine.resultJson(engine.read("seg-null", "SELECT * FROM test;"))
    assert(json == "[{\"id\":7,\"test\":null}]\n")
  }

  test("write on the read path is rejected (test_read.py:58-76)") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("seg-ro", "s1")
    val e = intercept[IllegalArgumentException](
      engine.read("seg-ro", "INSERT INTO test (test) VALUES ('x');"))
    assert(e.getMessage == "Exactly one SELECT query per request, please.")
  }

  test("multi-statement read is rejected (read.py:58)") {
    val e = intercept[IllegalArgumentException](
      engine.validateRead("SELECT 1; SELECT 2;"))
    assert(e.getMessage == "Exactly one SELECT query per request, please.")
  }

  test("trough UDFs are available on the read path (read.py:63-64)") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("seg-udf", "s1")
    engine.write("seg-udf", "INSERT INTO test (test) VALUES ('abc');")
    val json = engine.resultJson(engine.read("seg-udf",
      "SELECT test FROM test WHERE REGEXP('^a', test);"))
    assert(json == "[{\"test\":\"abc\"}]\n")
  }

  // --------------------------------------------- write path (test_write.py)

  test("empty write raises 'No query provided.' (test_write.py:14-21)") {
    engine.provisionWritable("seg-w0")
    val e = intercept[IllegalArgumentException](engine.write("seg-w0", "  "))
    assert(e.getMessage == "No query provided.")
  }

  test("write without a lock is refused with the reference's message shape (write.py:55-57)") {
    val e = intercept[IllegalStateException](
      engine.write("seg-unprovisioned", "CREATE TABLE t (a INT);"))
    assert(e.getMessage.contains("cannot write to segment"))
    assert(e.getMessage.contains("no write lock"))
  }

  test("DDL+DML script round trip, atomic per request (test_write.py:30-50)") {
    engine.provisionWritable("seg-w1") // default empty schema
    engine.write("seg-w1",
      """CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4));
         INSERT INTO test (test) VALUES ('test');""")
    val json = engine.resultJson(engine.read("seg-w1", "SELECT * FROM test;"))
    assert(json == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("reference byte-shapes: double-quoted VALUES literal + quoted table read " +
      "(test_write.py:41-42, test_read.py:49-50)") {
    // SQLite's quirk: "test" is a string literal in VALUES (no identifier
    // resolves) but an identifier in FROM. The write path evaluates VALUES
    // on the base session (double quote = literal); the read session sets
    // doubleQuotedIdentifiers, so both reference test shapes work verbatim.
    engine.provisionWritable("seg-dq")
    engine.write("seg-dq",
      "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4));")
    engine.write("seg-dq", "INSERT INTO test (test) VALUES (\"test\");")
    val json = engine.resultJson(engine.read("seg-dq", "SELECT * FROM \"test\";"))
    assert(json == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("shell session: CONNECT / CONNECT MATCHING / SHOW CONNECTIONS / fanout select") {
    Seq("conn-a-1", "conn-a-2", "conn-b-1").foreach { seg =>
      engine.provisionWritable(seg)
      engine.write(seg, "CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT);" +
        s"INSERT INTO t (v) VALUES ('$seg');")
    }
    val sess = new Shell.Session(engine)
    // CONNECT replaces, not appends (reference do_connect semantics)
    sess.connect(Seq("conn-b-1"))
    assert(sess.connectMatching("conn-a-.*") == Seq("conn-a-1", "conn-a-2"))
    assert(sess.connected == Seq("conn-a-1", "conn-a-2"))
    val conns = sess.connections()
    assert(conns.map(_.segmentId) == Seq("conn-a-1", "conn-a-2"))
    assert(conns.forall(_.readable))
    assert(conns.forall(_.writeLockHolder.isDefined)) // provisioned => locked
    val result = sess.select("SELECT v FROM t;")
    assert(result.totalRows == 2)
    assert(result.perSegment.map(_._1) == Seq("conn-a-1", "conn-a-2"))
    intercept[IllegalArgumentException] {
      new Shell.Session(engine).select("SELECT 1;") // not connected
    }
  }

  test("datetime() modifiers and random() int64 on the read path") {
    engine.provisionWritable("seg-dt")
    engine.write("seg-dt", "CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT);" +
      "INSERT INTO t (v) VALUES ('x');")
    val row = engine.read("seg-dt",
      """SELECT datetime('2024-03-15T10:30:45') AS plain,
        |       datetime('2024-03-15 10:30:45', '+1 day') AS plus_day,
        |       datetime('2024-03-15 10:30:45', 'start of month') AS som,
        |       datetime('2024-03-15 10:30:45', '-2 hours', 'start of day') AS chain,
        |       datetime('1710498645', 'unixepoch') AS epoch,
        |       random() AS r
        |FROM t;""".stripMargin).collect()(0)
    assert(row.getString(0) == "2024-03-15 10:30:45")
    assert(row.getString(1) == "2024-03-16 10:30:45")
    assert(row.getString(2) == "2024-03-01 00:00:00")
    assert(row.getString(3) == "2024-03-15 00:00:00")
    assert(row.getString(4) == "2024-03-15 10:30:45")
    assert(row.schema("r").dataType.typeName == "long") // int64, not double
  }

  test("glob() compat function on the read path (SQLite GLOB semantics)") {
    engine.provisionWritable("seg-glob")
    engine.write("seg-glob",
      """CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT, name TEXT);
         INSERT INTO t (name) VALUES ('alpha'); INSERT INTO t (name) VALUES ('Alpha');
         INSERT INTO t (name) VALUES ('beta1'); INSERT INTO t (name) VALUES (null);""")
    // case-sensitive star/question/class patterns, whole-string anchored
    val out = engine.read("seg-glob",
      "SELECT name FROM t WHERE glob('a*', name) ORDER BY name;")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("alpha")) // not 'Alpha' (case), not 'beta1' (anchor)
    val cls = engine.read("seg-glob",
      "SELECT name FROM t WHERE glob('[ab]*[0-9]', name);")
      .collect().map(_.getString(0)).toSeq
    assert(cls == Seq("beta1"))
    val q = engine.read("seg-glob",
      "SELECT count(*) AS n FROM t WHERE glob('?lpha', name);")
      .collect()(0).getLong(0)
    assert(q == 2) // '?' matches exactly one char: alpha + Alpha
  }

  test("UPDATE evaluates WHERE and all RHS against pre-statement state (SQLite semantics)") {
    engine.provisionWritable("seg-upd")
    engine.write("seg-upd",
      """CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER, b INTEGER);
         INSERT INTO t (id, a, b) VALUES (1, 1, 2), (2, 5, 6);""")
    // assignment rewrites the predicate column first: b must still update
    engine.write("seg-upd", "UPDATE t SET a = 0, b = 9 WHERE a = 1;")
    val r1 = engine.read("seg-upd", "SELECT a, b FROM t WHERE id = 1;").collect()(0)
    assert(r1.getLong(0) == 0L && r1.getLong(1) == 9L)
    // swap: both columns read the OLD values
    engine.write("seg-upd", "UPDATE t SET a = b, b = a WHERE id = 2;")
    val r2 = engine.read("seg-upd", "SELECT a, b FROM t WHERE id = 2;").collect()(0)
    assert(r2.getLong(0) == 6L && r2.getLong(1) == 5L)
    // a string literal containing ' WHERE ' must not split the statement
    engine.write("seg-upd", "CREATE TABLE notes (id INTEGER PRIMARY KEY, note TEXT);" +
      "INSERT INTO notes (id, note) VALUES (1, 'x');")
    engine.write("seg-upd", "UPDATE notes SET note = 'see WHERE clause docs' WHERE id = 1;")
    assert(engine.read("seg-upd", "SELECT note FROM notes;").collect()(0)
      .getString(0) == "see WHERE clause docs")
  }

  test("INSERT OR REPLACE/IGNORE intra-statement duplicate PKs (last/first wins)") {
    engine.provisionWritable("seg-dup")
    engine.write("seg-dup", "CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT);")
    engine.write("seg-dup", "INSERT OR REPLACE INTO kv (k, v) VALUES (1, 'a'), (1, 'b');")
    val rep = engine.read("seg-dup", "SELECT v FROM kv WHERE k = 1;").collect()
    assert(rep.length == 1 && rep(0).getString(0) == "b") // SQLite keeps the last
    engine.write("seg-dup", "INSERT OR IGNORE INTO kv (k, v) VALUES (2, 'x'), (2, 'y');")
    val ign = engine.read("seg-dup", "SELECT v FROM kv WHERE k = 2;").collect()
    assert(ign.length == 1 && ign(0).getString(0) == "x") // IGNORE keeps the first
  }

  test("ALTER TABLE ADD COLUMN backfills the declared DEFAULT") {
    engine.provisionWritable("seg-def")
    engine.write("seg-def",
      "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT); INSERT INTO t (id, v) VALUES (1, 'x');")
    engine.write("seg-def", "ALTER TABLE t ADD COLUMN flag INTEGER NOT NULL DEFAULT 0;")
    assert(engine.read("seg-def", "SELECT flag FROM t WHERE id = 1;")
      .collect()(0).getLong(0) == 0L)
    engine.write("seg-def", "ALTER TABLE t ADD COLUMN note TEXT DEFAULT 'n/a';")
    assert(engine.read("seg-def", "SELECT note FROM t WHERE id = 1;")
      .collect()(0).getString(0) == "n/a")
  }

  test("datetime date-only input and glob negated-class escaping") {
    engine.provisionWritable("seg-misc")
    engine.write("seg-misc", "CREATE TABLE t (id INTEGER PRIMARY KEY); INSERT INTO t VALUES (1);")
    // NB double backslash: Spark string literals process escapes, so
    // '[^\\]' reaches glob() as the SQLite pattern [^\]
    val row = engine.read("seg-misc",
      """SELECT datetime('2024-03-15') AS d, glob('[^\\]', 'x') AS g FROM t;""").collect()(0)
    assert(row.getString(0) == "2024-03-15 00:00:00") // SQLite: midnight, not an error
    assert((row.getLong(1) == 1L)) // [^\] = any char except backslash
  }

  test("autoincrement assigns sequential rowids across requests") {
    engine.provisionWritable("seg-auto")
    engine.write("seg-auto", testDdl)
    engine.write("seg-auto", "INSERT INTO test (test) VALUES ('a');")
    engine.write("seg-auto",
      "INSERT INTO test (test) VALUES ('b'); INSERT INTO test (test) VALUES ('c');")
    val json = engine.resultJson(engine.read("seg-auto", "SELECT id FROM test ORDER BY id;"))
    assert(json == "[{\"id\":1},\n{\"id\":2},\n{\"id\":3}]\n")
  }

  test("failed script leaves no partial state (BEGIN...COMMIT contract, write.py:33-40)") {
    engine.provisionWritable("seg-atomic")
    engine.write("seg-atomic", testDdl)
    intercept[Exception](engine.write("seg-atomic",
      "INSERT INTO test (test) VALUES ('keep'); INSERT INTO nonexistent VALUES (1);"))
    val json = engine.resultJson(engine.read("seg-atomic", "SELECT count(*) AS n FROM test;"))
    assert(json == "[{\"n\":0}]\n")
  }

  test("aborted phase-1 leaves no phantom table: visibility is keyed on meta.json") {
    import spark.implicits._
    engine.provisionWritable("seg-phantom")
    engine.write("seg-phantom", "CREATE TABLE real_t (x INTEGER);")
    // simulate a crash between prepare and swap for an in-transaction
    // CREATE: prepare makes the table dir + data_tmp; meta.json only
    // lands at swap time — the half-prepared dir must stay invisible
    engine.store.prepareTableData("seg-phantom", "ghost", Seq(1).toDF("x"))
    assert(!engine.store.tableExists("seg-phantom", "ghost"))
    assert(engine.store.tables("seg-phantom") == Seq("real_t"))
    // and a retried CREATE goes through cleanly (pre-fix this threw
    // "table ghost already exists" against a table no read could see)
    engine.write("seg-phantom",
      "CREATE TABLE ghost (y INTEGER); INSERT INTO ghost (y) VALUES (7);")
    assert(engine.resultJson(engine.read("seg-phantom", "SELECT y FROM ghost;"))
      == "[{\"y\":7}]\n")
  }

  test("layout-hostile names are clean errors: '_'-prefixed tables, segment_id column") {
    engine.provisionWritable("seg-names")
    // a '_'/'.'-prefixed table would be writable but invisible to scans
    // (hidden-file filter) — must be rejected up front, not half-created
    val e1 = intercept[Exception](
      engine.write("seg-names", "CREATE TABLE _audit (x INTEGER);"))
    assert(e1.getMessage.contains("not supported by the table-major layout"), e1.getMessage)
    assert(engine.store.tables("seg-names").isEmpty)
    // segment_id is the cross-segment partition column
    val e2 = intercept[Exception](
      engine.write("seg-names", "CREATE TABLE audit (segment_id TEXT, msg TEXT);"))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    assert(engine.store.tables("seg-names").isEmpty)
    // and a failed CREATE leaves the segment fully usable
    engine.write("seg-names", "CREATE TABLE audit (seg TEXT, msg TEXT);")
    assert(engine.store.tables("seg-names") == Seq("audit"))
  }

  test("crash mid-commit: explicit drops sequence after all swaps (nothing irrecoverable)") {
    val crashRoot = Files.createTempDirectory("graft-crash").toString
    var swaps = 0
    var failAtSwap = Int.MaxValue
    val store = new SegmentStore(spark, crashRoot) {
      override def swapPreparedData(segmentId: String, table: String,
          newMeta: Option[SegmentStore.TableMeta]): Unit = {
        swaps += 1
        if (swaps >= failAtSwap) throw new RuntimeException("simulated crash")
        super.swapPreparedData(segmentId, table, newMeta)
      }
    }
    val eng = new TroughEngine(spark, store, new SchemaRegistry)
    eng.provisionWritable("seg-crash")
    eng.write("seg-crash",
      "CREATE TABLE a (x INTEGER); CREATE TABLE b (x INTEGER); CREATE TABLE c (x INTEGER);")
    eng.write("seg-crash",
      "INSERT INTO a (x) VALUES (1); INSERT INTO b (x) VALUES (1); INSERT INTO c (x) VALUES (1);")
    // crash on the SECOND swap of the next commit: b swapped, c not, and
    // crucially the DROP of a has not run yet (drops sequence last)
    swaps = 0; failAtSwap = 2
    intercept[RuntimeException](
      eng.write("seg-crash", "DROP TABLE a; UPDATE b SET x = 2; UPDATE c SET x = 2;"))
    swaps = 0; failAtSwap = Int.MaxValue
    // pre-fix ordering ran drops between prepare and swaps: this crash
    // would have lost table a forever while b/c kept their old data
    assert(store.tableExists("seg-crash", "a"))
    assert(eng.resultJson(eng.read("seg-crash", "SELECT x FROM a;")) == "[{\"x\":1}]\n")
    // every surviving table is in SOME committed state (old or new)...
    assert(eng.resultJson(eng.read("seg-crash", "SELECT x FROM b;")) == "[{\"x\":2}]\n")
    assert(eng.resultJson(eng.read("seg-crash", "SELECT x FROM c;")) == "[{\"x\":1}]\n")
    // ...so simply re-running the idempotent script heals to the target state
    eng.write("seg-crash", "DROP TABLE a; UPDATE b SET x = 2; UPDATE c SET x = 2;")
    assert(!store.tableExists("seg-crash", "a"))
    assert(eng.resultJson(eng.read("seg-crash", "SELECT x FROM b;")) == "[{\"x\":2}]\n")
    assert(eng.resultJson(eng.read("seg-crash", "SELECT x FROM c;")) == "[{\"x\":2}]\n")
  }

  test("BLOB JSON boundary: valid UTF-8 decodes like ujson, invalid errors cleanly") {
    engine.provisionWritable("seg-blob")
    engine.write("seg-blob", "CREATE TABLE bt (id INTEGER PRIMARY KEY, data BLOB);")
    engine.write("seg-blob", "INSERT INTO bt (id, data) VALUES (1, X'68690A');") // "hi\n"
    assert(engine.resultJson(engine.read("seg-blob", "SELECT data FROM bt;"))
      == "[{\"data\":\"hi\\n\"}]\n")
    // invalid UTF-8: the reference's ujson kills the stream mid-response
    // (read.py:44, 47-49); we raise a clean error — documented deviation
    engine.write("seg-blob", "INSERT INTO bt (id, data) VALUES (2, X'FF00');")
    val e = intercept[Exception](
      engine.resultJson(engine.read("seg-blob", "SELECT data FROM bt WHERE id = 2;")))
    assert(e.getMessage.contains("not valid UTF-8"), e.getMessage)
  }

  test("JSON boundary: whole-minute timestamps keep :ss; decimals parse like json.loads") {
    // Java's LocalDateTime.toString drops ':00' at whole minutes; the
    // reference (python str(datetime)) never does
    val ts = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    assert(JsonShape.value(ts) == "\"2024-01-01 12:00:00\"")
    assert(JsonShape.plainValue(ts) == "2024-01-01 12:00:00")
    val tsMicros = java.sql.Timestamp.valueOf("2024-01-01 12:00:00.25")
    assert(JsonShape.value(tsMicros) == "\"2024-01-01 12:00:00.250000\"")
    // plainValue = json.loads of value's rendering: '.'-free → int
    assert(JsonShape.plainValue(new java.math.BigDecimal("1.5")) == 1.5d)
    assert(JsonShape.plainValue(new java.math.BigDecimal("42")) == 42L)
  }

  test("INSERT OR REPLACE / OR IGNORE honor the primary key") {
    engine.provisionWritable("seg-upsert")
    engine.write("seg-upsert", "CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT);")
    engine.write("seg-upsert", "INSERT INTO kv (k, v) VALUES (1, 'one'), (2, 'two');")
    engine.write("seg-upsert", "INSERT OR REPLACE INTO kv (k, v) VALUES (2, 'TWO');")
    engine.write("seg-upsert", "INSERT OR IGNORE INTO kv (k, v) VALUES (1, 'clobber'), (3, 'three');")
    val json = engine.resultJson(engine.read("seg-upsert", "SELECT * FROM kv ORDER BY k;"))
    assert(json == "[{\"k\":1,\"v\":\"one\"},\n{\"k\":2,\"v\":\"TWO\"},\n{\"k\":3,\"v\":\"three\"}]\n")
  }

  test("UPDATE with WHERE, DELETE with and without WHERE") {
    engine.provisionWritable("seg-dml")
    engine.write("seg-dml", "CREATE TABLE t (a INTEGER, b TEXT);")
    engine.write("seg-dml", "INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y'), (3, 'z');")
    engine.write("seg-dml", "UPDATE t SET b = 'updated' WHERE a >= 2;")
    assert(engine.resultJson(engine.read("seg-dml", "SELECT * FROM t ORDER BY a;"))
      == "[{\"a\":1,\"b\":\"x\"},\n{\"a\":2,\"b\":\"updated\"},\n{\"a\":3,\"b\":\"updated\"}]\n")
    engine.write("seg-dml", "DELETE FROM t WHERE a = 2;")
    assert(engine.resultJson(engine.read("seg-dml", "SELECT count(*) AS n FROM t;"))
      == "[{\"n\":2}]\n")
    engine.write("seg-dml", "DELETE FROM t;")
    assert(engine.resultJson(engine.read("seg-dml", "SELECT count(*) AS n FROM t;"))
      == "[{\"n\":0}]\n")
  }

  test("BUILDREDIRECTARRAY upsert — the reference's real-world UPDATE pattern") {
    engine.provisionWritable("seg-redir")
    engine.write("seg-redir", "CREATE TABLE seeds (id INTEGER PRIMARY KEY, redirects TEXT);")
    engine.write("seg-redir", "INSERT INTO seeds (id, redirects) VALUES (1, null);")
    engine.write("seg-redir",
      "UPDATE seeds SET redirects = BUILDREDIRECTARRAY('http://x/', '301', 'R', redirects) WHERE id = 1;")
    val json = engine.resultJson(engine.read("seg-redir", "SELECT redirects FROM seeds;"))
    assert(json ==
      "[{\"redirects\":\"[{\\\"seed\\\": \\\"http://x/\\\", \\\"status\\\": \\\"Redirected\\\"}]\"}]\n")
  }

  test("datetime() literal compat: client-style datetime('<iso>') values round-trip") {
    engine.provisionWritable("seg-dt")
    engine.write("seg-dt", "CREATE TABLE ev (id INTEGER, at DATETIME);")
    engine.write("seg-dt", "INSERT INTO ev (id, at) VALUES (1, datetime('2024-01-02T03:04:05'));")
    val json = engine.resultJson(engine.read("seg-dt", "SELECT at FROM ev;"))
    assert(json == "[{\"at\":\"2024-01-02 03:04:05\"}]\n")
  }

  test("ALTER TABLE ADD COLUMN and DROP TABLE") {
    engine.provisionWritable("seg-alter")
    engine.write("seg-alter", "CREATE TABLE t (a INTEGER);")
    engine.write("seg-alter", "INSERT INTO t (a) VALUES (1);")
    engine.write("seg-alter", "ALTER TABLE t ADD COLUMN b TEXT;")
    assert(engine.resultJson(engine.read("seg-alter", "SELECT * FROM t;"))
      == "[{\"a\":1,\"b\":null}]\n")
    engine.write("seg-alter", "DROP TABLE t;")
    assert(!engine.store.tableExists("seg-alter", "t"))
  }

  // ----------------------------------------------------------- lifecycle

  test("promote copies the segment to durable storage and returns remote path (sync.py:1112-1188)") {
    engine.provisionWritable("seg-promote")
    engine.write("seg-promote", testDdl)
    engine.write("seg-promote", "INSERT INTO test (test) VALUES ('p');")
    val remote = engine.promote("seg-promote", durable)
    assert(remote.endsWith("seg-promote"))
    assert(Files.isDirectory(java.nio.file.Paths.get(durable, "seg-promote", "test", "data")))
    assert(!Files.exists(java.nio.file.Paths.get(durable, "seg-promote._COPYING_")))
  }

  test("promote → shred → importSegment restores the identical segment (sync pull analog)") {
    engine.provisionWritable("seg-restore")
    engine.write("seg-restore",
      """CREATE TABLE a (id INTEGER PRIMARY KEY, v TEXT); CREATE TABLE b (x INTEGER);
         INSERT INTO a (id, v) VALUES (1, 'one'), (2, 'two'); INSERT INTO b (x) VALUES (9);""")
    val before = engine.resultJson(engine.read("seg-restore", "SELECT * FROM a ORDER BY id;"))
    engine.promote("seg-restore", durable)
    engine.releaseWriteLock("seg-restore")
    engine.deleteSegment("seg-restore")
    assert(!engine.store.segmentExists("seg-restore"))
    engine.store.importSegment("seg-restore", durable)
    assert(engine.store.tables("seg-restore") == Seq("a", "b"))
    assert(engine.resultJson(engine.read("seg-restore", "SELECT * FROM a ORDER BY id;")) == before)
    assert(engine.resultJson(engine.read("seg-restore", "SELECT x FROM b;")) == "[{\"x\":9}]\n")
    // restored meta keeps pk/autoincrement: a new write continues the contract
    engine.provisionWritable("seg-restore")
    engine.write("seg-restore", "INSERT INTO a (id, v) VALUES (3, 'three');")
    assert(engine.resultJson(engine.read("seg-restore", "SELECT count(*) AS n FROM a;"))
      == "[{\"n\":3}]\n")
  }

  test("delete refuses while write-locked, succeeds after release (sync.py:452-456)") {
    engine.provisionWritable("seg-shred")
    engine.write("seg-shred", testDdl)
    val e = intercept[IllegalStateException](engine.deleteSegment("seg-shred"))
    assert(e.getMessage.contains("write lock"))
    engine.releaseWriteLock("seg-shred")
    engine.deleteSegment("seg-shred")
    assert(!engine.store.segmentExists("seg-shred"))
  }

  test("cold-tier segments are read-only (sync.py:693-697, 1050-1067)") {
    val e = intercept[IllegalStateException](
      engine.provisionWritable("cold-seg1"))
    // the reference's ClientError text, verbatim (sync.py:693-697)
    assert(e.getMessage ==
      "cannot provision segment cold-seg1 for writing because that " +
        "segment id is in the read-only cold storage range", e.getMessage)
  }

  test("cold tier: per-segment reads route to it; readAll unions hot+cold tiers") {
    val hotRoot = Files.createTempDirectory("graft-hot").toString
    val coldRoot = Files.createTempDirectory("graft-cold").toString
    // seed the cold tier through a staging store that treats it as hot —
    // the promotion-to-cold pipeline's effect, without the pipeline
    val seeder = new TroughEngine(spark,
      new SegmentStore(spark, coldRoot), new SchemaRegistry)
    seeder.provisionWritable("cold-2019")
    seeder.write("cold-2019", "CREATE TABLE ev (x INTEGER); INSERT INTO ev (x) VALUES (1);")
    // the serving engine: hot root + cold routing by id prefix
    val eng = new TroughEngine(spark,
      new SegmentStore(spark, hotRoot, Some(coldRoot), _.startsWith("cold")),
      new SchemaRegistry)
    eng.provisionWritable("warm-2024")
    eng.write("warm-2024", "CREATE TABLE ev (x INTEGER); INSERT INTO ev (x) VALUES (2);")
    assert(eng.resultJson(eng.read("cold-2019", "SELECT x FROM ev;")) == "[{\"x\":1}]\n")
    val rows = eng.readAll("SELECT segment_id, x FROM ev ORDER BY segment_id;").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("cold-2019", 1L), ("warm-2024", 2L)))
    intercept[IllegalStateException](eng.provisionWritable("cold-2019"))
    intercept[IllegalStateException](
      eng.write("cold-2019", "INSERT INTO ev (x) VALUES (9);"))
    // every mutating surface refuses the cold range: promote, delete,
    // ingest (sync.py:218-224 — cold segments have no local write copy)
    intercept[Exception](eng.promote("cold-2019",
      Files.createTempDirectory("graft-cold-durable").toString))
    intercept[Exception](eng.store.deleteSegment("cold-2019"))
    intercept[Exception](
      eng.store.ingestSqliteSegment("/nonexistent.sqlite", "cold-2019"))
    // ...and the cold data is untouched by the refusals
    assert(eng.resultJson(eng.read("cold-2019", "SELECT x FROM ev;")) ==
      "[{\"x\":1}]\n")
  }

  // ---------------------------------------------------- fan-out + discovery

  test("segment discovery by regex (client.py:171-218)") {
    engine.schemas.put("s1", testDdl)
    Seq("fan1", "fan2", "fan3").foreach(engine.provisionWritable(_, "s1"))
    assert(engine.store.listSegments("^fan[12]$") == Seq("fan1", "fan2"))
  }

  test("fanout: per-segment results with error isolation (shell async_fanout)") {
    engine.schemas.put("s1", testDdl)
    Seq("fanA", "fanB").foreach(engine.provisionWritable(_, "s1"))
    engine.write("fanA", "INSERT INTO test (test) VALUES ('a1'), ('a2');")
    engine.write("fanB", "INSERT INTO test (test) VALUES ('b1');")
    // fanC exists but has no 'test' table -> error isolated to that segment
    engine.provisionWritable("fanC", "default")
    val result = engine.fanout(Seq("fanA", "fanB", "fanC"), "SELECT test FROM test;")
    val bySeg = result.perSegment.toMap
    assert(bySeg("fanA").isSuccess && bySeg("fanA").get.size == 2)
    assert(bySeg("fanB").isSuccess && bySeg("fanB").get.size == 1)
    assert(bySeg("fanC").isFailure)
    assert(result.totalRows == 3)
  }

  test("readAll: one declarative query over all segments with segment_id column") {
    engine.schemas.put("s1", testDdl)
    Seq("uniA", "uniB").foreach(engine.provisionWritable(_, "s1"))
    engine.write("uniA", "INSERT INTO test (test) VALUES ('x');")
    engine.write("uniB", "INSERT INTO test (test) VALUES ('y'), ('z');")
    val df = engine.readAll(
      "SELECT segment_id, count(*) AS n FROM test GROUP BY segment_id ORDER BY segment_id;",
      "^uni")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("uniA", 1L), ("uniB", 2L)))
  }

  test("readAll: cross-segment type conflict widens instead of failing the scan") {
    // each segment owns its schema, so the same column may be CREATEd
    // INTEGER in one segment and TEXT in another. Forcing one merged
    // read schema onto every segment's parquet fails at execution
    // (parquet can't convert int64 -> string in-scan); the store must
    // group segments by declared type and cast to the widened type.
    engine.schemas.put("conf-int", "CREATE TABLE cft (k INTEGER PRIMARY KEY, v INTEGER);")
    engine.schemas.put("conf-txt", "CREATE TABLE cft (k INTEGER PRIMARY KEY, v TEXT);")
    engine.schemas.put("conf-real", "CREATE TABLE cfr (k INTEGER PRIMARY KEY, v REAL);")
    engine.provisionWritable("confA", "conf-int")
    engine.provisionWritable("confB", "conf-txt")
    engine.write("confA", "INSERT INTO cft (k, v) VALUES (1, 5);")
    engine.write("confB", "INSERT INTO cft (k, v) VALUES (1, 'five');")
    val rows = engine.readAll("SELECT segment_id, v FROM cft ORDER BY segment_id;", "^conf")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // long 5 coerces to '5' — the same result the old per-segment
    // unionByName(allowMissingColumns) coercion produced
    assert(rows == Seq(("confA", "5"), ("confB", "five")))
    // numeric pair widens numerically, not to text
    engine.provisionWritable("confC", "conf-real")
    engine.schemas.put("conf-int2", "CREATE TABLE cfr (k INTEGER PRIMARY KEY, v INTEGER);")
    engine.provisionWritable("confD", "conf-int2")
    engine.write("confC", "INSERT INTO cfr (k, v) VALUES (1, 1.5);")
    engine.write("confD", "INSERT INTO cfr (k, v) VALUES (1, 2);")
    val nums = engine.readAll("SELECT v FROM cfr ORDER BY v;", "^conf")
      .collect().map(_.getDouble(0)).toSeq
    assert(nums == Seq(1.5, 2.0))
    Seq("confA", "confB", "confC", "confD").foreach(engine.releaseWriteLock)
  }

  test("readAll at segment scale: one FileScan per table, segment regex as partition filter") {
    // 120 provisioned segments, data in three — the table-major layout
    // must plan ONE pruned scan per table regardless of segment count
    // (the previous segment-major layout unioned 120 relations here,
    // which at the reference's 10^4-segment scale was a driver-side
    // analysis bomb)
    engine.schemas.put("kv-schema", "CREATE TABLE skv (k INTEGER PRIMARY KEY, v TEXT);")
    (0 until 120).foreach(i => engine.provisionWritable(f"scale-$i%03d", "kv-schema"))
    Seq(3, 57, 99).foreach(i =>
      engine.write(f"scale-$i%03d", s"INSERT INTO skv (k, v) VALUES ($i, 'v$i');"))
    val df = engine.readAll("SELECT count(*) AS n FROM skv;", "^scale-0")
    val plan = df.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      s"expected exactly one scan, got:\n${plan.take(1200)}")
    assert("PartitionFilters: \\[[^\\]]*RLIKE\\(segment_id#\\d+, \\^scale-0\\)".r
        .findFirstIn(plan).isDefined,
      s"segment regex must prune as a partition filter:\n${plan.take(1200)}")
    // ^scale-0 rlike-matches scale-000..scale-099 (not scale-1xx): all
    // three data-bearing segments are in range
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // and an exact-id regex prunes to a single partition
    val one = engine.readAll("SELECT v FROM skv;", "^scale-057$")
    assert(one.collect().map(_.getString(0)).toSeq == Seq("v57"))
    (0 until 120).foreach(i => engine.releaseWriteLock(f"scale-$i%03d"))
  }

  test("in-flight prepare is invisible to cross-segment scans (hidden staging dirs)") {
    import spark.implicits._
    engine.provisionWritable("seg-iso")
    engine.write("seg-iso", "CREATE TABLE it (x INTEGER); INSERT INTO it (x) VALUES (1);")
    // phase 1 only: staged parquet sits in ._tmp_<seg>, which Spark's
    // hidden-file filter keeps out of every listing — a concurrent
    // whole-table scan must see exactly the committed state
    engine.store.prepareTableData("seg-iso", "it", Seq(2L, 3L).toDF("x"))
    val rows = engine.readAll("SELECT x FROM it;", "^seg-iso$").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L),
      "staged-but-unswapped data leaked into a scan")
    engine.store.swapPreparedData("seg-iso", "it")
    assert(engine.readAll("SELECT count(*) AS n FROM it;", "^seg-iso$")
      .collect()(0).getLong(0) == 2L)
  }

  // ----------------------------------------------------------- shell (A22/23)

  test("SHOW TABLES / SHOW CREATE TABLE / SHOW SCHEMAS / SHOW SEGMENTS") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("seg-show", "s1")
    assert(Shell.showTables(engine, "seg-show") == Seq("test"))
    val ddl = Shell.showCreateTable(engine, "seg-show", "test")
    assert(ddl.contains("id INTEGER PRIMARY KEY AUTOINCREMENT"))
    assert(ddl.contains("test TEXT"))
    assert(Shell.showSchemas(engine).contains("s1"))
    assert(Shell.showSegments(engine, "^seg-show$") == Seq("seg-show"))
  }

  test("table formatter: id first, then ascending width, <null> rendering (shell/__init__.py:66-100)") {
    engine.provisionWritable("seg-fmt")
    engine.write("seg-fmt",
      """CREATE TABLE f (id INTEGER, wide_column TEXT, z TEXT);
         INSERT INTO f (id, wide_column, z) VALUES (1, 'wiiiiiiiiiiiiide', null);""")
    val df = engine.read("seg-fmt", "SELECT * FROM f;")
    val out = Shell.table(df.collect().toSeq, df.schema)
    val lines = out.split("\n")
    // id first despite being narrow; z (width 6: "<null>") before wide_column
    assert(lines(1) == "| id | z      | wide_column      |")
    assert(lines(3) == "| 1  | <null> | wiiiiiiiiiiiiide |")
  }

  test("table formatter: duplicate column names keep their own cells and widths") {
    engine.provisionWritable("seg-dup")
    engine.write("seg-dup",
      """CREATE TABLE a (id INTEGER, v TEXT); CREATE TABLE b (id INTEGER, w TEXT);
         INSERT INTO a (id, v) VALUES (1, 'x');
         INSERT INTO b (id, w) VALUES (77777, 'y');""")
    val df = engine.read("seg-dup",
      "SELECT a.id, b.id, a.v FROM a JOIN b ON a.v = 'x';")
    val out = Shell.table(df.collect().toSeq, df.schema)
    val lines = out.split("\n")
    // both id columns render their OWN values (the by-name lookup bug
    // rendered the first id twice), each padded to its own width
    assert(lines(1) == "| id | id    | v |", lines(1))
    assert(lines(3) == "| 1  | 77777 | x |", lines(3))
  }

  test("FORMAT raw|pretty|table display modes (do_format, shell/__init__.py:214-231)") {
    engine.provisionWritable("seg-disp")
    engine.write("seg-disp",
      "CREATE TABLE d (id INTEGER, v TEXT); " +
        "INSERT INTO d (id, v) VALUES (1, 'a'), (2, null);")
    val df = engine.read("seg-disp", "SELECT * FROM d ORDER BY id;")
    val (rows, schema) = (df.collect().toSeq, df.schema)
    // goldens generated with python json.dumps / json.dumps(indent=2)
    assert(Shell.display(rows, schema, "raw")
      == "[{\"id\": 1, \"v\": \"a\"}, {\"id\": 2, \"v\": null}]\n")
    assert(Shell.display(rows, schema, "pretty")
      == "[\n  {\n    \"id\": 1,\n    \"v\": \"a\"\n  },\n  {\n    \"id\": 2,\n    \"v\": null\n  }\n]\n")
    assert(Shell.display(rows, schema, "table") == Shell.table(rows, schema))
    assert(Shell.display(Seq.empty, schema, "raw") == "<no results>\n")
    // the session's FORMAT command: stateful, reports, rejects unknowns
    val sess = new Shell.Session(engine)
    assert(sess.format == "table")
    assert(sess.setFormat("") == "Format is 'table'")
    assert(sess.setFormat("RAW") == "Format is now 'raw'")
    assert(sess.format == "raw")
    intercept[IllegalArgumentException](sess.setFormat("yaml"))
  }

  // --------------------------------------------- round-7 hardening items

  test("PRAGMA lines in write scripts are accepted as physical no-ops") {
    engine.provisionWritable("seg-pragma")
    // real-world scripts interleave PRAGMAs with DDL/DML — the script
    // must commit identically with and without them (the reference's
    // executescript runs whatever SQLite accepts, write.py:40)
    engine.write("seg-pragma",
      "PRAGMA journal_mode=WAL; " +
        "CREATE TABLE p (id INTEGER PRIMARY KEY, v TEXT); " +
        "PRAGMA synchronous = OFF; " +
        "INSERT INTO p (id, v) VALUES (1, 'a'); " +
        "PRAGMA user_version = 7;")
    val json = engine.resultJson(engine.read("seg-pragma", "SELECT * FROM p;"))
    assert(json == "[{\"id\":1,\"v\":\"a\"}]\n")
    // unknown statements still error (PRAGMA is not a wildcard)
    intercept[UnsupportedOperationException](
      engine.write("seg-pragma", "VACUUM;"))
    // semantics-changing pragmas error loudly instead of silently
    // diverging (case_sensitive_like would flip LIKE matching)
    intercept[UnsupportedOperationException](
      engine.write("seg-pragma", "PRAGMA case_sensitive_like = ON;"))
  }

  test("fanout row cap: oversized segment reports a clean per-segment error") {
    engine.schemas.put("s1", testDdl)
    Seq("capA", "capB").foreach(engine.provisionWritable(_, "s1"))
    engine.write("capA",
      "INSERT INTO test (test) VALUES " + (1 to 20).map(i => s"('r$i')").mkString(", ") + ";")
    engine.write("capB", "INSERT INTO test (test) VALUES ('b1');")
    val res = engine.fanout(Seq("capA", "capB"), "SELECT test FROM test;",
      maxRowsPerSegment = 5)
    val bySeg = res.perSegment.toMap
    // the oversized segment fails in isolation; the small one succeeds
    assert(bySeg("capA").isFailure)
    assert(bySeg("capA").failed.get.getMessage.contains("exceeds 5 rows"))
    assert(bySeg("capB").isSuccess && bySeg("capB").get.size == 1)
    assert(res.totalRows == 1)
    // at-cap results are complete, not truncated
    val ok = engine.fanout(Seq("capA"), "SELECT test FROM test;", maxRowsPerSegment = 20)
    assert(ok.perSegment.head._2.get.size == 20)
  }

  test("fanout timeout cancels the stragglers' Spark jobs, not just the wait") {
    engine.schemas.put("s1", testDdl)
    engine.provisionWritable("hangA", "s1")
    (1 to 2000).grouped(500).foreach { chunk =>
      engine.write("hangA", "INSERT INTO test (test) VALUES " +
        chunk.map(i => s"('r$i')").mkString(", ") + ";")
    }
    // a 2000³ self-cross-join (8e9 tuples) runs for minutes if left
    // alone — the deadline must not only stop the WAIT but cancel the
    // job group, or the work keeps burning executor threads behind
    // every later fanout against a hung segment
    val res = engine.fanout(Seq("hangA"),
      "SELECT count(*) AS n FROM test a, test b, test c;", timeoutSeconds = 2L)
    assert(res.perSegment.head._2.isFailure)
    assert(res.perSegment.head._2.failed.get.isInstanceOf[java.util.concurrent.TimeoutException])
    // the cancellation must actually reach the scheduler: active jobs
    // drain within a few seconds instead of the cross-join's minutes
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var active = spark.sparkContext.statusTracker.getActiveJobIds()
    while (active.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200)
      active = spark.sparkContext.statusTracker.getActiveJobIds()
    }
    assert(active.isEmpty, s"jobs still running ${active.mkString(",")} — cancel didn't land")
  }

  test("deleteSegment invalidates only the deleted segment's tables in the plan cache") {
    engine.schemas.put("pc-a", "CREATE TABLE pca (k INTEGER PRIMARY KEY, v TEXT);")
    engine.schemas.put("pc-b", "CREATE TABLE pcb (k INTEGER PRIMARY KEY, v TEXT);")
    engine.provisionWritable("pcsegA", "pc-a")
    engine.provisionWritable("pcsegB", "pc-b")
    engine.write("pcsegA", "INSERT INTO pca (k, v) VALUES (1, 'x');")
    engine.write("pcsegB", "INSERT INTO pcb (k, v) VALUES (1, 'y');")
    // populate the plan cache for both tables
    engine.readAll("SELECT count(*) AS n FROM pca;", "^pcseg").collect()
    engine.readAll("SELECT count(*) AS n FROM pcb;", "^pcseg").collect()
    assert(engine.store.cachedPlanTables.contains("pca"))
    assert(engine.store.cachedPlanTables.contains("pcb"))
    engine.releaseWriteLock("pcsegA")
    engine.deleteSegment("pcsegA")
    // pcb had no slice in pcsegA: its plan survives; pca's is dropped
    assert(!engine.store.cachedPlanTables.contains("pca"))
    assert(engine.store.cachedPlanTables.contains("pcb"))
  }
}
