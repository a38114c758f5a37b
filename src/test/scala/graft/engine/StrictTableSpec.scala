package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** SQLite 3.37 STRICT tables (stricttables.html) through the write
  * path: CREATE-time datatype validation, the per-statement storage-
  * class gate with SQLite's exact `cannot store …` texts, the lossless
  * TEXT→numeric coercions, and the `.sqlite` boundary (exported DDL
  * keeps the STRICT suffix so real sqlite3 enforces the same rules;
  * ingest keeps enforcing after a round trip). Every behavior and
  * message probed against the sandbox CLI (3.51).
  *
  * Column type ANY is supported via OBSERVED-CLASS typing: a column
  * adopts the storage classes actually written (uniform-class columns
  * match sqlite3 exactly, incl. typeof); mixing classes widens by the
  * cross-segment lattice (documented deviation — per-row storage
  * classes don't exist over concretely-typed parquet), and BLOB never
  * mixes (crisp refusal). */
class StrictTableSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-strict").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"strict-$n"
    engine.schemas.put(s"strict-schema-$n", schema)
    engine.provisionWritable(id, s"strict-schema-$n")
    id
  }

  test("CREATE-time datatype validation: SQLite's prepare texts; ANY refused") {
    // schema-registry DDL validation surfaces these as its 400-path
    // ValidationError, message intact
    // sqlite3: Error: unknown datatype for t.a: "VARCHAR(10)"
    val e1 = intercept[Exception](seg(
      "CREATE TABLE t (a VARCHAR(10)) STRICT;"))
    assert(e1.getMessage.contains("""unknown datatype for t.a: "VARCHAR(10)""""))
    // sqlite3: Error: missing datatype for t.a
    val e2 = intercept[Exception](seg(
      "CREATE TABLE t (a) STRICT;"))
    assert(e2.getMessage.contains("missing datatype for t.a"))
    // non-strict tables still take any declared type
    val ok = seg("CREATE TABLE t (a VARCHAR(10));")
    engine.write(ok, "INSERT INTO t VALUES ('fine');")
  }

  test("INTEGER column: lossless conversions store integers") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a INTEGER) STRICT;")
    // sqlite3 stores: 12, 12, 1000, 12, 9223372036854775806 (exact!)
    engine.write(id,
      "INSERT INTO t VALUES (1, '12');" +
        "INSERT INTO t VALUES (2, 12.0);" +
        "INSERT INTO t VALUES (3, '1e3');" +
        "INSERT INTO t VALUES (4, '12.0');" +
        "INSERT INTO t VALUES (5, '9223372036854775806');" +
        "INSERT INTO t VALUES (6, NULL);")
    val rows = engine.read(id,
      "SELECT k, a, typeof(a) AS ty FROM t ORDER BY k;").collect()
    assert(rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 12L, "integer"), (2L, 12L, "integer"), (3L, 1000L, "integer"),
        (4L, 12L, "integer"), (5L, 9223372036854775806L, "integer"),
        (6L, null, "null")))
  }

  test("INTEGER column violations: SQLite's exact texts, nothing commits") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a INT) STRICT;")
    // sqlite3: cannot store REAL value in INT column t.a
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (1, 12.5);"))
    assert(e1.getMessage == "cannot store REAL value in INT column t.a")
    // sqlite3: cannot store TEXT value in INT column t.a
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (1, '12abc');"))
    assert(e2.getMessage == "cannot store TEXT value in INT column t.a")
    // text too big for int64 converts to REAL first (probed)
    val e3 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (1, '99999999999999999999');"))
    assert(e3.getMessage == "cannot store REAL value in INT column t.a")
    // sqlite3: cannot store BLOB value in INT column t.a
    val e4 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (1, zeroblob(3));"))
    assert(e4.getMessage == "cannot store BLOB value in INT column t.a")
    assert(engine.read(id, "SELECT count(*) AS n FROM t;")
      .collect()(0).getLong(0) == 0L)
  }

  test("REAL column: numeric text converts, non-numeric errors") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, r REAL) STRICT;")
    engine.write(id,
      "INSERT INTO t VALUES (1, ' 12.5 '); INSERT INTO t VALUES (2, 12);")
    val rows = engine.read(id, "SELECT k, r FROM t ORDER BY k;").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 12.5), (2L, 12.0)))
    val e = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (3, 'inf');"))
    assert(e.getMessage == "cannot store TEXT value in REAL column t.r")
  }

  test("TEXT column: numbers render as text (REAL in SQLite's form), blobs error") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, s TEXT) STRICT;")
    // sqlite3: 12 → '12'; 2.5e15 → '2.5e+15' (SQLite real rendering)
    engine.write(id,
      "INSERT INTO t VALUES (1, 12); INSERT INTO t VALUES (2, 2.5e15);")
    val rows = engine.read(id, "SELECT k, s FROM t ORDER BY k;").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "12"), (2L, "2.5e+15")))
    val e = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (3, zeroblob(1));"))
    assert(e.getMessage == "cannot store BLOB value in TEXT column t.s")
  }

  test("BLOB column: nothing converts; value type names INT/REAL/TEXT") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, b BLOB) STRICT;")
    engine.write(id, "INSERT INTO t VALUES (1, zeroblob(2));" +
      "INSERT INTO t VALUES (2, NULL);")
    assert(engine.read(id, "SELECT count(*) AS n FROM t;")
      .collect()(0).getLong(0) == 2L)
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (3, 'ab');"))
    assert(e1.getMessage == "cannot store TEXT value in BLOB column t.b")
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (3, 5);"))
    assert(e2.getMessage == "cannot store INT value in BLOB column t.b")
    val e3 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (3, 1.5);"))
    assert(e3.getMessage == "cannot store REAL value in BLOB column t.b")
  }

  test("UPDATE and upsert DO UPDATE go through the same gate") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a INTEGER) STRICT;")
    engine.write(id, "INSERT INTO t VALUES (1, 10);")
    val e1 = intercept[IllegalArgumentException](engine.write(id,
      "UPDATE t SET a = 'xx' WHERE k = 1;"))
    assert(e1.getMessage == "cannot store TEXT value in INTEGER column t.a")
    // UPDATE with a lossless text value converts (probed: stores 77)
    engine.write(id, "UPDATE t SET a = '77' WHERE k = 1;")
    assert(engine.read(id, "SELECT a FROM t;").collect()(0).getLong(0) == 77L)
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (1, 5) ON CONFLICT(k) DO UPDATE SET a = 'nope';"))
    assert(e2.getMessage == "cannot store TEXT value in INTEGER column t.a")
    // the predicate bounds the probe: a violating value on an
    // unmatched row never evaluates (same as SQLite never stepping it)
    engine.write(id, "UPDATE t SET a = 'xx' WHERE k = 999;")
  }

  test("DEFAULT values coerce like inserted values (probed: '7' stores 7)") {
    val id = seg(
      "CREATE TABLE t (k INTEGER PRIMARY KEY, a INTEGER DEFAULT '7') STRICT;")
    engine.write(id, "INSERT INTO t (k) VALUES (1);")
    val r = engine.read(id, "SELECT a, typeof(a) AS ty FROM t;").collect()(0)
    assert((r.getLong(0), r.getString(1)) == ((7L, "integer")))
  }

  test("ALTER TABLE ADD COLUMN validates the datatype with SQLite's text") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a INTEGER) STRICT;")
    // sqlite3: error in table t after add column: unknown datatype for t.b: "VARCHAR"
    val e = intercept[IllegalArgumentException](engine.write(id,
      "ALTER TABLE t ADD COLUMN b VARCHAR;"))
    assert(e.getMessage ==
      """error in table t after add column: unknown datatype for t.b: "VARCHAR"""")
    engine.write(id, "ALTER TABLE t ADD COLUMN b TEXT;" +
      "INSERT INTO t VALUES (1, 5, 42);") // 42 → '42' via TEXT coercion
    assert(engine.read(id, "SELECT b FROM t;").collect()(0).getString(0) == "42")
    // the new column is strict too
    val e2 = intercept[IllegalArgumentException](engine.write(id,
      "INSERT INTO t VALUES (2, 5, zeroblob(1));"))
    assert(e2.getMessage == "cannot store BLOB value in TEXT column t.b")
  }

  test("export keeps the STRICT suffix; real sqlite3 enforces it; " +
      "ingest keeps enforcing after the round trip") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a INT, s TEXT) STRICT;")
    engine.write(id, "INSERT INTO t VALUES (1, 5, 'x');")
    val db = Files.createTempDirectory("strict-exp").resolve("seg.sqlite")
    engine.store.exportSqliteSegment(id, db.toString)
    val ddl = SqliteCli.query(db.toString,
      "SELECT sql FROM sqlite_master WHERE type='table' AND name='t';")
    assert(ddl.endsWith(" STRICT"), ddl)
    // real sqlite3 rejects a bad insert on the exported file
    val rc = SqliteCli.run(db.toString, "INSERT INTO t VALUES (2, 'zz', 'y');")
    assert(rc != 0)
    // a good insert through real sqlite3, then ingest: strictness survives
    assert(SqliteCli.run(db.toString,
      "INSERT INTO t VALUES (2, '44', 'y');") == 0) // '44' coerces to 44
    engine.store.ingestSqliteSegment(db.toString, "strict-back")
    val rows = engine.read("strict-back",
      "SELECT k, a, typeof(a) AS ty FROM t ORDER BY k;").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 5L, "integer"), (2L, 44L, "integer")))
    // take the write lock on the ingested segment (IF NOT EXISTS keeps
    // provision idempotent over the ingested table) and keep writing:
    // the STRICT gate must have survived the round trip
    engine.schemas.put("strict-back-schema",
      "CREATE TABLE IF NOT EXISTS t (k INTEGER PRIMARY KEY, a INT, s TEXT) STRICT;")
    engine.provisionWritable("strict-back", "strict-back-schema")
    val e = intercept[IllegalArgumentException](engine.write("strict-back",
      "INSERT INTO t VALUES (3, 1.5, 'z');"))
    assert(e.getMessage == "cannot store REAL value in INT column t.a")
  }

  // ------------------------------------------------------------- ANY

  test("ANY columns: uniform classes store verbatim, typeof matches sqlite3") {
    // sqlite3 (probed 3.51): ANY stores each value with its own class,
    // '12' STAYS text in a STRICT table. Per-column uniform classes are
    // the engine's exact domain (observed-class typing).
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id,
      "INSERT INTO t VALUES (1, '12'); INSERT INTO t VALUES (2, 'xy');" +
        "INSERT INTO t VALUES (3, NULL);")
    val rows = engine.read(id,
      "SELECT k, a, typeof(a) AS ty FROM t ORDER BY k;").collect()
    assert(rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "12", "text"), (2L, "xy", "text"), (3L, null, "null")))
    // integer-uniform column
    val id2 = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id2,
      "INSERT INTO t VALUES (1, 42); INSERT INTO t VALUES (2, -7);")
    assert(engine.read(id2, "SELECT typeof(a) AS ty FROM t;")
      .collect().map(_.getString(0)).toSeq == Seq("integer", "integer"))
    // pragma reports the declared ANY name verbatim
    assert(engine.read(id2,
      "SELECT type FROM pragma_table_info('t') WHERE name = 'a';")
      .collect()(0).getString(0) == "ANY")
  }

  test("ANY columns: mixed classes widen by the documented lattice") {
    // DEVIATION (documented): sqlite3 keeps per-row classes; the engine
    // widens the column — INT+REAL → REAL, any TEXT mix → TEXT
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id,
      "INSERT INTO t VALUES (1, 5); INSERT INTO t VALUES (2, 2.5);")
    assert(engine.read(id, "SELECT a FROM t ORDER BY k;")
      .collect().map(_.getDouble(0)).toSeq == Seq(5.0, 2.5))
    engine.write(id, "INSERT INTO t VALUES (3, 'mix');")
    assert(engine.read(id, "SELECT a FROM t ORDER BY k;")
      .collect().map(_.getString(0)).toSeq == Seq("5.0", "2.5", "mix"))
    // BLOB never mixes: crisp refusal, nothing staged
    val e = intercept[Exception](engine.write(id,
      "INSERT INTO t VALUES (9, zeroblob(2));"))
    assert(e.getMessage.contains("cannot mix BLOB"))
    // UPDATE adoption: a SET of a new class widens too
    val id2 = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id2, "INSERT INTO t VALUES (1, 10);" +
      "UPDATE t SET a = 'now text' WHERE k = 1;")
    val r = engine.read(id2, "SELECT a, typeof(a) AS ty FROM t;").collect()(0)
    assert((r.getString(0), r.getString(1)) == ("now text", "text"))
  }

  test("ANY columns: UPDATE...FROM and upsert DO UPDATE adopt classes (ADVICE r10)") {
    // sqlite3 stores the assigned value VERBATIM whatever its class;
    // before this fix strictCoerce's ANY fallback cast silently stored
    // NULL for a class the column hadn't adopted
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id,
      "CREATE TABLE src (k INTEGER PRIMARY KEY, txt TEXT);" +
        "INSERT INTO t VALUES (1, 10); INSERT INTO t VALUES (2, 20);" +
        "INSERT INTO src VALUES (1, 'adopted');")
    engine.write(id, "UPDATE t SET a = src.txt FROM src WHERE t.k = src.k;")
    val rows = engine.read(id,
      "SELECT k, a, typeof(a) AS ty FROM t ORDER BY k;").collect()
    // documented widening lattice: the TEXT mix retypes the column
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "adopted", "text"), (2L, "20", "text")))

    // upsert DO UPDATE SET: same adoption on the diverted row
    val id2 = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id2, "INSERT INTO t VALUES (1, 5);")
    engine.write(id2,
      "INSERT INTO t VALUES (1, 0) ON CONFLICT (k) DO UPDATE SET a = 'hit';")
    val r2 = engine.read(id2, "SELECT a, typeof(a) AS ty FROM t;").collect()(0)
    assert((r2.getString(0), r2.getString(1)) == ("hit", "text"))

    // a predicate selecting NO rows must not retype (sqlite3 changes
    // nothing on UPDATE ... WHERE 1=0)
    val id3 = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id3, "INSERT INTO t VALUES (1, 5);")
    engine.write(id3, "UPDATE t SET a = 'x' WHERE 1 = 0;")
    val r3 = engine.read(id3, "SELECT a, typeof(a) AS ty FROM t;").collect()(0)
    assert((r3.getLong(0), r3.getString(1)) == (5L, "integer"))
    // no-conflict upsert: the DO UPDATE arm never fires, no retype
    engine.write(id3,
      "INSERT INTO t VALUES (2, 7) ON CONFLICT (k) DO UPDATE SET a = 'x';")
    assert(engine.read(id3, "SELECT typeof(a) AS ty FROM t ORDER BY k;")
      .collect().map(_.getString(0)).toSeq == Seq("integer", "integer"))
    // UPDATE...FROM with an empty match set: same
    engine.write(id3,
      "CREATE TABLE empty_src (k INTEGER PRIMARY KEY, txt TEXT);" +
        "UPDATE t SET a = empty_src.txt FROM empty_src WHERE t.k = empty_src.k;")
    assert(engine.read(id3, "SELECT typeof(a) AS ty FROM t ORDER BY k;")
      .collect().map(_.getString(0)).toSeq == Seq("integer", "integer"))
  }

  test("ANY columns: export round trip keeps the declared type and values") {
    val id = seg("CREATE TABLE t (k INTEGER PRIMARY KEY, a ANY) STRICT;")
    engine.write(id,
      "INSERT INTO t VALUES (1, 'alpha'); INSERT INTO t VALUES (2, '33');")
    val out = Files.createTempDirectory("strict-any").resolve("t.sqlite")
    engine.store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    val ddl = SqliteCli.query(out.toString,
      "SELECT sql FROM sqlite_master WHERE name = 't';")
    assert(ddl.contains("\"a\" ANY"), ddl)
    assert(ddl.toUpperCase.contains("STRICT"), ddl)
    // real sqlite3 sees the text values as text (storage-class parity:
    // '33' was NOT coerced, exactly SQLite's ANY rule)
    assert(SqliteCli.query(out.toString,
      "SELECT k, a, typeof(a) FROM t ORDER BY k;") == "1|alpha|text\n2|33|text")
    // and accepts any class on its side (ANY semantics on the file)
    assert(SqliteCli.run(out.toString, "INSERT INTO t VALUES (3, 9.5);") == 0)
  }
}
