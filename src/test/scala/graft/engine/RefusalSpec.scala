package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** The engine's NAMED refusals for libsqlite3 surfaces that have no
  * analog here — same contract as the PRAGMA gate (WriteTxn): a crisp
  * error that names the limitation, never a generic parse failure that
  * sends the user hunting.
  *
  *  - `CREATE VIRTUAL TABLE` / `MATCH`: virtual-table MODULES (fts5,
  *    rtree, ...) are C extensions inside libsqlite3; the reference
  *    write path would accept them (write.py:40 runs any script
  *    sqlite3 does), so the deviation must be loud. Ingest of an
  *    existing file still preserves FTS shadow-table DATA
  *    (SqliteIngestSpec) — only module-backed behavior is refused.
  *  - `ATTACH` / `DETACH` are SUPPORTED since r17 (AttachSpec): a
  *    script may address several segments, so only the error shapes a
  *    real sqlite3 raises remain (no such database, locked, ...).
  */
class RefusalSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-refusal").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  private lazy val seg: String = {
    engine.schemas.put("refusal-schema",
      "CREATE TABLE t (id INTEGER PRIMARY KEY, body TEXT);")
    engine.provisionWritable("refusal-1", "refusal-schema")
    engine.write("refusal-1", "INSERT INTO t VALUES (1, 'hello world');")
    "refusal-1"
  }

  test("CREATE VIRTUAL TABLE: non-fts5 modules and fts5 options refuse by name") {
    // fts5 with a plain column list is SUPPORTED (r11, FtsSpec); the
    // refusals now cover what remains out of scope
    // rtree is SUPPORTED since r15 (RtreeSpec); geopoly and other
    // modules keep the named refusal
    val e2 = intercept[UnsupportedOperationException](engine.write(seg,
      "CREATE VIRTUAL TABLE idx USING geopoly(a);"))
    assert(e2.getMessage.contains("USING geopoly is not supported"))
    // porter, UNINDEXED, the full tokenizer-argument surface,
    // content= and contentless_delete= are SUPPORTED since
    // r11/r12/r15/r16 (FtsSpec, TokenizerFtsSpec, ContentFtsSpec);
    // options with no analog keep the named refusal
    val e3 = intercept[UnsupportedOperationException](engine.write(seg,
      "CREATE VIRTUAL TABLE ft USING fts5(body, content='', " +
        "nosuchopt=1);"))
    assert(e3.getMessage.contains("fts5 option"))
    engine.write(seg,
      "CREATE VIRTUAL TABLE ft_ok USING fts5(body, tokenize = 'porter');")
    engine.write(seg,
      "CREATE VIRTUAL TABLE ft_ok2 USING fts5(body, extra UNINDEXED);")
  }

  test("MATCH on the read path refuses by name when no fts table resolves") {
    val e = intercept[IllegalArgumentException](engine.read(seg,
      "SELECT id FROM t WHERE body MATCH 'hello';"))
    assert(e.getMessage.contains("MATCH operator could not be resolved"))
    assert(e.getMessage.contains("FTS5"))
    // a column NAMED match stays usable (only the infix operator is
    // fts syntax)
    engine.schemas.put("refusal-schema-2",
      "CREATE TABLE m (match TEXT);")
    engine.provisionWritable("refusal-2", "refusal-schema-2")
    engine.write("refusal-2", "INSERT INTO m (`match`) VALUES ('ok');")
    assert(engine.read("refusal-2", "SELECT `match` FROM m;")
      .collect()(0).getString(0) == "ok")
  }

  test("a parse error that merely CONTAINS 'match' keeps its real error (ADVICE r10)") {
    // the word inside a string literal must not hijack an unrelated
    // syntax error into the fts refusal
    val e1 = intercept[IllegalArgumentException](engine.read(seg,
      "SELECT 'a match b' FROMM t;"))
    assert(!e1.getMessage.contains("MATCH operator"), e1.getMessage)
    // nor as an AS alias in a statement that fails for another reason
    val e2 = intercept[IllegalArgumentException](engine.read(seg,
      "SELECT id AS match GROUPY BY id FROM t;"))
    assert(!e2.getMessage.contains("MATCH operator"), e2.getMessage)
    // the genuine operator still refuses by name, literal operand and all
    val e3 = intercept[IllegalArgumentException](engine.read(seg,
      "SELECT id FROM t WHERE body MATCH 'hello' AND;"))
    assert(e3.getMessage.contains("MATCH operator could not be resolved"))
  }

  test("ATTACH is SUPPORTED (r17); a stray DETACH errors like sqlite3") {
    // the surface itself is differential-tested in AttachSpec; here
    // only the refusal-to-support flip is pinned: no 'not supported'
    engine.write(seg, "ATTACH ':memory:' AS scratch;" +
      "CREATE TABLE scratch.x (v INTEGER); INSERT INTO scratch.x VALUES (1);")
    val e = intercept[IllegalArgumentException](engine.write(seg,
      "DETACH DATABASE other;"))
    assert(e.getMessage.contains("no such database: other"))
  }
}
