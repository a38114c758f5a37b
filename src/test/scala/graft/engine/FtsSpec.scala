package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** FTS5 full-text search (Fts5.scala), DIFFERENTIAL against the
  * sandbox sqlite3's real fts5 module: the same CREATE VIRTUAL TABLE +
  * inserts + MATCH query must answer identically on both engines —
  * terms, phrases, prefixes, AND/OR/NOT (probed precedence), column
  * filters, column-scoped MATCH, aliases, tokenizer behavior
  * (case-folding, diacritics, punctuation splits), DML on the fts
  * table, and the sqlite_master catalog shape. The reference delegates
  * all of this to libsqlite3 when fts5 is compiled in
  * (trough/read.py:63-67, write.py:40). */
class FtsSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-fts").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"fts-$n"
    engine.schemas.put(s"fts-schema-$n", schema)
    engine.provisionWritable(id, s"fts-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("fts-cli", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString, schema) == 0)
    db
  }

  private def runBoth(id: String, db: Path, script: String): Unit = {
    engine.write(id, script)
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") == 0, s"sqlite3 failed: $script")
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

  private def same(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map(render).mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- sqlite3 --\n$cliSide\n-- for --\n$select")
  }

  private val schema =
    "CREATE VIRTUAL TABLE docs USING fts5(title, body);"
  private val fill =
    "INSERT INTO docs VALUES " +
      "('Greeting', 'hello world'), " +
      "('Farewell', 'goodbye cruel world'), " +
      "('Caps', 'HELLO THERE world'), " +
      "('Punct', 'don''t panic, HELLO-world!'), " +
      "('Accents', 'Ärger im Café'), " +
      "('Numbers', 'version 42 of fts5 rocks'), " +
      "('Phrase', 'the quick brown fox jumps'), " +
      "('Partial', 'worldwide hellos everywhere');"

  private def m(q: String): String =
    s"SELECT title FROM docs WHERE docs MATCH '$q' ORDER BY title;"

  test("terms, case folding, punctuation splits, numbers (unicode61)") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("hello"))         // folds Caps + Punct, not Partial
    same(id, db, m("HELLO"))         // query side folds too
    same(id, db, m("world"))         // not 'worldwide'
    same(id, db, m("t"))             // the don't split: [don, t]
    same(id, db, m("42"))
    same(id, db, m("missing"))       // empty result
  }

  test("diacritics: remove_diacritics=1 default folds Ärger to arger") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("arger"))
    same(id, db, m("Ärger"))
    same(id, db, m("cafe"))
    same(id, db, m("café"))
  }

  test("phrases and prefixes") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("\"hello world\""))      // adjacency required
    same(id, db, m("\"world hello\""))      // wrong order: empty
    same(id, db, m("\"quick brown fox\""))
    same(id, db, m("hell*"))                // Greeting, Caps, Punct, Partial
    same(id, db, m("\"quick brown f\"*"))   // phrase with trailing prefix
    same(id, db, m("\"don t\""))            // tokenized apostrophe phrase
  }

  test("AND / OR / NOT with fts5 precedence (probed)") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("hello AND world"))
    same(id, db, m("hello world"))          // implicit AND
    same(id, db, m("hello OR goodbye"))
    same(id, db, m("world NOT hello"))
    same(id, db, m("hello NOT there OR goodbye")) // (hello NOT there) OR goodbye
    same(id, db, m("hello there OR goodbye"))     // (hello AND there) OR goodbye
    same(id, db, m("(hello OR goodbye) AND world"))
    // lowercase and/or are TERMS, not operators (fts5 rule)
    same(id, db, m("hello or goodbye"))
    // implicit AND does NOT reach across parens (probed: fts5 syntax
    // error) — both engines refuse
    val e = intercept[Exception](
      engine.read(id, m("(hello OR goodbye) world")).collect())
    assert(e.getMessage.contains("fts5"), e.getMessage)
    assert(SqliteCli.run(db.toString,
      "SELECT title FROM docs WHERE docs MATCH '(hello OR goodbye) world';") != 0)
  }

  test("column filters and column-scoped MATCH") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("title : greeting"))
    same(id, db, m("body : greeting"))      // empty: word only in title
    same(id, db, m("title : (greeting OR farewell)"))
    // column name as the MATCH LHS (sqlite accepts this spelling)
    same(id, db,
      "SELECT title FROM docs WHERE body MATCH 'hello' ORDER BY title;")
    // unknown column in a filter errors on both engines
    val e = intercept[Exception](engine.read(id, m("nosuch : x")))
    assert(e.getMessage.contains("no such column"))
    assert(SqliteCli.run(db.toString,
      "SELECT title FROM docs WHERE docs MATCH 'nosuch : x';") != 0)
  }

  test("aliased MATCH spellings; MATCH composes with ordinary SQL") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    // sqlite's aliased spellings (probed): the hidden table-column
    // `alias.table MATCH`, and the qualified column `alias.col MATCH`;
    // a BARE alias is "no such column" in sqlite too
    same(id, db,
      "SELECT d.title FROM docs d WHERE d.docs MATCH 'hello' ORDER BY d.title;")
    same(id, db,
      "SELECT d.title FROM docs d WHERE d.body MATCH 'hello' ORDER BY d.title;")
    same(id, db,
      "SELECT count(*) AS c FROM docs WHERE docs MATCH 'world' " +
        "AND title <> 'Caps';")
    same(id, db,
      "SELECT title, length(body) AS lb FROM docs " +
        "WHERE docs MATCH 'world OR panic' ORDER BY lb, title;")
  }

  test("DML on the fts table: UPDATE and DELETE re-matching") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    runBoth(id, db,
      "DELETE FROM docs WHERE title = 'Caps';" +
        "UPDATE docs SET body = 'bonjour world' WHERE title = 'Greeting';")
    same(id, db, m("hello"))     // Greeting no longer matches
    same(id, db, m("bonjour"))
    same(id, db, m("world"))
  }

  test("sqlite_master serves the original virtual DDL with rootpage 0") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    val row = engine.read(id,
      "SELECT type, name, rootpage, sql FROM sqlite_master " +
        "WHERE name = 'docs';").collect()(0)
    assert(row.getString(0) == "table")
    assert(row.getLong(2) == 0L)
    assert(row.getString(3).toUpperCase.startsWith("CREATE VIRTUAL TABLE"))
    // the CLI side agrees on the virtual row's shape
    assert(SqliteCli.query(db.toString,
      "SELECT type, rootpage FROM sqlite_master WHERE name = 'docs';")
      == "table|0")
  }

  test("initial-token ^ anchors (r11, probed)") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("^hello"))            // Greeting only (first body token)
    same(id, db, m("^greeting"))         // anchors check EACH column
    same(id, db, m("^hell*"))            // anchor + prefix
    same(id, db, m("^\"goodbye cruel\"")) // anchored phrase
    same(id, db, m("^\"goodbye cru\"*"))
    same(id, db, m("^cruel"))            // not at position 0: empty
    same(id, db, m("title : ^greeting")) // anchor inside a column filter
    same(id, db, m("body : ^greeting"))  // title-only word: empty
    same(id, db, m("world ^hello"))      // chain position is free (probed)
    same(id, db, m("^hello OR ^goodbye"))
  }

  test("NEAR groups (r11, probed instance-spread model)") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("NEAR(hello world)"))       // default N=10
    same(id, db, m("NEAR(hello world, 0)"))    // adjacency, order-free
    same(id, db, m("NEAR(hello world, 1)"))
    same(id, db, m("NEAR(quick jumps, 2)"))    // 2 between: fox + brown
    same(id, db, m("NEAR(quick jumps, 3)"))
    same(id, db, m("NEAR(the fox brown, 1)"))  // 3 phrases, one window
    same(id, db, m("NEAR(\"quick brown\" jumps, 1)")) // phrase member
    same(id, db, m("NEAR(hell* world, 0)"))    // prefix member
    same(id, db, m("NEAR(hello, 0)"))          // single phrase ≡ plain term
    same(id, db, m("NEAR(hello panic, 5)"))
    same(id, db, m("NEAR(hello world, 1) OR goodbye"))
    same(id, db, m("version NEAR(42 rocks, 2)")) // implicit AND with a group
    same(id, db, m("body : NEAR(goodbye world, 1)"))
    // ^ inside NEAR is a syntax error on BOTH engines (probed)
    val eNear = intercept[Exception](engine.read(id, m("NEAR(^hello world)")))
    assert(eNear.getMessage.contains("fts5"), eNear.getMessage)
    assert(SqliteCli.run(db.toString,
      "SELECT title FROM docs WHERE docs MATCH 'NEAR(^hello world)';") != 0)
    // bare NEAR without ( is an ordinary term on both engines (probed)
    val id2 = seg("CREATE VIRTUAL TABLE t2 USING fts5(a);")
    val db2 = cliDb("CREATE VIRTUAL TABLE t2 USING fts5(a);")
    runBoth(id2, db2, "INSERT INTO t2 VALUES ('near miss'), ('far away');")
    assert(engine.read(id2, "SELECT a FROM t2 WHERE t2 MATCH 'NEAR';")
      .collect().map(_.getString(0)).toSeq == Seq("near miss"))
    assert(SqliteCli.query(db2.toString,
      "SELECT a FROM t2 WHERE t2 MATCH 'NEAR';") == "near miss")
  }

  test("semantics-preserving fts5 options accepted; others refuse (r11)") {
    // tokenize default spellings, prefix= (index hint), detail=full,
    // columnsize= change nothing a scan can observe — differential
    val optSchema = "CREATE VIRTUAL TABLE docs USING fts5(title, body, " +
      "tokenize = 'unicode61 remove_diacritics 1', prefix='2 3', " +
      "detail=full, columnsize=0);"
    val id = seg(optSchema); val db = cliDb(optSchema)
    runBoth(id, db, fill)
    same(id, db, m("hello"))
    same(id, db, m("café"))
    same(id, db, m("hell*"))
    same(id, db, m("\"quick brown fox\""))
    // porter supported since r12 (PorterFtsSpec); trigram and
    // detail=none|column since r13 (TrigramFtsSpec, DetailFtsSpec);
    // ascii + tokenizer arguments and content=/content_rowid= since
    // r15, contentless_delete= since r16 (TokenizerFtsSpec,
    // ContentFtsSpec) — what remains refuses
    for (bad <- Seq("detail=bogus", "nosuchopt=1")) {
      val e = intercept[Exception](seg(
        s"CREATE VIRTUAL TABLE nope USING fts5(x, $bad);"))
      assert(e.getMessage.contains("fts5 option"), s"$bad: ${e.getMessage}")
    }
    // contentless_delete demands content='' — real fts5's own text
    val eCd = intercept[Exception](seg(
      "CREATE VIRTUAL TABLE nope USING fts5(x, contentless_delete=1);"))
    assert(eCd.getMessage.contains(
      "contentless_delete=1 requires a contentless table"), eCd.getMessage)
    // tokenizer invalid-argument shapes keep real fts5's message
    for (bad <- Seq("tokenize='trigram case_sensitive 2'",
        "tokenize='trigram remove_diacritics 3'",
        "tokenize='trigram case_sensitive 1 remove_diacritics 1'",
        "tokenize='trigram bogus 1'",
        "tokenize='unicode61 remove_diacritics 3'",
        "tokenize='ascii remove_diacritics 1'")) {
      val e = intercept[Exception](seg(
        s"CREATE VIRTUAL TABLE nope USING fts5(x, $bad);"))
      assert(e.getMessage.contains("error in tokenizer constructor"),
        s"$bad: ${e.getMessage}")
    }
  }

  test("bm25() and rank score like real fts5 (r11, probed formula)") {
    // the corpus the formula was pinned on: k1=1.2 b=0.75, idf
    // ln((N-h+.5)/(h+.5)) floored at 1e-6, weights scale tf only
    // (D and avgdl stay unweighted), overlapping occurrences count,
    // column filters narrow df AND tf, duplicates score twice
    val s = "CREATE VIRTUAL TABLE t USING fts5(a, b);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db,
      "INSERT INTO t VALUES ('x y z', 'p q'), ('x x y', 'x p'), " +
        "('m n o q r', 's t u v'), ('x', NULL), ('w w w w', 'w w');")
    def bq(q: String, fn: String = "bm25(t)") =
      s"SELECT a, printf('%.6f', $fn) FROM t WHERE t MATCH '$q' ORDER BY a;"
    for (q <- Seq("x", "x y", "\"x y\"", "x OR q", "b : x", "x*", "w",
        "\"w w\"", "x NOT q", "NEAR(x y, 2)", "x x", "^x y"))
      same(id, db, bq(q))
    same(id, db, bq("x", "bm25(t, 2.0, 0.5)")) // weighted tf
    same(id, db, bq("y", "bm25(t, 2.0)"))      // missing weight -> 1.0
    same(id, db, bq("y", "bm25(t, 1.0, 9.0)")) // D/avgdl unweighted
    same(id, db, bq("y", "bm25(t, 1.0, 1.0, 3.0)")) // extras ignored
    // rank: the hidden column, case-insensitive; ORDER BY rank/bm25
    same(id, db, "SELECT a, printf('%.6f', rank) FROM t " +
      "WHERE t MATCH 'x y' ORDER BY a;")
    same(id, db, "SELECT a, printf('%.6f', RANK) FROM t " +
      "WHERE t MATCH 'y' ORDER BY a;")
    same(id, db, "SELECT a FROM t WHERE t MATCH 'x' ORDER BY rank, a;")
    same(id, db, "SELECT a FROM t WHERE t MATCH 'x' ORDER BY bm25(t), a;")
    // without a MATCH clause: bm25() is 0.0, rank is NULL (probed)
    same(id, db, "SELECT a, bm25(t), coalesce(rank, -99) FROM t ORDER BY a;")
    // column-scoped MATCH restricts df and tf to that column
    same(id, db, "SELECT a, printf('%.6f', bm25(t)) FROM t " +
      "WHERE b MATCH 'x' ORDER BY a;")
    // window rank() and an AS rank alias are untouched by the rewrite
    same(id, db, "SELECT a, count(*) AS rank FROM t " +
      "WHERE t MATCH 'x' GROUP BY a ORDER BY a;")
    // OR-combined MATCHes score per first-matching-branch (r16, see
    // the dedicated multi-MATCH tests); a mixed shape neither conjunct
    // nor a clean OR chain keeps the named refusal
    val e = intercept[UnsupportedOperationException](engine.read(id,
      "SELECT rank FROM t WHERE t MATCH 'x' OR t MATCH 'q' AND a <> '';")
      .collect())
    assert(e.getMessage.contains("top-level AND conjunct"), e.getMessage)
  }

  test("highlight() wraps instances like real fts5 (r11, probed)") {
    val s = "CREATE VIRTUAL TABLE t USING fts5(a, b);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db,
      "INSERT INTO t VALUES " +
        "('the quick brown fox jumps', 'lazy dog sleeps'), " +
        "('quick start guide', NULL), " +
        "('w w w w', 'alpha beta'), " +
        "('  padded HELLO-world! tail  ', 'don''t panic');")
    // '<'||…||'>' markers: raw leading/trailing whitespace is part of
    // the rendered span (probed) but the CLI capture trims it
    def hq(q: String, col: Int = 0) =
      s"SELECT '<' || highlight(t, $col, '[', ']') || '>' FROM t " +
        s"WHERE t MATCH '$q' ORDER BY a;"
    same(id, db, hq("quick"))
    // instances in the other column; coalesce: a NULL leading row
    // renders as an empty line the CLI helper would trim
    same(id, db, "SELECT coalesce(highlight(t, 1, '[', ']'), 'isnull') " +
      "FROM t WHERE t MATCH 'quick OR dog' ORDER BY a;")
    same(id, db, hq("\"quick brown\""))        // multi-token span
    same(id, db, hq("\"w w\""))                // overlapping instances merge
    same(id, db, hq("w w"))                    // duplicate phrase, same spans
    same(id, db, hq("hello"))                  // raw-text span: HELLO kept
    same(id, db, hq("qu*"))                    // prefix instance
    same(id, db, hq("^the"))                   // anchored
    same(id, db, hq("NEAR(quick jumps, 5)"))   // NEAR-trimmed poslists
    same(id, db, hq("quick OR missing"))       // unmatched OR branch inert
    same(id, db, hq("t OR panic", 1))          // tokenized apostrophe spans
    // out-of-range / negative column: NULL (probed; snippet errors)
    same(id, db, "SELECT quote(highlight(t, 7, '[', ']')), " +
      "quote(highlight(t, -1, '[', ']')) " +
      "FROM t WHERE t MATCH 'quick' ORDER BY a;")
    // no MATCH clause: echoes the raw column (probed)
    same(id, db,
      "SELECT '<' || highlight(t, 0, '[', ']') || '>' FROM t ORDER BY a;")
    same(id, db, "SELECT quote(highlight(t, 9, '[', ']')) FROM t ORDER BY a;")
    // marker strings are arbitrary text, spliced verbatim
    same(id, db, "SELECT highlight(t, 0, '<b class=\"x\">', '</b>') " +
      "FROM t WHERE t MATCH 'quick' ORDER BY a;")
  }

  test("snippet() windows and centers like real fts5 (r11, probed)") {
    val s = "CREATE VIRTUAL TABLE t USING fts5(a, b);"
    val id = seg(s); val db = cliDb(s)
    val longDoc = (0 until 70).map(i => s"w$i").mkString(" ") +
      " target " + (0 until 10).map(i => s"v$i").mkString(" ")
    runBoth(id, db,
      "INSERT INTO t VALUES " +
        "('the quick brown fox jumps', 'lazy dog sleeps'), " +
        "('quick start guide', NULL), " +
        "('one two three two five six seven two nine', 'quick quick'), " +
        s"('$longDoc', 'x');")
    def sq(q: String, col: Int = 0, n: Int = 3) =
      s"SELECT snippet(t, $col, '[', ']', '...', $n) FROM t " +
        s"WHERE t MATCH '$q' ORDER BY a;"
    same(id, db, sq("quick"))            // centering + edge stretch
    same(id, db, sq("fox"))              // mid-document window
    same(id, db, sq("jumps"))            // end-of-document clamp
    same(id, db, sq("two"))              // repeats: densest window wins
    same(id, db, sq("two OR five"))      // 1000-per-phrase beats repeats
    same(id, db, sq("quick", col = -1))  // best-column mode
    same(id, db, sq("dog", col = -1))
    same(id, db, sq("quick OR dog", col = -1)) // tie -> earliest column
    same(id, db, sq("dog"))              // no instance in col: [0, n)
    same(id, db, sq("quick", col = 1))   // NULL column text -> NULL
    same(id, db, sq("fox", n = 1))
    same(id, db, sq("fox", n = 2))
    same(id, db, sq("\"quick brown\"", n = 2)) // instance clips at edge
    same(id, db, sq("target", n = 70))   // beyond the documented 64: honored
    same(id, db, sq("target", n = 64))
    same(id, db, sq("NEAR(one nine, 10)", n = 4)) // NEAR spans in window
    for (n <- Seq(0, -1, -4)) {          // n<=0: disabled-window path
      same(id, db, sq("quick", n = n))
      same(id, db, sq("two", n = n))     // through the LAST instance
      same(id, db, sq("jumps", n = n))
      same(id, db, sq("dog", n = n))     // no instance: bare ellipsis
      same(id, db, sq("quick", col = -1, n = n))
    }
    // no MATCH clause: [0, n) window, nothing wrapped (probed)
    same(id, db, "SELECT snippet(t, 0, '[', ']', '...', 3) FROM t ORDER BY a;")
    same(id, db, "SELECT snippet(t, -1, '[', ']', '...', 2) FROM t ORDER BY a;")
    // out-of-range column: real fts5's named runtime error (probed —
    // asymmetric with highlight's NULL)
    val e = intercept[Exception](
      engine.read(id, sq("quick", col = 7)).collect())
    assert(e.getMessage.contains("column index out of range"), e.getMessage)
    assert(SqliteCli.run(db.toString,
      "SELECT snippet(t, 7, '[', ']', '...', 3) FROM t WHERE t MATCH 'quick';") != 0)
    // arity and literal-only refusals
    val e2 = intercept[Exception](engine.read(id,
      "SELECT snippet(t, 0, '[', ']', '...') FROM t WHERE t MATCH 'quick';").collect())
    assert(e2.getMessage.contains("wrong number of arguments"), e2.getMessage)
    val e3 = intercept[Exception](engine.read(id,
      "SELECT highlight(t, 0, a, ']') FROM t WHERE t MATCH 'quick';").collect())
    assert(e3.getMessage.contains("string literals"), e3.getMessage)
    val e4 = intercept[Exception](engine.read(id,
      "SELECT snippet(t, 0, '[', ']', '...', 3) FROM t " +
        "WHERE NOT (t MATCH 'quick' OR t MATCH 'dog');").collect())
    assert(e4.getMessage.contains("top-level AND conjunct"), e4.getMessage)
  }

  test("refusals: prefix= export, UNINDEXED; operator-as-term errors") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    val e3 = intercept[Exception](engine.read(id, m("AND")))
    assert(e3.getMessage.contains("fts5"))
    // export builds the real fts5 index incl. prefix= segments
    // (Fts5ExportSpec); columnsize=0 exports the docsize-less layout
    // (r15 — probed: real files carry no %_docsize then)
    val id2 = seg("CREATE VIRTUAL TABLE p USING fts5(a, columnsize=0);")
    engine.write(id2, "INSERT INTO p VALUES ('hello world'), ('goodbye');")
    val out2 = Files.createTempDirectory("fts-exp").resolve("x.sqlite")
    engine.store.exportSqliteSegment(id2, out2.toString)
    assert(SqliteCli.query(out2.toString, "PRAGMA integrity_check;") == "ok")
    assert(SqliteCli.query(out2.toString,
      "SELECT name FROM sqlite_master WHERE name LIKE 'p_%' ORDER BY name;")
      == "p_config\np_content\np_data\np_idx")
    assert(SqliteCli.query(out2.toString,
      "SELECT a FROM p WHERE p MATCH 'hello';") == "hello world")
    assert(SqliteCli.query(out2.toString,
      "SELECT a, printf('%.4f', bm25(p)) FROM p WHERE p MATCH 'hello';")
      == "hello world|-0.0000")
    // prefix=0 mirrors real fts5's named range error (wrapped by the
    // schema validation path)
    val e4b = intercept[Exception](seg(
      "CREATE VIRTUAL TABLE p0 USING fts5(a, prefix=0);"))
    assert(e4b.getMessage.contains("prefix length out of range"), e4b.getMessage)
  }

  test("UNINDEXED columns: stored, rendered, never searched (r11, probed)") {
    val s = "CREATE VIRTUAL TABLE u USING fts5(a, b UNINDEXED, c);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, "INSERT INTO u VALUES " +
      "('hello world', 'hello meta', 'other hello'), " +
      "('plain text', 'only here', NULL), " +
      "('', 'meta only', 'world data');")
    def q(m: String) = "SELECT a, b FROM u WHERE u MATCH " +
      s"'${m.replace("'", "''")}' ORDER BY a;"
    same(id, db, q("hello"))       // b's hello never matches
    same(id, db, q("meta"))        // only-in-b terms match nothing
    same(id, db, q("only"))
    same(id, db, q("b : hello"))   // filter on unindexed: empty, no error
    same(id, db, q("c : hello"))
    same(id, db, q("hello OR world"))
    // bm25's document length and idf exclude the unindexed column
    same(id, db, "SELECT a, printf('%.6f', bm25(u)) FROM u " +
      "WHERE u MATCH 'hello OR world' ORDER BY a;")
    same(id, db, "SELECT a, printf('%.6f', bm25(u, 1.0, 9.0, 2.0)) FROM u " +
      "WHERE u MATCH 'hello' ORDER BY a;")
    // highlight over the unindexed column: raw text, no instances
    same(id, db, "SELECT highlight(u, 1, '[', ']') FROM u " +
      "WHERE u MATCH 'hello' ORDER BY a;")
    same(id, db, "SELECT snippet(u, -1, '[', ']', '...', 3) FROM u " +
      "WHERE u MATCH 'world' ORDER BY a;")
    // DML keeps working through the ordinary write path
    runBoth(id, db, "UPDATE u SET b = 'rewritten' WHERE a = 'plain text';" +
      "DELETE FROM u WHERE a = '';")
    same(id, db, q("plain"))
    same(id, db, q("data"))
  }

  test("fuzz: 150 random MATCH queries agree with real fts5") {
    val id = seg(schema); val db = cliDb(schema)
    // corpus: random 1-6-word docs over a small vocabulary, so terms
    // collide, phrases sometimes align, and prefixes overlap
    val rng = new scala.util.Random(20260814L)
    // trailing '.'/':' forms seed mid-document SENTENCE boundaries,
    // which steer snippet()'s window placement (r11)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "Alpha", "BETA",
      "alphabet", "gambit", "café", "42", "don't", "beta.", "gamma:")
    val docs = (1 to 40).map { i =>
      val words = Seq.fill(1 + rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))
      s"('d$i', '${words.mkString(" ").replace("'", "''")}')"
    }
    runBoth(id, db, s"INSERT INTO docs VALUES ${docs.mkString(", ")};")
    val queryVocab = Seq("alpha", "beta", "gamma", "delta", "alphabet",
      "gambit", "cafe", "42", "don", "t", "missing")
    def bareTerm(): String = {
      val w = queryVocab(rng.nextInt(queryVocab.length))
      rng.nextInt(4) match {
        case 0 => w.take(1 + rng.nextInt(w.length)) + "*"
        case 1 => "\"" + Seq.fill(1 + rng.nextInt(2))(
          queryVocab(rng.nextInt(queryVocab.length))).mkString(" ") + "\""
        case _ => w
      }
    }
    def term(): String = rng.nextInt(8) match {
      case 0 => "^" + bareTerm() // anchored (r11)
      case 1 => // NEAR group (r11): 2-3 members, N 0-4 or default
        val members = Seq.fill(2 + rng.nextInt(2))(bareTerm()).mkString(" ")
        if (rng.nextBoolean()) s"NEAR($members, ${rng.nextInt(5)})"
        else s"NEAR($members)"
      case _ => bareTerm()
    }
    def expr(depth: Int): String =
      if (depth >= 2 || rng.nextInt(3) == 0) term()
      else rng.nextInt(5) match {
        case 0 => s"${expr(depth + 1)} AND ${expr(depth + 1)}"
        case 1 => s"${expr(depth + 1)} OR ${expr(depth + 1)}"
        case 2 => s"${expr(depth + 1)} NOT ${expr(depth + 1)}"
        case 3 => s"(${expr(depth + 1)} OR ${expr(depth + 1)}) AND ${term()}"
        case _ => s"${term()} ${term()}" // implicit AND (phrase-phrase)
      }
    // leak-free shapes for SCORED projections: real fts5 leaks a
    // dead composite OR-branch phrase's tf on the single row its lazy
    // expression iterator rests on (fts5_expr artifact, found via
    // `NEAR(x missing) NOT gamma OR alpha` — gamma scored on the
    // FIRST gamma row only); this engine gates by satisfied branches
    // consistently (documented deviation), so OR/NOT operands here
    // stay leaves where exposure equals satisfied-branch gating
    def safeExpr(depth: Int): String =
      if (depth >= 2 || rng.nextInt(3) == 0) term()
      else rng.nextInt(5) match {
        case 0 => s"${safeExpr(depth + 1)} AND ${safeExpr(depth + 1)}"
        case 1 => s"${term()} OR ${term()}"
        case 2 => s"${safeExpr(depth + 1)} NOT ${bareTerm()}"
        case 3 => s"(${term()} OR ${term()}) AND ${term()}"
        case _ => s"${term()} ${term()}"
      }
    (1 to 150).foreach { i =>
      val q = (if (i % 3 == 2) expr(0) else safeExpr(0)).replace("'", "''")
      // rotate projections: bm25 scoring (%.4f bounds float-noise from
      // differing accumulation order), highlight+snippet rendering
      // (r11; '<'||…||'>' guards edge whitespace from CLI trimming),
      // and plain MATCH
      val proj = i % 3 match {
        case 0 => "title, printf('%.4f', bm25(docs))"
        case 1 =>
          val n = Seq(0, 1, 2, 3, 4, 7, 64)(rng.nextInt(7))
          val sc = Seq(-1, 0, 1)(rng.nextInt(3))
          s"title, '<'||highlight(docs, ${rng.nextInt(2)}, '[', ']')||'>', " +
            s"'<'||snippet(docs, $sc, '[', ']', '…', $n)||'>'"
        case _ => "title"
      }
      same(id, db,
        s"SELECT $proj FROM docs WHERE docs MATCH '$q' ORDER BY title;")
    }
  }

  test("IF NOT EXISTS, DROP TABLE, and a second fts table coexisting") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    runBoth(id, db, "CREATE VIRTUAL TABLE IF NOT EXISTS docs USING fts5(title, body);")
    runBoth(id, db,
      "CREATE VIRTUAL TABLE notes USING fts5(txt);" +
        "INSERT INTO notes VALUES ('hello notebook');")
    same(id, db, "SELECT txt FROM notes WHERE notes MATCH 'hello';")
    // two fts tables in one statement: each MATCH resolves by its
    // alias-qualified hidden table-column
    same(id, db,
      "SELECT d.title, n.txt FROM docs d, notes n " +
        "WHERE d.docs MATCH 'greeting' AND n.notes MATCH 'notebook';")
    runBoth(id, db, "DROP TABLE notes;")
    val e = intercept[Exception](engine.read(id, "SELECT * FROM notes;"))
    assert(e.getMessage.toLowerCase.contains("table_or_view_not_found") ||
      e.getMessage.toLowerCase.contains("cannot be found"))
  }

  test("multiple MATCHes as top-level AND conjuncts: scored as the AND query (r16)") {
    val s2 = "CREATE VIRTUAL TABLE f2 USING fts5(a, b);"
    val id = seg(s2); val db = cliDb(s2)
    runBoth(id, db,
      "INSERT INTO f2 VALUES ('quick brown fox', 'lazy dog'), " +
        "('quick quick fox', 'dog park'), ('slow red fox', 'happy dog'), " +
        "('quick dog', 'fox fox den');")
    // bm25/rank under two conjunct MATCHes = the single AND query
    same(id, db, "SELECT a, printf('%.9e', bm25(f2)) FROM f2 " +
      "WHERE f2 MATCH 'quick' AND f2 MATCH 'fox' ORDER BY a;")
    same(id, db, "SELECT a, printf('%.9e', rank) FROM f2 " +
      "WHERE f2 MATCH 'quick' AND f2 MATCH 'fox' ORDER BY rank, a;")
    // three conjuncts, one column-scoped
    same(id, db, "SELECT a, printf('%.9e', bm25(f2)) FROM f2 " +
      "WHERE f2 MATCH 'fox' AND f2 MATCH 'dog' AND b MATCH 'dog' " +
      "ORDER BY a;")
    // highlight/snippet mark BOTH branches' phrases
    same(id, db, "SELECT a, highlight(f2, 0, '[', ']') FROM f2 " +
      "WHERE f2 MATCH 'quick' AND f2 MATCH 'fox' ORDER BY a;")
    same(id, db, "SELECT a, snippet(f2, 1, '[', ']', '~', 3) FROM f2 " +
      "WHERE f2 MATCH 'quick' AND f2 MATCH 'fox' ORDER BY a;")
    // weights still apply to the combined query
    same(id, db, "SELECT a, printf('%.9e', bm25(f2, 2.0, 0.5)) FROM f2 " +
      "WHERE f2 MATCH 'fox' AND f2 MATCH 'dog' ORDER BY a;")
    // a parenthesized AND-only extra predicate doesn't poison conjunctness
    same(id, db, "SELECT a, printf('%.9e', bm25(f2)) FROM f2 " +
      "WHERE f2 MATCH 'quick' AND (a >= '' AND b >= '') " +
      "AND f2 MATCH 'fox' ORDER BY a;")
    // plain multi-MATCH row sets (no aux function) still answer
    same(id, db, "SELECT a FROM f2 " +
      "WHERE f2 MATCH 'quick' OR f2 MATCH 'fox' ORDER BY a;")
  }

  test("OR-chained MATCHes: first matching branch scores/renders (r16, probed)") {
    val s2 = "CREATE VIRTUAL TABLE f3 USING fts5(a, b);"
    val id = seg(s2); val db = cliDb(s2)
    runBoth(id, db,
      "INSERT INTO f3 VALUES ('quick brown fox', 'lazy dog'), " +
        "('quick quick fox', 'dog park'), ('slow red fox', 'happy dog'), " +
        "('quick dog', 'fox fox den');")
    // two branches, both orders — branch attribution is TEXT order
    same(id, db, "SELECT a, printf('%.9e', bm25(f3)) FROM f3 " +
      "WHERE f3 MATCH 'quick' OR f3 MATCH 'fox' ORDER BY a;")
    same(id, db, "SELECT a, printf('%.9e', bm25(f3)) FROM f3 " +
      "WHERE f3 MATCH 'fox' OR f3 MATCH 'quick' ORDER BY a;")
    // three branches + rank
    same(id, db, "SELECT a, printf('%.9e', rank) FROM f3 " +
      "WHERE f3 MATCH 'slow' OR f3 MATCH 'park' OR f3 MATCH 'den' " +
      "ORDER BY a;")
    // parenthesized chain AND an ordinary predicate outside
    same(id, db, "SELECT a, printf('%.9e', bm25(f3)) FROM f3 " +
      "WHERE (f3 MATCH 'quick' OR f3 MATCH 'fox') AND a <> 'quick dog' " +
      "ORDER BY a;")
    // column-scoped branch in the chain
    same(id, db, "SELECT a, printf('%.9e', bm25(f3)) FROM f3 " +
      "WHERE b MATCH 'den' OR f3 MATCH 'slow' ORDER BY a;")
    // highlight/snippet render the matching branch's phrases only
    same(id, db, "SELECT a, highlight(f3, 0, '[', ']') FROM f3 " +
      "WHERE f3 MATCH 'quick' OR f3 MATCH 'fox' ORDER BY a;")
    same(id, db, "SELECT a, snippet(f3, 1, '[', ']', '~', 3) FROM f3 " +
      "WHERE f3 MATCH 'dog' OR f3 MATCH 'den' ORDER BY a;")
    // weights apply per branch
    same(id, db, "SELECT a, printf('%.9e', bm25(f3, 2.0, 0.5)) FROM f3 " +
      "WHERE f3 MATCH 'quick' OR f3 MATCH 'den' ORDER BY a;")
    // NOT-negated chains and mixed AND/OR shapes keep the refusal
    val e1 = intercept[Exception](engine.read(id,
      "SELECT a, bm25(f3) FROM f3 " +
        "WHERE NOT (f3 MATCH 'quick' OR f3 MATCH 'fox');").collect())
    assert(e1.getMessage.contains("top-level AND conjunct"), e1.getMessage)
    val e2 = intercept[Exception](engine.read(id,
      "SELECT a, bm25(f3) FROM f3 " +
        "WHERE f3 MATCH 'quick' OR f3 MATCH 'fox' AND a <> '';").collect())
    assert(e2.getMessage.contains("top-level AND conjunct"), e2.getMessage)
  }

  test("mixed AND/OR and NOT multi-MATCH (r17): real fts5 cannot execute them " +
      "at all; engine answers the row set, aux functions refuse by name") {
    val s4 = "CREATE VIRTUAL TABLE f4 USING fts5(a, b);"
    val id = seg(s4); val db = cliDb(s4)
    runBoth(id, db,
      "INSERT INTO f4 VALUES ('apple pear', 'kiwi'), " +
        "('apple apple', 'plum'), ('pear plum', 'apple kiwi'), " +
        "('kiwi kiwi', 'pear'), ('plum', 'plum pear apple');")
    // probe pin: the direct shapes ERROR in real fts5 ('unable to use
    // function MATCH in the requested context', 3.51)
    Seq(
      "SELECT a FROM f4 WHERE (f4 MATCH 'apple' OR f4 MATCH 'kiwi') AND f4 MATCH 'pear';",
      "SELECT a FROM f4 WHERE f4 MATCH 'apple' AND NOT f4 MATCH 'kiwi';",
      "SELECT a FROM f4 WHERE NOT (f4 MATCH 'kiwi');",
      "SELECT a FROM f4 WHERE f4 MATCH 'apple' OR NOT f4 MATCH 'pear';"
    ).foreach { q =>
      assert(SqliteCli.run(db.toString, s".bail on\n$q") != 0,
        s"expected real fts5 to refuse: $q")
    }
    // the engine's token-predicate compilation answers them — row sets
    // checked against sqlite3 running the SET-ALGEBRA rewrite over
    // single-MATCH subqueries (the only way real fts5 can express them)
    def sameAs(engineSql: String, cliSql: String): Unit = {
      val ours = engine.read(id, engineSql).collect().map(render)
        .mkString("\n")
      val theirs = SqliteCli.query(db.toString, cliSql)
      assert(ours == theirs,
        s"\n-- engine --\n$ours\n-- sqlite3 --\n$theirs\n-- for --\n$engineSql")
    }
    sameAs(
      "SELECT a FROM f4 WHERE (f4 MATCH 'apple' OR f4 MATCH 'kiwi') " +
        "AND f4 MATCH 'pear' ORDER BY a;",
      "SELECT a FROM f4 WHERE rowid IN (SELECT rowid FROM f4 WHERE " +
        "f4 MATCH 'apple' UNION SELECT rowid FROM f4 WHERE f4 MATCH 'kiwi') " +
        "AND rowid IN (SELECT rowid FROM f4 WHERE f4 MATCH 'pear') ORDER BY a;")
    sameAs(
      "SELECT a FROM f4 WHERE f4 MATCH 'apple' AND NOT f4 MATCH 'kiwi' " +
        "ORDER BY a;",
      "SELECT a FROM f4 WHERE rowid IN (SELECT rowid FROM f4 WHERE " +
        "f4 MATCH 'apple') AND rowid NOT IN (SELECT rowid FROM f4 WHERE " +
        "f4 MATCH 'kiwi') ORDER BY a;")
    sameAs(
      "SELECT a FROM f4 WHERE NOT (f4 MATCH 'kiwi') ORDER BY a;",
      "SELECT a FROM f4 WHERE rowid NOT IN (SELECT rowid FROM f4 WHERE " +
        "f4 MATCH 'kiwi') ORDER BY a;")
    sameAs(
      "SELECT a FROM f4 WHERE b MATCH 'pear' OR NOT f4 MATCH 'apple' " +
        "ORDER BY a;",
      "SELECT a FROM f4 WHERE rowid IN (SELECT rowid FROM f4 WHERE " +
        "b MATCH 'pear') OR rowid NOT IN (SELECT rowid FROM f4 WHERE " +
        "f4 MATCH 'apple') ORDER BY a;")
    // aux functions under these shapes refuse, naming fts5's own error
    Seq(
      "SELECT a, bm25(f4) FROM f4 WHERE (f4 MATCH 'apple' OR " +
        "f4 MATCH 'kiwi') AND f4 MATCH 'pear';",
      "SELECT a, highlight(f4, 0, '[', ']') FROM f4 WHERE " +
        "f4 MATCH 'apple' AND NOT f4 MATCH 'kiwi';",
      "SELECT a, rank FROM f4 WHERE f4 MATCH 'apple' OR NOT f4 MATCH 'pear';"
    ).foreach { q =>
      val e = intercept[Exception](engine.read(id, q).collect())
      assert(e.getMessage.contains("unable to use function MATCH"),
        s"$q\n${e.getMessage}")
    }
  }
}
