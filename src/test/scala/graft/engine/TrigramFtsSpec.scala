package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** fts5 `tokenize = 'trigram'` (r13), DIFFERENTIAL against the sandbox
  * sqlite3: tokens are every contiguous 3-CODEPOINT window of the text
  * — spaces and punctuation included — case-folded unless
  * `case_sensitive 1`, diacritics KEPT unless `remove_diacritics 1|2`
  * (probed identical), giving MATCH substring semantics. Probed edges
  * this spec pins: query terms under 3 codepoints are empty phrases
  * that match NOTHING (no error; OR/NOT treat them as false, NEAR
  * ignores them), highlight merges instances whose ORIGINAL-text spans
  * touch (`abcabc` MATCH abc renders [abcabc]), positions for
  * NEAR/^/bm25/snippet are trigram indices, and `case_sensitive 1`
  * with `remove_diacritics ≥ 1` is real fts5's tokenizer-constructor
  * error. The reference serves fts through libsqlite3
  * (trough/read.py:63-67), where trigram is a standard tokenizer any
  * ingested segment may declare. */
class TrigramFtsSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-trigram").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"tg-$n"
    engine.schemas.put(s"tg-schema-$n", schema)
    engine.provisionWritable(id, s"tg-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("trigram-cli", ".db")
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

  private val schema =
    "CREATE VIRTUAL TABLE docs USING fts5(title, body, tokenize='trigram');"
  private val fill =
    "INSERT INTO docs VALUES " +
      "('T1', 'Hello World'), " +
      "('T2', 'abcdef'), " +
      "('T3', 'ab'), " +                      // under 3 cps: no tokens
      "('T4', 'café au lait'), " +
      "('T5', 'ABCDEF'), " +
      "('T6', 'x hello y'), " +
      "('T7', 'llo wor'), " +
      "('T8', 'aaaa'), " +
      "('T9', 'abcabc'), " +
      "('TA', 'xxabcyy abc z'), " +
      "('TB', 'one. two: three sentences here.');"

  private def m(q: String): String =
    s"SELECT title FROM docs WHERE docs MATCH '${q.replace("'", "''")}' " +
      "ORDER BY title;"

  test("MATCH is case-folded substring containment over 3-cp windows") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("cde"))            // case-folded: abcdef + ABCDEF
    same(id, db, m("abcd"))           // 4-cp term = 2-trigram phrase
    same(id, db, m("hello"))
    same(id, db, m("\"lo wo\""))      // quoted: windows span the space
    same(id, db, m("ab"))             // short term: zero rows, no error
    same(id, db, m("abc AND xy"))     // empty phrase under AND = false
    same(id, db, m("abc OR xy"))      // empty phrase under OR ignored
    same(id, db, m("abc NOT xy"))     // empty phrase under NOT false
    same(id, db, m("xy NOT abc"))
    same(id, db, m("afé"))            // diacritics kept by default
    same(id, db, m("afe"))            // ... so the stripped form misses
    same(id, db, m("abc*"))           // prefix on 3-cp stem = exact
    same(id, db, m("\"bca\"*"))
    same(id, db, m("ab*"))            // under-3 prefix stays empty
    same(id, db, m("^hel"))           // anchored at trigram position 0
    same(id, db, m("^ell"))
    same(id, db, m("NEAR(hel rld, 6)")) // positions are trigram indices
    same(id, db, m("NEAR(hel rld, 7)"))
    same(id, db, m("NEAR(hel rld, 8)"))
    same(id, db, m("NEAR(ab abc, 3)")) // empty member ignored
    same(id, db, m("NEAR(ab cd, 3)"))  // all-empty NEAR matches nothing
    // implicit-AND chains IGNORE empty members (probed: `xyz ab`
    // answers like xyz while `xyz AND ab` answers nothing) — the rule
    // covers prefix, anchored, and column-filtered members
    same(id, db, m("hello ab"))
    same(id, db, m("hello ca*"))
    same(id, db, m("hello ^ab"))
    same(id, db, m("body : ab hello"))
    same(id, db, m("ab cd"))          // all-empty chain matches nothing
    same(id, db, m("^hel ca* NOT a*"))
    same(id, db, m("body : abc"))
    same(id, db, m("missing"))
  }

  test("case_sensitive 1 keeps case; remove_diacritics folds to base") {
    val cs = "CREATE VIRTUAL TABLE cs USING fts5(a, " +
      "tokenize='trigram case_sensitive 1');"
    val idC = seg(cs); val dbC = cliDb(cs)
    runBoth(idC, dbC, "INSERT INTO cs VALUES ('Hello World'), " +
      "('hello world'), ('CAFÉ'), ('café');")
    same(idC, dbC, "SELECT a FROM cs WHERE cs MATCH 'Hel' ORDER BY a;")
    same(idC, dbC, "SELECT a FROM cs WHERE cs MATCH 'hel' ORDER BY a;")
    same(idC, dbC, "SELECT a FROM cs WHERE cs MATCH 'AFÉ' ORDER BY a;")

    val rd = "CREATE VIRTUAL TABLE rd USING fts5(a, " +
      "tokenize='trigram remove_diacritics 1');"
    val idR = seg(rd); val dbR = cliDb(rd)
    // NFC-precomposed é and NFD-decomposed e+U+0301 both fold to e
    runBoth(idR, dbR, "INSERT INTO rd VALUES ('CAFÉ'), ('café'), " +
      "('cafe'), ('cafe\u0301 x');")
    same(idR, dbR, "SELECT a FROM rd WHERE rd MATCH 'caf' ORDER BY a;")
    same(idR, dbR, "SELECT a FROM rd WHERE rd MATCH 'afe' ORDER BY a;")
    same(idR, dbR, "SELECT a FROM rd WHERE rd MATCH 'afé' ORDER BY a;")
    // offsets address the ORIGINAL text — the combining mark rides
    // inside the preceding token's span (probed: c[afé] x)
    same(idR, dbR, "SELECT a, highlight(rd, 0, '[', ']') FROM rd " +
      "WHERE rd MATCH 'afe' ORDER BY a;")

    // remove_diacritics 2 behaves like 1 for trigram (probed)
    val rd2 = "CREATE VIRTUAL TABLE rd2 USING fts5(a, " +
      "tokenize='trigram remove_diacritics 2');"
    val idR2 = seg(rd2); val dbR2 = cliDb(rd2)
    runBoth(idR2, dbR2, "INSERT INTO rd2 VALUES ('CAFÉ'), ('naïve plan');")
    same(idR2, dbR2, "SELECT a FROM rd2 WHERE rd2 MATCH 'afe' ORDER BY a;")
    same(idR2, dbR2, "SELECT a FROM rd2 WHERE rd2 MATCH 'nai' ORDER BY a;")
  }

  test("highlight merges touching spans; snippet windows trigram positions") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    // overlapping instances ('aaaa' MATCH aaa) and char-adjacent
    // instances ('abcabc' MATCH abc) merge into one marked span
    same(id, db, "SELECT title, highlight(docs, 1, '[', ']') FROM docs " +
      "WHERE docs MATCH 'aaa' ORDER BY title;")
    same(id, db, "SELECT title, highlight(docs, 1, '[', ']') FROM docs " +
      "WHERE docs MATCH 'abc' ORDER BY title;")
    same(id, db, "SELECT title, highlight(docs, 1, '[', ']') FROM docs " +
      "WHERE docs MATCH 'ello' ORDER BY title;")
    for (nt <- Seq(3, 7, 64))
      same(id, db, "SELECT title, '<'||snippet(docs, 1, '[', ']', '…', " +
        s"$nt)||'>' FROM docs WHERE docs MATCH 'hello OR abc' ORDER BY title;")
    same(id, db, "SELECT title, printf('%.6f', bm25(docs)) FROM docs " +
      "WHERE docs MATCH 'hello' ORDER BY title;")
    same(id, db, "SELECT title, printf('%.6f', rank) FROM docs " +
      "WHERE docs MATCH 'abc OR ell' ORDER BY rank, title;")
    // empty phrase contributes zero hits to scoring, never a crash
    same(id, db, "SELECT title, printf('%.6f', bm25(docs)) FROM docs " +
      "WHERE docs MATCH 'ab OR abc' ORDER BY title;")
  }

  test("surrogate pairs count as single codepoints") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, "INSERT INTO docs VALUES ('E1', 'a😀b😀c');")
    same(id, db, m("\"a😀b\""))
    same(id, db, "SELECT title, highlight(docs, 1, '[', ']') FROM docs " +
      "WHERE docs MATCH '\"a😀b\"' ORDER BY title;")
  }

  test("trigram + UNINDEXED columns compose") {
    val s = "CREATE VIRTUAL TABLE u USING fts5(a, b UNINDEXED, " +
      "tokenize='trigram');"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, "INSERT INTO u VALUES " +
      "('hello world', 'stored only'), ('stored only', 'hello world');")
    same(id, db, "SELECT a, b FROM u WHERE u MATCH 'ello' ORDER BY a;")
    same(id, db, "SELECT a FROM u WHERE u MATCH 'b : ello' ORDER BY a;")
    same(id, db, "SELECT a, printf('%.6f', bm25(u)) FROM u " +
      "WHERE u MATCH 'stor' ORDER BY a;")
  }

  test("exported .sqlite index holds trigram terms real sqlite3 can MATCH") {
    val id = seg(schema)
    engine.write(id, fill)
    val out = Files.createTempDirectory("trigram-export")
      .resolve(s"$id.sqlite")
    store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    // fts5's own checksum recomputes the index with ITS trigram
    // tokenizer — a full differential over windowing + index bytes
    assert(SqliteCli.run(out.toString,
      "INSERT INTO docs(docs) VALUES('integrity-check');") == 0,
      "fts5's integrity-check rejected the exported trigram index")
    for (q <- Seq("cde", "abcd", "hello", "\"lo wo\"", "afé", "missing",
        "^hel", "body : abc")) {
      val select = m(q)
      val engineSide = engine.read(id, select).collect()
        .map(_.getString(0)).mkString("\n")
      val cliSide = SqliteCli.query(out.toString, select)
      assert(engineSide == cliSide,
        s"\n-- engine --\n$engineSide\n-- exported --\n$cliSide\n-- $q")
    }
  }

  // the FtsSpec fuzzer shape over a substring-colliding corpus, at two
  // fresh seeds: random docs + random MATCH/bm25/aux queries must agree
  // with real trigram fts5 — including terms under 3 codepoints, mixed
  // case, diacritics, and quoted phrases spanning spaces
  for (seed <- Seq(20260816L, 99260816L))
    test(s"fuzz: 150 random trigram queries agree with real fts5 (seed $seed)") {
      val id = seg(schema); val db = cliDb(schema)
      val rng = new scala.util.Random(seed)
      // Hebrew points, Thai tone marks and Arabic harakat are
      // NON-diacritic combining marks: trigram remove_diacritics must
      // keep them (ADVICE r13 — only fts5's diacritic set strips)
      val vocab = Seq("alpha", "beta", "gamma", "Alpha", "BETA", "alphabet",
        "gambit", "café", "42x", "ab", "aaaa", "abcabc", "betamax.",
        "gamma:", "x", "שָׁלוֹם", "שלום", "ที่นั่น", "ทนน", "مَرْحَبًا", "مرحبا")
      val docs = (1 to 40).map { i =>
        val words = Seq.fill(1 + rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))
        s"('d$i', '${words.mkString(" ").replace("'", "''")}')"
      }
      runBoth(id, db, s"INSERT INTO docs VALUES ${docs.mkString(", ")};")
      val queryVocab = Seq("alpha", "beta", "gamma", "alphabet", "gambit",
        "café", "cafe", "42x", "ab", "aaa", "abc", "bet", "amm", "missing",
        "pha", "max", "שָׁלוֹם", "שלום", "לוֹם", "ที่นั่น", "ทนน", "นั่น",
        "مَرْحَبًا", "مرحبا", "حَبً")
      def bareTerm(): String = {
        val w = queryVocab(rng.nextInt(queryVocab.length))
        rng.nextInt(5) match {
          case 0 => w.take(1 + rng.nextInt(w.length)) + "*"
          case 1 => // quoted, possibly multi-word: windows span spaces
            "\"" + Seq.fill(1 + rng.nextInt(2))(
              queryVocab(rng.nextInt(queryVocab.length))).mkString(" ") + "\""
          case _ => w
        }
      }
      def term(): String = rng.nextInt(8) match {
        case 0 => "^" + bareTerm()
        case 1 =>
          val members = Seq.fill(2 + rng.nextInt(2))(bareTerm()).mkString(" ")
          if (rng.nextBoolean()) s"NEAR($members, ${rng.nextInt(9)})"
          else s"NEAR($members)"
        case _ => bareTerm()
      }
      // leaf-only OR/NOT operands: same leak-free shapes as FtsSpec's
      // fuzzer (real fts5's lazy expression iterator leaks a dead
      // OR-branch phrase's tf on one row — documented deviation)
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
        val q = safeExpr(0).replace("'", "''")
        val proj = i % 3 match {
          case 0 => "title, printf('%.4f', bm25(docs))"
          case 1 =>
            val nt = Seq(0, 1, 2, 3, 4, 7, 64)(rng.nextInt(7))
            val sc = Seq(-1, 0, 1)(rng.nextInt(3))
            s"title, '<'||highlight(docs, ${rng.nextInt(2)}, '[', ']')||'>', " +
              s"'<'||snippet(docs, $sc, '[', ']', '…', $nt)||'>'"
          case _ => "title"
        }
        same(id, db,
          s"SELECT $proj FROM docs WHERE docs MATCH '$q' ORDER BY title;")
      }
    }
}
