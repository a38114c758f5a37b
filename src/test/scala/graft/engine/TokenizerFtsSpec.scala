package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** fts5 tokenizer CONFIGURATION surface (r15), DIFFERENTIAL against
  * the sandbox sqlite3: `tokenize='ascii'`, unicode61's
  * `remove_diacritics 0|2`, `tokenchars`, `separators` and
  * `categories` arguments, and porter over non-default parents — the
  * [[Fts5.Tok]] config threaded end to end (CREATE VIRTUAL TABLE →
  * MATCH/bm25/highlight compilation → the codegen'd expressions).
  * The reference delegates all tokenizer handling to libsqlite3
  * (trough/read.py:63-67, write.py:40), so any tokenize= a real
  * trough segment declares must answer identically here. Probed
  * semantics pinned by this spec: ascii treats every cp > 127 as a
  * token char and folds A-Z only (no diacritic removal); tokenchars/
  * separators classify the RAW codepoint (before folding) and
  * separators win when a char is in both; categories REPLACES the
  * default L* N* Co mask; remove_diacritics to ascii and unknown
  * arguments are real fts5's tokenizer-constructor error. */
class TokenizerFtsSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-tokfts").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"tk-$n"
    engine.schemas.put(s"tk-schema-$n", schema)
    engine.provisionWritable(id, s"tk-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("tokfts-cli", ".db")
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

  private def both(schema: String, fill: String): (String, Path) = {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    (id, db)
  }

  private def m(q: String): String =
    s"SELECT a FROM t WHERE t MATCH '${q.replace("'", "''")}' ORDER BY a;"

  // ------------------------------------------------------------ ascii

  test("ascii: A-Z folded, diacritics KEPT, cp>127 are token chars") {
    val (id, db) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, tokenize='ascii');",
      "INSERT INTO t VALUES ('Héllo world'), ('HELLO there'), " +
        ('('.toString + "'héllo again'), ('hello plain'), " +
        "('café 42x'), ('cafe 42X'), ('naïve move'), ('naive move');"))
    same(id, db, m("hello"))   // HELLO + hello (ascii folds A-Z)
    same(id, db, m("héllo"))   // Héllo + héllo (é kept, H folded)
    same(id, db, m("HELLO"))
    same(id, db, m("cafe"))    // NOT café — no diacritic removal
    same(id, db, m("café"))
    same(id, db, m("42x"))     // digit+letter one token, X folded
    same(id, db, m("naïve"))
    same(id, db, m("nai*"))    // prefix under ascii
    same(id, db, m("naï*"))
    same(id, db, m("\"hello plain\""))
    same(id, db, "SELECT a, round(bm25(t), 6) FROM t WHERE t MATCH 'hello' " +
      "ORDER BY rank, a;")
    same(id, db, "SELECT highlight(t, 0, '[', ']') FROM t " +
      "WHERE t MATCH 'héllo' ORDER BY a;")
    same(id, db, "SELECT snippet(t, 0, '<', '>', '…', 3) FROM t " +
      "WHERE t MATCH 'cafe' ORDER BY a;")
  }

  test("porter ascii: stems over the ascii parent") {
    val (id, db) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, tokenize='porter ascii');",
      "INSERT INTO t VALUES ('running fast'), ('runs faster'), " +
        "('café runners'), ('he ran');")
    same(id, db, m("running")) // run* family stems together
    same(id, db, m("runs"))
    same(id, db, m("runner"))
    same(id, db, m("ran"))     // irregular: not stemmed to run
    same(id, db, m("café"))    // ascii parent keeps the accent
    same(id, db, m("cafe"))
  }

  // ---------------------------------------- tokenchars / separators

  test("unicode61 tokenchars: listed cps join runs; raw-cp check") {
    val (id, db) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"unicode61 tokenchars '-_'\");",
      "INSERT INTO t VALUES ('e-mail list'), ('email list'), " +
        "('snake_case code'), ('snake case code'), ('well-known fact'), " +
        "('-lead and trail- x');")
    same(id, db, m("\"e-mail\""))  // quoted: '-' is no bareword char
    same(id, db, m("email"))
    same(id, db, m("snake_case"))
    same(id, db, m("snake"))
    same(id, db, m("\"well-known\""))
    same(id, db, m("known"))      // no longer a token on its own
    same(id, db, m("lead"))       // leading '-' rides into the token
    same(id, db, m("trail"))
    same(id, db, m("\"e-mail\" OR snake_case"))
    same(id, db, "SELECT a, round(bm25(t), 6) FROM t " +
      "WHERE t MATCH '\"e-mail\"' " +
      "ORDER BY rank, a;")
    same(id, db, "SELECT highlight(t, 0, '[', ']') FROM t " +
      "WHERE t MATCH '\"well-known\"' ORDER BY a;")
  }

  test("unicode61 separators: listed cps split; raw cp, case-exact") {
    val (id, db) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"unicode61 separators 'X'\");",
      "INSERT INTO t VALUES ('aXb c'), ('axb c'), ('axB c'), ('ab c');")
    same(id, db, m("a"))    // aXb splits at the RAW X
    same(id, db, m("b"))
    same(id, db, m("axb"))  // lowercase x does NOT split (raw-cp check)
    same(id, db, m("ab"))
    same(id, db, m("axB"))  // ...and folding still lowercases for match
  }

  test("ascii tokenchars/separators apply too") {
    val (id, db) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"ascii tokenchars '-' separators 'z'\");",
      "INSERT INTO t VALUES ('e-mail azb'), ('email ab'), ('a b');")
    same(id, db, m("\"e-mail\""))
    same(id, db, m("a"))     // azb splits at z
    same(id, db, m("b"))
    same(id, db, m("azb"))
  }

  test("separators win when a char is listed in both") {
    val (id, db) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"unicode61 tokenchars 'X' separators 'X'\");",
      "INSERT INTO t VALUES ('aXb'), ('axb');")
    same(id, db, m("a"))
    same(id, db, m("axb"))
  }

  // --------------------------------------------- remove_diacritics

  test("unicode61 remove_diacritics 0 keeps accents; 2 strips like 1") {
    val (id0, db0) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize='unicode61 remove_diacritics 0');",
      "INSERT INTO t VALUES ('café au lait'), ('cafe au lait');")
    same(id0, db0, m("café"))
    same(id0, db0, m("cafe"))
    val (id2, db2) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize='unicode61 remove_diacritics 2');",
      "INSERT INTO t VALUES ('café au lait'), ('cafe au lait');")
    same(id2, db2, m("café"))
    same(id2, db2, m("cafe"))
  }

  // -------------------------------------------------- categories

  test("unicode61 categories replaces the default L* N* Co mask") {
    // letters only: digits become separators
    val (id, db) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"unicode61 categories 'L*'\");",
      "INSERT INTO t VALUES ('abc 123 x7y'), ('x y'), ('abc123');")
    same(id, db, m("abc"))
    same(id, db, m("x"))      // x7y splits at the digit
    same(id, db, m("y"))
    same(id, db, m("x7y"))    // no such token anymore
    // explicit default set behaves exactly like the default
    val (idD, dbD) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"unicode61 categories 'L* N* Co'\");",
      "INSERT INTO t VALUES ('abc 123 x7y café'), ('x y');")
    same(idD, dbD, m("x7y"))
    same(idD, dbD, m("123"))
    same(idD, dbD, m("cafe"))
    // punctuation as token chars: Pd keeps hyphens inside tokens
    val (idP, dbP) = both(
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"unicode61 categories 'L* N* Co Pd'\");",
      "INSERT INTO t VALUES ('e-mail list'), ('email list');")
    same(idP, dbP, m("\"e-mail\""))
    same(idP, dbP, m("email"))
  }

  // ------------------------------------------- constructor errors

  test("tokenizer constructor errors match real fts5's refusals") {
    def engineFails(schema: String): Unit = {
      val ex = intercept[Exception] {
        val id = seg(schema)
        engine.read(id, "SELECT 1;")
      }
      assert(ex.getMessage != null)
    }
    def cliFails(schema: String): Unit = {
      val db = Files.createTempFile("tokfts-err", ".db")
      Files.delete(db)
      assert(SqliteCli.run(db.toString, schema) != 0,
        s"real sqlite3 unexpectedly accepted: $schema")
    }
    for (bad <- Seq(
      // remove_diacritics is not an ascii argument
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize='ascii remove_diacritics 1');",
      // odd argument count
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize='unicode61 remove_diacritics');",
      // out-of-range remove_diacritics
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize='unicode61 remove_diacritics 3');",
      // unknown category
      "CREATE VIRTUAL TABLE t USING fts5(a, " +
        "tokenize=\"unicode61 categories 'Q*'\");",
      // unknown tokenizer
      "CREATE VIRTUAL TABLE t USING fts5(a, tokenize='snowball');"
    )) { cliFails(bad); engineFails(bad) }
  }

  // ------------------------------------------------------ fuzzer

  // the FtsSpec fuzzer shape over an ascii + tokenchars table: random
  // docs and random MATCH/bm25 queries must agree with real fts5
  for ((tokenize, tag) <- Seq(
    ("ascii", "ascii"),
    ("unicode61 tokenchars ''-''", "tokenchars"))) {
    test(s"fuzz: 120 random $tag queries agree with real fts5") {
      val schema =
        s"CREATE VIRTUAL TABLE t USING fts5(a, tokenize='$tokenize');"
      val id = seg(schema); val db = cliDb(schema)
      val rng = new scala.util.Random(20260815L)
      val vocab = Seq("alpha", "beta", "Alpha", "BETA", "café", "cafe",
        "e-mail", "email", "x-ray", "42x", "naïve", "naive", "mail")
      val docs = (1 to 40).map { i =>
        val words = Seq.fill(1 + rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))
        s"('${words.mkString(" ").replace("'", "''")}')"
      }
      runBoth(id, db, s"INSERT INTO t VALUES ${docs.mkString(", ")};")
      val qv = Seq("alpha", "beta", "café", "cafe", "e-mail", "email",
        "x-ray", "ray", "x", "42x", "naïve", "naive", "mail", "missing")
      // hyphenated words are no barewords (probed: bare e-mail is a
      // column-filter parse error in real fts5 too) — always quote
      def lit(w: String): String = if (w.contains("-")) "\"" + w + "\"" else w
      def term(): String = {
        val w = qv(rng.nextInt(qv.length))
        rng.nextInt(5) match {
          case 0 => lit(w.take(1 + rng.nextInt(w.length))) + "*"
          case 1 => "\"" + Seq.fill(1 + rng.nextInt(2))(
            qv(rng.nextInt(qv.length))).mkString(" ") + "\""
          case 2 => "^" + lit(w)
          case _ => lit(w)
        }
      }
      def expr(depth: Int): String =
        if (depth >= 2 || rng.nextInt(3) == 0) term()
        else rng.nextInt(5) match {
          case 0 => s"${expr(depth + 1)} AND ${expr(depth + 1)}"
          case 1 => s"${term()} OR ${term()}"
          case 2 => s"${expr(depth + 1)} NOT ${term()}"
          case 3 => s"(${term()} OR ${term()}) AND ${term()}"
          case _ => s"${term()} ${term()}"
        }
      (1 to 120).foreach { _ =>
        val q = expr(0).replace("'", "''")
        // %.4f bounds float-noise from differing accumulation order
        // and renders tiny idf-floor scores identically on both sides
        same(id, db,
          s"SELECT a, printf('%.4f', bm25(t)) FROM t WHERE t MATCH '$q' " +
            "ORDER BY a;")
      }
    }
  }

  // ------------------------------------------------ export round trip

  test("export: ascii-tokenized index reads back in real sqlite3") {
    val schema = "CREATE VIRTUAL TABLE t USING fts5(a, tokenize='ascii');"
    val id = seg(schema)
    engine.write(id,
      "INSERT INTO t VALUES ('Héllo world'), ('HELLO there'), " +
        "('café list'), ('cafe list');")
    val out = Files.createTempFile("tokfts-export", ".sqlite")
    Files.delete(out)
    store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString,
      "PRAGMA integrity_check;") == "ok")
    assert(SqliteCli.query(out.toString,
      "SELECT a FROM t WHERE t MATCH 'héllo' ORDER BY a;") ==
      "Héllo world")
    assert(SqliteCli.query(out.toString,
      "SELECT a FROM t WHERE t MATCH 'hello' ORDER BY a;") ==
      "HELLO there")
    assert(SqliteCli.query(out.toString,
      "SELECT a FROM t WHERE t MATCH 'cafe' ORDER BY a;") == "cafe list")
  }
}
