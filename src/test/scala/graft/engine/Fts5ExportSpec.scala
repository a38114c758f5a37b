package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** `.sqlite` EXPORT of segments holding FTS5 virtual tables
  * ([[SegmentStore.ftsExportTables]] + [[Fts5IndexBuilder]]),
  * validated by REAL sqlite3 on the exported bytes: the file passes
  * `PRAGMA integrity_check` AND fts5's own
  * `INSERT INTO t(t) VALUES('integrity-check')` (which recomputes the
  * index checksum from the content with libsqlite3's tokenizer — a
  * full differential over tokenization + index bytes), answers MATCH /
  * bm25 / highlight / snippet natively, and round-trips back through
  * [[SegmentStore.ingestSqliteSegment]]. The reference serves fts
  * through whatever libsqlite3 ships (trough/read.py:63-67), so an
  * exported segment must be searchable in such a deployment. */
class Fts5ExportSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-ftsexp").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"fx-$n"
    engine.schemas.put(s"fx-schema-$n", schema)
    engine.provisionWritable(id, s"fx-schema-$n")
    id
  }

  private def export(id: String): Path = {
    val out = Files.createTempDirectory("fts-export").resolve(s"$id.sqlite")
    store.exportSqliteSegment(id, out.toString)
    out
  }

  private def checkIntegrity(db: Path, fts: String): Unit = {
    assert(SqliteCli.query(db.toString, "PRAGMA integrity_check;") == "ok",
      "file-level integrity_check failed")
    assert(SqliteCli.run(db.toString,
      s"INSERT INTO $fts($fts) VALUES('integrity-check');") == 0,
      "fts5's own integrity-check rejected the exported index")
  }

  /** The engine's answer and real sqlite3's answer over the exported
    * file must agree (first column rendered, newline-joined). */
  private def same(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
    }.mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- exported file --\n$cliSide\n-- for --\n$select")
  }

  test("exported fts5 index is searchable and self-consistent") {
    val id = seg("CREATE VIRTUAL TABLE docs USING fts5(title, body);" +
      "CREATE TABLE plain (k INTEGER PRIMARY KEY, v TEXT);")
    engine.write(id,
      "INSERT INTO docs VALUES " +
        "('Greeting', 'hello world'), " +
        "('Farewell', 'goodbye cruel world'), " +
        "('Caps', 'HELLO THERE world'), " +
        "('Punct', 'don''t panic, HELLO-world!'), " +
        "('Accents', 'Ärger im Café'), " +
        "('Nulls', NULL), " +
        "('Phrase', 'the quick brown fox jumps');" +
        "INSERT INTO plain VALUES (1, 'x'), (2, 'y');")
    val db = export(id)
    checkIntegrity(db, "docs")
    for (q <- Seq("hello", "world NOT hello", "\"hello world\"", "hell*",
        "arger OR café", "body : quick", "NEAR(quick jumps, 5)",
        "don AND t", "missing"))
      same(id, db, "SELECT title FROM docs WHERE docs MATCH " +
        s"'${q.replace("'", "''")}' ORDER BY title;")
    same(id, db, "SELECT title, printf('%.6f', bm25(docs)) FROM docs " +
      "WHERE docs MATCH 'hello OR world' ORDER BY title;")
    same(id, db, "SELECT highlight(docs, 1, '[', ']') FROM docs " +
      "WHERE docs MATCH 'world' ORDER BY title;")
    same(id, db, "SELECT snippet(docs, -1, '[', ']', '...', 3) FROM docs " +
      "WHERE docs MATCH 'quick' ORDER BY title;")
    // the plain table rides along untouched
    same(id, db, "SELECT k, v FROM plain ORDER BY k;")
  }

  test("multi-page index: 400-row corpus, sorted-postings build") {
    val rng = new scala.util.Random(7L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    val rows = (1 to 400).map { i =>
      val words = Seq.fill(4 + rng.nextInt(10))(vocab(rng.nextInt(vocab.length)))
      s"('${words.mkString(" ")}')"
    }
    val id = seg("CREATE VIRTUAL TABLE d USING fts5(a);")
    engine.write(id, s"INSERT INTO d VALUES ${rows.mkString(", ")};")
    val db = export(id)
    checkIntegrity(db, "d")
    // the index spans several leaves: the _idx B-tree steers seeks
    val pages = SqliteCli.query(db.toString,
      "SELECT count(*) FROM d_data WHERE id > 100;").toInt
    assert(pages > 1, s"expected a multi-page segment, got $pages page(s)")
    for (q <- Seq("alpha", "alpha AND beta", "\"alpha beta\"", "thet*",
        "xi OR nu", "kappa NOT mu"))
      same(id, db,
        s"SELECT count(*) AS c FROM d WHERE d MATCH '$q';")
    same(id, db, "SELECT a FROM d WHERE d MATCH 'NEAR(alpha xi, 1)' ORDER BY a;")
  }

  test("UNINDEXED columns export: stored content, zero docsize, no postings") {
    val id = seg("CREATE VIRTUAL TABLE u USING fts5(a, m UNINDEXED);")
    engine.write(id, "INSERT INTO u VALUES " +
      "('hello world', 'meta data here'), ('second row', NULL);")
    val db = export(id)
    checkIntegrity(db, "u") // fts5 recomputes excluding unindexed cols
    same(id, db, "SELECT a, m FROM u WHERE u MATCH 'hello' ORDER BY a;")
    same(id, db, "SELECT a FROM u WHERE u MATCH 'meta' ORDER BY a;")
    same(id, db, "SELECT a, printf('%.6f', bm25(u)) FROM u " +
      "WHERE u MATCH 'hello OR second' ORDER BY a;")
    assert(SqliteCli.query(db.toString,
      "SELECT group_concat(hex(sz), ',') FROM u_docsize;") == "0200,0200")
  }

  test("prefix= indexes export and real sqlite3 seeks them") {
    val id = seg("CREATE VIRTUAL TABLE d USING fts5(a, b, prefix='2 3');")
    engine.write(id, "INSERT INTO d VALUES " +
      "('abc abd xe café ab x', 'zzz'), " +
      "('привет пока мир', NULL), " +
      "('abc abc прекрасно', 'abacus')," +
      "('unrelated words here', 'more filler');")
    val db = export(id)
    checkIntegrity(db, "d") // fts5 checksums prefix indexes too
    for (q <- Seq("ab*", "пр*", "caf*", "a*", "x*", "abc", "пок*", "zz*"))
      same(id, db, "SELECT count(*) AS c FROM d WHERE d MATCH " +
        s"'${q.replace("'", "''")}';")
    same(id, db, "SELECT a, printf('%.6f', bm25(d)) FROM d " +
      "WHERE d MATCH 'ab*' ORDER BY a;")
  }

  test("fuzz: random schemas, DML and unicode corpora export verified") {
    val rng = new scala.util.Random(20260814L)
    // deliberately hostile pool: case variants, diacritics (folded),
    // CJK (alphanumeric in unicode61), emoji + punctuation
    // (separators), digits, apostrophes, empty-ish strings
    val words = Seq("alpha", "Alpha", "ALPHA", "beta", "beta42", "42",
      "don't", "café", "Ärger", "naïve", "中文字", "汉字", "🚀🎉", "--!!--",
      "x", "xyzzy", "word.word", "a:b", "ünïcödé")
    def text(): String =
      if (rng.nextInt(12) == 0) ""
      else Seq.fill(1 + rng.nextInt(7))(words(rng.nextInt(words.length)))
        .mkString(" ")
    def lit(): String =
      if (rng.nextInt(10) == 0) "NULL"
      else s"'${text().replace("'", "''")}'"
    val matchPool = Seq("alpha", "beta", "42", "don", "t", "cafe", "arger",
      "naive", "中文字", "xyzzy", "word", "b", "unicode")
    for (i <- 1 to 8) {
      val nCols = 1 + rng.nextInt(2)
      val prefix =
        if (rng.nextInt(3) == 0) s", prefix='${1 + rng.nextInt(3)}'" else ""
      val colNames = (0 until nCols).map(j => s"c$j")
      val id = seg(s"CREATE VIRTUAL TABLE f USING " +
        s"fts5(${colNames.mkString(", ")}$prefix);")
      val script = new StringBuilder
      script ++= (1 to 6 + rng.nextInt(10)).map(_ =>
        s"INSERT INTO f VALUES (${colNames.map(_ => lit()).mkString(", ")});")
        .mkString
      if (rng.nextBoolean())
        script ++= s"UPDATE f SET c0 = ${lit()} WHERE c0 LIKE '%a%';"
      if (rng.nextBoolean())
        script ++= "DELETE FROM f WHERE c0 LIKE '%42%';"
      engine.write(id, script.toString)
      val db = export(id)
      checkIntegrity(db, "f")
      for (_ <- 1 to 6) {
        val w = matchPool(rng.nextInt(matchPool.length))
        val q = rng.nextInt(4) match {
          case 0 => s"${w.take(1 + rng.nextInt(w.length))}*"
          case 1 => s"$w OR ${matchPool(rng.nextInt(matchPool.length))}"
          case _ => w
        }
        try same(id, db, s"SELECT c0, printf('%.6f', bm25(f)) FROM f " +
          s"WHERE f MATCH '${q.replace("'", "''")}' ORDER BY 1, 2;")
        catch {
          case e: Throwable =>
            val content = SqliteCli.query(db.toString,
              "SELECT id, quote(c0)" +
                (if (nCols > 1) ", quote(c1)" else "") + " FROM f_content;")
            throw new AssertionError(
              s"[iter $i] corpus:\n$content\nscript: $script\n${e.getMessage}", e)
        }
      }
    }
  }

  test("empty fts table and ingest round trip") {
    val id = seg("CREATE VIRTUAL TABLE d USING fts5(a, b);")
    val db0 = export(id)
    checkIntegrity(db0, "d")
    assert(SqliteCli.query(db0.toString,
      "SELECT count(*) FROM d WHERE d MATCH 'x';") == "0")
    engine.write(id, "INSERT INTO d VALUES ('round trip', 'works fine'), " +
      "('second', NULL);")
    val db = export(id)
    checkIntegrity(db, "d")
    // real sqlite3 can keep WRITING the exported index (merges etc.)
    assert(SqliteCli.run(db.toString,
      "INSERT INTO d VALUES ('third row', 'via sqlite3'); " +
        "INSERT INTO d(d) VALUES('optimize'); " +
        "INSERT INTO d(d) VALUES('integrity-check');") == 0,
      "sqlite3 could not extend the exported index")
    assert(SqliteCli.query(db.toString,
      "SELECT count(*) FROM d WHERE d MATCH 'third';") == "1")
    // and the engine ingests the exported file back, searchable
    val back = s"fx-back-$n"
    store.ingestSqliteSegment(db.toString, back)
    val got = engine.read(back,
      "SELECT a FROM d WHERE d MATCH 'round' ORDER BY a;")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("round trip"))
    // …and an INGESTED fts segment re-exports without duplicating its
    // shadow tables as plain copies (r16: the export rebuilds %_content
    // etc. — the stale ingested plain tables must be skipped, else
    // sqlite3 sees a malformed schema)
    engine.provisionWritable(back)
    engine.write(back, "DELETE FROM d WHERE a = 'second';")
    val db2 = Files.createTempFile("fts-reexp", ".db")
    Files.delete(db2)
    store.exportSqliteSegment(back, db2.toString)
    checkIntegrity(db2, "d")
    assert(SqliteCli.query(db2.toString,
      "SELECT count(*) FROM d;") == "2")
    assert(SqliteCli.query(db2.toString,
      "SELECT a FROM d WHERE d MATCH 'round';") == "round trip")
  }
}
