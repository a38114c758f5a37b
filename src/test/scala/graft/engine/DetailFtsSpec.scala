package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** fts5 `detail=none` / `detail=column` (r13), DIFFERENTIAL against
  * the sandbox sqlite3. Probed: because this engine (like real fts5
  * when content is stored) re-derives instances from the row text,
  * bm25/rank and highlight/snippet score and render IDENTICALLY to
  * detail=full — the only observable differences are the query-shape
  * errors: multi-token and `^`-anchored phrases and NEAR raise
  * "fts5: phrase|NEAR queries are not supported (detail!=full)" on
  * both modes, and column filters (`col :` or a column-LHS MATCH)
  * raise "fts5: column queries are not supported (detail=none)" on
  * detail=none. Export refuses by name (position-less doclist
  * encodings). Reference basis: trough serves fts through libsqlite3
  * (read.py:63-67) and detail= is a standard fts5 option. */
class DetailFtsSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-detail").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"dt-$n"
    engine.schemas.put(s"dt-schema-$n", schema)
    engine.provisionWritable(id, s"dt-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("detail-cli", ".db")
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

  private def schemaOf(detail: String) =
    s"CREATE VIRTUAL TABLE docs USING fts5(title, body, detail=$detail);"
  private val fill =
    "INSERT INTO docs VALUES " +
      "('D1', 'hello world hello'), " +
      "('D2', 'world peace now'), " +
      "('D3', 'rare term here'), " +
      "('D4', 'plain filler text'), " +
      "('D5', 'hello. new sentence: here');"

  private def m(q: String): String =
    s"SELECT title FROM docs WHERE docs MATCH '${q.replace("'", "''")}' " +
      "ORDER BY title;"

  for (detail <- Seq("none", "column")) {
    test(s"detail=$detail: terms/prefix/AND/OR/NOT + scoring match full") {
      val id = seg(schemaOf(detail)); val db = cliDb(schemaOf(detail))
      runBoth(id, db, fill)
      same(id, db, m("hello"))
      same(id, db, m("hell*"))
      same(id, db, m("\"hello\""))      // single-token quoted is legal
      same(id, db, m("\"worl\"*"))
      same(id, db, m("hello AND world"))
      same(id, db, m("hello OR rare"))
      same(id, db, m("world NOT peace"))
      same(id, db, m("hello world"))    // implicit AND of single tokens
      same(id, db, m("missing"))
      // bm25/rank re-derive tf from content — scores equal real fts5
      for (q <- Seq("rare", "hello", "hello OR term", "world NOT now"))
        same(id, db, "SELECT title, printf('%.6f', bm25(docs)) FROM docs " +
          s"WHERE docs MATCH '$q' ORDER BY title;")
      same(id, db, "SELECT title, printf('%.6f', rank) FROM docs " +
        "WHERE docs MATCH 'hello' ORDER BY rank, title;")
      same(id, db, "SELECT title, printf('%.6f', bm25(docs, 2.0, 0.5)) " +
        "FROM docs WHERE docs MATCH 'hello' ORDER BY title;")
      // aux functions render instances recovered from the raw text
      for (q <- Seq("hello", "world OR rare"))
        same(id, db,
          "SELECT title, '<'||highlight(docs, 0, '[', ']')||'>', " +
            "'<'||snippet(docs, -1, '[', ']', '…', 3)||'>' FROM docs " +
            s"WHERE docs MATCH '$q' ORDER BY title;")
    }

    test(s"detail=$detail: phrase and NEAR queries raise the named error") {
      val id = seg(schemaOf(detail))
      engine.write(id, fill)
      for (q <- Seq("\"hello world\"", "^hello", "hello AND \"world peace\"",
          "NEAR(hello world, 3)")) {
        val e = intercept[Exception](engine.read(id, m(q)))
        assert(e.getMessage.contains("not supported (detail!=full)"),
          s"$q: ${e.getMessage}")
      }
    }
  }

  test("detail=none: column queries raise; detail=column serves them") {
    val idN = seg(schemaOf("none"))
    engine.write(idN, fill)
    for (q <- Seq("body : hello", "title : miss*")) {
      val e = intercept[Exception](engine.read(idN, m(q)))
      assert(e.getMessage.contains(
        "column queries are not supported (detail=none)"), s"$q: ${e.getMessage}")
    }
    // column-LHS MATCH is a column query too
    val e2 = intercept[Exception](engine.read(idN,
      "SELECT title FROM docs WHERE body MATCH 'hello' ORDER BY title;"))
    assert(e2.getMessage.contains(
      "column queries are not supported (detail=none)"), e2.getMessage)

    val sC = schemaOf("column")
    val idC = seg(sC); val dbC = cliDb(sC)
    runBoth(idC, dbC, fill)
    same(idC, dbC, m("body : hello"))
    same(idC, dbC, m("body : worl*"))
    same(idC, dbC,
      "SELECT title FROM docs WHERE body MATCH 'hello' ORDER BY title;")
    same(idC, dbC, "SELECT title, printf('%.6f', bm25(docs)) FROM docs " +
      "WHERE docs MATCH 'body : hello' ORDER BY title;")
  }

  test("detail=none/column export refuses by name") {
    val id = seg(schemaOf("none"))
    engine.write(id, fill)
    val out = Files.createTempDirectory("detail-export").resolve(s"$id.sqlite")
    val e = intercept[Exception](store.exportSqliteSegment(id, out.toString))
    assert(e.getMessage.contains("detail=none/column"), e.getMessage)
  }

  // differential fuzz over the LEGAL query surface (single-token
  // terms, prefixes, AND/OR/NOT chains; plus col filters on
  // detail=column), rotating plain/bm25/aux projections like FtsSpec
  for ((detail, seed) <- Seq(("none", 20260817L), ("column", 99260817L)))
    test(s"fuzz: 120 random detail=$detail queries agree with real fts5") {
      val s = schemaOf(detail)
      val id = seg(s); val db = cliDb(s)
      val rng = new scala.util.Random(seed)
      val vocab = Seq("alpha", "beta", "gamma", "delta", "Alpha", "BETA",
        "alphabet", "gambit", "café", "42", "beta.", "gamma:")
      val docs = (1 to 40).map { i =>
        val words = Seq.fill(1 + rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))
        s"('d$i', '${words.mkString(" ").replace("'", "''")}')"
      }
      runBoth(id, db, s"INSERT INTO docs VALUES ${docs.mkString(", ")};")
      val queryVocab = Seq("alpha", "beta", "gamma", "delta", "alphabet",
        "gambit", "cafe", "42", "missing")
      def term(): String = {
        val w = queryVocab(rng.nextInt(queryVocab.length))
        rng.nextInt(4) match {
          case 0 => w.take(1 + rng.nextInt(w.length)) + "*"
          case 1 if detail == "column" =>
            s"${Seq("title", "body")(rng.nextInt(2))} : $w"
          case _ => w
        }
      }
      def safeExpr(depth: Int): String =
        if (depth >= 2 || rng.nextInt(3) == 0) term()
        else rng.nextInt(5) match {
          case 0 => s"${safeExpr(depth + 1)} AND ${safeExpr(depth + 1)}"
          case 1 => s"${term()} OR ${term()}"
          case 2 => s"${safeExpr(depth + 1)} NOT ${term()}"
          case 3 => s"(${term()} OR ${term()}) AND ${term()}"
          case _ => s"${term()} ${term()}"
        }
      (1 to 120).foreach { i =>
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
