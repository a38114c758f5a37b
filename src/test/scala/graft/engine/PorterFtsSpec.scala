package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** fts5 `tokenize = 'porter'` (r12), DIFFERENTIAL against the sandbox
  * sqlite3's real porter tokenizer: the porter wrapper stems BOTH the
  * indexed row tokens and the query tokens (including the kept stem of
  * a trailing-`*` prefix), so morphological variants match each other.
  * Covers MATCH, bm25()/rank, highlight()/snippet() (markers land on
  * the RAW text while matching runs on stems), UNINDEXED interplay,
  * a fuzzer at two fresh seeds, and the `.sqlite` export round trip
  * (the exported index must hold STEMMED terms for real sqlite3's
  * query-side stemming to agree). The reference serves fts through
  * libsqlite3 (trough/read.py:63-67), where porter is a standard
  * tokenizer any ingested segment may declare. */
class PorterFtsSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-porter").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"pf-$n"
    engine.schemas.put(s"pf-schema-$n", schema)
    engine.provisionWritable(id, s"pf-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("porter-cli", ".db")
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
    "CREATE VIRTUAL TABLE docs USING fts5(title, body, tokenize='porter');"
  // morphological variants across the classic Porter rule steps
  private val fill =
    "INSERT INTO docs VALUES " +
      "('Run1', 'running quickly home'), " +
      "('Run2', 'he runs daily'), " +
      "('Run3', 'a good run'), " +
      "('Conn', 'connection connected connecting'), " +
      "('Pony', 'ponies and a pony'), " +
      "('Caress', 'caresses caressed'), " +
      "('Agree', 'agreed to proceed'), " +
      "('Relate', 'relational databases relate'), " +
      "('Happy', 'happily hopping cats'), " +
      "('Accents', 'Ärgerliche motoring im Café'), " +
      "('Mixed', 'the quick brown foxes jumped');"

  private def m(q: String): String =
    s"SELECT title FROM docs WHERE docs MATCH '${q.replace("'", "''")}' " +
      "ORDER BY title;"

  test("MATCH stems both sides like real porter") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("run"))          // hits running/runs/run
    same(id, db, m("running"))      // query side stems to run too
    same(id, db, m("connect"))
    same(id, db, m("connections"))
    same(id, db, m("pony"))         // ponies → poni, pony → poni
    same(id, db, m("caress"))
    same(id, db, m("relate AND database"))
    same(id, db, m("happy OR agree"))
    same(id, db, m("\"running quick\"")) // phrase of stems
    same(id, db, m("NEAR(quick home, 3)"))
    same(id, db, m("body : fox"))
    same(id, db, m("^connect"))     // anchored stem
    same(id, db, m("cafe"))         // diacritics fold before stemming
    same(id, db, m("missing"))
  }

  test("prefix queries stem the kept portion (runn* misses, run* hits)") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, m("run*"))
    same(id, db, m("runn*"))   // stem('runn') = runn — no 'run...' doc term
    same(id, db, m("connect*"))
    same(id, db, m("conn*"))
    same(id, db, m("p*"))
  }

  test("bm25()/rank over porter tables score on stemmed terms") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    for (q <- Seq("run", "running", "run OR pony", "body : connect",
        "\"running quick\""))
      same(id, db, "SELECT title, printf('%.6f', bm25(docs)) FROM docs " +
        s"WHERE docs MATCH '$q' ORDER BY title;")
    same(id, db, "SELECT title, printf('%.6f', rank) FROM docs " +
      "WHERE docs MATCH 'runs' ORDER BY rank, title;")
  }

  test("highlight()/snippet() mark raw text while matching stems") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    for (q <- Seq("run", "connect", "pony AND caress OR run"))
      same(id, db,
        "SELECT title, '<'||highlight(docs, 1, '[', ']')||'>', " +
          "'<'||snippet(docs, 1, '[', ']', '…', 3)||'>' FROM docs " +
          s"WHERE docs MATCH '$q' ORDER BY title;")
  }

  test("porter + UNINDEXED columns compose") {
    val s = "CREATE VIRTUAL TABLE u USING fts5(a, b UNINDEXED, " +
      "tokenize='porter');"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, "INSERT INTO u VALUES " +
      "('running fast', 'jumping high'), ('jumping low', 'running slow');")
    same(id, db, "SELECT a, b FROM u WHERE u MATCH 'run' ORDER BY a;")
    same(id, db, "SELECT a, b FROM u WHERE u MATCH 'jumps' ORDER BY a;")
    same(id, db, "SELECT a FROM u WHERE u MATCH 'b : run' ORDER BY a;")
    same(id, db, "SELECT a, printf('%.6f', bm25(u)) FROM u " +
      "WHERE u MATCH 'run OR jump' ORDER BY a;")
  }

  test("exported .sqlite index holds stemmed terms real sqlite3 can MATCH") {
    val id = seg(schema)
    engine.write(id, fill)
    val out = Files.createTempDirectory("porter-export")
      .resolve(s"$id.sqlite")
    store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    // fts5's own checksum recomputes the index with ITS porter
    // tokenizer — a full differential over stemming + index bytes
    assert(SqliteCli.run(out.toString,
      "INSERT INTO docs(docs) VALUES('integrity-check');") == 0,
      "fts5's integrity-check rejected the exported porter index")
    for (q <- Seq("run", "running", "connect*", "pony", "missing",
        "\"running quick\"", "body : fox")) {
      val select = m(q)
      val engineSide = engine.read(id, select).collect()
        .map(_.getString(0)).mkString("\n")
      val cliSide = SqliteCli.query(out.toString, select)
      assert(engineSide == cliSide,
        s"\n-- engine --\n$engineSide\n-- exported --\n$cliSide\n-- $q")
    }
  }

  // the FtsSpec fuzzer shape over a stem-colliding vocabulary, at two
  // fresh seeds (r12): random docs + random MATCH/bm25/aux queries
  // must agree with real porter fts5
  for (seed <- Seq(20260815L, 99260815L))
    test(s"fuzz: 150 random porter queries agree with real fts5 (seed $seed)") {
      val id = seg(schema); val db = cliDb(schema)
      val rng = new scala.util.Random(seed)
      val vocab = Seq("running", "runs", "ran", "runner", "connection",
        "connected", "ponies", "pony", "caresses", "happily", "Happy",
        "agreed", "AGREES", "relational", "relate", "motoring", "cats",
        "sized", "hopping", "falling", "fizzed", "café", "42", "don't",
        "running.", "ponies:")
      val docs = (1 to 40).map { i =>
        val words = Seq.fill(1 + rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))
        s"('d$i', '${words.mkString(" ").replace("'", "''")}')"
      }
      runBoth(id, db, s"INSERT INTO docs VALUES ${docs.mkString(", ")};")
      val queryVocab = Seq("run", "running", "runner", "connect",
        "connections", "pony", "ponies", "caress", "happy", "happily",
        "agree", "relate", "motor", "cat", "size", "hop", "fall", "fizz",
        "cafe", "42", "don", "missing")
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
        case 0 => "^" + bareTerm()
        case 1 =>
          val members = Seq.fill(2 + rng.nextInt(2))(bareTerm()).mkString(" ")
          if (rng.nextBoolean()) s"NEAR($members, ${rng.nextInt(5)})"
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
