package graft.engine

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** [[Fts5IndexBuilder]] DIFFERENTIAL against real fts5's own index: a
  * corpus is inserted into a real fts5 table twice — once untouched,
  * once with the `%_data`/`%_idx` shadows REPLACED by this builder's
  * bytes (`.dbconfig defensive off` unlocks shadow writes). Real
  * sqlite3 must then answer MATCH / bm25 / highlight queries
  * identically on both files and pass fts5's own integrity-check over
  * the replaced index. This validates every byte shape the builder
  * emits (leaf headers, prefix compression, pgidx footers, doclist
  * deltas, poslist encoding, averages, structure, idx keys) without
  * involving the export path. */
class Fts5IndexBuilderSpec extends AnyFunSuite {

  private def tmp(name: String): Path = {
    val p = Files.createTempFile(s"fts5-bld-$name", ".db")
    Files.delete(p)
    p
  }

  private def sqlEscape(s: String) = s.replace("'", "''")

  /** Build the index for `rows` (seq of column values, null allowed)
    * with the engine tokenizer and return the shadow-rewrite SQL.
    * `prefixes` = declared prefix= lengths in declaration order
    * (index ids '1'…), matching what the table was created with. */
  private def rebuildSql(table: String, nCols: Int,
      rows: Seq[Seq[String]], pgsz: Int,
      prefixes: Seq[Int] = Nil): String = {
    // (id-prefixed term -> rowid -> positions) via the engine tokenizer
    val inverted = mutable.TreeMap[String, mutable.TreeMap[Long, mutable.ArrayBuffer[(Int, Int)]]]()
    val colTotals = Array.fill(nCols)(0L)
    rows.zipWithIndex.foreach { case (r, i) =>
      val rowid = i + 1L
      r.zipWithIndex.foreach { case (text, c) =>
        if (text != null) {
          val toks = Fts5.tokenize(text)
          colTotals(c) += toks.length
          toks.zipWithIndex.foreach { case (t, pos) =>
            def put(term: String): Unit =
              inverted.getOrElseUpdate(term, mutable.TreeMap())
                .getOrElseUpdate(rowid, mutable.ArrayBuffer()) += ((c, pos))
            put("0" + t)
            prefixes.zipWithIndex.foreach { case (len, pi) =>
              if (t.codePointCount(0, t.length) >= len)
                put(('1' + pi).toChar.toString +
                  t.substring(0, t.offsetByCodePoints(0, len)))
            }
          }
        }
      }
    }
    val b = new Fts5IndexBuilder(pgsz)
    try {
      // TreeMap[String] sorts by UTF-16 compareTo; fts5 needs UTF-8
      // byte order — re-sort the keys by bytes (diverges above U+FFFF)
      val termsSorted = inverted.keys.toSeq
        .map(t => (t.getBytes("UTF-8"), t))
        .sortWith((a, b) => java.util.Arrays.compareUnsigned(a._1, b._1) < 0)
      termsSorted.foreach { case (bytes, t) =>
        inverted(t).foreach { case (rowid, entries) =>
          b.add(bytes, rowid,
            Fts5IndexBuilder.poslist(entries.toSeq.sorted.distinct))
        }
      }
      val res = b.finish(rows.length.toLong, colTotals.toSeq)
      val sb = new StringBuilder
      sb.append(s"DELETE FROM ${table}_data;\nDELETE FROM ${table}_idx;\n")
      res.dataRows.foreach { case (id, bytes) =>
        val hex = bytes.map("%02X".format(_)).mkString
        sb.append(s"INSERT INTO ${table}_data VALUES ($id, X'$hex');\n")
      }
      res.idxRows.foreach { row =>
        val term = row(1).asInstanceOf[Array[Byte]].map("%02X".format(_)).mkString
        sb.append(
          s"INSERT INTO ${table}_idx VALUES (${row(0)}, X'$term', ${row(2)});\n")
      }
      sb.toString
    } finally b.close()
  }

  /** Create twin dbs, replace the index in one, and compare `queries`
    * plus integrity-check. */
  private def check(nCols: Int, rows: Seq[Seq[String]], queries: Seq[String],
      pgsz: Int = 4000, prefixes: Seq[Int] = Nil): Unit = {
    val cols = (0 until nCols).map(i => s"c$i").mkString(", ") +
      (if (prefixes.isEmpty) ""
      else s", prefix='${prefixes.mkString(" ")}'")
    val inserts = rows.map(r => r.map(v =>
      if (v == null) "NULL" else s"'${sqlEscape(v)}'").mkString("(", ", ", ")"))
    val fill =
      if (rows.isEmpty) ""
      else s"INSERT INTO t VALUES ${inserts.mkString(", ")};"
    val orig = tmp("orig"); val rebuilt = tmp("rebuilt")
    assert(SqliteCli.run(orig.toString,
      s"CREATE VIRTUAL TABLE t USING fts5($cols);\n$fill") == 0)
    assert(SqliteCli.run(rebuilt.toString,
      s"CREATE VIRTUAL TABLE t USING fts5($cols);\n$fill") == 0)
    val rewrite = rebuildSql("t", nCols, rows, pgsz, prefixes)
    assert(SqliteCli.run(rebuilt.toString,
      s".dbconfig defensive off\n$rewrite") == 0, "shadow rewrite failed")
    // fts5's own consistency check over OUR index bytes
    assert(SqliteCli.run(rebuilt.toString,
      "INSERT INTO t(t) VALUES('integrity-check');") == 0,
      "fts5 integrity-check rejected the rebuilt index")
    queries.foreach { q =>
      val a = SqliteCli.query(orig.toString, q)
      val b = SqliteCli.query(rebuilt.toString, q)
      assert(a == b, s"\n-- original --\n$a\n-- rebuilt --\n$b\n-- for --\n$q")
    }
    Files.deleteIfExists(orig); Files.deleteIfExists(rebuilt)
  }

  private val basicQueries = Seq(
    "SELECT rowid FROM t WHERE t MATCH 'hello' ORDER BY rowid;",
    "SELECT rowid FROM t WHERE t MATCH 'hello world' ORDER BY rowid;",
    "SELECT rowid FROM t WHERE t MATCH '\"hello world\"' ORDER BY rowid;",
    "SELECT rowid FROM t WHERE t MATCH 'hell*' ORDER BY rowid;",
    "SELECT rowid FROM t WHERE t MATCH 'c0 : hello' ORDER BY rowid;",
    "SELECT rowid FROM t WHERE t MATCH 'world NOT hello' ORDER BY rowid;",
    "SELECT rowid FROM t WHERE t MATCH 'NEAR(hello world, 3)' ORDER BY rowid;",
    "SELECT rowid, printf('%.6f', bm25(t)) FROM t WHERE t MATCH 'hello OR world' ORDER BY rowid;",
    "SELECT highlight(t, 0, '[', ']') FROM t WHERE t MATCH 'world' ORDER BY rowid;",
    "SELECT snippet(t, -1, '[', ']', '...', 4) FROM t WHERE t MATCH 'world' ORDER BY rowid;")

  test("two-column corpus with NULLs, case folding, diacritics") {
    check(2, Seq(
      Seq("hello world", "goodbye world"),
      Seq("hello there", null),
      Seq("HELLO-world! don't", "Ärger im Café"),
      Seq(null, null),
      Seq("the quick brown fox jumps over the lazy dog", "hello hello hello"),
      Seq("wörld würld", "42 of fts5")),
      basicQueries ++ Seq(
        "SELECT rowid FROM t WHERE t MATCH 'arger OR café' ORDER BY rowid;",
        "SELECT rowid FROM t WHERE t MATCH 'don AND t' ORDER BY rowid;",
        "SELECT rowid FROM t WHERE t MATCH '42' ORDER BY rowid;"))
  }

  test("empty table and tokenless rows") {
    check(1, Nil, Seq("SELECT rowid FROM t WHERE t MATCH 'x';"))
    check(1, Seq(Seq(null), Seq("...!!!"), Seq("")),
      Seq("SELECT rowid FROM t WHERE t MATCH 'x';",
        "SELECT count(*) FROM t;"))
  }

  test("multi-page segment at pgsz=64: term splits, doclist continuation") {
    val rng = new scala.util.Random(42)
    val vocab = Seq("apple", "banana", "cherry", "date", "egg", "fig",
      "grape", "kiwi", "lemon", "mango", "zebra")
    val rows = (1 to 60).map { _ =>
      Seq(Seq.fill(3 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length)))
        .mkString(" "))
    }
    check(1, rows, Seq(
      "SELECT rowid FROM t WHERE t MATCH 'zebra' ORDER BY rowid;",
      "SELECT rowid FROM t WHERE t MATCH 'apple AND banana' ORDER BY rowid;",
      "SELECT rowid FROM t WHERE t MATCH '\"apple banana\"' ORDER BY rowid;",
      "SELECT rowid, printf('%.6f', bm25(t)) FROM t WHERE t MATCH 'kiwi OR lemon' ORDER BY rowid;",
      "SELECT rowid FROM t WHERE t MATCH 'gr*' ORDER BY rowid;",
      "SELECT count(*) FROM t WHERE t MATCH 'mango';"), pgsz = 64)
  }

  test("single giant poslist splits across pages (szLeaf bound)") {
    // one term repeated enough that its single-row poslist plus the
    // doclist dwarfs pgsz — exercises the continuation-page pour
    val big = Seq.fill(400)("same").mkString(" ")
    val rows = Seq(Seq(big), Seq("same other"), Seq(big))
    check(1, rows, Seq(
      "SELECT rowid FROM t WHERE t MATCH 'same' ORDER BY rowid;",
      "SELECT rowid FROM t WHERE t MATCH '\"same same\"' ORDER BY rowid;",
      "SELECT rowid, printf('%.6f', bm25(t)) FROM t WHERE t MATCH 'same' ORDER BY rowid;",
      "SELECT rowid FROM t WHERE t MATCH 'other' ORDER BY rowid;"),
      pgsz = 64)
  }

  test("prefix= indexes: chars not bytes, merged doclists, decl order") {
    val rows = Seq(
      Seq("abc abd xe café ab x"),
      Seq("привет пока мир"),
      Seq("abc abc abc прекрасно"),
      Seq(null))
    val queries = Seq("ab*", "пр*", "caf*", "a*", "x*", "abc", "пок*")
      .map(q => s"SELECT rowid FROM t WHERE t MATCH '$q' ORDER BY rowid;") ++ Seq(
      "SELECT rowid, printf('%.6f', bm25(t)) FROM t WHERE t MATCH 'ab*' ORDER BY rowid;",
      "SELECT highlight(t, 0, '[', ']') FROM t WHERE t MATCH 'пр*' ORDER BY rowid;")
    // declaration order defines index ids; '3 2' exercises unsorted
    check(1, rows, queries, prefixes = Seq(2))
    check(1, rows, queries, prefixes = Seq(3, 2))
    check(1, rows, queries, pgsz = 64, prefixes = Seq(2, 3))
  }

  test("fuzz: 200-row corpus, index answers every query like fts5's own") {
    val rng = new scala.util.Random(20260814L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "Alpha", "BETA",
      "alphabet", "gambit", "café", "42", "don't", "omega")
    val rows = (1 to 200).map { _ =>
      Seq(
        Seq.fill(1 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length))).mkString(" "),
        if (rng.nextInt(5) == 0) null
        else Seq.fill(1 + rng.nextInt(4))(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val queries = Seq("alpha", "beta AND gamma", "alph*", "\"alpha beta\"",
      "c1 : omega", "NEAR(alpha beta, 2)", "gambit OR omega",
      "alpha NOT beta", "don AND t", "cafe")
      .map(q => s"SELECT rowid FROM t WHERE t MATCH '${sqlEscape(q)}' ORDER BY rowid;") ++ Seq(
      "SELECT rowid, printf('%.6f', bm25(t)) FROM t WHERE t MATCH 'omega OR gambit' ORDER BY rowid;",
      "SELECT snippet(t, -1, '[', ']', '…', 5) FROM t WHERE t MATCH 'omega' ORDER BY rowid;")
    check(2, rows, queries, pgsz = 1000)
  }
}
