package graft.engine

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** [[Porter.stem]] DIFFERENTIAL against real fts5's porter tokenizer
  * (no Spark needed): each word goes in as its own row of a
  * `tokenize='porter'` table in the sandbox sqlite3, and the
  * `fts5vocab(…, 'instance')` virtual table reads back (rowid → term)
  * — the exact stem porter.c produced for that word. Covers the
  * published rule steps, the fts5 departures the scaladoc pins, the
  * in-place step-1c edge (pony→poni — r12 regression: a same-length
  * stem was returned unstemmed), and 500 fuzzed letter/digit words. */
class PorterStemSpec extends AnyFunSuite {

  /** word(i) inserted at rowid i+1; returns porter.c's stem per word. */
  private def realStems(words: Seq[String]): Seq[String] = {
    val db = Files.createTempFile("porter-vocab", ".db")
    Files.delete(db)
    val script = new StringBuilder
    script ++= "CREATE VIRTUAL TABLE t USING fts5(a, tokenize='porter');\n"
    words.zipWithIndex.foreach { case (w, i) =>
      script ++= s"INSERT INTO t(rowid, a) VALUES (${i + 1}, '$w');\n"
    }
    script ++= "CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance');\n"
    assert(SqliteCli.run(db.toString, script.toString) == 0)
    val out = SqliteCli.query(db.toString,
      "SELECT doc, term FROM v ORDER BY doc;")
    val byDoc = out.split("\n").filter(_.nonEmpty).map { line =>
      val Array(doc, term) = line.split("\\|", 2)
      doc.toLong -> term
    }.toMap
    Files.deleteIfExists(db)
    words.indices.map(i => byDoc(i + 1L))
  }

  private def check(words: Seq[String]): Unit = {
    val real = realStems(words)
    val mismatches = words.zip(real).collect {
      case (w, r) if Porter.stem(w) != r => s"$w: engine=${Porter.stem(w)} real=$r"
    }
    assert(mismatches.isEmpty, s"\n${mismatches.mkString("\n")}")
  }

  test("published rule steps and fts5 departures match porter.c") {
    check(Seq(
      // step 1a
      "caresses", "ponies", "ties", "caress", "cats",
      // step 1b + cleanup
      "feed", "agreed", "plastered", "bled", "motoring", "sing",
      "conflated", "troubled", "sized", "hopping", "tanned", "falling",
      "hissing", "fizzed", "failing", "filing",
      // step 1c in-place y→i (the r12 regression class)
      "happy", "sky", "pony", "crying", "cried", "enjoy", "say", "try",
      // step 2
      "relational", "conditional", "rational", "valenci", "hesitanci",
      "digitizer", "conformabli", "radicalli", "differentli", "vileli",
      "analogousli", "vietnamization", "predication", "operator",
      "feudalism", "decisiveness", "hopefulness", "callousness",
      "formaliti", "sensitiviti", "sensibiliti", "possibli", "analogi",
      "geologi",
      // step 3
      "triplicate", "formative", "formalize", "electriciti", "electrical",
      "hopeful", "goodness",
      // step 4
      "revival", "allowance", "inference", "airliner", "gyroscopic",
      "adjustable", "defensible", "irritant", "replacement", "adjustment",
      "dependent", "adoption", "homologou", "communism", "activate",
      "angulariti", "homologous", "effective", "bowdlerize",
      // step 5
      "probate", "rate", "cease", "controll", "roll",
      // digits count as consonants
      "2dogs", "x9ing", "42", "a1b2c3"))
  }

  for (seed <- Seq(20260815L, 77711L))
  test(s"500 fuzzed words match porter.c (seed $seed)") {
    val rng = new scala.util.Random(seed)
    val letters = "abcdefghijklmnopqrstuvwxyz0123456789"
    val vowelish = "aeiouy"
    val sufs = Seq("s", "es", "ies", "ed", "eed", "ing", "y", "ational",
      "tional", "enci", "izer", "bli", "alli", "ization", "ator", "ful",
      "ness", "icate", "ative", "al", "ance", "er", "ion", "ement", "e",
      "ll", "iti", "ous", "ive", "ize", "")
    val words = Seq.fill(500) {
      val stemLen = rng.nextInt(7) // 0 = the bare suffix itself
      val stem = Seq.fill(stemLen)(
        if (rng.nextBoolean()) vowelish(rng.nextInt(vowelish.length))
        else letters(rng.nextInt(letters.length))).mkString
      stem + sufs(rng.nextInt(sufs.length))
    }.distinct.filter(_.nonEmpty)
    check(words)
  }

  test("tokens longer than 64 bytes pass through unchanged") {
    check(Seq("a" * 70 + "ing", "b" * 64, "relation" * 9))
  }
}
