package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** DIFFERENTIAL FUZZER for the scalar dialect: generates random SQLite
  * expressions from the supported surface (arithmetic, strings,
  * conditionals, the compat function family) and asserts that
  * `SELECT quote(expr)` answers byte-identically through the engine's
  * dialect session and the sandbox's real `sqlite3`.
  *
  * The generator deliberately stays on the TYPED domain — SQLite's
  * dynamic cross-type comparisons (`1 < 'a'` is always true by storage
  * class ordering, datatype3.html §4.1) can't be expressed over Spark's
  * static types and are a documented deviation, so int compares int,
  * text compares text. Seeded RNG keeps failures reproducible; bump
  * `COUNT` locally for a deeper sweep.
  */
class SqliteExprFuzzSpec extends SparkSpecBase {

  private lazy val sess = {
    val s = spark.newSession()
    SqliteCompat.register(s)
    s
  }

  // -Dgraft.fuzz.count=2000 -Dgraft.fuzz.seed=... for a local deep sweep
  private val COUNT = sys.props.get("graft.fuzz.count").map(_.toInt).getOrElse(400)
  private val SEED = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260813L)
  private val rng = new scala.util.Random(SEED)

  private def intLit: String = {
    val v = rng.nextInt(2001) - 1000
    if (v < 0) s"($v)" else v.toString
  }

  private def strLit: String = {
    val chars = "abcXYZ012 %_*#"
    val n = rng.nextInt(6)
    val s = Seq.fill(n)(chars(rng.nextInt(chars.length))).mkString
    "'" + s + "'"
  }

  /** An integer-valued expression of the given depth budget. */
  private def intExpr(d: Int): String =
    if (d <= 0) { if (rng.nextInt(10) == 0) "NULL" else intLit }
    else rng.nextInt(12) match {
      case 0 => s"(${intExpr(d - 1)} + ${intExpr(d - 1)})"
      case 1 => s"(${intExpr(d - 1)} - ${intExpr(d - 1)})"
      case 2 => s"(${intExpr(d - 1)} * ${intExpr(d - 1)})"
      case 3 => s"(${intExpr(d - 1)} / ${intExpr(d - 1)})" // truncating; /0 → NULL
      case 4 => s"(${intExpr(d - 1)} % ${intExpr(d - 1)})"
      case 5 => s"abs(${intExpr(d - 1)})"
      case 6 => s"sign(${intExpr(d - 1)})"
      case 7 => s"min(${intExpr(d - 1)}, ${intExpr(d - 1)})"
      case 8 => s"max(${intExpr(d - 1)}, ${intExpr(d - 1)})"
      case 9 => s"length(${strExpr(d - 1)})"
      case 10 => s"instr(${strExpr(d - 1)}, ${strExpr(d - 1)})"
      case 11 => s"iif(${boolExpr(d - 1)}, ${intExpr(d - 1)}, ${intExpr(d - 1)})"
    }

  /** A text-valued expression of the given depth budget. */
  private def strExpr(d: Int): String =
    if (d <= 0) { if (rng.nextInt(10) == 0) "NULL" else strLit }
    else rng.nextInt(12) match {
      case 0 => s"upper(${strExpr(d - 1)})"
      case 1 => s"lower(${strExpr(d - 1)})"
      case 2 => s"trim(${strExpr(d - 1)})"
      case 3 => s"ltrim(${strExpr(d - 1)})"
      case 4 => s"rtrim(${strExpr(d - 1)})"
      case 5 => s"substr(${strExpr(d - 1)}, ${intExpr(0)})"
      case 6 => s"substr(${strExpr(d - 1)}, ${intExpr(0)}, ${intExpr(0)})"
      case 7 => s"replace(${strExpr(d - 1)}, ${strExpr(0)}, ${strExpr(0)})"
      case 8 => s"(${strExpr(d - 1)} || ${strExpr(d - 1)})"
      case 9 => s"(${strExpr(d - 1)} || ${intExpr(d - 1)})" // numeric coerces to text
      case 10 => s"hex(${strExpr(d - 1)})"
      case 11 => s"iif(${boolExpr(d - 1)}, ${strExpr(d - 1)}, ${strExpr(d - 1)})"
    }

  /** A boolean-valued expression (same-type comparisons only). In
    * SQLite these are INTEGER 0/1 values, so [[anyExpr]] also emits
    * them in VALUE positions — the BoolNormalizer surface. */
  private def boolExpr(d: Int): String = {
    val cmp = Seq("=", "<>", "<", "<=", ">", ">=")(rng.nextInt(6))
    rng.nextInt(10) match {
      case 0 => s"(${intExpr(math.max(d - 1, 0))} $cmp ${intExpr(math.max(d - 1, 0))})"
      case 1 =>
        // sometimes under a collation (NOCASE folds ASCII case, RTRIM
        // ignores trailing spaces, BINARY is explicit default)
        val coll = rng.nextInt(4) match {
          case 0 => " COLLATE NOCASE"
          case 1 => " COLLATE RTRIM"
          case 2 => " COLLATE BINARY"
          case _ => ""
        }
        s"(${strExpr(math.max(d - 1, 0))} $cmp ${strExpr(math.max(d - 1, 0))}$coll)"
      case 2 => s"(${strExpr(0)} LIKE ${strLit})"
      case 3 => s"(${strExpr(0)} GLOB ${strLit})"
      case 4 if d > 0 => s"(${boolExpr(d - 1)} AND ${boolExpr(d - 1)})"
      case 5 if d > 0 => s"(${boolExpr(d - 1)} OR ${boolExpr(d - 1)})"
      case 6 if d > 0 => s"(NOT ${boolExpr(d - 1)})"
      case 7 => s"(${intExpr(0)} BETWEEN ${intExpr(0)} AND ${intExpr(0)})"
      case 8 => s"(${intExpr(0)} IN (${intExpr(0)}, ${intExpr(0)}, ${intExpr(0)}))"
      case _ => s"(${intExpr(0)} IS ${if (rng.nextBoolean()) "" else "NOT "}NULL)"
    }
  }

  // ---- blobs: literals, text→blob casts, hex/quote/length over them

  private def blobLit: String =
    "X'" + Seq.fill(rng.nextInt(5))(f"${rng.nextInt(256)}%02X").mkString + "'"

  private def blobExpr(d: Int): String =
    if (d <= 0) blobLit
    else rng.nextInt(3) match {
      case 0 => blobLit
      case 1 => s"CAST(${strExpr(d - 1)} AS BLOB)"
      case 2 => s"iif(${boolExpr(d - 1)}, ${blobExpr(d - 1)}, ${blobExpr(d - 1)})"
    }

  // ---- CAST through SQLite's type-name→affinity rules (§3.1)

  private def castExpr(d: Int): String = {
    val src = rng.nextInt(3) match {
      case 0 => intExpr(d)
      case 1 => strExpr(d)
      case 2 => s"'${rng.nextInt(2000) - 1000}${Seq("", ".5", "e2", "x", " ")(rng.nextInt(5))}'"
    }
    // NUMERIC-affinity targets fold text to INTEGER when the REAL→INT
    // conversion is lossless — a per-VALUE storage class one static
    // Spark column type can't express (documented deviation in
    // SqliteCompat: NUMERIC renders REAL here), so the generator keeps
    // to the affinities with exact parity
    val ty = Seq("INTEGER", "REAL", "TEXT", "BLOB",
      "VARCHAR(4)", "UNSIGNED BIG INT", "FLOATING POINT")(rng.nextInt(7))
    s"CAST($src AS $ty)"
  }

  // ---- date/time family with modifiers (valid calendar dates only:
  // SQLite accepts '2023-02-29' unvalidated, a documented deviation)

  private def dateLit: String =
    f"${1990 + rng.nextInt(40)}%04d-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d"
  private def timeLit: String =
    f"${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d"

  private def dtModifier: String = rng.nextInt(8) match {
    case 0 => s"'${rng.nextInt(200) - 100} days'"
    case 1 => s"'${rng.nextInt(48) - 24} hours'"
    case 2 => s"'${rng.nextInt(120) - 60} minutes'"
    case 3 => s"'${rng.nextInt(25) - 12} months'"
    case 4 => s"'${rng.nextInt(10) - 5} years'"
    case 5 => "'start of day'"
    case 6 => "'start of month'"
    case 7 => s"'weekday ${rng.nextInt(7)}'"
  }

  private def dtExpr(): String = {
    val base = rng.nextInt(3) match {
      case 0 => s"'$dateLit'"
      case 1 => s"'$dateLit $timeLit'"
      case 2 => s"'$timeLit'"
    }
    val mods = Seq.fill(rng.nextInt(3))(dtModifier)
    rng.nextInt(4) match {
      case 0 => (base +: mods).mkString("datetime(", ", ", ")")
      case 1 => (base +: mods).mkString("date(", ", ", ")")
      case 2 => (base +: mods).mkString("time(", ", ", ")")
      case 3 =>
        val fmt = Seq.fill(1 + rng.nextInt(3))(
          Seq("%Y", "%m", "%d", "%H", "%M", "%S", "%j", "%s", "%w", "%W", "%%")(
            rng.nextInt(11))).mkString(" ")
        (s"'$fmt'" +: base +: mods).mkString("strftime(", ", ", ")")
    }
  }

  // ---- json1 names with exact cross-engine typing (single-path
  // scalar json_extract is the documented TEXT-typed deviation, so the
  // generator sticks to the operators/functions with full parity)

  private def jsonDoc: String = Seq(
    """'{"a":1,"b":{"c":"x","d":[1,2,3]},"e":null}'""",
    """'[1,"two",3.5,null,{"f":0}]'""",
    """'{"g":[true,false],"h":"i"}'""")(rng.nextInt(3))

  private def jsonPath: String = Seq("$.a", "$.b.c", "$.b.d[1]", "$[0]",
    "$[4].f", "$.e", "$.g[1]", "$.missing", "$")(rng.nextInt(9))

  /** `->>` answers the SQL-typed value in SQLite (integer 2 for
    * `'[1,2]' ->> '$[1]'`) where this engine's static columns answer
    * TEXT — the same documented deviation as scalar json_extract — so
    * its paths stick to text / null / object / array targets, where
    * the two agree byte-for-byte. `->` always answers JSON text, full
    * parity, so it fuzzes over every path. */
  private def arrowSafePath: String = Seq("$.b.c", "$.e", "$.missing",
    "$.b", "$.b.d", "$", "$.h")(rng.nextInt(7))

  private def jsonExpr(): String = rng.nextInt(8) match {
    case 0 => s"($jsonDoc ->> '$arrowSafePath')"
    case 1 => s"($jsonDoc -> '$jsonPath')"
    case 2 => s"json_type($jsonDoc, '$jsonPath')"
    case 3 => s"json_valid(${strExpr(0)})"
    case 4 => s"json_quote(${if (rng.nextBoolean()) intExpr(1) else strExpr(1)})"
    case 5 => s"json_array(${intExpr(0)}, ${strExpr(0)})"
    case 6 => s"json_remove($jsonDoc, '$jsonPath')"
    case 7 => s"json_insert($jsonDoc, '$$.z', ${intExpr(0)})"
  }

  private def anyExpr(): String = {
    val d = 1 + rng.nextInt(2)
    rng.nextInt(16) match {
      case 0 => s"coalesce(${intExpr(d)}, ${intExpr(0)})"
      case 1 => s"ifnull(${strExpr(d)}, ${strExpr(0)})"
      case 2 => s"nullif(${intExpr(d)}, ${intExpr(d)})"
      case 3 => s"typeof(${if (rng.nextBoolean()) intExpr(d) else strExpr(d)})"
      case 4 => s"CASE WHEN ${boolExpr(d)} THEN ${intExpr(d)} ELSE ${intExpr(d)} END"
      case 5 => s"CASE WHEN ${boolExpr(d)} THEN ${strExpr(d)} ELSE ${strExpr(d)} END"
      case 6 => boolExpr(d) // predicate in a VALUE position: 0/1/NULL
      case 7 => s"(${boolExpr(d - 1)} + ${intExpr(0)})"
      case 8 => castExpr(d)
      case 9 => dtExpr()
      case 10 => jsonExpr()
      case 11 => blobExpr(d)
      case 12 => s"hex(${blobExpr(d - 1)})"
      case 13 => s"length(${blobExpr(d - 1)})"
      case n if n % 2 == 0 => intExpr(d)
      case _ => strExpr(d)
    }
  }

  /** sqlite3's answers for a batch, marker-separated so an unexpected
    * per-statement error can't misalign the remaining rows. */
  private def sqliteBatch(exprs: Seq[String]): Seq[String] = {
    val sql = exprs.map(e => s"SELECT '@@';\nSELECT quote($e);").mkString("\n")
    val out = SqliteCli.query(":memory:", sql)
    val parts = out.split("@@", -1).toSeq.drop(1)
    require(parts.length == exprs.length, "sqlite3 batch misaligned")
    parts.map(_.trim)
  }

  private def oursBatch(exprs: Seq[String]): Seq[String] = {
    val cols = exprs.zipWithIndex
      .map { case (e, i) => s"quote($e) AS c$i" }.mkString(", ")
    val row = SqliteDialect.sql(sess, s"SELECT $cols").collect()(0)
    exprs.indices.map(i => if (row.isNullAt(i)) "NULL" else row.getString(i))
  }

  test(s"$COUNT random typed scalar expressions agree with sqlite3 (seed $SEED)") {
    val exprs = Seq.fill(COUNT)(anyExpr())
    val theirs = exprs.grouped(50).flatMap(sqliteBatch).toSeq
    val ours = exprs.grouped(50).flatMap(oursBatch).toSeq
    val diverged = exprs.indices.filter(i => ours(i) != theirs(i))
      .map(i => s"${exprs(i)}\n  ours:    ${ours(i)}\n  sqlite3: ${theirs(i)}")
    assert(diverged.isEmpty,
      s"${diverged.length}/$COUNT diverged:\n${diverged.take(15).mkString("\n")}")
  }
}
