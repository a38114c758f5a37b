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

  /** A boolean-valued expression (same-type comparisons only). */
  private def boolExpr(d: Int): String = {
    val cmp = Seq("=", "<>", "<", "<=", ">", ">=")(rng.nextInt(6))
    rng.nextInt(6) match {
      case 0 => s"(${intExpr(math.max(d - 1, 0))} $cmp ${intExpr(math.max(d - 1, 0))})"
      case 1 => s"(${strExpr(math.max(d - 1, 0))} $cmp ${strExpr(math.max(d - 1, 0))})"
      case 2 => s"(${strExpr(0)} LIKE ${strLit})"
      case 3 => s"(${strExpr(0)} GLOB ${strLit})"
      case 4 if d > 0 => s"(${boolExpr(d - 1)} AND ${boolExpr(d - 1)})"
      case 5 if d > 0 => s"(NOT ${boolExpr(d - 1)})"
      case _ => s"(${intExpr(0)} IS NULL)"
    }
  }

  private def anyExpr(): String = {
    val d = 1 + rng.nextInt(2)
    rng.nextInt(10) match {
      case 0 => s"coalesce(${intExpr(d)}, ${intExpr(0)})"
      case 1 => s"ifnull(${strExpr(d)}, ${strExpr(0)})"
      case 2 => s"nullif(${intExpr(d)}, ${intExpr(d)})"
      case 3 => s"typeof(${if (rng.nextBoolean()) intExpr(d) else strExpr(d)})"
      case 4 => s"CASE WHEN ${boolExpr(d)} THEN ${intExpr(d)} ELSE ${intExpr(d)} END"
      case 5 => s"CASE WHEN ${boolExpr(d)} THEN ${strExpr(d)} ELSE ${strExpr(d)} END"
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
