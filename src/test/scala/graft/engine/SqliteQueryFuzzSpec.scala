package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** DIFFERENTIAL FUZZER for the READ path at the QUERY level: the third
  * leg after SqliteExprFuzzSpec (scalar expressions) and
  * SqliteWriteFuzzSpec (write scripts). Generates random full SELECT
  * statements — projections, WHERE trees, inner/left joins, GROUP BY +
  * HAVING, DISTINCT, IN/EXISTS/scalar subqueries, LIMIT — over a
  * seeded two-table dataset, runs each through `TroughEngine.read` and
  * through real `sqlite3` on the same `.sqlite` file, and compares the
  * row multisets byte-for-byte.
  *
  * The dataset is built once by the sandbox sqlite3 CLI and ingested
  * through the (heavily verified) native ingest path, so both engines
  * answer over bit-identical data. Every select item is wrapped in
  * `quote(...)` IN BOTH ENGINES, making values storage-class-faithful
  * strings and the comparison rendering-exact; rows are sorted on both
  * sides so no ORDER BY is needed for determinism (LIMIT shapes order
  * by the unique pk first, so the *chosen* rows are still checked).
  *
  * Domain restrictions (all documented deviations elsewhere):
  * typed comparisons only (no `1 < 'a'` storage-class ordering),
  * REAL column values are multiples of 0.25 so floating sums are
  * exact under any partial-aggregation order, and group_concat is
  * omitted (SQLite documents its concatenation order as arbitrary).
  */
class SqliteQueryFuzzSpec extends SparkSpecBase {

  // -Dgraft.queryfuzz.count=500 -Dgraft.queryfuzz.seed=... locally
  private val COUNT =
    sys.props.get("graft.queryfuzz.count").map(_.toInt).getOrElse(60)
  private val SEED =
    sys.props.get("graft.queryfuzz.seed").map(_.toLong).getOrElse(20260814L)
  private val rng = new scala.util.Random(SEED)

  private val SEG = "qfuzzseg"

  private lazy val root = Files.createTempDirectory("graft-qfuzz").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }

  // ---- seeded dataset: built by real sqlite3, ingested natively ----

  private val sPool = Seq("ab", "Ab", "cd", "CD", "ef", "gh", "xyz", "x")
  private val uPool = Seq("alpha", "Beta", "gamma", "delta", "epsilon")
  // pools for the COLLATE-declared columns: case variants of the same
  // words (NOCASE folding) and trailing-space variants (RTRIM)
  private val snPool = Seq("ab", "AB", "Ab", "cd", "CD", "qq", "Zz")
  private val rtPool = Seq("p", "p ", "p  ", "q", "q ", " q", "")

  private def dataScript: String = {
    val dr = new scala.util.Random(SEED ^ 0x5eedL)
    def orNull(v: => String): String = if (dr.nextInt(7) == 0) "NULL" else v
    def quarter(): String = f"${(dr.nextInt(161) - 80) * 0.25}%.2f"
    def dateLit(): String =
      f"'${2018 + dr.nextInt(8)}%04d-${1 + dr.nextInt(12)}%02d-${1 + dr.nextInt(28)}%02d'"
    def blobLit(): String =
      "X'" + Seq.fill(1 + dr.nextInt(6))(f"${dr.nextInt(256)}%02X").mkString + "'"
    val sb = new StringBuilder
    sb ++= "CREATE TABLE t1 (id INTEGER PRIMARY KEY, a INTEGER, " +
      "b INTEGER, c REAL, s TEXT, u TEXT, d TEXT, bl BLOB, " +
      "sn TEXT COLLATE NOCASE, rt TEXT COLLATE RTRIM);\n"
    sb ++= "CREATE TABLE t2 (k INTEGER PRIMARY KEY, a INTEGER, s TEXT, " +
      "sn TEXT COLLATE NOCASE);\n"
    for (i <- 1 to 80) {
      val a = orNull((dr.nextInt(10)).toString)
      val b = orNull((dr.nextInt(101) - 50).toString)
      val c = orNull(quarter())
      val s = orNull(s"'${sPool(dr.nextInt(sPool.length))}'")
      val u = orNull(s"'${uPool(dr.nextInt(uPool.length))}'")
      val d = orNull(dateLit())
      val bl = orNull(blobLit())
      val sn = orNull(s"'${snPool(dr.nextInt(snPool.length))}'")
      val rt = orNull(s"'${rtPool(dr.nextInt(rtPool.length))}'")
      sb ++= s"INSERT INTO t1 VALUES ($i, $a, $b, $c, $s, $u, $d, $bl, $sn, $rt);\n"
    }
    for (i <- 1 to 20) {
      val a = orNull((dr.nextInt(10)).toString)
      val s = orNull(s"'${sPool(dr.nextInt(sPool.length))}'")
      val sn = orNull(s"'${snPool(dr.nextInt(snPool.length))}'")
      sb ++= s"INSERT INTO t2 VALUES ($i, $a, $s, $sn);\n"
    }
    sb.toString
  }

  private lazy val db: String = {
    // the frame marker must never appear in a rendered value (pool
    // edits are the realistic way that invariant breaks — fail loudly)
    (sPool ++ uPool ++ snPool ++ rtPool).foreach(v =>
      require(!v.contains(FrameMarker) && !v.contains("@"),
        s"pool value '$v' could collide with the batch framing"))
    val path = Files.createTempDirectory("graft-qfuzz-db")
      .resolve("qfuzz.sqlite").toString
    require(SqliteCli.run(path, dataScript) == 0, "fixture build failed")
    engine.store.ingestSqliteSegment(path, SEG)
    path
  }

  // ---- query generator ----

  /** Column universe of the FROM clause being generated. */
  private case class Ctx(ints: Seq[String], reals: Seq[String],
      texts: Seq[String]) {
    def anyCol: String = pick(ints ++ reals ++ texts)
    def real: String = if (reals.nonEmpty) pick(reals) else pick(ints)
  }
  private val t1Ctx = Ctx(Seq("t1.id", "t1.a", "t1.b"), Seq("t1.c"),
    Seq("t1.s", "t1.u"))
  private val t2Ctx = Ctx(Seq("t2.k", "t2.a"), Seq(), Seq("t2.s"))
  private val joinCtx = Ctx(Seq("t1.id", "t1.a", "t1.b", "t2.k", "t2.a"),
    Seq("t1.c"), Seq("t1.s", "t1.u", "t2.s"))

  private def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.length))
  private def cmp: String = pick(Seq("=", "<>", "<", "<=", ">", ">="))
  private def intLit: String = {
    val v = rng.nextInt(41) - 20
    if (v < 0) s"($v)" else v.toString
  }
  private def realLit: String = f"${(rng.nextInt(81) - 40) * 0.25}%.2f"
  private def textLit: String = s"'${pick(sPool ++ uPool)}'"

  private def intExpr(ctx: Ctx, d: Int): String =
    if (d <= 0) { if (rng.nextInt(3) == 0) intLit else pick(ctx.ints) }
    else rng.nextInt(7) match {
      case 0 => s"(${intExpr(ctx, d - 1)} + ${intExpr(ctx, d - 1)})"
      case 1 => s"(${intExpr(ctx, d - 1)} - ${intExpr(ctx, d - 1)})"
      case 2 => s"(${intExpr(ctx, d - 1)} * $intLit)"
      case 3 => s"(${intExpr(ctx, d - 1)} / ${intExpr(ctx, 0)})" // /0 → NULL
      case 4 => s"(${intExpr(ctx, d - 1)} % ${intExpr(ctx, 0)})"
      case 5 => s"abs(${intExpr(ctx, d - 1)})"
      case 6 => s"iif(${pred(ctx, 0)}, ${intExpr(ctx, d - 1)}, ${intExpr(ctx, d - 1)})"
    }

  private def textExpr(ctx: Ctx, d: Int): String =
    if (d <= 0) { if (rng.nextInt(4) == 0) textLit else pick(ctx.texts) }
    else rng.nextInt(6) match {
      case 0 => s"upper(${textExpr(ctx, d - 1)})"
      case 1 => s"lower(${textExpr(ctx, d - 1)})"
      case 2 => s"substr(${textExpr(ctx, d - 1)}, ${1 + rng.nextInt(3)})"
      case 3 => s"substr(${textExpr(ctx, d - 1)}, ${1 + rng.nextInt(2)}, ${1 + rng.nextInt(3)})"
      case 4 => s"(${textExpr(ctx, d - 1)} || ${textExpr(ctx, d - 1)})"
      case 5 => s"replace(${textExpr(ctx, d - 1)}, 'a', 'z')"
    }

  private def hasT1(ctx: Ctx): Boolean = ctx.ints.contains("t1.id")

  /** Predicates over the COLLATE-declared columns: deterministic
    * (membership, not representative choice), covering the declared
    * NOCASE/RTRIM fold, the explicit COLLATE BINARY override, IN, and
    * range compares under the collation. */
  private def collatedPred(): String = rng.nextInt(6) match {
    case 0 => s"(t1.sn $cmp '${pick(snPool)}')"
    case 1 => s"(t1.sn = '${pick(snPool)}' COLLATE BINARY)"
    case 2 => s"(t1.rt $cmp '${pick(rtPool)}')"
    case 3 => s"(t1.sn IN ('${pick(snPool)}', '${pick(snPool)}'))"
    case 4 => s"(t1.rt = '${pick(rtPool)}' COLLATE NOCASE)"
    case _ => s"(t1.sn BETWEEN '${pick(snPool)}' AND '${pick(snPool)}')"
  }

  private def pred(ctx: Ctx, d: Int): String = rng.nextInt(16) match {
    case 12 if hasT1(ctx) =>
      s"(t1.d $cmp '${2019 + rng.nextInt(6)}-${f"${1 + rng.nextInt(12)}%02d"}-15')"
    case 13 if hasT1(ctx) =>
      s"(strftime('%m', t1.d) = '${f"${1 + rng.nextInt(12)}%02d"}')"
    case 14 | 15 if hasT1(ctx) => collatedPred()
    case 0 | 1 => s"(${intExpr(ctx, 1)} $cmp ${intExpr(ctx, 1)})"
    case 2 => s"(${ctx.real} $cmp $realLit)"
    case 3 => s"(${intExpr(ctx, 0)} $cmp $realLit)" // numeric cross-compare
    case 4 =>
      val coll = if (rng.nextInt(4) == 0) " COLLATE NOCASE" else ""
      s"(${pick(ctx.texts)} $cmp $textLit$coll)"
    case 5 =>
      val pat = pick(Seq("a%", "%b%", "_d", "x%", "%e%", "%a"))
      s"(${pick(ctx.texts)} LIKE '$pat')"
    case 6 => s"(${ctx.anyCol} IS ${if (rng.nextBoolean()) "" else "NOT "}NULL)"
    case 7 if d > 0 => s"(${pred(ctx, d - 1)} AND ${pred(ctx, d - 1)})"
    case 8 if d > 0 => s"(${pred(ctx, d - 1)} OR ${pred(ctx, d - 1)})"
    case 9 if d > 0 => s"(NOT ${pred(ctx, d - 1)})"
    case 10 => s"(${pick(ctx.ints)} BETWEEN $intLit AND $intLit)"
    case _ => s"(${pick(ctx.ints)} IN ($intLit, $intLit, $intLit))"
  }

  /** `forOutput = true` renders avg() through CAST(… AS TEXT): its
    * quotient rarely round-trips at 15 digits, and quote() of such a
    * REAL is the documented last-digit deviation (SqliteReal.quoteText)
    * — CAST text is full `%!.15g` parity. Predicates (HAVING) compare
    * the RAW double, which is IEEE-identical in both engines. */
  private def aggExpr(ctx: Ctx, forOutput: Boolean): String =
    rng.nextInt(if (forOutput) 13 else 10) match {
      // count(DISTINCT) over a collated column folds its classes —
      // the count is representative-free, so it's differential-safe
      case 12 if hasT1(ctx) =>
        s"count(DISTINCT ${if (rng.nextBoolean()) "t1.sn" else "t1.rt"})"
      case 12 => s"count(DISTINCT ${pick(ctx.texts)})"
      case 0 => "count(*)"
      case 1 => s"count(${ctx.anyCol})"
      case 2 => s"sum(${pick(ctx.ints)})"
      case 3 => s"sum(${ctx.real})"
      case 4 =>
        val a = s"avg(${pick(ctx.ints :+ ctx.real)})"
        if (forOutput) s"CAST($a AS TEXT)" else a
      // HAVING compares the aggregate against an INT literal, so min/max
      // there must stay numeric — text-vs-int ordering is the documented
      // storage-class deviation the generator keeps out of domain
      case 5 => s"min(${if (forOutput) ctx.anyCol else pick(ctx.ints)})"
      case 6 => s"max(${if (forOutput) ctx.anyCol else pick(ctx.ints)})"
      case 7 => s"total(${pick(ctx.ints :+ ctx.real)})"
      case 8 => s"count(DISTINCT ${ctx.anyCol})"
      case 9 => s"sum(DISTINCT ${pick(ctx.ints)})"
      // FILTER (SQLite 3.30) stays in output position
      case 10 => s"count(*) FILTER (WHERE ${pred(ctx, 0)})"
      case 11 => s"sum(${pick(ctx.ints)}) FILTER (WHERE ${pred(ctx, 0)})"
    }

  /** date/time family over the COLUMN (the expr fuzzer covers the
    * literal domain); TEXT-valued forms only — julianday's REAL output
    * would hit quote()'s non-round-trip deviation. */
  private def dateItem(): String = rng.nextInt(4) match {
    case 0 => s"date(t1.d, '${rng.nextInt(41) - 20} days')"
    case 1 => s"strftime('%Y-%m', t1.d)"
    case 2 => s"datetime(t1.d, 'start of month')"
    case _ => s"date(t1.d, '${1 + rng.nextInt(5)} months')"
  }

  private def selectItem(ctx: Ctx): String = rng.nextInt(7) match {
    case 0 => ctx.anyCol
    case 1 => intExpr(ctx, 1 + rng.nextInt(2))
    case 2 => textExpr(ctx, 1 + rng.nextInt(2))
    case 3 => s"iif(${pred(ctx, 1)}, ${intExpr(ctx, 1)}, ${intExpr(ctx, 1)})"
    case 4 if hasT1(ctx) => dateItem()
    case 5 if hasT1(ctx) => // blob column via the ingest round trip
      pick(Seq("t1.bl", "hex(t1.bl)", "length(t1.bl)", "typeof(t1.bl)"))
    case _ => // correlated scalar subquery in the output list
      if (rng.nextBoolean())
        s"(SELECT count(*) FROM t2 WHERE t2.a = t1.a)"
      else
        s"(SELECT max(t2.k) FROM t2 WHERE t2.s = t1.s)"
  }

  /** Wrap every item in quote() so both engines answer
    * storage-class-faithful TEXT. */
  private def wrap(items: Seq[String]): String =
    items.zipWithIndex.map { case (e, i) => s"quote($e) AS c$i" }.mkString(", ")

  private def fromClause(): (String, Ctx) =
    if (rng.nextBoolean()) ("t1", t1Ctx)
    else {
      val kind = if (rng.nextBoolean()) "JOIN" else "LEFT JOIN"
      // the sn = sn option joins under the NOCASE collation (both
      // sides declared): membership is deterministic
      val on = pick(Seq("t1.a = t2.a", "t1.s = t2.s", "t1.sn = t2.sn"))
      (s"t1 $kind t2 ON $on", joinCtx)
    }

  private def groupKey(ctx: Ctx): String = rng.nextInt(6) match {
    case 0 => pick(ctx.ints.filterNot(_.endsWith(".id")) :+ "t1.a")
    case 1 => pick(ctx.texts)
    case 2 => s"(${pick(ctx.ints)} % ${2 + rng.nextInt(4)})"
    case 3 => s"substr(${pick(ctx.texts)}, 1, 1)"
    case 4 if hasT1(ctx) => s"strftime('%Y', t1.d)"
    case _ => ctx.real
  }

  private def subqueryPred(ctx: Ctx): String = rng.nextInt(7) match {
    case 0 =>
      s"(t1.a IN (SELECT t2.a FROM t2 WHERE t2.k > ${rng.nextInt(15)}))"
    case 1 =>
      s"(t1.a NOT IN (SELECT t2.a FROM t2 WHERE t2.a IS NOT NULL " +
        s"AND t2.k < ${5 + rng.nextInt(15)}))"
    case 2 =>
      s"(${pick(ctx.ints)} $cmp (SELECT avg(t2.a) FROM t2))"
    case 3 =>
      s"(EXISTS (SELECT 1 FROM t2 WHERE t2.a = t1.a AND t2.k % ${2 + rng.nextInt(3)} = 0))"
    // IN-subquery over collated columns (r11): the LEFT operand's
    // collation governs membership (lang_expr.html) — NOCASE x folds
    // case across the subquery result, while an uncollated x against
    // the same collated-column subquery compares BINARY
    case 4 =>
      s"(t1.sn IN (SELECT t2.sn FROM t2 WHERE t2.k > ${rng.nextInt(10)}))"
    case 5 =>
      s"(t1.sn NOT IN (SELECT t2.sn FROM t2 WHERE t2.sn IS NOT NULL))"
    case _ =>
      s"(t1.s IN (SELECT t2.sn FROM t2 WHERE t2.sn IS NOT NULL))"
  }

  /** Window calls whose output is deterministic: ranking over the
    * unique pk, or rank/dense_rank over non-unique keys (ties share a
    * rank in both engines; row_number over a non-unique order would be
    * arbitrary). NULL ordering (first ASC) and BINARY collation agree. */
  private def windowItem(): String = rng.nextInt(7) match {
    case 0 => "row_number() OVER (ORDER BY t1.id)"
    case 1 => s"rank() OVER (ORDER BY ${pick(Seq("t1.a", "t1.b", "t1.s"))})"
    case 2 => s"dense_rank() OVER (ORDER BY ${pick(Seq("t1.a", "t1.s"))})"
    case 3 => s"lag(${pick(Seq("t1.b", "t1.s"))}) OVER (ORDER BY t1.id)"
    case 4 => s"lead(${pick(Seq("t1.a", "t1.u"))}, ${1 + rng.nextInt(2)}) " +
      "OVER (ORDER BY t1.id)"
    case 5 => s"sum(t1.b) OVER (PARTITION BY t1.a ORDER BY t1.id " +
      s"ROWS BETWEEN ${1 + rng.nextInt(3)} PRECEDING AND CURRENT ROW)"
    case 6 => s"ntile(${2 + rng.nextInt(4)}) OVER (ORDER BY t1.id)"
  }

  /** Double-quoted tokens under the reference's DQS-ON sqlite3 (r17):
    * resolvable ones are identifiers, unresolvable ones fall back to
    * string literals — in projection, concatenation, iif branches,
    * WHERE, and GROUP BY positions. t1-only so bare names stay
    * unambiguous; the CLI side runs `.dbconfig dqs_dml on`. */
  private def dqsQuery(): String = {
    val resolv = pick(Seq("a", "b", "s", "u", "c"))
    val missing = "zz_" + rng.nextInt(5)
    rng.nextInt(5) match {
      case 0 =>
        val items = Seq("\"" + resolv + "\"", "\"" + missing + "\"",
          s"""("$missing" || '!')""")
        s"""SELECT ${wrap(items)} FROM t1 WHERE "$resolv" IS NOT NULL;"""
      case 1 => // unresolvable token in WHERE compares as a constant
        val items = Seq.fill(1 + rng.nextInt(2))(selectItem(t1Ctx))
        s"""SELECT ${wrap(items)} FROM t1 WHERE "$missing" = '$missing';"""
      case 2 => // literal-vs-column compare; mixed-case resolution
        val items = Seq("\"" + resolv.toUpperCase + "\"")
        s"""SELECT ${wrap(items)} FROM t1 WHERE "${pick(sPool)}" = t1.s;"""
      case 3 => // GROUP BY an unresolvable token groups by a constant
        s"""SELECT quote(count(*)) AS c0, quote("$missing") AS c1 """ +
          s"""FROM t1 GROUP BY "$missing";"""
      case _ => // iif over a mix; a token with a space can only fall back
        val items = Seq(
          s"""iif("$resolv" IS NULL, "$missing", "no such col")""")
        s"SELECT ${wrap(items)} FROM t1;"
    }
  }

  private def genQuery(): String = rng.nextInt(18) match {
    case 16 | 17 => dqsQuery()
    case 0 | 1 | 2 => // plain projection, optional DISTINCT / WHERE
      val (from, ctx) = fromClause()
      val items = Seq.fill(1 + rng.nextInt(3))(selectItem(ctx))
      val distinct = if (rng.nextInt(4) == 0) "DISTINCT " else ""
      val where = if (rng.nextBoolean()) s" WHERE ${pred(ctx, 2)}" else ""
      s"SELECT $distinct${wrap(items)} FROM $from$where;"
    case 3 | 4 | 5 => // GROUP BY (+ HAVING)
      val (from, ctx) = fromClause()
      val keys = Seq.fill(1 + rng.nextInt(2))(groupKey(ctx)).distinct
      val aggs = Seq.fill(1 + rng.nextInt(2))(aggExpr(ctx, forOutput = true))
      val where = if (rng.nextBoolean()) s" WHERE ${pred(ctx, 1)}" else ""
      val having =
        if (rng.nextInt(3) == 0) s" HAVING ${aggExpr(ctx, forOutput = false)} $cmp $intLit" else ""
      s"SELECT ${wrap(keys ++ aggs)} FROM $from$where " +
        s"GROUP BY ${keys.mkString(", ")}$having;"
    case 6 | 7 => // global aggregate
      val (from, ctx) = fromClause()
      val aggs = Seq.fill(1 + rng.nextInt(3))(aggExpr(ctx, forOutput = true))
      val where = if (rng.nextBoolean()) s" WHERE ${pred(ctx, 1)}" else ""
      s"SELECT ${wrap(aggs)} FROM $from$where;"
    case 8 | 9 => // subquery in WHERE (t1-rooted so correlation binds)
      val items = Seq.fill(1 + rng.nextInt(2))(selectItem(t1Ctx))
      val extra = if (rng.nextBoolean()) s" AND ${pred(t1Ctx, 1)}" else ""
      s"SELECT ${wrap(items)} FROM t1 WHERE ${subqueryPred(t1Ctx)}$extra;"
    case 10 => // ORDER BY + LIMIT/OFFSET: the chosen window is checked.
      // A collated first key orders by its declared collation; the pk
      // tiebreak keeps the selection deterministic on both engines.
      val items = "t1.id" +: Seq.fill(rng.nextInt(2))(selectItem(t1Ctx))
      val where = if (rng.nextBoolean()) s" WHERE ${pred(t1Ctx, 1)}" else ""
      val off = if (rng.nextBoolean()) s" OFFSET ${rng.nextInt(10)}" else ""
      val order = pick(Seq("t1.id", "t1.sn, t1.id", "t1.rt, t1.id"))
      s"SELECT ${wrap(items)} FROM t1$where ORDER BY $order " +
        s"LIMIT ${1 + rng.nextInt(20)}$off;"
    case 11 | 12 => // compound selects (set semantics dedup both sides)
      if (rng.nextInt(3) == 0) {
        // COLLATED compound (r11): the LEFT select's column collation
        // governs membership/dedup — counted, since the surviving
        // representative of a folded pair is arbitrary on both engines
        val op = pick(Seq("UNION", "INTERSECT", "EXCEPT"))
        val lcol = pick(Seq("t1.sn", "t1.rt", "t1.s"))
        val rcol = pick(Seq("t2.sn", "t2.s"))
        s"SELECT count(*) AS n FROM (SELECT $lcol FROM t1 " +
          s"WHERE ${pred(t1Ctx, 1)} $op SELECT $rcol FROM t2 " +
          s"WHERE ${pred(t2Ctx, 1)});"
      } else {
        val op = pick(Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
        s"SELECT quote(t1.a) AS c0, quote(t1.s) AS c1 FROM t1 " +
          s"WHERE ${pred(t1Ctx, 1)} $op " +
          s"SELECT quote(t2.a), quote(t2.s) FROM t2 WHERE ${pred(t2Ctx, 1)};"
      }
    case 13 | 14 => // window functions
      val items = "t1.id" +: Seq.fill(1 + rng.nextInt(2))(windowItem())
      val where = if (rng.nextBoolean()) s" WHERE ${pred(t1Ctx, 1)}" else ""
      s"SELECT ${wrap(items)} FROM t1$where;"
    case _ => // CTE: aggregate over it, or join it back against t2
      val where = s" WHERE ${pred(t1Ctx, 1)}"
      if (rng.nextBoolean())
        s"WITH w AS (SELECT t1.a AS wa, t1.b AS wb FROM t1$where) " +
          "SELECT quote(wa) AS c0, quote(count(*)) AS c1, " +
          "quote(sum(wb)) AS c2 FROM w GROUP BY wa;"
      else
        s"WITH w AS (SELECT t1.a AS wa, t1.s AS ws FROM t1$where) " +
          "SELECT quote(w.wa) AS c0, quote(t2.k) AS c1 " +
          "FROM w JOIN t2 ON w.ws = t2.s;"
  }

  // ---- differential harness ----

  /** sqlite3's sorted row multiset per query, one batch, marker-framed
    * (the CLI continues past per-statement errors, so alignment holds
    * and an error simply leaves that query's frame empty). The marker
    * is a sentinel no value pool or generator output can collide with
    * (asserted against the pools at fixture build). */
  private val FrameMarker = "GRAFT-FRAME-c19e4b72"
  private def sqliteBatch(queries: Seq[String]): Seq[Seq[String]] = {
    // DQS ON, like the reference's python sqlite3 (the CLI defaults OFF)
    val sql = ".dbconfig dqs_dml on\n" +
      queries.map(q => s"SELECT '$FrameMarker';\n$q").mkString("\n")
    val out = SqliteCli.query(db, sql)
    val parts = out.split(FrameMarker, -1).toSeq.drop(1)
    require(parts.length == queries.length, "sqlite3 batch misaligned")
    parts.map(_.split("\n").map(_.trim).filter(_.nonEmpty).toSeq.sorted)
  }

  private def engineRows(q: String): Seq[String] =
    engine.read(SEG, q).collect()
      .map(r => (0 until r.length).map { i =>
        // most shapes quote() every output (TEXT); the collated
        // compound shape counts (BIGINT) — render like the CLI does
        if (r.isNullAt(i)) "" else String.valueOf(r.get(i))
      }.mkString("|"))
      .toSeq.sorted

  test(s"$COUNT random SELECT queries agree with sqlite3 (seed $SEED)") {
    db // force fixture + ingest
    val queries = Seq.fill(COUNT)(genQuery())
    val theirs = queries.grouped(30).flatMap(sqliteBatch).toSeq
    val ours = queries.map(q =>
      scala.util.Try(engineRows(q)).recover {
        case e => Seq(s"ENGINE ERROR: ${e.getMessage.linesIterator.next()}")
      }.get)
    val diverged = queries.indices.filter(i => ours(i) != theirs(i)).map { i =>
      s"${queries(i)}\n  ours:    ${ours(i).take(6).mkString(" / ")}" +
        s"\n  sqlite3: ${theirs(i).take(6).mkString(" / ")}"
    }
    assert(diverged.isEmpty,
      s"${diverged.length}/$COUNT diverged:\n${diverged.take(10).mkString("\n")}")
  }
}
