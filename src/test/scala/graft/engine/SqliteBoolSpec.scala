package graft.engine

import graft.SparkSpecBase

/** SQLite boolean-as-integer semantics, differential against the
  * sandbox's real `sqlite3` (datatype3.html §2.1, lang_expr.html
  * §Boolean Expressions): comparisons are INTEGER 0/1 values usable
  * anywhere, and any value is usable as a condition with
  * numeric-nonzero truthiness. Exercises [[SqliteDialect]]'s
  * BoolNormalizer pass — value-position predicates, predicate-position
  * values, aggregate inputs, and sqlite3's source-text column naming
  * for expression columns. */
class SqliteBoolSpec extends SparkSpecBase {

  private lazy val sess = {
    val s = spark.newSession()
    SqliteCompat.register(s)
    graft.functions.TroughFunctions.register(s)
    s
  }

  /** quote(expr) through both engines, byte-compared. */
  private def differential(exprs: Seq[String]): Unit = {
    val sql = exprs.map(e => s"SELECT '@@';\nSELECT quote($e);").mkString("\n")
    val theirs = SqliteCli.query(":memory:", sql).split("@@", -1).toSeq.drop(1).map(_.trim)
    val cols = exprs.zipWithIndex.map { case (e, i) => s"quote($e) AS c$i" }.mkString(", ")
    val row = SqliteDialect.sql(sess, s"SELECT $cols").collect()(0)
    val ours = exprs.indices.map(i => if (row.isNullAt(i)) "NULL" else row.getString(i))
    val diverged = exprs.indices.filter(i => ours(i) != theirs(i))
      .map(i => s"${exprs(i)}\n  ours:    ${ours(i)}\n  sqlite3: ${theirs(i)}")
    assert(diverged.isEmpty, s"diverged:\n${diverged.mkString("\n")}")
  }

  test("predicates in value positions are INTEGER 0/1, matching sqlite3") {
    differential(Seq(
      "1 < 2", "2 < 1", "(1 < 2) + 1", "(1 < 2) * 10 + (3 = 3)",
      "'a' LIKE 'A%'", "'b' LIKE 'A%'", "'abc' GLOB 'a*'",
      "NOT 5", "NOT 0", "NOT NULL", "NOT '0.5x'", "NOT 'abc'",
      "(1<2) AND 3", "(1<2) AND 0", "NULL AND 0", "NULL AND 1",
      "NULL OR 1", "NULL OR 0", "0 OR 0.1",
      "2 = 2 = 1", "1 < 2 = 1",
      "TRUE", "FALSE", "TRUE + TRUE",
      "abs(1<2)", "typeof(1<2)", "typeof(TRUE)",
      "max(1 < 2, 0)", "min(3 > 1, 5)",
      "iif(1 < 2, 'y', 'n')", "iif('1x', 'y', 'n')", "iif('x1', 'y', 'n')",
      "iif(0.5, 'y', 'n')", "iif(NULL, 'y', 'n')",
      "CASE WHEN 1 THEN 'a' ELSE 'b' END",
      "CASE WHEN 0.0 THEN 'a' ELSE 'b' END",
      "CASE WHEN '2x' THEN 'a' ELSE 'b' END",
      "CASE WHEN NULL THEN 'a' ELSE 'b' END",
      "5 IS NULL", "NULL IS NULL", "(NULL IS NULL) + 41",
      "3 IN (1, 2, 3)", "(3 IN (1, 2)) + 7",
      "2 BETWEEN 1 AND 3", "(2 BETWEEN 3 AND 4) + 1",
      "coalesce(NULL > 1, 9)", "ifnull(1 = NULL, 8)"
    ))
  }

  test("aggregates accept predicate inputs like sqlite3") {
    val fixture =
      """CREATE TABLE t (v TEXT, n INTEGER);
        |INSERT INTO t VALUES ('keep-1', 1), ('keep-2', 5), ('drop-3', -2), (NULL, NULL);
        |""".stripMargin
    val q = "SELECT count(*) AS a, sum(v LIKE 'keep-%') AS b, sum(n > 0) AS c, " +
      "total(n < 0) AS d, avg(n >= 1) AS e, max(n > 0) AS f, " +
      "count(v GLOB 'keep*') AS g FROM t"
    val theirs = SqliteCli.query(":memory:", fixture + q + ";")

    val s2 = sess.newSession()
    SqliteCompat.register(s2)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    s2.createDataFrame(
      Seq(Row("keep-1", 1L), Row("keep-2", 5L), Row("drop-3", -2L), Row(null, null)).asJava,
      T.StructType(Seq(T.StructField("v", T.StringType), T.StructField("n", T.LongType)))
    ).createOrReplaceTempView("t")
    val r = SqliteDialect.sql(s2, q).collect()(0)
    val ours = (0 until r.length).map(i =>
      if (r.isNullAt(i)) "" else r.get(i) match {
        case d: Double =>
          // the sqlite3 CLI prints reals with %.15g (x.0 for wholes)
          if (d == d.floor && !d.isInfinite) s"${d.toLong}.0"
          else {
            val g = f"$d%.15g"
            if (g.contains('.')) g.reverse.dropWhile(_ == '0').reverse else g
          }
        case other => other.toString
      }).mkString("|")
    assert(ours == theirs, s"ours: $ours\nsqlite3: $theirs")
  }

  test("WHERE / HAVING / ON take sqlite3 truthiness") {
    def rows(cond: String): Int =
      SqliteDialect.sql(sess, s"SELECT 1 WHERE $cond").collect().length
    // sqlite3 differential for the same conditions
    val conds = Seq("5", "0", "-0.0", "'0.5x'", "'x5'", "''", "NULL",
      "1 < 2", "2 < 1", "'00'", "0.25", "x'00'")
    val sql = conds.map(c => s"SELECT '@@';\nSELECT count(*) FROM (SELECT 1) WHERE $c;").mkString("\n")
    val theirs = SqliteCli.query(":memory:", sql).split("@@", -1).toSeq.drop(1).map(_.trim.toInt)
    val ours = conds.map(rows)
    assert(ours == theirs, s"conds: $conds\nours: $ours\nsqlite3: $theirs")

    // HAVING truthiness
    assert(SqliteDialect.sql(sess,
      "SELECT count(*) AS c FROM (SELECT 1 AS x UNION ALL SELECT 2) GROUP BY 'g' HAVING count(*)"
    ).collect().length == 1)
    assert(SqliteDialect.sql(sess,
      "SELECT count(*) AS c FROM (SELECT 1 AS x UNION ALL SELECT 2) GROUP BY 'g' HAVING count(*) - 2"
    ).collect().isEmpty)
  }

  test("expression columns are named by their source text, like sqlite3") {
    def names(q: String): Seq[String] = SqliteDialect.sql(sess, q).schema.map(_.name).toSeq
    def sqliteNames(q: String): Seq[String] =
      SqliteCli.query(":memory:", s".headers on\n$q;").linesIterator.next().split("\\|").toSeq
    for (q <- Seq(
      "SELECT 1 < 2",
      "SELECT 'a' LIKE 'a%'",
      "SELECT NOT 5",
      "SELECT 1 < 2 AND 3 > 2",
      "SELECT (1 < 2) + 1, 3 = 3")) {
      assert(names(q) == sqliteNames(q), s"naming diverged for: $q")
    }
  }

  test("booleans normalize inside subqueries, set ops, and ORDER BY") {
    differential(Seq(
      "(SELECT 1 < 2)",
      "(SELECT max(1 < 2, 0)) + 1",
      "EXISTS (SELECT 1)",
      "EXISTS (SELECT 1 WHERE 0)",
      "(EXISTS (SELECT 1)) + 10",
      "3 IN (SELECT 3)",
      "(3 IN (SELECT 4)) + 5"
    ))
    // UNION of predicate columns: both sides integers
    val u = SqliteDialect.sql(sess,
      "SELECT 1 < 2 AS b UNION ALL SELECT 2 < 1 ORDER BY b").collect().map(_.getLong(0)).toSeq
    assert(u == Seq(0L, 1L))
    // ORDER BY a predicate expression
    val o = SqliteDialect.sql(sess,
      "SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 5) ORDER BY x > 2, x").collect()
      .map(_.getInt(0)).toSeq
    assert(o == Seq(1, 5))
  }
}
