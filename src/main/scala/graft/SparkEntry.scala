package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TroughFunctions
import graft.pipeline.{Dedup, Multimodal, Packing, PipelineFunctions, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed
  * Spark-first (DataFrame/Dataset API, Catalyst-optimizable); the matching
  * [[oracleSql]] entry is the DuckDB-equivalent SQL the driver uses for the
  * differential correctness check. Column names/aliases are kept identical
  * on both sides (the driver sorts columns by name before hashing).
  *
  * Determinism rules used throughout:
  *  - every result has a total ORDER BY on both sides;
  *  - double aggregates are round()ed (sum order across partitions is
  *    nondeterministic in the last ulp);
  *  - DuckDB sum(BIGINT)->HUGEINT and floor/ceil->DECIMAL are cast back to
  *    BIGINT in the oracle so schemas line up with Spark's LongType;
  *  - raw `events.ts` is never emitted (parquet ns truncates to µs in
  *    Spark) — always date_trunc'ed first.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Run raw SQLite-dialect SQL the way the engine's read path does
    * (SqliteCompat function names + SqliteDialect operator rewrites) with
    * the named corpus tables as views — the end-to-end harness for the
    * dialect queries q46+, oracle-checked against DuckDB equivalents. */
  private def sqliteSql(
      s: SparkSession, dir: String, tables: Seq[String], sql: String): DataFrame = {
    val sess = s.newSession()
    graft.engine.SqliteCompat.register(sess)
    tables.foreach(n => Tables.load(sess, dir, n).createOrReplaceTempView(n))
    graft.engine.SqliteDialect.sql(sess, sql)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation (TPC-H Q5 shape): broadcast the bounded dims,
    * shuffle only the fact-side aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_join_revenue")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Relational surface (SURVEY §2.B — the per-segment SQL surface trough
  // guarantees by embedding SQLite, re-expressed on Catalyst).
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.B scan + filter: predicate pushdown to parquet (BETWEEN, =, range)
    "q01_scan_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
            $"l_returnflag" === "R" && $"l_quantity".between(10, 20))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // §2.B projection expressions: arithmetic + CASE WHEN + string fn
    "q02_project_case" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" % 100 === 0)
        .select(
          $"l_orderkey",
          $"l_linenumber",
          // exact DECIMAL arithmetic: the double product lands on .xx5
          // boundaries where Spark (HALF_UP on BigDecimal) and DuckDB
          // (scaled-double) round differently — first observed at sf0.1.
          // Final cast to DOUBLE, not DECIMAL: the driver's comparator
          // hashes decimal columns differently across engines (all three
          // r01 hash mismatches were decimal-typed outputs), while a
          // 2-dp value casts to the identical nearest double everywhere.
          round($"l_extendedprice".cast("decimal(18,2)")
              * (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
              * (lit(1).cast("decimal(18,2)") + $"l_tax".cast("decimal(18,2)")), 2)
            .cast("double").as("charge"),
          when($"l_quantity" < 10, "small")
            .when($"l_quantity" < 40, "medium")
            .otherwise("large")
            .as("qty_band"),
          concat($"l_returnflag", lit("/"), $"l_linestatus").as("flag"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // §2.B aggregation: TPC-H Q1 pricing summary (partial agg map-side,
    // 6-group output — shuffle is trivially small at any scale)
    "q03_agg_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("2001-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2)
            .as("sum_charge"),
          round(avg($"l_quantity"), 2).as("avg_qty"),
          round(avg($"l_extendedprice"), 2).as("avg_price"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // §2.B aggregation: COUNT DISTINCT + HAVING
    "q04_agg_distinct_having" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_custs"),
          round(sum($"o_totalprice"), 2).as("total"))
        .filter($"n_orders" > 10)
        .orderBy($"o_orderpriority")
    }),

    // §2.B joins: 6-table star join. Bounded dims broadcast; the
    // customer/orders/lineitem chain shuffles on its join keys and AQE
    // re-plans at runtime. TPC-H Q5 shape.
    "q05_join_revenue" -> ((s, dir) => {
      import s.implicits._
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val lineitem = t(s, dir, "lineitem")
      val supplier = t(s, dir, "supplier")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      lineitem
        .join(orders, $"l_orderkey" === $"o_orderkey")
        .join(customer, $"o_custkey" === $"c_custkey")
        .join(broadcast(supplier), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .filter(
          $"r_name" === "ASIA" &&
            $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // §2.B filter + global aggregate (TPC-H Q6: forecast revenue change)
    "q06_agg_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
            $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
    }),

    // §2.B LEFT OUTER join (customers with zero orders preserved)
    "q07_join_left" -> ((s, dir) => {
      import s.implicits._
      val agg = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum($"o_totalprice").as("total"))
      t(s, dir, "customer")
        .join(agg, $"c_custkey" === $"o_custkey", "left")
        .select(
          $"c_custkey",
          $"c_name",
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          round(coalesce($"total", lit(0.0)), 2).as("total"))
        .orderBy($"c_custkey")
    }),

    // §2.B FULL OUTER join with USING-style coalesced key
    "q08_join_full" -> ((s, dir) => {
      import s.implicits._
      val y96 = t(s, dir, "orders")
        .filter(year($"o_orderdate") === 1996)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n96"))
      val y97 = t(s, dir, "orders")
        .filter(year($"o_orderdate") === 1997)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n97"))
      y96
        .join(y97, Seq("o_custkey"), "full")
        .select(
          $"o_custkey",
          coalesce($"n96", lit(0L)).as("n96"),
          coalesce($"n97", lit(0L)).as("n97"))
        .orderBy($"o_custkey")
    }),

    // §2.B EXISTS subquery -> left_semi join
    "q09_join_semi" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "orders").filter($"o_totalprice" > 150000)
      t(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // §2.B NOT EXISTS subquery -> left_anti join
    "q10_join_anti" -> ((s, dir) => {
      import s.implicits._
      val o97 = t(s, dir, "orders").filter(year($"o_orderdate") === 1997)
      t(s, dir, "customer")
        .join(o97, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // §2.B CROSS join (both sides bounded dims)
    "q11_cross_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "region")
        .crossJoin(t(s, dir, "nation"))
        .filter($"r_regionkey" =!= $"n_regionkey")
        .select($"r_name", $"n_name")
        .orderBy($"r_name", $"n_name")
    }),

    // §2.B window: ranking, top-k per group (row_number + filter)
    "q12_window_topk" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 3)
        .select($"c_nationkey".cast("long").as("c_nationkey"), $"rnk", $"c_custkey", $"c_acctbal")
        .orderBy($"c_nationkey", $"rnk")
    }),

    // §2.B window: running sum, lag, moving average (ROWS frames)
    "q13_window_running" -> ((s, dir) => {
      import s.implicits._
      // Exact-decimal arithmetic end-to-end: double sums round-trip through
      // round() nondeterministically at .xx5 boundaries across engines, so
      // cast to DECIMAL(18,2) first — window sums are then exact integers
      // scaled by 100. Output columns cast back to DOUBLE (exact for 2-dp
      // values): the driver's comparator hashes decimal columns
      // differently across engines (see q02 note).
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val cum = w.rowsBetween(Window.unboundedPreceding, 0)
      val mov = w.rowsBetween(-2, 0)
      val dec = $"o_totalprice".cast("decimal(18,2)")
      t(s, dir, "orders")
        .filter($"o_custkey" < 100)
        .select(
          $"o_custkey",
          $"o_orderkey",
          sum(dec).over(cum).cast("double").as("running"),
          lag(dec, 1).over(w).cast("double").as("prev"),
          (sum(dec).over(mov).cast("double") / count(lit(1)).over(mov).cast("double"))
            .as("mavg"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // §2.B window: ntile / percent_rank / cume_dist / dense_rank
    "q14_window_rank_funcs" -> ((s, dir) => {
      import s.implicits._
      val w = Window.orderBy($"s_acctbal", $"s_suppkey")
      t(s, dir, "supplier")
        .select(
          $"s_suppkey",
          $"s_acctbal",
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          dense_rank().over(Window.orderBy($"s_nationkey")).cast("long").as("nat_rank"))
        .orderBy($"s_suppkey")
    }),

    // §2.B ORDER BY ... LIMIT ... OFFSET (top-k with offset)
    "q15_limit_offset" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .orderBy($"p_retailprice".desc, $"p_partkey")
        .offset(10)
        .limit(20)
        .select($"p_partkey", $"p_name", $"p_retailprice")
    }),

    // §2.B set operations: INTERSECT / EXCEPT / UNION ALL
    "q16_setops" -> ((s, dir) => {
      import s.implicits._
      val y96 = t(s, dir, "orders").filter(year($"o_orderdate") === 1996).select($"o_custkey")
      val y97 = t(s, dir, "orders").filter(year($"o_orderdate") === 1997).select($"o_custkey")
      val both = y96.intersect(y97).withColumn("tag", lit("both"))
      val only96 = y96.except(y97).withColumn("tag", lit("only96"))
      both.unionAll(only96).orderBy($"tag", $"o_custkey")
    }),

    // §2.B CTE + scalar subquery + IN subquery (Catalyst decorrelation)
    "q17_cte_subquery" -> ((s, dir) => {
      // register only the referenced tables (registerAll would re-read
      // 10 parquet footers per invocation)
      Seq("orders", "customer", "nation").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        WITH big AS (
          SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, round(spend, 2) AS spend
        FROM customer JOIN big ON c_custkey = o_custkey
        WHERE spend > (SELECT avg(spend) FROM big)
          AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        ORDER BY c_custkey
      """)
    }),

    // §2.B string functions
    "q18_strings" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_partkey" % 50 === 0)
        .select(
          $"p_partkey",
          length($"p_name").cast("long").as("name_len"),
          upper(substring($"p_name", 1, 8)).as("head"),
          lower($"p_brand").as("brand_lc"),
          regexp_replace($"p_type", " ", "_").as("type_us"),
          instr($"p_name", "a").cast("long").as("first_a"),
          trim(concat(lit("  "), $"p_name", lit("  "))).as("trimmed"),
          lpad($"p_size".cast("string"), 4, "0").as("size_pad"))
        .orderBy($"p_partkey")
    }),

    // §2.B date/time: extract + group by month
    "q19_datetime" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mon"))
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"yr", $"mon")
    }),

    // §2.B math functions
    "q20_math" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" % 500 === 0)
        .select(
          $"l_orderkey",
          $"l_linenumber",
          abs($"l_quantity" - 25).as("abs_dev"),
          round(sqrt($"l_extendedprice"), 3).as("sq"),
          floor($"l_quantity" / 7).as("fl"),
          ceil($"l_discount" * 100).as("ce"),
          round(log($"l_extendedprice" + 1), 6).as("lnv"),
          ($"l_partkey" % 10).as("pmod"),
          signum($"l_quantity" - 25).cast("long").as("sgn"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // §2.B conditional / null handling: COALESCE NULLIF CASE
    "q21_conditional" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderkey" % 100 === 0)
        .select(
          $"o_orderkey",
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status2"),
          when($"o_totalprice" > 200000, "high")
            .when($"o_totalprice" > 100000, "mid")
            .otherwise("low")
            .as("band"),
          when($"o_orderpriority" === "1-URGENT", 1).otherwise(0).as("urgent"))
        .orderBy($"o_orderkey")
    }),

    // §2.B JSON access over the TEXT props column (json1-surface analog)
    "q22_json" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter($"event_id" % 100 === 0)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .orderBy($"event_id")
    }),

    // §2.B group_concat (SQLite) -> deterministic ordered string_agg
    "q23_group_concat" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(array_join(array_sort(collect_list($"s_name")), ",").as("suppliers"))
        .orderBy($"n_name")
    }),

    // §2.B SELECT DISTINCT
    "q24_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus")
        .distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // SURVEY §2.A A6: fan-out query (distributed union over segments).
    // segment_id is the shard key; one declarative query covers all
    // shards and Catalyst parallelizes — trough needed client-side asyncio.
    "q25_fanout_union" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("segment_id", concat(lit("seg"), ($"o_custkey" % 16).cast("string")))
        .groupBy($"segment_id")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"segment_id")
    }),

    // SURVEY §2.A A7: segment pruning by regex (CONNECT MATCHING)
    "q26_segment_regex" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("segment_id", concat(lit("seg"), ($"o_custkey" % 16).cast("string")))
        .filter($"segment_id".rlike("^seg1[0-3]$"))
        .groupBy($"segment_id")
        .agg(count(lit(1)).as("n"))
        .orderBy($"segment_id")
    }),

    // SURVEY §2.A A9: REGEXP UDF with trough's exact NULL semantics
    "q27_regexp_udf" -> ((s, dir) => {
      import s.implicits._
      TroughFunctions.register(s)
      t(s, dir, "part")
        .select(
          $"p_partkey",
          $"p_type",
          expr("REGEXP('^(ECONOMY|LARGE)', p_type)").as("matched"))
        .filter($"p_partkey" % 20 === 0)
        .orderBy($"p_partkey")
    }),

    // SURVEY §2.A A10: SEEDCRAWLEDSTATUS UDF over crawler-ish codes
    "q28_seedcrawledstatus" -> ((s, dir) => {
      import s.implicits._
      TroughFunctions.register(s)
      t(s, dir, "events")
        .filter($"event_id" % 10 === 0)
        .withColumn(
          "code",
          when($"event_id" % 7 === 0, -9998)
            .when($"event_id" % 7 === 1, -5003)
            .when($"event_id" % 7 === 2, 0)
            .when($"event_id" % 7 === 3, 200)
            .when($"event_id" % 7 === 4, 301)
            .when($"event_id" % 7 === 5, 404)
            .otherwise(-1))
        .select(
          $"event_id",
          $"code",
          expr("SEEDCRAWLEDSTATUS(cast(code AS string))").as("status"))
        .orderBy($"event_id")
    }),

    // -------------------------------------------------------------------
    // Training-data pipeline operators (north-star extensions beyond
    // trough parity — dedup, similarity search, text analysis, multimodal)
    // -------------------------------------------------------------------

    // Exact dedup: one hash-partitioned aggregation; map-side combine
    // collapses duplicates before the shuffle.
    "q29_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Dedup.exact(t(s, dir, "documents"))
        .select(md5($"norm_text").as("text_hash"), $"keep_id", $"n_dups")
        .orderBy($"keep_id")
    }),

    // MinHash+LSH near-dup join (b=32,r=2 ⇒ recall ≈ 1-6e-7 at j=0.6),
    // verified with exact integer-arithmetic Jaccard — hash-matches the
    // exact-join oracle while pruning the quadratic candidate space.
    "q30_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      Dedup.minhashCandidates(t(s, dir, "documents"), thresholdNum = 6, thresholdDen = 10)
        .orderBy($"doc_a", $"doc_b")
    }),

    // SimHash near-dup: 60-bit md5-family simhash, 16-bit-chunk banding
    // (lossless for hamming ≤ 3 by pigeonhole), exact bit_count verify.
    // The md5 token-hash family is recomputable in DuckDB SQL, so the
    // oracle independently derives every simhash and checks the banding
    // found ALL pairs at hamming ≤ 3 — a hard losslessness proof on the
    // exact code path the production XXH64 kernel also runs through.
    "q31_simhash" -> ((s, dir) => {
      import s.implicits._
      PipelineFunctions.register(s)
      graft.functions.Md5Expressions.register(s)
      Dedup.simhashNearDup(t(s, dir, "documents"), maxHamming = 3,
          simExpr = call_function("md5_simhash60", $"text"))
        .orderBy($"doc_a", $"doc_b")
    }),

    // Exact 3-gram-shingle Jaccard similarity join. Strategy is
    // AUTO-SELECTED by a sampled skew probe (r15): count-join on dense
    // vocabularies (this corpus: 546 est. pairs/doc → 2.2 s, vs
    // PPJoin 3.5 s), PPJoin prefix filtering on Zipfian ones (probed
    // Zipf(1.05) 60 k-doc corpus: 76 652 pairs/doc → 8.5 s vs
    // count-join 31.7 s) — hot shingles make the plain inverted-index
    // join quadratic at 100×, so the default must not assume density.
    "q32_jaccard_exact" -> ((s, dir) => {
      import s.implicits._
      Dedup.jaccardJoinExact(t(s, dir, "documents"),
          thresholdNum = 3, thresholdDen = 10, shingleLen = 3)
        .orderBy($"doc_a", $"doc_b")
    }),

    // Brute-force cosine top-k: broadcast 10 query vectors against the
    // corpus — one scan of the big side, no corpus shuffle.
    "q33_embed_knn" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceKnn(emb, emb.filter($"vec_id" < 10), k = 5)
        .select($"query_id", $"neighbor_id", $"rnk", round($"score", 6).as("score"))
        .orderBy($"query_id", $"rnk")
    }),

    // Top-20 most-similar embedding pairs on a 10% slice (deterministic
    // regardless of the corpus's similarity structure).
    "q34_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      Similarity.bruteForceNearDup(
          t(s, dir, "embeddings").filter($"vec_id" % 10 === 0), threshold = -1.0)
        .orderBy($"score".desc, $"id_a", $"id_b")
        .limit(20)
        .select($"id_a", $"id_b", round($"score", 6).as("score"))
    }),

    // Language ID: marker-word n-gram heuristic, argmax with fixed
    // tie-break — pure Catalyst HOF expressions, fully SQL-expressible.
    "q35_langid" -> ((s, dir) => {
      import s.implicits._
      val toks = TextOps.tokens($"text")
      t(s, dir, "documents")
        .select(
          $"doc_id",
          $"lang",
          TextOps.langId(toks).as("pred"),
          TextOps.markerHits(toks, TextOps.langMarkers("en")).as("c_en"),
          TextOps.markerHits(toks, TextOps.langMarkers("es")).as("c_es"))
        .orderBy($"doc_id")
    }),

    // Quality scoring: length / avg word length / stopword ratio.
    "q36_quality" -> ((s, dir) => {
      import s.implicits._
      val toks = TextOps.tokens($"text")
      val n = size(toks).cast("long")
      val stops = TextOps.markerHits(toks, TextOps.langMarkers("en"))
      t(s, dir, "documents")
        .select(
          $"doc_id",
          length($"text").cast("long").as("chars"),
          n.as("n_tokens"),
          (((length($"text") - (n - lit(1))).cast("double")) / n.cast("double"))
            .as("avg_word_len"),
          (stops.cast("double") / n.cast("double")).as("stop_ratio"),
          when(n < 20, "short").when(stops * 10 >= n, "stopword_heavy")
            .otherwise("ok").as("band"))
        .orderBy($"doc_id")
    }),

    // Token counting: whitespace split + BPE-ish regex token count.
    "q37_tokens" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          size(TextOps.tokens($"text")).cast("long").as("ws_tokens"),
          size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("re_tokens"))
        .orderBy($"doc_id")
    }),

    // Document fingerprint (content hash; rolling-hash winnowing variant
    // is q40): canonical md5 of the normalized text.
    "q38_fingerprint" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          md5(lower(trim($"text"))).as("fp"),
          substring(md5(lower(trim($"text"))), 1, 8).as("fp_head"))
        .orderBy($"doc_id")
    }),

    // Multimodal plumbing: binary payload column + mapPartitions decode
    // stub + feature projection. Payload is unhex(md5(text)) so the
    // oracle can reproduce byte_len/head_hex; width/height come from the
    // stub decoder's first/last-byte rule.
    "q39_multimodal" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeFeatures(Multimodal.withFakeMedia(t(s, dir, "documents")))
        .select($"media_id", $"byte_len", $"width".cast("long").as("width"),
          $"height".cast("long").as("height"), $"head_hex")
        .orderBy($"media_id")
    }),

    // Winnowing fingerprints (Schleimer et al.): k-gram hashes,
    // per-window minima, sorted distinct. The md5 gram-hash family lets
    // the DuckDB oracle replicate the full winnow (gram reconstruction,
    // window minima via list slices) — hard-verifying the native
    // kernel's window-selection logic, which is hash-agnostic.
    "q40_winnow" -> ((s, dir) => {
      import s.implicits._
      graft.functions.Md5Expressions.register(s)
      t(s, dir, "documents")
        .select($"doc_id",
          explode(call_function("winnow_fingerprints_md5", $"text", lit(4), lit(8))).as("fp"))
        .orderBy($"doc_id", $"fp")
    }),

    // SRP-LSH bucketed similarity (the ANN scale path): compare only
    // within sign-random-projection buckets — multi-probing the 2
    // nearest-boundary flips for recall — then verify with exact cosine.
    // md5-Rademacher hyperplanes are recomputable in DuckDB SQL, so the
    // oracle independently assigns every vector's bucket AND its probe
    // set (same lowest-|margin| ranking) and replays the probe join +
    // cosine verify — bucketing, probing, and scoring all hard-checked.
    "q41_embed_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      // adaptive width: bucket occupancy stays ~8 as N grows (the sf1
      // checkpoint measured fixed-width SRP at 75× for 10× data); the
      // oracle recomputes the same GREATEST(8, CEIL(LOG2(...))) from
      // count(*), so both engines pick identical planes at any SF
      // N from parquet footers (driver-side metadata, no Spark job) —
      // an adaptive parameter must not cost a corpus scan
      val planes = Similarity.srpPlanesFor(Tables.fastRowCount(emb))
      Similarity.lshBucketed(emb, threshold = 0.2,
          numPlanes = planes, dim = 64, multiProbe = 2,
          planesOverride = Similarity.md5RademacherPlanes(planes, 64))
        .select($"id_a", $"id_b", round($"score", 6).as("score"))
        .orderBy($"id_a", $"id_b")
    }),

    // Batch sessionization: gap-based sessions via lag + running sum —
    // the classic composition, partition-parallel per user (the
    // streaming analog with true state lives in streaming/EventStreams).
    // Epoch seconds on both engines, schema-adaptive: the generated
    // events.ts has shipped both as TIMESTAMP(µs) (naive, UTC session —
    // unix_seconds) and as ns-since-epoch int64 (div 1e9); DuckDB's
    // date_part('epoch') of the naive timestamp agrees with either.
    "q42_sessionize" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
      val gapSec = 4 * 3600L
      val ev = t(s, dir, "events")
      val sec = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
        case _ => unix_seconds($"ts".cast("timestamp"))
      }
      ev.select($"user_id", $"event_id", sec.as("sec"), $"value")
        .withColumn("is_new",
          when($"sec" - lag($"sec", 1).over(w) > gapSec || lag($"sec", 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum($"is_new").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_no")
        .agg(
          min($"sec").as("session_start"),
          max($"sec").as("session_end"),
          count(lit(1)).as("n_events"),
          round(sum($"value"), 2).as("total_value"))
        .orderBy($"user_id", $"session_no")
    }),

    // Correlated EXISTS / NOT EXISTS — Catalyst's RewritePredicateSubquery
    // decorrelates both into semi/anti joins (the §2.B subquery surface
    // in its SQL form; q09/q10 are the declarative equivalents).
    "q45_exists" -> ((s, dir) => {
      Seq("customer", "orders").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
      """)
    }),

    // ROLLUP with grouping_id: multi-level aggregation in one pass —
    // beyond SQLite's surface (it has no grouping sets at all), free on
    // Catalyst, and exactly oracle-checkable in DuckDB.
    "q44_rollup" -> ((s, dir) => {
      import s.implicits._
      // Two-level rollup (r19): aggregate the fact ONCE at the finest
      // (flag, status) grain, then ROLLUP the tiny aggregate — a plain
      // .rollup on the fact plans Expand×3 BEFORE the partial
      // aggregation, tripling every fact row (and its per-row decimal
      // cast) through the hash agg; at 100 TB that's 2 extra copies of
      // the corpus through the first shuffle for information the
      // 6-row base grain already carries. count/sum re-aggregate
      // losslessly (sum of counts, sum of decimal sums).
      val base = t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("__n"),
          // LONG sum, not DECIMAL (r19): l_quantity is integral by
          // construction (TPC-H quantities are 1..50; probed 0
          // fractional rows at every SF) and corpus totals sit far
          // below 2^53, so an integer sum is exact and order-
          // independent — identical to the decimal sum the oracle
          // computes (hash-verified), without Decimal(28,2) buffer
          // arithmetic in the per-row partial-agg hot path (guide §1.2
          // per-task work; the fact scan+partial agg is this query's
          // only non-trivial job).
          sum($"l_quantity".cast("long")).as("__q"))
      base
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          sum($"__n").as("n"),
          round(sum($"__q"), 2).cast("double").as("sum_qty"))
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // IVF ANN: every 25th vector is a coarse centroid (deterministic
    // quantizer stand-in), nprobe=2 lists searched per query, exact
    // cosine within probed lists.
    "q43_embed_ivf" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      // stride ≈ √N keeps nlist ≈ √N (a FIXED stride makes nlist grow
      // linearly and the assignment pass quadratic); the oracle derives
      // the same GREATEST(25, CEIL(SQRT(count(*)))) stride. N comes
      // from parquet footers — no extra count job (VERDICT r10 #4)
      Similarity.ivfKnn(emb, emb.filter($"vec_id" < 10), k = 5,
          centroidStride = Similarity.ivfStrideFor(Tables.fastRowCount(emb)), nprobe = 2)
        .select($"query_id", $"neighbor_id", $"rnk", round($"score", 6).as("score"))
        .orderBy($"query_id", $"rnk")
    }),

    // -------------------------------------------------------------------
    // SQLite read-dialect fidelity (raw SQLite SQL through the engine's
    // dialect layer — VERDICT r2 item 1). Each runs the exact SQL a
    // trough user would send; the oracle is the DuckDB-dialect
    // equivalent.
    // -------------------------------------------------------------------

    // SQLite LIKE is ASCII-case-insensitive: uppercase pattern must match
    // the lowercase corpus (Spark's own LIKE would return zero rows).
    "q46_sqlite_like" -> ((s, dir) => sqliteSql(s, dir, Seq("part"),
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%RED%' ORDER BY p_partkey")),

    // SQLite integer division: BIGINT/BIGINT truncates (Spark's / would
    // yield DOUBLE), including the constant-folded literal case.
    "q47_sqlite_intdiv" -> ((s, dir) => sqliteSql(s, dir, Seq("orders"),
      "SELECT o_orderkey, o_orderkey/100 AS div100, o_orderkey % 7 AS m7, 7/2 AS c " +
        "FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey")),

    // SQLite date/time family: strftime / date / julianday over the
    // orders dates (DuckDB's julian() counts from noon — oracle shifts).
    "q48_sqlite_datetime" -> ((s, dir) => sqliteSql(s, dir, Seq("orders"),
      "SELECT o_orderkey, strftime('%Y-%m', CAST(o_orderdate AS STRING)) AS ym, " +
        "date(CAST(o_orderdate AS STRING)) AS d, " +
        "julianday(CAST(o_orderdate AS STRING)) AS jd " +
        "FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey")),

    // SQLite scalar names: iif, 2-arg min/max, quote.
    "q49_sqlite_fnnames" -> ((s, dir) => sqliteSql(s, dir, Seq("supplier"),
      "SELECT s_suppkey, iif(s_acctbal >= 5000, 'rich', 'modest') AS band, " +
        "max(s_acctbal, 2000.0) AS hi, min(s_acctbal, 2000.0) AS lo, " +
        "quote(s_name) AS qn FROM supplier ORDER BY s_suppkey")),

    // SQLite total() + infix NOT GLOB with a character class. total over
    // an integer column: integer sums are exact in DOUBLE, so no
    // cross-engine rounding exposure.
    "q50_sqlite_total_glob" -> ((s, dir) => sqliteSql(s, dir, Seq("supplier"),
      "SELECT s_nationkey AS nk, total(s_suppkey) AS tot, count(*) AS n " +
        "FROM supplier WHERE s_name NOT GLOB '*[05]' " +
        "GROUP BY s_nationkey ORDER BY nk")),

    // GROUPS-mode window frame + EXCLUDE CURRENT ROW — the two SQLite
    // frame features Spark's windows lack, emulated exactly:
    // GROUPS(p,f) == RANGE(p,f) over dense_rank of the ORDER BY key
    // (WindowCompat), EXCLUDE CURRENT ROW == frame sum − own value.
    // The oracle recomputes the frames with a JOIN formulation
    // (per-group sums, |Δdense_rank| <= 1 self-join) — a different
    // algorithm agreeing row-for-row. Closes SURVEY §2.B's windows
    // partial. Integer sums: exact on both engines.
    "q52_window_groups_frame" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber",
        $"l_returnflag", $"l_quantity".cast("long").as("qty"), $"l_shipdate")
      graft.functions.WindowCompat.groupsFrameSum(li, "frame_sum", $"qty",
          Seq($"l_returnflag"), $"l_shipdate", 1, 1)
        .withColumn("frame_sum_excl", $"frame_sum" - $"qty")
        .where($"l_orderkey" % 211 === 0)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          $"frame_sum", $"frame_sum_excl")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // WITH RECURSIVE — SQLite supports it and Spark 4 executes it
    // natively (UnionLoop), so SURVEY §2.B's one "no Spark equivalent"
    // note is closed: recursive month series joined against orders.
    "q51_recursive_cte" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_q51")
      s.sql("""WITH RECURSIVE m(mn) AS (
          SELECT 1 UNION ALL SELECT mn + 1 FROM m WHERE mn < 12)
        SELECT CAST(mn AS BIGINT) AS mn, count(o_orderkey) AS n_orders
        FROM m LEFT JOIN orders_q51 ON month(o_orderdate) = mn
        GROUP BY mn ORDER BY mn""")
    }),

    // Native .sqlite segment ingest, end-to-end: write the documents
    // table into a REAL SQLite database via the sqlite3 CLI (512-byte
    // pages force interior B-tree pages; long document texts force
    // overflow chains), parse it back with the pure-Scala SqliteFile
    // reader (no JDBC, no native lib), commit through the segment
    // store's staged-swap path, and read through the engine. The oracle
    // sees none of that machinery — it just reads documents.parquet —
    // so a hash match proves the whole ingest pipeline is lossless.
    "q53_sqlite_ingest" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q53")
      // fixture streams driver-side (sqlite3 writes a local file), but
      // bounded: sorted toLocalIterator holds one result partition, and
      // the script goes straight to disk — never the corpus in memory
      val script = tmp.resolve("build.sql")
      val w = java.nio.file.Files.newBufferedWriter(script)
      w.write("PRAGMA page_size=512;\nCREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);\n" +
        "BEGIN;\n") // one txn: per-INSERT autocommit would fsync 5000×
      val it = t(s, dir, "documents").select($"doc_id", $"text")
        .orderBy($"doc_id").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val lit =
          if (r.isNullAt(1)) "NULL" else "'" + r.getString(1).replace("'", "''") + "'"
        w.write(s"INSERT INTO docs VALUES (${r.getLong(0)}, $lit);\n")
      }
      w.write("COMMIT;\n")
      w.close()
      val db = tmp.resolve("docs.sqlite")
      val rc = graft.engine.SqliteCli.runFile(db.toString, script)
      require(rc == 0, s"sqlite3 exited $rc")
      val store = new graft.engine.SegmentStore(s, tmp.resolve("store").toString)
      val eng = new graft.engine.TroughEngine(s, store, new graft.engine.SchemaRegistry)
      store.ingestSqliteSegment(db.toString, "q53seg")
      eng.read("q53seg", "SELECT doc_id, text FROM docs;")
        .select($"doc_id", length($"text").cast("long").as("n_chars"), $"text")
        .orderBy($"doc_id")
    }),

    // The inverse migration, oracle-pinned: documents land in a segment,
    // export writes a REAL SQLite database (pure-Scala writer: B-tree
    // bulk load, overflow chains for long texts, record encoding),
    // ingest reads it back, and the result must hash-match the raw
    // parquet — if any byte of the writer→reader round trip lied, the
    // oracle catches it. Complements q53 (which pins the reader against
    // sqlite3-written bytes; here the writer's bytes are the middle).
    "q55_sqlite_export_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q55")
      val store = new graft.engine.SegmentStore(s, tmp.resolve("store").toString)
      val eng = new graft.engine.TroughEngine(s, store, new graft.engine.SchemaRegistry)
      store.provision("q55src",
        "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);")
      store.replaceTableData("q55src", "docs",
        t(s, dir, "documents").select($"doc_id", $"text"))
      val db = tmp.resolve("export.sqlite")
      store.exportSqliteSegment("q55src", db.toString)
      store.ingestSqliteSegment(db.toString, "q55back")
      eng.read("q55back", "SELECT doc_id, text FROM docs;")
        .select($"doc_id", length($"text").cast("long").as("n_chars"), $"text")
        .orderBy($"doc_id")
    }),

    // Cluster-scale migration end-to-end: documents shard into 16 real
    // .sqlite files by doc_id, with TWO crash-shaped shards — one whose
    // schema and rows exist only in an uncheckpointed WAL sidecar, and
    // one copied mid-transaction in rollback-journal mode (the hot
    // -journal's pre-images + truncation must restore the committed
    // rows). Ingest runs through the executor-distributed path (catalog
    // + decode in Spark tasks, per-segment commits), and readAll reads
    // the whole fleet back as ONE hive-partitioned scan. Lossless
    // against the raw parquet, so the oracle is a plain projection.
    "q56_sqlite_ingest_distributed" -> ((s, dir) => {
      import s.implicits._
      val shards = 16
      val tmp = java.nio.file.Files.createTempDirectory("graft-q56")
      // one sorted pass, streamed: rows arrive grouped by shard via
      // toLocalIterator (one result partition resident), and each
      // shard's build script goes straight to disk — the driver never
      // holds the corpus, so the fixture reports honestly at any SF
      val it = t(s, dir, "documents").select($"doc_id", $"text")
        .withColumn("shard", pmod($"doc_id", lit(shards.toLong)).cast("int"))
        .orderBy($"shard", $"doc_id").toLocalIterator()
      var pending: org.apache.spark.sql.Row = if (it.hasNext) it.next() else null
      val files: Map[String, String] = (0 until shards).map { k =>
        val snap = tmp.resolve(s"part$k.sqlite")
        val walShard = k == 3
        val jrnShard = k == 7
        val live = if (walShard || jrnShard) tmp.resolve(s"live$k.sqlite") else snap
        val script = tmp.resolve(s"build$k.sql")
        val w = java.nio.file.Files.newBufferedWriter(script)
        if (walShard) w.write("PRAGMA journal_mode=WAL;\n")
        if (jrnShard) w.write("PRAGMA journal_mode=DELETE;\nPRAGMA cache_size=2;\n")
        w.write("CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);\nBEGIN;\n")
        while (pending != null && pending.getInt(2) == k) {
          val lit = if (pending.isNullAt(1)) "NULL"
            else "'" + pending.getString(1).replace("'", "''") + "'"
          w.write(s"INSERT INTO docs VALUES (${pending.getLong(0)}, $lit);\n")
          pending = if (it.hasNext) it.next() else null
        }
        w.write("COMMIT;\n")
        if (walShard) // copy BEFORE close: the close-time checkpoint never ran
          w.write(s".shell cp \"$live\" \"$snap\"\n.shell cp \"$live-wal\" \"$snap-wal\"\n")
        if (jrnShard) // crash mid-UPDATE: the tiny cache spilled mutated
          // pages into the main file; only the hot journal undoes them
          w.write("BEGIN;\nUPDATE docs SET text = 'CORRUPT-' || doc_id;\n" +
            s".shell cp \"$live\" \"$snap\"\n.shell cp \"$live-journal\" \"$snap-journal\"\n" +
            "ROLLBACK;\n")
        w.close()
        (k, live, script, snap)
      }.map { case (k, live, script, snap) =>
        // scripts were written in ONE sequential iterator pass above;
        // the 16 sqlite3 builds are independent subprocesses — run them
        // from a pool (guide §2.6 analog for driver-side fixture work)
        (k, snap, java.util.concurrent.CompletableFuture.supplyAsync(() =>
          graft.engine.SqliteCli.runFile(live.toString, script)))
      }.map { case (k, snap, fut) =>
        val rc = fut.get()
        require(rc == 0, s"sqlite3 exited $rc for shard $k")
        s"q56seg$k" -> snap.toString
      }.toMap
      val store = new graft.engine.SegmentStore(s, tmp.resolve("store").toString)
      val eng = new graft.engine.TroughEngine(s, store, new graft.engine.SchemaRegistry)
      val res = store.ingestSqliteSegmentsDistributed(files)
      val failed = res.collect { case (seg, t) if t.isFailure => seg -> t.failed.get.getMessage }
      require(failed.isEmpty, s"distributed ingest failures: $failed")
      eng.readAll("SELECT doc_id, text FROM docs;", "q56seg.*")
        .select($"doc_id", length($"text").cast("long").as("n_chars"), $"text")
        .orderBy($"doc_id")
    }),

    // SQL views end to end: a write script CREATES the view (stored as
    // TEXT, SQLite's own contract — lang_createview.html), the segment
    // round-trips through a real .sqlite file (the view rides
    // sqlite_master with rootpage=0), and the re-ingested view answers
    // the query. The oracle inlines the view body over raw parquet —
    // if the definition was lost, mangled, or mis-resolved anywhere in
    // write→export→ingest→read, the hash diverges.
    "q57_view_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q57")
      val store = new graft.engine.SegmentStore(s, tmp.resolve("store").toString)
      val schemas = new graft.engine.SchemaRegistry
      val eng = new graft.engine.TroughEngine(s, store, schemas)
      schemas.put("q57schema",
        "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);")
      eng.provisionWritable("q57src", "q57schema")
      store.replaceTableData("q57src", "docs",
        t(s, dir, "documents").select($"doc_id", $"text"))
      eng.write("q57src",
        "CREATE VIEW third_docs AS SELECT doc_id, text FROM docs WHERE doc_id % 3 = 0;")
      val db = tmp.resolve("export.sqlite")
      store.exportSqliteSegment("q57src", db.toString)
      store.ingestSqliteSegment(db.toString, "q57back")
      eng.read("q57back",
        "SELECT doc_id, length(text) AS n_chars FROM third_docs;")
        .select($"doc_id", $"n_chars".cast("long").as("n_chars"))
        .orderBy($"doc_id")
    }),

    // The reference wire contract end-to-end over REAL HTTP: documents
    // load into a provisioned segment, a SELECT goes to the read
    // server's port as a trough client would send it, and the streamed
    // JSON array (read.py:33-52 byte shape) parses back into rows. A
    // hash match against the raw parquet proves the serving path —
    // gate, segment resolution, query, JSON value rules — lossless.
    "q58_http_read" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q58")
      val store = new graft.engine.SegmentStore(s, tmp.resolve("store").toString)
      val eng = new graft.engine.TroughEngine(s, store, new graft.engine.SchemaRegistry)
      store.provision("q58seg",
        "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);")
      store.replaceTableData("q58seg", "docs",
        t(s, dir, "documents").select($"doc_id", $"text"))
      val facade = new graft.server.HttpFacade(eng,
        readPort = 0, writePort = 0, syncPort = 0).start()
      try {
        val client = java.net.http.HttpClient.newHttpClient()
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
              s"http://localhost:${facade.boundReadPort}/?segment=q58seg"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              "SELECT doc_id, text FROM docs;"))
            .build(),
          java.net.http.HttpResponse.BodyHandlers.ofString(
            java.nio.charset.StandardCharsets.UTF_8))
        require(resp.statusCode() == 200, s"read server answered ${resp.statusCode()}")
        val body = resp.body()
        require(body.startsWith("[") && body.endsWith("]\n"), "not the wire shape")
        // rows join with ",\n" and literal newlines never occur inside
        // a JSON string (escaped), so the split is exact
        val rows = body.stripPrefix("[").stripSuffix("]\n").split(",\n").toIndexedSeq
          .filter(_.nonEmpty)
        s.read
          .schema("doc_id LONG, text STRING")
          .json(s.createDataset(rows))
          .orderBy($"doc_id")
      } finally facade.stop()
    }),

    // The full SQLite trigger surface live on the write path (A4/§2.B
    // DDL-DML row; TriggerSpec holds the sqlite3 differential): a
    // BEFORE INSERT … WHEN … RAISE(IGNORE) filter drops short docs
    // row-by-row, an AFTER INSERT audit program fires per surviving
    // row with NEW.* bound — then the audit table itself is the
    // result. The oracle replays both programs declaratively, so row
    // membership AND per-row computed values are pinned.
    "q59_trigger_audit" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q59")
      val store = new graft.engine.SegmentStore(s, tmp.resolve("store").toString)
      val schemas = new graft.engine.SchemaRegistry
      val eng = new graft.engine.TroughEngine(s, store, schemas)
      schemas.put("q59schema",
        "CREATE TABLE staging (doc_id INTEGER PRIMARY KEY, text TEXT);\n" +
          "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);\n" +
          "CREATE TABLE audit (doc_id INTEGER, n_chars INTEGER, tag TEXT);")
      eng.provisionWritable("q59seg", "q59schema")
      store.replaceTableData("q59seg", "staging",
        t(s, dir, "documents").select($"doc_id", $"text"))
      eng.write("q59seg",
        "CREATE TRIGGER filter_short BEFORE INSERT ON docs " +
          "WHEN length(NEW.text) < 10 BEGIN SELECT RAISE(IGNORE); END;" +
          "CREATE TRIGGER audit_ins AFTER INSERT ON docs BEGIN " +
          "INSERT INTO audit VALUES (NEW.doc_id, length(NEW.text), " +
          "CASE WHEN length(NEW.text) > 500 THEN 'long' ELSE 'short' END); END;" +
          "INSERT INTO docs SELECT doc_id, text FROM staging WHERE doc_id % 23 = 0;")
      eng.read("q59seg",
        "SELECT doc_id, n_chars, tag FROM audit;")
        .select($"doc_id", $"n_chars".cast("long").as("n_chars"), $"tag")
        .orderBy($"doc_id")
    }),

    // Near-dup CLUSTER ASSIGNMENT: the step after pair generation.
    // MinHash-LSH pairs (the q30 pipeline) feed alternating
    // Large-Star/Small-Star connected components (Kiveris et al.,
    // SoCC'14); each doc gets its component's min id as cluster_id, so
    // "keep canonical" is doc_id = cluster_id. The oracle recomputes the
    // exact pair graph in SQL and closes it with a recursive CTE — a
    // full independent check of the distributed star iterations.
    "q60_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val pairs = Dedup.minhashCandidates(t(s, dir, "documents"),
        thresholdNum = 6, thresholdDen = 10)
      Dedup.connectedComponents(pairs).orderBy($"doc_id")
    }),

    // Real multimodal decode: deterministic PNGs generated per doc_id
    // (width/height/shade arithmetic in the id), decoded with
    // javax.imageio inside the per-partition batch contract. Every 97th
    // id carries a corrupt payload — the decoder must isolate it to a
    // null-dims row (ok=false), never fail the partition. PNG is
    // lossless, so mean_px replays the encoded shade exactly and the
    // oracle derives every column arithmetically.
    "q54_image_decode" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeImageFeatures(
          Multimodal.syntheticImages(t(s, dir, "documents")))
        .select($"media_id", $"width", $"height", $"mean_px", $"ok")
        .orderBy($"media_id")
    }),

    // Gopher-style repetition filters (Rae et al. 2021 §A1.1) over
    // token bigrams: top-gram fraction + duplicated-gram fraction per
    // document. Entirely higher-order functions — one sort + one
    // aggregate pass per row, zero shuffle, so the operator is
    // scan-bound at any corpus size.
    "q61_repetition" -> ((s, dir) => {
      import s.implicits._
      // coalesce pins the NULL-text contract to the oracle's (0-count
      // row, not a NULL row) instead of leaning on the corpus never
      // containing NULLs (ADVICE r9 #3). Native kernel (r17,
      // GramRepetitionStats): one byte pass + sort + run-length pass
      // per row — the HOF form's per-window gram strings dominated the
      // scan; TextOps.gramRepetition remains the string-exact
      // comparator the spec pins the kernel against.
      graft.functions.VectorExpressions.register(s)
      t(s, dir, "documents")
        .select($"doc_id",
          call_function("gram_repetition_stats",
            coalesce($"text", lit("")), lit(2)).as("st"))
        .select($"doc_id", $"st.n".as("n_bigrams"),
          $"st.top".as("top_bigram_count"),
          when($"st.n" === 0, 0d)
            .otherwise($"st.top".cast("double") / $"st.n")
            .as("top_bigram_frac"),
          when($"st.n" === 0, 0d)
            .otherwise($"st.dups".cast("double") / $"st.n")
            .as("dup_bigram_frac"))
        .orderBy($"doc_id")
    }),

    // PII detection + redaction. The corpus is synthetic (no natural
    // PII), so the query first DERIVES a PII-bearing column from the
    // data itself — same derivation in the oracle — then counts and
    // redacts with the shared Java/RE2-subset patterns. Stateless
    // regex work: scan-bound, codegen'd, no shuffle.
    "q62_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val aug = concat($"text",
        lit(" contact user"), $"doc_id".cast("string"),
        lit("@mail"), ($"doc_id" % 7).cast("string"),
        lit(".com from 10."), ($"doc_id" % 256).cast("string"),
        lit("."), (($"doc_id" * 7) % 256).cast("string"),
        lit("."), ($"doc_id" % 254 + 1).cast("string"),
        lit(" call +1-555-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
      t(s, dir, "documents")
        .select($"doc_id", aug.as("t2"))
        .select($"doc_id",
          regexp_count($"t2", lit(TextOps.EmailRe)).cast("long").as("n_emails"),
          regexp_count($"t2", lit(TextOps.Ipv4Re)).cast("long").as("n_ips"),
          regexp_count($"t2", lit(TextOps.PhoneRe)).cast("long").as("n_phones"),
          TextOps.redactPii($"t2").as("redacted"))
        .orderBy($"doc_id")
    }),

    // Benchmark decontamination: flag corpus documents sharing any
    // 5-token gram with the "benchmark" slice (doc_id % 13 == 0 stands
    // in for an external eval set). r18 shape
    // (TextOps.exactDecontaminate): the benchmark's distinct gram
    // hashes are a bounded collect+broadcast (eval sets are MBs), and
    // the per-document shared count runs inside ONE codegen'd scan
    // expression — the corpus is never exploded, joined, or shuffled
    // (the previous explode+broadcast-join materialized every corpus
    // gram as a row before the join could drop it).
    "q63_decontam" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      TextOps.exactDecontaminate(
          docs.filter($"doc_id" % 13 =!= 0),
          docs.filter($"doc_id" % 13 === 0),
          gramLen = 5)
        .orderBy($"doc_id")
    }),

    // FTS5 full-text MATCH as a pipeline operator (r11, engine/Fts5):
    // fts5 query syntax — terms, a phrase, a prefix, AND/OR at probed
    // precedence — compiled to the codegen'd unicode61 token
    // predicates. Scan-bound, no shuffle: the 100 TB shape is a
    // predicate inside whole-stage codegen, not an index build.
    "q64_fts_match" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .where(graft.engine.Fts5.matchPredicate(
          "data AND \"batch batch\" OR filt*", Map("text" -> $"text")))
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Benchmark decontamination via the AUTO-SELECTING entry (r19,
    // TextOps.bloomDecontaminate → decontaminate): a bounded probe
    // measures the benchmark's distinct gram set; under the broadcast
    // threshold (always, at bench SFs) the exact broadcast-set kernel
    // runs — above it, the Bloom prefilter + residual-join path (one
    // bounded codegen'd literal filter, exact semi join on survivors;
    // forced in specs via maxExactGrams = 0). The result is EXACT on
    // both paths, so the DuckDB oracle hash-matches it.
    "q66_decontam_bloom" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      TextOps.bloomDecontaminate(
          docs.filter($"doc_id" % 11 =!= 0),
          docs.filter($"doc_id" % 11 === 0),
          gramLen = 5)
        .orderBy($"doc_id")
    }),

    // FTS5 configured tokenizers end to end (r15, Fts5.Tok): the same
    // codegen'd token expressions under a non-default tokenize= —
    // here `unicode61 separators 'a'` (every raw 'a' splits a run) —
    // driving both a MATCH predicate and per-doc token counts. Still
    // scan-bound, zero shuffle.
    "q65_fts_tokenize" -> ((s, dir) => {
      import s.implicits._
      import graft.engine.{Fts5, Fts5Tokens}
      import org.apache.spark.sql.graft.SqlInternals
      val tok = Fts5.parseTokenize("unicode61 separators 'a'")
      val toks = SqlInternals.column(
        Fts5Tokens(SqlInternals.expression($"text"), tok))
      t(s, dir, "documents")
        .select($"doc_id",
          size(toks).cast("long").as("n_tok"),
          Fts5.matchPredicate("d AND b*", Map("text" -> $"text"),
            tok = tok).cast("int").as("hit"))
        .orderBy($"doc_id")
    }),

    // Cluster-scale OUTBOUND migration end-to-end (r16, the mirror of
    // q56): documents shard into 12 store segments, each segment's
    // .sqlite file is built INSIDE an executor task
    // (SqliteExportKernel — parquet read, in-task sorts, streamed
    // writer, Hadoop-FS push), then the fleet re-ingests through the
    // executor-distributed ingest and reads back as ONE scan. Lossless
    // against raw parquet, so the oracle is a plain projection; any
    // drift in the parquet→B-tree→parquet double conversion breaks the
    // hash.
    "q67_sqlite_export_distributed" -> ((s, dir) => {
      import s.implicits._
      val shards = 12
      val tmp = java.nio.file.Files.createTempDirectory("graft-q67")
      val store = new graft.engine.SegmentStore(s, tmp.resolve("out-store").toString)
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      // per-shard loads are independent single jobs — overlap them from
      // a small pool (guide §2.6) so each job's tail back-fills the
      // next's ramp instead of serializing 12 fixed job costs
      // (measured sf0.1: q67 2.19 -> 0.82 s)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        (0 until shards).map { k =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              store.provision(s"q67seg$k",
                "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);")
              store.replaceTableData(s"q67seg$k", "docs",
                docs.where(pmod($"doc_id", lit(shards.toLong)) === k))
            }
          })
        }.foreach(_.get())
      } finally pool.shutdown()
      val res = store.exportSqliteSegmentsDistributed(
        (0 until shards).map(k => s"q67seg$k"), tmp.resolve("files").toString)
      val failed = res.collect { case (seg, t) if t.isFailure =>
        seg -> t.failed.get.getMessage }
      require(failed.isEmpty, s"distributed export failures: $failed")
      val store2 = new graft.engine.SegmentStore(s, tmp.resolve("back-store").toString)
      val eng2 = new graft.engine.TroughEngine(s, store2, new graft.engine.SchemaRegistry)
      val back = store2.ingestSqliteSegmentsDistributed(
        res.map { case (seg, t) => seg -> t.get })
      val failedBack = back.collect { case (seg, t) if t.isFailure =>
        seg -> t.failed.get.getMessage }
      require(failedBack.isEmpty, s"round-trip ingest failures: $failedBack")
      eng2.readAll("SELECT doc_id, text FROM docs;", "q67seg.*")
        .select($"doc_id", length($"text").cast("long").as("n_chars"), $"text")
        .orderBy($"doc_id")
    }),

    // Exact substring-span dedup accounting (r16, Lee et al. 2022):
    // every 10-token span occurring in ≥2 documents, per-doc duplicated
    // span count and the TOKEN length of their union (what an exact
    // substring dedup pass would cut). One gram-keyed shuffle + one
    // per-doc lead() window — no suffix array, nothing quadratic.
    // hashGrams = true is the 100 TB default (r17): 8-byte gram hashes
    // instead of ~70-byte strings — measured 164.9 -> 53.0 MiB shuffle
    // at sf1 with identical results (the DuckDB oracle re-derives over
    // gram STRINGS and the hashes match — collision-free equivalence)
    "q68_substring_dedup" -> ((s, dir) => {
      import s.implicits._
      Dedup.substringSpans(t(s, dir, "documents"), gramLen = 10,
        hashGrams = true).orderBy($"doc_id")
    }),
    // Substring-dedup CUT (r17): remove every duplicated 10-token span
    // occurrence except the globally first and emit the cleaned text —
    // the pass a trainer actually runs over the q68 accounting. Same
    // single gram shuffle; merged spans from one per-doc window;
    // reconstruction in per-row HOFs.
    "q69_substring_cut" -> ((s, dir) => {
      import s.implicits._
      Dedup.substringDedup(t(s, dir, "documents"), gramLen = 10,
        hashGrams = true).orderBy($"doc_id")
    }),

    // ATTACH/DETACH through the write path (r17): a multi-db script
    // stages rows in an ephemeral ':memory:' db, promotes the keepers
    // into a SECOND segment attached by file path (created at commit —
    // sqlite's create-on-attach), and post-processes them with cross-db
    // qualified UPDATE/DELETE. The queried artifact is the attached
    // segment's committed content; the oracle recomputes it relationally
    // from the documents table. Reference reach: trough's write path
    // runs any script sqlite3 accepts (write.py:40), and modern sqlite3
    // permits ATTACH inside the wrapped transaction (probed).
    "q70_attach" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q70")
      val store = new graft.engine.SegmentStore(s, tmp.resolve("store").toString)
      val schemas = new graft.engine.SchemaRegistry
      val eng = new graft.engine.TroughEngine(s, store, schemas)
      schemas.put("q70schema",
        "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);")
      eng.provisionWritable("q70main", "q70schema")
      store.replaceTableData("q70main", "docs",
        t(s, dir, "documents").select($"doc_id", $"text")
          .where($"doc_id" % 17 === 0))
      val archPath = tmp.resolve("q70arch.sqlite")
      eng.write("q70main",
        "ATTACH ':memory:' AS stage;" +
          "CREATE TABLE stage.picked (doc_id INTEGER, n INTEGER);" +
          "INSERT INTO stage.picked SELECT doc_id, length(text) FROM docs " +
          "WHERE doc_id % 3 = 0;" +
          s"ATTACH '$archPath' AS arch;" +
          "CREATE TABLE arch.kept (doc_id INTEGER PRIMARY KEY, " +
          "n_chars INTEGER, tag TEXT);" +
          "INSERT INTO arch.kept SELECT doc_id, n, 'keep' FROM stage.picked " +
          "WHERE n >= 40;" +
          "UPDATE arch.kept SET tag = 'long' WHERE arch.kept.n_chars > 500;" +
          "DELETE FROM arch.kept WHERE kept.doc_id % 30 = 0;")
      eng.read("q70arch", "SELECT doc_id, n_chars, tag FROM kept;")
        .select($"doc_id", $"n_chars".cast("long").as("n_chars"), $"tag")
        .orderBy($"doc_id")
    }),

    // Sequence packing, concat-and-chunk (GPT-style pretraining): each
    // bucket's token stream cuts every 512 tokens, docs may straddle.
    // Pure windows + one explode — no stateful pass; one shuffle on
    // bucket at any scale. Oracle recomputes the identical window
    // arithmetic in DuckDB.
    "q71_pack_chunks" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      Packing.packChunks(d, capacity = 512, buckets = 8)
        .orderBy($"bucket", $"chunk", $"doc_id", $"tok_start")
    }),

    // Sequence packing, whole-document next-fit bins: docs never split;
    // a doc that would overflow the open bin starts the next. The
    // reset-on-threshold recurrence runs as one O(1)-state scan per
    // bucket after a single hash shuffle; the oracle re-derives it with
    // a recursive CTE advancing all buckets in lockstep.
    "q72_pack_bins" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      Packing.packBins(d, capacity = 1024, buckets = 8)
        .orderBy($"doc_id")
    }),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): quantizer
    // clusters (broadcast stride centroids, the q43 IVF quantizer),
    // within-cluster cosine pairs at the threshold, Large-Star/
    // Small-Star duplicate groups, keep-lowest-id. The synthetic
    // embeddings carry no true near-dups, so the gate threshold sits at
    // 0.35 (probed in-cluster max ≈ 0.47) — exactness of the plumbing
    // is what's verified; τ is a parameter. Oracle re-derives the whole
    // path: same stride, argmax assignment, pair graph, recursive
    // closure.
    "q73_semdedup" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.semanticDedup(emb, threshold = 0.35,
          centroidStride = Similarity.ivfStrideFor(Tables.fastRowCount(emb)))
        .orderBy($"vec_id")
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL — one per query above, same column names, same
  // ORDER BY. Dialect notes: sum(BIGINT)::BIGINT (DuckDB widens to
  // HUGEINT), floor/ceil cast back to BIGINT (DuckDB yields DECIMAL).
  // ---------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20
      ORDER BY l_orderkey, l_linenumber""",
    "q02_project_case" -> """
      SELECT l_orderkey, l_linenumber,
        CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2))), 2) AS DOUBLE) AS charge,
        CASE WHEN l_quantity < 10 THEN 'small'
             WHEN l_quantity < 40 THEN 'medium'
             ELSE 'large' END AS qty_band,
        concat(l_returnflag, '/', l_linestatus) AS flag
      FROM lineitem WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber""",
    "q03_agg_summary" -> """
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        round(avg(l_quantity), 2) AS avg_qty,
        round(avg(l_extendedprice), 2) AS avg_price,
        round(avg(l_discount), 4) AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q04_agg_distinct_having" -> """
      SELECT o_orderpriority, count(*) AS n_orders,
        count(DISTINCT o_custkey) AS n_custs,
        round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_orderpriority HAVING count(*) > 10
      ORDER BY o_orderpriority""",
    "q05_join_revenue" -> """
      SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q06_agg_filter" -> """
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q07_join_left" -> """
      SELECT c_custkey, c_name,
        coalesce(n_orders, 0) AS n_orders,
        round(coalesce(total, 0.0), 2) AS total
      FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total
        FROM orders GROUP BY o_custkey
      ) o ON c_custkey = o_custkey
      ORDER BY c_custkey""",
    "q08_join_full" -> """
      SELECT o_custkey, coalesce(n96, 0) AS n96, coalesce(n97, 0) AS n97
      FROM (SELECT o_custkey, count(*) AS n96 FROM orders
            WHERE extract(year FROM o_orderdate) = 1996 GROUP BY o_custkey) a
      FULL JOIN (SELECT o_custkey, count(*) AS n97 FROM orders
            WHERE extract(year FROM o_orderdate) = 1997 GROUP BY o_custkey) b
      USING (o_custkey)
      ORDER BY o_custkey""",
    "q09_join_semi" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      ORDER BY c_custkey""",
    "q10_join_anti" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND extract(year FROM o_orderdate) = 1997)
      ORDER BY c_custkey""",
    "q11_cross_join" -> """
      SELECT r_name, n_name
      FROM region CROSS JOIN nation
      WHERE r_regionkey <> n_regionkey
      ORDER BY r_name, n_name""",
    "q12_window_topk" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, rnk, c_custkey, c_acctbal
      FROM (SELECT c_nationkey, c_custkey, c_acctbal,
              row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey) AS rnk
            FROM customer)
      WHERE rnk <= 3
      ORDER BY c_nationkey, rnk""",
    "q13_window_running" -> """
      SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running,
        CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        / CAST(count(*) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mavg
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey""",
    "q14_window_rank_funcs" -> """
      SELECT s_suppkey, s_acctbal,
        ntile(4) OVER (ORDER BY s_acctbal, s_suppkey) AS quartile,
        round(percent_rank() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank,
        round(cume_dist() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS cdist,
        dense_rank() OVER (ORDER BY s_nationkey) AS nat_rank
      FROM supplier
      ORDER BY s_suppkey""",
    "q15_limit_offset" -> """
      SELECT p_partkey, p_name, p_retailprice
      FROM part
      ORDER BY p_retailprice DESC, p_partkey
      LIMIT 20 OFFSET 10""",
    "q16_setops" -> """
      SELECT o_custkey, 'both' AS tag FROM (
        SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1997)
      UNION ALL
      SELECT o_custkey, 'only96' AS tag FROM (
        SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1997)
      ORDER BY tag, o_custkey""",
    "q17_cte_subquery" -> """
      WITH big AS (
        SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY o_custkey
      )
      SELECT c_custkey, c_name, round(spend, 2) AS spend
      FROM customer JOIN big ON c_custkey = o_custkey
      WHERE spend > (SELECT avg(spend) FROM big)
        AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
      ORDER BY c_custkey""",
    "q18_strings" -> """
      SELECT p_partkey,
        length(p_name) AS name_len,
        upper(substr(p_name, 1, 8)) AS head,
        lower(p_brand) AS brand_lc,
        replace(p_type, ' ', '_') AS type_us,
        CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        trim(concat('  ', p_name, '  ')) AS trimmed,
        lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
      FROM part WHERE p_partkey % 50 = 0
      ORDER BY p_partkey""",
    "q19_datetime" -> """
      SELECT extract(year FROM o_orderdate) AS yr,
        extract(month FROM o_orderdate) AS mon,
        count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY yr, mon ORDER BY yr, mon""",
    "q20_math" -> """
      SELECT l_orderkey, l_linenumber,
        abs(l_quantity - 25) AS abs_dev,
        round(sqrt(l_extendedprice), 3) AS sq,
        CAST(floor(l_quantity / 7) AS BIGINT) AS fl,
        CAST(ceil(l_discount * 100) AS BIGINT) AS ce,
        round(ln(l_extendedprice + 1), 6) AS lnv,
        l_partkey % 10 AS pmod,
        CAST(sign(l_quantity - 25) AS BIGINT) AS sgn
      FROM lineitem WHERE l_orderkey % 500 = 0
      ORDER BY l_orderkey, l_linenumber""",
    "q21_conditional" -> """
      SELECT o_orderkey,
        coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        CASE WHEN o_totalprice > 200000 THEN 'high'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'low' END AS band,
        CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent
      FROM orders WHERE o_orderkey % 100 = 0
      ORDER BY o_orderkey""",
    "q22_json" -> """
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE event_id % 100 = 0
      ORDER BY event_id""",
    "q23_group_concat" -> """
      SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "q24_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem ORDER BY l_returnflag, l_linestatus""",
    "q25_fanout_union" -> """
      SELECT concat('seg', CAST(o_custkey % 16 AS VARCHAR)) AS segment_id,
        count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY segment_id ORDER BY segment_id""",
    "q26_segment_regex" -> """
      SELECT segment_id, count(*) AS n
      FROM (SELECT concat('seg', CAST(o_custkey % 16 AS VARCHAR)) AS segment_id
            FROM orders)
      WHERE regexp_matches(segment_id, '^seg1[0-3]$')
      GROUP BY segment_id ORDER BY segment_id""",
    "q27_regexp_udf" -> """
      SELECT p_partkey, p_type,
        coalesce(regexp_matches(p_type, '^(ECONOMY|LARGE)'), false) AS matched
      FROM part WHERE p_partkey % 20 = 0
      ORDER BY p_partkey""",
    "q28_seedcrawledstatus" -> """
      SELECT event_id, code,
        CASE WHEN code >= 300 AND code < 400 THEN 'Redirected'
             WHEN code >= 400 THEN concat('Crawled (HTTP error ', CAST(code AS VARCHAR), ')')
             WHEN code > 0 THEN 'Crawled'
             WHEN code IN (0, -5003, -5004) THEN 'Not crawled (queued)'
             WHEN code = -9998 THEN 'Not crawled (blocked by robots)'
             ELSE concat('Not crawled (', CAST(code AS VARCHAR), ')') END AS status
      FROM (SELECT event_id,
              CASE WHEN event_id % 7 = 0 THEN -9998
                   WHEN event_id % 7 = 1 THEN -5003
                   WHEN event_id % 7 = 2 THEN 0
                   WHEN event_id % 7 = 3 THEN 200
                   WHEN event_id % 7 = 4 THEN 301
                   WHEN event_id % 7 = 5 THEN 404
                   ELSE -1 END AS code
            FROM events WHERE event_id % 10 = 0)
      ORDER BY event_id""",
    "q29_dedup_exact" -> """
      SELECT md5(lower(trim(text))) AS text_hash,
        min(doc_id) AS keep_id, count(*) AS n_dups
      FROM documents GROUP BY lower(trim(text))
      ORDER BY keep_id""",
    "q30_minhash_lsh" -> """
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(len(tk)-2),
               i -> array_to_string(tk[i+1:i+3], ' '))) AS s
             FROM toks WHERE len(tk) >= 3),
      ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      j AS (SELECT doc_a, doc_b, inter, (len(x.s) + len(y.s) - inter) AS un
            FROM pairs JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)
      SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter, CAST(un AS BIGINT) AS un
      FROM j WHERE 10 * inter >= 6 * un
      ORDER BY doc_a, doc_b""",
    // Recomputes every document's 60-bit md5-family simhash from
    // scratch (token md5s -> per-bit majority) and pair-joins ALL
    // pairs at hamming <= 3 — if Spark's chunk banding lost a pair,
    // the row sets would differ.
    "q31_simhash" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      hashes AS (SELECT doc_id,
          list_sum(list_transform(range(1,16), i ->
            (strpos('0123456789abcdef', substring(md5(tok), i, 1))-1)::BIGINT
              << ((15-i)*4)))::BIGINT AS h
        FROM toks),
      bits AS (SELECT doc_id, bb.b AS b,
          CASE WHEN 2*sum((h >> bb.b) & 1) > count(*) THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        FROM hashes, (SELECT unnest(range(0,60)) AS b) bb
        GROUP BY doc_id, bb.b),
      sims AS (SELECT doc_id, sum(bit << b)::BIGINT AS sim FROM bits GROUP BY doc_id)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
      FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sim, b.sim)) <= 3
      ORDER BY doc_a, doc_b""",
    "q32_jaccard_exact" -> """
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(len(tk)-2),
               i -> array_to_string(tk[i+1:i+3], ' '))) AS s
             FROM toks WHERE len(tk) >= 3),
      ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      j AS (SELECT doc_a, doc_b, inter, (len(x.s) + len(y.s) - inter) AS un
            FROM pairs JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)
      SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter, CAST(un AS BIGINT) AS un
      FROM j WHERE 10 * inter >= 3 * un
      ORDER BY doc_a, doc_b""",
    "q33_embed_knn" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 10),
      s AS (SELECT query_id, vec_id AS neighbor_id,
              list_dot_product(qv, e)
                / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e, e))) AS sc
            FROM q JOIN v ON vec_id <> query_id),
      r AS (SELECT query_id, neighbor_id, sc,
              row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, neighbor_id) AS rnk
            FROM s)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(sc, 6) AS score
      FROM r WHERE rnk <= 5
      ORDER BY query_id, rnk""",
    "q34_embed_neardup" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings WHERE vec_id % 10 = 0),
      s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS sc
            FROM v a JOIN v b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, round(sc, 6) AS score
      FROM s ORDER BY sc DESC, id_a, id_b LIMIT 20""",
    "q35_langid" -> """
      WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
      c AS (SELECT doc_id, lang,
        len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','it','for','with'], x))) AS c_en,
        len(list_filter(tk, x -> list_contains(['el','la','de','que','y','en','un','es','por','los'], x))) AS c_es,
        len(list_filter(tk, x -> list_contains(['der','die','und','das','ist','nicht','ein','zu','mit','den'], x))) AS c_de,
        len(list_filter(tk, x -> list_contains(['le','la','de','et','un','est','que','pour','dans','les'], x))) AS c_fr
        FROM t)
      SELECT doc_id, lang,
        CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
             WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
             WHEN c_de >= c_fr THEN 'de' ELSE 'fr' END AS pred,
        c_en, c_es
      FROM c ORDER BY doc_id""",
    "q36_quality" -> """
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
      c AS (SELECT doc_id, length(text) AS chars, len(tk) AS n_tokens,
        len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','it','for','with'], x))) AS stops
        FROM t)
      SELECT doc_id, chars, n_tokens,
        CAST(chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_word_len,
        CAST(stops AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
        CASE WHEN n_tokens < 20 THEN 'short'
             WHEN stops * 10 >= n_tokens THEN 'stopword_heavy'
             ELSE 'ok' END AS band
      FROM c ORDER BY doc_id""",
    "q37_tokens" -> """
      SELECT doc_id,
        len(string_split(text, ' ')) AS ws_tokens,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
      FROM documents ORDER BY doc_id""",
    "q38_fingerprint" -> """
      SELECT doc_id, md5(lower(trim(text))) AS fp,
        substr(md5(lower(trim(text))), 1, 8) AS fp_head
      FROM documents ORDER BY doc_id""",
    "q39_multimodal" -> """
      SELECT doc_id AS media_id,
        CAST(octet_length(unhex(md5(text))) AS BIGINT) AS byte_len,
        CAST((CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER) & 127) + 1 AS BIGINT) AS width,
        CAST((CAST(concat('0x', substr(md5(text), 31, 2)) AS INTEGER) & 127) + 1 AS BIGINT) AS height,
        substr(md5(text), 1, 8) AS head_hex
      FROM documents ORDER BY media_id""",
    // Full winnow replication: rebuild each 4-gram string from the
    // token list, hash with the same md5-60-bit family, slide the
    // 8-hash window taking minima, distinct — then compare the
    // exploded (doc_id, fp) sets against the native kernel's output.
    "q40_winnow" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      grams AS (SELECT doc_id, list_transform(range(1, len(ts)-4+2), i ->
          array_to_string(ts[i:i+3], ' ')) AS gs
        FROM toks WHERE len(ts) >= 4),
      hashes AS (SELECT doc_id, list_transform(gs, g ->
          list_sum(list_transform(range(1,16), i ->
            (strpos('0123456789abcdef', substring(md5(g), i, 1))-1)::BIGINT
              << ((15-i)*4)))::BIGINT) AS hs
        FROM grams),
      fps AS (SELECT doc_id, CASE WHEN len(hs) <= 8 THEN [list_min(hs)]
          ELSE list_distinct(list_transform(range(1, len(hs)-8+2), s -> list_min(hs[s:s+7]))) END AS fpl
        FROM hashes)
      SELECT doc_id, unnest(fpl) AS fp FROM fps ORDER BY doc_id, fp""",
    // Recomputes every vector's SRP bucket AND probe set from the
    // md5-Rademacher planes (+1 iff first md5 hex digit of 'srp:j:d' is
    // odd; margins summed left-to-right exactly like the native dot
    // product; probes = flips of the 2 lowest-|margin| bits, ties by
    // plane index like Spark's struct array_sort), then replays the
    // probe join + exact cosine >= 0.2 verify.
    "q41_embed_lsh" -> """
      WITH np AS (SELECT GREATEST(8, CAST(ceil(log2(ceil(count(*) / 8.0))) AS INT)) AS planes
                  FROM embeddings),
      v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v0
            WHERE sqrt(list_dot_product(v, v)) > 0),
      m AS (SELECT id, v, nrm,
          list_transform(range(0, (SELECT planes FROM np)), j ->
            list_reduce(list_transform(range(1, 65), d ->
              CASE WHEN (strpos('0123456789abcdef',
                           substring(md5('srp:' || j || ':' || (d-1)), 1, 1)) - 1) % 2 = 1
                THEN v[d] ELSE -v[d] END), (a, x) -> a + x)) AS marg
        FROM n),
      b AS (SELECT id, v, nrm, marg,
          list_sum(list_transform(range(0, (SELECT planes FROM np)), j ->
            CASE WHEN marg[j+1] >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS bucket
        FROM m),
      p AS (SELECT id, v, nrm, bucket,
          [bucket] || list_transform(
            list_sort(list_transform(range(0, (SELECT planes FROM np)),
              j -> {'m': abs(marg[j+1]), 'j': j}))[1:2],
            s -> xor(bucket, 1::BIGINT << s.j)) AS probes
        FROM b)
      SELECT a.id AS id_a, b2.id AS id_b,
        round(list_dot_product(a.v, b2.v)/(a.nrm*b2.nrm), 6) AS score
      FROM p a JOIN p b2 ON a.id < b2.id
        AND (list_contains(a.probes, b2.bucket) OR list_contains(b2.probes, a.bucket))
      WHERE list_dot_product(a.v, b2.v)/(a.nrm*b2.nrm) >= 0.2
      ORDER BY id_a, id_b""",
    "q42_sessionize" -> """
      WITH e AS (SELECT user_id, event_id,
                   CAST(floor(date_part('epoch', ts)) AS BIGINT) AS sec, value
                 FROM events),
      m AS (SELECT *, CASE WHEN sec - lag(sec) OVER w > 14400
                             OR lag(sec) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
              ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
            FROM m)
      SELECT user_id, session_no, min(sec) AS session_start,
        max(sec) AS session_end, count(*) AS n_events,
        round(sum(value), 2) AS total_value
      FROM s GROUP BY user_id, session_no
      ORDER BY user_id, session_no""",
    "q45_exists" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",
    "q44_rollup" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        count(*) AS n,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q43_embed_ivf" -> """
      WITH st AS (SELECT GREATEST(25, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS s
                  FROM embeddings),
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      vn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS n FROM v),
      c AS (SELECT vec_id AS cid, e AS ce, n AS cn FROM vn
            WHERE vec_id % (SELECT s FROM st) = 0),
      a0 AS (SELECT vn.vec_id, vn.e, vn.n, c.cid,
               row_number() OVER (PARTITION BY vn.vec_id
                 ORDER BY list_dot_product(vn.e, c.ce) / (vn.n * c.cn) DESC, c.cid) AS arnk
             FROM vn CROSS JOIN c),
      a AS (SELECT vec_id, e, n, cid FROM a0 WHERE arnk = 1),
      q0 AS (SELECT vn.vec_id AS query_id, vn.e AS qe, vn.n AS qn, c.cid,
               row_number() OVER (PARTITION BY vn.vec_id
                 ORDER BY list_dot_product(vn.e, c.ce) / (vn.n * c.cn) DESC, c.cid) AS prnk
             FROM vn CROSS JOIN c WHERE vn.vec_id < 10),
      p AS (SELECT query_id, qe, qn, cid FROM q0 WHERE prnk <= 2),
      sc AS (SELECT p.query_id, a.vec_id AS neighbor_id,
               list_dot_product(p.qe, a.e) / (p.qn * a.n) AS s
             FROM p JOIN a USING (cid) WHERE a.vec_id <> p.query_id),
      r AS (SELECT query_id, neighbor_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rnk
            FROM sc)
      SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(s, 6) AS score
      FROM r WHERE rnk <= 5
      ORDER BY query_id, rnk""",
    "q46_sqlite_like" -> """
      SELECT p_partkey, p_name FROM part
      WHERE p_name ILIKE '%RED%'
      ORDER BY p_partkey""",
    "q47_sqlite_intdiv" -> """
      SELECT o_orderkey, o_orderkey // 100 AS div100, o_orderkey % 7 AS m7,
        CAST(3 AS BIGINT) AS c
      FROM orders WHERE o_orderkey % 50 = 0
      ORDER BY o_orderkey""",
    "q48_sqlite_datetime" -> """
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym,
        strftime(o_orderdate, '%Y-%m-%d') AS d,
        julian(o_orderdate) - 0.5 AS jd
      FROM orders WHERE o_orderkey % 100 = 0
      ORDER BY o_orderkey""",
    "q49_sqlite_fnnames" -> """
      SELECT s_suppkey,
        CASE WHEN s_acctbal >= 5000 THEN 'rich' ELSE 'modest' END AS band,
        greatest(s_acctbal, 2000.0) AS hi, least(s_acctbal, 2000.0) AS lo,
        concat('''', replace(s_name, '''', ''''''), '''') AS qn
      FROM supplier ORDER BY s_suppkey""",
    "q50_sqlite_total_glob" -> """
      SELECT s_nationkey AS nk, CAST(coalesce(sum(s_suppkey), 0) AS DOUBLE) AS tot, count(*) AS n
      FROM supplier WHERE NOT (s_name GLOB '*[05]')
      GROUP BY s_nationkey ORDER BY nk""",
    "q51_recursive_cte" -> """
      WITH RECURSIVE m(mn) AS (
        SELECT 1 UNION ALL SELECT mn + 1 FROM m WHERE mn < 12)
      SELECT CAST(mn AS BIGINT) AS mn, count(o_orderkey) AS n_orders
      FROM m LEFT JOIN orders ON month(o_orderdate) = mn
      GROUP BY mn ORDER BY mn""",
    // join formulation of the GROUPS frame: per-(partition, dense_rank)
    // group sums, then a |delta rank| <= 1 self-join — independent of
    // any window-frame machinery
    "q52_window_groups_frame" -> """
      WITH d AS (SELECT l_orderkey, l_linenumber, l_returnflag,
          CAST(l_quantity AS BIGINT) AS qty,
          dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_shipdate) AS dr
        FROM lineitem),
      g AS (SELECT l_returnflag, dr, sum(qty) AS gq FROM d GROUP BY 1, 2),
      s AS (SELECT a.l_returnflag, a.dr, sum(b.gq) AS frame_sum
            FROM g a JOIN g b ON a.l_returnflag = b.l_returnflag AND abs(a.dr - b.dr) <= 1
            GROUP BY 1, 2)
      SELECT d.l_orderkey, CAST(d.l_linenumber AS BIGINT) AS l_linenumber,
        CAST(s.frame_sum AS BIGINT) AS frame_sum,
        CAST(s.frame_sum - d.qty AS BIGINT) AS frame_sum_excl
      FROM d JOIN s ON d.l_returnflag = s.l_returnflag AND d.dr = s.dr
      WHERE d.l_orderkey % 211 = 0
      ORDER BY l_orderkey, l_linenumber""",
    // the Spark side routed documents through a real SQLite file and
    // the pure-Scala ingest; a hash match against the raw parquet
    // proves the round trip lossless
    "q53_sqlite_ingest" -> """
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, text
      FROM documents ORDER BY doc_id""",
    // the writer→reader sqlite round trip must be lossless against the
    // raw parquet (same oracle shape as q53)
    "q55_sqlite_export_roundtrip" -> """
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, text
      FROM documents ORDER BY doc_id""",
    // the 16-shard distributed migration (incl. the WAL-only shard) must
    // also be lossless against the raw parquet
    "q56_sqlite_ingest_distributed" -> """
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, text
      FROM documents ORDER BY doc_id""",
    // the 12-shard distributed OUTBOUND migration (executor-built
    // .sqlite files) round-trips lossless against the raw parquet
    "q67_sqlite_export_distributed" -> """
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, text
      FROM documents ORDER BY doc_id""",
    // cross-document duplicated 10-token spans: per-doc span count +
    // union coverage (all spans length 10 → union = Σ min(10, gap))
    "q68_substring_dedup" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      g0 AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 9)) AS pos, tk
             FROM t WHERE len(tk) >= 10),
      g AS (SELECT doc_id, pos, array_to_string(tk[pos:pos+9], ' ') AS gram
            FROM g0),
      d AS (SELECT gram FROM g GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 2),
      h AS (SELECT doc_id, pos,
              lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS np
            FROM g JOIN d USING (gram)),
      s AS (SELECT doc_id, count(*) AS nd,
              sum(least(coalesce(np - pos, 10), 10)) AS cov
            FROM h GROUP BY 1)
      SELECT t.doc_id,
        CAST(coalesce(s.nd, 0) AS BIGINT) AS n_dup_spans,
        CAST(coalesce(s.cov, 0) AS BIGINT) AS covered_tokens,
        CAST(len(t.tk) AS BIGINT) AS n_tokens
      FROM t LEFT JOIN s USING (doc_id) ORDER BY t.doc_id""",
    // keep-first substring cut: first occurrence per duplicated gram by
    // (doc_id, pos); overlapping cut spans merged by a running-max
    // window; cleaned text rebuilt from the surviving token indices
    "q69_substring_cut" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      g0 AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 9)) AS pos, tk
             FROM t WHERE len(tk) >= 10),
      g AS (SELECT doc_id, pos, array_to_string(tk[pos:pos+9], ' ') AS gram
            FROM g0),
      gd AS (SELECT gram FROM g GROUP BY gram
             HAVING count(DISTINCT doc_id) >= 2),
      h AS (SELECT g.doc_id, g.pos,
              row_number() OVER (PARTITION BY g.gram
                                 ORDER BY g.doc_id, g.pos) AS rn
            FROM g JOIN gd USING (gram)),
      cuts AS (SELECT doc_id, pos FROM h WHERE rn > 1),
      isl AS (SELECT doc_id, pos,
                CASE WHEN pos >= coalesce(max(pos + 10) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     -1) THEN 1 ELSE 0 END AS ni
              FROM cuts),
      isl2 AS (SELECT doc_id, pos,
                 sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM isl),
      merged AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 10 AS e
                 FROM isl2 GROUP BY 1, 2),
      cutidx AS (SELECT doc_id, unnest(generate_series(s, e - 1)) AS i
                 FROM merged),
      tokidx AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk
                 FROM t),
      marked AS (SELECT k.doc_id, k.i,
                   CASE WHEN c.i IS NULL THEN k.tk[k.i] END AS tok
                 FROM tokidx k LEFT JOIN cutidx c
                   ON c.doc_id = k.doc_id AND c.i = k.i),
      agg AS (SELECT doc_id,
                coalesce(array_to_string(
                  list(tok ORDER BY i) FILTER (WHERE tok IS NOT NULL), ' '),
                  '') AS text_dedup,
                count(tok) AS kept FROM marked GROUP BY 1)
      SELECT t.doc_id, a.text_dedup,
        CAST(a.kept AS BIGINT) AS kept_tokens,
        CAST(len(t.tk) AS BIGINT) AS n_tokens
      FROM t JOIN agg a USING (doc_id) ORDER BY t.doc_id""",
    // the Spark side ran a multi-db ATTACH write script (ephemeral
    // staging db + a second segment created on attach) and read the
    // attached segment back; the oracle recomputes the promoted rows
    "q70_attach" -> """
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             CASE WHEN length(text) > 500 THEN 'long' ELSE 'keep' END AS tag
      FROM documents
      WHERE doc_id % 17 = 0 AND doc_id % 3 = 0
        AND length(text) >= 40 AND doc_id % 30 <> 0
      ORDER BY doc_id""",
    "q71_pack_chunks" -> """
      WITH t AS (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                 FROM documents),
      b AS (SELECT doc_id, n, doc_id % 8 AS bucket FROM t WHERE n > 0),
      c AS (SELECT doc_id, n, bucket,
              sum(n) OVER (PARTITION BY bucket ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum FROM b),
      s AS (SELECT doc_id, bucket, CAST(cum - n AS BIGINT) AS st,
              CAST(cum - 1 AS BIGINT) AS en FROM c),
      e AS (SELECT doc_id, bucket, st, en,
              unnest(generate_series(st // 512, en // 512)) AS ck FROM s)
      SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
        CAST(ck AS BIGINT) AS chunk,
        CAST(greatest(ck * 512, st) - st AS BIGINT) AS tok_start,
        CAST(least((ck + 1) * 512 - 1, en) - st + 1 AS BIGINT) AS tok_end
      FROM e ORDER BY bucket, chunk, doc_id, tok_start""",
    "q72_pack_bins" -> """
      WITH RECURSIVE t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
               doc_id % 8 AS bucket
        FROM documents WHERE len(string_split(text, ' ')) > 0),
      r AS (SELECT doc_id, n, bucket,
              row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
            FROM t),
      p AS (
        SELECT doc_id, n, bucket, rn,
               CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS fill_start
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.doc_id, r.n, r.bucket, r.rn,
               CASE WHEN p.fill_start + p.n + r.n <= 1024
                    THEN p.bin ELSE p.bin + 1 END,
               CASE WHEN p.fill_start + p.n + r.n <= 1024
                    THEN p.fill_start + p.n ELSE CAST(0 AS BIGINT) END
        FROM p JOIN r ON r.bucket = p.bucket AND r.rn = p.rn + 1)
      SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, bin, fill_start
      FROM p ORDER BY doc_id""",
    "q73_semdedup" -> """
      WITH RECURSIVE st AS (
        SELECT GREATEST(25, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS s
        FROM embeddings),
      vn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nn
             FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce, nn AS cen FROM vn
            WHERE vec_id % (SELECT s FROM st) = 0),
      a0 AS (SELECT vn.vec_id, c.cid,
               list_dot_product(vn.e, c.ce) / (vn.nn * c.cen) AS csc
             FROM vn CROSS JOIN c),
      a1 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csc DESC, cid) AS rn FROM a0),
      asg AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
      p AS (SELECT x.vec_id AS ia, y.vec_id AS ib
            FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
            JOIN vn vx ON vx.vec_id = x.vec_id
            JOIN vn vy ON vy.vec_id = y.vec_id
            WHERE list_dot_product(vx.e, vy.e) / (vx.nn * vy.nn) >= 0.35),
      edges AS (SELECT ia AS u, ib AS v FROM p UNION SELECT ib, ia FROM p),
      walk(u, v) AS (SELECT u, v FROM edges
                     UNION
                     SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u),
      canon AS (SELECT u AS vec_id, least(u, min(v)) AS canon_id
                FROM walk GROUP BY u)
      SELECT a.vec_id, a.cid,
        coalesce(c2.canon_id, a.vec_id) AS canon_id,
        coalesce(c2.canon_id, a.vec_id) = a.vec_id AS keep
      FROM asg a LEFT JOIN canon c2 ON c2.vec_id = a.vec_id
      ORDER BY a.vec_id""",
    // the Spark side fetched its rows over real HTTP from the read
    // server; a hash match against raw parquet proves the wire lossless
    "q58_http_read" -> """
      SELECT doc_id, text FROM documents ORDER BY doc_id""",

    "q59_trigger_audit" -> """
      SELECT doc_id, length(text) AS n_chars,
             CASE WHEN length(text) > 500 THEN 'long' ELSE 'short' END AS tag
      FROM documents
      WHERE doc_id % 23 = 0 AND length(text) >= 10
      ORDER BY doc_id
    """,
    // replays the q30 pair pipeline, then closes the pair graph with a
    // recursive CTE: cluster_id = min reachable id — an independent
    // transitive-closure check of the Large-Star/Small-Star iterations
    "q60_dedup_clusters" -> """
      WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(len(tk)-2),
               i -> array_to_string(tk[i+1:i+3], ' '))) AS s
             FROM toks WHERE len(tk) >= 3),
      ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      cand AS (SELECT doc_a, doc_b
               FROM pairs JOIN sh x ON x.doc_id = doc_a
                          JOIN sh y ON y.doc_id = doc_b
               WHERE 10 * inter >= 6 * (len(x.s) + len(y.s) - inter)),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
      walk(u, v) AS (SELECT u, v FROM edges
                     UNION
                     SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u)
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM walk GROUP BY u
      ORDER BY doc_id""",
    // the Spark side answers through a VIEW that survived write-script
    // creation and a .sqlite round trip; the oracle inlines the body
    "q57_view_roundtrip" -> """
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""",
    // every output column of the real ImageIO decode is arithmetic in
    // doc_id (deterministic PNG fixtures; corrupt every 97th id)
    "q54_image_decode" -> """
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST(doc_id % 13 + 1 AS BIGINT) END AS width,
        CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST(doc_id % 7 + 1 AS BIGINT) END AS height,
        CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST(doc_id % 251 AS BIGINT) END AS mean_px,
        doc_id % 97 <> 0 AS ok
      FROM documents ORDER BY media_id""",
    // re-derives the bigram counts relationally (unnest + group by):
    // max count, sum of counts >= 2, total count per document
    "q61_repetition" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      g AS (SELECT doc_id, CASE WHEN len(tk) >= 2
              THEN list_transform(generate_series(1, len(tk) - 1),
                     i -> tk[i] || ' ' || tk[i + 1])
              ELSE [] END AS grams FROM t),
      u AS (SELECT doc_id, unnest(grams) AS gram FROM g),
      c AS (SELECT doc_id, gram, count(*) AS cnt FROM u GROUP BY 1, 2),
      a AS (SELECT doc_id, max(cnt) AS top,
              coalesce(sum(cnt) FILTER (WHERE cnt >= 2), 0) AS dups,
              sum(cnt) AS n
            FROM c GROUP BY 1)
      SELECT t.doc_id,
        CAST(coalesce(a.n, 0) AS BIGINT) AS n_bigrams,
        CAST(coalesce(a.top, 0) AS BIGINT) AS top_bigram_count,
        CASE WHEN coalesce(a.n, 0) = 0 THEN 0.0
             ELSE CAST(a.top AS DOUBLE) / a.n END AS top_bigram_frac,
        CASE WHEN coalesce(a.n, 0) = 0 THEN 0.0
             ELSE CAST(a.dups AS DOUBLE) / a.n END AS dup_bigram_frac
      FROM t LEFT JOIN a ON t.doc_id = a.doc_id
      ORDER BY t.doc_id""",
    // identical augmentation + identical pattern text; DuckDB needs the
    // explicit 'g' flag where Spark's regexp_replace is global already
    "q62_pii_redact" -> """
      WITH aug AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail' || CAST(doc_id % 7 AS VARCHAR)
            || '.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)
            || ' call +1-555-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t2,
          '[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z0-9]')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t2,
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(t2, '\+1-555-\d{4}')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(regexp_replace(t2,
          '[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z0-9]', '<EMAIL>', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
          '\+1-555-\d{4}', '<PHONE>', 'g') AS redacted
      FROM aug ORDER BY doc_id""",
    "q63_decontam" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      g AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(tk) - 4),
                i -> array_to_string(tk[i:i+4], ' '))) AS gram
            FROM t WHERE len(tk) >= 5),
      b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 13 = 0),
      h AS (SELECT doc_id, count(DISTINCT g.gram) AS shared
            FROM g JOIN b USING (gram)
            WHERE doc_id % 13 <> 0 GROUP BY 1)
      SELECT d.doc_id,
        CAST(coalesce(h.shared, 0) AS BIGINT) AS n_shared_grams,
        CAST(coalesce(h.shared, 0) > 0 AS INT) AS contaminated
      FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
      WHERE d.doc_id % 13 <> 0 ORDER BY d.doc_id""",

    // fts5 'data AND "batch batch" OR filt*' re-expressed over DuckDB
    // list ops (same unicode61 tokenization: lowercase alnum runs)
    "q64_fts_match" -> """
      WITH toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '') AS l
        FROM documents)
      SELECT doc_id FROM toks
      WHERE (list_contains(l, 'data')
             AND list_contains(
               list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1]),
               'batch batch'))
         OR len(list_filter(l, x -> x LIKE 'filt%')) > 0
      ORDER BY doc_id""",

    // bloom prefilter is exact end to end, so the oracle is the plain
    // exact decontamination over the % 11 split
    "q66_decontam_bloom" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      g AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(tk) - 4),
                i -> array_to_string(tk[i:i+4], ' '))) AS gram
            FROM t WHERE len(tk) >= 5),
      b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 11 = 0),
      h AS (SELECT doc_id, count(DISTINCT g.gram) AS shared
            FROM g JOIN b USING (gram)
            WHERE doc_id % 11 <> 0 GROUP BY 1)
      SELECT d.doc_id,
        CAST(coalesce(h.shared, 0) AS BIGINT) AS n_shared_grams,
        CAST(coalesce(h.shared, 0) > 0 AS INT) AS contaminated
      FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
      WHERE d.doc_id % 11 <> 0 ORDER BY d.doc_id""",

    // `unicode61 separators 'a'`: tokens split on non-alnum AND on
    // every raw 'a' (corpus text is lowercase ASCII, so lower() and
    // the raw-codepoint check agree)
    "q65_fts_tokenize" -> """
      WITH toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '([^a-z0-9]|a)+'),
            x -> x <> '') AS l
        FROM documents)
      SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tok,
        CAST(list_contains(l, 'd')
             AND len(list_filter(l, x -> x LIKE 'b%')) > 0 AS INT) AS hit
      FROM toks ORDER BY doc_id"""
  )
}
