package graft

import org.apache.spark.sql.SparkSession

/** Serving-path phase breakdown (r19): where a COLD per-segment read's
  * milliseconds go — session build (newSession + function registry),
  * context build (table snapshot + view registration), parse+plan, and
  * execute — vs a WARM (plan-cache-hit) read. Drives engine.read
  * directly (no HTTP) over `n` freshly provisioned segments.
  *
  * Usage: runMain graft.ServeProbe [nSegments] [rowsPerSegment]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val rows = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit}
    val tmp = java.nio.file.Files.createTempDirectory("graft-serveprobe")
    val store = new graft.engine.SegmentStore(spark, tmp.resolve("store").toString)
    val eng = new graft.engine.TroughEngine(spark, store, new graft.engine.SchemaRegistry)
    val data = spark.range(1, rows + 1)
      .select($"id".as("doc_id"), concat(lit("text body "), $"id").as("text"))
    (0 until n).foreach { i =>
      store.provision(s"sp$i", "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT);")
      if (rows > 0) store.replaceTableData(s"sp$i", "docs", data)
    }
    val sql = "SELECT count(*) AS n, sum(length(text)) AS chars FROM docs;"
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e6, a)
    }
    // warm up shared machinery on a scratch segment
    (0 until 3).foreach(_ => eng.resultJsonIter(eng.read("sp0", sql)).foreach(_ => ()))
    // session-build cost alone
    val sessMs = (1 to 20).map(_ => timed {
      val s = spark.newSession()
      graft.functions.TroughFunctions.register(s)
      graft.engine.SqliteCompat.register(s)
    }._1).sorted.apply(10)
    // cold reads: fresh segment each → context build + parse + execute,
    // split into read() (ctx build + parse + plan) and consumption
    // (optimize + codegen + execute + serialize)
    val coldParts = (1 until n).map { i =>
      val (tRead, df) = timed(eng.read(s"sp$i", sql))
      val (tExec, _) = timed(eng.resultJsonIter(df).foreach(_ => ()))
      (tRead + tExec, tRead, tExec)
    }
    val cold = coldParts.map(_._1).sorted
    val coldRead = coldParts.map(_._2).sorted
    val coldExec = coldParts.map(_._3).sorted
    println(f"cold_read_ms p50=${coldRead(coldRead.size / 2)}%.2f  cold_exec_ms p50=${coldExec(coldExec.size / 2)}%.2f")
    // warm reads: same segments again → plan-cache hit + execute
    // (ctx LRU holds 64 — probe the last 50 touched)
    val warm = (n - 50 until n).map { i =>
      timed(eng.resultJsonIter(eng.read(s"sp$i", sql)).foreach(_ => ()))._1
    }.sorted
    println(f"session_build_ms=$sessMs%.2f")
    val micro0 = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    // phase micro-split on fresh sessions over an already-read segment:
    // loadTable (meta + file index) vs snapshot collect vs dialect parse+analyze
    val micro = (1 to 20).map { _ =>
      val s2 = spark.newSession()
      graft.functions.TroughFunctions.register(s2)
      graft.engine.SqliteCompat.register(s2)
      val (tLoad, df) = timed(store.loadTable("sp1", "docs", s2))
      val lim = df.limit(65537)
      val (tPhys, plan) = timed(lim.queryExecution.executedPlan)
      val (tSnap, _) = timed(plan.executeCollect())
      if (micro0.size < 20) micro0 += ((tPhys, tSnap))
      df.createOrReplaceTempView("docs")
      val (tPlan, _) = timed(graft.engine.SqliteDialect.sql(s2, sql.stripSuffix(";")))
      (tLoad, tSnap, tPlan)
    }
    def p50(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"micro: loadTable=${p50(micro.map(_._1))}%.2f snapshotCollect=${p50(micro.map(_._2))}%.2f dialectPlan=${p50(micro.map(_._3))}%.2f")
    println(f"micro: physPlan=${p50(micro0.map(_._1).toSeq)}%.2f collectJob=${p50(micro0.map(_._2).toSeq)}%.2f")
    // same snapshot collect on the WARM PARENT session (plan/codegen
    // caches shared across segments): the hypothesis behind snapshotting
    // centrally instead of per child session
    val microShared = (2 to 40).map { i =>
      timed(store.loadTable(s"sp${i % n}", "docs", spark)
        .limit(65537).queryExecution.executedPlan.executeCollect())._1
    }
    println(f"micro: snapshotCollect_sharedSession=${p50(microShared)}%.2f")
    println(f"cold_ms p50=${cold(cold.size / 2)}%.2f p90=${cold(cold.size * 9 / 10)}%.2f -> ${1000 / cold(cold.size / 2)}%.0f req/s")
    println(f"warm_ms p50=${warm(warm.size / 2)}%.2f p90=${warm(warm.size * 9 / 10)}%.2f -> ${1000 / warm(warm.size / 2)}%.0f req/s")
    spark.stop()
  }
}
