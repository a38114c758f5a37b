package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line. An untimed warmup pass
  * at sf0.001 first forces classloading, codegen compilation, and JIT
  * of the shared operator paths so per-query numbers reflect steady
  * state rather than whichever query happened to run first. A query
  * that throws is reported as -1.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR not WARN: function re-registration warnings across 45 queries
    // x 3 passes would pollute the output the driver parses
    spark.sparkContext.setLogLevel("ERROR")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val warmDir = {
      val d = new java.io.File("/root/testdata/sf0.001")
      if (d.isDirectory) Some(d.getPath) else None
    }
    // Pipeline queries localCheckpoint multiply-referenced frames;
    // drop those blocks once a query finishes so 40+ back-to-back
    // queries don't accumulate storage-memory pressure.
    def dropCachedBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    warmDir.foreach { wd =>
      names.foreach { name =>
        try SparkEntry.queries(name)(spark, wd).count()
        catch { case _: Throwable => () }
        dropCachedBlocks()
      }
    }

    // two timed passes, per-query minimum: single-shot timings on a
    // shared host swing 3x with background noise; min-of-2 reports
    // steady-state without hiding real regressions
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      dropCachedBlocks()
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val results = names.map { name =>
      val a = timeOnce(name)
      val b = timeOnce(name)
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
