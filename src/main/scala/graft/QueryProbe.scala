package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job breakdown of one declared query — the measurement harness
  * behind OPTIMIZATION_rNN.md numbers (guide §1: measure first).
  *
  * Usage: runMain graft.QueryProbe <sfDir> <query> [reps]
  * Prints one line per Spark job (duration, stage count, description)
  * plus the wall time per rep, after one untimed warm-up rep.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    @volatile var record = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time, js.stageInfos.size,
          Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (record && s != null)
          lines.add(f"  job ${je.jobId}%4d  ${(je.time - s._1) / 1000.0}%7.3f s  " +
            f"stages=${s._2}%2d  ${s._3.take(90)}")
      }
    })

    def run(): Double = {
      import org.apache.spark.sql.functions.{col, hash, sum}
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val cs = df.columns.map(c => col(s"`$c`"))
      df.select(sum(hash(cs.toSeq: _*).cast("long"))).first()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (System.nanoTime() - t0) / 1e9
    }

    run() // warm
    record = true
    for (r <- 1 to reps) {
      lines.clear()
      val w = run()
      Thread.sleep(300) // let listener events drain
      println(f"== rep $r: $w%.3f s, ${lines.size} jobs")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
