package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * Writes `<outDir>/<query>_<suffix>.txt` per query. The plan is the
  * pre-execution formatted physical plan (AQE shows isFinalPlan=false;
  * shape — Exchange count, join strategy, PushedFilters, ReadSchema —
  * is what the evidence is for). Queries whose DataFrame CONSTRUCTION
  * runs fixtures (q53+ lifecycle queries) do that work here too, so
  * default to the analytic subset via the arg list at small SF.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Set[String] =
      if (args.length > 3 && args(3).nonEmpty) args(3).split(",").map(_.trim).toSet
      else Set.empty
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"dumped $name (${txt.linesIterator.size} lines)")
      } catch {
        case e: Throwable =>
          println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
