package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus table loader.
  *
  * The driver corpus (TESTDATA.md) is one parquet file per table under a
  * scale-factor directory. At 100 TB the same code path works unchanged:
  * `spark.read.parquet` over a directory tree (optionally partitioned by
  * `segment_id` — see [[graft.engine.SegmentStore]]), with column pruning
  * and predicate pushdown handled by the vectorized parquet reader.
  */
object Tables {
  /** All corpus tables (TPC-H-ish star schema + events + LLM-pipeline tables). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale
    * factor (region/nation are bounded; supplier/customer/part grow with SF
    * but stay orders of magnitude below the fact tables). */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
