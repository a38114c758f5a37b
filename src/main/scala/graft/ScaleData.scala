package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for bench checkpoints past the driver-provided
  * scale factors: replicates an existing testdata directory N× with
  * disjoint key spaces, preserving the per-copy statistical structure
  * the queries exercise.
  *
  * Key columns shift by a constant stride per copy so joins stay
  * valid and selective; fixed dimensions (region, nation) do not
  * scale, like TPC-H. Documents' text and embeddings' vectors are
  * deterministically perturbed PER COPY — otherwise every document
  * would gain N−1 exact duplicates and every vector N−1 cosine-1.0
  * twins, inflating dedup/ANN candidate sets quadratically and making
  * the engine look super-linear when it's the data that changed.
  * Within a copy, duplicate/near-duplicate structure is untouched (the
  * perturbation is a pure function of the copy index applied to every
  * row alike).
  *
  * Usage: ScaleData <inDir> <outDir> <factor>
  */
object ScaleData {
  private val Stride = 1_000_000_000_000L // disjoint 64-bit key spaces per copy

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <inDir> <outDir> <factor>")
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaledata")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try scale(spark, inDir, outDir, factor)
    finally spark.stop()
  }

  def scale(spark: SparkSession, inDir: String, outDir: String, factor: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // fixed dimensions: straight copies
    Seq("region", "nation").foreach(t => write(read(t), t))

    def copies(t: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until factor).map(i => shift(base, i)).reduce(_.unionAll(_)), t)
    }
    def off(c: String, i: Int) = col(c) + lit(Stride * i)

    copies("customer")((df, i) => df.withColumn("c_custkey", off("c_custkey", i)))
    copies("supplier")((df, i) => df.withColumn("s_suppkey", off("s_suppkey", i)))
    copies("part")((df, i) => df.withColumn("p_partkey", off("p_partkey", i)))
    copies("orders")((df, i) => df
      .withColumn("o_orderkey", off("o_orderkey", i))
      .withColumn("o_custkey", off("o_custkey", i)))
    copies("lineitem")((df, i) => df
      .withColumn("l_orderkey", off("l_orderkey", i))
      .withColumn("l_partkey", off("l_partkey", i))
      .withColumn("l_suppkey", off("l_suppkey", i)))
    copies("events")((df, i) => df
      .withColumn("event_id", off("event_id", i))
      .withColumn("user_id", off("user_id", i)))
    // per-copy text perturbation: substituting a common letter changes
    // most shingles, so cross-copy docs are neither exact nor near
    // duplicates, while within-copy relations are preserved
    copies("documents") { (df, i) =>
      val perturbed =
        if (i == 0) df
        else df.withColumn("text", regexp_replace(col("text"), "e", s"e$i"))
      perturbed
        .withColumn("doc_id", off("doc_id", i))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    // circular-shift each vector by the copy index: norms and
    // within-copy geometry are untouched, but cross-copy cosine is
    // ~random — a mere element nudge leaves copies at cosine ≈ 1 and
    // every near-dup/ANN query's OUTPUT grows quadratically in copies
    copies("embeddings") { (df, i) =>
      val perturbed =
        if (i == 0) df
        else df.withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> " +
            s"element_at(embedding, (CAST(j AS INT) + $i) % size(embedding) + 1))"))
      perturbed.withColumn("vec_id", off("vec_id", i))
    }
  }
}
