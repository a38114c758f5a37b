package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training batches: place variable-length
  * documents into fixed-capacity token windows with minimal padding
  * waste. Two standard policies, both deterministic and
  * oracle-recomputable:
  *
  *  - [[packChunks]] — concat-and-chunk (GPT-style pretraining): the
  *    token stream of each bucket concatenates in doc order and cuts
  *    every `capacity` tokens; documents may straddle a cut. Pure
  *    window arithmetic + one explode — no stateful pass at all, so
  *    Catalyst/AQE own the whole plan.
  *  - [[packBins]] — whole-document next-fit: documents never split; a
  *    doc that would overflow the open bin closes it and starts the
  *    next. The reset-on-threshold recurrence is inherently sequential,
  *    so it runs as a single linear scan per bucket inside
  *    `mapPartitions` (the documented last resort — nothing relational
  *    expresses a running sum that resets).
  *
  * 100 TB shape: both are ONE hash shuffle on `bucket` followed by
  * per-bucket-parallel work (a partitioned window / a streaming O(1)-
  * state scan). Buckets decouple parallelism from layout: doc→bucket is
  * `doc_id % buckets`, so any executor count replays the same packing
  * and ids are stable across runs (no Date.now, no partition-index
  * dependence). Waste vs a global packer is bounded by one open
  * sequence per bucket. */
object Packing {

  /** Concat-and-chunk packing. Returns one row per (document × chunk it
    * occupies): `doc_id, bucket, chunk, tok_start, tok_end` where
    * `chunk` is the bucket-local chunk ordinal, `tok_start` the first
    * token index OF THE DOCUMENT landing in this chunk (0-based) and
    * `tok_end` the exclusive end. A trainer joins text back on doc_id
    * and slices tokens [tok_start, tok_end) into chunk `chunk`. */
  def packChunks(docs: DataFrame, capacity: Int, buckets: Int,
      idCol: String = "doc_id", tokenCol: String = "n_tokens"): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = docs
      .select(col(idCol), col(tokenCol).cast(LongType).as("n"))
      .where(col("n") > 0)
      .withColumn("bucket", pmod(col(idCol), lit(buckets)).cast(LongType))
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("st", col("cum") - col("n")) // stream offset of token 0
      .withColumn("en", col("cum") - 1)        // stream offset of last token
    val cap = lit(capacity.toLong)
    // integer `div`, not floating floor(a/b): exact at any stream length
    cum
      .withColumn("chunk",
        explode(sequence(expr(s"st div ${capacity.toLong}"),
          expr(s"en div ${capacity.toLong}"))))
      .select(
        col(idCol), col("bucket"),
        col("chunk").cast(LongType).as("chunk"),
        (greatest(col("chunk") * cap, col("st")) - col("st"))
          .cast(LongType).as("tok_start"),
        (least((col("chunk") + 1) * cap - 1, col("en")) - col("st") + 1)
          .cast(LongType).as("tok_end"))
  }

  /** Whole-document next-fit bin packing. Returns `doc_id, bucket, bin,
    * fill_start` — the bucket-local bin ordinal and the token offset at
    * which the doc lands inside its bin. A document longer than
    * `capacity` occupies a bin alone (next-fit's natural behavior: it
    * can never share). One shuffle on bucket, then a streaming scan
    * with O(1) state per bucket. */
  def packBins(docs: DataFrame, capacity: Int, buckets: Int,
      idCol: String = "doc_id", tokenCol: String = "n_tokens"): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val spark = docs.sparkSession
    val prepped = docs
      .select(col(idCol).cast(LongType).as("id"),
        col(tokenCol).cast(LongType).as("n"))
      .where(col("n") > 0)
      .withColumn("bucket", pmod(col("id"), lit(buckets.toLong)))
      // co-locate each bucket, then order: rows of one bucket arrive
      // contiguously and id-sorted at the scan below
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
    val cap = capacity.toLong
    import spark.implicits._
    prepped.as[(Long, Long, Long)] // (id, n, bucket) — select order above
      .mapPartitions { it =>
        // per-bucket next-fit state; buckets arrive contiguous and
        // id-sorted, so a bucket change resets the open bin — O(1)
        // state, iterator-streaming (nothing buffers)
        var curBucket = Long.MinValue
        var bin = -1L
        var fill = 0L
        it.map { case (id, nTok, b) =>
          if (b != curBucket) { curBucket = b; bin = -1L; fill = 0L }
          if (bin < 0 || fill + nTok > cap) { bin += 1; fill = 0L }
          val start = fill
          fill += nTok
          (id, b, bin, start)
        }
      }
      .toDF("doc_id", "bucket", "bin", "fill_start")
  }
}
