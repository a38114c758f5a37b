package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Sequence packing (Packing.scala): hand fixtures pin the exact
  * chunk/bin layout, then property checks over a generated corpus
  * assert the invariants a trainer relies on — full token coverage, no
  * chunk over capacity, bin fills never exceeding capacity except for
  * single oversized docs, determinism across partition counts. The
  * q71 oracle re-derives packChunks relationally in DuckDB; packBins'
  * recurrence is re-derived by a sequential reference implementation
  * here (and a recursive-CTE oracle in q72). */
class PackingSpec extends SparkSpecBase {

  import spark.implicits._

  private def docs(rows: (Long, Long)*) =
    rows.toDF("doc_id", "n_tokens")

  test("packChunks: hand fixture — straddle, exact fit, empty excluded") {
    // bucket 0 (all ids ≡ 0 mod 1): stream = 3 + 4 + 5 + 2 tokens,
    // capacity 6 → chunks |3+3of4|1of4+5|2|
    val out = Packing.packChunks(
      docs(1L -> 3L, 2L -> 4L, 3L -> 5L, 4L -> 2L, 5L -> 0L),
      capacity = 6, buckets = 1)
      .orderBy($"chunk", $"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L, 3L),  // doc1 tokens [0,3) in chunk 0
      (2L, 0L, 0L, 0L, 3L),  // doc2 tokens [0,3) fill chunk 0
      (2L, 0L, 1L, 3L, 4L),  // doc2 token [3,4) straddles into chunk 1
      (3L, 0L, 1L, 0L, 5L),  // doc3 fits wholly in chunk 1 (5 left)
      (4L, 0L, 2L, 0L, 2L))) // doc4 opens chunk 2; doc5 (0 tokens) absent
  }

  test("packBins: hand fixture — next-fit resets, oversized doc owns a bin") {
    val out = Packing.packBins(
      docs(1L -> 3L, 2L -> 4L, 3L -> 9L, 4L -> 2L, 5L -> 2L),
      capacity = 6, buckets = 1)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L),  // bin 0: doc1 (3)
      (2L, 0L, 1L, 0L),  // 3+4 > 6 → bin 1: doc2 (4)
      (3L, 0L, 2L, 0L),  // 4+9 > 6 → bin 2: doc3 alone (oversized)
      (4L, 0L, 3L, 0L),  // 9+2 > 6 → bin 3
      (5L, 0L, 3L, 2L))) // 2+2 ≤ 6 → shares bin 3 at offset 2
  }

  private def corpus(n: Int) = spark.range(1, n + 1)
    .select($"id".as("doc_id"),
      (pmod($"id" * 2654435761L, lit(97L)) + 1).as("n_tokens"))

  test("packChunks invariants: exact coverage, capacity respected, bucket-stable") {
    val c = corpus(500).cache()
    val out = Packing.packChunks(c, capacity = 64, buckets = 8).cache()
    // every token of every doc lands exactly once
    val cover = out.groupBy("doc_id")
      .agg(sum($"tok_end" - $"tok_start").as("covered"))
      .join(c, "doc_id")
      .where($"covered" =!= $"n_tokens").count()
    assert(cover == 0)
    // spans within a doc are contiguous ascending across its chunks
    val gaps = out.withColumn("prev_end",
      lag($"tok_end", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"chunk")))
      .where($"prev_end".isNotNull && $"prev_end" =!= $"tok_start").count()
    assert(gaps == 0)
    // no chunk carries more than capacity tokens
    val over = out.groupBy("bucket", "chunk")
      .agg(sum($"tok_end" - $"tok_start").as("fill"))
      .where($"fill" > 64).count()
    assert(over == 0)
    // every chunk except a bucket's last is exactly full
    val lastChunk = out.groupBy("bucket").agg(max($"chunk").as("mx"))
    val slack = out.groupBy("bucket", "chunk")
      .agg(sum($"tok_end" - $"tok_start").as("fill"))
      .join(lastChunk, "bucket")
      .where($"chunk" < $"mx" && $"fill" =!= 64).count()
    assert(slack == 0)
  }

  test("packBins agrees with a sequential reference and respects capacity") {
    val c = corpus(400)
    val out = Packing.packBins(c, capacity = 100, buckets = 4)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // sequential reference: same next-fit per bucket in plain Scala
    val ref = c.orderBy($"doc_id").as[(Long, Long)].collect()
      .groupBy(_._1 % 4).toSeq.flatMap { case (b, ds) =>
        var bin = -1L; var fill = 0L
        ds.sortBy(_._1).map { case (id, n) =>
          if (bin < 0 || fill + n > 100) { bin += 1; fill = 0 }
          val st = fill; fill += n
          (id, b, bin, st)
        }
      }.sortBy(_._1)
    assert(out == ref)
    // shared bins never exceed capacity (oversized-alone is impossible
    // here: n_tokens ≤ 98 < 100)
    val fills = out.groupBy(r => (r._2, r._3)).values
      .map(_.map(_._4).max) // start of last-placed doc < capacity
    assert(fills.forall(_ < 100))
  }

  test("packing is layout-stable across partition counts") {
    val c = corpus(300)
    val a = Packing.packBins(c.repartition(17), capacity = 80, buckets = 6)
      .orderBy($"doc_id").collect().toSeq
    val b = Packing.packBins(c.repartition(2), capacity = 80, buckets = 6)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
    val x = Packing.packChunks(c.repartition(13), capacity = 50, buckets = 5)
      .orderBy($"doc_id", $"chunk").collect().toSeq
    val y = Packing.packChunks(c.repartition(3), capacity = 50, buckets = 5)
      .orderBy($"doc_id", $"chunk").collect().toSeq
    assert(x == y)
  }
}
