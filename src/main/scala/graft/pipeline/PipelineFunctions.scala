package graft.pipeline

import org.apache.spark.sql.SparkSession

/** JVM scalar functions for pipeline operators whose shapes don't fit
  * Catalyst HOF expressions cleanly (bit-parallel loops, sliding-window
  * minima). Registered once per session; everything else in the pipeline
  * package stays in native `functions._` expressions.
  */
object PipelineFunctions {

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * hash every k-gram, slide a window of `w` hashes, keep each window's
    * minimum (rightmost on ties) — the classic local fingerprinting
    * algorithm used for near-dup / plagiarism detection. Returns the
    * sorted distinct fingerprint set. */
  def winnow(toks: Seq[String], k: Int, w: Int): Seq[Long] = {
    if (toks == null || toks.length < k) return Seq.empty
    val grams = toks.sliding(k).map(_.mkString(" ")).toArray
    val hashes = grams.map { g =>
      val bytes = g.getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    }
    if (hashes.length <= w) return Seq(hashes.min).distinct
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var i = 0
    while (i + w <= hashes.length) {
      var minIdx = i
      var j = i
      while (j < i + w) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      out += hashes(minIdx)
      i += 1
    }
    out.toSeq.sorted
  }

  def register(spark: SparkSession): Unit = {
    // simhash64 is served by the native expression in
    // graft.functions.VectorExpressions (same hash family as
    // Dedup.simhash64, which remains the JVM-callable reference impl)
    spark.udf.register("winnow",
      (toks: Seq[String], k: Int, w: Int) => winnow(toks, k, w))
  }
}
