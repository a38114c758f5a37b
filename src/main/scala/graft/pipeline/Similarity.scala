package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Scale design:
  *  - [[bruteForceKnn]] is the exactness baseline: broadcast the (small)
  *    query set against the corpus — one pass over the big side, no
  *    shuffle of the corpus, per-partition top-k via the ranking window
  *    only on the (queries × corpus) product.
  *  - [[lshBucketed]] is the scale path: sign-random-projection buckets
  *    shrink the candidate set from O(N) to O(N / 2^planes) per probe;
  *    the bucket join shuffles on the bucket key. Deterministic
  *    hyperplanes (hash-derived, no RNG) keep results reproducible.
  *  - Pairwise dot products run through a native codegen'd Catalyst
  *    expression ([[graft.functions.DotProduct]]) with per-vector norms
  *    precomputed; accumulation is sequential in array order, which is
  *    what vector engines (and the DuckDB oracle's list_dot_product)
  *    do, so scores are bit-comparable across engines.
  */
object Similarity {

  /** Sequential-order dot product via HOFs — works without any session
    * registration; bit-identical to the native expression below. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Codegen'd native dot product ([[graft.functions.DotProduct]]) — the
    * hot-path form; requires [[graft.functions.VectorExpressions.register]]
    * on the session (done by every entry point in this object). */
  private def ndot(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** Cosine similarity with the canonical dot/(|a|·|b|) formula. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Project (id, vec, norm) with the norm computed once per vector —
    * pairwise scoring then does one dot product per pair instead of
    * three (norms recomputed per pair is the classic ANN-scan mistake). */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, normAs: String): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs))
      .withColumn(normAs, sqrt(call_function("dot_product", col(vecAs), col(vecAs))))
  }

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * `queries` is expected to be small (it is broadcast). */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(withNorm(queries, idCol, vecCol, "query_id", "qv", "qn"))
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = c.crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (ndot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** All pairs with cosine ≥ threshold (brute force; the near-dup oracle
    * baseline — quadratic, use [[lshBucketed]] beyond small corpora). */
  def bruteForceNearDup(
      vectors: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = withNorm(vectors, idCol, vecCol, "id_a", "va", "na")
    val b = withNorm(vectors, idCol, vecCol, "id_b", "vb", "nb")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (ndot(col("va"), col("vb")) / (col("na") * col("nb"))).as("score"))
      .where(col("score") >= threshold)
  }

  /** Deterministic pseudo-random hyperplanes: component (j,k) is derived
    * from a splitmix64-style integer mix of the indices — reproducible
    * across sessions, no RNG. Values in [-1, 1). */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (j, k) =>
      var z = (j.toLong * 0x9E3779B97F4A7C15L) + (k.toLong * 0xBF58476D1CE4E5B9L) + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }

  /** Sign-random-projection LSH bucket id (one probe). */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0d, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed near-dup: compare only within SRP buckets, verify with
    * exact cosine. Approximate (bucket boundaries lose some recall) —
    * that's the scale trade; `numPlanes` controls bucket granularity. */
  def lshBucketed(
      vectors: DataFrame,
      threshold: Double,
      numPlanes: Int,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val v = withNorm(vectors, idCol, vecCol, "id", "v", "n")
      .withColumn("bucket", srpBucket(col("v"), planes))
      .localCheckpoint(true) // self-joined below
    val rhs = v.select(col("id").as("id2"), col("v").as("v2"),
      col("n").as("n2"), col("bucket").as("bucket2"))
    v.join(rhs, col("bucket") === col("bucket2") && col("id") < col("id2"))
      .select(col("id").as("id_a"), col("id2").as("id_b"),
        (ndot(col("v"), col("v2")) / (col("n") * col("n2"))).as("score"))
      .where(col("score") >= threshold)
  }
}
