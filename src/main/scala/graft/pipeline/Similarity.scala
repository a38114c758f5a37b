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
      // zero-norm vectors (failed/padded embeddings) have undefined
      // cosine; without this guard their 0/0 = NaN scores rank FIRST in
      // top-k (Spark orders NaN above every number) and pass >= filters
      .where(col(normAs) > 0d)
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

  /** Distributed Lloyd's k-means for IVF centroid training. Deterministic
    * init (every `n/k`-th vector by id order); each iteration is one
    * Spark job: assignment via broadcast centroids + per-vector argmin
    * (cosine), update via groupBy mean. Only k×dim doubles ever reach
    * the driver — the corpus never moves. Empty clusters keep their
    * previous centroid. Returns (cid, centroid: array<double>). */
  def trainCentroids(
      corpus: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(true) // scanned once per iteration
    require(!v.isEmpty, "trainCentroids: empty corpus")
    // Deterministic, scale-safe init: farthest-point greedy on a
    // hash-ordered sample. orderBy().limit(S) runs as per-partition
    // top-k + merge — never a global single-partition sort (a
    // row_number() over an unpartitioned window would funnel the whole
    // corpus through one task). The greedy spread (k-means++-style,
    // deterministic) guards against the random-init failure mode of k
    // seeds missing a cluster entirely; only S ≈ 8k sample rows ever
    // reach the driver.
    val sampleSize = math.min(math.max(8 * k, 64), 4096)
    val sample: Array[Seq[Double]] = v
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleSize)
      .select(col("id"), col("v"))
      .as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map(_._2)
    def cosDist(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0d || nb == 0d) 1d else 1d - dot / math.sqrt(na * nb)
    }
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    while (chosen.length < math.min(k, sample.length)) {
      chosen += sample.maxBy(s => chosen.map(c => cosDist(s, c)).min)
    }
    var centroids: Array[(Long, Seq[Double])] =
      chosen.zipWithIndex.map { case (vec, i) => (i.toLong, vec) }.toArray

    for (_ <- 0 until iters) {
      val centDf = broadcast(centroids.toSeq.toDF("cid", "ce")
        .select(col("cid"), col("ce"),
          sqrt(call_function("dot_product", col("ce"), col("ce"))).as("cen")))
      // argmax via max_by PARTIAL aggregation (r18): the broadcast
      // nested-loop join emits each vector's nlist scored rows inside
      // one partition, so the map-side partial collapses them to ONE
      // row per vector before the exchange — the old row_number window
      // shuffled all N×nlist rows to rank them. Tie-break toward the
      // LOWEST cid rides inside the ordering struct (csc, -cid), which
      // is a total order per vector, so the pick is deterministic at
      // any parallelism.
      val updated = v.crossJoin(centDf)
        .select(col("id"), col("v"), col("cid"),
          (call_function("dot_product", col("v"), col("ce")) /
            (sqrt(call_function("dot_product", col("v"), col("v"))) * col("cen"))).as("csc"))
        .groupBy(col("id"))
        .agg(max_by(struct(col("cid"), col("v")),
          struct(col("csc"), (-col("cid")).as("nc"))).as("best"))
        .select(col("best.cid").as("cid"), col("best.v").as("v"))
        // per-cluster mean, computed component-wise without exploding:
        // aggregate pairwise array sums, divide by count
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("cn"),
          array((0 until dimOf(centroids)).map(i =>
            sum(element_at(col("v"), i + 1))): _*).as("vsum"))
        .select(col("cid"), transform(col("vsum"), s => s / col("cn")).as("ce"))
        .as[(Long, Seq[Double])].collect()
      val byId = updated.toMap
      centroids = centroids.map { case (cid, old) => (cid, byId.getOrElse(cid, old)) }
    }
    centroids.toSeq.toDF("cid", "centroid")
  }

  private def dimOf(cents: Array[(Long, Seq[Double])]): Int = cents.head._2.length

  /** IVF-style ANN search: a coarse quantizer partitions the corpus into
    * inverted lists; queries probe only their `nprobe` nearest lists.
    *
    * The quantizer here selects every `centroidStride`-th vector as a
    * centroid — deterministic and oracle-reproducible. In production the
    * centroid set comes from an offline k-means job; everything that
    * makes IVF scale (bounded centroid set, broadcastable; one
    * assignment pass over the corpus at N×nlist dots; query cost
    * nprobe/nlist of a full scan) is independent of how centroids were
    * trained, and swapping the centroid DataFrame is the only change.
    *
    * Scale shape: centroids broadcast (nlist ≈ √N rows); assignment is
    * one corpus scan (no shuffle until the per-vector argmax window,
    * partitioned by vector id); the search join shuffles candidates by
    * list id — hot lists are AQE-split. Returns (query_id, neighbor_id,
    * rnk, score). */
  def ivfKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      centroidStride: Long,
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = withNorm(corpus, idCol, vecCol, "id", "cv", "cn")
    val cents = broadcast(v.where(col("id") % centroidStride === 0)
      .select(col("id").as("cid"), col("cv").as("ce"), col("cn").as("cen")))
    ivfSearch(v, withNorm(queries, idCol, vecCol, "query_id", "qv", "qn"), cents, k, nprobe)
  }

  /** IVF search against a trained centroid set (e.g. from
    * [[trainCentroids]]): `centroids` is (cid, centroid: array<double>).
    * Same plan shape as [[ivfKnn]]. */
  def ivfKnnTrained(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      centroids: DataFrame,
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val cents = broadcast(centroids
      .select(col("cid"), col("centroid").as("ce"))
      .withColumn("cen", sqrt(call_function("dot_product", col("ce"), col("ce")))))
    ivfSearch(
      withNorm(corpus, idCol, vecCol, "id", "cv", "cn"),
      withNorm(queries, idCol, vecCol, "query_id", "qv", "qn"),
      cents, k, nprobe)
  }

  /** Corpus→cluster argmax assignment via max_by PARTIAL aggregation
    * (r18): the broadcast nested-loop join emits each vector's nlist
    * scored rows inside one partition, and the map-side partial
    * collapses them to ONE row per vector before the exchange — N rows
    * shuffle instead of N×nlist (the old row_number window ranked the
    * full cross product). (csc, -cid) is a total order per vector →
    * deterministic lowest-cid tie-break. Shared by [[ivfSearch]] and
    * [[semanticDedup]]; PlanSpec pins this plan's shape directly
    * (BroadcastNestedLoopJoin + max_by, no Window, no
    * CartesianProduct). */
  private[graft] def assignVectors(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(cents)
      .select(col("id"), col("cv"), col("cn"), col("cid"),
        (ndot(col("cv"), col("ce")) / (col("cn") * col("cen"))).as("csc"))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cid"), col("cv"), col("cn")),
        struct(col("csc"), (-col("cid")).as("nc"))).as("best"))
      .select(col("id"), col("best.cid").as("cid"),
        col("best.cv").as("cv"), col("best.cn").as("cn"))

  private def ivfSearch(
      v: DataFrame, q: DataFrame, cents: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val assigned = assignVectors(v, cents)

    // probes keep the window: top-nprobe is a RANKING, not an argmax,
    // and the query side is orders of magnitude smaller than the corpus
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("qsc").desc, col("cid"))
    val probes = q.crossJoin(cents)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"),
        (ndot(col("qv"), col("ce")) / (col("qn") * col("cen"))).as("qsc"))
      .withColumn("prnk", row_number().over(probeW))
      .where(col("prnk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    probes.join(assigned, "cid")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (ndot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with a coarse quantizer,
    * compare pairs ONLY within a cluster, connect pairs with cosine ≥
    * `threshold` into duplicate groups, and keep one canonical member
    * per group. The paper trains k-means and keeps the member farthest
    * from its centroid; here the quantizer is the deterministic
    * every-`centroidStride`-th-vector selection the IVF path uses
    * (oracle-reproducible — swap in [[trainCentroids]] output in
    * production, nothing else changes) and the keep policy is lowest id
    * (deterministic at any parallelism).
    *
    * Scale shape: centroids broadcast (nlist ≈ N/stride rows); ONE
    * corpus scan for assignment (argmax window partitioned by vector
    * id); the pair stage shuffles by cluster id only — within-cluster
    * pairwise is the SemDeDup design, so cluster granularity (the
    * stride) is the knob that bounds it: nlist ≈ √N gives ~N^1.5/nlist
    * dots total, and raising nlist tightens clusters and cost together
    * (the paper runs 11k clusters at 100M+ points). Duplicate groups
    * close through Large-Star/Small-Star, O(log n) rounds.
    *
    * Returns one row per corpus vector: (vec_id, cid, canon_id, keep) —
    * `cid` its quantizer cluster, `canon_id` its duplicate group's
    * keeper (itself when unique), `keep` = (vec_id = canon_id). */
  def semanticDedup(
      corpus: DataFrame,
      threshold: Double,
      centroidStride: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = withNorm(corpus, idCol, vecCol, "id", "cv", "cn")
    val cents = broadcast(v.where(col("id") % centroidStride === 0)
      .select(col("id").as("cid"), col("cv").as("ce"), col("cn").as("cen")))
    // assignment argmax via max_by partial aggregation (r18) — see
    // [[assignVectors]]. r19: eagerly checkpointed — it is consumed by
    // the pair self-join (both sides), the CC edge materialization AND
    // the final labeling join; without the checkpoint the final plan
    // recomputed the whole corpus scan + broadcast-NLJ + argmax a
    // second time (the CC construction had already executed it once).
    // One assignment pass at any scale; PlanSpec pins the assignment
    // shape on [[assignVectors]] itself (the checkpoint truncates it
    // out of the end-to-end plan).
    val assigned = assignVectors(v, cents).localCheckpoint(true)
    val x = assigned.select(col("id").as("ia"), col("cid"),
      col("cv").as("va"), col("cn").as("na"))
    val y = assigned.select(col("id").as("ib"), col("cid"),
      col("cv").as("vb"), col("cn").as("nb"))
    val pairs = x.join(y, Seq("cid"))
      .where(col("ia") < col("ib") &&
        ndot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(col("ia").as("doc_a"), col("ib").as("doc_b"))
    val comp = graft.pipeline.Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("id"), col("cluster_id").as("canon"))
    assigned.select(col("id"), col("cid"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol), col("cid"),
        coalesce(col("canon"), col("id")).as("canon_id"),
        (coalesce(col("canon"), col("id")) === col("id")).as("keep"))
  }

  /** Adaptive SRP width: enough hyperplanes that EXPECTED bucket
    * occupancy stays ~`targetPerBucket` as the corpus grows. A fixed
    * width keeps the bucket COUNT constant, so occupancy grows O(N)
    * and within-bucket candidate pairs O(N²) — measured as a 75×
    * wall-clock blowup at a 10× scale-up (SCALE.md sf1 checkpoint)
    * before this scaled. Pure integer arithmetic (no log2 ulp at
    * power-of-two boundaries), reproducible in oracle SQL as
    * GREATEST(floor, CEIL(LOG2(CEIL(n / target)))). */
  def srpPlanesFor(n: Long, targetPerBucket: Int = 8, floor: Int = 8): Int = {
    val buckets = math.max(1L, (n + targetPerBucket - 1) / targetPerBucket)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))
    math.max(floor, bits)
  }

  /** Adaptive IVF quantizer stride ≈ √N, so nlist ≈ √N and both the
    * assignment pass (N × nlist dots) and per-list candidate volume
    * scale O(N√N) rather than the O(N²) a FIXED stride gives (nlist =
    * N/stride ⇒ assignment N²/stride). The floor keeps small scales —
    * and the sf0.01 correctness oracle — on their original
    * parameters. */
  def ivfStrideFor(n: Long, floor: Long = 25L): Long =
    math.max(floor, math.ceil(math.sqrt(n.toDouble)).toLong)

  /** Per-plane signed projections (margins) as array<double> — one
    * native dot product per plane. Bucket bits are the margin signs;
    * |margin| measures how close the vector sits to each boundary
    * (the multi-probe ordering criterion). */
  def srpMargins(vec: Column, planes: Array[Array[Double]]): Column =
    array(planes.map(p => ndot(vec, array(p.map(lit): _*))): _*)

  /** Bucket id from a *bound* margins column (stage it through a select
    * first — inlining re-evaluates every dot per bit). */
  private def bucketFromMargins(marg: Column, numPlanes: Int): Column =
    aggregate(
      sequence(lit(1), lit(numPlanes)),
      lit(0L),
      (acc, j) => acc + when(element_at(marg, j) >= 0d,
        call_function("shiftleft", lit(1L), j - 1)).otherwise(lit(0L)))

  /** Sign-random-projection LSH bucket id (one probe). */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column =
    bucketFromMargins(srpMargins(vec, planes), planes.length)

  /** Rademacher (±1) hyperplanes derived from md5("srp:j:d") — the
    * oracle-reproducible plane family: DuckDB recomputes identical
    * components from its own md5() (+1 iff the first hex digit is odd),
    * so SRP bucketing built on these planes is differentially testable
    * end-to-end (the q41 oracle replicates bucket assignment AND the
    * exact-cosine verify in pure SQL). Sign-random projections with
    * Rademacher components are a standard SRP variant (Charikar '02
    * needs only symmetric sign-balanced components). */
  def md5RademacherPlanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (j, d) =>
      md.reset()
      val digest = md.digest(s"srp:$j:$d".getBytes("UTF-8"))
      val firstHexDigit = (digest(0) >> 4) & 0xf
      if (firstHexDigit % 2 == 1) 1.0 else -1.0
    }
  }

  /** LSH-bucketed near-dup: compare only within SRP buckets, verify with
    * exact cosine. Approximate (bucket boundaries lose some recall) —
    * that's the scale trade; `numPlanes` controls bucket granularity and
    * `multiProbe` buys recall back: each vector additionally probes the
    * `multiProbe` buckets reached by flipping its lowest-|margin| bits
    * (the boundaries it sits closest to — where its true neighbors most
    * likely landed on the other side). Probing multiplies candidate
    * volume by ≤ (1 + multiProbe) but adds no new shuffle shapes: the
    * probe side explodes, the build side stays one row per vector.
    * `planesOverride` swaps the hyperplane family (default: splitmix
    * [[hyperplanes]]; the oracle path passes [[md5RademacherPlanes]]). */
  def lshBucketed(
      vectors: DataFrame,
      threshold: Double,
      numPlanes: Int,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      multiProbe: Int = 0,
      planesOverride: Array[Array[Double]] = null): DataFrame = {
    val planes = Option(planesOverride).getOrElse(hyperplanes(numPlanes, dim))
    val v0 = withNorm(vectors, idCol, vecCol, "id", "v", "n")
      .withColumn("marg", srpMargins(col("v"), planes))
    val v = v0
      .withColumn("bucket", bucketFromMargins(col("marg"), numPlanes))
      .localCheckpoint(true) // self-joined below

    if (multiProbe <= 0) {
      val rhs = v.select(col("id").as("id2"), col("v").as("v2"),
        col("n").as("n2"), col("bucket").as("bucket2"))
      v.join(rhs, col("bucket") === col("bucket2") && col("id") < col("id2"))
        .select(col("id").as("id_a"), col("id2").as("id_b"),
          (ndot(col("v"), col("v2")) / (col("n") * col("n2"))).as("score"))
        .where(col("score") >= threshold)
    } else {
      // probe buckets = primary + flips of the multiProbe lowest-|margin|
      // bits, ranked via array_sort on (|margin|, plane index) structs
      val ranked = slice(
        array_sort(transform(sequence(lit(1), lit(numPlanes)),
          j => struct(abs(element_at(col("marg"), j)).as("m"), (j - 1).as("j")))),
        1, multiProbe)
      val probes = concat(
        array(col("bucket")),
        transform(ranked, s =>
          col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), s.getField("j")))))
      // ids-only candidate generation, then vectors joined back for
      // scoring (only candidate vectors cross the scoring shuffle)
      val lhs = v.select(col("id"), explode(probes).as("pb"))
      val rhs = v.select(col("id").as("id2"), col("bucket").as("bucket2"))
      val cand = lhs.join(rhs, col("pb") === col("bucket2") && col("id") =!= col("id2"))
        .select(least(col("id"), col("id2")).as("id_a"),
          greatest(col("id"), col("id2")).as("id_b"))
        .distinct()
      cand
        .join(v.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
        .join(v.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (ndot(col("va"), col("vb")) / (col("na") * col("nb"))).as("score"))
        .where(col("score") >= threshold)
    }
  }
}
