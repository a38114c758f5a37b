package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation.
  *
  * Scale notes (the point of each design):
  *  - [[exact]] is one hash-partitioned aggregation — the minimum possible
  *    work; at 100 TB it's a single shuffle on a 64-bit hash key, and the
  *    map-side partial aggregation collapses duplicates before the wire.
  *  - [[minhashCandidates]] is the LSH scale path: cost is
  *    O(docs × bands) rows through one shuffle instead of the O(docs²)
  *    all-pairs join. Band tuning: P(candidate | jaccard=s) = 1-(1-s^r)^b.
  *    Defaults (b=32, r=2) give recall ≈ 1 - 6e-7 at s=0.6 — chosen so the
  *    verified output is indistinguishable from the exact join at the
  *    thresholds we use, while still pruning the quadratic space.
  *  - [[jaccardJoinExact]] is the inverted-index exact join — fine at
  *    small SF and as the verifier, quadratic in the worst case; the LSH
  *    path exists precisely because this one does not survive 100×.
  *  - [[simhashNearDup]] banding on 16-bit chunks guarantees (pigeonhole)
  *    that any pair within hamming distance 3 shares at least one chunk,
  *    so candidate generation is lossless for the ≤3 threshold.
  */
object Dedup {

  /** (doc, pos, gram) rows for the substring-span operators: 1-based
    * window positions over the single-space tokenization. The string
    * path materializes each window via `array_join(slice(...))`; the
    * hash path (r17) rides [[graft.functions.ShingleHashSeq]] — one
    * codegen'd pass over the text bytes, positional 64-bit window
    * hashes, no gram strings allocated. Both yield identical (doc,
    * pos) structure; gram equality over the hashes matches string
    * equality up to ~1e-13 per-doc collision odds (spec-pinned
    * equivalent results on the test corpus). */
  private def gramRows(docs: DataFrame, gramLen: Int, hashGrams: Boolean,
      idCol: String, textCol: String): DataFrame =
    if (hashGrams) {
      graft.functions.VectorExpressions.register(docs.sparkSession)
      // posexplode of an empty/null hash array emits nothing — no
      // short-doc guard needed
      docs.select(col(idCol),
        posexplode(call_function("shingle_hash_seq", col(textCol),
          lit(gramLen))).as(Seq("pos0", "gram")))
        .withColumn("pos", col("pos0") + 1).drop("pos0")
    } else {
      val gramStr = expr(
        s"transform(sequence(1, size(tk) - ${gramLen - 1}), " +
          s"i -> array_join(slice(tk, i, $gramLen), ' '))")
      docs.select(col(idCol), split(col(textCol), " ").as("tk"))
        .where(size(col("tk")) >= gramLen)
        .select(col(idCol), posexplode(gramStr).as(Seq("pos0", "gram")))
        .withColumn("pos", col("pos0") + 1).drop("pos0")
    }

  /** [[jaccardJoinExact]] auto-strategy thresholds: PPJoin needs BOTH
    * a large estimated candidate volume (pairs per document — measured
    * crossover between 546 dense and 76 652 Zipfian) AND hot-key skew
    * (sampled max document frequency as a share of the corpus —
    * 0.4 % dense vs 11 % Zipfian); see the probe's comment for the
    * sf0.1/sf1 measurements behind both constants. */
  val AutoPrefixPairsPerDoc = 4096.0
  val AutoPrefixHotKeyShare = 0.02

  /** Exact SUBSTRING-span dedup accounting (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" core,
    * arXiv:2107.06499, re-expressed relationally): find every length-L
    * token span that occurs in ≥ 2 distinct documents and report, per
    * document, how many of its span positions are duplicated and how
    * many TOKENS the union of those spans covers — the amount an exact
    * substring dedup pass would cut. The suffix-array step of the
    * paper is only a device for finding repeated spans; the relational
    * equivalent is one shuffle on the gram key.
    *
    * Scale shape: tokens explode to (doc, pos, gram) once; duplicated
    * grams come from ONE hash-partitioned aggregation with map-side
    * partial counts; the join back is gram-partitioned; the span-union
    * length needs NO interval merge — all spans have length L, so the
    * union is Σ min(L, nextPos − pos) from one per-doc window (lead).
    * Nothing is quadratic and nothing collects. `hashGrams = true` is
    * the 100 TB shape: positional 64-bit window hashes straight from
    * the text bytes (native [[graft.functions.ShingleHashSeq]] — no
    * per-window gram strings materialized, 3.1× less shuffle measured
    * at sf1) with identical results up to ~1e-13 per-doc collision
    * odds; the string path keeps the result mechanically reproducible
    * by the SQL oracle and is what the spec equivalence pins against. */
  def substringSpans(docs: DataFrame, gramLen: Int = 10,
      hashGrams: Boolean = false,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      split(col(textCol), " ").as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    val grams = gramRows(docs, gramLen, hashGrams, idCol, textCol)
    // duplicated = seen in ≥ 2 distinct docs (cross-document spans;
    // within-doc repetition is q61's territory). ≥2 distinct ids ⟺
    // min(id) ≠ max(id) over the gram's partition, so dup detection is
    // ONE window over ONE gram-keyed shuffle — the groupBy(gram) +
    // join(gram)-back form shuffled the full gram stream twice (r18;
    // the two shuffles were the whole gap to the suffix-array oracle).
    // Skew tradeoff (r18 advice, deliberate): the window loses the
    // aggregate form's map-side pre-collapse, so the hottest gram's
    // full occurrence list sorts through one task (spilled by
    // UnsafeExternalSorter, not held in memory). Pre-collapsing isn't
    // available here — every (doc, pos) row IS the payload (span
    // coverage needs positions, not per-doc counts) — and a length-L
    // WORD gram is a far colder key than a token: the sf1 probe put
    // the hottest 10-gram at <0.1 % of corpus rows. A corpus with
    // boilerplate hot enough to overwhelm one task's spill budget
    // should pre-filter those grams like the Jaccard path's
    // AutoPrefixHotKeyShare gate.
    val wg = Window.partitionBy("gram")
    val hits = grams
      .withColumn("__mn", min(col(idCol)).over(wg))
      .withColumn("__mx", max(col(idCol)).over(wg))
      .where(col("__mn") =!= col("__mx"))
      .select(col(idCol), col("pos"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val perDoc = hits
      .withColumn("cov", least(
        coalesce(lead(col("pos"), 1).over(w) - col("pos"), lit(gramLen)),
        lit(gramLen)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("cov")).as("covered_tokens"))
    toks.select(col(idCol), col("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        col("n_tokens"))
  }

  /** Exact substring-span dedup CUT (r17): the operator a trainer
    * actually runs after the [[substringSpans]] accounting — remove
    * every occurrence of a duplicated length-L span EXCEPT the globally
    * first (lowest (doc, pos), the keep-first policy; Lee et al. 2022
    * §2 keeps one occurrence of each duplicated substring) and emit the
    * cleaned text.
    *
    * Scale shape: the gram/dup plumbing is [[substringSpans]]' (one
    * gram-keyed shuffle with map-side partial aggregation); the first
    * occurrence per gram is a struct-min in the SAME aggregation;
    * overlapping cut spans merge with one per-doc running-max window
    * (no interval list on the driver); reconstruction is per-row
    * higher-order functions over the doc's own collect_list'ed merged
    * spans — Σ span lengths ≤ the doc's token count, so per-row memory
    * is bounded by the document itself. Nothing quadratic, nothing
    * collected. `hashGrams = true` rides 8-byte gram hashes at scale
    * (16-byte shuffle rows), identical results modulo 64-bit collisions
    * (spec-verified equivalent on the test corpus). */
  def substringDedup(docs: DataFrame, gramLen: Int = 10,
      hashGrams: Boolean = false,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    val grams = gramRows(docs, gramLen, hashGrams, idCol, textCol)
    // duplicated grams (≥2 distinct docs ⟺ min(id) ≠ max(id)) + their
    // first occurrence (min struct(doc,pos)), all from ONE window over
    // ONE gram-keyed shuffle — the groupBy+join-back form shuffled the
    // full gram stream twice (r18). Cut positions: every non-first
    // occurrence of a duplicated gram. min(id) is NOT aggregated
    // separately: struct ordering is lexicographic, so
    // min(struct(d,p)).d IS min(id) — two window buffers instead of
    // three in the hottest stage (r20, guide §1.2 per-task work).
    val wg = Window.partitionBy("gram")
    val cuts = grams
      .withColumn("__mx", max(col(idCol)).over(wg))
      .withColumn("__first",
        min(struct(col(idCol).as("d"), col("pos").as("p"))).over(wg))
      .where(col("__first").getField("d") =!= col("__mx"))
      .where(!(col(idCol) === col("__first").getField("d") &&
        col("pos") === col("__first").getField("p")))
      .select(col(idCol), col("pos"))
    // merge overlapping [pos, pos+L) spans per doc: a span starts a new
    // island iff its start clears the running max end of its predecessors
    val w = Window.partitionBy(idCol).orderBy("pos")
    val prevEnd = max(col("pos") + gramLen)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val merged = cuts
      .withColumn("__ni",
        when(prevEnd.isNull || col("pos") >= prevEnd, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__ni"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + gramLen).as("e")) // [s, e)
      .groupBy(idCol)
      .agg(collect_list(struct(col("s"), col("e"))).as("cutspans"))
    toks.join(merged, Seq(idCol), "left")
      .withColumn("cut_idx", coalesce(
        expr("flatten(transform(cutspans, c -> sequence(c.s, c.e - 1)))"),
        expr("array()").cast("array<int>")))
      .withColumn("keep_idx",
        when(size(col("tk")) < 1, expr("array()").cast("array<int>"))
          .otherwise(expr("array_except(sequence(1, size(tk)), cut_idx)")))
      .select(col(idCol),
        expr("array_join(transform(keep_idx, i -> element_at(tk, i)), ' ')")
          .as("text_dedup"),
        size(col("keep_idx")).cast("long").as("kept_tokens"),
        col("n_tokens"))
  }

  /** Exact dedup: group by normalized text, keep the lowest doc id as the
    * canonical representative. `count` is the cluster size. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val norm = lower(trim(col(textCol)))
    docs
      .groupBy(norm.as("norm_text"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** MinHash+LSH candidate pairs verified with exact Jaccard.
    *
    * Threshold is the rational `thresholdNum/thresholdDen` applied as an
    * exact integer comparison (`den*inter >= num*union`) — no floating
    * point anywhere, so results hash-match an exact-join oracle when LSH
    * recall is 1 at the threshold (see class doc for the band math).
    *
    * Shuffle shape: the band join moves only (id, band, key) — 16 bytes a
    * row; shingle arrays are joined back in only for the (few) surviving
    * candidate pairs. Returns (doc_a, doc_b, inter, un) with doc_a < doc_b,
    * where inter/un are the exact intersection/union sizes.
    */
  def minhashCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdNum: Int = 6,
      thresholdDen: Int = 10,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands must divide numHashes with rows-per-band >= 1, got k=$numHashes b=$bands " +
        "(r=0 would make every doc collide in every band; a remainder silently drops hashes)")
    val r = numHashes / bands
    graft.functions.VectorExpressions.register(docs.sparkSession)
    // Shingle arrays are NEVER materialized corpus-wide (r20, guide §8
    // "shuffle/store a lightweight proxy, move heavy bytes once"): the
    // previous shape eagerly checkpointed every doc's hash array —
    // ~16 KB/doc, 4× the text bytes at the reference corpus shape — only
    // so the verification joins could later re-read a VANISHING fraction
    // of them (measured at sf10/500k docs: the array checkpoint write
    // alone was ~12 s and the verification semi-join re-read all of it,
    // ~18 s). The signature pass now computes shingles inline — one text
    // scan, arrays live only inside the stage — and verification
    // re-derives arrays ONLY for candidate docs, below.
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__txt"))
    // native single-pass minhash kernel (see MinHashSignature scaladoc);
    // sh/sig staged as bound columns before banding — inlining them into
    // the band lambda would re-evaluate all k min-hashes once per band
    val sig = base
      .select(col("id"),
        call_function("shingle_hashes", col("__txt"), lit(shingleLen)).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"),
        call_function("minhash_signature", col("sh"), lit(numHashes)).as("sig"))
    val keyed = sig
      .select(col("id"), explode(TextOps.lshBands(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .localCheckpoint(true) // self-joined below: lazy persist would let
      // the two join sides race to populate the cache inside one job
    val rhs = keyed.select(col("id").as("id2"), col("band").as("band2"), col("key").as("key2"))
    val candidates = keyed
      .join(rhs, col("band") === col("band2") && col("key") === col("key2") &&
        col("id") < col("id2"))
      .select(col("id").as("doc_a"), col("id2").as("doc_b"))
      .distinct() // same pair may collide in several bands
      .localCheckpoint(true) // referenced 3x below (id-prune + both joins)
    // Semi-join prune BEFORE shingling (r20): candidates are a vanishing
    // fraction of the corpus, so the prune runs on (id, text) straight
    // off the scan — broadcastable candidate ids prune with NO shuffle —
    // and the arrays are recomputed for survivors only. When candidates
    // outgrow broadcast, the semi-join shuffles exactly the rows whose
    // arrays the verification join was about to shuffle anyway.
    // Checkpointed: referenced by BOTH pair joins, and candidate-volume-
    // sized (never corpus-sized).
    val candIds = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as("id")).distinct()
    val needed = base.join(candIds, Seq("id"), "left_semi")
      .select(col("id"),
        call_function("shingle_hashes", col("__txt"), lit(shingleLen)).as("sh"))
      .where(size(col("sh")) > 0)
      .localCheckpoint(true)
    candidates
      .join(needed.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(needed.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("sz"))
      .select(col("doc_a"), col("doc_b"), col("inter"), (col("sz") - col("inter")).as("un"))
      .where(col("inter") * thresholdDen >= col("un") * thresholdNum)
  }

  /** Exact n-gram Jaccard similarity join via inverted index, with two
    * lossless candidate-generation strategies:
    *  - count-join: postings on 64-bit shingle hashes, pair
    *    intersection counted by a map-side-combinable aggregation.
    *    Wins on dense vocabularies (no hot keys).
    *  - PPJoin prefix filtering (Xiao et al., WWW'08 — public
    *    algorithm): index only each doc's rarest `n - ceil(t*n) + 1`
    *    shingles; wins on Zipfian vocabularies, where hot shingles
    *    make the plain inverted-index join quadratic.
    *  - `prefixFilter = None` (default) picks BY MEASUREMENT: one
    *    sampled-keys aggregate estimates the count-join's pair volume
    *    Σ df² and switches to PPJoin past [[AutoPrefixPairsPerDoc]]
    *    candidate pairs per document. Measured (r15, 60 k docs ×
    *    ~100 tokens): Zipf(1.05) corpus — 76 652 pairs/doc, PPJoin
    *    8.5 s vs count-join 31.7 s; dense synthetic corpus — 546
    *    pairs/doc, count-join 2.2 s vs PPJoin 3.5 s. The probe costs
    *    0.3-2 s and reads the already-checkpointed shingle sets.
    * Same exact-integer threshold contract as [[minhashCandidates]];
    * returns (doc_a, doc_b, inter, un). */
  def jaccardJoinExact(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdNum: Int = 1,
      thresholdDen: Int = 2,
      shingleLen: Int = 1,
      prefixFilter: Option[Boolean] = None): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    // sh = sorted-distinct 64-bit shingle hashes (see ShingleHashes);
    // works for shingleLen == 1 too (distinct token hashes).
    val sets = docs
      .select(col(idCol).as("id"),
        call_function("shingle_hashes", col(textCol), lit(shingleLen)).as("sh"))
      .where(size(col("sh")) > 0).localCheckpoint(true) // multiply referenced

    val usePrefix = prefixFilter.getOrElse {
      // 1-in-97 sample of shingle KEYS (hash-mod, deterministic), each
      // with its FULL posting list — an unbiased per-key df. Two
      // signals: Σ df² × 97 estimates the count-join's join-output
      // volume, and max df / nDocs measures HOT-KEY SKEW — the thing
      // PPJoin's prefix filter actually removes. Volume alone
      // mispicks on dense vocabularies at scale (df grows with the
      // corpus uniformly, pairs/doc crosses any constant, yet
      // count-join stays faster — measured sf1-dense: 6.9 s vs
      // PPJoin 11.5 s at 5.5 k pairs/doc, 0.4 % max-df); skew is
      // scale-invariant for a fixed distribution (Zipf corpus: 11 %
      // max-df → PPJoin 8.5 s vs 31.7 s).
      val r = sets.select(explode(col("sh")).as("h"))
        .where(pmod(col("h"), lit(97)) === 0)
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * col("df")).as("sumdf2"),
          max(col("df")).as("maxdf"))
        .head()
      val estPairs = if (r.isNullAt(0)) 0.0 else r.getLong(0) * 97.0
      val maxDf = if (r.isNullAt(1)) 0L else r.getLong(1)
      val nDocs = sets.count().max(1L)
      estPairs / nDocs > AutoPrefixPairsPerDoc &&
        maxDf.toDouble / nDocs > AutoPrefixHotKeyShare
    }

    if (usePrefix) {
      // PPJoin-style candidate generation: order each doc's shingles by
      // global document frequency (rarest first), index only the prefix
      // of length n - ceil(t*n) + 1. Lossless for Jaccard >= t; wins on
      // Zipfian vocabularies where hot tokens would otherwise join
      // quadratically. Verification = exact set intersection.
      val postings = sets.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      val freq = postings.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val ceilTn = (col("n") * thresholdNum + thresholdDen - 1)
        .divide(thresholdDen).cast("long")
      val w = Window.partitionBy(col("id")).orderBy(col("df"), col("s"))
      val prefix = postings.join(freq, "s")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= col("n") - ceilTn + 1)
        .select(col("id"), col("s").as("h"))
      val p2 = prefix.select(col("id").as("id2"), col("h").as("h2"))
      val candidates = prefix
        .join(p2, col("h") === col("h2") && col("id") < col("id2"))
        .select(col("id").as("doc_a"), col("id2").as("doc_b"))
        .distinct()
        .localCheckpoint(true) // referenced 3x (id-prune + both joins)
      // semi-join prune: see minhashCandidates — only candidate docs'
      // shingle arrays should cross the verification shuffle
      val candIds = candidates
        .select(explode(array(col("doc_a"), col("doc_b"))).as("id")).distinct()
      val needed = sets.join(candIds, Seq("id"), "left_semi")
      candidates
        .join(needed.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(needed.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
          (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("sz"))
        .select(col("doc_a"), col("doc_b"), col("inter"), (col("sz") - col("inter")).as("un"))
        .where(col("inter") * thresholdDen >= col("un") * thresholdNum)
    } else {
      // Count-join: inverted index on 64-bit shingle hashes (long join
      // keys shuffle ~5x cheaper than the shingle text), intersection
      // sizes from a map-side-combinable pair count — no arrays cross
      // the shuffle at all. The right default for dense vocabularies.
      val postings = sets.select(col("id"), explode(col("sh")).as("h"))
      val p2 = postings.select(col("id").as("id2"), col("h").as("h2"))
      val inter = postings
        .join(p2, col("h") === col("h2") && col("id") < col("id2"))
        .groupBy(col("id").as("doc_a"), col("id2").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      // No broadcast hint: sizes has one row per document, which is NOT
      // broadcastable at corpus scale — plain equi-joins let AQE pick
      // broadcast when small and shuffle-join (pairs ≪ docs) when not.
      val sizes = sets.select(col("id"), size(col("sh")).cast("long").as("n"))
      inter
        .join(sizes.select(col("id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("un"))
        .where(col("inter") * thresholdDen >= col("un") * thresholdNum)
    }
  }

  /** 64-bit SimHash of a token multiset: per bit, sum ±1 weighted by token
    * frequency (hash = xxhash64 of the token), sign → bit. Implemented as a
    * JVM closure (registered in [[PipelineFunctions]]) — the 64-way
    * bit-loop is a poor fit for Catalyst HOF expressions. */
  def simhash64(toks: Seq[String]): Long = {
    val counts = new Array[Int](64)
    if (toks != null) toks.foreach { t =>
      // Inline xxhash64-compatible per-token hash: reuse Spark's own
      // XxHash64 so SQL-side and closure-side hashes agree.
      val bytes = t.getBytes("UTF-8")
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** SimHash near-duplicate pairs with hamming distance ≤ `maxHamming`.
    * Bands the 64-bit simhash into 4×16-bit chunks: any pair at distance
    * ≤ 3 must agree on ≥ 1 chunk (pigeonhole), so the chunk-join is a
    * lossless candidate generator; `bit_count(a^b)` verifies exactly.
    *
    * `simExpr` overrides the signature expression (default: the native
    * XXH64-family `simhash64` kernel). The q31 oracle path passes
    * `md5_simhash60` here — same banding/verification code, md5 token
    * hashes the DuckDB oracle can recompute — so the losslessness of
    * the chunk banding is differentially verified. */
  def simhashNearDup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      simExpr: Column = null): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming: the 4x16-bit chunk banding is lossless only for " +
        "distance <= 3 (pigeonhole); larger thresholds would silently miss pairs")
    // native byte-level kernel; bit-identical to Dedup.simhash64 over
    // split(text, ' ') (same XXH64-seed-42 per-token family)
    graft.functions.VectorExpressions.register(docs.sparkSession)
    graft.functions.Md5Expressions.register(docs.sparkSession)
    val sim = Option(simExpr).getOrElse(call_function("simhash64", col(textCol)))
    val withSim = docs.select(col(idCol).as("id"), sim.as("sim"))
    val chunked = withSim.select(col("id"), col("sim"),
      explode(transform(sequence(lit(0), lit(3)),
        i => struct(i.cast("int").as("chunk"),
          call_function("shiftright", col("sim"), (i * lit(16)).cast("int"))
            .bitwiseAND(lit(0xFFFFL)).as("ck")))).as("c"))
      .select(col("id"), col("sim"), col("c.chunk").as("chunk"), col("c.ck").as("ck"))
    val rhs = chunked.select(col("id").as("id2"), col("sim").as("sim2"),
      col("chunk").as("chunk2"), col("ck").as("ck2"))
    chunked
      .join(rhs, col("chunk") === col("chunk2") && col("ck") === col("ck2") &&
        col("id") < col("id2"))
      .select(col("id").as("doc_a"), col("id2").as("doc_b"),
        bit_count(col("sim").bitwiseXOR(col("sim2"))).cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-duplicate pair list: the step a real
    * dedup pipeline needs AFTER pair generation — near-dup is not
    * transitive, so "drop one of each pair" either under-deletes (chains
    * A~B~C keep two of three) or over-deletes; the standard policy is to
    * cluster the pair graph and keep one canonical document per component.
    *
    * Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public).
    * Each round is two hash-shuffles on node ids; converges in
    * O(log² n) rounds (O(log n) in practice), independent of component
    * diameter — unlike naive label propagation, whose round count is the
    * graph diameter (a 100 TB corpus with chained boilerplate templates
    * can have very long near-dup chains).
    *
    * Scale shape: only (u, v) id pairs ever shuffle (16 B/row); per-node
    * neighborhood minima come from a map-side-combinable `min` aggregation
    * — neighbor lists are never materialized, so a hot node (a template
    * duplicated a million times) costs a combiner, not a 10⁶-element
    * array on one task. Each iteration is eagerly localCheckpoint-ed to
    * truncate lineage (iterative DataFrame plans otherwise grow
    * exponentially). Convergence is exact AND single-job: the edge set
    * is a fixpoint of both stars iff a signed-weight union of old and
    * new edges aggregates to all-zero groups (both are distinct sets,
    * so this is precisely an empty symmetric difference).
    *
    * Returns one row per node of `pairs`: (doc_id, cluster_id) where
    * cluster_id is the component's minimum doc id (so a node IS canonical
    * iff doc_id = cluster_id). Singleton documents never appear in `pairs`
    * and are implicitly their own cluster.
    */
  /** Edge-count gate below which [[connectedComponents]] solves the
    * component graph driver-locally: 1M edges = a 16 MB collect — the
    * same bounded-allocation contract as a broadcast-join build side.
    * Near-dup pair graphs are a vanishing fraction of the corpus (the
    * pairs are the OUTPUT of a dedup candidate pass), so even 100 TB
    * corpora commonly land under this; the distributed star loop
    * engages above it. */
  val LocalEdgeCap: Long = 1L << 20

  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIter: Int = 50,
      localEdgeCap: Long = LocalEdgeCap): DataFrame = {
    val init = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // r19 (guide §1.2 "the distributed algorithm" + §5 bounded-driver
    // contract): the star loop costs ~6 tiny shuffle jobs per round
    // plus a checkpoint and a fixpoint probe — pure fixed job cost when
    // the edge set is small, which it almost always is (pairs are the
    // few survivors of LSH/semantic candidate generation, not the
    // corpus). Under the cap, collect the (already materialized,
    // counted-for-free) edge set and run exact union-find driver-side:
    // identical output (component-min labels, deterministic), 3 tiny
    // jobs total instead of ~30. Measured at sf0.1 (with the q73
    // assignment checkpoint that rides on it): q60 3.35 -> 1.59 s,
    // q73 4.16 -> 1.13 s. Above the cap the distributed
    // Large-Star/Small-Star loop runs unchanged.
    val nEdges = init.count()
    if (nEdges <= localEdgeCap) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val edges = init.as[(Long, Long)].collect()
      val parent = new java.util.HashMap[Long, Long](edges.length * 2)
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) { x = p; p = parent.getOrDefault(x, x) } // root
        val root = x
        x = x0
        while (x != root) { val nxt = parent.get(x); parent.put(x, root); x = nxt }
        root
      }
      edges.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          // min root wins, so every root IS its component's min id
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val out = new Array[(Long, Long)](parent.size)
      val it = parent.keySet().iterator()
      var i = 0
      while (it.hasNext) { val n = it.next(); out(i) = (n, find(n)); i += 1 }
      return spark.createDataset(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
        .toDF("doc_id", "cluster_id")
    }

    // Large-Star: every node u links its LARGER neighbors to the minimum
    // of its closed neighborhood. Small-Star: every node u links its
    // smaller-or-equal neighbors (and itself) to that side's minimum.
    // Both emit only (node, newParent) pairs via groupBy-min + re-join.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
      dir.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    var edges = init
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // Exact fixpoint test in ONE job (was count + count + except =
      // 3 jobs × O(log n) rounds): both sides are distinct sets, so a
      // signed-weight union aggregates to 0 exactly on the
      // intersection and ±1 on the symmetric difference — any nonzero
      // group means not-yet-converged, and limit(1) stops the scan at
      // the first one.
      converged = next.select(col("u"), col("v"), lit(1L).as("w"))
        .union(edges.select(col("u"), col("v"), lit(-1L).as("w")))
        .groupBy("u", "v").agg(sum(col("w")).as("s"))
        .where(col("s") =!= 0L)
        .limit(1).count() == 0L
      edges = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // At the fixpoint every edge is (node -> component minimum); roots
    // appear only on the right. Emit a row for every original node.
    val nodes = init.select(col("u")).union(init.select(col("v"))).distinct()
    nodes
      .join(edges.select(col("u"), col("v").as("root")), Seq("u"), "left")
      .select(col("u").as("doc_id"),
        coalesce(col("root"), col("u")).as("cluster_id"))
  }
}
