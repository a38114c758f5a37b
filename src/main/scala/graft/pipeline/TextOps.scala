package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (incl.
  * higher-order array functions) so the expressions stay inside Catalyst —
  * no Python, no serialization boundary — and compose with predicate
  * pushdown / column pruning on the `documents` scan.
  *
  * Determinism: all hashing is `xxhash64` with literal seeds; no RNG.
  */
object TextOps {

  /** Whitespace tokenization (corpus text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (for Jaccard-style set similarity). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles: `["a b c", "b c d", ...]`. Empty when the
    * document has fewer than `n` tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " ")))

  // MinHash signatures are computed by the native codegen kernel
  // graft.functions.MinHashSignature (registered as minhash_signature);
  // the HOF formulation that used to live here materialized k arrays
  // per row and cost ~40x — see that expression's scaladoc.

  /** LSH band keys over a MinHash signature: `b` bands of `r = k/b` rows;
    * key = hash of the band's slice (band index is part of the join key so
    * different bands never collide). Returns array<struct<band:int,key:long>>.
    */
  def lshBands(signature: Column, b: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(b - 1)),
      i =>
        struct(
          i.cast("int").as("band"),
          xxhash64(i, slice(signature, i * lit(r) + lit(1), lit(r))).as("key")))

  /** Exact Jaccard similarity of two pre-distincted arrays, as double. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0d, lit(0d)).otherwise(inter / union)
  }

  /** English/Spanish/German/French stopword marker sets for the n-gram
    * language-ID heuristic. Tiny on purpose: the heuristic is
    * count-markers-and-argmax, SQL-expressible on both engines. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"))

  /** Count of tokens that appear in `markers` (with repetition — frequency
    * matters for language ID, unlike set intersection). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  /** Argmax language with deterministic tie-break order en > es > de > fr. */
  def langId(toks: Column): Column = {
    val en = markerHits(toks, langMarkers("en"))
    val es = markerHits(toks, langMarkers("es"))
    val de = markerHits(toks, langMarkers("de"))
    val fr = markerHits(toks, langMarkers("fr"))
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Repetition statistics over a gram array — the Gopher-style
    * repetition quality signals (Rae et al. 2021, "Scaling Language
    * Models", §A1.1) re-expressed over word n-grams: returns
    * `struct<top: long, dups: long>` where `top` is the occurrence
    * count of the MOST FREQUENT gram and `dups` the number of gram
    * occurrences belonging to grams that appear at least twice.
    *
    * One `array_sort` plus one `aggregate` pass per row (equal grams
    * become adjacent runs; run length = occurrence count), so the
    * operator is scan-bound with ZERO shuffle — per-document state
    * never leaves the row, which is what survives a 100 TB corpus. */
  def gramRepetition(grams: Column): Column = {
    def closeRun(acc: Column): Column =
      acc.getField("dups") +
        when(acc.getField("run") >= 2, acc.getField("run")).otherwise(lit(0L))
    aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("top"), lit(0L).as("dups")),
      (acc, g) => {
        val cont = acc.getField("run") > 0 && acc.getField("prev") === g
        struct(
          g.as("prev"),
          when(cont, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          when(cont, acc.getField("top"))
            .otherwise(greatest(acc.getField("top"), acc.getField("run")))
            .as("top"),
          when(cont, acc.getField("dups")).otherwise(closeRun(acc)).as("dups"))
      },
      acc => struct(
        greatest(acc.getField("top"), acc.getField("run")).as("top"),
        closeRun(acc).as("dups")))
  }

  // ---- PII patterns: the common Java-regex/RE2 subset, so the Spark
  // side and the DuckDB oracle compile the IDENTICAL pattern text ----

  /** Email addresses (common-subset regex; no nested quantifiers). */
  val EmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z0-9]"

  /** Dotted-quad IPv4 (word-bounded so version strings don't match). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style phone numbers in the +1-555-XXXX test shape. */
  val PhoneRe = "\\+1-555-\\d{4}"

  /** Redact PII in place. Email first, then IP, then phone — the order
    * is part of the contract (an email's host part may contain dotted
    * digits that would otherwise half-match the IP pattern). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Benchmark decontamination with a BLOOM PREFILTER — the 100 TB
    * shape when the eval-set gram table is too large to broadcast as
    * an exact set: build one Bloom filter over the benchmark's 64-bit
    * gram hashes (a BOUNDED artifact — `numBits/8` bytes regardless of
    * corpus size; 16 bits/gram ≈ 0.05 % fp), inline it as a literal so
    * the corpus-side membership test stays inside whole-stage codegen
    * with ZERO shuffle, and exact-join only the surviving ~0.05 % of
    * corpus grams. The result is EXACT — the filter only prunes; false
    * positives are removed by the residual join — and the corpus never
    * shuffles more than its (rare) candidate grams.
    *
    * Returns (doc_id, n_shared_grams, contaminated) over every corpus
    * row, like the exact-broadcast variant (SparkEntry q63).
    *
    * Sizing (r18): the filter is built by [[graft.functions
    * .BloomBuildAggregate]] — ONE aggregation job whose final merge
    * sizes the filter from the input's true distinct count, so there is
    * no separate sizing pass (the r17 distinct+cache+count chain cost
    * two extra shuffle jobs that dominated the wall at small SFs) and
    * no oversized fixed literal riding the corpus scan into every task
    * (the r15 8 MB-literal lesson). Pin `expectedGrams` only when even
    * the build-side distinct set must not materialize in one task. */
  def bloomDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      gramLen: Int = 5, expectedGrams: Long = 0L,
      bitsPerGram: Long = 16L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.SqlInternals
    import org.apache.spark.sql.types.BinaryType
    // native per-doc-distinct 64-bit gram hashes (ShingleHashes, r17):
    // membership and the hit count are set operations, so hash identity
    // suffices — no gram strings materialized, and the hashes feed the
    // Bloom filter directly (already avalanched)
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val benchHashes =
      call_function("shingle_hashes", col(textCol), lit(gramLen))
    // the residual side caches and warms CONCURRENTLY with the bloom
    // job (both scan the small benchmark side; overlapping them hides
    // one of q66's three fixed job costs — r18). The cached block is
    // bounded by the benchmark's gram count and dropped by callers'
    // normal unpersist hygiene (Bench clears per query; a one-shot
    // pipeline leaves one small block until session end).
    val bGrams = bench.select(explode(benchHashes).as("bgram"))
      .unionByName(corpus.sparkSession.range(1)
        .select(lit(null).cast("long").as("bgram")))
      .persist()
    val warm = scala.concurrent.Future(bGrams.count())(
      scala.concurrent.ExecutionContext.global)
    // one self-sizing aggregate job builds the filter, straight from
    // the per-doc gram-hash ARRAYS (no explode — r18); its bytes are
    // bounded by construction (bits/8 per distinct gram), so the driver
    // collect is a broadcast of a fixed-size artifact — the same shape
    // as IVF's centroid collect. Empty benchmark → all-zeroes filter →
    // nothing survives → every corpus row reports 0, no special case.
    val bfBytes = bench
      .agg(SqlInternals.column(
        graft.functions.BloomBuildAggregate(
          SqlInternals.expression(benchHashes),
          bitsPerItem = bitsPerGram, fixedNumItems = expectedGrams)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val bf = Literal(bfBytes, BinaryType)
    scala.concurrent.Await.ready(warm,
      scala.concurrent.duration.Duration.Inf)
    // r18: the Bloom test is FUSED into the gram kernel
    // (ShingleHashesBloom) — the corpus scan emits only the surviving
    // ~fp-rate gram hashes instead of exploding every gram into a row
    // for a codegen'd-but-post-explode `might_contain` Filter to drop.
    // A null SENTINEL is prepended to every document's survivor array
    // so each doc emits at least one row and the old corpus-wide final
    // left join disappears.
    val surv = SqlInternals.column(graft.functions.ShingleHashesBloom(
      SqlInternals.expression(col(textCol)), Literal(gramLen), bf))
    val candidates = corpus.select(col(idCol).as("doc_id"),
      explode(concat(
        array(lit(null).cast("long")),
        coalesce(surv, array().cast("array<long>")))).as("gram"))
    // residual exact check as a LEFT SEMI join against the broadcast
    // benchmark gram rows: false positives match nothing and drop;
    // true hits pass exactly ONCE regardless of how many benchmark
    // documents repeat the gram (semi-join semantics — no pre-distinct
    // exchange on the build side, no countDistinct Expand on the agg);
    // the null sentinel passes via a null-safe match against one
    // injected null build row. shared = count of non-null survivors.
    candidates
      .join(broadcast(bGrams),
        candidates("gram") <=> bGrams("bgram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(col("gram")).as("shared"))
      .select(col("doc_id"),
        col("shared").as("n_shared_grams"),
        (col("shared") > 0).cast("int").as("contaminated"))
  }

  /** Benchmark decontamination, EXACT-broadcast variant (r18): collect
    * the benchmark's distinct 64-bit gram hashes (the eval-set side of
    * decontamination is MBs against a corpus of TBs — the same
    * bounded-artifact collect as IVF centroids), broadcast them once
    * per executor, and count each corpus document's shared grams inside
    * ONE codegen'd scan expression ([[graft.functions.ShingleSetShared]]).
    * The corpus is never exploded, joined, or shuffled — the previous
    * explode+broadcast-join shape materialized every corpus gram as a
    * row before the join could drop it, which at 100 TB is ~50 T
    * short-lived rows for a result of one long per document.
    *
    * Returns (doc_id, n_shared_grams, contaminated) over every corpus
    * row; results are identical to the explode+join form (same hash
    * family, same distinct semantics). */
  def exactDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      gramLen: Int = 5): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.SqlInternals
    val spark = corpus.sparkSession
    graft.functions.VectorExpressions.register(spark)
    val benchHashes: Array[Long] = bench
      .select(explode(call_function("shingle_hashes", col(textCol),
        lit(gramLen))).as("g"))
      .distinct()
      .collect().map(_.getLong(0))
    java.util.Arrays.sort(benchHashes)
    val bc = spark.sparkContext.broadcast(benchHashes)
    val shared = SqlInternals.column(graft.functions.ShingleSetShared(
      SqlInternals.expression(col(textCol)), Literal(gramLen), bc))
    corpus.select(col(idCol).as("doc_id"),
      shared.as("n_shared_grams"),
      (shared > 0).cast("int").as("contaminated"))
  }
}
