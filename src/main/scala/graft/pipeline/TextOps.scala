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
    * Sizing (r17): `expectedGrams = 0` (the default) sizes the filter
    * from the benchmark's OWN distinct-gram count — one bounded job
    * over the small side. A fixed oversized default is not free even
    * though the filter is "bounded": the old 4M-gram / 8 MB literal
    * rode inside the corpus-scan plan and was serialized to every
    * task, dominating the wall at small SFs. Pin it explicitly when
    * the benchmark side is itself too big to pre-count. */
  def bloomDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      gramLen: Int = 5, expectedGrams: Long = 0L,
      bitsPerGram: Long = 16L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.SqlInternals
    import org.apache.spark.sql.types.BinaryType
    // native per-doc-distinct 64-bit gram hashes (ShingleHashes, r17):
    // membership and countDistinct are set operations, so hash identity
    // suffices — no gram strings materialized, and the hashes feed the
    // Bloom filter directly (already avalanched)
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    def gramsOf(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      explode(call_function("shingle_hashes", col(textCol),
        lit(gramLen))).as("gram"))
    // cached: the benchmark side feeds the (optional) sizing count, the
    // filter build, and the residual join — three passes over the SMALL
    // side of the operator
    val bGrams = gramsOf(bench).select(col("gram")).distinct().cache()
    val nGrams =
      if (expectedGrams > 0) expectedGrams
      else math.max(bGrams.count(), 1024L)
    // one aggregate job builds the filter; its bytes are bounded by
    // construction (bits/8), so the driver collect is a broadcast of a
    // fixed-size artifact — the same shape as IVF's centroid collect
    val bfRow = bGrams.agg(SqlInternals.column(
      new BloomFilterAggregate(
        SqlInternals.expression(col("gram")),
        Literal(nGrams), Literal(nGrams * bitsPerGram))
        .toAggregateExpression()).as("bf")).head()
    val candidates =
      if (bfRow.isNullAt(0)) gramsOf(corpus).limit(0) // empty benchmark
      else {
        val bf = Literal(bfRow.getAs[Array[Byte]](0), BinaryType)
        gramsOf(corpus).where(SqlInternals.column(
          BloomFilterMightContain(bf,
            SqlInternals.expression(col("gram")))))
      }
    val hits = candidates
      .join(bGrams, "gram") // residual exact join: kills fp survivors
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("shared"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("shared"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("shared"), lit(0L)) > 0).cast("int").as("contaminated"))
  }
}
