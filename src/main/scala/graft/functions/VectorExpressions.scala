package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates an intermediate array per row and evaluates the lambda
  * interpretively per element. This expression compiles to a tight
  * primitive loop inside whole-stage codegen — the difference between an
  * ANN scan being memory-bandwidth-bound vs interpreter-bound, which at
  * 100 TB is the difference between one pass and ten.
  *
  * Accumulation order is sequential over the array, matching both the
  * HOF formulation and the DuckDB oracle's list_dot_product — results
  * are bit-identical. One intentional divergence: mismatched lengths
  * truncate to the shorter array (the HOF form null-pads via zip_with
  * and returns null); embedding dims are fixed per corpus, so this
  * only matters for malformed input.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native single-pass MinHash signature over pre-hashed shingles.
  *
  * The HOF formulation (`transform(sequence(0,k-1), j ->
  * array_min(transform(hs, h -> xxhash64(j, h))))`) materializes k
  * intermediate arrays per row and pays interpreted-lambda overhead on
  * every element — ~18 s for 5k docs × ~2k shingles × k=64 at sf0.1.
  * This expression runs one mixing pass per shingle (murmur fmix64) and
  * k multiply-add permutations per element (the classic multiply-shift
  * minwise family: g_j(u) = a_j·u + b_j with odd a_j, a bijection on
  * Z/2^64), keeping the whole kernel inside whole-stage codegen with a
  * single output allocation.
  *
  * The hash family intentionally differs from the HOF form: MinHash
  * signatures are internal to candidate generation — callers verify
  * candidates with exact set intersection, so only recall (band
  * collision probability), not the specific family, is observable.
  *
  * Returns array<long> of length k; input must be array<long>
  * (pre-hashed shingles, e.g. `transform(sh, s -> xxhash64(s))`).
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "minhash_signature requires (array<bigint>, foldable int k), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  private lazy val k: Int = right.eval().asInstanceOf[Int]
  // Deterministic per-row-hash permutation coefficients (no RNG).
  private lazy val coefA: Array[Long] =
    Array.tabulate(k)(j => 2L * MinHashSignature.fmix64(0x9E3779B97F4A7C15L * (j + 1)) + 1L)
  private lazy val coefB: Array[Long] =
    Array.tabulate(k)(j => MinHashSignature.fmix64(0xC2B2AE3D27D4EB4FL * (j + 1)))

  override def nullSafeEval(a: Any, kv: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null slots are absent set members, not 0s
        val u = MinHashSignature.fmix64(arr.getLong(i))
        var j = 0
        while (j < k) {
          val g = coefA(j) * u + coefB(j)
          if (g < sig(j)) sig(j) = g
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("coefB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val u = ctx.freshName("u")
      val g = ctx.freshName("g")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  long $u = $arr.getLong($i);
         |  $u ^= $u >>> 33; $u *= 0xff51afd7ed558ccdL;
         |  $u ^= $u >>> 33; $u *= 0xc4ceb9fe1a85ec53L;
         |  $u ^= $u >>> 33;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $g = $aRef[$j] * $u + $bRef[$j];
         |    if ($g < $sig[$j]) $sig[$j] = $g;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {
  /** Murmur3 64-bit finalizer — full-avalanche mixing. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}

/** Word n-gram shingle hashes straight from text bytes: single-space
  * tokenization (matching `split(text, ' ')`), FNV-1a per token,
  * polynomial window combine + fmix64, sorted-distinct output.
  *
  * Replaces the `array_distinct(transform(sequence…, slice+array_join))`
  * shingle builder, which allocates one joined string per window — the
  * whole per-document cost collapses to one pass over the text bytes
  * plus an O(w log w) sort. Distinctness over 64-bit window hashes is
  * equivalent to distinctness over shingle strings up to hash collisions
  * (~w²/2⁶⁵ per doc ≈ 1e-13 — negligible even for oracle hash-matching).
  *
  * Semantics: null text → null; fewer than n tokens → empty array.
  * Output order is ascending (callers treat it as a set).
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "shingle_hashes requires (string, foldable int n), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, nv: Any): Any = {
    val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      ShingleHashes.compute(bytes, n))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.ShingleHashes.compute($text.getBytes(), $n));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  /** One pass over UTF-8 bytes: FNV-1a per space-separated token, ring
    * buffer of the last n token hashes, polynomial combine + fmix64 per
    * full window; sort + in-place dedup at the end. Static so generated
    * code can call it — a JIT-compiled helper beats inlining 40 lines
    * into every codegen site. */
  def compute(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    // token count = spaces + 1 under single-space split semantics
    var spaces = 0
    var p = 0
    while (p < len) { if (bytes(p) == ' ') spaces += 1; p += 1 }
    val windows = spaces + 2 - n
    if (windows <= 0) return Array.emptyLongArray
    val ring = new Array[Long](n)
    val out = new Array[Long](windows)
    var tokIdx = 0
    var outIdx = 0
    var h = 0xcbf29ce484222325L // FNV-1a offset basis
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        // finalize each TOKEN hash with fmix64 before the polynomial
        // combine. Raw FNV-1a deltas are affine in a substituted byte
        // (Δ = p^k·((x⊕a)−(x⊕b))), so two adjacent tokens carrying the
        // SAME structured substitution can satisfy Δt·p + Δt′ ≡ 0
        // (mod 2⁶⁴) and collide EVERY window containing the pair — the
        // sf1 scale checkpoint caught exactly that on its perturbed
        // corpus ('value2 custome2r' ≡ 'value9 custome9r', two
        // phantom intersections per doc pair). The per-token avalanche
        // destroys the affine structure; the window-level fmix64 alone
        // cannot (identical combined W is identical after mixing).
        ring(tokIdx % n) = MinHashSignature.fmix64(h)
        tokIdx += 1
        if (tokIdx >= n) {
          // polynomial combine of the window's token hashes, oldest first
          var w = 0L
          var j = tokIdx - n
          while (j < tokIdx) { w = w * 0x100000001b3L + ring(j % n); j += 1 }
          out(outIdx) = MinHashSignature.fmix64(w)
          outIdx += 1
        }
        h = 0xcbf29ce484222325L
      } else {
        h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      }
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted window hashes
    var d = 0
    var s = 1
    while (s < out.length) {
      if (out(s) != out(d)) { d += 1; out(d) = out(s) }
      s += 1
    }
    if (d + 1 == out.length) out else java.util.Arrays.copyOf(out, d + 1)
  }

  /** POSITIONAL variant (r17): one hash per window in TEXT ORDER, no
    * dedup — the shape the substring-span operators need (`pos` is the
    * window index). Same per-token avalanche + polynomial combine +
    * fmix64 as [[compute]]. */
  def computeSeq(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    var spaces = 0
    var p = 0
    while (p < len) { if (bytes(p) == ' ') spaces += 1; p += 1 }
    val windows = spaces + 2 - n
    if (windows <= 0) return Array.emptyLongArray
    val ring = new Array[Long](n)
    val out = new Array[Long](windows)
    var tokIdx = 0
    var outIdx = 0
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        ring(tokIdx % n) = MinHashSignature.fmix64(h)
        tokIdx += 1
        if (tokIdx >= n) {
          var w = 0L
          var j = tokIdx - n
          while (j < tokIdx) { w = w * 0x100000001b3L + ring(j % n); j += 1 }
          out(outIdx) = MinHashSignature.fmix64(w)
          outIdx += 1
        }
        h = 0xcbf29ce484222325L
      } else {
        h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      }
      i += 1
    }
    out
  }
}

/** Word n-gram window hashes in TEXT ORDER (r17): the positional
  * sibling of [[ShingleHashes]] — one 64-bit hash per length-n token
  * window, window i of the single-space tokenization at output index i,
  * duplicates preserved. Feeds the substring-span dedup operators'
  * `hashGrams` path: `posexplode(shingle_hash_seq(text, L))` replaces
  * the string-gram builder + xxhash64, collapsing the per-window
  * `array_join(slice(...))` string allocations into one pass over the
  * text bytes. Distinctness/equality over the 64-bit hashes is
  * equivalent to gram-string equality up to ~1e-13 per-doc collision
  * odds (see [[ShingleHashes]]). */
case class ShingleHashSeq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "shingle_hash_seq requires (string, foldable int n), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash_seq"

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, nv: Any): Any = {
    val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      ShingleHashes.computeSeq(bytes, n))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.ShingleHashes.computeSeq($text.getBytes(), $n));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashSeq =
    copy(left = newLeft, right = newRight)
}

/** Gopher-style repetition statistics straight from text bytes (r17):
  * `struct<n, top, dups>` over the length-n token windows — window
  * count, occurrence count of the most frequent gram, and the number
  * of occurrences belonging to grams appearing at least twice (Rae et
  * al. 2021 §A1.1 signals). Runs [[ShingleHashes.computeSeq]] + one
  * sort + one run-length pass per row; replaces an `array_sort` +
  * `aggregate` HOF over materialized gram STRINGS whose per-window
  * string allocations dominated the scan (r17 bench: 1.8 s → scan
  * floor at sf0.1). Gram identity rides the avalanched 64-bit window
  * hashes (~1e-13 per-doc collision odds — [[ShingleHashes]]). */
case class GramRepetitionStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "gram_repetition_stats requires (string, foldable int n), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dups", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_repetition_stats"

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, nv: Any): Any =
    GramRepetitionStats.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = graft.functions.GramRepetitionStats.compute(" +
        s"$text.getBytes(), $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramRepetitionStats =
    copy(left = newLeft, right = newRight)
}

object GramRepetitionStats {
  def compute(bytes: Array[Byte], n: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val hs = ShingleHashes.computeSeq(bytes, n)
    java.util.Arrays.sort(hs)
    var top = 0L
    var dups = 0L
    var i = 0
    while (i < hs.length) {
      var j = i + 1
      while (j < hs.length && hs(j) == hs(i)) j += 1
      val run = (j - i).toLong
      if (run > top) top = run
      if (run >= 2) dups += run
      i = j
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hs.length.toLong, top, dups))
  }
}

/** Native 64-bit SimHash straight from text bytes: single-space
  * tokenization, XXH64(seed 42) per token (identical family to the
  * `simhash64` Scala closure in [[graft.pipeline.Dedup.simhash64]] and
  * Spark's `xxhash64` — outputs are bit-identical to the UDF form),
  * ±1 bit votes per token, sign → bit. Replaces a Scala UDF whose cost
  * was dominated by Seq[String] deserialization per row. */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SimHash64.compute($t.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** One pass over UTF-8 bytes; XXH64(seed 42) per space-separated token
    * (empty tokens included — split(' ') semantics); branchless votes. */
  def compute(bytes: Array[Byte]): Long = {
    val counts = new Array[Int](64)
    val len = bytes.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var j = 0
        while (j < 64) {
          counts(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** Native winnowing fingerprints (Schleimer et al., SIGMOD'03) straight
  * from text bytes. Because tokens are single-space separated, every
  * word k-gram string is a contiguous byte slice of the text, so the
  * per-gram XXH64(seed 42) here is bit-identical to hashing the joined
  * gram string — outputs match [[graft.pipeline.PipelineFunctions.winnow]]
  * exactly. Args: (text, k, w); returns sorted-distinct fingerprints. */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
        Seq(second, third).forall(e => e.foldable && e.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "winnow_fingerprints requires (string, foldable int k, foldable int w)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val w: Int = third.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, kv: Any, wv: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      WinnowFingerprints.compute(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, k, w))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _, _) => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.WinnowFingerprints.compute($text.getBytes(), $k, $w));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFingerprints =
    copy(first = f, second = s, third = t)
}

object WinnowFingerprints {
  def compute(bytes: Array[Byte], k: Int, w: Int): Array[Long] =
    compute(bytes, k, w, md5Family = false)

  /** Token boundaries → per-gram hash over the gram's byte slice →
    * sliding-window minima (rightmost on ties, LinkedHashSet-order
    * equivalent) → sorted distinct. The default XXH64(seed 42) family
    * matches PipelineFunctions.winnow; `md5Family = true` hashes grams
    * with [[Md5Hash60]] instead — the DuckDB-reproducible variant the
    * q40 oracle differentially checks. */
  def compute(bytes: Array[Byte], k: Int, w: Int, md5Family: Boolean): Array[Long] = {
    val len = bytes.length
    // token start offsets under split(' ') semantics
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var p = 0
    while (p < len) { if (bytes(p) == ' ') starts += (p + 1); p += 1 }
    val nTok = starts.length
    if (nTok < k) return Array.emptyLongArray
    val nGrams = nTok - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = if (i + k < nTok) starts(i + k) - 1 else len // exclude trailing space
      hashes(i) =
        if (md5Family) Md5Hash60.hash(bytes, from, until)
        else org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var min = hashes(0)
      var j = 1
      while (j < nGrams) { if (hashes(j) < min) min = hashes(j); j += 1 }
      out.add(min)
    } else {
      var s = 0
      while (s + w <= nGrams) {
        var minIdx = s
        var j = s
        while (j < s + w) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
        out.add(hashes(minIdx))
        s += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    arr
  }
}

/** Exact decontamination counter (r18): number of the row's DISTINCT
  * length-n gram hashes present in a broadcast sorted hash set — the
  * whole membership join collapsed into one codegen'd scan expression.
  * The explode+broadcast-join form materialized every corpus gram as a
  * row before the join could drop it; here non-matching documents never
  * produce anything but a long. The set rides a Spark `Broadcast`
  * (fetched once per executor, not serialized per task); lookups are
  * monotone binary searches (the row's grams arrive sorted from
  * [[ShingleHashes.compute]], so each search resumes where the last
  * ended). The eval-set side of benchmark decontamination is MBs
  * against a corpus of TBs — the same bounded-artifact shape as IVF's
  * centroid collect. */
case class ShingleSetShared(left: Expression, right: Expression,
    hashes: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType if right.foldable && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "shingle_set_shared requires (string, foldable int n), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_set_shared"

  private lazy val n: Int = right.eval().asInstanceOf[Int]
  @transient private lazy val set: Array[Long] = hashes.value

  def sharedCount(text: org.apache.spark.unsafe.types.UTF8String): Long =
    ShingleSetShared.count(text.getBytes, n, set)

  override def nullSafeEval(a: Any, nv: Any): Any =
    sharedCount(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSetShared", this,
      classOf[ShingleSetShared].getName)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = $ref.sharedCount($text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleSetShared =
    copy(left = newLeft, right = newRight)
}

object ShingleSetShared {
  /** Sorted-vs-sorted intersection count: binary search per doc gram,
    * each search bounded below by the previous hit's position. */
  def count(bytes: Array[Byte], n: Int, set: Array[Long]): Long = {
    val hs = ShingleHashes.compute(bytes, n) // sorted distinct
    var c = 0L
    var from = 0
    var i = 0
    while (i < hs.length && from < set.length) {
      val p = java.util.Arrays.binarySearch(set, from, set.length, hs(i))
      if (p >= 0) { c += 1; from = p + 1 } else from = -(p + 1)
      i += 1
    }
    c
  }
}

/** Bloom-prefiltered distinct gram hashes (r18): the row's sorted
  * distinct length-n gram hashes that PASS a foldable Bloom filter
  * literal — [[ShingleHashes]] and the `might_contain` predicate fused
  * into one pass, so the corpus-side explode of a Bloom-prefilter
  * decontamination emits only the ~fp-rate survivors instead of every
  * gram as a row. The filter bytes are the output of Spark's
  * `BloomFilterAggregate` (same wire format `BloomFilterMightContain`
  * reads); deserialized once per task instance, not per row. */
case class ShingleHashesBloom(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
        second.foldable && second.dataType == IntegerType &&
        third.foldable &&
        third.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_hashes_bloom requires (string, foldable int n, foldable binary bloom)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes_bloom"

  private lazy val n: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter = {
    val bytes = third.eval().asInstanceOf[Array[Byte]]
    val in = new java.io.ByteArrayInputStream(bytes)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
  }

  def filtered(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val hs = ShingleHashes.compute(text.getBytes, n)
    var d = 0
    var i = 0
    while (i < hs.length) {
      if (bloom.mightContainLong(hs(i))) { hs(d) = hs(i); d += 1 }
      i += 1
    }
    ArrayData.toArrayData(
      if (d == hs.length) hs else java.util.Arrays.copyOf(hs, d))
  }

  override def nullSafeEval(a: Any, nv: Any, bv: Any): Any =
    filtered(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashesBloom", this,
      classOf[ShingleHashesBloom].getName)
    nullSafeCodeGen(ctx, ev, (text, _, _) =>
      s"${ev.value} = $ref.filtered($text);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ShingleHashesBloom =
    copy(first = f, second = s, third = t)
}

object VectorExpressions {
  /** Register `dot_product(array<double>, array<double>) -> double` as a
    * native function (usable from SQL and via `call_function`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_signature takes exactly 2 arguments")
        MinHashSignature(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_repetition_stats",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "gram_repetition_stats takes exactly 2 arguments")
        GramRepetitionStats(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash_seq",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "shingle_hash_seq takes exactly 2 arguments")
        ShingleHashSeq(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "shingle_hashes takes exactly 2 arguments")
        ShingleHashes(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64 takes exactly 1 argument")
        SimHash64(exprs(0))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "winnow_fingerprints takes exactly 3 arguments")
        WinnowFingerprints(exprs(0), exprs(1), exprs(2))
      },
      "built-in")
  }
}
