package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Specs for the native Catalyst expressions: dot_product,
  * minhash_signature, shingle_hashes. Each is checked against an
  * equivalent built-in/HOF formulation so codegen and interpreted
  * paths can't drift from declarative semantics. */
class VectorExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  VectorExpressions.register(spark)

  test("dot_product matches the HOF formulation bit-for-bit") {
    val df = Seq((Seq(0.1, 0.2, 0.3), Seq(0.7, 0.11, 0.13))).toDF("a", "b")
    val Array(native, hof) = df.select(
      call_function("dot_product", $"a", $"b"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    ).collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(native == hof)
  }

  test("dot_product null and empty semantics") {
    val row = spark.sql(
      """SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) n,
        |       dot_product(CAST(array() AS ARRAY<DOUBLE>),
        |                   CAST(array() AS ARRAY<DOUBLE>)) e""".stripMargin).collect()(0)
    assert(row.isNullAt(0))
    assert(row.getDouble(1) == 0.0)
  }

  test("dot_product rejects non-double arrays with a named error") {
    val e = intercept[Exception](
      spark.sql("SELECT dot_product(array('a'), array(1.0d))").collect())
    assert(e.getMessage.contains("dot_product requires two array<do"))
  }

  test("shingle_hashes: count, distinctness and ordering semantics") {
    val df = Seq(
      ("a b c d", 3),   // windows: "a b c","b c d" -> 2
      ("a b a b a", 2), // windows: "a b","b a","a b","b a" -> 2 distinct
      ("a b", 3),       // fewer than n tokens -> empty
      ("xyz", 1)        // single token, n=1 -> 1
    ).toDF("text", "n")
    val out = df.select(
      size(call_function("shingle_hashes", $"text", lit(3))).as("s3"),
      size(call_function("shingle_hashes", $"text", lit(2))).as("s2"),
      size(call_function("shingle_hashes", $"text", lit(1))).as("s1"))
      .collect()
    assert(out(0).getInt(0) == 2 && out(0).getInt(1) == 3 && out(0).getInt(2) == 4)
    assert(out(1).getInt(1) == 2 && out(1).getInt(2) == 2)
    assert(out(2).getInt(0) == 0)
    assert(out(3).getInt(2) == 1)
    // sorted ascending, distinct
    val arr = Seq("e d c b a e d").toDF("text")
      .select(call_function("shingle_hashes", $"text", lit(2)))
      .collect()(0).getSeq[Long](0)
    assert(arr == arr.sorted && arr.distinct == arr)
  }

  test("shingle_hashes equals distinct count of string shingles") {
    // same corpus-shaped text via the HOF shingle builder
    val df = Seq("the quick brown fox jumps over the lazy dog the quick brown fox")
      .toDF("text")
    val toks = split($"text", " ")
    val strShingles = array_distinct(
      transform(sequence(lit(0), size(toks) - 3),
        i => array_join(slice(toks, i + lit(1), lit(3)), " ")))
    val row = df.select(
      size(strShingles),
      size(call_function("shingle_hashes", $"text", lit(3)))).collect()(0)
    assert(row.getInt(0) == row.getInt(1))
  }

  test("structured substitutions don't cancel in the window combine") {
    // the sf1 checkpoint's collision shape: 'e'→'e2' vs 'e'→'e9'
    // rewrites of one corpus text made raw-FNV token deltas satisfy
    // Δt·p + Δt′ ≡ 0 (mod 2⁶⁴) for an adjacent substituted pair
    // ("value2 custome2r" ≡ "value9 custome9r"), colliding EVERY
    // window containing the pair and inflating q32's intersection by 2
    // — fixed by the per-token fmix64 before the polynomial combine
    val base = "a merge hash sort fast row value customer hash group fast " +
      "sort join slow agg vector customer small a spark line"
    val a = base.replace("e", "e2")
    val b = base.replace("e", "e9")
    def strShingles(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      (0 to tk.length - 3).map(i => tk.slice(i, i + 3).mkString(" ")).toSet
    }
    val ha = graft.functions.ShingleHashes.compute(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8), 3).toSet
    val hb = graft.functions.ShingleHashes.compute(
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8), 3).toSet
    assert(ha.size == strShingles(a).size && hb.size == strShingles(b).size)
    assert(ha.intersect(hb).size == strShingles(a).intersect(strShingles(b)).size,
      "hash-set intersection diverged from string-shingle ground truth")
  }

  test("minhash_signature: length k, permutation-min invariants") {
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L, 5L), "a"),
      (Seq(1L, 2L, 3L, 4L, 5L), "b"),   // identical set -> identical signature
      (Seq(9L, 10L), "c")
    ).toDF("hs", "tag")
    val sigs = df.select(call_function("minhash_signature", $"hs", lit(16)))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("minhash_signature: signature of a union is elementwise min") {
    // minhash invariant: sig(A ∪ B)[j] == min(sig(A)[j], sig(B)[j])
    val a = Seq(1L, 2L, 3L)
    val b = Seq(100L, 200L)
    val df = Seq((a, b, a ++ b)).toDF("a", "b", "u")
    val row = df.select(
      call_function("minhash_signature", $"a", lit(8)),
      call_function("minhash_signature", $"b", lit(8)),
      call_function("minhash_signature", $"u", lit(8))).collect()(0)
    val (sa, sb, su) =
      (row.getSeq[Long](0), row.getSeq[Long](1), row.getSeq[Long](2))
    assert(su == sa.zip(sb).map { case (x, y) => math.min(x, y) })
  }

  test("simhash64 native expression is bit-identical to the JVM reference impl") {
    val texts = Seq("alpha beta gamma", "the quick brown fox", "x", "", "a  b",
      "gamma alpha beta")
    val df = texts.toDF("text")
      .select($"text", call_function("simhash64", $"text").as("native"))
    df.collect().foreach { r =>
      val expected = graft.pipeline.Dedup.simhash64(r.getString(0).split(" ", -1).toSeq)
      assert(r.getLong(1) == expected, s"mismatch for '${r.getString(0)}'")
    }
  }

  test("winnow_fingerprints native expression is bit-identical to the JVM impl") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away home",
      "a b c d", "a b c", "one two",  // boundary: = k, < k
      "x x x x x x x x x x x x x x x x x x x x")
    val df = texts.toDF("text")
      .select($"text", call_function("winnow_fingerprints", $"text", lit(4), lit(8)).as("fp"))
    df.collect().foreach { r =>
      val expected = graft.pipeline.PipelineFunctions
        .winnow(r.getString(0).split(" ", -1).toSeq, 4, 8)
      assert(r.getSeq[Long](1) == expected, s"mismatch for '${r.getString(0)}'")
    }
  }

  test("md5_simhash60 matches a per-token HOF recomputation") {
    Md5Expressions.register(spark)
    // independent formulation: md5 each token via builtins, majority per
    // bit — the same recipe the DuckDB oracle runs, here in Spark SQL
    val texts = Seq("alpha beta gamma", "the quick brown fox", "x", "", "a  b")
    val toks = split($"text", " ")
    val hashes = transform(toks, tk => conv(substring(md5(tk), 1, 15), 16, 10).cast("long"))
    val df = texts.toDF("text")
      .select($"text", hashes.as("hs"), call_function("md5_simhash60", $"text").as("native"))
      .select($"text", $"native",
        aggregate(sequence(lit(0), lit(59)), lit(0L), (acc, b) =>
          acc + when(
            lit(2) * aggregate($"hs", lit(0L),
              (a, h) => a + call_function("shiftright", h, b.cast("int")).bitwiseAND(lit(1L)))
              > size($"hs"),
            call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(lit(0L))).as("hof"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'")
      assert(r.getLong(1) >= 0L, "60-bit hash must be non-negative")
    }
  }

  test("winnow_fingerprints_md5 keeps XXH64-family window selection semantics") {
    Md5Expressions.register(spark)
    // same text, both families: fingerprint VALUES differ (different
    // gram hashes) but the structural invariants are family-agnostic
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away home",
      "a b c d", "a b c", "one two")
    val df = texts.toDF("text").select(
      call_function("winnow_fingerprints_md5", $"text", lit(4), lit(8)).as("md5fp"),
      call_function("winnow_fingerprints", $"text", lit(4), lit(8)).as("xxfp"))
    df.collect().foreach { r =>
      val (m, x) = (r.getSeq[Long](0), r.getSeq[Long](1))
      assert(m.length <= x.length + m.length) // both defined
      assert(m == m.sorted && m.distinct == m, "sorted distinct contract")
      assert((m.isEmpty) == (x.isEmpty), "same empty/non-empty boundary (< k tokens)")
      assert(m.forall(_ >= 0L), "md5-60 hashes are non-negative")
    }
  }

  test("md5RademacherPlanes: ±1 components, deterministic, sign-balanced-ish") {
    val p1 = graft.pipeline.Similarity.md5RademacherPlanes(8, 64)
    val p2 = graft.pipeline.Similarity.md5RademacherPlanes(8, 64)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq, "deterministic")
    assert(p1.flatten.forall(c => c == 1.0 || c == -1.0))
    val pos = p1.flatten.count(_ == 1.0)
    assert(pos > 128 && pos < 384, s"suspiciously unbalanced: $pos/512 positive")
  }

  test("WindowCompat.groupsFrameAgg: GROUPS(1,1) frame over hand-computed peer groups") {
    // ORDER BY key k has peer groups: {10,10}, {20}, {30,30,30} with
    // values 1,2 | 4 | 8,16,32. GROUPS 1 PRECEDING..1 FOLLOWING sums:
    // group(10) rows: (1+2)+4 = 7; group(20): all = 63; group(30): 4+56 = 60
    val df = Seq((10, 1L), (10, 2L), (20, 4L), (30, 8L), (30, 16L), (30, 32L))
      .toDF("k", "v").withColumn("p", lit("x"))
    val out = graft.functions.WindowCompat
      .groupsFrameAgg(df, "fs", sum($"v"), Seq($"p"), $"k", 1, 1)
      .orderBy($"k", $"v").collect()
    assert(out.map(_.getAs[Long]("fs")).toSeq == Seq(7L, 7L, 63L, 60L, 60L, 60L))
  }

  test("WindowCompat.groupsFrameSum: decomposed form agrees with the " +
      "single-window form, incl. null order keys (r17)") {
    val df = Seq((10, 1L), (10, 2L), (20, 4L), (30, 8L), (30, 16L), (30, 32L))
      .toDF("k", "v").withColumn("p", lit("x"))
    val out = graft.functions.WindowCompat
      .groupsFrameSum(df, "fs", $"v", Seq($"p"), $"k", 1, 1)
      .orderBy($"k", $"v").collect()
    assert(out.map(_.getAs[Long]("fs")).toSeq == Seq(7L, 7L, 63L, 60L, 60L, 60L))
    // randomized equivalence vs groupsFrameAgg over two partitions,
    // with a NULL order key forming its own peer group (NULLS FIRST)
    val rng = new scala.util.Random(20260816L)
    val rows = (1 to 300).map { i =>
      (if (rng.nextInt(10) == 0) null.asInstanceOf[Integer]
      else Integer.valueOf(rng.nextInt(12)),
        rng.nextInt(100).toLong, if (rng.nextBoolean()) "a" else "b")
    }
    val big = rows.toDF("k", "v", "p")
    val a = graft.functions.WindowCompat
      .groupsFrameAgg(big, "fs", sum($"v"), Seq($"p"), $"k", 1, 1)
      .groupBy($"p", $"k").agg(max($"fs").as("fs"), min($"fs").as("fs2"))
      .orderBy($"p", $"k").collect()
    val b = graft.functions.WindowCompat
      .groupsFrameSum(big, "fs", $"v", Seq($"p"), $"k", 1, 1)
      .groupBy($"p", $"k").agg(max($"fs").as("fs"), min($"fs").as("fs2"))
      .orderBy($"p", $"k").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("minhash similarity estimates Jaccard for near-identical sets") {
    val base = (1L to 1000L).toSeq
    val mod = base.drop(100) ++ (2001L to 2100L) // jaccard = 900/1100 ≈ 0.818
    val df = Seq((base, mod)).toDF("a", "b")
    val row = df.select(
      call_function("minhash_signature", $"a", lit(256)),
      call_function("minhash_signature", $"b", lit(256))).collect()(0)
    val est = row.getSeq[Long](0).zip(row.getSeq[Long](1))
      .count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 900.0 / 1100.0) < 0.1)
  }

  test("shingle_hash_seq: positional windows, duplicates preserved, " +
      "set view equals shingle_hashes (r17)") {
    val rng = new scala.util.Random(20260817L)
    val texts = (1 to 60).map { _ =>
      val words = Seq.fill(rng.nextInt(30))(s"w${rng.nextInt(8)}")
      words.mkString(" ")
    } :+ "" :+ "one" :+ "a b" :+ "a b a b a b"
    val df = texts.toDF("text")
    df.select(col("text"),
      call_function("shingle_hash_seq", col("text"), lit(2)).as("seq"),
      call_function("shingle_hashes", col("text"), lit(2)).as("set"),
      split(col("text"), " ").as("tk")).collect().foreach { r =>
      val text = r.getString(0)
      val seq = r.getSeq[Long](1)
      val set = r.getSeq[Long](2)
      val nTok = r.getSeq[String](3).length
      // one hash per window, in order, duplicates kept
      assert(seq.length == math.max(nTok - 1, 0), s"'$text'")
      assert(seq.distinct.sorted == set, s"'$text'")
      // positionality: equal string windows <=> equal hashes
      val strGrams = r.getSeq[String](3).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      strGrams.zipWithIndex.foreach { case (g, i) =>
        strGrams.zipWithIndex.foreach { case (g2, j) =>
          assert((g == g2) == (seq(i) == seq(j)), s"'$text' $i $j")
        }
      }
    }
  }

  test("gram_repetition_stats equals the string-exact HOF comparator (r17)") {
    val rng = new scala.util.Random(20260818L)
    val texts = (1 to 80).map { _ =>
      Seq.fill(rng.nextInt(40))(s"t${rng.nextInt(6)}").mkString(" ")
    } :+ "" :+ "solo" :+ "x y x y x y x" :+ "r r r r"
    val df = texts.toDF("text")
    val rows = df.select(
      call_function("gram_repetition_stats", col("text"), lit(2)).as("st"),
      graft.pipeline.TextOps
        .shingles(split(col("text"), " "), 2).as("grams")).collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      val grams = r.getSeq[String](1)
      val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
      assert(st.getLong(0) == grams.length.toLong)
      assert(st.getLong(1) == (if (counts.isEmpty) 0L else counts.values.max.toLong))
      assert(st.getLong(2) == counts.values.filter(_ >= 2).sum.toLong)
    }
    // the HOF gramRepetition itself agrees (top, dups)
    val both = df.select(
      call_function("gram_repetition_stats", col("text"), lit(2)).as("st"),
      graft.pipeline.TextOps.gramRepetition(
        graft.pipeline.TextOps.shingles(split(col("text"), " "), 2)).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getStruct(0).getLong(1) == r.getStruct(1).getLong(0), r.toString)
      assert(r.getStruct(0).getLong(2) == r.getStruct(1).getLong(1), r.toString)
    }
  }
}
