package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Unit-level checks for the training-data pipeline operators (their
  * end-to-end correctness is enforced by the DuckDB oracle in Verify). */
class PipelineSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: word n-grams with short-doc guard") {
    import spark.implicits._
    val df = docs((1L, "a b c d"), (2L, "a b"))
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val out = df.orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1).isEmpty)
  }

  test("substringSpans: duplicated span positions and union coverage (r16)") {
    // docs 1 and 2 share the 3-gram "a b c" (positions 1 and 2 resp.)
    // and "b c d"; doc 1 also shares "x y z" with doc 3. Doc 1's hits
    // at positions 1,2 (overlapping: union = 4 tokens) and 6 (3 more).
    val df = Dedup.substringSpans(docs(
      (1L, "a b c d q x y z"), // grams at 1:"a b c" 2:"b c d" 6:"x y z"
      (2L, "q a b c d"), //        2:"a b c" 3:"b c d"
      (3L, "x y z"), //            1:"x y z"
      (4L, "totally unrelated words here")), gramLen = 3)
    val out = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, 3L, 7L, 8L)), out.mkString(","))
    assert(out(1) == ((2L, 2L, 4L, 5L)), out.mkString(","))
    assert(out(2) == ((3L, 1L, 3L, 3L)), out.mkString(","))
    assert(out(3) == ((4L, 0L, 0L, 4L)), out.mkString(","))
    // a within-doc-only repeat is NOT cross-document duplication
    val within = Dedup.substringSpans(docs(
      (1L, "p q r s p q r"), (2L, "unrelated text entirely")), gramLen = 3)
      .orderBy("doc_id").collect()
    assert(within(0).getLong(1) == 0L)
    // the 64-bit-hash scale variant computes identical accounting
    val big = (1L to 40L).map(i =>
      i -> (s"prefix$i " + (if (i % 4 == 0) "shared run of tokens overlap"
      else s"unique body $i with more words ${i * 7}")))
    val a = Dedup.substringSpans(docs(big: _*), gramLen = 3)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = Dedup.substringSpans(docs(big: _*), gramLen = 3, hashGrams = true)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("substringDedup: keep-first cut with merged overlapping spans (r17)") {
    // duplicated 3-grams: "a b c" (d1p1, d2p2), "b c d" (d1p2, d2p3),
    // "x y z" (d1p6, d3p1) — first occurrences all in doc 1, so doc 1
    // survives intact; doc 2's overlapping cuts [2,5)∪[3,6) merge to
    // [2,6); doc 3 is cut entirely
    val out = Dedup.substringDedup(docs(
      (1L, "a b c d q x y z"),
      (2L, "q a b c d"),
      (3L, "x y z"),
      (4L, "totally unrelated words here")), gramLen = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "a b c d q x y z", 8L, 8L)), out.mkString(","))
    assert(out(1) == ((2L, "q", 1L, 5L)), out.mkString(","))
    assert(out(2) == ((3L, "", 0L, 3L)), out.mkString(","))
    assert(out(3) == ((4L, "totally unrelated words here", 4L, 4L)), out.mkString(","))
    // disjoint islands within one doc: the repeat at the tail cuts, the
    // first occurrence survives; the other doc is cut whole
    val out2 = Dedup.substringDedup(docs(
      (5L, "m n o p z z z m n o p"),
      (6L, "m n o p")), gramLen = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out2(0) == ((5L, "m n o p z z z", 7L, 11L)), out2.mkString(","))
    assert(out2(1) == ((6L, "", 0L, 4L)), out2.mkString(","))
    // the 64-bit-hash scale variant cuts identically
    val big = (1L to 40L).map(i =>
      i -> (s"prefix$i " + (if (i % 4 == 0) "shared run of tokens overlap"
      else s"unique body $i with more words ${i * 7}")))
    val a = Dedup.substringDedup(docs(big: _*), gramLen = 3)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = Dedup.substringDedup(docs(big: _*), gramLen = 3, hashGrams = true)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("exact dedup groups identical normalized text") {
    val df = Dedup.exact(docs((1L, "Hello World"), (2L, "hello world  "), (3L, "other")))
    val out = df.orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("keep_id") == 1L && out(0).getAs[Long]("n_dups") == 2L)
  }

  test("minhashCandidates finds planted near-duplicates, exact-integer threshold") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val out = Dedup.minhashCandidates(
      docs((1L, base), (2L, nearDup), (3L, other)),
      thresholdNum = 1, thresholdDen = 2).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_a") == 1L && out(0).getAs[Long]("doc_b") == 2L)
    // exact jaccard of 3-gram shingle sets, as integers
    assert(out(0).getAs[Long]("inter") == 36L)
  }

  test("bloomDecontaminate: exact despite the probabilistic prefilter") {
    val corpus = docs(
      (1L, "a b c d e f g"),       // shares the a..e gram with bench
      (2L, "z y x w v u t"),       // nothing shared
      (3L, "a b c d e z z z z"),   // shares one gram
      (4L, "short doc"))           // under gramLen: zero grams
    val bench = docs((100L, "a b c d e q r s"))
    // maxExactGrams = 0 forces the bloom path — auto-select would
    // otherwise (correctly) take the exact kernel at this size
    val out = TextOps.bloomDecontaminate(corpus, bench, gramLen = 5,
        maxExactGrams = 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_shared_grams"),
        r.getAs[Int]("contaminated"))).toSeq
    assert(out == Seq((1L, 1L, 1), (2L, 0L, 0), (3L, 1L, 1), (4L, 0L, 0)),
      out.toString)
    // empty benchmark: nothing is contaminated, nothing crashes
    val empty = TextOps.bloomDecontaminate(corpus, bench.limit(0),
        gramLen = 5, maxExactGrams = 0)
      .orderBy("doc_id").collect().map(_.getAs[Int]("contaminated")).toSeq
    assert(empty == Seq(0, 0, 0, 0))
  }

  test("decontaminate: kernels agree, incl. on null text (reports 0, not NULL)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType, false),
      StructField("text", StringType, true)))
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c d e f g"),
        Row(2L, null),               // null text: 0 shared, both kernels
        Row(3L, "a b c d e z z z z"))), schema)
    val bench = docs((100L, "a b c d e q r s"))
    def run(forceBloom: Boolean) =
      TextOps.decontaminate(corpus, bench, gramLen = 5,
          maxExactGrams = if (forceBloom) 0 else TextOps.DefaultMaxExactGrams)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_shared_grams"),
          r.getAs[Int]("contaminated"))).toSeq
    val exact = run(forceBloom = false)
    val bloom = run(forceBloom = true)
    assert(exact == Seq((1L, 1L, 1), (2L, 0L, 0), (3L, 1L, 1)), exact.toString)
    assert(bloom == exact, s"kernel divergence: $bloom vs $exact")
  }

  test("jaccardJoinExact: count-join, PPJoin and auto agree exactly") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    // a Zipf-ish hot token shared by every doc exercises the prefix
    // filter's df ordering without changing the qualifying pair
    val corpus = docs((1L, s"the $base"), (2L, s"the $nearDup"),
      (3L, s"the $other"))
    def run(pf: Option[Boolean]) =
      Dedup.jaccardJoinExact(corpus, thresholdNum = 1, thresholdDen = 2,
          shingleLen = 3, prefixFilter = pf)
        .orderBy("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("inter"),
          r.getAs[Long]("un"))).toSeq
    val count = run(Some(false))
    assert(count.nonEmpty && count.forall { case (a, b, _, _) => a < b })
    assert(run(Some(true)) == count, "PPJoin diverged from count-join")
    assert(run(None) == count, "auto strategy diverged")
  }

  test("simhash64: deterministic, order-insensitive for multisets") {
    val a = Dedup.simhash64(Seq("alpha", "beta", "gamma"))
    val b = Dedup.simhash64(Seq("gamma", "alpha", "beta"))
    assert(a == b)
    assert(Dedup.simhash64(Seq("alpha", "beta", "gamma")) == a) // stable across calls
    val c = Dedup.simhash64(Seq("totally", "different", "words"))
    assert(a != c)
    // near-identical token sets -> small hamming distance
    val d = Dedup.simhash64(Seq("alpha", "beta", "gamma", "delta"))
    assert(java.lang.Long.bitCount(a ^ d) < 16)
  }

  test("winnow: fingerprints are deterministic and shared between near-dups") {
    val toks = (1 to 30).map(i => s"t$i")
    val fp1 = PipelineFunctions.winnow(toks, 4, 8)
    val fp2 = PipelineFunctions.winnow(toks, 4, 8)
    assert(fp1 == fp2 && fp1.nonEmpty)
    val fpShift = PipelineFunctions.winnow(toks.drop(2), 4, 8)
    assert(fp1.toSet.intersect(fpShift.toSet).nonEmpty) // winnowing locality
    assert(PipelineFunctions.winnow(Seq("a"), 4, 8).isEmpty) // shorter than k
  }

  test("cosine: matches hand-computed values through zip_with/aggregate") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(0)) < 1e-12)
  }

  test("hyperplanes: deterministic across calls, values in [-1, 1)") {
    val p1 = Similarity.hyperplanes(4, 8)
    val p2 = Similarity.hyperplanes(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(v => v >= -1.0 && v < 1.0))
    assert(p1.flatten.distinct.length > 20) // actually varied
  }

  test("multimodal: fake decode is deterministic; frame sampling slices payloads") {
    val payload = Array[Byte](0x7F, 1, 2, 3, 4, 5, 6, 0x10)
    val (w, h, px) = Multimodal.fakeDecode(payload)
    assert(w == 0x80 && h == 0x11 && px.sameElements(payload))
    assert(Multimodal.fakeDecode(Array.emptyByteArray) == ((0, 0, Array.emptyByteArray)) ||
      Multimodal.fakeDecode(Array.emptyByteArray)._1 == 0)

    import spark.implicits._
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media, frameLen = 4, stride = 4)
      .orderBy("frame_no").collect()
    assert(frames.length == 2)
    assert(frames(0).getAs[Array[Byte]]("frame").sameElements(payload.slice(0, 4)))
    assert(frames(1).getAs[Array[Byte]]("frame").sameElements(payload.slice(4, 8)))
  }

  test("multimodal: resize does nearest-neighbor resampling of the decoded raster") {
    import spark.implicits._
    // payload crafted so fakeDecode yields a consistent 4x2 raster:
    // first byte 3 -> w=4, last byte 1 -> h=2, length 8 = w*h
    val payload = Array[Byte](3, 10, 20, 30, 40, 50, 60, 1)
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val out = Multimodal.resize(media, outW = 2, outH = 1).collect()(0)
    assert(out.getInt(1) == 2 && out.getInt(2) == 1)
    // out(0,0) <- src(0,0)=payload(0); out(0,1) <- src(0, 1*4/2=2)=payload(2)
    assert(out.getAs[Array[Byte]]("pixels").toSeq == Seq[Byte](3, 20))
    // inconsistent raster (md5 fake blobs) degrades to empty, not a crash
    val fake = Multimodal.resize(
      Multimodal.withFakeMedia(docs((2L, "hello"))), 4, 4).collect()(0)
    assert(fake.getInt(1) == 0 && fake.getAs[Array[Byte]]("pixels").isEmpty)
  }

  test("multimodal: real ImageIO decode round-trips PNG dims+shade, isolates corrupt rows") {
    import spark.implicits._
    // real PNG per row + one corrupt payload and one null payload:
    // per-row isolation means the good rows still decode in the same
    // partition as the bad ones
    val rows = Seq(
      (1L, Multimodal.pngPayload(5, 3, 200), "image/png"),
      (2L, Multimodal.pngPayload(1, 1, 0), "image/png"),
      (3L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3), "image/png"),
      (4L, null.asInstanceOf[Array[Byte]], "image/png"))
      .toDF("media_id", "payload", "format").coalesce(1)
    val out = Multimodal.decodeImageFeatures(rows).orderBy("media_id").collect()
    assert(out(0).getLong(2) == 5L && out(0).getLong(3) == 3L && out(0).getLong(4) == 200L)
    assert(out(0).getBoolean(5))
    assert(out(1).getLong(2) == 1L && out(1).getLong(4) == 0L)
    // corrupt: byte_len recorded, dims null, ok=false — row survives
    assert(out(2).getLong(1) == 7L && out(2).isNullAt(2) && !out(2).getBoolean(5))
    assert(out(3).getLong(1) == 0L && out(3).isNullAt(2) && !out(3).getBoolean(5))
    // a JPEG written by ImageIO decodes too (decoder is format-sniffing)
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val Some((jw, jh, _)) = Multimodal.decodeImage(bos.toByteArray): @unchecked
    assert(jw == 4 && jh == 2)
  }

  test("multimodal: decodeFeatures runs the mapPartitions contract end-to-end") {
    import spark.implicits._
    val media = Multimodal.withFakeMedia(docs((1L, "hello"), (2L, "world")))
    val out = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("byte_len") == 16L) // md5 payload
    assert(out(0).getAs[String]("head_hex").length == 8)
  }

  test("lshBucketed multi-probe: recall ≥ single-probe, precision exact") {
    import spark.implicits._
    // deterministic synthetic vectors: clusters of near-identical
    // directions plus noise vectors
    def mix(i: Int, k: Int): Double = {
      var z = (i.toLong << 32) + k
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L; z = z ^ (z >>> 27)
      z.toDouble / Long.MaxValue
    }
    val vecs = (0 until 60).map { i =>
      val base = i % 12 // 12 cluster centers, 5 members each
      (i.toLong, (0 until 8).map(k => mix(base, k) + 0.02 * mix(i + 1000, k)).toArray)
    }.toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceNearDup(vecs, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def found(mp: Int) = Similarity
      .lshBucketed(vecs, 0.95, numPlanes = 10, dim = 8, multiProbe = mp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = found(0)
    val probed = found(3)
    assert(single.subsetOf(truth) && probed.subsetOf(truth)) // no false pairs
    assert(single.subsetOf(probed)) // probing only adds
    assert(probed.size >= single.size)
    assert(truth.nonEmpty && probed.size >= (truth.size * 0.6)) // useful recall
  }

  test("trainCentroids + ivfKnnTrained: k-means recovers cluster structure") {
    import spark.implicits._
    def mix(i: Int, k: Int): Double = {
      var z = (i.toLong << 32) + k
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L; z = z ^ (z >>> 27)
      z.toDouble / Long.MaxValue
    }
    // 4 well-separated direction clusters, 15 members each
    val vecs = (0 until 60).map { i =>
      val c = i % 4
      (i.toLong, (0 until 8).map(k => 5 * mix(c, k) + 0.05 * mix(i + 500, k)).toArray)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, k = 4, iters = 3)
    assert(cents.count() == 4)
    // all 60 vectors must assign to a centroid of their own cluster:
    // search with nprobe=1 and check every query's top-1 neighbor shares
    // its cluster (members of a cluster are near-identical directions)
    val res = Similarity.ivfKnnTrained(vecs, vecs.filter($"vec_id" < 8), k = 1,
      cents, nprobe = 1).collect()
    assert(res.length == 8)
    res.foreach { r =>
      assert(r.getLong(0) % 4 == r.getLong(1) % 4,
        s"query ${r.getLong(0)} got cross-cluster neighbor ${r.getLong(1)}")
    }
    // trained quantizer beats the arbitrary strided one on recall here:
    // strided centroids (every 15th vector) all land in clusters 0..3 too,
    // but k-means centroids are the cluster means — scores must be >= 0.99
    res.foreach(r => assert(r.getDouble(2) > 0.99)) // score column
  }

  test("semanticDedup: planted duplicate groups collapse to lowest id (r17)") {
    import spark.implicits._
    def mix(i: Int, k: Int): Double = {
      var z = (i.toLong << 32) + k
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L; z = z ^ (z >>> 27)
      z.toDouble / Long.MaxValue
    }
    // 30 base directions; ids 100+i are near-copies of direction i%5 —
    // so {i, 100+i... } with shared direction form duplicate groups
    val base = (0 until 30).map { i =>
      (i.toLong, (0 until 8).map(k => mix(i % 5, k) + 0.001 * mix(i + 900, k)).toArray)
    }
    val vecs = base.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, threshold = 0.999,
      centroidStride = 7).cache()
    assert(out.count() == 30) // one row per vector, always
    val rows = out.as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // vectors sharing a direction AND a quantizer cluster collapse to
    // the group's lowest id; keep flag consistent with canon
    rows.values.foreach { case (id, _, canon, keep) =>
      assert(canon <= id)
      assert(keep == (canon == id))
      // canonical member must share the direction (near-dup means same
      // base direction here)
      assert(canon % 5 == id % 5 || canon == id)
    }
    // at least one real collapse happened (directions repeat 6x)
    assert(rows.values.count(!_._4) > 0)
    // determinism across partitioning
    val again = Similarity.semanticDedup(vecs.repartition(7), threshold = 0.999,
      centroidStride = 7).orderBy($"vec_id").collect().toSeq
    assert(out.orderBy($"vec_id").collect().toSeq == again)
  }

  test("review fixes: zero-norm guard, phantom frames, parameter validation") {
    import spark.implicits._
    // zero-norm embedding must not become anyone's NaN rank-1 neighbor
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceKnn(vecs, vecs.filter($"vec_id" === 1), k = 2).collect()
    assert(knn.map(_.getLong(1)).toSet == Set(2L)) // zero vector excluded entirely
    assert(Similarity.bruteForceNearDup(vecs, 0.0).collect()
      .forall(r => !r.getDouble(2).isNaN))
    // empty payload -> zero frames (was one phantom empty frame)
    val media = Seq((1L, Array.emptyByteArray), (2L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media, frameLen = 2, stride = 2).collect()
    assert(frames.forall(_.getLong(0) == 2L))
    // banding preconditions are validated, not silently violated
    intercept[IllegalArgumentException](
      Dedup.minhashCandidates(docs((1L, "a b c")), numHashes = 64, bands = 128))
    intercept[IllegalArgumentException](
      Dedup.minhashCandidates(docs((1L, "a b c")), numHashes = 64, bands = 24))
    intercept[IllegalArgumentException](
      Dedup.simhashNearDup(docs((1L, "a b c")), maxHamming = 4))
  }

  test("langId: marker argmax with deterministic tie-break") {
    import spark.implicits._
    val df = docs(
      (1L, "the cat and the dog is here"),
      (2L, "el gato y la casa es que"),
      (3L, "zzz qqq www")) // no markers anywhere -> tie -> 'en'
      .select(col("doc_id"), TextOps.langId(TextOps.tokens(col("text"))).as("pred"))
    val out = df.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("en", "es", "en"))
  }

  test("saltedJoin: identical results to the plain join on a hot key") {
    import spark.implicits._
    // hot key: 500 of 600 fact rows share key 1
    val fact = ((1 to 500).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (2L, i.toLong)))
      .toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "unmatched")).toDF("dk", "label")
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"k", $"row_id", $"label").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, "k", "row_id", dim, "dk", salts = 8)
      .select($"k", $"row_id", $"label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 600)
  }

  test("saltedCollectList: two-phase merge equals the direct sorted collect") {
    import spark.implicits._
    val df = ((1 to 300).map(i => (7L, i.toLong)) ++ Seq((8L, 1L), (8L, 2L)))
      .toDF("k", "v")
    val direct = df.groupBy($"k").agg(array_sort(collect_list($"v")).as("v_list"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val salted = Skew.saltedCollectList(df, "k", "v", "v", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(salted == direct)
    assert(salted(7L) == (1L to 300L))
  }

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  test("connectedComponents: differential vs union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 25
      // sparse random edges + a long path (worst case for label
      // propagation, which the star algorithm must still collapse fast)
      val random = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val path = (0 until 20).map(i => (1000L + i, 1001L + i))
      val edges = random ++ path
      val expect = unionFind(n, edges)
      // both execution paths (r19): the driver-local union-find gate
      // (default — these graphs are far under LocalEdgeCap) and the
      // distributed star loop (forced with localEdgeCap = 0) must agree
      // with the reference union-find exactly
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"trial $trial (driver-local path)")
      val gotDist = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"),
          localEdgeCap = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == expect, s"trial $trial (distributed path)")
    }
  }

  test("connectedComponents: single pair, star, and two components") {
    import spark.implicits._
    val edges = Seq((5L, 9L), (9L, 7L), (7L, 11L), // component min 5
      (100L, 200L), (200L, 300L)) // component min 100
    val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L, 11L -> 5L,
      100L -> 100L, 200L -> 100L, 300L -> 100L))
  }
}
