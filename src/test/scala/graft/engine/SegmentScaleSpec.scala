package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** Segment-count ramp guard: the reference runs tens of thousands of
  * segments per cluster (conf/settings.yml:4-5 — Archive-It crawl ids),
  * and the table-major layout's core claim is that segment count does
  * not enter the plan: one FileScan per table with `segment_id` as a
  * partition column, O(segments) work confined to file listing (which
  * Spark's InMemoryFileIndex parallelizes), never to analysis. This
  * spec holds that claim at 5,000 segments. */
class SegmentScaleSpec extends SparkSpecBase {

  test("5k segments: readAll plans one FileScan per table; planning time bounded") {
    val root = Files.createTempDirectory("graft-ramp").toString
    val store = new SegmentStore(spark, root)
    val engine = new TroughEngine(spark, store, new SchemaRegistry)
    engine.schemas.put("ramp-kv", "CREATE TABLE rkv (k INTEGER PRIMARY KEY, v TEXT);")
    val nSegs = 5000
    (0 until nSegs).foreach { i =>
      store.provision(f"ramp-$i%04d", "CREATE TABLE rkv (k INTEGER PRIMARY KEY, v TEXT);")
    }
    // data in a handful — the other 4,997 are empty partitions that the
    // scan schema (from meta) must still resolve without reading
    Seq(17, 2048, 4999).foreach { i =>
      engine.provisionWritable(f"ramp-$i%04d", "ramp-kv")
      engine.write(f"ramp-$i%04d", s"INSERT INTO rkv (k, v) VALUES ($i, 'v$i');")
    }
    assert(store.listSegments().size == nSegs)

    val t0 = System.nanoTime()
    val df = engine.readAll("SELECT count(*) AS n, sum(k) AS s FROM rkv;")
    val plan = df.queryExecution.executedPlan.toString // forces full planning
    val planSecs = (System.nanoTime() - t0) / 1e9
    // ONE scan regardless of segment count — the property that dies
    // first if the layout regresses to per-segment relations
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      s"expected exactly one scan over $nSegs segments, got:\n${plan.take(1200)}")
    // generous bound: locally this plans in ~1-2s; 60s means even a CI
    // box under load passes while an O(segments) analysis blowup
    // (10^4 unions was minutes at 120 segments' scale factor) fails
    assert(planSecs < 60.0, f"planning took $planSecs%.1f s over $nSegs segments")

    val row = df.collect()(0)
    assert(row.getLong(0) == 3L && row.getLong(1) == (17L + 2048L + 4999L))

    // regex pruning still reaches the partition filter at this scale
    val one = engine.readAll("SELECT v FROM rkv;", "^ramp-2048$")
    assert(one.collect().map(_.getString(0)).toSeq == Seq("v2048"))
  }

  test("fanout: a GLOBAL row budget bounds aggregate driver memory (VERDICT r10)") {
    val root = Files.createTempDirectory("graft-fanbudget").toString
    val store = new SegmentStore(spark, root)
    val engine = new TroughEngine(spark, store, new SchemaRegistry)
    engine.schemas.put("fb-kv", "CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT);")
    val segs = (0 until 3).map { i =>
      val id = s"fb-$i"
      engine.provisionWritable(id, "fb-kv")
      engine.write(id, "INSERT INTO kv (k, v) VALUES " +
        (1 to 40).map(k => s"($k, 'v$k')").mkString(", ") + ";")
      id
    }
    // the per-segment cap admits every segment (40 < 50) but the
    // AGGREGATE (120) exceeds the global budget — the per-segment cap
    // alone admits segments x cap rows on the driver, which is the
    // r10 scale hazard this bounds
    val e = intercept[TroughEngine.FanoutBudgetExceeded](
      engine.fanout(segs, "SELECT k, v FROM kv;",
        maxRowsPerSegment = 50, maxRowsTotal = 100))
    assert(e.getMessage.contains("global"), e.getMessage)
    // within budget: results intact and per-segment error isolation
    // still holds (a missing segment fails alone)
    val res = engine.fanout(segs :+ "fb-missing", "SELECT k, v FROM kv;",
      maxRowsPerSegment = 50, maxRowsTotal = 1000)
    assert(res.perSegment.count(_._2.isSuccess) == 3)
    assert(res.perSegment.find(_._1 == "fb-missing").exists(_._2.isFailure))
    assert(res.totalRows == 120L)
  }
}
