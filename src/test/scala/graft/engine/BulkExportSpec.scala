package graft.engine

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.SparkSpecBase

/** Executor-distributed bulk `.sqlite` export
  * ([[SegmentStore.exportSqliteSegmentsDistributed]], the outbound
  * mirror of the distributed ingest): the per-segment export closure
  * `require(TaskContext.get() != null)`, the listener proves Spark
  * tasks ran the work, and every produced file is verified by the REAL
  * sqlite3 — integrity_check plus row-for-row comparison — then
  * re-ingested distributed for a full round trip. */
class BulkExportSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-bulk-export").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private def makeDb(dir: Path, name: String, sql: String): Path = {
    val db = dir.resolve(s"$name.sqlite")
    val rc = SqliteCli.run(db.toString, sql)
    assert(rc == 0, s"sqlite3 exited $rc for $name")
    db
  }

  test("18 ingested + 2 engine-built segments export through executor tasks") {
    val dir = Files.createTempDirectory("bulk-export-src")
    // 18 segments via distributed ingest: rowid-alias table with a
    // secondary index and a view, plus a no-alias PK table (positional
    // rowids + sqlite_autoindex on export)
    val files = (1 to 18).map { i =>
      val sql =
        s"""CREATE TABLE crawl (id INTEGER PRIMARY KEY, url TEXT, status INTEGER);
           |CREATE INDEX crawl_status ON crawl (status);
           |INSERT INTO crawl (url, status) VALUES
           |  ('http://s$i.example/a', ${200 + (i % 3)}),
           |  ('http://s$i.example/b', 404),
           |  ('http://s$i.example/c', 500);
           |CREATE TABLE kv (k TEXT PRIMARY KEY, v TEXT);
           |INSERT INTO kv VALUES ('seg', 's$i'), ('zeta', 'Z$i');
           |CREATE VIEW errs AS SELECT url FROM crawl WHERE status >= 400;""".stripMargin
      s"bx-$i" -> makeDb(dir, s"x$i", sql).toString
    }.toMap
    val ing = store.ingestSqliteSegmentsDistributed(files)
    assert(ing.values.forall(_.isSuccess), s"ingest failures: $ing")

    // 2 engine-built segments: one fts5, one rtree — virtual-table
    // exports must run inside tasks too
    engine.schemas.put("bx-fts-schema",
      "CREATE VIRTUAL TABLE notes USING fts5(body, tag UNINDEXED);")
    engine.provisionWritable("bx-fts", "bx-fts-schema")
    engine.write("bx-fts",
      "INSERT INTO notes VALUES ('the quick brown fox', 'a'), " +
        "('lazy dogs sleep quietly', 'b'), ('quick quick slow', 'c');")
    engine.schemas.put("bx-rt-schema",
      "CREATE VIRTUAL TABLE boxes USING rtree(id, minX, maxX, minY, maxY);")
    engine.provisionWritable("bx-rt", "bx-rt-schema")
    engine.write("bx-rt",
      "INSERT INTO boxes VALUES (1, 0, 1, 0, 1), (2, 0.5, 2.5, 0.5, 2.5), " +
        "(3, -4.25, -1.75, 10, 11);")

    val outDir = Files.createTempDirectory("bulk-export-out")
    val tasksEnded = new AtomicInteger
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasksEnded.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val results =
      try store.exportSqliteSegmentsDistributed(
        files.keys.toSeq ++ Seq("bx-fts", "bx-rt", "bx-ghost"),
        outDir.toString)
      finally spark.sparkContext.removeSparkListener(listener)
    assert(tasksEnded.get() >= 1, "no Spark tasks ran the export")
    assert(results.size == 21)
    // per-segment isolation: the missing segment fails, the rest land
    assert(results("bx-ghost").isFailure)
    assert(results.count(_._2.isSuccess) == 20, s"failures: ${results.filter(_._2.isFailure)}")

    // every output passes the real sqlite3's own checks and matches
    // the source rows
    (1 to 18).foreach { i =>
      val out = outDir.resolve(s"bx-$i.sqlite")
      assert(results(s"bx-$i").get == out.toString)
      assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
      val got = SqliteCli.query(out.toString,
        "SELECT id, url, status FROM crawl ORDER BY id;")
      val want = SqliteCli.query(files(s"bx-$i"),
        "SELECT id, url, status FROM crawl ORDER BY id;")
      assert(got == want, s"bx-$i: $got != $want")
      // the secondary index exists and real sqlite3 plans through it
      assert(SqliteCli.query(out.toString,
        "SELECT name FROM sqlite_master WHERE type='index' AND " +
          "name='crawl_status';") == "crawl_status")
      assert(SqliteCli.query(out.toString,
        "EXPLAIN QUERY PLAN SELECT url FROM crawl WHERE status = 404;")
        .contains("crawl_status"))
      // WITHOUT-rowid-alias PK table round-tripped with its autoindex
      assert(SqliteCli.query(out.toString,
        "SELECT v FROM kv WHERE k = 'zeta';") == s"Z$i")
      // the view survived and answers
      assert(SqliteCli.query(out.toString,
        "SELECT count(*) FROM errs;") == "2")
    }
    val fts = results("bx-fts").get
    assert(SqliteCli.query(fts, "PRAGMA integrity_check;") == "ok")
    assert(SqliteCli.run(fts,
      "INSERT INTO notes(notes) VALUES('integrity-check');") == 0)
    // rowids are assigned in all-columns sort order (the driver
    // path's deterministic rule), so compare content-ordered
    assert(SqliteCli.query(fts,
      "SELECT body FROM notes WHERE notes MATCH 'quick' ORDER BY body;") ==
      "quick quick slow\nthe quick brown fox")
    val rt = results("bx-rt").get
    assert(SqliteCli.query(rt, "PRAGMA integrity_check;") == "ok")
    assert(SqliteCli.query(rt, "SELECT rtreecheck('boxes');") == "ok")
    assert(SqliteCli.query(rt,
      "SELECT id FROM boxes WHERE minX <= 0.75 AND maxX >= 0.75 ORDER BY id;") ==
      "1\n2")

    // full round trip: re-ingest the exported fleet DISTRIBUTED into a
    // fresh store and compare aggregate row content
    val store2 = new SegmentStore(spark,
      Files.createTempDirectory("bulk-export-back").toString)
    val engine2 = new TroughEngine(spark, store2, new SchemaRegistry)
    val back = store2.ingestSqliteSegmentsDistributed(
      results.collect { case (seg, scala.util.Success(p)) => seg -> p })
    assert(back.values.forall(_.isSuccess), s"round-trip failures: $back")
    val n1 = engine.readAll("SELECT count(*) AS n, sum(status) AS s FROM crawl;",
      "bx-[0-9]+").collect()(0)
    val n2 = engine2.readAll("SELECT count(*) AS n, sum(status) AS s FROM crawl;",
      "bx-[0-9]+").collect()(0)
    assert(n1.toString == n2.toString, s"round trip drifted: $n1 != $n2")
  }

  test("distributed export writes through scheme-qualified Hadoop URIs") {
    engine.schemas.put("bx-uri-schema",
      "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);")
    engine.provisionWritable("bx-uri", "bx-uri-schema")
    engine.write("bx-uri", "INSERT INTO t (v) VALUES ('hadoop-out');")
    val outDir = Files.createTempDirectory("bulk-export-uri")
    val res = store.exportSqliteSegmentsDistributed(
      Seq("bx-uri"), outDir.toUri.toString)
    assert(res("bx-uri").isSuccess, res.toString)
    val written = outDir.resolve("bx-uri.sqlite")
    assert(Files.isRegularFile(written), s"missing $written")
    assert(SqliteCli.query(written.toString, "SELECT v FROM t;") == "hadoop-out")
  }
}
