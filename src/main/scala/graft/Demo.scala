package graft

import org.apache.spark.sql.SparkSession

import graft.engine.{SchemaRegistry, SegmentStore, Shell, TroughEngine}

/** Walkthrough of the engine's public API — the same lifecycle a trough
  * user drives over HTTP (provision → write script → segment-scoped read
  * → fan-out → promote → shred), against a scratch data root. Run with:
  * `sbt "runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val durable = java.nio.file.Files.createTempDirectory("graft-demo-durable").toString
    val engine = new TroughEngine(spark, new SegmentStore(spark, root), new SchemaRegistry)

    engine.schemas.put("crawl",
      "CREATE TABLE pages (id INTEGER PRIMARY KEY AUTOINCREMENT, url TEXT, status INTEGER);")

    Seq("crawl-2024-01", "crawl-2024-02").foreach(engine.provisionWritable(_, "crawl"))
    engine.write("crawl-2024-01",
      """INSERT INTO pages (url, status) VALUES ('http://a/', 200), ('http://b/', 301);
         INSERT INTO pages (url, status) VALUES ('http://c/', 404);""")
    engine.write("crawl-2024-02",
      "INSERT INTO pages (url, status) VALUES ('http://d/', 200);")

    println("== segment-scoped read (JSON wire shape) ==")
    print(engine.resultJson(engine.read("crawl-2024-01",
      "SELECT id, url, SEEDCRAWLEDSTATUS(cast(status AS string)) AS s FROM pages ORDER BY id;")))

    println("== fan-out with per-segment isolation ==")
    print(Shell.fanoutReport(engine.fanout(
      engine.store.listSegments("^crawl-"), "SELECT count(*) AS n FROM pages;")))

    println("== one declarative query over all segments ==")
    engine.readAll(
      "SELECT segment_id, count(*) AS n FROM pages GROUP BY segment_id ORDER BY segment_id;")
      .show()

    println("== promote + shred ==")
    println("promoted to: " + engine.promote("crawl-2024-01", durable))
    engine.releaseWriteLock("crawl-2024-02")
    engine.deleteSegment("crawl-2024-02")
    println("remaining segments: " + engine.store.listSegments().mkString(", "))

    println("== export to a real .sqlite file and ingest it back ==")
    val sqliteFile = java.nio.file.Paths.get(durable, "crawl-2024-01.sqlite")
    engine.store.exportSqliteSegment("crawl-2024-01", sqliteFile.toString)
    println(s"exported ${java.nio.file.Files.size(sqliteFile)} bytes of SQLite")
    engine.store.ingestSqliteSegment(sqliteFile.toString, "crawl-2024-01-restored")
    print(engine.resultJson(engine.read("crawl-2024-01-restored",
      "SELECT id, url FROM pages ORDER BY id;")))

    println("== bulk migration through executor tasks ==")
    val migrated = engine.store.ingestSqliteSegmentsDistributed(
      Map("bulk-a" -> sqliteFile.toString, "bulk-b" -> sqliteFile.toString))
    println("distributed ingest: " + migrated.map { case (s, r) =>
      s"$s -> ${r.map(_.mkString("+")).getOrElse("FAILED")}" }.toSeq.sorted.mkString(", "))

    println("== the reference's HTTP wire contract ==")
    val facade = new graft.server.HttpFacade(
      engine, readPort = 0, writePort = 0, syncPort = 0).start()
    val readPort = facade.boundReadPort
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$readPort/?segment=crawl-2024-01"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            "SELECT url FROM pages WHERE status = 200;")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      print(s"POST :$readPort/?segment=crawl-2024-01 -> ${resp.statusCode()} ${resp.body()}")
    } finally facade.stop()

    spark.stop()
  }
}
