package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpecBase
import graft.engine.{SchemaRegistry, SegmentStore, TroughEngine}

/** The reference wire contract, end to end over real HTTP: provision →
  * write → read round trips with the reference's byte shapes, status
  * codes, and error texts (read.py, write.py, wsgi/segment_manager.py).
  * Servers bind ephemeral ports; requests go through the JDK client. */
class HttpFacadeSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {

  private lazy val root = Files.createTempDirectory("graft-http").toString
  private lazy val durable = Files.createTempDirectory("graft-http-durable").toString
  // nodeName 'test01' matches the reference test fixture's
  // settings['HOSTNAME'] so the byte-exact lock message ports verbatim
  private lazy val engine = {
    val store = new SegmentStore(spark, root,
      coldPredicate = _.startsWith("cold"))
    new TroughEngine(spark, store, new SchemaRegistry, nodeName = "test01")
  }
  private lazy val facade =
    new HttpFacade(engine, readPort = 0, writePort = 0, syncPort = 0,
      durableRoot = Some(durable)).start()

  private lazy val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = facade.stop()

  private def req(port: Int, path: String): HttpRequest.Builder =
    HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))

  private def send(r: HttpRequest): HttpResponse[String] =
    client.send(r, HttpResponse.BodyHandlers.ofString(UTF_8))

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    send(req(port, path).POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build())

  // ------------------------------------------------------------- lifecycle

  test("provision → write → read round trip with reference byte shapes") {
    val prov = post(facade.boundSyncPort, "/provision",
      """{"segment": "http1", "schema": "default"}""")
    assert(prov.statusCode() == 200)
    assert(prov.headers().firstValue("Content-Type").get().startsWith("application/json"))
    assert(prov.body().contains("\"result\":\"success\""))
    assert(prov.body().contains(
      s""""write_url":"http://localhost:${facade.boundWritePort}/?segment=http1""""))

    val wr = post(facade.boundWritePort, "/?segment=http1",
      "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4));" +
        "INSERT INTO test (test) VALUES ('test');")
    assert(wr.statusCode() == 200)
    assert(wr.body() == "OK\n") // write.py:44 exact

    val rd = post(facade.boundReadPort, "/?segment=http1", "select * from test;")
    assert(rd.statusCode() == 200)
    assert(rd.headers().firstValue("Content-Type").get().startsWith("application/json"))
    // the reference read-test shape (test_read.py:21-27): exact bytes
    assert(rd.body() == """[{"id":1,"test":"test"}]""" + "\n")
  }

  test("read: multi-row stream shape is rows joined by ',\\n' (read.py:33-52)") {
    post(facade.boundSyncPort, "/provision", """{"segment": "http2"}""")
    post(facade.boundWritePort, "/?segment=http2",
      "CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT);" +
        "INSERT INTO t VALUES (1, 'a'), (2, NULL);")
    val rd = post(facade.boundReadPort, "/?segment=http2", "SELECT k, v FROM t ORDER BY k;")
    assert(rd.body() == "[{\"k\":1,\"v\":\"a\"},\n{\"k\":2,\"v\":null}]\n")
  }

  test("read: Host-header first label addresses the segment (read.py:74)") {
    // the JDK client refuses to forge Host — speak HTTP/1.1 raw
    val sql = "SELECT count(*) AS n FROM t;"
    val sock = new java.net.Socket("localhost", facade.boundReadPort)
    try {
      val out = sock.getOutputStream
      out.write(
        (s"POST / HTTP/1.1\r\nHost: http2.example.com:${facade.boundReadPort}\r\n" +
          s"Content-Length: ${sql.length}\r\nConnection: close\r\n\r\n" + sql)
          .getBytes(UTF_8))
      out.flush()
      val resp = new String(sock.getInputStream.readAllBytes(), UTF_8)
      assert(resp.startsWith("HTTP/1.1 200"))
      assert(resp.contains("[{\"n\":2}]\n")) // chunk framing follows the body
    } finally sock.close()
  }

  test("read gate: non-SELECT and multi-statement answer the reference 500 text") {
    for (bad <- Seq("DROP TABLE t;", "SELECT 1; SELECT 2;")) {
      val rd = post(facade.boundReadPort, "/?segment=http2", bad)
      assert(rd.statusCode() == 500)
      assert(rd.body() ==
        "500 Server Error: Exactly one SELECT query per request, please.\n")
    }
  }

  test("read: unknown segment is a 500, not a hang or empty 200") {
    val rd = post(facade.boundReadPort, "/?segment=nosuch", "SELECT 1;")
    assert(rd.statusCode() == 500)
    assert(rd.body().startsWith("500 Server Error: "))
  }

  test("write without a lock answers the reference refusal (write.py:55-57)") {
    val wr = post(facade.boundWritePort, "/?segment=neverprovisioned",
      "CREATE TABLE t (id INTEGER);")
    assert(wr.statusCode() == 500)
    assert(wr.body().contains("cannot write to segment 'neverprovisioned'"))
    assert(wr.body().contains("no write lock set"))
  }

  // -------------------------------------------------------- segment manager

  test("deprecated POST / answers the write url as text (segment_manager.py:12-18)") {
    val r = post(facade.boundSyncPort, "/", "http3")
    assert(r.statusCode() == 200)
    assert(r.body() == s"http://localhost:${facade.boundWritePort}/?segment=http3")
  }

  test("provision of a cold-range segment is the ClientError 400 (sync.py:1050-1068)") {
    val r = post(facade.boundSyncPort, "/provision", """{"segment": "cold9"}""")
    assert(r.statusCode() == 400)
    assert(r.body().startsWith("{\"error\":"))
    assert(r.body().contains("cold"))
  }

  test("schema CRUD: PUT sql 201/204, GETs, reference 400 texts (segment_manager.py:54-115)") {
    val put1 = send(req(facade.boundSyncPort, "/schema/crawlstats/sql")
      .PUT(HttpRequest.BodyPublishers.ofString(
        "CREATE TABLE stats (bucket VARCHAR(100), n INTEGER);", UTF_8)).build())
    assert(put1.statusCode() == 201) // created
    val put2 = send(req(facade.boundSyncPort, "/schema/crawlstats/sql")
      .PUT(HttpRequest.BodyPublishers.ofString(
        "CREATE TABLE stats (bucket VARCHAR(100), n INTEGER, w REAL);", UTF_8)).build())
    assert(put2.statusCode() == 204) // updated

    val list = send(req(facade.boundSyncPort, "/schema").GET().build())
    assert(list.statusCode() == 200)
    assert(list.body().contains("\"crawlstats\"") && list.body().contains("\"default\""))

    val sql = send(req(facade.boundSyncPort, "/schema/crawlstats/sql").GET().build())
    assert(sql.statusCode() == 200)
    assert(sql.body().contains("w REAL"))

    val doc = send(req(facade.boundSyncPort, "/schema/crawlstats").GET().build())
    assert(doc.statusCode() == 200)
    assert(doc.body().startsWith("{\"id\":\"crawlstats\",\"sql\":"))

    assert(send(req(facade.boundSyncPort, "/schema/nosuch").GET().build())
      .statusCode() == 404)
    assert(send(req(facade.boundSyncPort, "/schema/nosuch/sql").GET().build())
      .statusCode() == 404)

    // the JSON document form's validation cascade, reference texts
    val badJson = send(req(facade.boundSyncPort, "/schema/x")
      .PUT(HttpRequest.BodyPublishers.ofString("{nope", UTF_8)).build())
    assert(badJson.statusCode() == 400)
    assert(badJson.body() == "input could not be parsed as json")

    val badKeys = send(req(facade.boundSyncPort, "/schema/x")
      .PUT(HttpRequest.BodyPublishers.ofString("""{"id":"x","extra":1}""", UTF_8)).build())
    assert(badKeys.statusCode() == 400)
    assert(badKeys.body().contains("should be {'id', 'sql'}"))

    val badId = send(req(facade.boundSyncPort, "/schema/x")
      .PUT(HttpRequest.BodyPublishers.ofString(
        """{"id":"y","sql":"CREATE TABLE t (id INTEGER);"}""", UTF_8)).build())
    assert(badId.statusCode() == 400)
    assert(badId.body().contains("does not match id in url"))

    val badSql = send(req(facade.boundSyncPort, "/schema/x")
      .PUT(HttpRequest.BodyPublishers.ofString(
        """{"id":"x","sql":"INSERT INTO t VALUES (1);"}""", UTF_8)).build())
    assert(badSql.statusCode() == 400)
    assert(badSql.body().startsWith("schema sql failed validation: "))

    val goodDoc = send(req(facade.boundSyncPort, "/schema/x")
      .PUT(HttpRequest.BodyPublishers.ofString(
        """{"id":"x","sql":"CREATE TABLE t (id INTEGER);"}""", UTF_8)).build())
    assert(goodDoc.statusCode() == 201)
  }

  test("promote flushes to the durable root and answers remote_path") {
    post(facade.boundSyncPort, "/provision", """{"segment": "http4"}""")
    post(facade.boundWritePort, "/?segment=http4",
      "CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT);INSERT INTO t VALUES (1,'x');")
    val r = post(facade.boundSyncPort, "/promote", """{"segment": "http4"}""")
    assert(r.statusCode() == 200)
    val path = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(r.body()).get("remote_path").asText()
    assert(path.startsWith(durable))
    assert(Files.isDirectory(java.nio.file.Path.of(path)))

    val unlocked = post(facade.boundSyncPort, "/promote", """{"segment": "nolock"}""")
    assert(unlocked.statusCode() == 500)
    assert(unlocked.body().contains("not currently writable"))
  }

  test("DELETE /segment: 400 while locked, 204 after release, 404 unknown (segment_manager.py:117-129)") {
    post(facade.boundSyncPort, "/provision", """{"segment": "http5"}""")
    val locked = send(req(facade.boundSyncPort, "/segment/http5").DELETE().build())
    assert(locked.statusCode() == 400)

    engine.releaseWriteLock("http5")
    val ok = send(req(facade.boundSyncPort, "/segment/http5").DELETE().build())
    assert(ok.statusCode() == 204)
    assert(!engine.store.segmentExists("http5"))

    val gone = send(req(facade.boundSyncPort, "/segment/http5").DELETE().build())
    assert(gone.statusCode() == 404)
  }

  test("unknown manager routes answer 404") {
    assert(send(req(facade.boundSyncPort, "/nope").GET().build()).statusCode() == 404)
  }

  // ------------------- assertions folded in from the r7 engine-facade spec

  test("read: empty result is [] (test_read.py:17-36)") {
    post(facade.boundSyncPort, "/provision", """{"segment": "http-empty"}""")
    post(facade.boundWritePort, "/?segment=http-empty",
      "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4));")
    val r = post(facade.boundReadPort, "/?segment=http-empty",
      "SELECT * FROM \"test\";")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").orElse("") == "application/json")
    assert(r.body() == "[]\n")
  }

  test("write: empty script is the reference error (test_write.py:14-23)") {
    val r = post(facade.boundWritePort, "/?segment=http2", "")
    assert(r.statusCode() == 500)
    assert(r.body() == "500 Server Error: No query provided.\n")
  }

  test("write: SELECT in a write script is a clean 500 (test_write.py:24-36)") {
    val r = post(facade.boundWritePort, "/?segment=http2", "SELECT * FROM \"t\";")
    assert(r.statusCode() == 500)
    assert(r.body().startsWith("500 Server Error:"))
    assert(r.body().contains("unsupported write statement: SELECT"))
  }

  test("write refusal without a lock is the reference's exact bytes (test_write.py:50-65)") {
    // segment id from the Host header, like the reference test's
    // HTTP_HOST='TEST.host' env. The JDK HttpClient refuses to spoof
    // Host, so this one goes over a raw socket.
    val payload = "INSERT INTO test (test) VALUES (\"test\")"
    val sock = new java.net.Socket("localhost", facade.boundWritePort)
    try {
      val out = sock.getOutputStream
      out.write(
        ("POST / HTTP/1.1\r\nHost: TEST.host\r\n" +
          s"Content-Length: ${payload.length}\r\nConnection: close\r\n\r\n" + payload)
          .getBytes(UTF_8))
      out.flush()
      val raw = new String(sock.getInputStream.readAllBytes(), UTF_8)
      assert(raw.startsWith("HTTP/1.1 500 "))
      val bodyStart = raw.indexOf("\r\n\r\n") + 4
      assert(raw.substring(bodyStart) ==
        "500 Server Error: This node (settings['HOSTNAME']='test01') cannot write " +
          "to segment 'TEST'. There is no write lock set, or the write lock " +
          "authorizes another node. Write lock: None\n")
    } finally sock.close()
  }

  test("manager: wrong verbs answer 405 (flask method routing)") {
    assert(send(req(facade.boundSyncPort, "/").GET().build()).statusCode() == 405)
    assert(send(req(facade.boundSyncPort, "/provision").GET().build()).statusCode() == 405)
    assert(send(req(facade.boundSyncPort, "/promote").GET().build()).statusCode() == 405)
    assert(post(facade.boundSyncPort, "/schema/default", "{}").statusCode() == 405)
    assert(post(facade.boundSyncPort, "/schema/default/sql", "").statusCode() == 405)
  }

  test("provision is idempotent, JSON and deprecated text forms (test_segment_manager.py:24-62)") {
    for (_ <- 1 to 2) {
      val r = post(facade.boundSyncPort, "/provision", """{"segment": "http-idem"}""")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("") == "application/json")
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.body())
      assert(node.get("result").asText() == "success")
      assert(node.get("schema").asText() == "default")
      assert(node.get("write_url").asText()
        .endsWith(s":${facade.boundWritePort}/?segment=http-idem"))
    }
    for (_ <- 1 to 2) {
      val r = post(facade.boundSyncPort, "/", "http-idem-txt")
      assert(r.statusCode() == 200)
      assert(r.body().endsWith(s":${facade.boundWritePort}/?segment=http-idem-txt"))
    }
  }

  test("provision with a schema incl. index, then write/read round trip (test_segment_manager.py:64-101)") {
    val schema = "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, " +
      "test varchar(4));\nCREATE INDEX ix_test ON test (test);"
    val put = send(req(facade.boundSyncPort, "/schema/test1/sql")
      .PUT(HttpRequest.BodyPublishers.ofString(schema, UTF_8)).build())
    assert(put.statusCode() == 201)
    val prov = post(facade.boundSyncPort, "/provision",
      """{"segment":"http-sch1", "schema":"test1"}""")
    assert(prov.statusCode() == 200)
    val w = post(facade.boundWritePort, "/?segment=http-sch1",
      "INSERT INTO test (test) VALUES (\"test\");")
    assert(w.body() == "OK\n")
    val rd = post(facade.boundReadPort, "/?segment=http-sch1", "SELECT * FROM test;")
    assert(rd.statusCode() == 200)
    assert(rd.body() == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("provision refusals: hostile id is 400 {'error'}, unknown schema is 500") {
    val bad = post(facade.boundSyncPort, "/provision", """{"segment": "_nope"}""")
    assert(bad.statusCode() == 400)
    assert(bad.body().startsWith("{\"error\":"))
    assert(bad.body().contains("must match"))
    // unknown schema id is the reference's plain Exception → 500
    val noSchema = post(facade.boundSyncPort, "/provision",
      """{"segment": "ok-seg", "schema": "nope"}""")
    assert(noSchema.statusCode() == 500)
    assert(noSchema.body().contains("no such schema"))
  }
}
