package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpecBase

/** ScalaTest ports of the reference's HTTP tests against the running
  * facade — tests/test_read.py:17-92, tests/test_write.py:14-65, and
  * tests/wsgi/test_segment_manager.py:24-140 — asserting the exact
  * bytes where the reference does (result JSON shape, 500 error
  * strings incl. Python reprs, write URLs, 201/204/400/404/405s). */
class HttpFacadeSpec extends SparkSpecBase with org.scalatest.BeforeAndAfterAll {

  private lazy val root = Files.createTempDirectory("graft-http").toString
  private lazy val promoteRoot = Files.createTempDirectory("graft-http-promote").toString
  private lazy val engine = {
    val store = new SegmentStore(spark, root)
    new TroughEngine(spark, store, new SchemaRegistry)
  }
  // hostname 'test01' matches the reference test fixture's
  // settings['HOSTNAME'] so the byte-exact lock message ports verbatim
  private lazy val facade =
    new TroughHttpFacade(engine, hostname = "test01", promoteRoot = Some(promoteRoot))
  private lazy val readPort = facade.startRead(0)
  private lazy val writePort = facade.startWrite(0)
  private lazy val mgrPort = facade.startSegmentManager(0)

  private val client = HttpClient.newHttpClient()

  private def send(method: String, url: String, body: String = "",
      headers: Seq[(String, String)] = Nil): HttpResponse[String] = {
    var b = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  override def afterAll(): Unit = {
    facade.close()
    super.afterAll()
  }

  // reference tests/test.conf schema, used throughout its read tests
  private val testDdl =
    "CREATE TABLE test (id INTEGER PRIMARY KEY AUTOINCREMENT, test varchar(4));"

  test("read endpoint: rows stream as the reference's exact JSON bytes (test_read.py:37-56)") {
    engine.schemas.put("http-s1", testDdl)
    engine.provisionWritable("http-read", "http-s1")
    engine.write("http-read", "INSERT INTO test (test) VALUES (\"test\");")
    val r = send("POST", s"http://localhost:$readPort/?segment=http-read",
      "SELECT * FROM \"test\";")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").orElse("") == "application/json")
    assert(r.body() == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("read endpoint: empty result is [] (test_read.py:17-36)") {
    engine.schemas.put("http-s2", testDdl)
    engine.provisionWritable("http-empty", "http-s2")
    val r = send("POST", s"http://localhost:$readPort/?segment=http-empty",
      "SELECT * FROM \"test\";")
    assert(r.statusCode() == 200)
    assert(r.body() == "[]\n")
  }

  test("read endpoint rejects writes with the reference's error (test_read.py:57-74)") {
    val r = send("POST", s"http://localhost:$readPort/?segment=http-read",
      "INSERT INTO test (test) VALUES (\"test\");")
    assert(r.statusCode() == 500)
    assert(r.headers().firstValue("Content-Type").orElse("") == "text/plain")
    assert(r.body() == "500 Server Error: Exactly one SELECT query per request, please.\n")
  }

  test("read endpoint: multiple statements rejected; unknown segment is a clean 500") {
    val multi = send("POST", s"http://localhost:$readPort/?segment=http-read",
      "SELECT 1; SELECT 2;")
    assert(multi.statusCode() == 500)
    assert(multi.body() == "500 Server Error: Exactly one SELECT query per request, please.\n")
    val missing = send("POST", s"http://localhost:$readPort/?segment=no-such-seg",
      "SELECT 1;")
    assert(missing.statusCode() == 500)
    assert(missing.body().startsWith("500 Server Error:"))
    assert(missing.body().contains("no such segment"))
  }

  test("write endpoint: CREATE + INSERT scripts answer OK and land (test_write.py:37-49)") {
    engine.schemas.put("http-s3", "")
    engine.provisionWritable("http-write", "http-s3")
    val r1 = send("POST", s"http://localhost:$writePort/?segment=http-write", testDdl)
    assert(r1.statusCode() == 200 && r1.body() == "OK\n")
    val r2 = send("POST", s"http://localhost:$writePort/?segment=http-write",
      "INSERT INTO test (test) VALUES (\"test\");")
    assert(r2.statusCode() == 200 && r2.body() == "OK\n")
    val read = send("POST", s"http://localhost:$readPort/?segment=http-write",
      "SELECT * FROM test;")
    assert(read.body() == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("write endpoint: empty script errors (test_write.py:14-23)") {
    val r = send("POST", s"http://localhost:$writePort/?segment=http-write", "")
    assert(r.statusCode() == 500)
    assert(r.body() == "500 Server Error: No query provided.\n")
  }

  test("write endpoint: SELECT in a write script is a clean 500 (test_write.py:24-36)") {
    val r = send("POST", s"http://localhost:$writePort/?segment=http-write",
      "SELECT * FROM \"test\";")
    assert(r.statusCode() == 500)
    assert(r.body().startsWith("500 Server Error:"))
    assert(r.body().contains("unsupported write statement: SELECT"))
  }

  test("write refusal without a lock is the reference's exact bytes (test_write.py:50-65)") {
    // segment id from the Host header, like the reference test's
    // HTTP_HOST='TEST.host' env. The JDK HttpClient refuses to spoof
    // Host, so this one goes over a raw socket.
    val payload = "INSERT INTO test (test) VALUES (\"test\")"
    val sock = new java.net.Socket("localhost", writePort)
    try {
      val out = sock.getOutputStream
      out.write(
        ("POST / HTTP/1.1\r\nHost: TEST.host\r\n" +
          s"Content-Length: ${payload.length}\r\nConnection: close\r\n\r\n" + payload)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.flush()
      val raw = new String(sock.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(raw.startsWith("HTTP/1.1 500 "))
      val bodyStart = raw.indexOf("\r\n\r\n") + 4
      assert(raw.substring(bodyStart) ==
        "500 Server Error: This node (settings['HOSTNAME']='test01') cannot write " +
          "to segment 'TEST'. There is no write lock set, or the write lock " +
          "authorizes another node. Write lock: None\n")
    } finally sock.close()
  }

  test("segment manager: simple provision (test_segment_manager.py:24-38)") {
    val get = send("GET", s"http://localhost:$mgrPort/")
    assert(get.statusCode() == 405)
    // hasn't been provisioned yet
    val r1 = send("POST", s"http://localhost:$mgrPort/", "test_simple_provision_segment")
    assert(r1.statusCode() == 200)
    assert(r1.headers().firstValue("Content-Type").orElse("").startsWith("text/plain"))
    assert(r1.body().endsWith(s":$writePort/?segment=test_simple_provision_segment"))
    // now it has already been provisioned — idempotent
    val r2 = send("POST", s"http://localhost:$mgrPort/", "test_simple_provision_segment")
    assert(r2.statusCode() == 200)
    assert(r2.body().endsWith(s":$writePort/?segment=test_simple_provision_segment"))
  }

  test("segment manager: /provision JSON API (test_segment_manager.py:40-62)") {
    val get = send("GET", s"http://localhost:$mgrPort/provision")
    assert(get.statusCode() == 405)
    val r1 = send("POST", s"http://localhost:$mgrPort/provision",
      "{\"segment\":\"test_provision_segment\"}")
    assert(r1.statusCode() == 200)
    assert(r1.headers().firstValue("Content-Type").orElse("") == "application/json")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r1.body())
    assert(node.get("write_url").asText().endsWith(s":$writePort/?segment=test_provision_segment"))
    assert(node.get("result").asText() == "success")
    assert(node.get("schema").asText() == "default")
    val r2 = send("POST", s"http://localhost:$mgrPort/provision",
      "{\"segment\":\"test_provision_segment\"}")
    assert(r2.statusCode() == 200)
  }

  test("segment manager: provision with schema, then read through the read port (test_segment_manager.py:64-101)") {
    val schema = testDdl + "\nCREATE INDEX ix_test ON test (test);"
    val put = send("PUT", s"http://localhost:$mgrPort/schema/test1/sql", schema)
    assert(put.statusCode() == 201)
    val prov = send("POST", s"http://localhost:$mgrPort/provision",
      "{\"segment\":\"test_provision_with_schema_1\", \"schema\":\"test1\"}")
    assert(prov.statusCode() == 200)
    // write a row through the write port, read it back through read
    val w = send("POST", s"http://localhost:$writePort/?segment=test_provision_with_schema_1",
      "INSERT INTO test (test) VALUES (\"test\");")
    assert(w.body() == "OK\n")
    val read = send("POST", s"http://localhost:$readPort/?segment=test_provision_with_schema_1",
      "SELECT * FROM test;")
    assert(read.statusCode() == 200)
    assert(read.body() == "[{\"id\":1,\"test\":\"test\"}]\n")
  }

  test("segment manager: schema CRUD paths (test_segment_manager.py:103-140)") {
    // initial list contains 'default'
    val list = send("GET", s"http://localhost:$mgrPort/schema")
    assert(list.statusCode() == 200)
    assert(list.body().contains("\"default\""))
    // existent schema as json
    val dflt = send("GET", s"http://localhost:$mgrPort/schema/default")
    assert(dflt.statusCode() == 200)
    assert(dflt.body() == "{\"id\":\"default\",\"sql\":\"\"}")
    // existent schema sql
    val sql = send("GET", s"http://localhost:$mgrPort/schema/default/sql")
    assert(sql.statusCode() == 200)
    assert(sql.headers().firstValue("Content-Type").orElse("") == "application/sql")
    assert(sql.body() == "")
    // schema doesn't exist yet
    assert(send("GET", s"http://localhost:$mgrPort/schema/schema1").statusCode() == 404)
    assert(send("GET", s"http://localhost:$mgrPort/schema/schema1/sql").statusCode() == 404)
    // bad request: POST not accepted (must be PUT)
    assert(send("POST", s"http://localhost:$mgrPort/schema/schema1", "{}").statusCode() == 405)
    assert(send("POST", s"http://localhost:$mgrPort/schema/schema1/sql", "").statusCode() == 405)

    // PUT /schema/<id> 400 paths (segment_manager.py:78-95)
    val bad1 = send("PUT", s"http://localhost:$mgrPort/schema/schema1", "not json at all {")
    assert(bad1.statusCode() == 400)
    assert(bad1.body() == "input could not be parsed as json")
    val bad2 = send("PUT", s"http://localhost:$mgrPort/schema/schema1",
      "{\"id\":\"schema1\",\"sql\":\"\",\"extra\":1}")
    assert(bad2.statusCode() == 400)
    assert(bad2.body().startsWith("input json has keys") &&
      bad2.body().endsWith("(should be {'id', 'sql'})"))
    val bad3 = send("PUT", s"http://localhost:$mgrPort/schema/schema1",
      "{\"id\":\"other\",\"sql\":\"\"}")
    assert(bad3.statusCode() == 400)
    assert(bad3.body() == "id in json 'other' does not match id in url 'schema1'")
    val bad4 = send("PUT", s"http://localhost:$mgrPort/schema/schema1",
      "{\"id\":\"schema1\",\"sql\":\"DELETE FROM x;\"}")
    assert(bad4.statusCode() == 400)
    assert(bad4.body().startsWith("schema sql failed validation:"))
    // created then updated
    val created = send("PUT", s"http://localhost:$mgrPort/schema/schema1",
      "{\"id\":\"schema1\",\"sql\":\"CREATE TABLE a (x INTEGER);\"}")
    assert(created.statusCode() == 201)
    val updated = send("PUT", s"http://localhost:$mgrPort/schema/schema1/sql",
      "CREATE TABLE a (x INTEGER, y TEXT);")
    assert(updated.statusCode() == 204)
    val back = send("GET", s"http://localhost:$mgrPort/schema/schema1/sql")
    assert(back.body() == "CREATE TABLE a (x INTEGER, y TEXT);")
  }

  test("segment manager: DELETE /segment — 204 / 404 absent / 400 locked (test_segment_manager.py:372+)") {
    assert(send("DELETE", s"http://localhost:$mgrPort/segment/never-existed").statusCode() == 404)
    engine.schemas.put("http-s4", testDdl)
    engine.provisionWritable("http-del", "http-s4")
    // provision leaves a write lock → ClientError → 400
    assert(send("DELETE", s"http://localhost:$mgrPort/segment/http-del").statusCode() == 400)
    engine.releaseWriteLock("http-del")
    assert(send("DELETE", s"http://localhost:$mgrPort/segment/http-del").statusCode() == 204)
    assert(!engine.store.segmentExists("http-del"))
    assert(send("DELETE", s"http://localhost:$mgrPort/segment/http-del").statusCode() == 404)
  }

  test("segment manager: /promote answers the durable path") {
    engine.schemas.put("http-s5", testDdl)
    engine.provisionWritable("http-promo", "http-s5")
    engine.write("http-promo", "INSERT INTO test (test) VALUES (\"pp\");")
    val r = send("POST", s"http://localhost:$mgrPort/promote", "{\"segment\":\"http-promo\"}")
    assert(r.statusCode() == 200)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.body())
    val remote = node.get("remote_path").asText()
    assert(remote.endsWith("http-promo"))
    assert(Files.isDirectory(java.nio.file.Paths.get(remote)))
  }

  test("provision refusals: cold range and hostile ids are 400 {'error': ...}") {
    val coldStore = new SegmentStore(spark, root,
      coldRoot = Some(Files.createTempDirectory("http-cold").toString),
      coldPredicate = _.startsWith("cold"))
    val coldEngine = new TroughEngine(spark, coldStore, new SchemaRegistry)
    val f2 = new TroughHttpFacade(coldEngine, "test01")
    val port = f2.startSegmentManager(0)
    try {
      val cold = send("POST", s"http://localhost:$port/provision",
        "{\"segment\":\"cold-x\"}")
      assert(cold.statusCode() == 400)
      assert(cold.body().contains("\"error\""))
      assert(cold.body().contains("read-only"))
      val bad = send("POST", s"http://localhost:$port/provision",
        "{\"segment\":\"_nope\"}")
      assert(bad.statusCode() == 400)
      assert(bad.body().contains("must match"))
      // unknown schema id is the reference's plain Exception → 500
      val noSchema = send("POST", s"http://localhost:$port/provision",
        "{\"segment\":\"ok-seg\", \"schema\":\"nope\"}")
      assert(noSchema.statusCode() == 500)
      assert(noSchema.body().contains("no such schema"))
    } finally f2.close()
  }
}
