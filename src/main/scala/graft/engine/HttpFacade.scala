package graft.engine

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP serving facade over [[TroughEngine]] — the reference's WIRE
  * contract, so a trough client can point at this engine without new
  * glue. Three servers, mirroring the reference's three processes:
  *
  *  - '''read''' (reference trough/read.py:70-98, port 6444): any-path
  *    POST, segment from `?segment=` or the Host prefix, body = one
  *    SELECT; answers a STREAMED JSON array (`[` rows `,\n`-joined
  *    `]\n`) via [[TroughEngine.resultJsonIter]], errors as
  *    `500 Server Error: <msg>\n` text/plain. The reference's
  *    read-through proxy to the write host is dissolved here — a single
  *    engine serves one coherent snapshot (SURVEY A3).
  *  - '''write''' (trough/write.py:47-65, port 6222): any-path POST,
  *    body = write script, answers `OK\n`; refusals use the reference's
  *    exact 500 message shape incl. Python-repr quoting
  *    (`This node (settings['HOSTNAME']='x') cannot write …`,
  *    byte-asserted from tests/test_write.py:65).
  *  - '''segment manager''' (trough/wsgi/segment_manager.py:20-131,
  *    port 6111): POST `/` (deprecated simple provision → write URL,
  *    text/plain), POST `/provision` (JSON → JSON result / 400
  *    `{"error": …}`), GET `/schema`, GET|PUT `/schema/<id>` and
  *    `/schema/<id>/sql` (201 created / 204 updated / 400 validation
  *    paths / 404 / 405), DELETE `/segment/<id>` (204 / 404 absent /
  *    400 write-locked), POST `/promote`.
  *
  * Implementation is the JDK's embedded `com.sun.net.httpserver` — no
  * added dependencies; jackson (shipped with Spark) handles JSON.
  * Start methods take port 0 for an ephemeral bind (specs) and return
  * the bound port.
  */
final class TroughHttpFacade(
    engine: TroughEngine,
    hostname: String = "localhost",
    promoteRoot: Option[String] = None) extends AutoCloseable {

  private val mapper = new ObjectMapper()
  private val servers = scala.collection.mutable.ArrayBuffer[HttpServer]()
  @volatile private var writePort: Int = 6222 // reference WRITE_PORT default

  def startRead(port: Int = 6444): Int = start(port, readHandler)

  def startWrite(port: Int = 6222): Int = {
    val bound = start(port, writeHandler)
    writePort = bound
    bound
  }

  def startSegmentManager(port: Int = 6111): Int = start(port, managerHandler)

  override def close(): Unit = synchronized {
    servers.foreach(_.stop(0))
    servers.clear()
  }

  private def start(port: Int, handler: HttpExchange => Unit): Int = synchronized {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) =>
      try handler(ex)
      catch { case NonFatal(e) => error500(ex, e) }
      finally ex.close())
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    servers += server
    server.getAddress.getPort
  }

  // ------------------------------------------------------------- plumbing

  private def respond(ex: HttpExchange, status: Int, contentType: String,
      body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    if (body.isEmpty) ex.sendResponseHeaders(status, -1)
    else {
      ex.sendResponseHeaders(status, body.length)
      ex.getResponseBody.write(body)
      ex.getResponseBody.close()
    }
  }

  private def respondText(ex: HttpExchange, status: Int, text: String,
      contentType: String = "text/plain"): Unit =
    respond(ex, status, contentType, text.getBytes(UTF_8))

  /** `'500 Server Error: %s\n' % str(e)` — read.py:96-98/write.py:63-65.
    * Defensive: if the 200 and part of a stream already went out (a
    * failure in `os.close()` after a truncated stream), the headers
    * can't be resent — swallow rather than kill the handler thread. */
  private def error500(ex: HttpExchange, e: Throwable): Unit =
    try respondText(ex, 500, s"500 Server Error: ${e.getMessage}\n")
    catch { case NonFatal(_) => () }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) URLDecoder.decode(kv, UTF_8) -> ""
        else URLDecoder.decode(kv.take(i), UTF_8) -> URLDecoder.decode(kv.drop(i + 1), UTF_8)
      }.toMap

  /** Segment resolution, reference read.py:73-75 / write.py:50-52:
    * the `?segment=` query variable, else the Host header's first
    * dot-separated token. */
  private def segmentOf(ex: HttpExchange): String =
    queryParams(ex).getOrElse("segment",
      Option(ex.getRequestHeaders.getFirst("Host")).getOrElse("").split("\\.")(0))

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def writeUrl(segmentId: String): String =
    s"http://$hostname:$writePort/?segment=$segmentId"

  // ------------------------------------------------------------------ read

  private def readHandler(ex: HttpExchange): Unit = {
    val sql = body(ex)
    val seg = segmentOf(ex)
    // analysis errors (bad SQL, missing table, read gate) surface HERE,
    // before the 200 — like the reference's eager cursor.execute
    val iter = engine.resultJsonIter(engine.read(seg, sql))
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, 0) // chunked: results stream, never buffer
    val os = ex.getResponseBody
    // a mid-stream execution error truncates the response, matching the
    // reference's sql_result_json_iter (read.py:45-47: log and stop)
    try iter.foreach(s => os.write(s.getBytes(UTF_8)))
    catch { case NonFatal(_) => () }
    finally os.close()
  }

  // ----------------------------------------------------------------- write

  private def writeHandler(ex: HttpExchange): Unit = {
    val script = body(ex)
    val seg = segmentOf(ex)
    // the reference's exact refusal message, Python reprs included
    // (write.py:57-58; byte-asserted by tests/test_write.py:65)
    val lock = engine.writeLockHolder(seg)
    if (lock.isEmpty)
      throw new IllegalStateException(
        s"This node (settings['HOSTNAME']='$hostname') cannot write to segment " +
          s"'$seg'. There is no write lock set, or the write lock authorizes " +
          "another node. Write lock: None")
    respondText(ex, 200, engine.write(seg, script))
  }

  // -------------------------------------------------------- segment manager

  private def managerHandler(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    (method, path) match {
      case ("POST", "/") => simpleProvision(ex)
      case ("POST", "/provision") => provisionJson(ex)
      case ("POST", "/promote") => promoteJson(ex)
      case ("GET", "/schema") =>
        respondText(ex, 200, mapper.writeValueAsString(
          engine.schemas.list().toArray), "application/json")
      case (m, p) if p.startsWith("/schema/") && p.endsWith("/sql") =>
        val id = p.stripPrefix("/schema/").stripSuffix("/sql")
        m match {
          case "GET" => engine.schemas.get(id) match {
            case Some(sql) => respondText(ex, 200, sql, "application/sql")
            case None => respondText(ex, 404, "404 Not Found\n")
          }
          case "PUT" => putSchema(ex, id, body(ex))
          case _ => respondText(ex, 405, "405 Method Not Allowed\n")
        }
      case (m, p) if p.startsWith("/schema/") =>
        val id = p.stripPrefix("/schema/")
        m match {
          case "GET" => engine.schemas.get(id) match {
            case Some(sql) =>
              val node = mapper.createObjectNode()
              node.put("id", id)
              node.put("sql", sql)
              respondText(ex, 200, node.toString, "application/json")
            case None => respondText(ex, 404, "404 Not Found\n")
          }
          case "PUT" =>
            // PUT /schema/<id>: JSON {'id','sql'} with the reference's
            // three 400 paths (segment_manager.py:78-95)
            val raw = body(ex)
            val parsed =
              try Some(mapper.readTree(raw))
              catch { case NonFatal(_) => None }
            parsed match {
              case None =>
                respondText(ex, 400, "input could not be parsed as json")
              case Some(node) =>
                val keys = {
                  val it = node.fieldNames()
                  val b = Seq.newBuilder[String]
                  while (it.hasNext) b += it.next()
                  b.result()
                }
                if (keys.toSet != Set("id", "sql"))
                  respondText(ex, 400,
                    s"input json has keys {${keys.map("'" + _ + "'").mkString(", ")}} " +
                      "(should be {'id', 'sql'})")
                else if (node.get("id").asText() != id)
                  respondText(ex, 400,
                    s"id in json '${node.get("id").asText()}' does not match " +
                      s"id in url '$id'")
                else putSchema(ex, id, node.get("sql").asText())
            }
          case _ => respondText(ex, 405, "405 Method Not Allowed\n")
        }
      case ("DELETE", p) if p.startsWith("/segment/") =>
        val id = p.stripPrefix("/segment/")
        if (!engine.store.segmentExists(id)) respondText(ex, 404, "404 Not Found\n")
        else if (engine.writeLockHolder(id).isDefined)
          // ClientError → 400 (segment_manager.py:126-128; lock refusal
          // sync.py:849-852)
          respondText(ex, 400, "400 Bad Request\n")
        else { engine.deleteSegment(id); respond(ex, 204, "text/plain", Array.empty) }
      case ("GET", "/") | ("GET", "/provision") | ("GET", "/promote") =>
        respondText(ex, 405, "405 Method Not Allowed\n")
      case _ => respondText(ex, 404, "404 Not Found\n")
    }
  }

  /** POST / — deprecated simple API (segment_manager.py:12-18): body is
    * the bare segment id, response is the write URL as text/plain. */
  private def simpleProvision(ex: HttpExchange): Unit = {
    val segmentId = body(ex).trim
    engine.provisionWritable(segmentId)
    respondText(ex, 200, writeUrl(segmentId))
  }

  /** POST /provision — JSON in, JSON out, ClientError-style refusals as
    * 400 `{"error": …}` (segment_manager.py:20-38). */
  private def provisionJson(ex: HttpExchange): Unit = {
    val node = mapper.readTree(body(ex))
    val segmentId = node.get("segment").asText()
    val schemaId = if (node.hasNonNull("schema")) node.get("schema").asText() else "default"
    try {
      engine.provisionWritable(segmentId, schemaId)
      val out = mapper.createObjectNode()
      out.put("write_url", writeUrl(segmentId))
      out.put("result", "success")
      out.put("size", engine.store.segmentSizeBytes(segmentId))
      out.put("schema", schemaId)
      respondText(ex, 200, out.toString, "application/json")
    } catch {
      // client-caused refusals (cold-storage range, hostile segment id)
      // are the reference's ClientError → 400 {'error': msg}; an
      // unknown schema id is a plain Exception there → 500
      case e: IllegalStateException => provisionClientError(ex, e)
      case e: IllegalArgumentException if !e.getMessage.contains("no such schema") =>
        provisionClientError(ex, e)
    }
  }

  private def provisionClientError(ex: HttpExchange, e: Throwable): Unit = {
    val out = mapper.createObjectNode()
    out.put("error", e.getMessage)
    respondText(ex, 400, out.toString, "application/json")
  }

  /** POST /promote — {'segment': id} in; the durable path out
    * (segment_manager.py:40-52). Requires a configured promote root. */
  private def promoteJson(ex: HttpExchange): Unit = {
    val node = mapper.readTree(body(ex))
    val segmentId = node.get("segment").asText()
    val root = promoteRoot.getOrElse(
      throw new IllegalStateException("no promote root configured for this facade"))
    val remote = engine.promote(segmentId, root)
    val out = mapper.createObjectNode()
    out.put("remote_path", remote)
    out.put("size", engine.store.segmentSizeBytes(segmentId))
    respondText(ex, 200, out.toString, "application/json")
  }

  /** Shared by PUT /schema/<id> and PUT /schema/<id>/sql: 201 created /
    * 204 updated / 400 `schema sql failed validation: …`
    * (segment_manager.py:96-114). */
  private def putSchema(ex: HttpExchange, id: String, sql: String): Unit = {
    val existed = engine.schemas.get(id).isDefined
    try {
      engine.schemas.put(id, sql)
      respond(ex, if (existed) 204 else 201, "text/plain", Array.empty)
    } catch {
      case e: SchemaRegistry#ValidationError =>
        respondText(ex, 400, s"schema sql failed validation: ${e.getMessage}")
    }
  }
}
