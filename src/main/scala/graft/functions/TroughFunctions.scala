package graft.functions

import org.apache.spark.sql.SparkSession

/** The three scalar SQL functions trough registers on every SQLite
  * connection (reference: trough/sync.py:40-86). These are the only
  * engine-level functions trough itself contributes; everything else is
  * plain SQL delegated to the per-segment engine.
  *
  * Registered as Spark SQL functions with the same (case-insensitive)
  * names so reference queries run unchanged.
  */
object TroughFunctions {

  /** REGEXP(expr, item) — reference trough/sync.py:41-49.
    * Python `re.search` semantics: NULL item => false (not NULL!), and
    * the null check happens *before* pattern compilation, so
    * REGEXP('[', NULL) is false rather than an error; invalid pattern
    * with a non-null item => error propagates. Java regex `.find()` is
    * the `re.search` equivalent (unanchored). */
  def regexp(expr: String, item: String): Boolean = {
    if (item == null) return false
    compiled(expr).matcher(item).find() // bad pattern throws
  }

  // Per-thread last-pattern cache: the pattern is almost always a query
  // constant, and Python's re module memoizes compiles — without this the
  // port would recompile per row, dominating the predicate cost on scans.
  private val lastPattern =
    new ThreadLocal[(String, java.util.regex.Pattern)]()
  private def compiled(expr: String): java.util.regex.Pattern = {
    val cached = lastPattern.get()
    if (cached != null && cached._1 == expr) cached._2
    else {
      val p = java.util.regex.Pattern.compile(expr)
      lastPattern.set((expr, p))
      p
    }
  }

  /** SEEDCRAWLEDSTATUS(status_code) — reference trough/sync.py:52-70.
    * Maps crawler status codes to human-readable strings. The reference
    * coerces with Python int() catching only TypeError: NULL (int(None))
    * → 'Not crawled (None)'; a non-numeric *string* raises ValueError,
    * which propagates as a query error. */
  def seedCrawledStatus(statusCode: String): String = {
    if (statusCode == null) return "Not crawled (None)"
    val c =
      try statusCode.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"invalid literal for int() with base 10: '$statusCode'")
      }
    if (c >= 300 && c < 400) "Redirected"
    else if (c >= 400) s"Crawled (HTTP error $c)"
    else if (c > 0) "Crawled"
    else if (c == 0 || c == -5003 || c == -5004) "Not crawled (queued)"
    else if (c == -9998) "Not crawled (blocked by robots)"
    else s"Not crawled ($c)"
  }

  /** JSON string literal, Python-json.dumps-compatible (ensure_ascii). */
  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  /** BUILDREDIRECTARRAY(url, status, hop_path, json_list) — reference
    * trough/sync.py:72-82. Parses `json_list` (TEXT) as a JSON array of
    * null | {"seed":…, "status":…}, extends it with nulls when
    * len(hop_path) exceeds its length, sets element [hop_no-1] =
    * {seed: url, status: SEEDCRAWLEDSTATUS(status)} — with Python
    * negative-index semantics when hop_path is empty (index -1 = last
    * element; IndexError on an empty list) — and returns JSON text with
    * Python json.dumps separators (", " / ": ").
    */
  def buildRedirectArray(
      redirectUrl: String,
      redirectStatus: String,
      hopPath: String,
      jsonList: String): String = {
    val hopNo = if (hopPath == null) 0 else hopPath.length
    val existing: Array[(String, String)] = // (seed, status) or null slots
      if (jsonList == null || jsonList.isEmpty) Array.empty
      else parseRedirectArray(jsonList)
    val size = math.max(hopNo, existing.length)
    val out = Array.fill[(String, String)](size)(null)
    existing.copyToArray(out)
    val idx = if (hopNo - 1 >= 0) hopNo - 1 else size + (hopNo - 1) // Python negative index
    if (idx < 0 || idx >= size)
      throw new IndexOutOfBoundsException("list assignment index out of range")
    out(idx) = (redirectUrl, seedCrawledStatus(redirectStatus))
    out
      .map {
        case null => "null"
        case (seed, status) =>
          s"""{"seed": ${jsonStr(seed)}, "status": ${jsonStr(status)}}"""
      }
      .mkString("[", ", ", "]")
  }

  /** Minimal JSON-array parser for the shape BUILDREDIRECTARRAY itself
    * emits (null | {"seed": str, "status": str}), via Jackson (already on
    * the Spark classpath). */
  private def parseRedirectArray(json: String): Array[(String, String)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    require(node.isArray, s"BUILDREDIRECTARRAY: not a JSON array: $json")
    (0 until node.size()).map { i =>
      val e = node.get(i)
      if (e == null || e.isNull) null
      else (e.get("seed").asText(), e.get("status").asText())
    }.toArray
  }

  /** Register all three under their trough names (plus lowercase
    * convenience aliases are automatic — Spark function names are
    * case-insensitive). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("REGEXP", (expr: String, item: String) => regexp(expr, item))
    spark.udf.register("SEEDCRAWLEDSTATUS", (s: String) => seedCrawledStatus(s))
    spark.udf.register(
      "BUILDREDIRECTARRAY",
      (u: String, s: String, h: String, j: String) => buildRedirectArray(u, s, h, j))
  }
}
