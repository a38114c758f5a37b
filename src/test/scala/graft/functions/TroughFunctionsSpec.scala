package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Truth-table ports of the reference's three SQL functions
  * (trough/sync.py:40-86) — the behavioral contract every segment
  * connection in trough carries. */
class TroughFunctionsSpec extends AnyFunSuite {

  // ----------------------------------------------------------- REGEXP (A9)

  test("REGEXP: re.search semantics (unanchored substring match)") {
    assert(TroughFunctions.regexp("bc", "abcd"))
    assert(TroughFunctions.regexp("^a", "abcd"))
    assert(!TroughFunctions.regexp("^b", "abcd"))
    assert(TroughFunctions.regexp("[0-9]+", "seg123"))
  }

  test("REGEXP: NULL item => false, checked before pattern compilation") {
    assert(!TroughFunctions.regexp("anything", null))
    assert(!TroughFunctions.regexp("[", null)) // bad pattern + null item: no error
  }

  test("REGEXP: invalid pattern with non-null item raises") {
    intercept[Exception](TroughFunctions.regexp("[", "abc"))
  }

  test("REGEXP: never matches on empty pattern edge cases like python") {
    assert(TroughFunctions.regexp("", "abc")) // re.search('', x) always matches
  }

  // ------------------------------------------- SEEDCRAWLEDSTATUS (A10)

  test("SEEDCRAWLEDSTATUS truth table (sync.py:52-70)") {
    assert(TroughFunctions.seedCrawledStatus("300") == "Redirected")
    assert(TroughFunctions.seedCrawledStatus("399") == "Redirected")
    assert(TroughFunctions.seedCrawledStatus("400") == "Crawled (HTTP error 400)")
    assert(TroughFunctions.seedCrawledStatus("404") == "Crawled (HTTP error 404)")
    assert(TroughFunctions.seedCrawledStatus("200") == "Crawled")
    assert(TroughFunctions.seedCrawledStatus("1") == "Crawled")
    assert(TroughFunctions.seedCrawledStatus("0") == "Not crawled (queued)")
    assert(TroughFunctions.seedCrawledStatus("-5003") == "Not crawled (queued)")
    assert(TroughFunctions.seedCrawledStatus("-5004") == "Not crawled (queued)")
    assert(TroughFunctions.seedCrawledStatus("-9998") == "Not crawled (blocked by robots)")
    assert(TroughFunctions.seedCrawledStatus("-1") == "Not crawled (-1)")
    assert(TroughFunctions.seedCrawledStatus("-42") == "Not crawled (-42)")
  }

  test("SEEDCRAWLEDSTATUS: int(None) TypeError branch => 'Not crawled (None)'") {
    assert(TroughFunctions.seedCrawledStatus(null) == "Not crawled (None)")
  }

  test("SEEDCRAWLEDSTATUS: non-numeric string raises (ValueError uncaught in reference)") {
    intercept[IllegalArgumentException](TroughFunctions.seedCrawledStatus("abc"))
  }

  // ---------------------------------------------- BUILDREDIRECTARRAY (A11)

  test("BUILDREDIRECTARRAY: fresh list, hop 1") {
    val out = TroughFunctions.buildRedirectArray("http://x/", "301", "R", null)
    assert(out == """[{"seed": "http://x/", "status": "Redirected"}]""")
  }

  test("BUILDREDIRECTARRAY: extends with nulls to hop_path length") {
    val out = TroughFunctions.buildRedirectArray("http://x/", "200", "RRR", "[]")
    assert(out == """[null, null, {"seed": "http://x/", "status": "Crawled"}]""")
  }

  test("BUILDREDIRECTARRAY: overwrites slot, preserves others") {
    val prior = """[null, null, {"seed": "http://x/", "status": "Crawled"}]"""
    val out = TroughFunctions.buildRedirectArray("http://y/", "404", "RR", prior)
    assert(out == """[null, {"seed": "http://y/", "status": "Crawled (HTTP error 404)"}, """ +
      """{"seed": "http://x/", "status": "Crawled"}]""")
  }

  test("BUILDREDIRECTARRAY: empty hop_path = python index -1 (last element)") {
    val prior = """[{"seed": "http://a/", "status": "Crawled"}, null]"""
    val out = TroughFunctions.buildRedirectArray("http://z/", "302", "", prior)
    assert(out == """[{"seed": "http://a/", "status": "Crawled"}, """ +
      """{"seed": "http://z/", "status": "Redirected"}]""")
  }

  test("BUILDREDIRECTARRAY: empty hop_path on empty list raises (python IndexError)") {
    intercept[IndexOutOfBoundsException](
      TroughFunctions.buildRedirectArray("http://z/", "302", "", null))
  }

  test("BUILDREDIRECTARRAY: non-ascii escaped like json.dumps ensure_ascii") {
    val out = TroughFunctions.buildRedirectArray("http://x/é", "200", "R", null)
    assert(out == """[{"seed": "http://x/é", "status": "Crawled"}]""".replace("é", "\\u00e9"))
  }
}
