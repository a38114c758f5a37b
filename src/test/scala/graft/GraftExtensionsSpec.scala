package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds a second SparkSession over the shared SparkContext with
  * `GraftExtensions` injected and checks the native functions resolve
  * from SQL with no per-session register() call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injected at session build registers native functions") {
    val base = SparkTestSession.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions = the same injection path `spark.sql.extensions=
      // graft.GraftExtensions` uses (that static conf binds at
      // SparkContext creation, which this shared-context suite reuses).
      val withExt = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(withExt ne base) // a genuinely new session, extensions applied
      val row = withExt.sql(
        """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) d,
          |       size(minhash_signature(array(1L, 2L, 3L), 8)) k,
          |       size(shingle_hashes('a b c d', 2)) s,
          |       simhash64('a b c') h,
          |       size(winnow_fingerprints('a b c d e f g h i j', 4, 8)) w,
          |       md5_simhash60('a b c') m,
          |       size(winnow_fingerprints_md5('a b c d e f g h i j', 4, 8)) wm
          |""".stripMargin).collect()(0)
      assert(row.getDouble(0) == 11.0)
      assert(row.getInt(1) == 8)
      assert(row.getInt(2) == 3)
      assert(!row.isNullAt(3))
      assert(row.getInt(4) > 0)
      assert(row.getLong(5) >= 0L) // 60-bit md5 family is non-negative
      assert(row.getInt(6) > 0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
