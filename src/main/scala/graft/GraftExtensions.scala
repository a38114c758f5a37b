package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Md5SimHash60, Md5WinnowFingerprints, MinHashSignature, ShingleHashes, SimHash64, WinnowFingerprints}

/** Session-extensions entry point: registers the engine's native
  * Catalyst expressions at session build, so a cluster deployment can
  * enable them declaratively —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * — instead of calling [[graft.functions.VectorExpressions.register]]
  * per session. Trough's three reference UDFs (REGEXP,
  * SEEDCRAWLEDSTATUS, BUILDREDIRECTARRAY) remain per-session
  * registrations on the engine's read/write sessions
  * ([[graft.functions.TroughFunctions.register]]) because their
  * semantics are part of the trough API surface, not general SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", classOf[DotProduct]),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", classOf[MinHashSignature]),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_signature takes exactly 2 arguments")
        MinHashSignature(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", classOf[ShingleHashes]),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "shingle_hashes takes exactly 2 arguments")
        ShingleHashes(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", classOf[SimHash64]),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64 takes exactly 1 argument")
        SimHash64(exprs(0))
      }))
    extensions.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints", classOf[WinnowFingerprints]),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "winnow_fingerprints takes exactly 3 arguments")
        WinnowFingerprints(exprs(0), exprs(1), exprs(2))
      }))
    extensions.injectFunction((
      FunctionIdentifier("md5_simhash60"),
      info("md5_simhash60", classOf[Md5SimHash60]),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "md5_simhash60 takes exactly 1 argument")
        Md5SimHash60(exprs(0))
      }))
    extensions.injectFunction((
      FunctionIdentifier("winnow_fingerprints_md5"),
      info("winnow_fingerprints_md5", classOf[Md5WinnowFingerprints]),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "winnow_fingerprints_md5 takes exactly 3 arguments")
        Md5WinnowFingerprints(exprs(0), exprs(1), exprs(2))
      }))
  }
}
