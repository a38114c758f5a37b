package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MinHashSignature, ShingleHashes, SimHash64}

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
  }
}
