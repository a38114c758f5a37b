package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** The md5-derived 60-bit hash family: the *differentially testable*
  * counterpart of the XXH64 family used by the default simhash/winnow
  * kernels.
  *
  * Why it exists: the DuckDB oracle cannot evaluate XXH64, so queries
  * built on that family can only be rows-checked. md5, however, is
  * available verbatim on both engines, and its first 15 hex digits
  * parse into an exact 60-bit non-negative long on both sides
  * (`list_sum(list_transform(range(1,16), i ->
  * (strpos('0123456789abcdef', substring(md5(t), i, 1))-1)::BIGINT <<
  * ((15-i)*4)))` in DuckDB SQL). Swapping the hash family changes
  * nothing about the operator logic under test — banding, window
  * minima, bucket joins are hash-agnostic — so the oracle-checked
  * md5 variants hard-verify the same code paths the XXH64 production
  * kernels run through.
  */
object Md5Hash60 {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(bytes[from, until)) as a 60-bit long —
    * digest bytes 0..6 in order plus the high nibble of byte 7, which
    * is exactly the hex-string prefix parse the oracle SQL performs. */
  def hash(bytes: Array[Byte], from: Int, until: Int): Long = {
    val md = tl.get()
    md.reset()
    md.update(bytes, from, until - from)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }
}

/** 60-bit SimHash over space-separated tokens with md5 token hashes —
  * the oracle-reproducible sibling of [[SimHash64]]. Token boundaries
  * are `split(text, ' ')` keeping empty tokens (= DuckDB
  * `string_split`); per bit b, the bit is set iff strictly more than
  * half the tokens have bit b set in their 60-bit md5 hash. */
case class Md5SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_simhash60 requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_simhash60"

  override def nullSafeEval(input: Any): Any =
    Md5SimHash60.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5SimHash60.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash60 =
    copy(child = newChild)
}

object Md5SimHash60 {
  def compute(bytes: Array[Byte]): Long = {
    val counts = new Array[Int](60)
    var start = 0
    var p = 0
    val len = bytes.length
    // token slices under split(' ') semantics, empties included — a
    // UTF-8 continuation byte is never 0x20, so byte-split == char-split
    while (p <= len) {
      if (p == len || bytes(p) == ' ') {
        val h = Md5Hash60.hash(bytes, start, p)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        start = p + 1
      }
      p += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** Winnowing fingerprints with md5 k-gram hashes — the
  * oracle-reproducible sibling of [[WinnowFingerprints]] (same token
  * boundaries, same window-minimum selection, same sorted-distinct
  * output; only the per-gram hash differs). */
case class Md5WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
        Seq(second, third).forall(e => e.foldable && e.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "winnow_fingerprints_md5 requires (string, foldable int k, foldable int w)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints_md5"

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val w: Int = third.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, kv: Any, wv: Any): Any =
    ArrayData.toArrayData(
      WinnowFingerprints.compute(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, k, w,
        md5Family = true))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _, _) => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.WinnowFingerprints.compute($text.getBytes(), $k, $w, true));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Md5WinnowFingerprints =
    copy(first = f, second = s, third = t)
}

object Md5Expressions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_simhash60",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "md5_simhash60 takes exactly 1 argument")
        Md5SimHash60(exprs(0))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints_md5",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "winnow_fingerprints_md5 takes exactly 3 arguments")
        Md5WinnowFingerprints(exprs(0), exprs(1), exprs(2))
      },
      "built-in")
  }
}
