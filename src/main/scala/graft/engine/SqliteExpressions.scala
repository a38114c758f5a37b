package graft.engine

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions backing the SQLite dialect layer.
  *
  * [[AsciiLower]] and [[SqliteDiv]] are the hot-path pair (every LIKE and
  * `/` in a read query routes through them — see
  * [[SqliteDialect.rewriteParsed]]) and are fully codegen'd; the rest are
  * CodegenFallback compat shims for function names that appear in
  * projections, never in tight scan loops.
  */

/** ASCII-only lowercase — SQLite's case-folding rule for LIKE
  * (`'ÄBC' LIKE 'äbc'` is FALSE in SQLite; a Unicode lower() would make
  * it true). Only bytes A-Z change; UTF-8 multibyte sequences are ≥ 0x80
  * and pass through untouched. */
case class AsciiLower(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ascii_lower requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_lower"

  override def nullSafeEval(v: Any): Any =
    AsciiLower.lower(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.engine.AsciiLower.lower($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiLower =
    copy(child = newChild)
}

/** Marker for an explicit `COLLATE BINARY` operator: SQLite's rule 1
  * (datatype3.html §7.1) lets it override a column-DECLARED collation,
  * so the textual COLLATE rewrite can't simply drop the clause — a
  * NOCASE column under an explicit BINARY would otherwise fold anyway.
  * [[SqliteCollation]] treats a marked operand as collation-free and
  * strips every marker in the same pass, so nothing survives to
  * execution (the passthrough eval below is a safety net only). */
case class CollateBinary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "collate_binary"
  override def nullSafeEval(v: Any): Any = v
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): CollateBinary =
    copy(child = newChild)
}

object AsciiLower {
  def lower(s: UTF8String): UTF8String = {
    val b = s.getBytes.clone() // getBytes may expose the internal array
    var i = 0
    var changed = false
    while (i < b.length) {
      if (b(i) >= 'A' && b(i) <= 'Z') { b(i) = (b(i) + 32).toByte; changed = true }
      i += 1
    }
    if (changed) UTF8String.fromBytes(b) else s
  }
}

/** SQLite `/`: INTEGER (64-bit, truncating toward zero — Java long
  * division) when both operands are integral, REAL otherwise; division
  * by zero yields NULL in both modes (SQLite returns NULL, Spark's ANSI
  * mode would throw and non-ANSI Divide is always REAL). Strings coerce
  * to REAL via the NumericType implicit cast (SQLite numeric affinity). */
case class SqliteDiv(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case _: NumericType | StringType | NullType | BooleanType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sqlite_div requires numeric or string operands, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def prettyName: String = "sqlite_div"
  override def nullable: Boolean = true

  private def isIntegral(dt: DataType): Boolean = dt match {
    // SQLite stores booleans as the integers 0/1 — integer affinity;
    // a NULL literal divides as whatever the other operand is (the
    // answer is NULL either way, but the STORAGE CLASS of the overall
    // expression must not widen to REAL through e.g. coalesce)
    case ByteType | ShortType | IntegerType | LongType | BooleanType | NullType => true
    case _ => false
  }
  private lazy val integral = isIntegral(left.dataType) && isIntegral(right.dataType)

  override def dataType: DataType = if (integral) LongType else DoubleType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    if (integral) {
      val rv = SqliteDiv.anyToLong(r)
      if (rv == 0L) null else SqliteDiv.anyToLong(l) / rv
    } else {
      val rv = toDouble(r)
      if (rv == 0.0) null else toDouble(l) / rv
    }
  }

  private def toDouble(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case b: Boolean => if (b) 1.0 else 0.0
    case n: Number => n.doubleValue()
    case other => SqliteDiv.strToDouble(other.toString)
  }

  private def javaDouble(value: String, dt: DataType): String = dt match {
    case _: DecimalType => s"$value.toDouble()"
    case StringType => s"graft.engine.SqliteDiv.strToDouble($value.toString())"
    case BooleanType => s"($value ? 1.0 : 0.0)"
    case NullType => "0.0" // dead code behind the isNull guard
    case _ => s"(double)($value)"
  }

  private def javaLong(value: String, dt: DataType): String = dt match {
    case BooleanType => s"($value ? 1L : 0L)"
    case NullType => "0L" // dead code behind the isNull guard
    case _ => s"(long)($value)"
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val javaType = if (integral) "long" else "double"
    val divisor = ctx.freshName("divisor")
    val compute =
      if (integral)
        s"""
           |long $divisor = ${javaLong(rightGen.value.toString, right.dataType)};
           |if ($divisor != 0L) {
           |  ${ev.isNull} = false;
           |  ${ev.value} = ${javaLong(leftGen.value.toString, left.dataType)} / $divisor;
           |}
         """.stripMargin
      else
        s"""
           |double $divisor = ${javaDouble(rightGen.value.toString, right.dataType)};
           |if ($divisor != 0.0) {
           |  ${ev.isNull} = false;
           |  ${ev.value} = ${javaDouble(leftGen.value.toString, left.dataType)} / $divisor;
           |}
         """.stripMargin
    ev.copy(code = code"""
      |${leftGen.code}
      |boolean ${ev.isNull} = true;
      |$javaType ${ev.value} = ${if (integral) "0L" else "0.0"};
      |if (!${leftGen.isNull}) {
      |  ${rightGen.code}
      |  if (!${rightGen.isNull}) {
      |    $compute
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteDiv =
    copy(left = newLeft, right = newRight)
}

object SqliteDiv {
  /** SQLite numeric affinity for text: the longest numeric prefix, or 0
    * when there is none (`'abc'/2` is 0 in SQLite, not an error). */
  def strToDouble(s: String): Double = {
    val m = "^\\s*[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?".r.findFirstIn(s)
    m.map(_.trim.toDouble).getOrElse(0.0)
  }

  /** SQLite CAST-to-INTEGER of any runtime value: truncate reals toward
    * zero, numeric-prefix text, booleans as 0/1. */
  def anyToLong(v: Any): Long = v match {
    case b: Boolean => if (b) 1L else 0L
    case d: Decimal => d.toDouble.toLong
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case f: Float => f.toLong
    case d: Double => d.toLong
    case other => strToDouble(other.toString).toLong
  }
}

/** SQLite `%`: both operands CAST to INTEGER (reals truncate toward
  * zero, text takes its numeric prefix — so `7.5 % 2` computes `7 % 2`)
  * and mod-by-zero yields NULL (Spark's ANSI Remainder throws
  * DIVIDE_BY_ZERO, and its non-ANSI form keeps fractional operands).
  * The result TYPE follows operand affinity like SQLite (golden:
  * `7.5 % 2 = 1.0`, `'5.7' % 3 = 2.0` — REAL when either operand is
  * non-integral, INTEGER otherwise); the VALUE is always the integer
  * remainder, sign following the dividend (C semantics, shared by
  * Java). */
case class SqliteMod(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case _: NumericType | StringType | NullType | BooleanType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sqlite_mod requires numeric or string operands, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def prettyName: String = "sqlite_mod"
  override def nullable: Boolean = true

  /** SQLite's affinity for `%` is per-VALUE at runtime; a static type
    * can honor it exactly for integral types and for foldable text
    * (golden: '8' % 3 = 2 integer, '8.0' % 3 = 2.0 real, 'abc' % 2 = 0
    * integer). Non-foldable text columns stay REAL — documented static-
    * typing deviation (same class as the json typed-extract one). */
  private def integralLike(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType | NullType => true
    case StringType if e.foldable =>
      val v = e.eval()
      v != null && SqliteMod.integerAffinityText(v.toString)
    case _ => false
  }
  private lazy val integral = integralLike(left) && integralLike(right)

  override def dataType: DataType = if (integral) LongType else DoubleType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val rv = SqliteDiv.anyToLong(r)
    if (rv == 0L) null
    else {
      val m = SqliteDiv.anyToLong(l) % rv
      if (integral) m else m.toDouble
    }
  }

  private def javaLong(value: String, dt: DataType): String = dt match {
    case BooleanType => s"($value ? 1L : 0L)"
    case _: DecimalType => s"(long)($value.toDouble())"
    case StringType => s"(long)graft.engine.SqliteDiv.strToDouble($value.toString())"
    case _ => s"(long)($value)"
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val divisor = ctx.freshName("divisor")
    val javaType = if (integral) "long" else "double"
    val resultCast = if (integral) "" else "(double)"
    ev.copy(code = code"""
      |${leftGen.code}
      |boolean ${ev.isNull} = true;
      |$javaType ${ev.value} = ${if (integral) "0L" else "0.0"};
      |if (!${leftGen.isNull}) {
      |  ${rightGen.code}
      |  if (!${rightGen.isNull}) {
      |    long $divisor = ${javaLong(rightGen.value.toString, right.dataType)};
      |    if ($divisor != 0L) {
      |      ${ev.isNull} = false;
      |      ${ev.value} = $resultCast(${javaLong(leftGen.value.toString, left.dataType)} % $divisor);
      |    }
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteMod =
    copy(left = newLeft, right = newRight)
}

object SqliteMod {
  /** SQLite text numeric affinity: the longest numeric prefix decides —
    * no prefix or an integral prefix ('abc' → 0, '8', '8x', ' 12 ') is
    * INTEGER; a fractional/exponent prefix ('8.0', '5.7', '1e3') is
    * REAL. */
  def integerAffinityText(s: String): Boolean = {
    val m = "^\\s*[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?".r.findFirstIn(s)
    m match {
      case None => true
      case Some(p) => !p.contains('.') && !p.toLowerCase(java.util.Locale.ROOT).contains('e')
    }
  }
}

/** SQLite `typeof(x)`: 'null' | 'integer' | 'real' | 'text' | 'blob',
  * decided by the column's static type + runtime null check (SQLite is
  * dynamically typed per value; Spark columns are statically typed, so
  * the static type IS the value type). */
case class SqliteTypeOf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "typeof"

  private lazy val typeName: String = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => "integer"
    case FloatType | DoubleType | _: DecimalType => "real"
    case BinaryType => "blob"
    case NullType => "null"
    case _ => "text"
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    UTF8String.fromString(if (v == null) "null" else typeName)
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteTypeOf =
    copy(child = newChild)
}

/** SQLite's REAL→text rendering, shared by quote(), CAST … AS TEXT,
  * json, group_concat and the `||` operands: `%!.15g` — the EXACT
  * binary value rounded to 15 significant digits (probed: sqlite3
  * renders `CAST(1.0/3.0 AS TEXT)` as `0.333333333333333`, NOT the
  * 17-digit shortest round-trip form; a query-fuzz catch — the old
  * shortest-digits rendering diverged on every avg()), trailing zeros
  * dropped, presented C-style — fixed notation for decimal exponents
  * in [-4, 15), otherwise `d.ddde±XX` with a signed ≥2-digit exponent
  * and a mantissa that always shows a decimal point; zero renders
  * `0.0` (also for -0.0, probed), infinities as SQLite's `9.0e+999`
  * sentinel. sqlite3FpDecode's digits are accurate far past position
  * 15, so rounding the exact expansion matches it here (fuzz-verified);
  * see [[quoteText]] for the one place its approximation shows. */
object SqliteReal {
  def text(d: Double): String = {
    if (d.isNaN) return "NULL" // unreachable from SQLite-sourced values
    if (d.isInfinite) return if (d > 0) "9.0e+999" else "-9.0e+999"
    if (d == 0.0) return "0.0"
    render(d, 15, java.math.RoundingMode.HALF_UP)
  }

  /** SQLite `quote()` of a REAL (public algorithm, sqlite/src/func.c
    * quoteFunc): render `%!.15g`; if that text does not parse back to
    * the identical double, re-render in scientific notation with
    * sqlite3FpDecode's ~19 significant digits so the literal
    * round-trips. DOCUMENTED DEVIATION: sqlite's decoder computes
    * those digits with double-double arithmetic whose LAST digit is
    * occasionally one off the exact expansion (probed: quote(1.0/7.0)
    * answers …493e-01 where the exact value truncates to …492); this
    * renders the exact expansion truncated at 19, so the final digit
    * can differ from sqlite3 on non-round-trip values. Differential
    * suites compare such values through CAST(… AS TEXT) (full parity)
    * instead. */
  def quoteText(d: Double): String = {
    if (d.isNaN) return "NULL"
    if (d.isInfinite) return if (d > 0) "9.0e+999" else "-9.0e+999"
    if (d == 0.0) return "0.0"
    val t = text(d)
    if (java.lang.Double.parseDouble(t) == d) t
    else {
      val digits19 = render(d, 19, java.math.RoundingMode.DOWN)
      // force scientific presentation regardless of exponent
      if (digits19.contains('e')) digits19
      else {
        val bd = new java.math.BigDecimal(math.abs(d))
          .round(new java.math.MathContext(19, java.math.RoundingMode.DOWN))
          .stripTrailingZeros()
        sci(d < 0, bd)
      }
    }
  }

  private def render(d: Double, sig: Int,
      mode: java.math.RoundingMode): String = {
    val neg = d < 0
    val bd = new java.math.BigDecimal(math.abs(d))
      .round(new java.math.MathContext(sig, mode))
      .stripTrailingZeros()
    val digits = bd.unscaledValue().abs().toString
    val exp = bd.precision() - 1 - bd.scale()
    val sign = if (neg) "-" else ""
    if (exp < -4 || exp >= 15) sci(neg, bd)
    else if (exp >= 0) {
      if (digits.length > exp + 1)
        s"$sign${digits.substring(0, exp + 1)}.${digits.substring(exp + 1)}"
      else
        sign + digits + "0" * (exp + 1 - digits.length) + ".0"
    } else {
      s"${sign}0." + "0" * (-exp - 1) + digits
    }
  }

  private def sci(neg: Boolean, bd: java.math.BigDecimal): String = {
    val digits = bd.unscaledValue().abs().toString
    val exp = bd.precision() - 1 - bd.scale()
    val m =
      if (digits.length == 1) digits + ".0"
      else digits.substring(0, 1) + "." + digits.substring(1)
    val es = (if (exp < 0) "-" else "+") + f"${math.abs(exp)}%02d"
    s"${if (neg) "-" else ""}${m}e$es"
  }
}

/** The SQLite text rendering of a `||` operand: numbers render via
  * [[SqliteReal]]/toString, strings and blobs pass through unchanged
  * (blob || blob stays a blob concat). Inserted around Concat children
  * by the dialect rewrite — Spark's implicit Cast(double → string)
  * would render Java-style (`2.5E15` for SQLite's `2.5e+15`). */
case class SqliteTextValue(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType match {
    case BinaryType => BinaryType
    case _ => StringType
  }
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sqlite_text_value"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v match {
      case null => null
      case u: UTF8String => u
      case b: Array[Byte] => b
      case d: java.lang.Double => UTF8String.fromString(SqliteReal.text(d))
      case f: java.lang.Float => UTF8String.fromString(SqliteReal.text(f.doubleValue()))
      case d: org.apache.spark.sql.types.Decimal =>
        UTF8String.fromString(SqliteReal.text(d.toDouble))
      case b: java.lang.Boolean => UTF8String.fromString(if (b) "1" else "0")
      case other => UTF8String.fromString(other.toString)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): SqliteTextValue =
    copy(child = newChild)
}

/** SQLite `quote(x)`: render a value as an SQL literal — strings get
  * single quotes with `''` doubling, blobs render `X'HEX'`, NULL renders
  * the string 'NULL', numbers render bare. */
case class SqliteQuote(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "quote"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val s = v match {
      case null => "NULL"
      case u: UTF8String => "'" + u.toString.replace("'", "''") + "'"
      case b: Array[Byte] =>
        b.map(x => f"${x & 0xff}%02X").mkString("X'", "", "'")
      case b: Boolean => if (b) "1" else "0"
      case d: java.lang.Double => SqliteReal.quoteText(d)
      case f: java.lang.Float => SqliteReal.quoteText(f.doubleValue())
      case other => other.toString
    }
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteQuote =
    copy(child = newChild)
}

/** SQLite `substr(X, Y[, Z])` (lang_corefunc.html): 1-based Y, with
  * negative Y counting from the end, Y=0 sitting one before the first
  * character (consuming one of Z), and NEGATIVE Z meaning "the |Z|
  * characters PRECEDING position Y" — `substr('abc', 0, 2)` is 'a',
  * `substr('abc', -1)` is 'c', and an out-of-range start with negative
  * length can reach back over the whole string. Spark's `substring`
  * answers '' for every negative length. Follows the public substrFunc
  * clamping order (sqlite/src/func.c), fuzz-verified differentially. */
case class SqliteSubstr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "substr"

  override def eval(input: InternalRow): Any = {
    val sv = children(0).eval(input)
    if (sv == null) return null
    val yv = children(1).eval(input)
    if (yv == null) return null
    val s = sv.asInstanceOf[UTF8String].toString
    val len = s.length.toLong
    var p1 = yv.asInstanceOf[Number].longValue()
    // 2-arg substr defaults the length to SQLITE_LIMIT_LENGTH (a huge
    // constant), NOT len+1: after the negative-start adjustment below the
    // default must survive `p2 += p1` so substr('Xa#', -522) clamps to the
    // start and yields the whole string (sqlite substrFunc, lang_corefunc).
    var p2 =
      if (children.length < 3) Int.MaxValue.toLong
      else {
        val zv = children(2).eval(input)
        if (zv == null) return null
        zv.asInstanceOf[Number].longValue()
      }
    if (p1 < 0) {
      p1 += len
      if (p1 < 0) {
        p2 += p1
        if (p2 < 0) p2 = 0
        p1 = 0
      }
    } else if (p1 > 0) p1 -= 1
    else if (p2 > 0) p2 -= 1
    if (p2 < 0) {
      if (p2 < -p1) p2 = p1 else p2 = -p2
      p1 -= p2
    }
    val start = math.min(p1, len).toInt
    // clamp p2 to len before adding so the huge 2-arg default can't overflow
    val end = math.min(start + math.min(math.max(p2, 0L), len), len).toInt
    UTF8String.fromString(if (start >= end) "" else s.substring(start, end))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteSubstr =
    copy(children = newChildren)
}

/** SQLite `abs(X)` (lang_corefunc.html, absFunc in func.c): dispatches
  * on the argument's STORAGE CLASS — INTEGER stays INTEGER, NULL stays
  * NULL, and everything else (REAL, TEXT, BLOB) converts to REAL
  * (`abs('5')` is 5.0, `abs('abc')` is 0.0; probed). Spark's `Abs`
  * instead lets type coercion cast a NullType operand to DOUBLE, which
  * widens the storage class of every enclosing integral expression
  * (`coalesce(abs(NULL) % x, 387)` must render 387, not 387.0) — so the
  * static type here treats NullType as integral, mirroring [[SqliteDiv]].
  * Deviation: SQLite raises "integer overflow" on abs(-2^63); we return
  * the two's-complement value. */
case class SqliteAbs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def integral = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType | NullType => true
    case _ => false
  }
  override def dataType: DataType = if (integral) LongType else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "abs"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else if (integral) math.abs(SqliteDiv.anyToLong(v))
    else v match {
      case d: Decimal => math.abs(d.toDouble)
      case n: Number => math.abs(n.doubleValue())
      case other => math.abs(SqliteDiv.strToDouble(other.toString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteAbs =
    copy(child = newChild)
}

/** SQLite `sign(X)` (lang_corefunc.html): -1/0/+1 as an INTEGER for
  * numeric arguments; NULL for NULL and for every non-numeric storage
  * class — even numeric-looking TEXT (`sign('3x')` and `sign('5')` are
  * both NULL; probed). Spark's `signum` returns DOUBLE and coerces
  * text, so both the storage class and the domain diverge. */
case class SqliteSign(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sign"

  override def eval(input: InternalRow): Any = child.dataType match {
    case _: org.apache.spark.sql.types.NumericType =>
      val v = child.eval(input)
      if (v == null) null
      else {
        val d = v match {
          case n: Number => n.doubleValue()
          case d: Decimal => d.toDouble
        }
        if (d > 0) 1L else if (d < 0) -1L else 0L
      }
    case BooleanType =>
      val v = child.eval(input)
      if (v == null) null else if (v.asInstanceOf[Boolean]) 1L else 0L
    case _ => null // TEXT/BLOB/NULL storage classes
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteSign =
    copy(child = newChild)
}

/** SQLite `hex(X)` (lang_corefunc.html): the argument is interpreted
  * as a BLOB — non-blob values render to their TEXT form first — and
  * the answer is its uppercase hex, with NULL mapping to the EMPTY
  * string (`hex(NULL)` = '', `hex(123)` = '313233'; probed). Spark's
  * `hex` instead hexes the numeric VALUE and answers NULL for NULL. */
case class SqliteHex(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "hex"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val bytes: Array[Byte] = v match {
      case null => Array.emptyByteArray
      case b: Array[Byte] => b
      case u: UTF8String => u.getBytes
      case b: java.lang.Boolean => (if (b) "1" else "0").getBytes("UTF-8")
      case other => other.toString.getBytes("UTF-8")
    }
    UTF8String.fromString(bytes.map(x => f"${x & 0xff}%02X").mkString)
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteHex =
    copy(child = newChild)
}

/** SQLite `json_array(...)` / `json_object(k,v,...)`: render values with
  * their own runtime types. A variadic expression holding the raw
  * arguments — carrying them through CreateArray would let the analyzer
  * coerce them to a common type, and `json_array(1,'a')` must stay
  * `[1,"a"]`. */
case class SqliteJsonRender(children: Seq[Expression], obj: Boolean)
    extends Expression with CodegenFallback {
  private def args: Seq[Expression] = children

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = if (obj) "json_object" else "json_array"

  private def render(v: Any): String = v match {
    case null => "null"
    case u: UTF8String => jsonStr(u.toString)
    case b: Boolean => if (b) "1" else "0" // SQLite has no json booleans from SQL
    case d: Decimal => d.toBigDecimal.bigDecimal.toPlainString
    case other => other.toString
  }

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  override def eval(input: InternalRow): Any = {
    val vals = args.map(_.eval(input))
    val s =
      if (obj) vals.grouped(2).map { case Seq(k, v) =>
        require(k != null, "json_object labels must not be NULL")
        jsonStr(k.toString) + ":" + render(v)
      }.mkString("{", ",", "}")
      else vals.map(render).mkString("[", ",", "]")
    UTF8String.fromString(s)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteJsonRender =
    copy(children = newChildren)
}

/** Variadic SQLite date/time family under one expression: `datetime`,
  * `date`, `time`, `julianday`, `strftime` — a UDF registration can't
  * dispatch on arity and SQLite's modifiers are trailing varargs.
  * CodegenFallback: compat shims for client literals and projections,
  * never a hot scan path. NULL anywhere (input, format, modifier) or an
  * unparseable timevalue yields NULL, matching sqlite3 (golden-tested). */
case class SqliteTimeExpr(mode: SqliteTimeExpr.Mode, children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType =
    if (mode == SqliteTimeExpr.Julianday) DoubleType else StringType
  override def nullable: Boolean = true
  override def prettyName: String = mode.name

  override def checkInputDataTypes(): TypeCheckResult = {
    val minArity = if (mode == SqliteTimeExpr.Strftime) 2 else 1
    if (children.length >= minArity) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${mode.name} requires at least $minArity argument(s)")
  }

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val strs = vals.map(_.toString)
    mode match {
      case SqliteTimeExpr.Datetime =>
        Option(SqliteCompat.datetimeCompat(strs.head, strs.tail))
          .map(UTF8String.fromString).orNull
      case SqliteTimeExpr.Date =>
        Option(SqliteCompat.dateCompat(strs.head, strs.tail))
          .map(UTF8String.fromString).orNull
      case SqliteTimeExpr.Time =>
        Option(SqliteCompat.timeCompat(strs.head, strs.tail))
          .map(UTF8String.fromString).orNull
      case SqliteTimeExpr.Julianday =>
        val d = SqliteCompat.juliandayCompat(strs.head, strs.tail)
        if (d == null) null else d.doubleValue()
      case SqliteTimeExpr.Strftime =>
        Option(SqliteCompat.strftimeCompat(strs.head, strs(1), strs.drop(2)))
          .map(UTF8String.fromString).orNull
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteTimeExpr =
    copy(children = newChildren)
}

object SqliteTimeExpr {
  sealed abstract class Mode(val name: String)
  case object Datetime extends Mode("datetime")
  case object Date extends Mode("date")
  case object Time extends Mode("time")
  case object Julianday extends Mode("julianday")
  case object Strftime extends Mode("strftime")
}

/** SQLite `char(X1,...,XN)`: a string from unicode CODE POINTS
  * (sqlite.org/lang_corefunc.html#char) — Spark's `chr` truncates to a
  * single byte-range value, so the multi-argument codepoint form needs
  * its own expression. NULL/invalid arguments contribute nothing,
  * matching sqlite3 (char() of no valid args is the empty string). */
case class SqliteChar(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "char"

  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder
    var halted = false
    children.foreach { c =>
      if (!halted) c.eval(input) match {
        case null => halted = true // sqlite3: a NULL argument ENDS the string
        case v =>
          val cp = v match {
            case dec: org.apache.spark.sql.types.Decimal => dec.toLong
            case n: Number => n.longValue()
            case _ => -1L
          }
          if (cp >= Character.MIN_CODE_POINT && cp <= Character.MAX_CODE_POINT)
            sb.appendCodePoint(cp.toInt)
          else sb.append('\uFFFD') // invalid code point → replacement char
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteChar = copy(children = newChildren)
}

/** SQLite `unicode(X)`: the code point of the FIRST character — full
  * codepoint even above the BMP (Spark's `ascii` would return the high
  * surrogate for supplementary characters). NULL/empty → NULL, as
  * sqlite3 answers. */
case class SqliteUnicode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "unicode"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.isEmpty) null else s.codePointAt(0).toLong
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteUnicode =
    copy(child = newChild)
}

/** SQLite `floor`/`ceil`/`ceiling`/`trunc` (lang_mathfunc.html): unlike
  * Spark's always-LONG floor/ceil (and date-typed trunc), SQLite
  * PRESERVES the argument's storage class — an INTEGER input passes
  * through as INTEGER, a REAL input yields an integral-valued REAL
  * (`floor(2.7)` = `2.0`, `floor(5)` = `5`). `mode` ∈ floor|ceil|trunc
  * (trunc rounds toward zero). */
case class SqliteRound(child: Expression, mode: String)
    extends UnaryExpression with CodegenFallback {
  private lazy val integral = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => true
    case _ => false
  }
  override def dataType: DataType = if (integral) LongType else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = mode

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else if (integral) v.asInstanceOf[Number].longValue()
    else {
      val d = v match { // decimal literals parse as Decimal, not Number
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case n: Number => n.doubleValue()
        case other => other.toString.toDouble
      }
      val r = mode match {
        case "floor" => math.floor(d)
        case "ceil" => math.ceil(d)
        case _ => if (d >= 0) math.floor(d) else math.ceil(d) // trunc
      }
      if (r == 0.0) 0.0 else r // sqlite3 renders no negative zero
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteRound =
    copy(child = newChild)
}

/** Decimal→double pass-through for variadic java-format args: Spark
  * parses `1.5` as a Decimal literal, which `String.format`'s %f/%e
  * verbs reject. Resolves lazily, so it wraps unresolved args safely;
  * non-decimal children flow through typed unchanged. */
case class DecimalNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override lazy val dataType: DataType = child.dataType match {
    case _: DecimalType => DoubleType
    case t => t
  }
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input) match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case v => v
  }
  override protected def withNewChildInternal(newChild: Expression): DecimalNormalize =
    copy(child = newChild)
}

/** SQLite's json1 member operators (sqlite.org/json1.html §operators):
  * `j -> path` answers the JSON representation of the selected node
  * (strings stay quoted, JSON null is the text 'null'); `j ->> path`
  * answers the SQL value (strings unquoted, true/false as 1/0, JSON
  * null as SQL NULL; objects/arrays stay JSON text). Paths accept the
  * full `$`-form (`$.a."quoted key"[2]`) plus the operator shorthands —
  * a bare key or a bare array index. Documented deviations, matching
  * the engine-wide `json_extract` contract: scalars come back with
  * TEXT affinity (SQLite types them), and malformed JSON answers NULL
  * where SQLite raises. */
case class SqliteJsonArrow(json: Expression, path: Expression, sqlValue: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (sqlValue) "json_arrow_text" else "json_arrow"

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def eval(input: InternalRow): Any = {
    val j = json.eval(input)
    val p = path.eval(input)
    if (j == null || p == null) return null
    val node =
      try mapper.readTree(j.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => return null }
    val steps = SqliteJsonArrow.parsePath(p match {
      case s: UTF8String => s.toString
      case n: Number => n.longValue().toString
      case other => other.toString
    })
    if (steps == null) return null
    var cur = node
    steps.foreach {
      case Left(key) =>
        if (cur == null || !cur.isObject) return null
        cur = cur.get(key) // null when absent
      case Right(idx) =>
        if (cur == null || !cur.isArray || idx < 0 || idx >= cur.size()) return null
        cur = cur.get(idx)
    }
    if (cur == null) return null
    if (!sqlValue) UTF8String.fromString(mapper.writeValueAsString(cur))
    else if (cur.isNull) null
    else if (cur.isTextual) UTF8String.fromString(cur.asText())
    else if (cur.isBoolean) UTF8String.fromString(if (cur.asBoolean()) "1" else "0")
    else if (cur.isNumber) UTF8String.fromString(cur.numberValue().toString)
    else UTF8String.fromString(mapper.writeValueAsString(cur))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteJsonArrow =
    copy(json = newLeft, path = newRight)
}

object SqliteJsonArrow {
  /** `$`-path → object-key / array-index steps; the operator shorthands
    * (bare key, bare integer index) normalize first. `null` = bad path. */
  private[engine] def parsePath(raw: String): Seq[Either[String, Int]] = {
    val p = raw.trim
    val full =
      if (p.startsWith("$")) p
      else if (p.matches("[-+]?\\d+")) s"$$[$p]" // bare index shorthand
      else s"$$.$p" // bare key shorthand
    val steps = Seq.newBuilder[Either[String, Int]]
    var i = 1 // past '$'
    while (i < full.length) {
      full.charAt(i) match {
        case '.' =>
          i += 1
          if (i >= full.length) return null
          if (full.charAt(i) == '"') {
            val close = full.indexOf('"', i + 1)
            if (close < 0) return null
            steps += Left(full.substring(i + 1, close))
            i = close + 1
          } else {
            val start = i
            while (i < full.length && full.charAt(i) != '.' && full.charAt(i) != '[') i += 1
            if (i == start) return null
            steps += Left(full.substring(start, i))
          }
        case '[' =>
          val close = full.indexOf(']', i)
          if (close < 0) return null
          val idx = full.substring(i + 1, close).trim
          if (!idx.matches("\\d+")) return null // [#-n] from-end form unsupported
          steps += Right(idx.toInt)
          i = close + 1
        case _ => return null
      }
    }
    steps.result()
  }
}

/** SQLite CAST semantics (datatype3.html §4 "CAST expressions"): the
  * target is an AFFINITY, and text→numeric conversion parses the
  * LONGEST NUMERIC PREFIX, defaulting to 0 — `CAST('12abc' AS
  * INTEGER)` is 12 and `CAST('abc' AS INTEGER)` is 0 where Spark's
  * cast answers NULL. INTEGER is 64-bit with out-of-range reals
  * CLAMPED to ±2^63-1 (Spark's INT is 32-bit and overflow is
  * NULL/error); reals truncate toward zero. NUMERIC maps to real here
  * (static typing can't express SQLite's integer-when-lossless rule —
  * documented deviation, `CAST('5' AS NUMERIC)` is 5.0 not 5). */
case class SqliteCast(child: Expression, affinity: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = affinity match {
    case "integer" => LongType
    case "real" => DoubleType
    case "blob" => BinaryType
    case _ => StringType
  }
  override def nullable: Boolean = child.nullable
  override def prettyName: String = s"sqlite_cast_$affinity"

  private def asText(v: Any): String = v match {
    case u: UTF8String => u.toString
    case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case b: Boolean => if (b) "1" else "0"
    case d: java.lang.Double => SqliteReal.text(d)
    case f: java.lang.Float => SqliteReal.text(f.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => SqliteReal.text(d.toDouble)
    case other => other.toString
  }

  // date/timestamp children arrive as Spark's INTERNAL encodings (days /
  // micros since epoch); SQLite knows only their TEXT form, so they
  // normalize to it before any affinity rule applies
  private lazy val childIsDate = child.dataType == DateType
  private lazy val childIsTimestamp = child.dataType == TimestampType ||
    child.dataType == TimestampNTZType
  private def temporalText(v: Any): String =
    if (childIsDate)
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()).toString
    else {
      val micros = v.asInstanceOf[Number].longValue()
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
        f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      if (ldt.getNano == 0) base
      else base + "." + f"${ldt.getNano / 1000}%06d".reverse.dropWhile(_ == '0').reverse
    }

  private val intPrefixRe = "^\\s*([-+]?\\d+)".r
  private val realPrefixRe = "^\\s*([-+]?(?:\\d+\\.?\\d*|\\.\\d+)(?:[eE][-+]?\\d+)?)".r

  private def clampToLong(d: Double): Long =
    if (d.isNaN) 0L
    else if (d >= Long.MaxValue.toDouble) Long.MaxValue
    else if (d <= Long.MinValue.toDouble) Long.MinValue
    else d.toLong // truncates toward zero

  private def textToLong(s: String): Long =
    intPrefixRe.findFirstMatchIn(s).map { m =>
      val digits = m.group(1)
      try digits.toLong
      catch { // out-of-range integer literal clamps like a real would
        case _: NumberFormatException =>
          if (digits.trim.startsWith("-")) Long.MinValue else Long.MaxValue
      }
    }.getOrElse(0L)

  private def textToDouble(s: String): Double =
    realPrefixRe.findFirstMatchIn(s).map(_.group(1).toDouble).getOrElse(0.0)

  override def eval(input: InternalRow): Any = {
    val v0 = child.eval(input)
    if (v0 == null) return null
    val v: Any =
      if (childIsDate || childIsTimestamp) UTF8String.fromString(temporalText(v0))
      else v0
    affinity match {
      case "integer" => v match {
        case n: java.lang.Long => n.longValue()
        case n: java.lang.Integer => n.longValue()
        case n: java.lang.Short => n.longValue()
        case n: java.lang.Byte => n.longValue()
        case b: java.lang.Boolean => if (b) 1L else 0L
        case d: java.lang.Double => clampToLong(d)
        case f: java.lang.Float => clampToLong(f.doubleValue())
        case d: org.apache.spark.sql.types.Decimal => clampToLong(d.toDouble)
        case other => textToLong(asText(other))
      }
      case "real" => v match {
        case n: Number => n.doubleValue()
        case b: java.lang.Boolean => if (b) 1.0 else 0.0
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => textToDouble(asText(other))
      }
      case "blob" => v match {
        case b: Array[Byte] => b
        case other => asText(other).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      case _ => UTF8String.fromString(asText(v))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SqliteCast =
    copy(child = newChild)
}

/** Shared helpers for the json1 function family: SQL value → JSON node
  * encoding and the `$`-path step machinery (reusing the arrow
  * operators' parser). */
private[engine] object SqliteJsonOps {
  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  // FAIL_ON_TRAILING_TOKENS: SQLite's json parser consumes the WHOLE
  // text — `json_valid('0 a%1')` is 0 (fuzz-caught; Jackson's default
  // stops at the first complete value and ignores the garbage tail)
  val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    .enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  /** Encode an evaluated SQL value as a JSON node — numbers stay
    * numbers, strings become JSON strings (json1's rule: pass text
    * through json() to splice JSON). */
  def toNode(v: Any): JsonNode = v match {
    case null => mapper.nullNode()
    case u: UTF8String => mapper.getNodeFactory.textNode(u.toString)
    case b: java.lang.Boolean => mapper.getNodeFactory.booleanNode(b)
    case l: java.lang.Long => mapper.getNodeFactory.numberNode(l.longValue())
    case i: java.lang.Integer => mapper.getNodeFactory.numberNode(i.longValue())
    case s: java.lang.Short => mapper.getNodeFactory.numberNode(s.longValue())
    case b: java.lang.Byte => mapper.getNodeFactory.numberNode(b.longValue())
    case d: java.lang.Double => mapper.getNodeFactory.numberNode(d.doubleValue())
    case f: java.lang.Float => mapper.getNodeFactory.numberNode(f.doubleValue())
    case d: org.apache.spark.sql.types.Decimal =>
      mapper.getNodeFactory.numberNode(d.toDouble)
    case other => mapper.getNodeFactory.textNode(other.toString)
  }

  /** json1's type names: booleans are their own types ('true'/'false'),
    * integral vs real split as storage classes. */
  def typeName(node: JsonNode): String =
    if (node.isNull) "null"
    else if (node.isBoolean) { if (node.asBoolean()) "true" else "false" }
    else if (node.isIntegralNumber) "integer"
    else if (node.isNumber) "real"
    else if (node.isTextual) "text"
    else if (node.isArray) "array"
    else "object"

  /** The SQL-value text of a node (the `->>` / json_each `value`
    * rendering): JSON null → SQL NULL, booleans → 1/0, numbers and
    * text raw, containers as minified JSON text. */
  def sqlValueText(node: JsonNode): String =
    if (node.isNull) null
    else if (node.isTextual) node.asText()
    else if (node.isBoolean) { if (node.asBoolean()) "1" else "0" }
    else if (node.isNumber) node.numberValue().toString
    else mapper.writeValueAsString(node)

  /** Apply one set/insert/replace/remove at `steps` inside `root`,
    * mutating in place. SQLite rules (json1.html): set/insert CREATE
    * missing intermediates (object for a key step, array for an index
    * step) and may APPEND at an array's exact end; indexes past the
    * end and unnavigable shapes are silent no-ops. */
  def modify(root: JsonNode, steps: Seq[Either[String, Int]],
      value: Option[JsonNode], mode: String): Unit = {
    if (steps.isEmpty) return // '$' itself: whole-doc ops unsupported no-op
    var cur: JsonNode = root
    steps.init.zipWithIndex.foreach { case (step, i) =>
      val next: JsonNode = (step, cur) match {
        case (Left(key), o: ObjectNode) =>
          var c = o.get(key)
          if (c == null || c.isNull) {
            if (mode == "replace" || mode == "remove") return
            c = steps(i + 1) match {
              case Left(_) => mapper.createObjectNode()
              case Right(_) => mapper.createArrayNode()
            }
            o.set[com.fasterxml.jackson.databind.JsonNode](key, c)
          }
          c
        case (Right(idx), a: ArrayNode) if idx >= 0 && idx < a.size() => a.get(idx)
        case _ => return // unnavigable: silent no-op, as sqlite3
      }
      cur = next
    }
    (steps.last, cur) match {
      case (Left(key), o: ObjectNode) => mode match {
        case "set" =>
          value.foreach(o.set[com.fasterxml.jackson.databind.JsonNode](key, _))
        case "insert" => if (!o.has(key))
          value.foreach(o.set[com.fasterxml.jackson.databind.JsonNode](key, _))
        case "replace" => if (o.has(key))
          value.foreach(o.set[com.fasterxml.jackson.databind.JsonNode](key, _))
        case "remove" => o.remove(key)
      }
      case (Right(idx), a: ArrayNode) => mode match {
        case "set" =>
          if (idx >= 0 && idx < a.size()) value.foreach(a.set(idx, _))
          else if (idx == a.size()) value.foreach(a.add) // append at end
        case "insert" =>
          if (idx == a.size()) value.foreach(a.add)
        case "replace" =>
          if (idx >= 0 && idx < a.size()) value.foreach(a.set(idx, _))
        case "remove" =>
          if (idx >= 0 && idx < a.size()) a.remove(idx)
      }
      case _ => ()
    }
  }
}

/** Kernel of json1's `json_each` table-valued function
  * (sqlite.org/json1.html §4.13): one array-of-structs per input, which
  * the dialect's FROM-clause rewrite feeds to Spark's `inline`
  * generator — `FROM t, json_each(t.j)` becomes
  * `FROM t LATERAL VIEW inline(json_each_entries(t.j))`, the same
  * iteration Spark-shaped. Columns and their sqlite3-differential
  * semantics (key/value/type/atom/fullkey/path golden-tested):
  * object → one row per field (key = name), array → one row per
  * element (key = index text), scalar → one row (key NULL); `value` is
  * the SQL-value rendering (booleans 1/0, containers as JSON text),
  * `atom` NULL for containers. Deviations: every column is STRING
  * (SQLite's key/value are dynamically typed — comparisons still
  * coerce), and `id` is the 1-based visit ordinal (SQLite documents id
  * as carrying no guaranteed meaning). With `recursive` set this is
  * `json_tree`: a pre-order walk emitting the target itself first
  * (keyed as it sits in its parent), `parent` = the containing row's
  * ordinal. Unresolvable paths yield zero rows, malformed JSON answers
  * NULL (engine-wide deviation; SQLite raises). */
case class SqliteJsonEachEntries(children: Seq[Expression],
    recursive: Boolean = false)
    extends Expression with CodegenFallback {
  import SqliteJsonEachEntries.{fieldCount, quoteKey}

  override def dataType: DataType =
    ArrayType(SqliteJsonEachEntries.rowSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String =
    if (recursive) "json_tree_entries" else "json_each_entries"

  private def str(s: String): UTF8String = UTF8String.fromString(s)

  private def row(ordinal: Int, parent: Option[Long], key: String,
      node: com.fasterxml.jackson.databind.JsonNode,
      fullkey: String, basePath: String): InternalRow = {
    val container = node.isContainerNode
    val value = SqliteJsonOps.sqlValueText(node)
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fieldCount)
    r.update(0, if (key == null) null else str(key))
    r.update(1, if (value == null) null else str(value))
    r.update(2, str(SqliteJsonOps.typeName(node)))
    r.update(3, if (container || value == null) null else str(value))
    r.update(4, ordinal.toLong)
    r.update(5, parent.map(Long.box).orNull)
    r.update(6, str(fullkey))
    r.update(7, str(basePath))
    r
  }

  override def eval(input: InternalRow): Any = {
    val j = children.head.eval(input)
    if (j == null) return null
    val root =
      try SqliteJsonOps.mapper.readTree(j.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => return null }
    // navigate the optional path arg, remembering the target's own key
    // and fullkey: json_tree's first row is the TARGET ITSELF, keyed as
    // it is in its parent, with `path` = its container's path
    var fullkey = "$"
    var parentPath = "$" // the target's container's path
    var targetKey: String = null
    var target: com.fasterxml.jackson.databind.JsonNode = root
    if (children.length == 2) {
      val p = children(1).eval(input)
      if (p == null) return null
      val steps = SqliteJsonArrow.parsePath(p.toString)
      if (steps == null) return null
      val sb = new StringBuilder("$")
      val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
      steps.foreach {
        case Left(key) =>
          if (target == null || !target.isObject) return empty
          target = target.get(key)
          parentPath = sb.toString
          sb.append(quoteKey(key))
          targetKey = key
        case Right(idx) =>
          if (target == null || !target.isArray || idx >= target.size()) return empty
          target = target.get(idx)
          parentPath = sb.toString
          sb.append('[').append(idx).append(']')
          targetKey = idx.toString
      }
      if (target == null) return empty
      fullkey = sb.toString
    }
    val rows = Seq.newBuilder[InternalRow]
    var ord = 0

    def emitChildren(node: com.fasterxml.jackson.databind.JsonNode,
        base: String, parentOrd: Option[Long]): Unit = {
      if (node.isObject) {
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          emitNode(e.getValue, e.getKey, base + quoteKey(e.getKey), base, parentOrd)
        }
      } else if (node.isArray) {
        var i = 0
        while (i < node.size()) {
          emitNode(node.get(i), i.toString, s"$base[$i]", base, parentOrd)
          i += 1
        }
      }
    }

    def emitNode(node: com.fasterxml.jackson.databind.JsonNode, key: String,
        fk: String, containerPath: String, parentOrd: Option[Long]): Unit = {
      ord += 1
      val self = ord.toLong
      rows += row(ord, parentOrd, key, node, fk, containerPath)
      if (recursive) emitChildren(node, fk, Some(self))
    }

    if (recursive)
      // pre-order: the target itself first, then descendants
      emitNode(target, targetKey, fullkey, parentPath, None)
    else if (target.isContainerNode)
      emitChildren(target, fullkey, None)
    else
      // json_each's scalar row: key NULL and path = the target's own
      // path (json_tree's differs: target's key + container path)
      rows += row(1, None, null, target, fullkey, fullkey)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.result().toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteJsonEachEntries =
    copy(children = newChildren)
}

object SqliteJsonEachEntries {
  val rowSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", StringType),
      org.apache.spark.sql.types.StructField("value", StringType),
      org.apache.spark.sql.types.StructField("type", StringType),
      org.apache.spark.sql.types.StructField("atom", StringType),
      org.apache.spark.sql.types.StructField("id", LongType),
      org.apache.spark.sql.types.StructField("parent", LongType),
      org.apache.spark.sql.types.StructField("fullkey", StringType),
      org.apache.spark.sql.types.StructField("path", StringType)))
  val fieldCount: Int = rowSchema.length

  /** Path-step rendering for fullkey/path, SQLite's normalized form:
    * bare `.key` for identifier-shaped keys, `."quoted"` otherwise. */
  def quoteKey(key: String): String =
    if (key.matches("[A-Za-z_][A-Za-z0-9_]*")) s".$key" else s""".\"$key\""""
}

/** json1's `json_set` / `json_insert` / `json_replace` / `json_remove`
  * (sqlite.org/json1.html): variadic (json, path[, value]…) — set
  * overwrites or creates, insert only creates, replace only
  * overwrites; remove takes paths only. Missing intermediates are
  * created by set/insert (object or array per the next step), silent
  * no-ops otherwise — all sqlite3-differential golden-tested.
  * Malformed JSON answers NULL (engine-wide deviation; SQLite
  * raises). */
case class SqliteJsonModify(children: Seq[Expression], mode: String)
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = s"json_$mode"

  override def eval(input: InternalRow): Any = {
    val j = children.head.eval(input)
    if (j == null) return null
    val root =
      try SqliteJsonOps.mapper.readTree(j.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => return null }
    if (root.isMissingNode) return null // empty input parses to MissingNode
    val args = children.tail
    val step = if (mode == "remove") 1 else 2
    var i = 0
    while (i < args.length) {
      val p = args(i).eval(input)
      if (p == null) return null
      val steps = SqliteJsonArrow.parsePath(p match {
        case s: UTF8String => s.toString
        case other => other.toString
      })
      if (steps == null) return null
      // json1: json_remove(X, '$') removes the root — the result is NULL
      if (mode == "remove" && steps.isEmpty) return null
      val value =
        if (mode == "remove") None
        else Some(SqliteJsonOps.toNode(args(i + 1).eval(input)))
      SqliteJsonOps.modify(root, steps, value, mode)
      i += step
    }
    UTF8String.fromString(SqliteJsonOps.mapper.writeValueAsString(root))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteJsonModify =
    copy(children = newChildren)
}

/** json1's MULTI-path `json_extract(json, p1, p2, …)`: with two or
  * more paths the answer is a JSON array holding each selected node's
  * JSON representation — strings stay quoted, a missing path
  * contributes a JSON null (probed: sqlite3 `json_extract('{"a":1}',
  * '$.a', '$.nope')` → `[1,null]`). The single-path form stays on
  * Spark's codegen'd GetJsonObject (SqliteCompat registration).
  * Malformed JSON answers NULL (engine-wide documented deviation;
  * SQLite raises). */
case class SqliteJsonExtractMulti(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_extract"

  override def eval(input: InternalRow): Any = {
    val j = children.head.eval(input)
    if (j == null) return null
    val root =
      try SqliteJsonOps.mapper.readTree(j.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => return null }
    val parts = children.tail.map { pe =>
      val p = pe.eval(input)
      if (p == null) return null
      val steps = SqliteJsonArrow.parsePath(p.toString)
      if (steps == null) return null
      var cur: com.fasterxml.jackson.databind.JsonNode = root
      steps.foreach {
        case Left(key) =>
          cur = if (cur != null && cur.isObject) cur.get(key) else null
        case Right(idx) =>
          cur = if (cur != null && cur.isArray && idx >= 0 && idx < cur.size())
            cur.get(idx) else null
      }
      if (cur == null) "null" else SqliteJsonOps.mapper.writeValueAsString(cur)
    }
    UTF8String.fromString(parts.mkString("[", ",", "]"))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteJsonExtractMulti =
    copy(children = newChildren)
}

/** json1's `json_patch` — RFC 7396 MergePatch (sqlite.org/json1.html):
  * a non-object patch replaces the target wholesale; object patches
  * merge per key recursively, null patch values DELETING target keys
  * (so a patch can never install a JSON null). Target key order is
  * preserved, new keys append — matching sqlite3's rendering. SQL NULL
  * in → SQL NULL out; malformed JSON answers NULL (engine-wide
  * documented deviation; SQLite raises). */
case class SqliteJsonPatch(target: Expression, patch: Expression)
    extends BinaryExpression with CodegenFallback {
  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.ObjectNode

  override def left: Expression = target
  override def right: Expression = patch
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_patch"

  private def merge(t: JsonNode, p: JsonNode): JsonNode =
    if (!p.isObject) p
    else {
      val out: ObjectNode =
        if (t != null && t.isObject) t.asInstanceOf[ObjectNode]
        else SqliteJsonOps.mapper.createObjectNode()
      val it = p.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) out.remove(e.getKey)
        else out.set[JsonNode](e.getKey, merge(out.get(e.getKey), e.getValue))
      }
      out
    }

  override def eval(input: InternalRow): Any = {
    val t = target.eval(input)
    val p = patch.eval(input)
    if (t == null || p == null) return null
    val nodes =
      try (SqliteJsonOps.mapper.readTree(t.asInstanceOf[UTF8String].toString),
        SqliteJsonOps.mapper.readTree(p.asInstanceOf[UTF8String].toString))
      catch { case _: Exception => return null }
    UTF8String.fromString(
      SqliteJsonOps.mapper.writeValueAsString(merge(nodes._1, nodes._2)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteJsonPatch =
    copy(target = newLeft, patch = newRight)
}

/** json1's canonicalizer/renderer trio: `json(X)` (minified
  * re-render), `json_pretty(X[, indent])` (4-space default, `": "`
  * separators, empty containers inline — probed against sqlite3), and
  * `json_error_position(X)` (0 when valid, else the 1-based character
  * position of the first parse error). Documented deviations: SQLite's
  * parser accepts JSON5 (trailing commas, comments) and preserves
  * `\\u` escapes verbatim; this Jackson-backed path is strict-JSON and
  * re-renders escapes — identical on the strict-JSON/ASCII domain the
  * goldens pin. Malformed JSON answers NULL from `json`/`json_pretty`
  * (engine-wide deviation; SQLite raises). */
case class SqliteJsonFormat(children: Seq[Expression], mode: String)
    extends Expression with CodegenFallback {
  override def dataType: DataType =
    if (mode == "error_position") LongType else StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (mode == "json") "json" else s"json_$mode"

  private def pretty(node: com.fasterxml.jackson.databind.JsonNode,
      indent: String, depth: Int, sb: java.lang.StringBuilder): Unit = {
    def pad(d: Int): Unit = { var i = 0; while (i < d) { sb.append(indent); i += 1 } }
    if (node.isObject && node.size() > 0) {
      sb.append("{\n")
      val it = node.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(",\n")
        first = false
        pad(depth + 1)
        sb.append(SqliteJsonOps.mapper.writeValueAsString(
          SqliteJsonOps.mapper.getNodeFactory.textNode(e.getKey)))
        sb.append(": ")
        pretty(e.getValue, indent, depth + 1, sb)
      }
      sb.append("\n"); pad(depth); sb.append("}")
    } else if (node.isArray && node.size() > 0) {
      sb.append("[\n")
      var i = 0
      while (i < node.size()) {
        if (i > 0) sb.append(",\n")
        pad(depth + 1)
        pretty(node.get(i), indent, depth + 1, sb)
        i += 1
      }
      sb.append("\n"); pad(depth); sb.append("]")
    } else sb.append(SqliteJsonOps.mapper.writeValueAsString(node))
  }

  override def eval(input: InternalRow): Any = {
    val j = children.head.eval(input)
    if (j == null) return null
    val text = j.asInstanceOf[UTF8String].toString
    val parsed =
      try {
        val node = SqliteJsonOps.mapper.readTree(text)
        // blank input parses to a MissingNode, not an exception
        if (node == null || node.isMissingNode) Left(1L) else Right(node)
      } catch {
        case e: com.fasterxml.jackson.core.JsonProcessingException =>
          Left(math.max(1L, e.getLocation.getColumnNr.toLong))
        case _: Exception => Left(1L)
      }
    mode match {
      case "error_position" =>
        parsed.fold(identity[Long], _ => 0L)
      case "json" => parsed match {
        case Right(node) =>
          UTF8String.fromString(SqliteJsonOps.mapper.writeValueAsString(node))
        case Left(_) => null
      }
      case _ => parsed match { // pretty
        case Right(node) =>
          val indent = children.lift(1).map(_.eval(input)) match {
            case Some(null) => return null
            case Some(u: UTF8String) => u.toString
            case Some(other) => other.toString
            case None => "    "
          }
          val sb = new java.lang.StringBuilder()
          pretty(node, indent, 0, sb)
          UTF8String.fromString(sb.toString)
        case Left(_) => null
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteJsonFormat =
    copy(children = newChildren)
}

/** json1's interrogation scalars: `json_type([, path])` (the node's
  * JSON type name — 'true'/'false' are their own types), `json_valid`,
  * `json_array_length([, path])` (0 for non-arrays, NULL for a missing
  * path). */
case class SqliteJsonInfo(children: Seq[Expression], mode: String)
    extends Expression with CodegenFallback {
  override def dataType: DataType =
    if (mode == "type") StringType else LongType
  override def nullable: Boolean = true
  override def prettyName: String = s"json_$mode"

  override def eval(input: InternalRow): Any = {
    val j = children.head.eval(input)
    if (j == null) return null
    val parsed =
      try Some(SqliteJsonOps.mapper.readTree(j.asInstanceOf[UTF8String].toString))
      catch { case _: Exception => None }
    // Jackson answers MissingNode (not an error) for empty input —
    // sqlite3: json_valid('') = 0
    if (mode == "valid")
      return if (parsed.exists(!_.isMissingNode)) 1L else 0L
    val root = parsed.filter(!_.isMissingNode).getOrElse(return null)
    val node =
      if (children.length == 1) root
      else {
        val p = children(1).eval(input)
        if (p == null) return null
        val steps = SqliteJsonArrow.parsePath(p.toString)
        if (steps == null) return null
        var cur: com.fasterxml.jackson.databind.JsonNode = root
        steps.foreach {
          case Left(key) =>
            if (cur == null || !cur.isObject) return null
            cur = cur.get(key)
          case Right(idx) =>
            if (cur == null || !cur.isArray || idx < 0 || idx >= cur.size()) return null
            cur = cur.get(idx)
        }
        if (cur == null) return null
        cur
      }
    mode match {
      case "type" => UTF8String.fromString(SqliteJsonOps.typeName(node))
      case _ => if (node.isArray) node.size().toLong else 0L // array_length
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteJsonInfo =
    copy(children = newChildren)
}

/** json1's `json_quote`: the JSON text form of an SQL value — numbers
  * pass through, strings JSON-escape, NULL is the text 'null' (never
  * SQL NULL, which makes this the null-safe kernel the
  * `json_group_array`/`json_group_object` aggregates build on:
  * CollectList drops SQL NULLs, 'null' text survives). */
case class SqliteJsonQuote(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "json_quote"

  override def eval(input: InternalRow): Any = UTF8String.fromString(
    SqliteJsonOps.mapper.writeValueAsString(SqliteJsonOps.toNode(child.eval(input))))

  override protected def withNewChildInternal(newChild: Expression): SqliteJsonQuote =
    copy(child = newChild)
}

/** SQLite `printf()` / `format()` (printf.html), evaluated verb by
  * verb with the probed coercions the combined Java `String.format`
  * cannot reproduce: `%g` strips trailing zeros like C (Java pads —
  * `%.12g` of 0.10000000149… must render `0.10000000149`), NULL and
  * MISSING arguments read as 0 / '' (`printf('%d %s')` → `0 `),
  * numeric verbs truncate doubles and parse text prefixes
  * (`%d` of 3.9 → 3, `%g` of '2.5e1' → 25, of 'abc' → 0), `%u` is
  * unsigned 64-bit, `%c` takes the FIRST CHAR of the argument's text
  * form (65 → '6'), and the SQL-escape verbs `%q`/`%Q`/`%w` double
  * quotes (`%Q` renders NULL as `NULL`). Non-g verbs delegate each
  * popped argument to Java's formatter with the same spec, so the
  * golden-tested `%s %d %f %x %e %%` behaviors are unchanged. */
case class SqlitePrintf(children: Seq[Expression]) extends Expression
    with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "printf"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("printf takes at least 1 argument")
    else TypeCheckResult.TypeCheckSuccess
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val fmt = children.head.eval(input)
    if (fmt == null) return null
    UTF8String.fromString(SqlitePrintf.format(fmt.toString,
      children.tail.map(_.eval(input))))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqlitePrintf =
    copy(children = newChildren)
}

object SqlitePrintf {
  private val NumPrefix =
    "^[+-]?(?:[0-9]+\\.?[0-9]*(?:[eE][+-]?[0-9]+)?|\\.[0-9]+(?:[eE][+-]?[0-9]+)?)".r

  private def text(a: Any): String = a match {
    case null => ""
    case s: UTF8String => s.toString
    case other => other.toString
  }
  private def asDouble(a: Any): Double = a match {
    case null => 0.0
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: Double => d
    case f: Float => f.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => // SQLite CAST-to-REAL: longest numeric prefix, else 0
      NumPrefix.findFirstIn(other.toString.trim)
        .map(_.toDouble).getOrElse(0.0)
  }
  private def asLong(a: Any): Long = a match {
    case null => 0L
    case l: Long => l
    case i: Int => i.toLong
    case d: Double => d.toLong
    case f: Float => f.toLong
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case other => asDouble(other).toLong
  }

  /** C/SQLite `%g`: pick %e vs %f by exponent, then strip trailing
    * zeros (and a bare trailing '.') unless the `#` flag is given. */
  private def gFormat(v: Double, flags: String, width: Int,
      prec0: Int, upper: Boolean): String = {
    if (v.isNaN) return pad("NaN", flags, width)
    if (v.isInfinite) return pad(if (v > 0) "Inf" else "-Inf", flags, width)
    val p = math.max(1, if (prec0 < 0) 6 else prec0)
    val alt = flags.contains('#')
    val signFlag =
      if (flags.contains('+')) "+" else if (flags.contains(' ')) " " else ""
    val sci = String.format(s"%$signFlag.${p - 1}e", Double.box(v))
    val exp = sci.substring(sci.indexOf('e') + 1).toInt
    var out =
      if (exp < -4 || exp >= p) {
        val (mant, e) = sci.splitAt(sci.indexOf('e'))
        (if (alt) mant else stripZeros(mant)) + e
      } else {
        val fixed = String.format(s"%$signFlag.${p - 1 - exp}f", Double.box(v))
        if (alt) fixed else stripZeros(fixed)
      }
    if (upper) out = out.toUpperCase(java.util.Locale.ROOT)
    pad(out, flags, width)
  }
  private def stripZeros(s: String): String =
    if (!s.contains('.')) s
    else {
      var e = s.length
      while (e > 0 && s.charAt(e - 1) == '0') e -= 1
      if (e > 0 && s.charAt(e - 1) == '.') e -= 1
      s.substring(0, e)
    }
  private def pad(s: String, flags: String, width: Int): String =
    if (width <= s.length) s
    else if (flags.contains('-')) s + " " * (width - s.length)
    else if (flags.contains('0') && s.exists(c => c.isDigit)) {
      val signLen = if (s.startsWith("-") || s.startsWith("+")) 1 else 0
      s.substring(0, signLen) + "0" * (width - s.length) + s.substring(signLen)
    } else " " * (width - s.length) + s

  def format(fmt: String, args: Seq[Any]): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    var ai = 0
    def nextArg(): Any = {
      val a = if (ai < args.length) args(ai) else null
      ai += 1
      a
    }
    val n = fmt.length
    while (i < n) {
      val c = fmt.charAt(i)
      if (c != '%') { sb.append(c); i += 1 }
      else {
        i += 1
        val flags = new java.lang.StringBuilder
        while (i < n && "-+ 0#,!".indexOf(fmt.charAt(i)) >= 0) {
          flags.append(fmt.charAt(i)); i += 1
        }
        var width = -1
        if (i < n && fmt.charAt(i) == '*') { width = asLong(nextArg()).toInt; i += 1 }
        else while (i < n && fmt.charAt(i).isDigit) {
          width = math.max(0, width) * 10 + (fmt.charAt(i) - '0'); i += 1
        }
        var prec = -1
        if (i < n && fmt.charAt(i) == '.') {
          i += 1
          if (i < n && fmt.charAt(i) == '*') { prec = asLong(nextArg()).toInt; i += 1 }
          else {
            prec = 0
            while (i < n && fmt.charAt(i).isDigit) {
              prec = prec * 10 + (fmt.charAt(i) - '0'); i += 1
            }
          }
        }
        if (i >= n) return sb.toString // dangling '%'
        val conv = fmt.charAt(i)
        i += 1
        val f = flags.toString
        def jflags = f.filter("-+ 0#,".contains(_)) // '!' has no Java analog
        def wSpec = if (width >= 0) width.toString else ""
        def pSpec = if (prec >= 0) s".$prec" else ""
        conv match {
          case '%' => sb.append('%')
          case 'g' => sb.append(gFormat(asDouble(nextArg()), f, math.max(0, width), prec, upper = false))
          case 'G' => sb.append(gFormat(asDouble(nextArg()), f, math.max(0, width), prec, upper = true))
          case 'd' | 'i' =>
            // precision on %d zero-pads the digits (C semantics);
            // '#'/'!' have no meaning for d and would crash Java's
            // formatter — probed: sqlite ignores them
            val v = asLong(nextArg())
            val dflags = f.filter("-+ 0,".contains(_))
            val digits =
              if (prec >= 0) {
                val raw = math.abs(v).toString
                val padded = "0" * math.max(0, prec - raw.length) + raw
                (if (v < 0) "-" else if (f.contains('+')) "+"
                 else if (f.contains(' ')) " " else "") + padded
              } else String.format(s"%$dflags${wSpec}d", Long.box(v))
            if (prec >= 0) sb.append(pad(digits, f, math.max(0, width)))
            else sb.append(digits)
          case 'u' =>
            // precision zero-pads the digits, like d/x; ',' groups
            // thousands (probed: printf('%,u',1234567)='1,234,567')
            var uDigits = java.lang.Long.toUnsignedString(asLong(nextArg()))
            if (prec > uDigits.length)
              uDigits = "0" * (prec - uDigits.length) + uDigits
            if (f.contains(','))
              uDigits = uDigits.reverse.grouped(3).mkString(",").reverse
            sb.append(pad(uDigits, f, math.max(0, width)))
          case 'x' | 'X' | 'o' =>
            // unsigned 64-bit render with sqlite's probed layout rules:
            // precision zero-pads the DIGITS; the '0' flag zero-pads the
            // digits to WIDTH (even alongside a precision — C would
            // ignore it); '#' then prefixes 0x/0X/0 OUTSIDE that
            // zero-padding (probed: printf('%#08x',255)='0x000000ff',
            // 10 chars — the prefix overflows the width) but INSIDE
            // space padding ('%#8x'→'    0xff'); no prefix for 0;
            // '+'/' '/','/'!' are ignored (probed)
            val v = asLong(nextArg())
            var digits = conv match {
              case 'o' => java.lang.Long.toOctalString(v)
              case 'X' => java.lang.Long.toHexString(v)
                .toUpperCase(java.util.Locale.ROOT)
              case _ => java.lang.Long.toHexString(v)
            }
            if (prec > digits.length)
              digits = "0" * (prec - digits.length) + digits
            val w = math.max(0, width)
            val zeroPad = f.contains('0') && !f.contains('-')
            if (zeroPad && w > digits.length)
              digits = "0" * (w - digits.length) + digits
            val prefixed =
              if (f.contains('#') && v != 0L)
                (conv match {
                  case 'x' => "0x"; case 'X' => "0X"; case _ => "0"
                }) + digits
              else digits
            sb.append(
              if (zeroPad || w <= prefixed.length) prefixed
              else if (f.contains('-')) prefixed + " " * (w - prefixed.length)
              else " " * (w - prefixed.length) + prefixed)
          case 'f' | 'e' | 'E' =>
            // Java rejects '#' for e/f and ',' for e — sqlite's '#'
            // keeps the trailing point at precision 0 (probed:
            // '%#.0f'→'5.', '%#.0e'→'5.e+00'); ',' groups for f only
            val keep = if (conv == 'f') "-+ 0," else "-+ 0"
            val base = String.format(s"%${f.filter(keep.contains(_))}$wSpec$pSpec$conv",
              Double.box(asDouble(nextArg())))
            sb.append(
              if (f.contains('#') && prec == 0) {
                val eAt = if (conv == 'f') -1 else base.indexWhere(c => c == 'e' || c == 'E')
                if (eAt < 0) base + "." else base.substring(0, eAt) + "." + base.substring(eAt)
              } else base)
          case 's' | 'z' => // %z = %s on the SQL surface
            sb.append(String.format(s"%${f.filter("-".contains(_))}$wSpec${pSpec}s",
              text(nextArg())))
          case 'c' => // first char of the TEXT form (probed: 65 → '6')
            val t = text(nextArg())
            sb.append(pad(if (t.isEmpty) "" else t.substring(0, 1), f,
              math.max(0, width)))
          case 'q' => // double single quotes
            sb.append(text(nextArg()).replace("'", "''"))
          case 'Q' => // quote + escape; NULL renders as the keyword
            nextArg() match {
              case null => sb.append("NULL")
              case a => sb.append("'").append(text(a).replace("'", "''")).append("'")
            }
          case 'w' => // double double-quotes (identifier escape)
            sb.append(text(nextArg()).replace("\"", "\"\""))
          case _ => () // unknown verb: nothing (sqlite renders empty)
        }
      }
    }
    sb.toString
  }
}
