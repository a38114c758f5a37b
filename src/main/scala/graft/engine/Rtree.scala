package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructType}

/** The SQLite `rtree` / `rtree_i32` virtual-table modules (r15) as an
  * engine analog: the R-tree is an INDEX STRUCTURE — its observable
  * query surface is a plain table of (id, min1, max1[, …]) rows with
  * the module's probed value coercions and constraints, which Catalyst
  * range-scans without needing the tree. Probed on the sandbox sqlite3
  * (3.51):
  *  - coordinates store as float32 with OUTWARD rounding — min bounds
  *    round toward −∞, max bounds toward +∞ (`1.1` min →
  *    `1.09999990463257`, `2.2` max → `2.20000004768372`) — so every
  *    stored box CONTAINS the requested one; `rtree_i32` truncates
  *    toward zero to int32 (`2.9 → 2`, `-2.9 → -2`);
  *  - the first column is an integer rowid alias: duplicates are
  *    `UNIQUE constraint failed: t.id`;
  *  - each (min, max) pair must satisfy min ≤ max AFTER coercion —
  *    `rtree constraint failed: t.(minX<=maxX)` names the pair;
  *  - 1-5 dimension pairs; even/short column counts are the module's
  *    own errors ("Too few columns…" / "Wrong number of columns…").
  * DML rides the ordinary write path with the coercions applied at the
  * staging funnel (so INSERT, UPDATE, upserts and trigger bodies all
  * agree); reads are ordinary SQL. The reference reaches rtree only
  * through libsqlite3 (trough/write.py:40), same delegation as fts5.
  * Export/ingest of the packed %_node blob format is out of scope
  * (named refusal — the data ingests through its shadow tables). */
object Rtree {

  final case class RtreeDef(name: String, idCol: String,
      coordCols: Seq[String], i32: Boolean, ifNotExists: Boolean,
      sql: String) {
    def pairs: Seq[(String, String)] =
      coordCols.grouped(2).map(p => (p(0), p(1))).toSeq
  }

  private val createVirtualRe =
    ("(?is)^\\s*CREATE\\s+VIRTUAL\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      "(\\S+)\\s+USING\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)\\s*;?\\s*$").r

  /** Parse `CREATE VIRTUAL TABLE … USING rtree|rtree_i32(id, min1,
    * max1, …)`. None when the module is not rtree at all; the module's
    * own errors (probed texts) for bad column counts. */
  def parseCreateVirtual(stmt: String): Option[RtreeDef] = {
    val m = createVirtualRe.findFirstMatchIn(stmt).getOrElse(return None)
    val module = m.group(3).toLowerCase(java.util.Locale.ROOT)
    if (module != "rtree" && module != "rtree_i32") return None
    val name = SqlScript.unquoteIdent(m.group(2))
    val cols = SqlScript.splitTopLevel(m.group(4)).map { arg =>
      // auxiliary (+col) columns and per-column type decorations are
      // out of this subset — refuse by name
      val a = arg.trim
      if (a.startsWith("+"))
        throw new UnsupportedOperationException(
          s"rtree auxiliary column '$a' is not supported: only the plain " +
            "(id, min/max…) rtree shape has an engine analog")
      val c = SqlScript.unquoteIdent(a.split("\\s+").head)
      require(c.nonEmpty, s"cannot parse rtree column: '$arg'")
      c
    }
    // real rtree's own arity errors (probed texts)
    if (cols.length < 3)
      throw new IllegalArgumentException("Too few columns for an rtree table")
    if (cols.length > 11)
      throw new IllegalArgumentException("Too many columns for an rtree table")
    if (cols.length % 2 == 0)
      throw new IllegalArgumentException(
        "Wrong number of columns for an rtree table")
    Some(RtreeDef(name, cols.head, cols.tail, module == "rtree_i32",
      m.group(1) != null, stmt.trim.stripSuffix(";").trim))
  }

  /** Backing schema: integer rowid alias + float64-surfaced coords
    * (values hold the module's coerced float32/int32 results). */
  def schemaOf(rd: RtreeDef): StructType = {
    val f = org.apache.spark.sql.types.StructField
    StructType(f(rd.idCol, LongType) +:
      rd.coordCols.map(c =>
        f(c, if (rd.i32) LongType else DoubleType)))
  }

  def metaOf(rd: RtreeDef): SegmentStore.TableMeta =
    SegmentStore.TableMeta(schemaOf(rd), Seq(rd.idCol), Some(rd.idCol),
      ftsSql = Some(rd.sql))

  /** Decode the LEAF cells of one rtree `%_node` blob — probed format:
    * 2-byte header (big-endian), 2-byte cell count, then per cell an
    * 8-byte big-endian rowid and 2·dims big-endian float32 (int32 for
    * rtree_i32) coordinates. The header carries the tree depth ONLY in
    * the ROOT node (node 1) — every NON-root node, leaf or inner,
    * stores zero there (probed on 3.51: a 120k-row tree has 4,489
    * zero-header non-root nodes of which 134 are inner), so the header
    * check below only guards against a deep tree's root; CALLERS MUST
    * pre-filter to true leaves structurally — a node is a leaf iff it
    * is nobody's parent in the `%_parent` shadow table
    * ([[SegmentStore.ingestSqliteSegment]] anti-joins on it). Inner
    * cells carry child node numbers in the rowid slot and decode as
    * garbage rows otherwise. */
  def decodeLeafCells(rd: RtreeDef, data: Array[Byte]): Seq[Seq[Any]] = {
    if (data == null || data.length < 4) return Nil
    val bb = java.nio.ByteBuffer.wrap(data)
    if ((bb.getShort(0) & 0xffff) != 0) return Nil // inner node
    val nCell = bb.getShort(2) & 0xffff
    val dims = rd.coordCols.length
    val cellBytes = 8 + dims * 4
    (0 until nCell).flatMap { i =>
      val off = 4 + i * cellBytes
      if (off + cellBytes > data.length) None
      else {
        val rowid = bb.getLong(off)
        val coords: Seq[Any] = (0 until dims).map { j =>
          if (rd.i32) bb.getInt(off + 8 + j * 4).toLong
          else bb.getFloat(off + 8 + j * 4).toDouble
        }
        Some(rowid +: coords)
      }
    }
  }

  /** The staging-funnel coercion + constraint gate: every DML path
    * (INSERT, UPDATE, upsert, trigger bodies) funnels through
    * [[graft.engine]]'s stage(), so applying the module semantics here
    * keeps them uniform. Idempotent (coercing a coerced value is the
    * identity), like the generated-column recompute it sits beside. */
  def coerceAndCheck(rd: RtreeDef, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.SqlInternals
    // NULL coordinates coerce to 0 BEFORE the min≤max gate — probed:
    // INSERT (1, NULL, 5) stores 0.0, and (2, 5, NULL) fails the
    // constraint because the NULL max became 0 (< the 5 min)
    def coerce(c: String, up: Boolean): Column = {
      val v = coalesce(df(c), lit(0))
      if (rd.i32)
        // int32 truncation toward zero (probed: 2.9→2, -2.9→-2)
        greatest(least(v.cast("long"), lit(Int.MaxValue.toLong)),
          lit(Int.MinValue.toLong))
      else SqlInternals.column(RtreeCoord(
        SqlInternals.expression(v.cast("double")), up))
    }
    val out = df.select(df(rd.idCol).cast("long").as(rd.idCol) +:
      rd.pairs.flatMap { case (lo, hi) =>
        Seq(coerce(lo, up = false).as(lo), coerce(hi, up = true).as(hi))
      }: _*)
    // min ≤ max per pair AFTER coercion — real rtree's named error —
    // plus max(id)/null-id detection, all in ONE bounded job
    val flags = rd.pairs.map { case (lo, hi) =>
      max(when(col(lo) > col(hi), lit(1)).otherwise(lit(0)))
    } ++ Seq(max(col(rd.idCol)),
      sum(when(col(rd.idCol).isNull, lit(1)).otherwise(lit(0))))
    val r = out.agg(flags.head, flags.tail: _*).head()
    rd.pairs.zipWithIndex.foreach { case ((lo, hi), i) =>
      if (!r.isNullAt(i) && r.getInt(i) == 1)
        throw new IllegalArgumentException(
          s"rtree constraint failed: ${rd.name}.($lo<=$hi)")
    }
    // NULL ids auto-assign max+1, max+2, … (probed: INSERT (NULL,…)
    // after id 200001 stores 200002) — same rule as the rowid alias it
    // is. Window job only when a NULL id is actually present.
    val nNull = if (r.isNullAt(rd.pairs.length + 1)) 0L
      else r.getLong(rd.pairs.length + 1)
    if (nNull == 0) out
    else {
      val base = if (r.isNullAt(rd.pairs.length)) 0L
        else r.getLong(rd.pairs.length)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(monotonically_increasing_id())
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      out.withColumn(rd.idCol, when(col(rd.idCol).isNull,
        lit(base) + sum(when(col(rd.idCol).isNull, lit(1)).otherwise(lit(0))).over(w))
        .otherwise(col(rd.idCol)))
    }
  }
}

/** One rtree float32 coordinate coercion: round the double to the
  * nearest float32 toward −∞ (`up = false`, min bounds) or toward +∞
  * (`up = true`, max bounds) — the module's outward box rounding —
  * surfaced back as double. Codegen'd static call, null-propagating. */
case class RtreeCoord(child: Expression, up: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rtree coordinate must be numeric, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "rtree_coord"
  override def nullSafeEval(v: Any): Any =
    RtreeCoord.coerce(v.asInstanceOf[Double], up)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.engine.RtreeCoord.coerce($c, $up)")
  override protected def withNewChildInternal(newChild: Expression): RtreeCoord =
    copy(child = newChild)
}

object RtreeCoord {
  /** One relative float ulp: rtree.c's RNDTOWARDS/RNDAWAY constants
    * are 1 ∓ 1/8388608 (2⁻²³). */
  private val Towards = 1.0 - 1.0 / 8388608.0
  private val Away = 1.0 + 1.0 / 8388608.0

  /** Outward float32 rounding — rtree.c's rtreeValueDown/rtreeValueUp
    * exactly: when the straight nearest-cast overshoots the bound's
    * direction, scale one relative ulp outward and re-cast (probed
    * digit for digit: min 0.3 → 0.2999999523 two ulps down while
    * min 1.1 → 1.0999999046 one ulp down; max 9.9 → 9.9000015259). */
  def coerce(v: Double, up: Boolean): Double = {
    val f = v.toFloat
    val adj =
      if (!up && f.toDouble > v)
        (v * (if (v < 0) Away else Towards)).toFloat
      else if (up && f.toDouble < v)
        (v * (if (v < 0) Towards else Away)).toFloat
      else f
    adj.toDouble
  }
}
