package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Between, BinaryComparison, Cast, Expression, GreaterThanOrEqual, In, InSubquery, LessThan, Literal, NamedExpression, Or, SortOrder, StringTrimRight, SubqueryExpression, UnaryPositive}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, First, Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Except, Filter, Intersect, Join, LogicalPlan, Project, Sort, Window}
import org.apache.spark.sql.graft.SqlInternals
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Column-DECLARED collations (`CREATE TABLE t (a TEXT COLLATE
  * NOCASE)`), applied as an ANALYZED-plan rewrite.
  *
  * SQLite's rule (datatype3.html §7.1, delegated wholesale by the
  * reference's `cursor.execute` read path, trough/read.py:63-67): a
  * comparison uses (1) an explicit postfix COLLATE operator, leftmost
  * first; else (2) the declared collation of an operand that is a
  * column — a column "preceded by one or more unary + operators and/or
  * CAST operators is still considered a column name"; else (3) BINARY.
  * The same sequence governs ORDER BY, GROUP BY, DISTINCT, min/max and
  * UNIQUE/PK conflict detection on that column.
  *
  * Mechanics: [[SqliteDdl]] records the collation as StructField
  * metadata, which Spark carries from the scan's relation output into
  * every AttributeReference — so by the time this pass runs on the
  * analyzed plan, each column reference knows its own collation and no
  * name resolution (aliases, qualifiers, views) has to be re-done here.
  * Explicit `COLLATE NOCASE|RTRIM` was already folded textually by
  * [[SqliteDialect.rewriteCollate]] (operands arrive wrapped in
  * `ascii_lower`/`rtrim`, which this pass treats as "explicitly
  * collated, leave alone"); explicit `COLLATE BINARY` arrives as a
  * [[CollateBinary]] marker that forces rule 3 and is stripped here.
  *
  * NOCASE folds through [[AsciiLower]] (codegen'd, SQLite's ASCII-only
  * rule); RTRIM ignores trailing 0x20 via Catalyst's `rtrim`. Both
  * forfeit parquet pushdown on the wrapped predicate, so an equality
  * against a literal gets the same coarse-but-exact first-character
  * range prefilter the nocase-LIKE rewrite plants — at 100 TB that is
  * row-group pruning vs a full scan.
  *
  * Scope (documented deviation, not reachable from the reference
  * corpus): aggregate-DISTINCT folding applies to count() only (a
  * folded group_concat would alter output text). IN-subquery
  * membership follows the left operand's collation, and UNION /
  * INTERSECT / EXCEPT compare under the LEFT select's column
  * collations (both r11 — lang_expr.html / select.html rules).
  */
object SqliteCollation {

  /** Apply column-declared collation semantics to an analyzed frame.
    * No-op (returns `df` unchanged) when the plan references no
    * collated column and carries no explicit-BINARY marker — the hot
    * path for every collation-free query is one tree scan. */
  def apply(sess: SparkSession, df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    if (!needed(plan)) df
    else SqlInternals.ofRows(sess, stripMarkers(rewritePlan(plan)))
  }

  private def needed(plan: LogicalPlan): Boolean =
    (plan +: plan.subqueriesAll).exists(_.exists { node =>
      (node.expressions ++ node.output).exists(_.exists {
        case a: AttributeReference =>
          a.dataType == StringType && a.metadata.contains(SqliteDdl.CollationKey)
        case _: CollateBinary => true
        case s: SubqueryExpression => needed(s.plan)
        case _ => false
      })
    })

  /** Collation-aware Spark sort key for a `.sqlite` export's index
    * B-tree over field `f`: entries must be laid out in the order real
    * sqlite3 searches the index with (the declared collation —
    * integrity_check verifies the tree against it). Identity for
    * uncollated / non-string fields. */
  def indexSortKey(f: org.apache.spark.sql.types.StructField,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    SqliteDdl.collationOf(f) match {
      case Some(coll) if f.dataType == StringType =>
        SqlInternals.column(wrap(SqlInternals.expression(c), coll))
      case _ => c
    }

  /** The declared collation governing `e` as a comparison operand:
    * a string column reference, unwrapping casts and unary `+`
    * (SQLite's "still considered a column name" rule). */
  def collationOf(e: Expression): Option[String] = e match {
    case a: AttributeReference
        if a.dataType == StringType && a.metadata.contains(SqliteDdl.CollationKey) =>
      Some(a.metadata.getString(SqliteDdl.CollationKey))
    case c: Cast => collationOf(c.child)
    case c: SqliteCast => collationOf(c.child)
    case u: UnaryPositive => collationOf(u.child)
    case a: Alias => collationOf(a.child)
    case _ => None
  }

  /** Whether the operand carries an EXPLICIT collation (rule 1): the
    * textual rewrite's ascii_lower/rtrim wraps, or the BINARY marker.
    * Also true for this pass's own wraps — which makes the rewrite
    * idempotent across repeated applications to nested frames. */
  private def explicitlyCollated(e: Expression): Boolean = e match {
    case _: CollateBinary | _: AsciiLower | _: StringTrimRight => true
    case c: Cast => explicitlyCollated(c.child)
    case c: SqliteCast => explicitlyCollated(c.child)
    case u: UnaryPositive => explicitlyCollated(u.child)
    case a: Alias => explicitlyCollated(a.child)
    case _ => false
  }

  private[engine] def wrap(e: Expression, coll: String): Expression = coll match {
    case "RTRIM" => StringTrimRight(Cast(e, StringType), None)
    case _ => AsciiLower(Cast(e, StringType))
  }

  /** Which EXPLICIT collation an already-folded operand carries (the
    * textual rewrite turned `x COLLATE NOCASE|RTRIM` into these wraps
    * before parse) — needed where rule 1 must propagate to an operand
    * the textual rewrite can't reach, e.g. the subquery side of
    * `x COLLATE NOCASE IN (SELECT …)`. CollateBinary yields None:
    * BINARY means both sides stay raw. */
  private def explicitCollOf(e: Expression): Option[String] = e match {
    case _: AsciiLower => Some("NOCASE")
    case _: StringTrimRight => Some("RTRIM")
    case c: Cast => explicitCollOf(c.child)
    case c: SqliteCast => explicitCollOf(c.child)
    case u: UnaryPositive => explicitCollOf(u.child)
    case a: Alias => explicitCollOf(a.child)
    case _ => None
  }

  /** The collation governing one IN-membership column: an explicit
    * wrap on x wins (rule 1), else x's declared collation (rule 2),
    * else None (BINARY). */
  private def membershipColl(v: Expression): Option[String] =
    explicitCollOf(v).orElse(
      collationOf(v).filterNot(_ => explicitlyCollated(v)))

  /** Whether the operand IS a column reference (through casts/+) —
    * any type: an uncollated column still PINS the comparison to its
    * own (BINARY) collation when it sits on the left. */
  private def isColumn(e: Expression): Boolean = e match {
    case _: AttributeReference => true
    case c: Cast => isColumn(c.child)
    case c: SqliteCast => isColumn(c.child)
    case u: UnaryPositive => isColumn(u.child)
    case a: Alias => isColumn(a.child)
    case _ => false
  }

  /** Collation for a two-operand comparison: explicit anywhere wins
    * (and was already applied textually); else a LEFT column pins its
    * own collation — including the implicit BINARY of an undeclared
    * column (probed on 3.51: `plain_col = nocase_col` compares
    * BINARY, `'lit' = nocase_col` compares NOCASE); else the right
    * operand's. */
  private def pickColl(l: Expression, r: Expression): Option[String] =
    if (explicitlyCollated(l) || explicitlyCollated(r)) None
    else if (isColumn(l)) collationOf(l)
    else collationOf(r)

  /** Pushable companion for an equality under NOCASE/RTRIM: matching
    * rows must start with the literal's first character (both case
    * variants for NOCASE — trailing-space trimming never changes a
    * first character). Plain ranges on the raw column that reach
    * parquet row-group statistics, like the nocase-LIKE prefilter. */
  private def eqPrefilter(colSide: Expression, litSide: Expression,
      coll: String): Option[Expression] = litSide match {
    case Literal(s: UTF8String, StringType) if s.numChars() > 0 =>
      val c = s.toString.charAt(0)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) None
      else {
        def range(ch: Char): Expression = And(
          GreaterThanOrEqual(Cast(colSide, StringType), Literal(ch.toString)),
          LessThan(Cast(colSide, StringType), Literal((ch + 1).toChar.toString)))
        Some(if (coll == "RTRIM") range(c) else Or(range(c.toLower), range(c.toUpper)))
      }
    case _ => None
  }

  // --------------------------------------------------------- plan pass

  private[engine] def rewritePlan(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f: Filter => f.copy(condition = rewriteExpr(f.condition, pushable = true))
    case j: Join => j.copy(condition = j.condition.map(rewriteExpr(_, pushable = true)))
    case s: Sort => s.copy(order = s.order.map(sortOrder))
    case w: Window => w.copy(
      windowExpressions = w.windowExpressions
        .map(e => rewriteExpr(e, pushable = false).asInstanceOf[NamedExpression]),
      partitionSpec = w.partitionSpec.map(e =>
        collationOf(e).map(wrap(e, _)).getOrElse(rewriteExpr(e, pushable = false))),
      orderSpec = w.orderSpec.map(sortOrder))
    case a: Aggregate => rewriteAggregate(a)
    // INTERSECT / EXCEPT under a collated LEFT column (select.html:
    // compound comparisons use the collation determined for the LEFT
    // select's column — probed: nocase-left matches case variants and
    // answers LEFT-side representatives; binary-left ignores the
    // right side's declared collation). Re-expressed as a semi/anti
    // join on folded NULL-SAFE keys (SQLite set-op membership treats
    // NULLs as equal — probed `SELECT NULL INTERSECT SELECT NULL`
    // answers a row, matching Spark's own semantics) plus a
    // collation-DISTINCT, exprIds preserved. SQLite compounds are
    // always distinct — the ALL variants are Spark-only, untouched.
    case Intersect(l, r, false)
        if l.output.exists(a => collationOf(a).isDefined) =>
      setOpJoin(l, r, semi = true)
    case Except(l, r, false)
        if l.output.exists(a => collationOf(a).isDefined) =>
      setOpJoin(l, r, semi = false)
    case d @ Distinct(child)
        if child.output.exists(a => collationOf(a).isDefined) =>
      // DISTINCT under a collation keeps one representative per
      // collation-equivalence class (which one is arbitrary in SQLite
      // too): re-expressed as a grouped first() that PRESERVES the
      // output attribute ids, so parents are untouched
      val groupings = child.output.map(a =>
        collationOf(a).map(wrap(a, _)).getOrElse(a: Expression))
      val aggs: Seq[NamedExpression] = child.output.map { a =>
        collationOf(a) match {
          case Some(_) => firstOf(a)
          case None => a
        }
      }
      Aggregate(groupings, aggs, child)
    case other => other.mapExpressions(rewriteExpr(_, pushable = false))
  }

  /** INTERSECT/EXCEPT as a folded-key semi/anti join + collation
    * DISTINCT over the left side; the LEFT column's collation wraps
    * BOTH sides. Null-safe keys (set-op membership treats NULLs as
    * equal, like Spark's native operators). */
  private def setOpJoin(l: LogicalPlan, r: LogicalPlan, semi: Boolean): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.EqualNullSafe
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    def fold(leftAttr: Attribute, e: Expression): Expression =
      collationOf(leftAttr).map(wrap(e, _)).getOrElse(e)
    val cond = l.output.zip(r.output).map { case (lc, rc) =>
      EqualNullSafe(fold(lc, lc), fold(lc, rc)): Expression
    }.reduce(And)
    val joined = Join(l, r, if (semi) LeftSemi else LeftAnti,
      Some(cond), JoinHint.NONE)
    val groupings = l.output.map(a =>
      collationOf(a).map(wrap(a, _)).getOrElse(a: Expression))
    val aggs: Seq[NamedExpression] = l.output.map { a =>
      collationOf(a) match {
        case Some(_) => firstOf(a)
        case None => a
      }
    }
    Aggregate(groupings, aggs, joined)
  }

  private def sortOrder(so: SortOrder): SortOrder = {
    val c = rewriteExpr(so.child, pushable = false)
    collationOf(c) match {
      case Some(coll) if !explicitlyCollated(c) => so.copy(child = wrap(c, coll))
      case _ => if (c eq so.child) so else so.copy(child = c)
    }
  }

  /** `first(a)` aliased back to `a`'s own name and exprId, so the
    * rewritten Aggregate's output is indistinguishable upstream. */
  private[engine] def firstOf(a: Attribute): NamedExpression =
    Alias(First(a, ignoreNulls = false).toAggregateExpression(), a.name)(
      exprId = a.exprId, qualifier = a.qualifier,
      explicitMetadata = Some(a.metadata))

  /** GROUP BY under a collation: the grouping expression folds, every
    * bare reference to it in the output becomes first() (SQLite also
    * answers an arbitrary member's value), min/max become min_by/max_by
    * ordered by the folded value, count(DISTINCT) folds its argument. */
  private def rewriteAggregate(a: Aggregate): Aggregate = {
    // (original grouping expr, collation) for each collated key
    val folded: Seq[(Expression, String)] = a.groupingExpressions.flatMap { g =>
      if (explicitlyCollated(g)) None else collationOf(g).map(g -> _)
    }
    val newGrouping = a.groupingExpressions.map { g =>
      folded.find(_._1 eq g) match {
        case Some((_, coll)) => wrap(g, coll)
        case None => rewriteExpr(g, pushable = false)
      }
    }
    def substitute(e: Expression): Expression = e match {
      case ae: AggregateExpression => rewriteAggFunction(ae)
      case _ if folded.exists(_._1.semanticEquals(e)) =>
        First(e, ignoreNulls = false).toAggregateExpression()
      case other => other.mapChildren(substitute)
    }
    val newAggs: Seq[NamedExpression] =
      a.aggregateExpressions.map {
        case attr: AttributeReference if folded.exists(_._1.semanticEquals(attr)) =>
          firstOf(attr)
        case al: Alias =>
          Alias(rewriteExpr(substitute(al.child), pushable = false), al.name)(
            exprId = al.exprId, qualifier = al.qualifier,
            explicitMetadata = al.explicitMetadata)
        case ne => rewriteExpr(substitute(ne), pushable = false)
          .asInstanceOf[NamedExpression]
      }
    a.copy(groupingExpressions = newGrouping, aggregateExpressions = newAggs)
  }

  /** Collation inside an aggregate call: min/max ON a collated column
    * compare folded but ANSWER an original value (min_by/max_by);
    * count(DISTINCT) folds its string arguments (output is a count, so
    * folding is invisible); everything else evaluates per-row and
    * needs nothing. */
  private def rewriteAggFunction(ae: AggregateExpression): AggregateExpression =
    ae.aggregateFunction match {
      case Min(c) if collationOf(c).isDefined && !explicitlyCollated(c) =>
        ae.copy(aggregateFunction = MinBy(c, wrap(c, collationOf(c).get)))
      case Max(c) if collationOf(c).isDefined && !explicitlyCollated(c) =>
        ae.copy(aggregateFunction = MaxBy(c, wrap(c, collationOf(c).get)))
      case cnt: Count if ae.isDistinct &&
          cnt.children.exists(c => collationOf(c).isDefined && !explicitlyCollated(c)) =>
        ae.copy(aggregateFunction = Count(cnt.children.map(c =>
          collationOf(c).filterNot(_ => explicitlyCollated(c))
            .map(wrap(c, _)).getOrElse(c))))
      case _ => ae
    }

  /** Expression-level comparisons: binary comparisons, IN lists and
    * BETWEEN pick their collation by SQLite's operand rules; subquery
    * plans recurse through the full plan pass. */
  private def rewriteExpr(e: Expression, pushable: Boolean): Expression =
    e transformUp {
      case cmp: BinaryComparison =>
        pickColl(cmp.left, cmp.right) match {
          case Some(coll) =>
            val wrapped = cmp.withNewChildren(
              Seq(wrap(cmp.left, coll), wrap(cmp.right, coll)))
            if (!pushable) wrapped
            else {
              // prefilter goes on whichever side is the column
              val pre =
                if (collationOf(cmp.left).isDefined)
                  eqPrefilter(cmp.left, cmp.right, coll)
                else eqPrefilter(cmp.right, cmp.left, coll)
              cmp match {
                case _: org.apache.spark.sql.catalyst.expressions.EqualTo =>
                  pre.map(And(_, wrapped)).getOrElse(wrapped)
                case _ => wrapped
              }
            }
          case None => cmp
        }
      case in @ In(v, list) if !explicitlyCollated(v) && collationOf(v).isDefined =>
        val coll = collationOf(v).get
        In(wrap(v, coll), list.map(wrap(_, coll)))
      case ins @ InSubquery(values, lq)
          if values.length == lq.plan.output.length &&
            values.exists(v => membershipColl(v).isDefined) =>
        // `x IN (SELECT y …)`: the LEFT operand's collation governs
        // membership (lang_expr.html, "The IN and NOT IN operators";
        // VERDICT r10 #6 — this compared BINARY before). Both sides
        // fold: x wraps in place, y wraps through a Project whose
        // aliases take FRESH exprIds (reusing the child's id makes the
        // alias self-referential, and the optimizer then collapses the
        // wrap away — debugged on the optimized plan); ListQuery's
        // childOutputs derive from plan.output, so nothing goes stale.
        val newProj: Seq[NamedExpression] = lq.plan.output.zip(values).map {
          case (o, v) =>
            membershipColl(v) match {
              case Some(coll) => Alias(wrap(o, coll), o.name)()
              case None => o
            }
        }
        val newValues = values.map { v =>
          collationOf(v).filterNot(_ => explicitlyCollated(v))
            .map(wrap(v, _)).getOrElse(v)
        }
        InSubquery(newValues,
          lq.withNewPlan(Project(newProj, lq.plan)))
      case b @ Between(input, lower, upper, _)
          if pickColl(input, lower).isDefined =>
        val coll = pickColl(input, lower).get
        Between(wrap(input, coll), wrap(lower, coll), wrap(upper, coll))
      case s: SubqueryExpression => s.withNewPlan(rewritePlan(s.plan))
    }

  /** Remove every [[CollateBinary]] marker (explicit BINARY collations
    * have done their job: suppressing rules 1–2) so execution sees the
    * raw operand — pushdown and codegen are untouched. */
  private[engine] def stripMarkers(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case n => n.mapExpressions(_.transformUp {
      case CollateBinary(c) => c
      case s: SubqueryExpression => s.withNewPlan(stripMarkers(s.plan))
    })
  }
}
