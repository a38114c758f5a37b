package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow bridge to two `private[sql]` constructors the SQLite dialect
  * layer needs: building a DataFrame from a rewritten parsed plan, and a
  * Column from a rewritten parsed expression. Spark exposes both shapes
  * publicly only through the SQL text path (`spark.sql`, `expr`), which
  * would bypass the dialect rewrite — this file exists solely so the
  * rewrite can sit between the parser and the analyzer, which is the
  * injection point Spark itself uses for dialect work. No other Spark
  * internals are touched.
  */
object SqlInternals {
  /** DataFrame from an (unresolved) logical plan — the analyzer runs as
    * part of the Dataset construction, exactly like `spark.sql`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column wrapping an (unresolved) expression — like `functions.expr`
    * but taking the expression tree instead of SQL text. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The expression tree under a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Evaluate a SINGLE-STAGE, single-partition physical plan ON THE
    * DRIVER THREAD — no job, no task launch, no scheduler round trip.
    *
    * The serving path (TroughEngine.read over a per-segment cache of
    * LocalRelation-backed views) plans tiny narrow pipelines whose only
    * execution cost under normal `collect()` is the ~10 ms local-mode
    * job floor — a 100× overhead against the reference's µs sqlite
    * reads. Those pipelines need nothing from the cluster: this
    * computes the RDD's one partition in-process under a real
    * [[TaskContextImpl]] (with a live TaskMemoryManager, so codegen'd
    * aggregates and sorters acquire pages normally) and converts the
    * rows out. Returns None — caller falls back to the distributed
    * path — when the plan shuffles, has >1 partition, or anything at
    * all goes wrong mid-compute.
    *
    * Rows materialize eagerly inside the task-context window (lazy
    * iteration after `unset` would strand memory-consumer callbacks);
    * that matches `toLocalIterator`'s memory profile, which also holds
    * one whole partition driver-side. */
  /** Compute a no-shuffle physical plan's InternalRows ON THE DRIVER,
    * iterating its partitions sequentially under one TaskContext — no
    * job, no task launch. For the serving path's context-build
    * snapshot of a SMALL table (a trough segment database), the
    * scheduler round trips dominated: a `limit(cap).executeCollect()`
    * over the handful of tiny part files a segment table has cost
    * 40-110 ms (CollectLimit escalation = one sequential job per
    * round; ServeProbe r19), vs single-digit ms reading the same
    * partitions in-process. Returns None — caller falls back to the
    * job path — when the plan shuffles, has more than `maxPartitions`
    * partitions, yields more than `maxRows` rows (bails mid-iteration,
    * so an over-cap table costs at most cap+1 rows of work), or
    * anything at all goes wrong. */
  def driverLocalInternalRows(df: DataFrame, maxRows: Int,
      maxPartitions: Int = 64)
      : Option[Seq[org.apache.spark.sql.catalyst.InternalRow]] = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    try {
      val plan = df.queryExecution.executedPlan
      if (plan.exists(_.isInstanceOf[ShuffleExchangeLike])) return None
      val rdd = plan.execute()
      val parts = rdd.partitions
      if (parts.length == 0) return Some(Seq.empty) // empty relation
      if (parts.length > maxPartitions) return None
      val env = org.apache.spark.SparkEnv.get
      if (env == null) return None
      val tmm = new org.apache.spark.memory.TaskMemoryManager(
        env.memoryManager, Long.MaxValue)
      // taskAttemptId MUST be BlockInfo.NON_TASK_WRITER (-1024): it is
      // the only id BlockInfoManager pre-registers, and block-lock
      // bookkeeping (e.g. the parquet scan's Hadoop-conf broadcast
      // read) NPEs on any unregistered id — which silently kicked
      // every parquet-backed snapshot off this fast path (r20).
      val ctx = new org.apache.spark.TaskContextImpl(0, 0, 0, -1024L, 0, 1,
        tmm, new java.util.Properties, null,
        org.apache.spark.executor.TaskMetrics.empty, 1, Map.empty)
      org.apache.spark.TaskContext.setTaskContext(ctx)
      try {
        val buf = new scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.catalyst.InternalRow]
        var p = 0
        while (p < parts.length) {
          val it = rdd.iterator(parts(p), ctx)
          while (it.hasNext) {
            buf += it.next().copy()
            if (buf.length > maxRows) return None
          }
          p += 1
        }
        Some(buf.toSeq)
      } finally {
        try ctx.markTaskCompleted(None)
        catch { case scala.util.control.NonFatal(_) => () }
        org.apache.spark.TaskContext.unset()
        tmm.cleanUpAllAllocatedMemory()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def driverLocalRows(df: DataFrame): Option[Iterator[org.apache.spark.sql.Row]] = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    try {
      val plan = df.queryExecution.executedPlan
      if (plan.exists(_.isInstanceOf[ShuffleExchangeLike])) return None
      val rdd = plan.execute()
      // an empty relation's RDD has ZERO partitions (empty
      // LocalTableScan) — that's a trivially computable empty result,
      // not a reason to fall back to a scheduled job (r19: empty
      // segment tables are the common case in a provisioned universe)
      if (rdd.getNumPartitions == 0) return Some(Iterator.empty)
      if (rdd.getNumPartitions != 1) return None
      val env = org.apache.spark.SparkEnv.get
      if (env == null) return None
      val tmm = new org.apache.spark.memory.TaskMemoryManager(
        env.memoryManager, Long.MaxValue)
      // taskAttemptId MUST be BlockInfo.NON_TASK_WRITER (-1024): it is
      // the only id BlockInfoManager pre-registers, and block-lock
      // bookkeeping (e.g. the parquet scan's Hadoop-conf broadcast
      // read) NPEs on any unregistered id — which silently kicked
      // every parquet-backed snapshot off this fast path (r20).
      val ctx = new org.apache.spark.TaskContextImpl(0, 0, 0, -1024L, 0, 1,
        tmm, new java.util.Properties, null,
        org.apache.spark.executor.TaskMetrics.empty, 1, Map.empty)
      org.apache.spark.TaskContext.setTaskContext(ctx)
      try {
        val it = rdd.iterator(rdd.partitions(0), ctx)
        val buf = new scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.catalyst.InternalRow]
        while (it.hasNext) buf += it.next().copy()
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(df.schema)
        Some(buf.iterator.map(r => conv(r).asInstanceOf[org.apache.spark.sql.Row]))
      } finally {
        try ctx.markTaskCompleted(None)
        catch { case scala.util.control.NonFatal(_) => () }
        org.apache.spark.TaskContext.unset()
        tmm.cleanUpAllAllocatedMemory()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
