package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQLite window-frame modes Spark's frames don't speak (SURVEY §2.B
  * windows row: `GROUPS` frames, `EXCLUDE`).
  *
  * GROUPS frames are exactly expressible on Spark: a frame of
  * `GROUPS BETWEEN p PRECEDING AND f FOLLOWING` contains all peer
  * groups within p..f of the current row's group, and "group" is the
  * dense rank of the ORDER BY key — so the same bounds as a RANGE
  * frame over `dense_rank()` reproduce it exactly (two window passes,
  * both partition-parallel; nothing leaves the partition, so the 100 TB
  * shape is identical to any other windowed aggregation).
  *
  * `EXCLUDE CURRENT ROW` composes on top for invertible aggregates:
  * frame_sum − current row's value (demonstrated by q52); `EXCLUDE
  * GROUP` subtracts the current group's aggregate (the dense-rank
  * column this helper leaves available makes that a groupBy join).
  * Non-invertible aggregates (min/max) under EXCLUDE stay unsupported —
  * documented deviation, unused by the reference corpus.
  */
object WindowCompat {

  /** Add `out` = `agg` over a GROUPS-mode frame of
    * (`precedingGroups` PRECEDING, `followingGroups` FOLLOWING) with
    * the given partitioning and ORDER BY key. */
  def groupsFrameAgg(
      df: DataFrame,
      out: String,
      agg: Column,
      partitionCols: Seq[Column],
      orderCol: Column,
      precedingGroups: Long,
      followingGroups: Long): DataFrame = {
    require(precedingGroups >= 0 && followingGroups >= 0,
      "frame bounds are non-negative group offsets")
    val dr = "_groups_dense_rank"
    val rankW = Window.partitionBy(partitionCols: _*).orderBy(orderCol)
    val frameW = Window.partitionBy(partitionCols: _*).orderBy(col(dr))
      .rangeBetween(-precedingGroups, followingGroups)
    df.withColumn(dr, dense_rank().over(rankW).cast("long"))
      .withColumn(out, agg.over(frameW))
      .drop(dr)
  }

  /** GROUPS-frame SUM, decomposed for scale (r17): aggregate per
    * (partition, order-key) GROUP first — a shuffle-parallel hash
    * aggregation over every core — run the GROUPS frame as a ROWS
    * window over the DISTINCT groups (one row per group, so ROWS ≡
    * GROUPS), and join the per-group frame sums back. The naive
    * single-window form ([[groupsFrameAgg]]) serializes on partition
    * parallelism: a 3-value partition column runs 3 tasks no matter
    * the cluster size, with every raw row passing through the sort.
    * Here the serial window is proportional to the distinct group
    * count and the joined-back side broadcasts. Sum-decomposable
    * aggregates only; null order keys form their own peer group,
    * matched with null-safe equality. */
  def groupsFrameSum(
      df: DataFrame,
      out: String,
      valueCol: Column,
      partitionCols: Seq[Column],
      orderCol: Column,
      precedingGroups: Long,
      followingGroups: Long): DataFrame = {
    require(precedingGroups >= 0 && followingGroups >= 0,
      "frame bounds are non-negative group offsets")
    val pNames = partitionCols.indices.map(i => s"_gf_p$i")
    val oName = "_gf_o"
    val keyed = df.select(
      (partitionCols.zip(pNames).map { case (c, n) => c.as(n) } :+
        orderCol.as(oName) :+ valueCol.as("_gf_v")): _*)
    val frameW = Window.partitionBy(pNames.map(col): _*).orderBy(col(oName))
      .rowsBetween(-precedingGroups, followingGroups)
    val frames = keyed
      .groupBy((pNames :+ oName).map(col): _*)
      .agg(sum(col("_gf_v")).as("_gf_gsum"))
      .withColumn(out, sum(col("_gf_gsum")).over(frameW))
      .drop("_gf_gsum")
    // no broadcast hint: group count can reach raw-row cardinality
    // when the order key is near-unique — AQE picks broadcast when the
    // frame side is actually small
    val cond = partitionCols.zip(pNames).map { case (c, n) => c <=> col(n) }
      .reduceOption(_ && _).getOrElse(lit(true)) && (orderCol <=> col(oName))
    df.join(frames, cond, "left")
      .drop((pNames :+ oName): _*)
  }
}
