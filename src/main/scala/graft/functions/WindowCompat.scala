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
}
