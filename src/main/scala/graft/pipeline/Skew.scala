package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation helpers.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * cover the two shapes it can't:
  *  - a hot key in a *broadcast-averse* equi-join (dim too big to
  *    broadcast, one key carrying a large fraction of the fact side):
  *    [[saltedJoin]] spreads each key over `salts` reducers by joining
  *    on (key, salt) with the right side replicated per salt.
  *  - a hot key under a *holistic* aggregation (collect_list and
  *    friends): partial aggregation combines map-side, but the final
  *    merge of a hot key still lands on ONE reducer holding the whole
  *    group; [[saltedCollectList]] merges in two phases so no single
  *    task ever materializes more than ~1/salts of the hot group.
  *
  * Salts are derived deterministically from a caller-named column
  * (`xxhash64 % salts`) — `rand()` salts change under task retry and
  * can duplicate or drop rows in recomputed partitions.
  */
object Skew {

  /** Equi-join `left.leftKey == right.rightKey` with `salts`-way key
    * spreading: left rows get `salt = xxhash64(saltSource) % salts`,
    * right rows are replicated once per salt value, and the join adds
    * `salt` to the key. Results are identical to the plain join; the
    * shuffle for a hot key is `salts`-way parallel instead of one
    * reducer. Right-side cost: `salts ×` replication — use for modest
    * dimension sides that are still over the broadcast threshold. */
  def saltedJoin(
      left: DataFrame, leftKey: String, saltSource: String,
      right: DataFrame, rightKey: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("_salt") === r("_salt"))
      .drop(l("_salt")).drop(r("_salt"))
  }

  /** Two-phase collect_list for hot grouping keys: phase 1 collects per
    * (key, salt), phase 2 flattens the partials per key. Output lists
    * are sorted — collect_list order is nondeterministic anyway, and a
    * sorted contract makes the salted and unsalted forms comparable
    * (and oracle-checkable). */
  def saltedCollectList(
      df: DataFrame, keyCol: String, valCol: String, saltSource: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    df.withColumn("_salt", pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(collect_list(col(valCol)).as("_part"))
      .groupBy(col(keyCol))
      .agg(array_sort(flatten(collect_list(col("_part")))).as(s"${valCol}_list"))
  }
}
