package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The legacy chain's merge stages (SURVEY.md §3.2/§3.3) as library
  * operators.
  *
  * Scale notes: the upsert is one shuffle on the key (window dedup, no
  * driver state); the final merge is a filter + inner join + global
  * ordered limit — `limit` after sort is a CollectLimit at small N and a
  * TakeOrderedAndProject when Catalyst can fuse them.
  */
object LegacyMerge {

  /** J5 last-write-wins upsert (`merge_all_to_metadata.py:142-151,
    * 182-188`): rows from `updates` overwrite same-key rows of `base`.
    * Deterministic via the explicit generation priority, spelled as the
    * q10 window dedup. Both inputs must share a schema. */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
             orderCols: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col("__gen").desc +: orderCols): _*)
    base.withColumn("__gen", lit(0))
      .unionByName(updates.withColumn("__gen", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__gen")
  }

  /** J3+F1+O5 final train merge (`merge_final_train_metadata.py:9-22`):
    * keep records at or above `threshold`, inner-join bucketing metadata,
    * overwrite `tags` with `ordered_tags`, take the first `n` in
    * `orderCols` order (the deterministic spelling of the reference's
    * insertion-order break). */
  def finalTrainMerge(data: DataFrame, lat: DataFrame, keyCol: String,
                      threshold: Double, n: Int, orderCols: Seq[Column]): DataFrame =
    data.filter(col("aesthetic_score") >= threshold)
      .join(lat, Seq(keyCol))
      .withColumn("tags", col("ordered_tags"))
      .orderBy(orderCols: _*)
      .limit(n)
}
