package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 intervalization: turn a change-event stream into slowly-changing-
  * dimension history rows — for each key, collapse CONSECUTIVE identical
  * states (gaps-and-islands) and emit one validity interval per island:
  * `(key…, state…, valid_from, valid_to, is_current)` with `valid_to`
  * exclusive (= next island's start) and NULL on the current row.
  *
  * This is the dimension-history twin of the J5 last-write-wins upsert
  * (q10): LWW keeps only the latest version; SCD2 keeps every version with
  * its validity window, the layout warehouse dimension tables need for
  * as-of joins (see q63).
  *
  * Shape: the classic spelling is detect-change → running-sum island id →
  * groupBy(key, island) — TWO shuffles (the window on `key`, the groupBy
  * on `(key, island)`). Here islands are contiguous by construction, so an
  * island's `valid_from` is simply the ord of its FIRST row: filter to
  * change rows and `lead` over the same `key` partitioning. Both windows
  * share one partitioning → ONE shuffle total, and no row ever aggregates
  * (Scd2Spec asserts the single exchange). At 100 TB the stream shuffles
  * once on the entity key and everything after is a sort-local scan.
  */
object Scd2 {

  /** @param ordCol   event ordering column (e.g. a timestamp); intervals
    *                 are [valid_from, valid_to) in this column's units
    * @param tieCol   unique-per-key tiebreak (e.g. event id) making the
    *                 order total when `ordCol` has duplicates
    * @param stateCols the tracked dimension attributes; rows where ALL of
    *                 them equal the key's previous row (null-safe) extend
    *                 the current interval instead of opening a new one */
  def intervalize(df: DataFrame, keyCols: Seq[String], ordCol: String,
      tieCol: String, stateCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && stateCols.nonEmpty, "keys and states required")
    val taken = df.columns.toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val prevC = fresh("scd_prev")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col(tieCol))
    val state = struct(stateCols.map(col): _*)
    val starts = df
      .withColumn(prevC, lag(state, 1).over(w))
      // null-safe inequality: first row per key (lag NULL) opens an island
      .filter(!(state <=> col(prevC)))
      .select((keyCols ++ stateCols).map(col) :+ col(tieCol) :+
        col(ordCol).as("valid_from"): _*)
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col(tieCol))
    starts
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
