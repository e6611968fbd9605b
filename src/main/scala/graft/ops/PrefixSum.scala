package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe grouped running sums (the sequence-packing ledger).
  *
  * The naive spelling — `sum(v) OVER (PARTITION BY grp ORDER BY ord ROWS
  * UNBOUNDED PRECEDING)` — shuffles EVERY row of a group into one task and
  * sorts it there. For a training-corpus token ledger partitioned by
  * language that is a catastrophe at scale: the dominant language (most of
  * a real corpus) serializes its entire row set through a single core.
  *
  * [[exclusiveRunningSum]] is the classic two-phase parallel prefix sum,
  * spelled declaratively so Catalyst plans every stage distributed:
  *
  *   1. bucket each row by its (already unique, monotone-ordered) long
  *      order key: `bucket = ord div bucketWidth` — deterministic, no
  *      sampling pass, and monotone in `ord`, so bucket order IS row order;
  *   2. per-(group, bucket) subtotals — one narrow partial-aggregated
  *      shuffle of (grp, bucket, sum) rows, ~rows/bucketWidth of them;
  *   3. exclusive bucket offsets: a running sum over the SUBTOTAL table
  *      (rows/bucketWidth rows — metadata-sized; its per-group window is
  *      over bucket counts, not row counts);
  *   4. broadcast the offsets back and add the within-bucket running sum,
  *      whose window partitions by (group, bucket) — every window group
  *      is ≤ ~bucketWidth rows BY CONSTRUCTION, independent of how skewed
  *      the group sizes are.
  *
  * The result is bit-identical to the naive spelling (integer sums are
  * associative), so oracles spelled as the single window still hash-match.
  */
object PrefixSum {

  /** Adds `out` = sum of `value` over all rows of the same `grp` with a
    * strictly smaller `ord` (exclusive prefix sum; `ord` must be a unique
    * long within its group — the usual doc_id contract). */
  def exclusiveRunningSum(df: DataFrame, grp: String, ord: String,
      value: String, out: String, bucketWidth: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // working-column names must not shadow caller columns: withColumn
    // silently REPLACES an existing column of the same name, which would
    // corrupt the join below with no error — uniquify deterministically
    val taken = df.columns.toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val bC = fresh("ps_b"); val tC = fresh("ps_t"); val offC = fresh("ps_off")
    val withB = df.withColumn(bC, expr(s"$ord div ${bucketWidth}L"))
    val sub = withB.groupBy(col(grp), col(bC))
      .agg(sum(col(value)).as(tC))
    val wOff = Window.partitionBy(col(grp)).orderBy(col(bC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = sub
      .withColumn(offC, sum(col(tC)).over(wOff) - col(tC))
      .select(col(grp), col(bC), col(offC))
    val wIn = Window.partitionBy(col(grp), col(bC)).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(off), Seq(grp, bC))
      .withColumn(out,
        col(offC) + sum(col(value)).over(wIn) - col(value))
      .drop(bC, offC)
  }
}
