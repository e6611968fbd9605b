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
    val withB = df.withColumn("ps_b", expr(s"$ord div ${bucketWidth}L"))
    val sub = withB.groupBy(col(grp), col("ps_b"))
      .agg(sum(col(value)).as("ps_t"))
    val wOff = Window.partitionBy(col(grp)).orderBy(col("ps_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = sub
      .withColumn("ps_off", sum(col("ps_t")).over(wOff) - col("ps_t"))
      .select(col(grp), col("ps_b"), col("ps_off"))
    val wIn = Window.partitionBy(col(grp), col("ps_b")).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(off), Seq(grp, "ps_b"))
      .withColumn(out,
        col("ps_off") + sum(col(value)).over(wIn) - col(value))
      .drop("ps_b", "ps_off")
  }
}
