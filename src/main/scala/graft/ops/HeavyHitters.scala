package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.MgSketch

/** Exact heavy hitters over an unbounded term stream via the classic
  * two-pass sketch-then-verify shape: a [[graft.plans.MgSketch]] pass
  * yields ≤ k candidates (guaranteed to include every term above the
  * threshold when threshold ≥ W/(k+1)), then an exact recount of ONLY
  * those candidates settles true counts. The final answer is exact —
  * identical to a full `GROUP BY term HAVING` — but the full-stream
  * shuffle of a naive group-by is replaced by:
  *
  *   pass 1: O(k × partitions) sketch bytes to one reducer (no row shuffle);
  *   pass 2: a broadcast semi-join keeps only candidate rows, and map-side
  *           partial aggregation shrinks the exchange to ≤ k rows per
  *           partition.
  *
  * At 100 TB with, say, k = 10⁴ and 10⁵ tasks this is MBs over the wire
  * where the naive plan shuffles the token stream. Entirely in-plan: the
  * candidate array never visits the driver.
  */
object HeavyHitters {

  /** Candidate terms (array exploded to rows) plus the total stream
    * weight, from one aggregation pass. */
  def mgCandidates(stream: DataFrame, termCol: String, weightCol: Column,
                   k: Int): DataFrame =
    stream.agg(MgSketch.sketch(col(termCol), weightCol, k).as("sk"),
        sum(weightCol).as("w_total"))
      .select(explode(col("sk")).as("c"), col("w_total"))
      .select(col("c.term").as(termCol), col("w_total"))

  /** Exact terms with weight × den > W × num. Requires num/den ≥ 1/(k+1)
    * (the MG guarantee window) — enforced. Output: (termCol, cnt), exact.
    * Rows with non-positive weight are ignored EVERYWHERE — the sketch
    * skips them by construction, so the recount and W must too or the
    * exactness guarantee silently breaks on mixed-sign streams. */
  def heavyHitters(stream0: DataFrame, termCol: String, k: Int,
                   num: Long, den: Long,
                   weight: Column = lit(1L)): DataFrame = {
    require(num >= 1 && den >= 1 && (k + 1).toLong * num >= den,
      s"threshold $num/$den below the MG guarantee 1/(k+1) for k=$k")
    val stream = stream0.filter(weight > 0)
    val cands = mgCandidates(stream, termCol, weight, k)
    stream.join(broadcast(cands), Seq(termCol))
      .groupBy(col(termCol))
      .agg(sum(weight).as("cnt"), max(col("w_total")).as("w_total"))
      .filter(col("cnt") * den > col("w_total") * num)
      .select(col(termCol), col("cnt"))
  }

  /** Per-group exact heavy hitters — the sketch as a GROUPED aggregate
    * (one ≤ k-entry MG buffer per key tuple, merged through Spark's
    * partial/final tree): trending terms per language / per day / per
    * source from the same two passes. Threshold and guarantee apply
    * WITHIN each group's stream weight. Output: (keys…, termCol, cnt),
    * exactly the per-group GROUP BY/HAVING answer. */
  def heavyHittersByGroup(stream0: DataFrame, keys: Seq[String],
                          termCol: String, k: Int, num: Long, den: Long,
                          weight: Column = lit(1L)): DataFrame = {
    require(num >= 1 && den >= 1 && (k + 1).toLong * num >= den,
      s"threshold $num/$den below the MG guarantee 1/(k+1) for k=$k")
    require(keys.nonEmpty, "use heavyHitters for the ungrouped case")
    val stream = stream0.filter(weight > 0)
    val cands = stream.groupBy(keys.map(col): _*)
      .agg(MgSketch.sketch(col(termCol), weight, k).as("sk"),
        sum(weight).as("w_total"))
      .select(keys.map(col) :+ explode(col("sk")).as("c") :+ col("w_total"): _*)
      .select(keys.map(col) :+ col("c.term").as(termCol) :+ col("w_total"): _*)
    stream.join(broadcast(cands), keys :+ termCol)
      .groupBy((keys :+ termCol).map(col): _*)
      .agg(sum(weight).as("cnt"), max(col("w_total")).as("w_total"))
      .filter(col("cnt") * den > col("w_total") * num)
      .select((keys :+ termCol).map(col) :+ col("cnt"): _*)
  }
}
