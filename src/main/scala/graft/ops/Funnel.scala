package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis over an event stream: for each user,
  * did step 1 happen, then step 2 strictly after it, then step 3 after
  * that… Earliest-qualifying timestamps are chained greedily — for a fixed
  * step order the earliest chain is maximally permissive, so `min` per
  * step is the exact semantics, not an approximation.
  *
  * Spelled as a fold of filter → join → min-aggregate stages, all keyed on
  * the user column: each stage shuffles ONLY the rows matching that step's
  * predicate (the candidate set shrinks monotonically down the funnel),
  * never the whole stream, and every shuffle reuses the same key so
  * co-partitioning carries across stages. AQE flips the later, smaller
  * stages to broadcast joins at runtime. No window over the full stream,
  * no per-user event collection — a power user with 10⁸ events costs
  * min-aggregates, not an array.
  */
object Funnel {

  /** Per-user first-completion times: one row per user who completed step
    * 1, with `t1 … tn` (null from the first uncompleted step on). Steps
    * are (name, predicate) pairs; predicates see the raw event columns. */
  def stepTimes(events: DataFrame, userCol: String, tsCol: String,
                steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.map(_._1).distinct.size == steps.size,
      s"duplicate step names: ${steps.map(_._1).mkString(", ")}")
    val first = events.filter(steps.head._2)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t_${steps.head._1}"))
    steps.tail.zipWithIndex.foldLeft((first, s"t_${steps.head._1}")) {
      case ((acc, prevT), ((name, pred), _)) =>
        val t = s"t_$name"
        val next = events.filter(pred)
          .join(acc.select(col(userCol), col(prevT)), userCol)
          .filter(col(tsCol) > col(prevT))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(t))
        (acc.join(next, Seq(userCol), "left"), t)
    }._1
  }

  /** Funnel counts: (stage, step, users) — users whose chain reached each
    * step, cumulative by construction (non-null tᵢ implies non-null tᵢ₋₁). */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   steps: Seq[(String, Column)]): DataFrame = {
    val times = stepTimes(events, userCol, tsCol, steps)
    val counts = times.agg(
      count(col(s"t_${steps.head._1}")).as(s"n_${steps.head._1}"),
      steps.tail.map(s => count(col(s"t_${s._1}")).as(s"n_${s._1}")): _*)
    // one row per step from ONE pass over the chain (an explode, not a
    // union of selects — the union spelling would recompute the join
    // chain once per stage)
    counts.select(explode(array(steps.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(i + 1).as("stage"), lit(name).as("step"),
          col(s"n_$name").as("users"))
      }: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.step").as("step"),
        col("r.users").as("users"))
  }
}
