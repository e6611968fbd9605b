package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming funnel: the [[graft.ops.Funnel]] semantics as per-user
  * custom state (`flatMapGroupsWithState`) — state is ONE (stage, lastTs)
  * pair per user, advanced greedily as events arrive, so a conversion
  * dashboard follows the live stream without re-scanning history.
  *
  * Greedy advancement is exactly the batch operator's earliest-chain
  * semantics when each user's events are processed in event-time order —
  * guaranteed within a micro-batch (explicit sort) and across batches by
  * the usual in-order-per-key delivery contract of a funnel stream (the
  * same assumption the batch/stream equivalence tests pin). State never
  * grows: stage is an int bounded by the step count, so a billion users
  * cost a billion fixed-size entries — RocksDB territory, same provider
  * switch as the dedup gate.
  */
object FunnelStream {

  final case class FEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                       event_type: String, value: Double)
  final case class FunnelState(stage: Int, lastTsMicros: Long)
  final case class UserStage(user_id: Long, stage: Int)

  /** Full-precision micros (Timestamp.getTime truncates to millis). */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Per-user current stage after each micro-batch (Update mode). Steps
    * are predicates over the raw event; an event advances at most one
    * stage (the next step's match must sit strictly after the previous
    * step's matched timestamp). */
  def stageUpdates(events: DataFrame, steps: Seq[FEv => Boolean]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value")).as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, UserStage](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[FEv], state: GroupState[FunnelState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val init = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val end = sorted.foldLeft(init) { (st, e) =>
            if (st.stage < steps.length && steps(st.stage)(e) &&
              (st.stage == 0 || micros(e.ts) > st.lastTsMicros))
              FunnelState(st.stage + 1, micros(e.ts))
            else st
          }
          state.update(end)
          Iterator(UserStage(uid, end.stage))
      }.toDF()
  }

  /** Funnel counts (stage, step, users) from per-user final stages —
    * stage is monotone across updates, so max() per user reads the final
    * state even from an Update-mode sink that appended one row per
    * micro-batch. */
  def countsFromStages(stages: DataFrame, stepNames: Seq[String]): DataFrame = {
    require(stepNames.nonEmpty, "need at least one funnel step")
    val finalStage = stages.groupBy(col("user_id"))
      .agg(max(col("stage")).as("stage"))
    val aggs = stepNames.zipWithIndex.map { case (name, i) =>
      // coalesce: sum over an EMPTY stage table is null, but an empty
      // stream's funnel counts are 0 (matching the batch operator)
      coalesce(sum(when(col("stage") >= i + 1, 1L).otherwise(0L)), lit(0L))
        .as(s"n_$name") }
    finalStage.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stepNames.zipWithIndex.map { case (name, i) =>
        struct(lit(i + 1).as("stage"), lit(name).as("step"),
          col(s"n_$name").as("users"))
      }: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.step").as("step"),
        col("r.users").as("users"))
  }

  /** Drain the streaming funnel over the events file stream with
    * AvailableNow into a memory sink; returns the final funnel counts.
    * Oracle-equivalent to the batch q117 plan. */
  def funnelAvailableNow(spark: SparkSession, sfDir: String,
                         steps: Seq[(String, FEv => Boolean)],
                         statePartitions: Int = 4): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val name = "graft_stream_funnel"
    val q = stageUpdates(EventStream.read(ss, sfDir), steps.map(_._2))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    countsFromStages(ss.table(name), steps.map(_._1))
      .orderBy(col("stage"))
  }
}
