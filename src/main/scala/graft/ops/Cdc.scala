package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture log compaction: collapse an ordered changelog of
  * upserts and delete tombstones into the current snapshot — the ingest
  * shape of every warehouse mirror (Debezium/Kafka topic → table) and the
  * batch analogue of the reference's last-write-wins JSON re-merge
  * (`legacy/merge_all_to_metadata.py:182-188`, J5) extended with deletes,
  * which J5/q10 cannot express.
  *
  * Semantics: for each key, order the log by `seqCols` (a total order —
  * e.g. (ts, offset)); the LAST entry wins; if that entry is a tombstone
  * the key is absent from the snapshot.
  *
  * Scale shape: ONE hash aggregation — `max_by(payload-struct,
  * seq-struct)` per key — which Spark executes partial/final, so each map
  * task emits at most one row per local key BEFORE the exchange and only
  * per-key winners shuffle. Deliberately NOT a window spelling: a window
  * would sort every log row inside each key partition; the agg is
  * map-side-combinable and never materializes per-key history. Tombstones
  * are dropped AFTER the agg (the tombstone must win first to suppress
  * older upserts). At 100 TB the log is typically also bucketed by key on
  * disk, which this plan inherits for free (the groupBy keys match the
  * bucket keys → no exchange at all).
  */
object Cdc {

  /** Current snapshot of `log`.
    *
    * @param keyCols  entity key columns
    * @param seqCols  total-order columns, highest wins (caller guarantees
    *                 uniqueness per key — Kafka offset, LSN, (ts, seq))
    * @param isDelete tombstone predicate on a log row
    * @param payload  (name, column) payload fields of the winning row
    */
  def compact(log: DataFrame, keyCols: Seq[String], seqCols: Seq[Column],
              isDelete: Column, payload: Seq[(String, Column)]): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty && payload.nonEmpty,
      "keyCols, seqCols and payload must be non-empty")
    val last = struct(
      (seqCols.zipWithIndex.map { case (c, i) => c.as(s"s$i") } :+
        isDelete.as("del")) ++
        payload.map { case (n, c) => c.as(n) }: _*)
    log.groupBy(keyCols.map(col): _*)
      .agg(max(last).as("cdc_last"))
      .filter(!col("cdc_last.del"))
      .select(keyCols.map(col) ++
        seqCols.indices.map(i => col(s"cdc_last.s$i").as(s"seq$i")) ++
        payload.map { case (n, _) => col(s"cdc_last.$n").as(n) }: _*)
  }

  /** Apply a changelog on top of a base snapshot: base rows enter the
    * fold as upserts that sort BELOW every log entry (they lose any
    * collision), then [[compact]] runs over the union — the incremental
    * mirror-refresh step. `baseSeq` must be strictly below every log
    * sequence value (e.g. the snapshot's low-watermark). */
  def applyLog(base: DataFrame, log: DataFrame, keyCols: Seq[String],
               seqCols: Seq[String], baseSeq: Seq[Column],
               isDelete: Column, payload: Seq[String]): DataFrame = {
    val baseAsLog = base.select(
      keyCols.map(col) ++
        baseSeq.zip(seqCols).map { case (c, n) => c.as(n) } ++
        Seq(lit(false).as("cdc_del")) ++ payload.map(col): _*)
    val logNorm = log.select(
      keyCols.map(col) ++ seqCols.map(col) ++
        Seq(isDelete.as("cdc_del")) ++ payload.map(col): _*)
    compact(baseAsLog.unionByName(logNorm), keyCols,
      seqCols.map(col), col("cdc_del"), payload.map(n => n -> col(n)))
  }
}
