package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10 extension): the `events`
  * table as a stream — tumbling-window aggregation and stateful
  * sessionization, with the batch plans they must agree with.
  *
  * The reference has no streaming; its closest analogue is incremental
  * batch (J5 upsert re-runs, `legacy/merge_all_to_metadata.py:182-188`).
  * This module supplies the Spark-native streaming shape: `readStream` →
  * event-time window agg → sink, and `flatMapGroupsWithState` for custom
  * session state. The q55 driver query runs the windowed agg with
  * Trigger.AvailableNow into a memory sink and is checked against the SAME
  * DuckDB oracle as the batch q08 — stream/batch agreement is the
  * correctness statement.
  *
  * Scale notes: the window agg is a streaming hash agg keyed by (window,
  * event_type) — state size = live windows × types, independent of input
  * volume; with a watermark (see [[hourlyWatermarked]]) state is evicted
  * hour by hour. Sessionization state is one small record per active user.
  */
object EventStream {

  /** Streaming read of `events.parquet`, normalized to the same canonical
    * `ts: TIMESTAMP` as the batch loader. A file stream needs an explicit
    * schema, and the testdata's physical `ts` encoding has drifted across
    * rounds (NANOS int64 → TIMESTAMP → TIMESTAMP_NTZ) — a hardcoded schema
    * turned that drift into silently-wrong windows (round-8 verdict). So
    * sniff the schema from a one-footer batch read (cheap: footer only, no
    * row groups), then apply `Tables.normalizeTs` — the ONE place that owns
    * the encoding dispatch — so stream and batch can never disagree. */
  def read(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sniffed = spark.read.parquet(s"$sfDir/events.parquet").schema
    // The file-stream source wants a directory or glob (a bare file path is
    // rejected: "Option 'basePath' must be a directory"), so glob the file.
    val raw = spark.readStream.schema(sniffed)
      .parquet(s"$sfDir/events.parque[t]")
    graft.Tables.normalizeTs(raw)
  }

  /** Tumbling 1-hour window aggregation — works unchanged on a batch or
    * streaming DataFrame (same plan the q08 batch query declares via
    * date_trunc). */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** The watermarked append-mode variant (10-minute lateness bound): the
    * production shape — state for an hour window is dropped once the
    * watermark passes its end. Complete-mode q55 doesn't need it because
    * AvailableNow drains a finite input. */
  def hourlyWatermarked(events: DataFrame): DataFrame =
    hourly(events.withWatermark("ts", "10 minutes"))

  /** A child session with a small shuffle/state partition count. Streaming
    * state is partitioned by `spark.sql.shuffle.partitions` AT QUERY START
    * (baked into the checkpoint); the hourly agg keeps ~3.4k (window, type)
    * state rows, so the session's 32-wide shuffle buys nothing and costs a
    * state-store file + task per partition per micro-batch — most of q55's
    * fixed overhead (VERDICT r3 next-round #2). `newSession` shares the
    * SparkContext but scopes the conf, so the caller's session is never
    * mutated. At real volume, size this to state row count, not input. */
  private def scopedSession(spark: SparkSession, statePartitions: Int,
      rocksDb: Boolean = false): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // RocksDB state store: the default provider holds every state row in
    // executor HEAP — fine for windowed aggs (state ~ live windows), fatal
    // for key-cardinality state (streaming dedup over billions of keys).
    // RocksDB keeps state on local disk with an in-memory working set, so
    // state size is bounded by disk, not heap — the only viable provider
    // for the dedup gate at corpus scale.
    if (rocksDb) ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss
  }

  /** Run [[hourly]] over the streaming source with Trigger.AvailableNow
    * into a memory sink; returns the drained result. Oracle-equivalent to
    * the batch q08. */
  def hourlyAvailableNow(spark: SparkSession, sfDir: String,
                         statePartitions: Int = 4): DataFrame = {
    val ss = scopedSession(spark, statePartitions)
    val name = "graft_stream_hourly"
    val q = hourly(read(ss, sfDir))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
      .orderBy(col("hour"), col("event_type"))
  }

  /** The production shape of q55 — append mode + watermark eviction — made
    * testable: stage the events into THREE parquet files ordered by mtime
    * (all on-time rows; an EMPTY bridge file; a planted late cohort ≥2h
    * older than the corpus max), drained with `maxFilesPerTrigger=1` so
    * each file is its own micro-batch. The late cohort lands behind the
    * watermark and is DROPPED (the eviction semantics Complete mode never
    * exercises), and only windows whose end the final watermark passed are
    * emitted. Both effects are deterministic functions of the input, so the
    * whole run has a closed-form SQL oracle (q140):
    *   emitted = hourly agg over {rows NOT in the late cohort}
    *             where window_end <= max(ts) - 10min.
    *
    * The empty bridge batch is load-bearing: Spark filters late events
    * with the PREVIOUS batch's watermark (`watermarkForLateEvents` — one
    * batch behind the eviction watermark, SPARK-24699 semantics; verified
    * empirically here: with only two batches the late cohort sails through
    * with `numRowsDroppedByWatermark = 0`). Batch 0 establishes max event
    * time, batch 1 (zero rows) rotates that into the late-filter position,
    * batch 2's late rows then land behind it and drop.
    *
    * The late-cohort predicate (`user_id % 50 == 0 AND ts <= max - 2h`)
    * guarantees the global max ts is in batch 0, so the late-filter
    * watermark is max(ts) - 10min and every planted row is unambiguously
    * beyond it (2h >> 10min) — no boundary races. The 1-row max(ts) probe
    * is a driver-side scalar, same class as the manifest probes. */
  /** Stage `batches` as ONE parquet file per micro-batch (ascending
    * mtimes force FileStreamSource order) and open the
    * `maxFilesPerTrigger=1` file stream over them — the shared arrival
    * plumbing of every deterministic drain here ([[hourlyLateDrain]],
    * [[clickPurchaseLeftJoinDrain]], [[upsertSnapshotAvailableNow]]). */
  private def stagedStream(ss: SparkSession,
      batches: Seq[DataFrame]): DataFrame = {
    import org.apache.hadoop.fs.Path
    val stage = java.nio.file.Files.createTempDirectory("graft_staged").toString
    val streamDir = new Path(stage, "in")
    val fs = streamDir.getFileSystem(ss.sparkContext.hadoopConfiguration)
    fs.mkdirs(streamDir)
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = new Path(stage, s"tmp_$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.globStatus(new Path(tmp, "part-*"))(0).getPath
      val dst = new Path(streamDir, f"b$i%03d.parquet")
      fs.rename(part, dst)
      fs.setTimes(dst, 1000000L * (i + 1), -1)
      fs.delete(tmp, true)
    }
    ss.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
  }

  def hourlyLateDrain(spark: SparkSession, sfDir: String,
                      statePartitions: Int = 4): DataFrame = {
    val ss = scopedSession(spark, statePartitions)
    val events = graft.Tables.events(ss, sfDir)
    val maxTs = events.agg(max(col("ts")).as("mx")).head().getTimestamp(0)
    val lateCut = java.sql.Timestamp.from(maxTs.toInstant.minusSeconds(2 * 3600))
    val isLate = col("user_id") % 50 === 0 && col("ts") <= lit(lateCut)
    val stream = stagedStream(ss, Seq(
      events.filter(!isLate),
      events.filter(lit(false)), // bridge
      events.filter(isLate)))
    val name = "graft_stream_late"
    val q = hourlyWatermarked(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("hour"), col("event_type"))
  }

  // ---- streaming exact dedup (the LLM dedup operator's streaming shape) ----

  /** Watermarked streaming dedup: `dropDuplicatesWithinWatermark` keeps ONE
    * state entry per key inside the lateness horizon — state is bounded by
    * the key cardinality of the watermark window, not the stream length
    * (keys recurring after eviction re-emit, the documented semantics of
    * bounded-state dedup). The projection to the key columns makes the
    * output deterministic: WHICH physical row survives per key is a race,
    * but its key is not — so the batch oracle is a plain DISTINCT. */
  def dedupKeys(events: DataFrame, keys: Seq[String],
                lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys)
      .select(keys.map(col): _*)

  /** Drain [[dedupKeys]] over the file stream with AvailableNow.
    * `rocksDb = true` runs the drain on the RocksDB state store — the
    * required provider when the dedup key cardinality outgrows executor
    * heap (StreamingSpec proves provider-independence of the result). */
  def dedupKeysAvailableNow(spark: SparkSession, sfDir: String, keys: Seq[String],
                            statePartitions: Int = 4,
                            rocksDb: Boolean = false): DataFrame = {
    val ss = scopedSession(spark, statePartitions, rocksDb)
    val name = "graft_stream_dedup"
    val q = dedupKeys(read(ss, sfDir), keys)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(keys.map(col): _*)
  }

  // ---- stream-stream join ----

  /** Watermarked stream-stream join: each click joined to the same
    * user's purchases within the following 10 minutes. Both sides carry a
    * 1-hour watermark, so join state for a click is dropped once the
    * purchase-side watermark passes click_ts + 10min — bounded state at
    * any input rate. Batch-equivalence is checked in StreamingSpec.
    *
    * `joinType` supports `"inner"` (matches emit eagerly) and
    * `"left_outer"` — the hardest streaming-join semantics: an unmatched
    * click's NULL row can only be emitted when the watermark proves no
    * in-window purchase can still arrive, i.e. at state EVICTION, one
    * batch after the watermark passes click_ts + 10min. Use
    * [[clickPurchaseLeftJoinDrain]] to drain it deterministically. */
  def clickPurchaseJoin(events: DataFrame, joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
        joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Drain the LEFT OUTER [[clickPurchaseJoin]] deterministically — the
    * null-emission-at-watermark semantics made oracle-checkable.
    *
    * Spark emits an unmatched click's NULL row only when its join state
    * is EVICTED, which needs (a) the watermark to advance past
    * click_ts + 10min — something a finite drain of the raw input never
    * guarantees for the newest clicks — and (b) a further micro-batch to
    * run with that watermark (late-filter one batch behind,
    * SPARK-24699, same as [[hourlyLateDrain]]'s bridge). So the input is
    * staged as mtime-ordered files, one micro-batch each:
    *
    *   b0  all real events PLUS two SENTINEL rows (a click and a
    *       purchase, `user_id` −1/−2) 10 h past the corpus max — the
    *       late filter runs with the watermark at batch START (zero for
    *       b0), so the sentinels can ride with the real rows without
    *       affecting any in-batch match, and each side's watermark node
    *       sees the advance when b0 completes (the query watermark is
    *       their min);
    *   b1  empty bridge — rotates the advance into the effective
    *       watermark and evicts, emitting every real unmatched click's
    *       NULL row (10 h ≫ the 1 h delay + 10 min window, so no
    *       boundary races).
    *
    * (Previously four staged batches — sentinels and a trailing safety
    * batch each their own micro-batch; each batch costs a full state
    * round-trip of every join state store plus offset/commit WAL writes,
    * so the fold halves the drain's fixed cost. Guide §5: the driver
    * does less protocol work per result.)
    *
    * The sentinel click itself never evicts (nothing outruns it), never
    * emits, and is filtered by `user_id >= 0` regardless — so the drain
    * equals the plain BATCH left join, which is the q150 oracle. The
    * 1-row max(ts) probe is a driver-side scalar, same class as the
    * manifest probes. */
  def clickPurchaseLeftJoinDrain(spark: SparkSession, sfDir: String,
                                 statePartitions: Int = 8): DataFrame = {
    val ss = scopedSession(spark, statePartitions)
    val events = graft.Tables.events(ss, sfDir)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val farTs = java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(10 * 3600))
    val sentinels = ss.range(1).select(
        lit(-1L).as("event_id"), lit(farTs).as("ts"), lit(-1L).as("user_id"),
        lit("click").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
      .unionByName(ss.range(1).select(
        lit(-2L).as("event_id"), lit(farTs).as("ts"), lit(-2L).as("user_id"),
        lit("purchase").as("event_type"), lit(0.0).as("value"), lit("{}").as("props")))
      .select(events.columns.map(col).toIndexedSeq: _*) // canonical column order
    val stream = stagedStream(ss, Seq(
      events.unionByName(sentinels),
      events.filter(lit(false)))) // bridge: evicts + emits NULL rows
    val name = "graft_stream_ssjoin_left"
    val q = clickPurchaseJoin(stream, "left_outer")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Drain [[clickPurchaseJoin]] over the file stream with AvailableNow. */
  def clickPurchaseJoinAvailableNow(spark: SparkSession, sfDir: String,
                                    statePartitions: Int = 8): DataFrame = {
    val ss = scopedSession(spark, statePartitions)
    val name = "graft_stream_ssjoin"
    val q = clickPurchaseJoin(read(ss, sfDir))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  // ---- foreachBatch upsert sink (J5's streaming analogue) ----

  /** The reference's incremental re-run upsert
    * (`legacy/merge_all_to_metadata.py:182-188`: load prior state, new
    * records overwrite by key) as a streaming foreachBatch sink: each
    * micro-batch window-dedups against the current state parquet and
    * rewrites it, newest batch winning per key. At cluster scale the
    * rewrite becomes a transactional-table MERGE; the dedup logic
    * (union + row_number over priority) is identical — same pattern as
    * the q10 batch upsert. */
  def upsertAvailableNow(spark: SparkSession, sfDir: String, stateDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = read(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sp = batch.sparkSession
        val cur = new org.apache.hadoop.fs.Path(stateDir)
        val fs = cur.getFileSystem(sp.sparkContext.hadoopConfiguration)
        // CRASH RECOVERY before the prior read: the promote dance below can
        // die between rename(cur→old) and rename(tmp→cur), leaving cur
        // absent. Treating that as "first batch" would discard all
        // accumulated state the moment the next batch commits and deletes
        // _old — so restore a generation first. A fully-written _next
        // (it carries parquet's _SUCCESS marker) is the merged result of
        // the interrupted batch, which the stream WILL replay: promoting
        // it is idempotent (the replayed merge is a no-op re-merge).
        // Otherwise fall back to _old, the pre-batch state.
        val old = new org.apache.hadoop.fs.Path(stateDir + "_old")
        val tmp = new org.apache.hadoop.fs.Path(stateDir + "_next")
        if (!fs.exists(cur)) {
          if (fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) fs.rename(tmp, cur)
          else if (fs.exists(old)) fs.rename(old, cur)
        }
        // Missing state dir = first batch (empty prior); any OTHER read
        // failure (IO error, corrupt parquet) must fail the batch — a
        // catch-all here would silently discard all accumulated state.
        val prior =
          if (fs.exists(cur)) sp.read.parquet(stateDir).withColumn("gen", lit(0L))
          else sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            batch.schema).withColumn("gen", lit(0L))
        val w = Window.partitionBy(col("user_id")).orderBy(col("gen").desc, col("ts").desc,
          col("event_id").desc)
        val merged = prior.unionByName(batch.withColumn("gen", lit(id + 1)))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn", "gen")
        // Write the new generation beside the old, then promote: move the
        // old generation aside BEFORE renaming the new one in. Combined
        // with the recovery above, a crash at any point leaves a
        // restorable generation: during the write → cur intact; after
        // rename(cur→old) → _next (complete, _SUCCESS) or _old; after
        // rename(tmp→cur) → cur. _old is deleted only once the new
        // generation is committed at cur. (The merge plan reads the dir
        // being replaced, and state must stay distributed — no driver
        // collect. A transactional table makes this whole dance a MERGE.)
        merged.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(cur)) fs.rename(cur, old)
        fs.rename(tmp, cur)
        fs.delete(old, true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(stateDir)
  }

  /** [[upsertAvailableNow]] with the hand-rolled generation-swap dance
    * replaced by the real transactional table — the "at cluster scale
    * the swap becomes a transactional-table MERGE" upgrade that note
    * promised, now in-repo via [[graft.sources.SnapshotTable]]: each
    * micro-batch window-dedups internally (latest (ts, event_id) per
    * user) and lands as ONE atomic commit — create on the first batch,
    * bucket-pruned merge-on-write upsert after — so crash safety and
    * torn-read immunity come from the manifest protocol instead of the
    * rename choreography, readers are never blocked, and every batch's
    * pre-state stays TIME-TRAVEL readable (the swap dance destroys
    * history; the table keeps it). A replayed batch after a crash
    * re-upserts the same keys with the same rows — idempotent content,
    * one version later.
    *
    * The input is staged as two mtime-ordered micro-batches (event_id
    * parity) so the drain exercises BOTH commit paths; upsert semantics
    * make later batches win per user, so the batch oracle is
    * last-write-wins by (batch, ts, event_id) priority — the
    * [[upsertAvailableNow]] oracle shape exactly. */
  def upsertSnapshotAvailableNow(spark: SparkSession, sfDir: String,
      tblPath: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val stream = stagedStream(spark, Seq(
      events.filter(col("event_id") % 2 === 0),
      events.filter(col("event_id") % 2 === 1)))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val deduped = batch.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val sp = batch.sparkSession
        if (!graft.sources.SnapshotTable.exists(sp, tblPath))
          graft.sources.SnapshotTable.create(deduped, tblPath,
            Seq("user_id"), buckets = 8)
        else graft.sources.SnapshotTable.upsert(deduped, tblPath)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.sources.SnapshotTable.read(spark, tblPath)
  }

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class SessionState(lastTsMicros: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  val SessionGapMicros: Long = 30L * 60 * 1000000

  /** Full-precision micros (Timestamp.getTime truncates to millis). */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Drain [[sessionCounts]] with AvailableNow into a memory sink and
    * return the FINAL per-user state. Update mode emits one row per user
    * per micro-batch that touched the user; both totals are monotone
    * non-decreasing across batches, so the final state is the per-user
    * max — deterministic under any batching of the input. */
  def sessionCountsAvailableNow(spark: SparkSession, sfDir: String,
                                statePartitions: Int = 4): DataFrame = {
    val ss = scopedSession(spark, statePartitions)
    val name = "graft_stream_sessions"
    val q = sessionCounts(read(ss, sfDir))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("n_sessions"),
        max(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Custom session state over a user-keyed stream: counts sessions split
    * on >30-minute gaps, carrying (lastTs, totals) across micro-batches —
    * the stateful analogue of the q09 batch window sessionization. Events
    * within a batch are processed in (ts, event_id) order.
    *
    * Cross-batch ordering contract: batches must arrive in event-time
    * order PER USER — a batch whose earliest event for a user predates
    * that user's stored `lastTs` would produce a negative gap (which can
    * never split a session) and silently diverge from the batch oracle,
    * so it FAILS LOUDLY here instead. Within a batch, arbitrary disorder
    * is fine (sorted below); across batches, sources that replay or
    * interleave event time need event-time-timeout semantics instead of
    * this operator.
    *
    * Memory shape: `it` is ONE user's slice of ONE micro-batch, and the
    * sort buffers exactly that slice (an `Array[Ev]`, sorted in place) —
    * O(max events per user per batch), NOT O(stream) or O(batch). This
    * is the standard flatMapGroupsWithState shape; the single unbounded
    * input is one hot key owning an entire giant batch, which is a
    * batch-sizing concern (maxFilesPerTrigger / maxOffsetsPerTrigger),
    * not an operator one — StreamingSpec pins the behavior with a
    * one-user-owns-the-batch test. */
  def sessionCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = it.toArray.sortInPlaceBy(e => (micros(e.ts), e.event_id))
          val init = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          if (init.lastTsMicros != Long.MinValue && sorted.nonEmpty &&
              micros(sorted.head.ts) < init.lastTsMicros)
            throw new IllegalStateException(
              s"sessionCounts: user $uid batch opens at ${micros(sorted.head.ts)}us, " +
                s"before stored lastTs ${init.lastTsMicros}us — batches must be " +
                "in per-user event-time order (see scaladoc)")
          val end = sorted.foldLeft(init) { (st, e) =>
            val tsMicros = micros(e.ts)
            val newSession = st.lastTsMicros == Long.MinValue ||
              tsMicros - st.lastTsMicros > SessionGapMicros
            SessionState(tsMicros,
              st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(end)
          Iterator(UserSessions(uid, end.nSessions, end.nEvents))
      }.toDF()
  }
}
