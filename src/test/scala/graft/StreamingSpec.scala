package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Streaming/batch agreement on the sf0.001 events table. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream hourly agg (AvailableNow) == batch date_trunc plan (q08)") {
    val stream = EventStream.hourlyAvailableNow(spark, TestSpark.Sf0001)
    val batch = Queries.byName("q08_events_hourly").fn(spark, TestSpark.Sf0001)
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stream).count() === 0)
  }

  test("stateful sessionization (flatMapGroupsWithState) == batch window sessionization (q09)") {
    val streamed = EventStream.sessionCounts(Tables.events(spark, TestSpark.Sf0001))
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    val batch = Queries.byName("q09_sessionize").fn(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming funnel (flatMapGroupsWithState) == batch funnel operator (q117)") {
    import graft.streaming.FunnelStream
    val steps = Seq(
      "view" -> ((e: FunnelStream.FEv) => e.event_type == "view" && e.value > 50),
      "click" -> ((e: FunnelStream.FEv) => e.event_type == "click" && e.value > 60),
      "purchase" -> ((e: FunnelStream.FEv) => e.event_type == "purchase" && e.value > 40))
    val streamed = FunnelStream.funnelAvailableNow(spark, TestSpark.Sf0001, steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val batch = graft.ops.Funnel.funnelCounts(
        Tables.events(spark, TestSpark.Sf0001), "user_id", "ts", Seq(
          "view" -> (col("event_type") === "view" && col("value") > 50),
          "click" -> (col("event_type") === "click" && col("value") > 60),
          "purchase" -> (col("event_type") === "purchase" && col("value") > 40)))
      .orderBy(col("stage"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed == batch)
    assert(streamed.head._3 > 0)
  }

  test("streaming funnel state carries across batches (in-order delivery)") {
    import java.sql.Timestamp
    import graft.streaming.FunnelStream
    val s = spark
    import s.implicits._
    val steps = Seq[FunnelStream.FEv => Boolean](
      _.event_type == "a", _.event_type == "b")
    // batch 1: user 1 completes step a; batch 2: step b arrives later —
    // the chain must close ONLY if state carried the stage-1 timestamp
    def ev(u: Long, ts: Long, t: String, id: Long) =
      (u, new Timestamp(ts), id, t, 0.0)
    val b1 = Seq(ev(1L, 10L, "a", 1L), ev(2L, 10L, "b", 2L))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val b2 = Seq(ev(1L, 20L, "b", 3L), ev(2L, 20L, "a", 4L))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    // drive the same state machine the stream runs, one batch at a time,
    // against a MemoryStream to exercise real cross-batch GroupState
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, Timestamp, Long, String, Double)]
    val stages = FunnelStream.stageUpdates(
      ms.toDF.toDF("user_id", "ts", "event_id", "event_type", "value"), steps)
    val q = stages.writeStream.format("memory").queryName("funnel_xbatch")
      .outputMode("update").start()
    ms.addData(b1.as[(Long, Timestamp, Long, String, Double)].collect().toSeq)
    q.processAllAvailable()
    ms.addData(b2.as[(Long, Timestamp, Long, String, Double)].collect().toSeq)
    q.processAllAvailable()
    q.stop()
    val fin = FunnelStream.countsFromStages(
        s.table("funnel_xbatch"), Seq("a", "b"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // user 1: a@10 then b@20 across batches -> stage 2.
    // user 2: b@10 BEFORE a@20 -> stage 1 only (order matters).
    assert(fin == Map(1 -> 2L, 2 -> 1L))
  }

  test("sessionization state carries across batches; final state = per-user max") {
    import java.sql.Timestamp
    val s = spark
    import s.implicits._
    val m = 60L * 1000 // minutes in Timestamp millis
    def ev(u: Long, min: Long, id: Long) = (u, new Timestamp(min * m), id)
    // user 1: batch 1 ends at minute 10; batch 2 resumes at minute 20
    // (gap 10m < 30m — SAME session, only if state carried lastTs) and
    // then minute 60 (gap 40m — a genuine new session). user 2 appears
    // only in batch 1.
    val b1 = Seq(ev(1L, 0L, 1L), ev(1L, 10L, 2L), ev(2L, 5L, 3L))
    val b2 = Seq(ev(1L, 20L, 4L), ev(1L, 60L, 5L))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, Timestamp, Long)]
    val q = EventStream.sessionCounts(
        ms.toDF.toDF("user_id", "ts", "event_id"))
      .writeStream.format("memory").queryName("sess_xbatch")
      .outputMode("update").start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    // the q145 extraction: Update mode emitted user 1 twice (once per
    // batch); totals are monotone so max() recovers the final state
    val fin = s.table("sess_xbatch").groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("ns"), max(col("n_events")).as("ne"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fin == Map(1L -> ((2L, 4L)), 2L -> ((1L, 1L))), s"got $fin")
    // the intermediate emission really was smaller — max() was load-bearing
    val u1Rows = s.table("sess_xbatch").filter(col("user_id") === 1L).count()
    assert(u1Rows == 2L, "one Update row per batch for user 1")
  }

  test("sessionization hot key: one user owning an entire large batch is fine") {
    // the per-batch buffer is O(max events per user per batch) — pin that
    // a single key owning the whole batch (the worst case) completes and
    // counts correctly: 50k events at 1-minute spacing, every 1000th gap
    // widened to 40m -> deterministic session count
    import java.sql.Timestamp
    val s = spark
    import s.implicits._
    val m = 60L * 1000
    val n = 50000
    val evs = (0 until n).map { i =>
      // every 1000th event jumps 40 minutes -> a new session
      val min = i.toLong + 39L * (i / 1000)
      (7L, new Timestamp(min * m), i.toLong)
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, Timestamp, Long)]
    val q = EventStream.sessionCounts(
        ms.toDF.toDF("user_id", "ts", "event_id"))
      .writeStream.format("memory").queryName("sess_hotkey")
      .outputMode("update").start()
    ms.addData(evs); q.processAllAvailable()
    q.stop()
    val fin = s.table("sess_hotkey").groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("ns"), max(col("n_events")).as("ne"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(fin == ((50L, n.toLong)), s"got $fin") // sessions: i=0 plus 49 jumps
  }

  test("sessionization rejects cross-batch event-time disorder loudly") {
    // a batch-2 event BEFORE the stored lastTs would produce a negative
    // gap that can never split a session — the operator must fail, not
    // silently diverge from the batch oracle
    import java.sql.Timestamp
    val s = spark
    import s.implicits._
    val m = 60L * 1000
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, Timestamp, Long)]
    val q = EventStream.sessionCounts(
        ms.toDF.toDF("user_id", "ts", "event_id"))
      .writeStream.format("memory").queryName("sess_disorder")
      .outputMode("update").start()
    ms.addData(Seq((1L, new Timestamp(10L * m), 1L)))
    q.processAllAvailable()
    ms.addData(Seq((1L, new Timestamp(5L * m), 2L))) // replays the past
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("event-time order")), s"unexpected cause: $ex")
  }

  test("foreachBatch upsert: stream state == batch last-write-wins per user") {
    import org.apache.spark.sql.expressions.Window
    val stateDir = java.nio.file.Files.createTempDirectory("graft_upsert")
      .resolve("state").toString
    val state = EventStream.upsertAvailableNow(spark, TestSpark.Sf0001, stateDir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val batchExpected = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    assert(state.count() === batchExpected.count()) // one row per user
    assert(state.exceptAll(batchExpected).count() === 0)
  }

  test("snapshot-table streaming upsert: LWW by batch priority, one " +
      "commit per micro-batch, pre-batch state time-travel readable") {
    import org.apache.spark.sql.expressions.Window
    import graft.sources.SnapshotTable
    val tbl = java.nio.file.Files.createTempDirectory("graft_snapup")
      .resolve("tbl").toString
    val state = EventStream.upsertSnapshotAvailableNow(
      spark, TestSpark.Sf0001, tbl)
    // content: LWW with the LATER batch (odd event_ids) winning per user
    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy((col("event_id") % 2).desc, col("ts").desc, col("event_id").desc)
    val expected = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(state.count() === expected.count())
    assert(state.exceptAll(expected).count() === 0)
    // protocol: exactly one commit per micro-batch, create then upsert
    val vs = SnapshotTable.versions(spark, tbl)
    assert(vs.map(_.op) === Seq("create", "upsert"))
    // time travel: v1 is batch 0's own LWW (even event_ids), untouched
    // by the later upsert
    val v1Expected = ev.filter(col("event_id") % 2 === 0)
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1).drop("rn")
    val v1 = SnapshotTable.read(spark, tbl, Some(1L))
    assert(v1.count() === v1Expected.count())
    assert(v1.exceptAll(v1Expected).count() === 0)
  }

  test("upsert recovery: state moved aside by a crash is restored, not discarded") {
    // A prior generation holding a user that never appears in the input —
    // if recovery fails, this row silently vanishes when the next batch
    // commits and deletes _old.
    def prior = spark.sql(
      """SELECT CAST(999999 AS BIGINT) user_id, CAST(1 AS BIGINT) event_id,
        |TIMESTAMP'2020-01-01 00:00:00' ts, CAST(1.0 AS DOUBLE) value""".stripMargin)
    // Crash window 1: cur was renamed to _old, the new gen never promoted.
    val d1 = java.nio.file.Files.createTempDirectory("graft_upsert_rec1")
      .resolve("state").toString
    prior.write.parquet(d1 + "_old")
    val s1 = EventStream.upsertAvailableNow(spark, TestSpark.Sf0001, d1)
    assert(s1.filter(col("user_id") === 999999).count() === 1)
    // Crash window 2: _next fully written (_SUCCESS present), cur gone.
    val d2 = java.nio.file.Files.createTempDirectory("graft_upsert_rec2")
      .resolve("state").toString
    prior.write.parquet(d2 + "_next")
    val s2 = EventStream.upsertAvailableNow(spark, TestSpark.Sf0001, d2)
    assert(s2.filter(col("user_id") === 999999).count() === 1)
    // In both cases the replayed input still merges in on top.
    assert(s1.count() > 1 && s2.count() > 1)
  }

  test("stream-stream join (watermarked) == batch time-range join") {
    val streamed = EventStream.clickPurchaseJoinAvailableNow(spark, TestSpark.Sf0001)
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
    assert(streamed.count() > 0)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("stream-stream LEFT OUTER join drain == batch left join (null emission at watermark)") {
    val streamed = EventStream.clickPurchaseLeftJoinDrain(spark, TestSpark.Sf0001)
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
        "left")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
    // the left join is a superset of the inner: every click appears, the
    // unmatched ones exactly once with null purchase columns
    assert(streamed.count() === batch.count())
    assert(streamed.filter(col("purchase_id").isNull).count() ===
      batch.filter(col("purchase_id").isNull).count())
    assert(streamed.filter(col("purchase_id").isNull).count() > 0,
      "fixture must exercise the null-emission path")
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming dedup (dropDuplicatesWithinWatermark) == batch DISTINCT keys") {
    val streamed = EventStream.dedupKeysAvailableNow(
      spark, TestSpark.Sf0001, Seq("user_id", "event_type"))
    val batch = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming dedup on the RocksDB state store == default provider") {
    // the disk-backed provider is the only viable one when dedup key
    // cardinality outgrows executor heap — the RESULT must not depend on
    // the provider choice
    val rocks = EventStream.dedupKeysAvailableNow(
      spark, TestSpark.Sf0001, Seq("user_id", "event_type"), rocksDb = true)
    val batch = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("event_type")).distinct()
    assert(rocks.count() === batch.count())
    assert(rocks.exceptAll(batch).count() === 0)
  }

  test("ingest restart on a stable checkpoint: only new files, exactly once") {
    import graft.ops.{Dedup, TextAnalysis}
    import graft.streaming.DocIngest
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val a = docs.filter(col("doc_id") < 250)
    val b = docs.filter(col("doc_id") >= 250)
    a.write.parquet(s"$src/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
    val (csh, cbands) = Dedup.shingleBandIndex(toks(corpus), "doc_id", "toks")
    val (c1, d1) = DocIngest.ingestWithIndex(spark, csh, cbands, src, out,
      checkpoint = Some(ckpt))
    assert(c1.count() + d1.count() === a.count())
    // new files arrive between runs — drop batch B's parts into the dir
    b.write.parquet(s"$root/tmpb")
    new java.io.File(s"$root/tmpb").listFiles
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/documents.parquet", "b_" + f.getName))
      }
    // "restart": a fresh drain on the SAME checkpoint must process ONLY
    // the new files — batch A's rows appear exactly once in the output
    val (c2, d2) = DocIngest.ingestWithIndex(spark, csh, cbands, src, out,
      checkpoint = Some(ckpt))
    val ids = c2.select(col("doc_id"))
      .unionByName(d2.select(col("batch_id").as("doc_id")))
    assert(ids.count() === docs.count(), "each doc exactly once, none twice")
    assert(ids.distinct().count() === docs.count())
    // evens are planted self-duplicates of the corpus → land in dups
    assert(d2.filter(col("batch_id") % 2 === 0).count() ===
      docs.filter(col("doc_id") % 2 === 0).count())
  }

  test("streaming curation gate: every rejection ledgered with its first failure") {
    import graft.ops.{Dedup, TextAnalysis}
    import graft.streaming.DocIngest
    val root = java.nio.file.Files.createTempDirectory("graft_curate").toString
    def doc(id: Long, text: String) = (id, text, "en", "src0", text.length.toLong)
    val corpusTexts = Seq(
      doc(1L, "the quick brown fox jumps over the lazy dog today again"),
      doc(2L, "a completely different and varied sentence with many unique words"))
    val heldOut = Seq(
      doc(100L, "secret benchmark item with eight shared tokens here exactly now"))
    val incoming = Seq(
      doc(10L, "an entirely novel clean document about something else and more"), // clean
      doc(11L, Seq.fill(30)("spam").mkString(" ")),                               // quality
      doc(12L, "prefix secret benchmark item with eight shared tokens here exactly now"), // contaminated
      doc(13L, "zz the quick brown fox jumps over the lazy dog today again"))     // near-dup of corpus 1
    import spark.implicits._
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val corpus = corpusTexts.toDF(cols: _*)
    incoming.toDF(cols: _*).write.parquet(s"$root/src/documents.parquet")
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val (csh, cbands) = Dedup.shingleBandIndex(toks(corpus), "doc_id", "toks")
    val (clean, rejects) = DocIngest.curationGateAvailableNow(spark, csh, cbands,
      heldOut.toDF(cols: _*), s"$root/src", s"$root/out")
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(10L))
    val byReason = rejects.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byReason === Map(11L -> "quality", 12L -> "contaminated", 13L -> "duplicate"))
  }

  test("watermarked variant builds a valid streaming plan") {
    val plan = EventStream.hourlyWatermarked(EventStream.read(spark, TestSpark.Sf0001))
    assert(plan.isStreaming)
  }
  test("native session_window (q81) agrees with manual sessionization (q09) per user") {
    val byWindow = Queries.byName("q81_session_window").fn(spark, TestSpark.Sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val manual = Queries.byName("q09_sessionize").fn(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("n_sessions"))
    assert(byWindow.count() > 0)
    assert(byWindow.exceptAll(manual).count() === 0)
    assert(manual.exceptAll(byWindow).count() === 0)
  }
  test("streaming doc ingestion: dedup gate == batch incrementalNearDup") {
    import graft.ops.{Dedup, TextAnalysis}
    val all = Tables.documents(spark, TestSpark.Sf0001)
    val corpus = all.filter(col("doc_id") % 2 === 0)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val out = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val (clean, dups) = graft.streaming.DocIngest.ingestAvailableNow(
      spark, corpus, TestSpark.Sf0001, out)
    val batchMatches = Dedup.incrementalNearDup(toks(corpus), toks(all), "doc_id", "toks")
    // same docs flagged as duplicates, same best match
    assert(dups.count() === batchMatches.count())
    assert(dups.exceptAll(batchMatches).count() === 0)
    // clean + dup ids partition the input
    assert(clean.count() + dups.count() === all.count())
    val overlap = clean.select(col("doc_id"))
      .join(dups.select(col("batch_id").as("doc_id")), "doc_id")
    assert(overlap.count() === 0)
    // every corpus-member doc matches itself (jaccard 1 vs its own index entry)
    assert(dups.filter(col("batch_id") === col("dup_of")).count() === corpus.count())
  }
}
