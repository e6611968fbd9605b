package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SnapshotCdfMicroBatchStream, SnapshotCdfScan, SnapshotMicroBatchStream, SnapshotOffset, SnapshotStreamOptions, SnapshotTable}

/** Streaming ADMISSION CONTROL on the snapshot source — the Delta
  * `maxFilesPerTrigger`/`maxBytesPerTrigger` surface: without it, a new
  * stream's first micro-batch is the ENTIRE table (one O(100 TB) batch
  * at production scale). These tests pin the sub-version offset
  * arithmetic (slices are disjoint, exactly covering, bounded, and
  * restart-stable) and the end-to-end drain through a real
  * `Trigger.AvailableNow` query, plus the `startingVersion` /
  * `startingTimestamp` backfill-free subscription anchors. */
class SnapshotStreamAdmissionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_snapadm_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(n: Range, tag: String) =
    n.map(i => (i.toLong, tag, i * 10L)).toDF("id", "tag", "v")

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  /** Offset-arithmetic-only stream (planInputPartitions unused). */
  private def mkStream(root: String,
      opts: SnapshotStreamOptions = SnapshotStreamOptions(),
      ignoreChanges: Boolean = false) =
    new SnapshotMicroBatchStream(root, _ => null, ignoreChanges, opts)

  /** Drain the stream's offset walk: (slices of dirs, final offset). */
  private def drain(st: SnapshotMicroBatchStream,
      from: SnapshotOffset): (Seq[Seq[String]], SnapshotOffset) = {
    val limit = st.getDefaultReadLimit
    var cur = from
    val slices = scala.collection.mutable.Buffer.empty[Seq[String]]
    var steps = 0
    var open = true
    while (open && steps < 200) {
      val next = st.latestOffset(cur, limit).asInstanceOf[SnapshotOffset]
      if (next == cur) open = false
      else { slices += st.rangeDirs(cur, next); cur = next }
      steps += 1
    }
    assert(steps < 200, "offset walk did not converge")
    (slices.toSeq, cur)
  }

  private def headSnap(root: String) =
    SnapshotTable.versions(spark, root).last

  test("maxFilesPerTrigger slices the initial snapshot into bounded, " +
      "disjoint, exactly-covering batches that end at the plain head " +
      "offset (checkpoint-compatible)") {
    val root = freshRoot("initslice")
    SnapshotTable.create(rows(0 until 64, "a"), root, Seq("id"), 8)
    SnapshotTable.append(rows(64 until 96, "b"), root)
    val live = headSnap(root).entries.map(_._2)
    assert(live.size > 3, s"need >3 dirs to slice, got ${live.size}")

    val st = mkStream(root, SnapshotStreamOptions(maxFiles = Some(3)))
    val (slices, fin) = drain(st,
      st.initialOffset().asInstanceOf[SnapshotOffset])
    // bounded per batch, >1 batch, disjoint, exact cover
    assert(slices.size > 1)
    assert(slices.forall(s => s.nonEmpty && s.size <= 3))
    val all = slices.flatten
    assert(all.size === all.distinct.size, "a dir was served twice")
    assert(all.toSet === live.toSet, "slices must cover the snapshot")
    // initial-phase offsets slice the snapshot pinned at ONE version
    assert(fin === SnapshotOffset(headSnap(root).version))
  }

  test("maxBytesPerTrigger=1 and maxRowsPerTrigger=1 degrade to one dir " +
      "per batch (soft caps admit the crossing dir; progress never " +
      "stalls)") {
    val root = freshRoot("bytes")
    SnapshotTable.create(rows(0 until 32, "a"), root, Seq("id"), 4)
    val live = headSnap(root).entries.map(_._2)
    for (o <- Seq(SnapshotStreamOptions(maxBytes = Some(1L)),
        SnapshotStreamOptions(maxRows = Some(1L)))) {
      val st = mkStream(root, o)
      val (slices, _) = drain(st,
        st.initialOffset().asInstanceOf[SnapshotOffset])
      assert(slices.forall(_.size === 1))
      assert(slices.flatten.toSet === live.toSet)
    }
    // a generous byte budget takes everything in one batch
    val st = mkStream(root,
      SnapshotStreamOptions(maxBytes = Some(Long.MaxValue / 2)))
    val (slices, _) = drain(st,
      st.initialOffset().asInstanceOf[SnapshotOffset])
    assert(slices.size === 1)
  }

  test("tail backlog splits across commit boundaries: partial offsets " +
      "carry phase=tail, slices stay disjoint and in order, and the walk " +
      "lands on the plain head") {
    val root = freshRoot("tail")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4)
    val st = mkStream(root, SnapshotStreamOptions(maxFiles = Some(1)))
    val (_, afterInit) = drain(st,
      st.initialOffset().asInstanceOf[SnapshotOffset])
    val v1 = headSnap(root).version
    assert(afterInit === SnapshotOffset(v1))
    // two append commits form the backlog
    val before = headSnap(root).entries.map(_._2).toSet
    SnapshotTable.append(rows(8 until 24, "b"), root)
    SnapshotTable.append(rows(24 until 40, "c"), root)
    val freshDirs = headSnap(root).entries.map(_._2).filterNot(before)
    assert(freshDirs.size > 2)
    val (slices, fin) = drain(st, afterInit)
    assert(slices.forall(_.size === 1))
    assert(slices.flatten === freshDirs, "tail slices must serve the " +
      "backlog's fresh dirs in manifest order")
    assert(fin === SnapshotOffset(headSnap(root).version))
  }

  test("offset forms interoperate: legacy plain offsets plan whole-" +
      "version ranges, partial spellings round-trip through json, and " +
      "the redundant complete-tail form normalizes") {
    val root = freshRoot("offsets")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4)
    SnapshotTable.append(rows(8 until 12, "b"), root)
    SnapshotTable.append(rows(12 until 16, "c"), root)
    val st = mkStream(root)
    val vs = SnapshotTable.versions(spark, root)
    // legacy whole-version range = fresh dirs of (v1, v3]
    val dirs = st.rangeDirs(SnapshotOffset(vs(0).version),
      SnapshotOffset(vs(2).version))
    assert(dirs.toSet === vs(2).entries.map(_._2).toSet --
      vs(0).entries.map(_._2).toSet)
    // json round-trips (legacy and sliced forms)
    for (o <- Seq(SnapshotOffset(3), SnapshotOffset(5, 2, "init"),
        SnapshotOffset(4, 1, "tail"), SnapshotOffset(0, -1, "tail")))
      assert(st.deserializeOffset(o.json()) === o)
    // complete-tail normalizes to the legacy plain spelling
    assert(st.deserializeOffset("""{"version":7,"index":-1,"phase":"tail"}""")
      === SnapshotOffset(7))
    // an empty range plans nothing
    assert(st.rangeDirs(SnapshotOffset(2), SnapshotOffset(2)) === Seq.empty)
  }

  test("startingVersion / startingTimestamp anchor the stream PAST the " +
      "initial snapshot (the backfill-free subscription), 'latest' " +
      "serves only future commits, and out-of-range anchors refuse") {
    val root = freshRoot("anchor")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4)
    Thread.sleep(30)
    val tMid = System.currentTimeMillis()
    Thread.sleep(30)
    SnapshotTable.append(rows(8 until 12, "b"), root)
    val vs = SnapshotTable.versions(spark, root)
    val head = vs.last.version

    def anchorOf(o: SnapshotStreamOptions) =
      mkStream(root, o).initialOffset().asInstanceOf[SnapshotOffset]
    // explicit version: inclusive (v2 ⇒ anchor after v1)
    assert(anchorOf(SnapshotStreamOptions(
      startingVersion = Some("2"))) === SnapshotOffset(1))
    // from version 1 = the whole history as a tail (no consolidated
    // snapshot): serves v1's dirs + each append's fresh dirs
    val st1 = mkStream(root,
      SnapshotStreamOptions(startingVersion = Some("1")))
    val a1 = st1.initialOffset().asInstanceOf[SnapshotOffset]
    assert(a1 === SnapshotOffset(0, -1, "tail"))
    val (slices, fin) = drain(st1, a1)
    assert(slices.flatten.toSet === vs.last.entries.map(_._2).toSet)
    assert(fin === SnapshotOffset(head))
    // latest: nothing until a NEW commit lands
    val stL = mkStream(root,
      SnapshotStreamOptions(startingVersion = Some("latest")))
    val aL = stL.initialOffset().asInstanceOf[SnapshotOffset]
    assert(aL === SnapshotOffset(head))
    assert(drain(stL, aL)._1.isEmpty)
    SnapshotTable.append(rows(12 until 14, "d"), root)
    val (lSlices, _) = drain(stL, aL)
    assert(lSlices.flatten.toSet ===
      headSnap(root).entries.map(_._2).toSet --
        vs.last.entries.map(_._2).toSet)
    // timestamp between v1 and v2 anchors at v2 (first commit >= t)
    assert(anchorOf(SnapshotStreamOptions(
      startingTimestamp = Some(tMid))) === SnapshotOffset(1))
    // timestamp before v1 = the whole history
    assert(anchorOf(SnapshotStreamOptions(
      startingTimestamp = Some(vs.head.ts - 1000)))
      === SnapshotOffset(0, -1, "tail"))
    // refusals: past-the-head anchors and a future timestamp
    intercept[Exception](anchorOf(SnapshotStreamOptions(
      startingVersion = Some(s"${headSnap(root).version + 2}"))))
    intercept[Exception](anchorOf(SnapshotStreamOptions(
      startingTimestamp = Some(System.currentTimeMillis() + 3600 * 1000))))
    intercept[IllegalArgumentException](SnapshotStreamOptions(
      startingVersion = Some("2"), startingTimestamp = Some(1L)))
    intercept[IllegalArgumentException](
      SnapshotStreamOptions(maxFiles = Some(0)))
  }

  test("prepareForTriggerAvailableNow pins the head: commits landing " +
      "after the pin are out of the run's scope") {
    val root = freshRoot("pin")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4)
    val st = mkStream(root, SnapshotStreamOptions(maxFiles = Some(2)))
    st.prepareForTriggerAvailableNow()
    val pinned = headSnap(root).version
    SnapshotTable.append(rows(8 until 16, "b"), root)
    val (slices, fin) = drain(st,
      st.initialOffset().asInstanceOf[SnapshotOffset])
    assert(fin === SnapshotOffset(pinned))
    assert(slices.flatten.toSet ===
      SnapshotTable.versions(spark, root)
        .find(_.version == pinned).get.entries.map(_._2).toSet)
  }

  test("END-TO-END: a rate-limited AvailableNow drain runs >1 batch, " +
      "lands the exact table content, and a checkpointed restart serves " +
      "ONLY the commits since — exactly once, mid-slice offsets and all") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot("e2e")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_snapadm_ckpt").toString
    val outBase = java.nio.file.Files
      .createTempDirectory("graft_snapadm_out").toString
    SnapshotTable.create(rows(0 until 64, "a"), root, Seq("id"), 8)
    SnapshotTable.append(rows(64 until 80, "b"), root)
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(name: String): DataFrame = {
      val out = s"$outBase/$name"
      val q = spark.readStream.format("graft-snapshot")
        .option("maxFilesPerTrigger", "2").load(root)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val n = b.count()
          if (n > 0) batchSizes.add(n)
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      if (new java.io.File(out).exists) spark.read.parquet(out)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        rows(0 until 1, "x").schema)
    }
    assert(asSet(runOnce("s1")) === asSet(rows(0 until 80, "a"))
      .map { case (i, _, v) => (i, if (i < 64) "a" else "b", v) })
    assert(batchSizes.size > 1,
      s"expected a multi-batch drain, got ${batchSizes.size} batch(es)")
    // restart: two more commits, still rate-limited, nothing re-emits
    SnapshotTable.append(rows(80 until 88, "c"), root)
    SnapshotTable.append(rows(88 until 90, "d"), root)
    assert(asSet(runOnce("s2")) ===
      asSet(rows(80 until 88, "c")) ++ asSet(rows(88 until 90, "d")))
    // quiet restart emits nothing
    assert(runOnce("s3").count() === 0L)
  }

  test("a tailing stream SKIPS content-neutral compact/zorder commits " +
      "(the Delta dataChange=false discipline): maintenance between " +
      "appends re-emits nothing and never fail-fasts the reader") {
    val root = freshRoot("skipcompact")
    SnapshotTable.create(rows(0 until 16, "a"), root, Seq("id"), 4)
    val st = mkStream(root)
    val (_, afterInit) = drain(st,
      st.initialOffset().asInstanceOf[SnapshotOffset])
    val preAppend = headSnap(root).entries.map(_._2).toSet
    SnapshotTable.append(rows(16 until 24, "b"), root)
    val freshB = headSnap(root).entries.map(_._2).filterNot(preAppend)
    SnapshotTable.compact(spark, root) // full rewrite, content-neutral
    val postCompact = headSnap(root).entries.map(_._2).toSet
    SnapshotTable.append(rows(24 until 28, "c"), root)
    val freshC = headSnap(root).entries.map(_._2).filterNot(postCompact)
    val (slices, fin) = drain(st, afterInit)
    // served dirs = exactly the two appends' fresh dirs — the compacted
    // rewrite (which re-lists EVERY row) contributes nothing
    assert(slices.flatten.toSet === (freshB ++ freshC).toSet,
      "compact commit's rewritten dirs must not re-emit")
    assert(fin === SnapshotOffset(headSnap(root).version))
  }

  test("sink AUTO-COMPACTION (autoCompactDirs) bounds per-bucket dir " +
      "counts across a many-batch drain, keeps content exact, and its " +
      "compact commits stay invisible to a tailing reader") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_autocomp")
    base.toFile.deleteOnExit()
    val stage = new java.io.File(base.toFile, "in"); stage.mkdirs()
    val root = new java.io.File(base.toFile, "tbl").getAbsolutePath
    val ckpt = new java.io.File(base.toFile, "ckpt").getAbsolutePath
    def stageOne(i: Int, df: DataFrame): Unit = {
      val tmp = new java.io.File(base.toFile, s"tmp$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles.filter(_.getName.startsWith("part-")).head
      val dst = new java.io.File(stage, f"b$i%03d.parquet")
      assert(part.renameTo(dst))
      dst.setLastModified(1000000L * (i + 1))
    }
    (0 until 6).foreach(i =>
      stageOne(i, rows(i * 10 until (i + 1) * 10, s"t$i")))
    val q = spark.readStream.schema(rows(0 until 1, "x").schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      .writeStream.format("graft-snapshot")
      .option("keys", "id").option("buckets", "2")
      .option("autoCompactDirs", "2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(root)
    q.awaitTermination()
    val snaps = SnapshotTable.versions(spark, root)
    // maintenance actually ran
    assert(snaps.exists(_.op == "compact"),
      s"no compact commit in ${snaps.map(_.op)}")
    // the data plane stayed bounded: without auto-compact each bucket
    // would hold ~6 dirs (one per batch); the threshold keeps the head
    // at <= threshold + 1 read inputs per bucket
    val head = snaps.last
    val perBucket = head.entries.groupBy(_._1).map(_._2.size)
    assert(perBucket.max <= 3,
      s"auto-compact left ${perBucket.max} dirs in a bucket")
    // content is exact
    val got = SnapshotTable.read(spark, root)
      .select("id", "tag", "v").as[(Long, String, Long)].collect().toSet
    assert(got === (0 until 6).flatMap(i =>
      (i * 10 until (i + 1) * 10).map(j =>
        (j.toLong, s"t$i", j * 10L))).toSet)
    // a from-scratch tailing walk over the mixed history serves every
    // append exactly once and nothing from the compact rewrites
    val st = mkStream(root,
      SnapshotStreamOptions(startingVersion = Some("1")))
    val (slices, _) = drain(st,
      st.initialOffset().asInstanceOf[SnapshotOffset])
    val served = slices.flatten
    assert(served.size === served.distinct.size)
    // introduced-dirs per commit (entries minus predecessor's): the
    // walk must serve exactly the DATA commits' dirs, none of compact's
    val byV = snaps.sortBy(_.version)
    def introduced(p: SnapshotTable.Snapshot, n: SnapshotTable.Snapshot) =
      n.entries.map(_._2).diff(p.entries.map(_._2))
    val fromCompact = byV.sliding(2).collect {
      case Seq(p, n) if n.op == "compact" => introduced(p, n)
    }.flatten.toSet
    val fromData = byV.head.entries.map(_._2) ++ byV.sliding(2).collect {
      case Seq(p, n) if n.op != "compact" => introduced(p, n)
    }.flatten
    assert(fromCompact.nonEmpty)
    assert(served.toSet === fromData.toSet,
      "tailing walk must serve exactly the data commits' fresh dirs")
    assert(served.toSet.intersect(fromCompact).isEmpty,
      "tailing reader served a compact rewrite dir")
  }

  test("an ignoreChanges stream KEEPS the verbatim re-emit on " +
      "compact/zorder (its only delivery path for merge-on-read " +
      "folds), while the default stream fail-fasts at the MOR commit") {
    val root = freshRoot("ignfold")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 2)
    val stIgn = mkStream(root, ignoreChanges = true)
    val stDef = mkStream(root)
    val (_, afterInit) = drain(stIgn,
      stIgn.initialOffset().asInstanceOf[SnapshotOffset])
    // a MOR upsert adds only delta dirs: the ignoreChanges stream
    // under-delivers silently (documented); the default stream refuses
    SnapshotTable.upsert(Seq((1L, "M", 1L)).toDF("id", "tag", "v"), root,
      mergeOnRead = true)
    SnapshotTable.compact(spark, root) // folds the delta layer
    val e = intercept[Exception](drain(stDef, afterInit))
    assert(e.getMessage.contains("upsert-mor"))
    val (slices, fin) = drain(stIgn, afterInit)
    // the compact's rewritten dirs re-emit VERBATIM — the fold (and
    // with it the upserted row) reaches the ignoreChanges consumer
    assert(slices.flatten.nonEmpty,
      "ignoreChanges must still deliver the compact fold")
    assert(slices.flatten.toSet ===
      headSnap(root).entries.map(_._2).toSet)
    assert(fin === SnapshotOffset(headSnap(root).version))
    // a later PURE fragmentation compact (nothing to fold) stays
    // invisible even under ignoreChanges — maintenance must not flood
    // the consumer with a full-table duplicate re-emit
    val preAppend = headSnap(root).entries.map(_._2).toSet
    SnapshotTable.append(rows(8 until 12, "z"), root)
    val freshZ = headSnap(root).entries.map(_._2).filterNot(preAppend)
    SnapshotTable.compact(spark, root)
    val (slices2, fin2) = drain(stIgn, fin)
    assert(slices2.flatten === freshZ,
      "a fold-free compact must not re-emit under ignoreChanges")
    assert(fin2 === SnapshotOffset(headSnap(root).version))
  }

  test("start anchors refuse when the predecessor manifest needed to " +
      "diff the anchor commit was vacuumed; retained anchors still " +
      "work; date-only timestamp strings parse") {
    val root = freshRoot("vacanchor")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 2)
    SnapshotTable.append(rows(8 until 12, "b"), root)
    SnapshotTable.append(rows(12 until 16, "c"), root)
    SnapshotTable.append(rows(16 until 20, "d"), root)
    SnapshotTable.vacuum(spark, root, keepVersions = 2) // keeps v3, v4
    def anchorOf(sv: String) = mkStream(root,
      SnapshotStreamOptions(startingVersion = Some(sv)))
      .initialOffset().asInstanceOf[SnapshotOffset]
    assert(anchorOf("4") === SnapshotOffset(3)) // v3 retained: diffable
    val e = intercept[Exception](anchorOf("3")) // v2 vacuumed: refuse
    assert(e.getMessage.contains("vacuumed"))
    // string timestamps resolve in the SESSION time zone, not JVM-local
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    assert(SnapshotStreamOptions.parseTs("2024-01-05") ===
      java.time.LocalDate.parse("2024-01-05").atStartOfDay(zone)
        .toInstant.toEpochMilli)
    assert(SnapshotStreamOptions.parseTs("2024-01-05 06:07:08") ===
      java.time.LocalDateTime.parse("2024-01-05T06:07:08").atZone(zone)
        .toInstant.toEpochMilli)
  }

  test("CDF admission control: a rate-limited change-feed backfill " +
      "admits whole commits per batch (cdc commits close byte-limited " +
      "batches; metadata commits are free) and lands on the head") {
    val root = freshRoot("cdfadm")
    SnapshotTable.create(rows(0 until 16, "a"), root, Seq("id"), 4,
      changeFeed = true)
    SnapshotTable.append(rows(16 until 32, "b"), root)
    SnapshotTable.upsert(Seq((1L, "U", 1L)).toDF("id", "tag", "v"), root)
    SnapshotTable.append(rows(32 until 40, "c"), root)
    val head = SnapshotTable.versions(spark, root).last
    def walk(opts: SnapshotStreamOptions): Seq[Long] = {
      val st = new SnapshotCdfScan(head, root, Some(1L), None, opts)
        .toMicroBatchStream("").asInstanceOf[SnapshotCdfMicroBatchStream]
      val limit = st.getDefaultReadLimit
      var cur = st.initialOffset().asInstanceOf[SnapshotOffset]
      val ends = scala.collection.mutable.Buffer.empty[Long]
      var open = true
      var steps = 0
      while (open && steps < 50) {
        val next = st.latestOffset(cur, limit).asInstanceOf[SnapshotOffset]
        if (next == cur) open = false
        else { ends += next.version; cur = next }
        steps += 1
      }
      ends.toSeq
    }
    // one commit per batch under maxFiles=1 (commits stay atomic)
    assert(walk(SnapshotStreamOptions(maxFiles = Some(1))) ===
      Seq(1L, 2L, 3L, 4L))
    // byte-limited: every commit's recorded bytes cross the 1-byte cap
    assert(walk(SnapshotStreamOptions(maxBytes = Some(1L))) ===
      Seq(1L, 2L, 3L, 4L))
    // unlimited: one batch to the head
    assert(walk(SnapshotStreamOptions()) === Seq(4L))
    // the cdc commit records its change file's REAL bytes, so CDF byte
    // budgets charge it exactly (not "unknown fills the budget")
    val v3 = SnapshotTable.versions(spark, root).find(_.version == 3L).get
    assert(v3.cdc.isDefined && v3.dirBytes.get(v3.cdc.get).exists(_ > 0L))
  }

  test("END-TO-END: a rate-limited CDF stream drains a backfill in >1 " +
      "batch with content equal to the batch feed; CDF timestamps " +
      "resolve start/end versions") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot("cdfe2e")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cdfadm_ck").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_cdfadm_out").toString + "/r"
    SnapshotTable.create(rows(0 until 16, "a"), root, Seq("id"), 4)
    Thread.sleep(30)
    val tMid = System.currentTimeMillis()
    Thread.sleep(30)
    SnapshotTable.append(rows(16 until 24, "b"), root)
    SnapshotTable.append(rows(24 until 32, "c"), root)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger()
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("maxFilesPerTrigger", "2").load(root)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (b.count() > 0) nBatches.incrementAndGet()
        b.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(nBatches.get() > 1, s"expected a multi-batch CDF backfill")
    val batch = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(root)
    assert(spark.read.parquet(out).count() === batch.count())
    assert(spark.read.parquet(out).count() === 32L)
    // startingTimestamp resolves to the first commit >= t (v2)
    val fromMid = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", tMid.toString).load(root)
    assert(fromMid.count() === 16L) // the two appends' inserts
    // endingTimestamp resolves to the newest commit <= t
    val upToMid = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("endingTimestamp",
        (tMid).toString).load(root)
    assert(upToMid.count() === 16L) // just the create's inserts
    // a future-only startingTimestamp refuses
    intercept[Exception](spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp",
        (System.currentTimeMillis() + 3600000L).toString).load(root)
      .count())
  }

  test("END-TO-END: startingVersion=latest subscribes without backfill " +
      "through a real checkpointed query") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot("e2elatest")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_snapadm_lck").toString
    val outBase = java.nio.file.Files
      .createTempDirectory("graft_snapadm_lout").toString
    SnapshotTable.create(rows(0 until 32, "a"), root, Seq("id"), 4)
    def runOnce(name: String): DataFrame = {
      val out = s"$outBase/$name"
      val q = spark.readStream.format("graft-snapshot")
        .option("startingVersion", "latest").load(root)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      if (new java.io.File(out).exists) spark.read.parquet(out)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        rows(0 until 1, "x").schema)
    }
    assert(runOnce("l1").count() === 0L) // no backfill
    SnapshotTable.append(rows(32 until 40, "z"), root)
    assert(asSet(runOnce("l2")) === asSet(rows(32 until 40, "z")))
  }

  test("a rate-limited tail serves in-budget commits BEFORE an " +
      "unservable one: the overwrite refusal fires on the trigger " +
      "whose budget reaches it, after earlier data is delivered") {
    val root = freshRoot("lazywin")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4) // v1
    SnapshotTable.append(rows(8 until 16, "b"), root)              // v2
    SnapshotTable.overwrite(rows(100 until 104, "o"), root)        // v3
    val vs = SnapshotTable.versions(spark, root)
    val v2fresh = vs.find(_.version == 2L).get.entries.map(_._2)
      .diff(vs.find(_.version == 1L).get.entries.map(_._2))
    assert(v2fresh.nonEmpty)
    val st = mkStream(root, SnapshotStreamOptions(maxFiles = Some(1),
      startingVersion = Some("2")))
    val limit = st.getDefaultReadLimit
    var cur = st.initialOffset().asInstanceOf[SnapshotOffset]
    val served = scala.collection.mutable.Buffer.empty[String]
    // v2's dirs must drain (and be checkpointable) one per trigger
    // WITHOUT touching v3 — an eager window map would abort trigger 1
    // by evaluating v3's freshDirs while budgeting v2
    val e = intercept[Exception] {
      var steps = 0
      while (steps < 50) {
        val next = st.latestOffset(cur, limit).asInstanceOf[SnapshotOffset]
        assert(next != cur, "walk stalled before reaching the overwrite")
        served ++= st.rangeDirs(cur, next)
        cur = next
        steps += 1
      }
    }
    assert(e.getMessage.contains("overwrite"))
    assert(served.toSet === v2fresh.toSet,
      "every in-budget commit before the overwrite must be delivered")
    assert(served.size === v2fresh.size)
  }

  test("an UNLIMITED tail trigger also refuses an unservable commit " +
      "BEFORE logging: the trigger that would cover it serves only the " +
      "commits before it, and the next trigger refuses with the offset " +
      "unlogged (no checkpoint wedge)") {
    val root = freshRoot("unlimwedge")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4)  // v1
    SnapshotTable.append(rows(8 until 12, "b"), root)               // v2
    SnapshotTable.overwrite(rows(100 until 104, "o"), root)         // v3
    SnapshotTable.append(rows(12 until 16, "c"), root)              // v4
    val st = mkStream(root,
      SnapshotStreamOptions(startingVersion = Some("2"))) // NO limits
    val limit = st.getDefaultReadLimit // allAvailable
    val a0 = st.initialOffset().asInstanceOf[SnapshotOffset] // anchor v1
    // trigger 1: v2 serves; the walk stops BEFORE v3 instead of
    // wedging on it or silently jumping to v4
    val o1 = st.latestOffset(a0, limit).asInstanceOf[SnapshotOffset]
    assert(o1 === SnapshotOffset(2))
    val vs = SnapshotTable.versions(spark, root)
    val v2fresh = vs.find(_.version == 2L).get.entries.map(_._2)
      .diff(vs.find(_.version == 1L).get.entries.map(_._2))
    assert(st.rangeDirs(a0, o1).toSet === v2fresh.toSet)
    // trigger 2: the unservable commit is next — refuse in
    // latestOffset, before any offset is logged
    val e = intercept[Exception](st.latestOffset(o1, limit))
    assert(e.getMessage.contains("overwrite"))
  }

  test("CDF stream admission refuses an unservable commit BEFORE " +
      "logging, serving the commits before it first (batch plan-time " +
      "refusal can no longer wedge the checkpoint)") {
    import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl}
    val root = freshRoot("cdfwedge")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 2,
      changeFeed = true)                                            // v1
    SnapshotTable.append(rows(8 until 12, "b"), root)               // v2
    SnapshotTable.overwrite(rows(100 until 104, "o"), root)         // v3 (no change data)
    SnapshotTable.append(rows(12 until 16, "c"), root)              // v4
    val stream = new SnapshotCdfScan(headSnap(root), root, Some(1L), None)
      .toMicroBatchStream("unused").asInstanceOf[SupportsAdmissionControl]
    // unlimited trigger from the feed start: v1+v2 admit, the walk
    // stops before v3
    val o1 = stream.latestOffset(SnapshotOffset(0), ReadLimit.allAvailable())
    assert(o1 === SnapshotOffset(2))
    // next trigger: v3 is first — refusal with the offset unlogged
    val e = intercept[Exception](
      stream.latestOffset(SnapshotOffset(2), ReadLimit.allAvailable()))
    assert(e.getMessage.contains("overwrite") ||
      e.getMessage.contains("no recorded change data"))
    // a budgeted trigger behaves identically
    val o1b = stream.latestOffset(SnapshotOffset(0), ReadLimit.maxFiles(100))
    assert(o1b === SnapshotOffset(2))
  }

  test("a widen-column commit is pure metadata to a tailing stream " +
      "(zero fresh dirs, NO refusal) — same contract as the CDF twin " +
      "and batch readChanges") {
    val root = freshRoot("widenstream")
    SnapshotTable.create(Seq((1L, "a", 1), (2L, "b", 2))
      .toDF("id", "tag", "v"), root, Seq("id"), 2)            // v1
    val st = mkStream(root,
      SnapshotStreamOptions(startingVersion = Some("2")))
    val a0 = st.initialOffset().asInstanceOf[SnapshotOffset]  // anchor v1
    SnapshotTable.widenColumn(spark, root, "v", "BIGINT")     // v2
    SnapshotTable.append(Seq((3L, "c", 3L)).toDF("id", "tag", "v"),
      root)                                                   // v3
    val limit = st.getDefaultReadLimit
    val o1 = st.latestOffset(a0, limit).asInstanceOf[SnapshotOffset]
    assert(o1 === SnapshotOffset(3)) // walked THROUGH the widen commit
    val vs = SnapshotTable.versions(spark, root)
    val v3fresh = vs.find(_.version == 3L).get.entries.map(_._2)
      .diff(vs.find(_.version == 2L).get.entries.map(_._2))
    assert(st.rangeDirs(a0, o1).toSet === v3fresh.toSet)
  }

  test("startingVersion on an empty/not-yet-created table names the " +
      "real condition, not a phantom mid-stream vacuum") {
    val root = freshRoot("norootyet") // dir never created
    val st = mkStream(root,
      SnapshotStreamOptions(startingVersion = Some("1")))
    val e = intercept[Exception](st.initialOffset())
    assert(e.getMessage.contains("no snapshot table"))
  }
}
