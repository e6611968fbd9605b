package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** Snapshot-table contract: atomic manifest-commit visibility, time
  * travel, merge-on-write bucket pruning, torn-commit invisibility, and
  * commit-race fail-fast. */
class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_snap_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(n: Range, tag: String) =
    n.map(i => (i.toLong, tag, i * 10L)).toDF("id", "tag", "v")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  test("create/read roundtrip; version catalog starts at 1") {
    val root = freshRoot("rt")
    assert(SnapshotTable.create(rows(0 until 20, "a"), root, Seq("id"), 4) === 1L)
    assert(asSet(SnapshotTable.read(spark, root)) === asSet(rows(0 until 20, "a")))
    val vs = SnapshotTable.versions(spark, root)
    assert(vs.map(v => (v.version, v.op)) === Seq((1L, "create")))
    assert(vs.head.buckets === 4 && vs.head.keys === Seq("id"))
  }

  test("append is blind and O(batch); prior versions stay readable") {
    val root = freshRoot("ap")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)
    val v1Entries = SnapshotTable.versions(spark, root).head.entries.toSet
    assert(SnapshotTable.append(rows(10 until 15, "b"), root) === 2L)
    val v2 = SnapshotTable.versions(spark, root).last
    // every v1 entry is re-listed verbatim — append read/rewrote nothing
    assert(v1Entries.subsetOf(v2.entries.toSet))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0 until 10, "a")) ++ asSet(rows(10 until 15, "b")))
    assert(asSet(SnapshotTable.read(spark, root, Some(1L))) ===
      asSet(rows(0 until 10, "a")))
  }

  test("upsert: batch wins per key, inserts land, untouched buckets' " +
      "manifest lines carry forward unrewritten") {
    val root = freshRoot("up")
    val buckets = 8
    SnapshotTable.create(rows(0 until 40, "a"), root, Seq("id"), buckets)
    val v1 = SnapshotTable.versions(spark, root).head
    // batch: update ids 3,7 and insert 100 — hits at most 3 buckets
    val batch = Seq((3L, "UPD", 999L), (7L, "UPD", 999L), (100L, "NEW", 1L))
      .toDF("id", "tag", "v")
    assert(SnapshotTable.upsert(batch, root) === 2L)
    val v2 = SnapshotTable.versions(spark, root).last
    val hitBuckets = v2.entries.toSet.diff(v1.entries.toSet).map(_._1)
    assert(hitBuckets.size <= 3, s"rewrote buckets $hitBuckets")
    // untouched buckets: identical (bucket, dir) lines as v1
    val untouched = v1.entries.filterNot(e => hitBuckets(e._1)).toSet
    assert(untouched.subsetOf(v2.entries.toSet))
    val expect = asSet(rows(0 until 40, "a"))
      .filterNot(r => r._1 == 3L || r._1 == 7L) ++
      Set((3L, "UPD", 999L), (7L, "UPD", 999L), (100L, "NEW", 1L))
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    // time travel to v1 is byte-stable after the upsert
    assert(asSet(SnapshotTable.read(spark, root, Some(1L))) ===
      asSet(rows(0 until 40, "a")))
  }

  test("upsert refuses a batch with duplicate key tuples") {
    val root = freshRoot("dup")
    SnapshotTable.create(rows(0 until 5, "a"), root, Seq("id"), 2)
    val bad = Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("id", "tag", "v")
    val e = intercept[IllegalArgumentException](SnapshotTable.upsert(bad, root))
    assert(e.getMessage.contains("duplicate key"))
  }

  test("upsert refuses a keyless table; append/overwrite still work") {
    val root = freshRoot("nk")
    SnapshotTable.create(rows(0 until 5, "a"), root, Seq.empty, 2)
    intercept[RuntimeException](
      SnapshotTable.upsert(rows(0 until 1, "b"), root))
    SnapshotTable.append(rows(5 until 8, "b"), root)
    assert(SnapshotTable.read(spark, root).count() === 8L)
    SnapshotTable.overwrite(rows(0 until 2, "c"), root)
    assert(asSet(SnapshotTable.read(spark, root)) === asSet(rows(0 until 2, "c")))
  }

  test("schema drift fails fast on append and upsert") {
    val root = freshRoot("sc")
    SnapshotTable.create(rows(0 until 5, "a"), root, Seq("id"), 2)
    val drifted = Seq((9L, "z")).toDF("id", "tag")
    intercept[IllegalArgumentException](SnapshotTable.append(drifted, root))
    intercept[IllegalArgumentException](SnapshotTable.upsert(drifted, root))
  }

  test("crash mid-commit is invisible: orphan data dirs and hidden tmp " +
      "manifests never surface to readers") {
    val root = freshRoot("crash")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)
    // simulate a writer that died after its data write, before publish:
    // a fully-written data dir plus a half-written hidden manifest
    rows(50 until 60, "ZOMBIE").withColumn("_gb", lit(0))
      .write.partitionBy("_gb").parquet(s"$root/data/c2-deadbeef")
    val tmp = new java.io.File(s"$root/_manifests/.tmp-deadbeef")
    java.nio.file.Files.writeString(tmp.toPath, "graft-snapshot-v1\nop=append\n")
    // readers: catalog and content are exactly v1
    assert(SnapshotTable.versions(spark, root).map(_.version) === Seq(1L))
    assert(asSet(SnapshotTable.read(spark, root)) === asSet(rows(0 until 10, "a")))
    // and the table still accepts the next commit normally
    SnapshotTable.append(rows(10 until 12, "b"), root)
    assert(SnapshotTable.read(spark, root).count() === 12L)
  }

  test("commit race fails fast: a version published underneath a writer " +
      "raises ConcurrentCommitException and the table stays consistent") {
    val root = freshRoot("race")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)
    val v1 = SnapshotTable.versions(spark, root).head
    // two writers race to publish version 2 (same file lists — the data
    // side is orthogonal to manifest atomicity)
    val winner = v1.copy(version = 2L, op = "append", uuid = "writer-aaaa")
    val loser = v1.copy(version = 2L, op = "append", uuid = "writer-bbbb")
    SnapshotTable.publishManifest(spark, root, winner)
    intercept[SnapshotTable.ConcurrentCommitException](
      SnapshotTable.publishManifest(spark, root, loser))
    // reader view: exactly the winner's manifest, content consistent
    assert(SnapshotTable.versions(spark, root).last.uuid === "writer-aaaa")
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0 until 10, "a")))
    // and the loser's retry through the public API lands cleanly as v3
    SnapshotTable.append(rows(10 until 12, "c"), root)
    assert(SnapshotTable.read(spark, root).count() === 12L)
  }

  test("empty table and empty commits: schema survives with zero rows") {
    val root = freshRoot("empty")
    val empty = rows(0 until 0, "a")
    SnapshotTable.create(empty, root, Seq("id"), 2)
    val out = SnapshotTable.read(spark, root)
    assert(out.count() === 0L)
    assert(out.schema.fieldNames.toSeq === Seq("id", "tag", "v"))
    SnapshotTable.append(rows(0 until 3, "b"), root)
    assert(SnapshotTable.read(spark, root).count() === 3L)
  }

  test("delete: keyed rows removed, absent keys no-op, untouched buckets " +
      "carried forward, history intact") {
    val root = freshRoot("del")
    SnapshotTable.create(rows(0 until 20, "a"), root, Seq("id"), 8)
    val v1 = SnapshotTable.versions(spark, root).head
    // delete ids 3, 7 (present) and 100 (absent, no-op); extra column ok
    val keys = Seq((3L, "x"), (7L, "x"), (100L, "x")).toDF("id", "junk")
    assert(SnapshotTable.delete(keys, root) === 2L)
    val v2 = SnapshotTable.versions(spark, root).last
    assert(v2.op === "delete")
    // only hit buckets changed (rewritten, or dropped when emptied); the
    // rest carry their v1 lines verbatim — the 3 delete keys can hash
    // into at most 3 buckets
    val changed = (v1.entries.toSet.diff(v2.entries.toSet) ++
      v2.entries.toSet.diff(v1.entries.toSet)).map(_._1)
    assert(changed.size <= 3, s"changed buckets: $changed")
    assert(v1.entries.filterNot(e => changed(e._1))
      .toSet.subsetOf(v2.entries.toSet))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0 until 20, "a")).filterNot(r => r._1 == 3L || r._1 == 7L))
    // time travel to the pre-delete state
    assert(asSet(SnapshotTable.read(spark, root, Some(1L))) ===
      asSet(rows(0 until 20, "a")))
    // keyless tables refuse
    val nk = freshRoot("delnk")
    SnapshotTable.create(rows(0 until 3, "a"), nk, Seq.empty, 2)
    intercept[RuntimeException](SnapshotTable.delete(keys, nk))
  }

  test("schema evolution (mergeSchema): new columns append, old files " +
      "backfill null, time travel keeps each version's schema, drops and " +
      "retypes are refused") {
    val root = freshRoot("evo")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)
    // add-column append: strict mode refuses, merge mode evolves
    val wider = Seq((10L, "b", 1L, 0.5)).toDF("id", "tag", "v", "score")
    intercept[IllegalArgumentException](SnapshotTable.append(wider, root))
    SnapshotTable.append(wider, root, mergeSchema = true)
    val v2 = SnapshotTable.read(spark, root)
    assert(v2.schema.fieldNames.toSeq === Seq("id", "tag", "v", "score"))
    // old rows backfill null; the new row carries its value
    assert(v2.filter(col("score").isNotNull).count() === 1L)
    assert(v2.count() === 11L)
    // time travel: v1 keeps its own 3-column schema
    assert(SnapshotTable.read(spark, root, Some(1L))
      .schema.fieldNames.toSeq === Seq("id", "tag", "v"))
    // evolving UPSERT: updates an old row under the new schema — its
    // untouched bucket siblings stay null-backfilled, no rewrite
    val up = Seq((3L, "UPD", 9L, 1.5)).toDF("id", "tag", "v", "score")
    SnapshotTable.upsert(up, root, mergeSchema = true)
    val v3 = SnapshotTable.read(spark, root)
    assert(v3.filter(col("id") === 3L).select("tag", "score")
      .as[(String, Double)].collect().toSeq === Seq(("UPD", 1.5)))
    assert(v3.count() === 11L)
    // dropped or retyped columns are refused even in merge mode
    intercept[IllegalArgumentException](SnapshotTable.append(
      Seq((99L, "x")).toDF("id", "tag"), root, mergeSchema = true))
    intercept[IllegalArgumentException](SnapshotTable.append(
      Seq((99L, 7L, 1L, 0.1)).toDF("id", "tag", "v", "score"), root,
      mergeSchema = true))
  }

  test("vacuum expires history exactly: kept versions intact, expired " +
      "unreadable, crashed-commit orphans reclaimed, in-flight dirs spared") {
    val root = freshRoot("vac")
    SnapshotTable.create(rows(0 until 20, "a"), root, Seq("id"), 4)
    SnapshotTable.upsert(Seq((3L, "UPD", 9L)).toDF("id", "tag", "v"), root)
    SnapshotTable.append(rows(20 until 25, "b"), root)
    val keptContent = asSet(SnapshotTable.read(spark, root))
    val v2Content = asSet(SnapshotTable.read(spark, root, Some(2L)))
    // a crashed commit's orphan data (version 2 <= max kept) and an
    // IN-FLIGHT writer's dir (version 4 = current+1, must survive)
    rows(50 until 55, "ZOMBIE").withColumn("_gb", lit(0))
      .write.partitionBy("_gb").parquet(s"$root/data/c2-deadbeef")
    rows(60 until 65, "INFLIGHT").withColumn("_gb", lit(0))
      .write.partitionBy("_gb").parquet(s"$root/data/c4-pending")
    val (expired, removed) = SnapshotTable.vacuum(spark, root, keepVersions = 2)
    assert(expired === 1) // v1
    assert(removed >= 1)  // at least the orphan's bucket dir
    assert(SnapshotTable.versions(spark, root).map(_.version) === Seq(2L, 3L))
    // kept versions read identically after the sweep
    assert(asSet(SnapshotTable.read(spark, root)) === keptContent)
    assert(asSet(SnapshotTable.read(spark, root, Some(2L))) === v2Content)
    // expired version unreadable; orphan gone; in-flight dir untouched
    intercept[RuntimeException](SnapshotTable.read(spark, root, Some(1L)))
    assert(!new java.io.File(s"$root/data/c2-deadbeef/_gb=0").exists())
    // the orphan COMMIT DIR goes too, _SUCCESS marker notwithstanding —
    // the husk check looks for surviving bucket subdirs, not "no files"
    assert(!new java.io.File(s"$root/data/c2-deadbeef").exists())
    assert(new java.io.File(s"$root/data/c4-pending/_gb=0").exists())
    // on-disk bucket dirs == exactly the kept manifests' references
    val onDisk = new java.io.File(s"$root/data").listFiles
      .filter(d => d.getName != "c4-pending")
      .flatMap(_.listFiles).filter(_.isDirectory).map(_.getName).toSeq
    val refCount = SnapshotTable.versions(spark, root)
      .flatMap(_.entries.map(_._2)).distinct.size
    assert(onDisk.size === refCount,
      s"disk $onDisk vs $refCount referenced dirs")
  }

  test("timestamp time travel: asOf resolves the newest commit <= t, " +
      "between-commits lands on the earlier one, before-first fails") {
    val root = freshRoot("ts")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)
    Thread.sleep(30) // guarantee distinct commit millis
    SnapshotTable.append(rows(10 until 15, "b"), root)
    val Seq(v1, v2) = SnapshotTable.versions(spark, root)
    assert(v1.ts > 0L && v2.ts > v1.ts)
    // between the two commits → v1's content
    assert(asSet(SnapshotTable.read(spark, root,
      asOfTimestamp = Some(v2.ts - 1))) === asSet(rows(0 until 10, "a")))
    // exactly at a commit ts → that commit
    assert(SnapshotTable.read(spark, root,
      asOfTimestamp = Some(v2.ts)).count() === 15L)
    // far future → latest
    assert(SnapshotTable.read(spark, root,
      asOfTimestamp = Some(v2.ts + 1000000L)).count() === 15L)
    // before the first commit → error, not an empty table
    val e = intercept[RuntimeException](SnapshotTable.read(spark, root,
      asOfTimestamp = Some(v1.ts - 1)))
    assert(e.getMessage.contains("no snapshot at or before"))
    // version and timestamp together are refused
    intercept[IllegalArgumentException](SnapshotTable.read(spark, root,
      version = Some(1L), asOfTimestamp = Some(v2.ts)))
  }

  test("publish race under contention: N writers racing the SAME version " +
      "through the lock → exactly one winner, losers all throw, winner's " +
      "manifest intact") {
    val root = freshRoot("lockrace")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)
    val v1 = SnapshotTable.versions(spark, root).head
    val n = 8
    val results = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until n).map { i =>
      val t = new Thread(() => {
        start.await()
        try {
          SnapshotTable.publishManifest(spark, root,
            v1.copy(version = 2L, op = "append", uuid = f"writer-$i%04d"))
          results.put(f"writer-$i%04d", "won"); ()
        } catch {
          case _: SnapshotTable.ConcurrentCommitException =>
            results.put(f"writer-$i%04d", "lost"); ()
        }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(30000))
    val winners = results.asScala.filter(_._2 == "won").keys.toSeq
    assert(winners.size === 1,
      s"expected exactly one winner, got $results")
    assert(results.size === n) // nobody hung or died un-adjudicated
    // the published manifest is the winner's, uncorrupted
    assert(SnapshotTable.versions(spark, root).last.uuid === winners.head)
    // no lock or loser-tmp husk left behind
    assert(!new java.io.File(s"$root/_manifests")
      .listFiles.exists(f => f.getName.startsWith(".lock") ||
        f.getName.startsWith(".tmp")))
  }

  test("readForKeys: hit rows only, absent keys no-op, equals the " +
      "filtered full read, respects time travel, keyless refuses") {
    val root = freshRoot("rfk")
    SnapshotTable.create(rows(0 until 40, "a"), root, Seq("id"), 8)
    SnapshotTable.upsert(Seq((3L, "UPD", 999L)).toDF("id", "tag", "v"), root)
    val probe = Seq(3L, 7L, 100L).toDF("id") // 100 is absent
    val got = asSet(SnapshotTable.readForKeys(probe, root))
    assert(got === Set((3L, "UPD", 999L), (7L, "a", 70L)))
    // parity with the unpruned spelling
    val full = asSet(SnapshotTable.read(spark, root)
      .join(probe, Seq("id"), "left_semi"))
    assert(got === full)
    // time travel: v1 still serves the pre-upsert row
    assert(asSet(SnapshotTable.readForKeys(probe, root, version = Some(1L)))
      === Set((3L, "a", 30L), (7L, "a", 70L)))
    // extra probe columns are ignored, duplicates collapse
    val noisy = Seq((7L, "x"), (7L, "y")).toDF("id", "junk")
    assert(asSet(SnapshotTable.readForKeys(noisy, root)) ===
      Set((7L, "a", 70L)))
    // keyless table refuses
    val nk = freshRoot("rfknk")
    SnapshotTable.create(rows(0 until 3, "a"), nk, Seq.empty, 2)
    intercept[RuntimeException](SnapshotTable.readForKeys(probe, nk))
  }

  test("readChanges: appends emit pure inserts from fresh dirs, upserts " +
      "emit delete(old)+insert(new), deletes emit deletes, ranges " +
      "concatenate, empty range is empty") {
    val root = freshRoot("cdf")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)   // v1
    SnapshotTable.append(rows(10 until 13, "b"), root)                // v2
    SnapshotTable.upsert(
      Seq((3L, "UPD", 999L), (50L, "NEW", 1L)).toDF("id", "tag", "v"),
      root)                                                           // v3
    SnapshotTable.delete(Seq(Tuple1(7L)).toDF("id"), root)            // v4
    def changes(a: Long, b: Long) =
      SnapshotTable.readChanges(spark, root, a, b)
        .select(col("id"), col("tag"), col("v"),
          col(SnapshotTable.ChangeTypeCol).as("ct"),
          col(SnapshotTable.CommitVersionCol).as("cv"))
        .as[(Long, String, Long, String, Long)].collect().toSet
    // v1→v2: pure append
    assert(changes(1L, 2L) ===
      (10 until 13).map(i => (i.toLong, "b", i * 10L, "insert", 2L)).toSet)
    // v2→v3: update = delete(old)+insert(new); insert of the new key
    assert(changes(2L, 3L) === Set(
      (3L, "a", 30L, "delete", 3L), (3L, "UPD", 999L, "insert", 3L),
      (50L, "NEW", 1L, "insert", 3L)))
    // v3→v4: pure delete
    assert(changes(3L, 4L) === Set((7L, "a", 70L, "delete", 4L)))
    // full range = concatenation of the steps
    assert(changes(1L, 4L) ===
      changes(1L, 2L) ++ changes(2L, 3L) ++ changes(3L, 4L))
    // empty range
    assert(changes(2L, 2L) === Set.empty)
    // applying the feed to v1 reproduces v4 (the Cdc contract):
    // v4 = v1 minus deleted rows plus inserted rows (multiset)
    val v1Rows = SnapshotTable.read(spark, root, Some(1L))
    val feed = SnapshotTable.readChanges(spark, root, 1L, 4L)
    val applied = v1Rows
      .exceptAll(feed.filter(col(SnapshotTable.ChangeTypeCol) === "delete")
        .select("id", "tag", "v"))
      .unionByName(feed.filter(col(SnapshotTable.ChangeTypeCol) === "insert")
        .select("id", "tag", "v"))
    assert(asSet(applied) === asSet(SnapshotTable.read(spark, root)))
  }

  test("targeted compact: only over-fragmented buckets rewritten, " +
      "untouched manifest lines byte-identical, content unchanged, " +
      "below-threshold is a no-op without an empty commit") {
    val root = freshRoot("tcp")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4)
    // fragment ONE bucket: blind-append the same id four times (same key
    // → same hash bucket), distinct v so the rows stay distinguishable
    (0 until 4).foreach(i =>
      SnapshotTable.append(Seq((1000L, "f", i.toLong))
        .toDF("id", "tag", "v"), root))
    val pre = SnapshotTable.versions(spark, root).last
    val before = asSet(SnapshotTable.read(spark, root))
    val byBucket = pre.entries.groupBy(_._1).view.mapValues(_.size).toMap
    val threshold = 2
    val over = byBucket.filter(_._2 > threshold).keySet
    assume(over.nonEmpty, s"fixture produced no fragmented bucket: $byBucket")
    val v = SnapshotTable.compact(spark, root, threshold)
    val post = SnapshotTable.versions(spark, root).last
    assert(post.version === v && post.op === "compact")
    // rewritten buckets collapse to one dir; others byte-identical
    val postBy = post.entries.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    over.foreach(b => assert(postBy(b).size === 1, s"bucket $b not collapsed"))
    pre.entries.filterNot(e => over(e._1)).foreach(e =>
      assert(post.entries.contains(e), s"untouched entry $e was rewritten"))
    assert(postBy.forall(_._2.size <= threshold))
    assert(asSet(SnapshotTable.read(spark, root)) === before)
    // idempotent: nothing over threshold now → no new commit
    assert(SnapshotTable.compact(spark, root, threshold) === v)
    assert(SnapshotTable.versions(spark, root).last.version === v)
  }

  test("manifest listing accepts versions past 8 digits") {
    val root = freshRoot("bigv")
    SnapshotTable.create(rows(0 until 4, "a"), root, Seq("id"), 2)
    val v1 = SnapshotTable.versions(spark, root).head
    SnapshotTable.publishManifest(spark, root,
      v1.copy(version = 100000000L, op = "append", uuid = "niner"))
    assert(SnapshotTable.versions(spark, root).map(_.version) ===
      Seq(1L, 100000000L))
    // and the next commit through the public API builds on it
    SnapshotTable.append(rows(4 until 6, "b"), root)
    assert(SnapshotTable.versions(spark, root).last.version === 100000001L)
  }

  test("data-skipping stats: every commit records per-dir min/max/has-" +
      "null for the stats columns, carried-forward dirs keep theirs " +
      "verbatim, Some(Nil) disables") {
    val root = freshRoot("st")
    SnapshotTable.create(rows(0 until 40, "a"), root, Seq("id"), 4)
    val v1 = SnapshotTable.versions(spark, root).last
    assert(v1.statsCols === Seq("id", "tag", "v")) // auto: all eligible
    assert(v1.entries.forall(e => v1.dirStats.contains(e._2)),
      "every created dir carries stats")
    // global bounds across dirs reconstruct the batch's true range
    val los = v1.entries.map(e => v1.dirStats(e._2)("id").lo.get.asInstanceOf[Long])
    val his = v1.entries.map(e => v1.dirStats(e._2)("id").hi.get.asInstanceOf[Long])
    assert(los.min === 0L && his.max === 39L)
    assert(v1.dirStats.values.forall(st => !st("id").hasNull))
    assert(v1.dirStats.values.forall(st => st("tag").lo.contains("a")))
    // upsert: untouched dirs' stats identical, rewritten dirs' refreshed
    SnapshotTable.upsert(Seq((3L, "ZZZ", 999L)).toDF("id", "tag", "v"), root)
    val v2 = SnapshotTable.versions(spark, root).last
    val hitBuckets = v2.entries.toSet.diff(v1.entries.toSet).map(_._1)
    v1.entries.filterNot(e => hitBuckets(e._1)).foreach(e =>
      assert(v2.dirStats(e._2) === v1.dirStats(e._2),
        s"carried dir ${e._2} stats changed"))
    val hitDirs = v2.entries.filter(e => hitBuckets(e._1)).map(_._2)
    assert(hitDirs.exists(d => v2.dirStats(d)("v").hi.contains(999L)))
    // "ZZZ" < "a" in UTF-8 order, so the update surfaces as the dir's MIN
    assert(hitDirs.exists(d => v2.dirStats(d)("tag").lo.contains("ZZZ")))
    // disabled stats
    val off = freshRoot("stoff")
    SnapshotTable.create(rows(0 until 5, "a"), off, Seq("id"), 2,
      statsCols = Some(Seq.empty))
    val voff = SnapshotTable.versions(spark, off).last
    assert(voff.statsCols.isEmpty && voff.dirStats.isEmpty)
    // explicit ineligible column refused
    val bad = freshRoot("stbad")
    intercept[IllegalArgumentException](SnapshotTable.create(
      rows(0 until 5, "a"), bad, Seq("id"), 2,
      statsCols = Some(Seq("nope"))))
  }

  test("stats JSON roundtrip: longs, round-trip doubles, escaped strings " +
      "(tabs/quotes/newlines stay inside the line format), booleans, " +
      "absent bounds, null flags") {
    import SnapshotTable.ColStats
    val types = SnapshotTable.statsTypes(
      "a BIGINT, b DOUBLE, c STRING, d BOOLEAN")
    val m = Map(
      "a" -> ColStats(Some(-77L), Some(Long.MaxValue), hasNull = false),
      "b" -> ColStats(Some(-0.5), Some(1.23456789012345e300), hasNull = true),
      "c" -> ColStats(Some("x\t\"quoted\"\nline"), None, hasNull = false),
      "d" -> ColStats(Some(false), Some(true), hasNull = false))
    val json = SnapshotTable.statsToJson(m)
    assert(!json.contains('\t') && !json.contains('\n'),
      s"control chars must be escaped for the line format: $json")
    assert(SnapshotTable.statsFromJson(json, types) === m)
    // integral-valued double bounds keep their Double kind through parse
    val dbl = Map("b" -> ColStats(Some(2.0), Some(4.0), hasNull = false))
    assert(SnapshotTable.statsFromJson(SnapshotTable.statsToJson(dbl), types)
      ("b").lo.get.isInstanceOf[Double])
  }

  test("stats edge cases: all-null column → absent bounds + null flag; " +
      "over-long strings truncate the lower bound and DROP the upper; " +
      "evolved columns simply lack stats") {
    val root = freshRoot("stedge")
    val longStr = "m" * 100
    val df = Seq(
      (1L, longStr + "aaa", null.asInstanceOf[java.lang.Long]),
      (2L, longStr + "zzz", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "s", "maybe")
    SnapshotTable.create(df, root, Seq("id"), 1)
    val v1 = SnapshotTable.versions(spark, root).last
    val st = v1.dirStats(v1.entries.head._2)
    // all-null: no bounds, hasNull set
    assert(st("maybe") === SnapshotTable.ColStats(None, None, hasNull = true))
    // long strings: lo truncated to a still-valid lower bound, hi absent
    assert(st("s").lo.contains("m" * 64) && st("s").hi.isEmpty)
    // schema evolution: new column appears without stats, commits go on
    SnapshotTable.append(Seq((3L, "short", 5L, 1.5))
      .toDF("id", "s", "maybe", "score"), root, mergeSchema = true)
    val v2 = SnapshotTable.versions(spark, root).last
    val newDir = v2.entries.map(_._2).diff(v1.entries.map(_._2)).head
    assert(!v2.dirStats(newDir).contains("score"),
      "columns added after create are not in the stats set")
    assert(v2.dirStats(newDir)("s").lo.contains("short"))
  }

  test("statsSatisfiable: sound three-valued pruning over every pushed " +
      "shape — ranges, IN, null probes, And/Or, prefixes, absent bounds") {
    import SnapshotTable.{ColStats, statsSatisfiable}
    import org.apache.spark.sql.sources._
    val types = SnapshotTable.statsTypes("x BIGINT, s STRING, f DOUBLE")
    val st = Map(
      "x" -> ColStats(Some(10L), Some(20L), hasNull = false),
      "s" -> ColStats(Some("carrot"), Some("melon"), hasNull = true),
      "f" -> ColStats(None, None, hasNull = true))
    def ok(f: Filter) = statsSatisfiable(st, types, f)
    assert(ok(EqualTo("x", 15L)) && !ok(EqualTo("x", 9L)) && !ok(EqualTo("x", 21L)))
    assert(ok(EqualTo("x", 10L)) && ok(EqualTo("x", 20L))) // inclusive
    assert(ok(GreaterThan("x", 19L)) && !ok(GreaterThan("x", 20L)))
    assert(ok(GreaterThanOrEqual("x", 20L)) && !ok(GreaterThanOrEqual("x", 21L)))
    assert(ok(LessThan("x", 11L)) && !ok(LessThan("x", 10L)))
    assert(ok(LessThanOrEqual("x", 10L)) && !ok(LessThanOrEqual("x", 9L)))
    assert(ok(In("x", Array(1L, 15L))) && !ok(In("x", Array(1L, 2L))))
    assert(!ok(IsNull("x")) && ok(IsNull("s")))
    assert(ok(EqualNullSafe("s", null)) && !ok(EqualNullSafe("x", null)))
    assert(!ok(And(EqualTo("x", 15L), EqualTo("x", 25L))))
    assert(ok(Or(EqualTo("x", 5L), EqualTo("x", 15L))))
    assert(!ok(Or(EqualTo("x", 5L), EqualTo("x", 25L))))
    assert(ok(StringStartsWith("s", "gr")) && !ok(StringStartsWith("s", "ap"))
      && !ok(StringStartsWith("s", "z")))
    // int literal against a BIGINT column still normalizes and prunes
    assert(!ok(EqualTo("x", 9)))
    // absent bounds answer true for everything except null-absence probes
    assert(ok(EqualTo("f", 1.0)) && ok(GreaterThan("f", 1e300)) && ok(IsNull("f")))
    // unknown column / untyped comparisons never prune
    assert(ok(EqualTo("ghost", 1L)))
  }

  test("statsCertain: the provably-ALL-rows-match dual — sound default " +
      "FALSE on unknowns/nulls/absent bounds; comparisons, IN, " +
      "IsNotNull, And/Or prove; IsNull/Not/prefixes never do") {
    import SnapshotTable.{ColStats, statsCertain}
    import org.apache.spark.sql.sources._
    val types =
      SnapshotTable.statsTypes("x BIGINT, s STRING, n BIGINT, f DOUBLE")
    val st = Map(
      "x" -> ColStats(Some(10L), Some(20L), hasNull = false),
      "s" -> ColStats(Some("en"), Some("en"), hasNull = false),
      "n" -> ColStats(Some(1L), Some(2L), hasNull = true), // has nulls
      "f" -> ColStats(None, None, hasNull = false)) // unknown bounds
    def ok(f: Filter) = statsCertain(st, types, f)
    // point dirs: identity-partition value proves equality
    assert(ok(EqualTo("s", "en")) && !ok(EqualTo("s", "ja")))
    assert(ok(In("s", Array("ja", "en"))) && !ok(In("s", Array("ja"))))
    // ranges: strict/inclusive boundaries against [10, 20]
    assert(ok(LessThan("x", 21L)) && !ok(LessThan("x", 20L)))
    assert(ok(LessThanOrEqual("x", 20L)) && !ok(LessThanOrEqual("x", 19L)))
    assert(ok(GreaterThan("x", 9L)) && !ok(GreaterThan("x", 10L)))
    assert(ok(GreaterThanOrEqual("x", 10L)) && !ok(GreaterThanOrEqual("x", 11L)))
    assert(!ok(EqualTo("x", 15L))) // range dir: equality not provable
    // a null row evaluates any comparison to NULL ≠ TRUE: never certain
    assert(!ok(LessThan("n", 100L)) && !ok(IsNotNull("n")))
    assert(ok(IsNotNull("x")) && ok(IsNotNull("s")) && ok(IsNotNull("f")))
    // absent bounds / unknown columns: not provable
    assert(!ok(LessThan("f", 1e300)) && !ok(EqualTo("ghost", 1L)))
    // And needs both, Or needs either
    assert(ok(And(LessThan("x", 21L), EqualTo("s", "en"))))
    assert(!ok(And(LessThan("x", 21L), EqualTo("s", "ja"))))
    assert(ok(Or(EqualTo("s", "ja"), LessThan("x", 21L))))
    assert(!ok(Or(EqualTo("s", "ja"), LessThan("x", 15L))))
    // shapes bounds cannot prove for ALL rows
    assert(!ok(IsNull("n")) && !ok(StringStartsWith("s", "e")) &&
      !ok(Not(EqualTo("s", "ja"))))
    // int literal normalizes against BIGINT
    assert(ok(LessThan("x", 21)))
  }

  test("compact collapses accumulated append entries; content unchanged") {
    val root = freshRoot("cp")
    val buckets = 4
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), buckets)
    SnapshotTable.append(rows(10 until 20, "b"), root)
    SnapshotTable.append(rows(20 until 30, "c"), root)
    val before = asSet(SnapshotTable.read(spark, root))
    val preEntries = SnapshotTable.versions(spark, root).last.entries
    assert(preEntries.size > buckets) // appends accumulated dirs
    SnapshotTable.compact(spark, root)
    val post = SnapshotTable.versions(spark, root).last
    assert(post.entries.size <= buckets)
    assert(asSet(SnapshotTable.read(spark, root)) === before)
  }
}
