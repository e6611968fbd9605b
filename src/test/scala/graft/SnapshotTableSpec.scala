package graft

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
