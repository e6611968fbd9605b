package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** Per-dir key bloom filters: every commit writes a hidden `.bloom`
  * sidecar per bucket dir in the same stats pass; point lookups test
  * candidate dirs against the probe hashes, so an absent-key read
  * touches ZERO data files. Soundness: blooms have no false negatives,
  * absent/corrupt filters read the dir, residual predicates / the
  * readForKeys semi-join keep the output exact regardless. */
class SnapshotBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_bloom_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(ids: Seq[Long], tag: String) =
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")

  private def bloomFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName == ".bloom") Seq(f) else Seq.empty
    walk(new java.io.File(root, "data"))
  }

  test("every commit path writes one .bloom per bucket dir; an " +
      "absent-key lookup reads ZERO data bytes, object API and " +
      "connector alike") {
    val root = freshRoot("zero")
    SnapshotTable.create(rows(0L until 1000L, "a"), root, Seq("id"), 8)
    SnapshotTable.append(rows(1000L until 1100L, "b"), root)
    SnapshotTable.upsert(Seq((5L, "UPD", 1L)).toDF("id", "tag", "v"), root)
    val head = SnapshotTable.versions(spark, root).last
    assert(bloomFiles(root).size >= head.entries.size)
    // absent key: bloom rejects every candidate dir → zero DATA files
    // read (the few hundred bytes below are the probe's own
    // localCheckpoint block re-read, which task input metrics count)
    val (absent, absentBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.readForKeys(Seq(999999L).toDF("id"), root).collect()
    }
    assert(absent.isEmpty && absentBytes < 1024L,
      s"absent-key lookup read $absentBytes bytes")
    val (absent2, absentBytes2, _) = ShuffleMetrics.measureInput(spark) {
      spark.read.format("graft-snapshot").load(root)
        .where(col("id") === 999999L).collect()
    }
    assert(absent2.isEmpty && absentBytes2 === 0L,
      s"connector absent-key lookup read $absentBytes2 bytes")
    // present keys still answer exactly (updated + appended + created)
    assert(SnapshotTable.readForKeys(Seq(5L, 1050L, 7L).toDF("id"), root)
      .select("id", "tag").as[(Long, String)].collect().toSet ===
      Set((5L, "UPD"), (1050L, "b"), (7L, "a")))
    assert(spark.read.format("graft-snapshot").load(root)
      .where(col("id") === 5L).select("tag").as[String]
      .collect().toSeq === Seq("UPD"))
  }

  test("back-compat and soundness: deleting the .bloom sidecars only " +
      "widens reads, never changes answers; oversized probes skip " +
      "bloom pruning") {
    val root = freshRoot("compat")
    SnapshotTable.create(rows(0L until 100L, "a"), root, Seq("id"), 4)
    bloomFiles(root).foreach(f => assert(f.delete()))
    assert(SnapshotTable.readForKeys(Seq(7L).toDF("id"), root)
      .select("v").as[Long].collect().toSeq === Seq(70L))
    assert(SnapshotTable.readForKeys(Seq(999L).toDF("id"), root)
      .count() === 0L)
    // probe wider than the driver bound: pruning skipped, answer exact
    val root2 = freshRoot("wide")
    SnapshotTable.create(rows(0L until 6000L, "a"), root2, Seq("id"), 4)
    val probe = (0L until 5000L).toDF("id") // > BloomProbeMax distinct
    assert(SnapshotTable.readForKeys(probe, root2).count() === 5000L)
  }

  test("a CORRUPT .bloom degrades to may-contain (full read), never a " +
      "failed read — even when the corruption throws a non-IO error " +
      "inside the sketch decoder") {
    val root = freshRoot("corrupt")
    SnapshotTable.create(rows(0L until 100L, "a"), root, Seq("id"), 4)
    // garbage that parses a negative array length → the decoder throws
    // NegativeArraySizeException / IllegalArgumentException, not IO
    bloomFiles(root).foreach { f =>
      val out = new java.io.FileOutputStream(f)
      try out.write(Array[Byte](1, -1, -1, -1, -1, 0, 0, 0, 0))
      finally out.close()
    }
    assert(SnapshotTable.readForKeys(Seq(7L).toDF("id"), root)
      .select("v").as[Long].collect().toSeq === Seq(70L))
    assert(SnapshotTable.readForKeys(Seq(999L).toDF("id"), root)
      .count() === 0L)
    // truncated-to-empty is the other common corruption shape
    bloomFiles(root).foreach { f =>
      val out = new java.io.FileOutputStream(f)
      out.close()
    }
    assert(SnapshotTable.readForKeys(Seq(8L).toDF("id"), root)
      .select("v").as[Long].collect().toSeq === Seq(80L))
  }

  test("blooms compose with merge-on-read deltas, rescale, and column " +
      "mapping: events are never bloom-dropped and migrated dirs get " +
      "fresh filters") {
    val root = freshRoot("mix")
    SnapshotTable.create(rows(0L until 200L, "a"), root, Seq("id"), 4)
    SnapshotTable.renameColumn(spark, root, "v", "score")
    SnapshotTable.rescaleBuckets(spark, root, 16)
    SnapshotTable.upsert(Seq((9L, "MOR", 1L)).toDF("id", "tag", "score"),
      root, mergeOnRead = true)
    SnapshotTable.delete(Seq(11L).toDF("id"), root, mergeOnRead = true)
    // lookups across deltas + old-layout dirs + mapping
    assert(SnapshotTable.readForKeys(Seq(9L).toDF("id"), root)
      .select("tag").as[String].collect().toSeq === Seq("MOR"))
    assert(SnapshotTable.readForKeys(Seq(11L).toDF("id"), root)
      .count() === 0L)
    assert(SnapshotTable.readForKeys(Seq(424242L).toDF("id"), root)
      .count() === 0L)
    // a migrating merge-on-write upsert writes fresh blooms for the
    // migrated dirs; absent keys stay zero-read afterwards
    SnapshotTable.upsert(Seq((13L, "MOW", 2L)).toDF("id", "tag", "score"),
      root)
    val (out, bytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.readForKeys(Seq(888888L).toDF("id"), root).collect()
    }
    assert(out.isEmpty && bytes < 1024L, s"read $bytes bytes")
  }
}
