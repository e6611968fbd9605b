package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SnapshotCdfScan, SnapshotMicroBatchStream, SnapshotOffset, SnapshotStreamOptions, SnapshotTable}

/** SHALLOW CLONE of the snapshot format ([[SnapshotTable.cloneTable]]
  * — the Delta `CREATE TABLE … SHALLOW CLONE` shape): version 1 of the
  * new table re-lists the source's data dirs by reference, so forking a
  * 100 TB table is ONE metadata commit, zero data bytes. These tests
  * pin the zero-copy property itself, full metadata carry (stats,
  * metadata-only counts, MOR layers), divergence isolation in both
  * directions, the clone-side vacuum's structural inability to touch
  * source data, and the SQL procedure surface. */
class SnapshotCloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_clone_$tag")
    d.toFile.deleteOnExit()
    d.toFile
  }
  private def freshRoot(tag: String): String =
    new java.io.File(freshDir(tag), "tbl").getAbsolutePath

  private def rows(n: Range, tag: String) =
    n.map(i => (i.toLong, tag, i * 10L)).toDF("id", "tag", "v")

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  import scala.jdk.CollectionConverters._

  /** Bytes of data FILES under a table root (manifests excluded). */
  private def dataBytes(root: String): Long = {
    val d = new java.io.File(root, "data")
    if (!d.exists) return 0L
    val walk = java.nio.file.Files.walk(d.toPath)
    try walk.iterator().asScala.filter(_.toFile.isFile)
      .map(_.toFile.length()).sum
    finally walk.close()
  }

  test("clone is ZERO-COPY: one metadata commit, no data dir at the " +
      "clone root, content identical, stats-carried metadata answers " +
      "count(*) without a scan, and key-pruned lookups still work") {
    val src = freshRoot("zc_src")
    val dst = freshRoot("zc_dst")
    SnapshotTable.create(rows(0 until 64, "a"), src, Seq("id"), 8)
    SnapshotTable.append(rows(64 until 80, "b"), src)
    assert(SnapshotTable.cloneTable(spark, src, dst) === 1L)
    // zero copy: the clone root holds metadata only
    assert(dataBytes(dst) === 0L, "clone must not copy data files")
    assert(asSet(SnapshotTable.read(spark, dst)) ===
      asSet(SnapshotTable.read(spark, src)))
    val cs = SnapshotTable.versions(spark, dst)
    assert(cs.map(s => (s.version, s.op)) === Seq((1L, "clone")))
    // carried per-dir rows answer the metadata-only count
    assert(cs.head.metadataRowCount === Some(80L))
    assert(cs.head.metadataSizeBytes.exists(_ > 0L))
    // carried keys/buckets serve key-pruned lookups
    assert(asSet(SnapshotTable.readForKeys(
      Seq(3L).toDF("id"), dst)) === Set((3L, "a", 30L)))
    // the V2 connector reads the clone like any table
    assert(asSet(spark.read.format("graft-snapshot").load(dst)) ===
      asSet(SnapshotTable.read(spark, src)))
  }

  test("clone pins a POINT of the source's history (version or tag) " +
      "and refuses an existing destination or missing version") {
    val src = freshRoot("ver_src")
    SnapshotTable.create(rows(0 until 10, "a"), src, Seq("id"), 4)
    SnapshotTable.append(rows(10 until 20, "b"), src)
    SnapshotTable.createTag(spark, src, "rel", Some(1L))
    SnapshotTable.append(rows(20 until 30, "c"), src)
    val atV2 = freshRoot("ver_v2")
    SnapshotTable.cloneTable(spark, src, atV2, version = Some(2L))
    assert(asSet(SnapshotTable.read(spark, atV2)) ===
      asSet(rows(0 until 20, "x")).map { case (i, _, v) =>
        (i, if (i < 10) "a" else "b", v) })
    val atTag = freshRoot("ver_tag")
    SnapshotTable.cloneTable(spark, src, atTag, tag = Some("rel"))
    assert(asSet(SnapshotTable.read(spark, atTag)) ===
      asSet(rows(0 until 10, "a")))
    // refusals
    intercept[Exception](SnapshotTable.cloneTable(spark, src, atV2))
    intercept[Exception](SnapshotTable.cloneTable(spark, src,
      freshRoot("ver_bad"), version = Some(99L)))
  }

  test("clone and source DIVERGE independently: writes to one never " +
      "surface in the other, and the clone accepts the full write " +
      "surface (append, upsert, delete) over referenced dirs") {
    val src = freshRoot("div_src")
    val dst = freshRoot("div_dst")
    SnapshotTable.create(rows(0 until 20, "a"), src, Seq("id"), 4)
    SnapshotTable.cloneTable(spark, src, dst)
    // clone-side writes: append new rows, update a referenced row,
    // delete a referenced row — all against by-reference source dirs
    SnapshotTable.append(rows(20 until 25, "n"), dst)
    SnapshotTable.upsert(Seq((3L, "UPD", 999L)).toDF("id", "tag", "v"), dst)
    SnapshotTable.delete(Seq(5L).toDF("id"), dst)
    val expectClone = asSet(rows(0 until 25, "x")).map { case (i, _, v) =>
      (i, if (i < 20) "a" else "n", v)
    } - ((3L, "a", 30L)) - ((5L, "a", 50L)) + ((3L, "UPD", 999L))
    assert(asSet(SnapshotTable.read(spark, dst)) === expectClone)
    // source is untouched
    assert(asSet(SnapshotTable.read(spark, src)) ===
      asSet(rows(0 until 20, "a")))
    // source-side writes stay out of the clone
    SnapshotTable.append(rows(100 until 105, "s"), src)
    assert(asSet(SnapshotTable.read(spark, dst)) === expectClone)
  }

  test("unresolved merge-on-read layers travel with the clone and " +
      "resolve identically") {
    val src = freshRoot("mor_src")
    val dst = freshRoot("mor_dst")
    SnapshotTable.create(rows(0 until 16, "a"), src, Seq("id"), 4)
    SnapshotTable.upsert(Seq((2L, "M", 1L), (99L, "M", 2L))
      .toDF("id", "tag", "v"), src, mergeOnRead = true)
    SnapshotTable.delete(Seq(7L).toDF("id"), src, mergeOnRead = true)
    assert(SnapshotTable.versions(spark, src).last.deltas.nonEmpty)
    SnapshotTable.cloneTable(spark, src, dst)
    assert(SnapshotTable.versions(spark, dst).head.deltas.nonEmpty)
    assert(asSet(SnapshotTable.read(spark, dst)) ===
      asSet(SnapshotTable.read(spark, src)))
    // a delta-bearing clone commit REFUSES to stream or CDF-serve:
    // its base entries verbatim would emit tombstoned/shadowed rows
    val stTail = new SnapshotMicroBatchStream(dst, _ => null, false,
      SnapshotStreamOptions(startingVersion = Some("1")))
    val eT = intercept[Exception](stTail.rangeDirs(
      stTail.initialOffset().asInstanceOf[SnapshotOffset],
      SnapshotOffset(1)))
    assert(eT.getMessage.contains("compact"))
    val stInit = new SnapshotMicroBatchStream(dst, _ => null, false)
    val eI = intercept[Exception](
      stInit.rangeDirs(SnapshotOffset(0), SnapshotOffset(1)))
    assert(eI.getMessage.contains("compact"))
    val eC = intercept[Exception](
      new SnapshotCdfScan(SnapshotTable.versions(spark, dst).last, dst,
        Some(1L), None).toBatch.planInputPartitions())
    assert(eC.getMessage.contains("compact"))
    // the CDF STREAM refuses BEFORE any offset is logged (initialOffset
    // and admission-control latestOffset) — thrown only at plan time it
    // would wedge the checkpoint: the logged batch replays into the
    // same error forever, even after the advised compact
    val cdfStream = new SnapshotCdfScan(
      SnapshotTable.versions(spark, dst).last, dst, Some(1L), None)
      .toMicroBatchStream("unused-ckpt")
    val eIo = intercept[Exception](cdfStream.initialOffset())
    assert(eIo.getMessage.contains("compact"))
    import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl}
    val eLo = intercept[Exception](
      cdfStream.asInstanceOf[SupportsAdmissionControl]
        .latestOffset(SnapshotOffset(0), ReadLimit.allAvailable()))
    assert(eLo.getMessage.contains("compact"))
  }

  test("the SOURCE's vacuum refuses to expire a registered clone's " +
      "pinned version (the Delta footgun becomes a refusal); keeping " +
      "the version, unregistering, or ignoreClones all unblock") {
    val src = freshRoot("vacguard_src")
    val dst = freshRoot("vacguard_dst")
    SnapshotTable.create(rows(0 until 8, "a"), src, Seq("id"), 2)
    SnapshotTable.cloneTable(spark, src, dst) // pins src v1
    SnapshotTable.append(rows(8 until 12, "b"), src) // v2
    SnapshotTable.append(rows(12 until 16, "c"), src) // v3
    // keepVersions=1 would expire v1 — the clone still lists v1's dirs
    val e = intercept[Exception](SnapshotTable.vacuum(spark, src, 1))
    assert(e.getMessage.contains(dst) && e.getMessage.contains("clone"))
    // nothing was expired by the refused attempt
    assert(SnapshotTable.versions(spark, src).map(_.version) ===
      Seq(1L, 2L, 3L))
    // keeping through the pinned version is fine
    val (exp0, _) = SnapshotTable.vacuum(spark, src, 3)
    assert(exp0 === 0)
    // unregistering drops the guard; the vacuum then proceeds and the
    // clone breaks EXPLICITLY (documented), not silently
    assert(SnapshotTable.unregisterClone(spark, src, dst) === 1)
    val (exp1, _) = SnapshotTable.vacuum(spark, src, 1)
    assert(exp1 === 2)
    // a second unregister has nothing to remove
    assert(SnapshotTable.unregisterClone(spark, src, dst) === 0)
    // ignoreClones overrides without unregistering
    val src2 = freshRoot("vacguard_src2")
    val dst2 = freshRoot("vacguard_dst2")
    SnapshotTable.create(rows(0 until 8, "a"), src2, Seq("id"), 2)
    SnapshotTable.cloneTable(spark, src2, dst2)
    SnapshotTable.append(rows(8 until 12, "b"), src2)
    val (exp2, _) = SnapshotTable.vacuum(spark, src2, 1,
      ignoreClones = true)
    assert(exp2 === 1)
  }

  test("the clone's VACUUM can never touch source data: after the " +
      "clone drops every referenced dir (overwrite) and expires its " +
      "history, the source still reads intact") {
    val src = freshRoot("vac_src")
    val dst = freshRoot("vac_dst")
    SnapshotTable.create(rows(0 until 20, "a"), src, Seq("id"), 4)
    val srcBytes = dataBytes(src)
    SnapshotTable.cloneTable(spark, src, dst)
    SnapshotTable.overwrite(rows(50 until 55, "o"), dst)
    val (expired, removed) = SnapshotTable.vacuum(spark, dst, 1)
    assert(expired === 1) // the clone commit's manifest
    assert(removed === 0) // nothing under dst/data referenced v1 dirs
    assert(dataBytes(src) === srcBytes, "source data must be untouched")
    assert(asSet(SnapshotTable.read(spark, src)) ===
      asSet(rows(0 until 20, "a")))
    assert(asSet(SnapshotTable.read(spark, dst)) ===
      asSet(rows(50 until 55, "o")))
  }

  test("a clone streams: the initial snapshot serves the referenced " +
      "dirs, startingVersion=1 tails through the clone commit, and " +
      "appends after the clone tail in") {
    val src = freshRoot("str_src")
    val dst = freshRoot("str_dst")
    SnapshotTable.create(rows(0 until 8, "a"), src, Seq("id"), 4)
    SnapshotTable.cloneTable(spark, src, dst)
    SnapshotTable.append(rows(8 until 12, "b"), dst)
    val st = new SnapshotMicroBatchStream(dst, _ => null, false,
      SnapshotStreamOptions(startingVersion = Some("1")))
    val a0 = st.initialOffset().asInstanceOf[SnapshotOffset]
    val end = st.latestOffset(a0, st.getDefaultReadLimit)
      .asInstanceOf[SnapshotOffset]
    val dirs = st.rangeDirs(a0, end)
    assert(dirs.toSet ===
      SnapshotTable.versions(spark, dst).last.entries.map(_._2).toSet)
  }

  test("SQL surface: CALL system.clone forks a catalog table in place; " +
      "history shows op=clone; the fork reads through SQL") {
    val d = java.nio.file.Files.createTempDirectory("graft_clone_wh")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.clonecat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.clonecat.warehouse", d.toString)
    spark.sql("CREATE TABLE clonecat.base (id BIGINT, tag STRING, " +
      "v BIGINT) PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO clonecat.base VALUES (1, 'a', 10), (2, 'b', 20)")
    val got = spark.sql(
      "CALL clonecat.system.clone('base', 'fork', 0)").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L))
    assert(asSet(spark.sql("SELECT * FROM clonecat.fork")) ===
      Set((1L, "a", 10L), (2L, "b", 20L)))
    val hist = spark.sql("CALL clonecat.system.history('fork')").collect()
    assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "clone")))
    // forks diverge in SQL too
    spark.sql("INSERT INTO clonecat.fork VALUES (3, 'c', 30)")
    assert(spark.sql("SELECT * FROM clonecat.base").count() === 2L)
    // an existing target refuses
    intercept[Exception](spark.sql(
      "CALL clonecat.system.clone('base', 'fork', 0)").collect())
  }
}
