package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Materialize
import graft.sources.{SnapshotMeta, SnapshotTable}
import graft.sources.SnapshotTable.ConcurrentCommitException

/** Bucket-layout evolution ([[SnapshotTable.rescaleBuckets]]): the
  * metadata-only grow, layout-aware reads/pruning over the mixed-layout
  * interregnum, incremental migration through upsert/delete/compact,
  * change-feed exactness across the boundary, restore semantics, and
  * the concurrency guard. */
class SnapshotRescaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_rescale_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(ids: Seq[Long], tag: String) =
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  /** The production bucket hash under `buckets`, through the same plan. */
  private def bucketOf(id: Long, buckets: Int): Int =
    Seq(id).toDF("id")
      .select(pmod(hash(col("id")), lit(buckets))).head().getInt(0)

  test("rescale is a pure-metadata commit: identical entries, old dirs " +
      "tagged with their historical layout, content and time travel " +
      "unchanged") {
    val root = freshRoot("meta")
    SnapshotTable.create(rows(0L until 64L, "a"), root, Seq("id"), 4)
    val v1 = SnapshotTable.versions(spark, root).head
    assert(SnapshotTable.rescaleBuckets(spark, root, 16) === 2L)
    val v2 = SnapshotTable.versions(spark, root).last
    assert(v2.op === "rescale" && v2.buckets === 16)
    // byte-identical dir list — no data was written or moved
    assert(v2.entries === v1.entries)
    // every carried dir is tagged at the OLD layout (manifest
    // round-trip: these came back through parseManifest)
    assert(v2.entries.forall(e => v2.layoutOf(e._2) === 4))
    assert(v2.mixedLayout)
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 64L, "a")))
    assert(asSet(SnapshotTable.read(spark, root, Some(1L))) ===
      asSet(rows(0L until 64L, "a")))
  }

  test("guards: shrink, non-multiple, keyless, and pending " +
      "merge-on-read deltas are refused") {
    val root = freshRoot("guard")
    SnapshotTable.create(rows(0L until 8L, "a"), root, Seq("id"), 4)
    intercept[IllegalArgumentException](
      SnapshotTable.rescaleBuckets(spark, root, 2))
    intercept[IllegalArgumentException](
      SnapshotTable.rescaleBuckets(spark, root, 6))
    intercept[IllegalArgumentException](
      SnapshotTable.rescaleBuckets(spark, root, 4))
    SnapshotTable.upsert(rows(Seq(1L), "mor"), root, mergeOnRead = true)
    intercept[IllegalArgumentException](
      SnapshotTable.rescaleBuckets(spark, root, 8))
    val keyless = freshRoot("keyless")
    SnapshotTable.create(rows(0L until 8L, "a"), keyless, Seq.empty, 1)
    intercept[IllegalArgumentException](
      SnapshotTable.rescaleBuckets(spark, keyless, 2))
  }

  test("post-rescale append writes CURRENT-layout dirs; reads merge " +
      "both layouts; readForKeys stays exact across the mix") {
    val root = freshRoot("mix")
    SnapshotTable.create(rows(0L until 64L, "old"), root, Seq("id"), 4)
    SnapshotTable.rescaleBuckets(spark, root, 16)
    SnapshotTable.append(rows(64L until 96L, "new"), root)
    val head = SnapshotTable.versions(spark, root).last
    val fresh = head.entries.filterNot(e => head.layoutOf(e._2) == 4)
    assert(fresh.nonEmpty &&
      fresh.forall(e => head.layoutOf(e._2) === 16))
    // fresh dirs landed at NEW-layout bucket ids
    assert(fresh.forall { case (b, _) => b < 16 })
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 64L, "old")) ++ asSet(rows(64L until 96L, "new")))
    // keyed lookups across the mix: one key from each era
    val probe = Seq(3L, 70L).toDF("id")
    assert(asSet(SnapshotTable.readForKeys(probe, root)) ===
      Set((3L, "old", 30L), (70L, "new", 700L)))
  }

  test("post-rescale upsert MIGRATES the old dirs it touches: hit old " +
      "buckets drop out, rows land under the new layout, untouched old " +
      "dirs carry forward byte-identical") {
    val root = freshRoot("mig")
    SnapshotTable.create(rows(0L until 64L, "old"), root, Seq("id"), 4)
    SnapshotTable.rescaleBuckets(spark, root, 16)
    val preEntries = SnapshotTable.versions(spark, root).last.entries.toSet
    // one updated key + one insert: hits ONE old bucket's dir (worst
    // case two), whose whole content migrates
    val k = 5L
    val oldB = bucketOf(k, 4)
    SnapshotTable.upsert(Seq((k, "UPD", 999L)).toDF("id", "tag", "v"), root)
    val head = SnapshotTable.versions(spark, root).last
    // the hit old dir is gone from the manifest
    assert(!head.entries.exists(e =>
      head.layoutOf(e._2) == 4 && e._1 == oldB))
    // untouched old dirs carried byte-identical
    val carriedOld = head.entries.filter(e => head.layoutOf(e._2) == 4)
    assert(carriedOld.toSet.subsetOf(preEntries))
    assert(carriedOld.map(_._1).toSet === (0 until 4).toSet - oldB)
    // migrated rows live under new-layout ids congruent to oldB (mod 4)
    val migrated = head.entries.filter(e => head.layoutOf(e._2) == 16)
    assert(migrated.nonEmpty &&
      migrated.forall { case (b, _) => b % 4 == oldB })
    val expect = asSet(rows(0L until 64L, "old")) -
      ((k, "old", k * 10)) + ((k, "UPD", 999L))
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    // keyed delete of a migrated sibling still works post-migration
    SnapshotTable.delete(Seq(k + 4).toDF("id"), root)
    assert(asSet(SnapshotTable.read(spark, root)) ===
      expect - ((k + 4, "old", (k + 4) * 10)))
  }

  test("full compact migrates everything; targeted compact counts an " +
      "old dir toward every bucket it covers and migrates what it " +
      "rewrites") {
    val root = freshRoot("cmp")
    SnapshotTable.create(rows(0L until 64L, "a"), root, Seq("id"), 2)
    SnapshotTable.rescaleBuckets(spark, root, 8)
    // fragment: several appends into the new layout
    (0 until 3).foreach(i =>
      SnapshotTable.append(rows(Seq(100L + i), s"f$i"), root))
    // every NEW bucket covered by an old dir sees: 1 (old dir) + its
    // share of appends; threshold 1 targets any bucket with >1 inputs
    val v = SnapshotTable.compact(spark, root, maxDirsPerBucket = 1)
    val afterTargeted = SnapshotTable.versions(spark, root).last
    assert(v > 0)
    val expect = asSet(rows(0L until 64L, "a")) ++
      (0 until 3).map(i => (100L + i, s"f$i", (100L + i) * 10)).toSet
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    // full compact: no old-layout dir survives
    SnapshotTable.compact(spark, root)
    val head = SnapshotTable.versions(spark, root).last
    assert(!head.mixedLayout)
    assert(head.entries.forall { case (b, d) =>
      head.layoutOf(d) == 8 && b < 8 })
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    assert(afterTargeted.version < head.version)
  }

  test("V2 connector parity across the mix: full read, point lookup " +
      "(layout-aware bucket pruning + residual filters), and version " +
      "time travel all match the object API") {
    val root = freshRoot("v2")
    SnapshotTable.create(rows(0L until 64L, "old"), root, Seq("id"), 4)
    SnapshotTable.rescaleBuckets(spark, root, 16)
    SnapshotTable.append(rows(64L until 80L, "new"), root)
    SnapshotTable.upsert(Seq((7L, "UPD", 1L)).toDF("id", "tag", "v"), root)
    def v2(opts: (String, String)*): DataFrame = {
      val r = spark.read.format("graft-snapshot")
      opts.foreach { case (k, vv) => r.option(k, vv) }
      r.load(root)
    }
    (1L to 4L).foreach { ver =>
      assert(asSet(v2("versionAsOf" -> ver.toString)) ===
        asSet(SnapshotTable.read(spark, root, Some(ver))), s"version $ver")
    }
    // point lookups: an old-era key (pruned to old dir + congruent new
    // dirs), a migrated key, a fresh key, an absent key
    Seq(3L, 7L, 70L, 12345L).foreach { k =>
      assert(v2().where(col("id") === k).collect().toSeq ===
        SnapshotTable.read(spark, root)
          .where(col("id") === k).collect().toSeq, s"key $k")
    }
  }

  test("merge-on-read over a mixed layout: the connector's replay " +
      "classes route old-dir rows past their buckets' events " +
      "(tombstones kill rows living in historical-layout dirs)") {
    val root = freshRoot("morr")
    SnapshotTable.create(rows(0L until 64L, "old"), root, Seq("id"), 4)
    SnapshotTable.rescaleBuckets(spark, root, 16)
    // MOR events against keys whose base rows live in OLD-layout dirs
    SnapshotTable.upsert(Seq((9L, "MOR", 1L)).toDF("id", "tag", "v"),
      root, mergeOnRead = true)
    SnapshotTable.delete(Seq(11L).toDF("id"), root, mergeOnRead = true)
    val expect = asSet(rows(0L until 64L, "old")) -
      ((9L, "old", 90L)) - ((11L, "old", 110L)) + ((9L, "MOR", 1L))
    // object API resolution
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    // connector resolution (SnapshotMorScan replay classes)
    assert(asSet(spark.read.format("graft-snapshot").load(root)) === expect)
    // merge-on-write upsert consumes the deltas AND migrates the dirs
    SnapshotTable.upsert(Seq((9L, "MOW", 2L)).toDF("id", "tag", "v"), root)
    val head = SnapshotTable.versions(spark, root).last
    assert(!head.deltas.exists(_.bucket == bucketOf(9L, 16)))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      expect - ((9L, "MOR", 1L)) + ((9L, "MOW", 2L)))
  }

  test("change feed: the rescale step reports zero changes at zero " +
      "cost; a post-rescale migrating upsert diffs exactly") {
    val root = freshRoot("cdf")
    SnapshotTable.create(rows(0L until 32L, "a"), root, Seq("id"), 4)
    SnapshotTable.rescaleBuckets(spark, root, 8)
    assert(SnapshotTable.readChanges(spark, root, 1L, 2L).count() === 0L)
    SnapshotTable.upsert(Seq((3L, "UPD", 7L)).toDF("id", "tag", "v"), root)
    val ch = SnapshotTable.readChanges(spark, root, 2L, 3L)
      .select("id", "tag", "v", SnapshotTable.ChangeTypeCol)
      .as[(Long, String, Long, String)].collect().toSet
    // the migration rewrote whole old dirs but CONTENT-changed only one
    // key: the feed must not report the migrated survivors
    assert(ch === Set((3L, "a", 30L, "delete"), (3L, "UPD", 7L, "insert")))
  }

  test("restore to a pre-rescale version takes the bucket layout back " +
      "with it; the cross-layout diff falls back to a whole-table " +
      "compare and stays exact") {
    val root = freshRoot("rst")
    SnapshotTable.create(rows(0L until 32L, "a"), root, Seq("id"), 4)
    SnapshotTable.rescaleBuckets(spark, root, 8)        // v2
    SnapshotTable.upsert(Seq((3L, "UPD", 7L)).toDF("id", "tag", "v"), root) // v3
    SnapshotTable.restore(spark, root, version = Some(1L)) // v4
    val head = SnapshotTable.versions(spark, root).last
    assert(head.buckets === 4 && !head.mixedLayout)
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 32L, "a")))
    // the restore step diff (8-bucket v3 vs 4-bucket v4): exactly the
    // upsert coming back out
    val ch = SnapshotTable.readChanges(spark, root, 3L, 4L)
      .select("id", "tag", "v", SnapshotTable.ChangeTypeCol)
      .as[(Long, String, Long, String)].collect().toSet
    assert(ch === Set((3L, "UPD", 7L, "delete"), (3L, "a", 30L, "insert")))
    // writes keep working under the restored layout
    SnapshotTable.append(rows(Seq(100L), "post"), root)
    assert(SnapshotTable.versions(spark, root).last.buckets === 4)
  }

  test("a concurrent rescale fails racing bucket-id-dependent commits " +
      "loudly (hit sets live in the old space); the rescale itself wins") {
    val root = freshRoot("race")
    SnapshotTable.create(rows(0L until 32L, "a"), root, Seq("id"), 4)
    val tap = Materialize.Tap(() => {
      SnapshotTable.rescaleBuckets(spark, root, 16); ()
    })
    val e = intercept[ConcurrentCommitException](
      SnapshotTable.upsert(rows(Seq(3L), "B"), root, mat = tap,
        retries = 3))
    assert(e.getMessage.contains("16 buckets"))
    val head = SnapshotTable.versions(spark, root).last
    assert(head.op === "rescale" && head.buckets === 16)
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 32L, "a")))
  }

  test("metadata surfaces: files table reports per-dir layout; SQL CALL " +
      "rescale works through the catalog") {
    val root = freshRoot("meta2")
    SnapshotTable.create(rows(0L until 16L, "a"), root, Seq("id"), 2)
    SnapshotTable.rescaleBuckets(spark, root, 8)
    SnapshotTable.append(rows(Seq(50L), "n"), root)
    val files = SnapshotMeta.files(spark, root)
      .select("layout").as[Int].collect().toSeq
    assert(files.count(_ == 2) === 2 && files.count(_ == 8) >= 1)
    assert(SnapshotMeta.files(spark, root).where(col("layout") === 2)
      .count() === 2L)
    // the SQL surface: CALL <cat>.system.rescale grows a catalog table
    val wh = java.nio.file.Files.createTempDirectory("graft_rescale_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.rescat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.rescat.warehouse", wh.toString)
    spark.sql("CREATE TABLE rescat.rt (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO rescat.rt VALUES (1, 'a', 10), (2, 'b', 20)")
    val v = spark.sql("CALL rescat.system.rescale('rt', 16)")
      .as[Long].head()
    val snap = SnapshotTable.versions(spark, s"$wh/rt").last
    assert(v === snap.version && snap.op === "rescale" &&
      snap.buckets === 16)
    assert(spark.sql("SELECT count(*) FROM rescat.rt").as[Long].head() === 2L)
  }

  test("the streaming source treats rescale as content-neutral: a " +
      "checkpointed resume across a rescale commit serves only the " +
      "fresh appends, no failure, no re-emit") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot("stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rs_ckpt")
      .toString
    val outBase = java.nio.file.Files.createTempDirectory("graft_rs_out")
      .toString
    SnapshotTable.create(rows(0L until 8L, "a"), root, Seq("id"), 2)
    def runOnce(name: String): DataFrame = {
      val out = s"$outBase/$name"
      val q = spark.readStream.format("graft-snapshot").load(root)
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
        rows(Seq(0L), "x").schema)
    }
    assert(asSet(runOnce("s1")) === asSet(rows(0L until 8L, "a")))
    SnapshotTable.rescaleBuckets(spark, root, 8)
    SnapshotTable.append(rows(8L until 12L, "b"), root)
    assert(asSet(runOnce("s2")) === asSet(rows(8L until 12L, "b")))
  }
}
