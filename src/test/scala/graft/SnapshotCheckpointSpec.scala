package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** O(1) snapshot resolution ([[SnapshotTable]] consolidated
  * checkpoints): head/version/tag reads parse ONE manifest regardless
  * of history length; `asOfTimestamp` and `lastTxn` answer from the
  * newest `ckpt.v*.txt` plus the ≤ interval gap manifests; a corrupt
  * or missing checkpoint degrades to per-manifest parses, never to a
  * wrong answer; checkpointed txn watermarks survive history expiry.
  *
  * Parse counts are asserted through the [[SnapshotTable
  * .manifestParses]] / [[SnapshotTable.checkpointParses]] seams — the
  * structural claim ("a 1-commit/10 s streaming table must not pay
  * 8,640 manifest opens per day per read") rather than wall-clock. */
class SnapshotCheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def batch(i: Int): DataFrame =
    Seq((i.toLong, s"row$i")).toDF("id", "s")

  /** Build a 25-version table: create + 24 txn-stamped appends. */
  private def build25(root: String): Unit = {
    SnapshotTable.create(batch(0), root, Seq("id"), 1,
      statsCols = Some(Seq.empty))
    (1 until 25).foreach(i =>
      SnapshotTable.append(batch(i), root, txn = Some("app" -> i.toLong)))
  }

  private def parses[T](body: => T): (T, Long, Long) = {
    val m0 = SnapshotTable.manifestParses.get()
    val c0 = SnapshotTable.checkpointParses.get()
    val r = body
    (r, SnapshotTable.manifestParses.get() - m0,
      SnapshotTable.checkpointParses.get() - c0)
  }

  private def ckptFiles(root: String): Seq[String] = {
    val dir = new java.io.File(root, "_manifests")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("ckpt.")).sorted.toSeq
  }

  test("interval commits publish consolidated checkpoints; head and " +
      "version reads parse exactly ONE manifest on a 25-commit table") {
    val root = freshRoot("o1")
    build25(root)
    assert(ckptFiles(root) ===
      Seq("ckpt.v00000010.txt", "ckpt.v00000020.txt"))
    // head read (object API): one parse, zero checkpoint opens
    val (head, mHead, cHead) = parses(SnapshotTable.read(spark, root))
    assert(head.count() === 25L)
    assert(mHead === 1L, s"head read must parse 1 manifest, got $mHead")
    assert(cHead === 0L)
    // explicit-version read: one parse (existence adjudicated by name)
    val (v7, mV, _) = parses(SnapshotTable.read(spark, root, Some(7L)))
    assert(v7.count() === 7L)
    assert(mV === 1L, s"version read must parse 1 manifest, got $mV")
    // connector head read: resolution + scan build stay O(1) parses
    val (cnt, mConn, _) = parses(
      spark.read.format("graft-snapshot").load(root).count())
    assert(cnt === 25L)
    assert(mConn <= 2L, s"connector read must stay O(1) parses, got $mConn")
  }

  test("asOfTimestamp resolves through the checkpoint: only the gap " +
      "past it (and the chosen version) parse, and the answer matches " +
      "the version-pinned read exactly") {
    val root = freshRoot("asof")
    build25(root)
    val full = SnapshotTable.versions(spark, root)
    val ts7 = full.find(_.version == 7L).get.ts
    val (asOf, m, c) = parses(
      SnapshotTable.read(spark, root, asOfTimestamp = Some(ts7))
        .select("id").as[Long].collect().toSet)
    // ≤ interval gap manifests (21..25) + the chosen version 7
    assert(m <= 6L, s"asOf must parse only the checkpoint gap, got $m")
    assert(c === 1L, s"asOf must open the newest checkpoint once, got $c")
    assert(asOf ===
      SnapshotTable.read(spark, root, Some(7L))
        .select("id").as[Long].collect().toSet)
  }

  test("lastTxn answers from the checkpoint + tail, and the checkpointed " +
      "watermark SURVIVES vacuum below the replayable batch (the Delta " +
      "caveat now applies only to the uncheckpointed tail); vacuum also " +
      "drops all but the newest checkpoint") {
    val root = freshRoot("txn")
    build25(root)
    val (w, m, c) = parses(SnapshotTable.lastTxn(spark, root, "app"))
    assert(w === Some(24L))
    assert(m <= 5L, s"lastTxn must parse only versions past the " +
      s"checkpoint, got $m")
    assert(c === 1L)
    assert(SnapshotTable.lastTxn(spark, root, "other") === None)
    // expire everything but the head: watermark persists via checkpoint
    SnapshotTable.vacuum(spark, root, keepVersions = 1)
    assert(ckptFiles(root) === Seq("ckpt.v00000020.txt"))
    assert(SnapshotTable.lastTxn(spark, root, "app") === Some(24L),
      "checkpointed txn watermark must survive history expiry")
    // the NEXT checkpoint after the vacuum prunes expired ver entries
    // (the map stays O(retained history)) while the txn watermark stays
    // cumulative across expiry
    (25 until 31).foreach(i =>
      SnapshotTable.append(batch(i), root, txn = Some("app" -> i.toLong)))
    assert(ckptFiles(root).last === "ckpt.v00000030.txt")
    val ck = SnapshotTable.parseCheckpointForTest(spark, root)
    assert(ck.vers.keySet === (25L to 30L).toSet,
      s"expired versions must leave the ver map, got ${ck.vers.keySet}")
    assert(ck.txns === Map("app" -> 29L)) // v30's stamped txn
    assert(SnapshotTable.lastTxn(spark, root, "app") === Some(30L))
  }

  test("a corrupt checkpoint degrades to per-manifest parses with the " +
      "same answers (never a failure, never a lie)") {
    val root = freshRoot("corrupt")
    build25(root)
    val full = SnapshotTable.versions(spark, root)
    val ts12 = full.find(_.version == 12L).get.ts
    val good = SnapshotTable.read(spark, root,
      asOfTimestamp = Some(ts12)).select("id").as[Long].collect().toSet
    // clobber BOTH checkpoints with garbage
    ckptFiles(root).foreach { n =>
      val f = new java.io.File(new java.io.File(root, "_manifests"), n)
      java.nio.file.Files.write(f.toPath, "not a checkpoint".getBytes)
    }
    val (bad, m, _) = parses(
      SnapshotTable.read(spark, root, asOfTimestamp = Some(ts12))
        .select("id").as[Long].collect().toSet)
    assert(bad === good)
    assert(m >= 25L, "with no readable checkpoint every manifest parses")
    assert(SnapshotTable.lastTxn(spark, root, "app") === Some(24L))
    // head resolution never touched the checkpoint to begin with
    val (_, mh, _) = parses(SnapshotTable.read(spark, root).count())
    assert(mh === 1L)
  }

  test("checkpoint content is exact: version→ts/uuid covers every " +
      "version at or below coverage and txn watermarks fold max-wise " +
      "across the prior checkpoint and its gap") {
    val root = freshRoot("content")
    build25(root)
    val full = SnapshotTable.versions(spark, root)
    val ck = SnapshotTable.parseCheckpointForTest(spark, root)
    assert(ck.version === 20L)
    assert(ck.vers.keySet === (1L to 20L).toSet)
    full.filter(_.version <= 20L).foreach { s =>
      assert(ck.vers(s.version) === (s.ts, s.uuid),
        s"checkpoint ver entry for v${s.version}")
    }
    assert(ck.txns === Map("app" -> 19L)) // newest txn at coverage
  }
}
