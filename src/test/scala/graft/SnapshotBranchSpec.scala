package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.ConcurrentCommitException

/** Branch refs + write-audit-publish ([[SnapshotTable.createBranch]] /
  * [[SnapshotTable.fastForward]]): branch commits are invisible to main
  * until the fast-forward, the fast-forward is metadata-only and
  * strict, dropped branches reclaim through vacuum, and the SQL/
  * connector surfaces reach all of it. */
class SnapshotBranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_branch_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(ids: Seq[Long], tag: String) =
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  test("branch commits are INVISIBLE to main readers; branch reads see " +
      "base + staged; a fresh branch reads its base") {
    val root = freshRoot("iso")
    SnapshotTable.create(rows(0L until 16L, "base"), root, Seq("id"), 4)
    assert(SnapshotTable.createBranch(spark, root, "audit") === 1L)
    // fresh branch = base content
    assert(asSet(SnapshotTable.read(spark, root, branch = Some("audit"))) ===
      asSet(rows(0L until 16L, "base")))
    SnapshotTable.append(rows(16L until 20L, "staged"), root,
      branch = Some("audit"))
    SnapshotTable.upsert(Seq((3L, "UPD", 1L)).toDF("id", "tag", "v"), root,
      branch = Some("audit"))
    // main: untouched — catalog AND content
    assert(SnapshotTable.versions(spark, root).map(_.version) === Seq(1L))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 16L, "base")))
    // branch: both staged commits, merged against the BRANCH head
    val expect = asSet(rows(0L until 16L, "base")) ++
      asSet(rows(16L until 20L, "staged")) -
      ((3L, "base", 30L)) + ((3L, "UPD", 1L))
    assert(asSet(SnapshotTable.read(spark, root, branch = Some("audit"))) ===
      expect)
    assert(SnapshotTable.branchList(spark, root) ===
      Seq(("audit", 1L, 3L)))
  }

  test("fastForward publishes the branch verbatim as the next main " +
      "versions (metadata-only), drops the branch, and keeps time " +
      "travel into the published commits") {
    val root = freshRoot("ff")
    SnapshotTable.create(rows(0L until 16L, "base"), root, Seq("id"), 4)
    SnapshotTable.createBranch(spark, root, "wap")
    SnapshotTable.append(rows(16L until 20L, "s1"), root,
      branch = Some("wap"))
    SnapshotTable.delete(Seq(0L).toDF("id"), root, branch = Some("wap"))
    val branchHeadEntries = SnapshotTable
      .versionsOnForTest(spark, root, "wap").last.entries
    assert(SnapshotTable.fastForward(spark, root, "wap") === 3L)
    val vs = SnapshotTable.versions(spark, root)
    assert(vs.map(s => (s.version, s.op)) ===
      Seq((1L, "create"), (2L, "append"), (3L, "delete")))
    // verbatim: the main head lists the branch's exact dirs — the
    // fast-forward moved zero data bytes
    assert(vs.last.entries === branchHeadEntries)
    val expect = asSet(rows(1L until 16L, "base")) ++
      asSet(rows(16L until 20L, "s1"))
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    assert(asSet(SnapshotTable.read(spark, root, Some(2L))) ===
      asSet(rows(0L until 16L, "base")) ++ asSet(rows(16L until 20L, "s1")))
    // the branch is gone
    assert(SnapshotTable.branchList(spark, root) === Seq.empty)
    intercept[RuntimeException](
      SnapshotTable.read(spark, root, branch = Some("wap")))
  }

  test("fastForward is STRICT: a main line that advanced during the " +
      "audit conflicts before anything is copied; the branch survives " +
      "for inspection") {
    val root = freshRoot("conflict")
    SnapshotTable.create(rows(0L until 8L, "base"), root, Seq("id"), 4)
    SnapshotTable.createBranch(spark, root, "wap")
    SnapshotTable.append(rows(Seq(100L), "staged"), root,
      branch = Some("wap"))
    SnapshotTable.append(rows(Seq(200L), "main-won"), root) // main moves
    val e = intercept[ConcurrentCommitException](
      SnapshotTable.fastForward(spark, root, "wap"))
    assert(e.getMessage.contains("main advanced"))
    // nothing copied: main is exactly its own two commits
    assert(SnapshotTable.versions(spark, root).map(_.op) ===
      Seq("create", "append"))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 8L, "base")) + ((200L, "main-won", 2000L)))
    // branch still auditable, then dropped
    assert(asSet(SnapshotTable.read(spark, root, branch = Some("wap"))) ===
      asSet(rows(0L until 8L, "base")) + ((100L, "staged", 1000L)))
    assert(SnapshotTable.dropBranch(spark, root, "wap") === 1)
  }

  test("fastForward RE-RUN after a mid-publish crash: the published " +
      "prefix is recognized by uuid and skipped, the remainder " +
      "publishes, no rows duplicate") {
    val root = freshRoot("rerun")
    SnapshotTable.create(rows(0L until 8L, "base"), root, Seq("id"), 4)
    SnapshotTable.createBranch(spark, root, "wap")
    SnapshotTable.append(rows(Seq(100L), "s1"), root, branch = Some("wap"))
    SnapshotTable.append(rows(Seq(101L), "s2"), root, branch = Some("wap"))
    val staged = SnapshotTable.versionsOnForTest(spark, root, "wap")
    // simulate a crash after the first copy: publish ONLY the prefix
    // verbatim on main, leaving the branch ref + manifests in place
    SnapshotTable.publishManifest(spark, root, staged.head)
    assert(SnapshotTable.versions(spark, root).map(_.version) ===
      Seq(1L, 2L))
    // the SAME call re-runs: prefix skipped, remainder published
    assert(SnapshotTable.fastForward(spark, root, "wap") === 3L)
    val vs = SnapshotTable.versions(spark, root)
    assert(vs.map(_.version) === Seq(1L, 2L, 3L))
    assert(vs.drop(1).map(_.uuid) === staged.map(_.uuid)) // verbatim
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 8L, "base")) +
        ((100L, "s1", 1000L)) + ((101L, "s2", 1010L)))
    assert(SnapshotTable.branchList(spark, root) === Seq.empty)
    // but a FOREIGN main commit beyond the base still conflicts
    val root2 = freshRoot("rerun2")
    SnapshotTable.create(rows(0L until 8L, "base"), root2, Seq("id"), 4)
    SnapshotTable.createBranch(spark, root2, "wap")
    SnapshotTable.append(rows(Seq(100L), "s1"), root2, branch = Some("wap"))
    SnapshotTable.append(rows(Seq(200L), "foreign"), root2)
    val e = intercept[ConcurrentCommitException](
      SnapshotTable.fastForward(spark, root2, "wap"))
    assert(e.getMessage.contains("not from this branch"))
  }

  test("vacuum keeps a live branch's dirs and pins its base; after " +
      "dropBranch the staged dirs are reclaimed") {
    val root = freshRoot("vac")
    SnapshotTable.create(rows(0L until 8L, "base"), root, Seq("id"), 2)
    SnapshotTable.createBranch(spark, root, "wap") // base = v1
    SnapshotTable.append(rows(Seq(50L), "staged"), root,
      branch = Some("wap"))
    // main advances twice so v1 would normally expire
    SnapshotTable.append(rows(Seq(60L), "m1"), root)
    SnapshotTable.append(rows(Seq(61L), "m2"), root)
    val (expired1, removed1) = SnapshotTable.vacuum(spark, root, 1)
    // v2 expired; v1 pinned as the branch base; the staged branch dir
    // survives (still referenced by the branch manifest)
    assert(expired1 === 1 && removed1 === 0)
    assert(SnapshotTable.versions(spark, root).map(_.version) ===
      Seq(1L, 3L))
    assert(asSet(SnapshotTable.read(spark, root, branch = Some("wap"))) ===
      asSet(rows(0L until 8L, "base")) + ((50L, "staged", 500L)))
    SnapshotTable.dropBranch(spark, root, "wap")
    val (_, removed2) = SnapshotTable.vacuum(spark, root, 1)
    assert(removed2 >= 1) // the abandoned staged dir(s) reclaimed
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0L until 8L, "base")) +
        ((60L, "m1", 600L)) + ((61L, "m2", 610L)))
  }

  test("ref hygiene: duplicate branch refused, unknown branch fails " +
      "loudly, tags and branches don't collide in the listing") {
    val root = freshRoot("refs")
    SnapshotTable.create(rows(0L until 4L, "a"), root, Seq("id"), 2)
    SnapshotTable.createBranch(spark, root, "b1")
    intercept[RuntimeException](
      SnapshotTable.createBranch(spark, root, "b1"))
    intercept[RuntimeException](
      SnapshotTable.read(spark, root, branch = Some("nope")))
    SnapshotTable.createTag(spark, root, "rel1")
    assert(SnapshotTable.tags(spark, root).map(_._1) === Seq("rel1"))
    assert(SnapshotTable.branchList(spark, root).map(_._1) === Seq("b1"))
  }

  test("the connector's branch option serves the branch head with the " +
      "full scan surface; SQL CALLs drive the whole WAP cycle") {
    val root = freshRoot("sql")
    SnapshotTable.create(rows(0L until 16L, "base"), root, Seq("id"), 4)
    SnapshotTable.createBranch(spark, root, "audit")
    SnapshotTable.upsert(Seq((5L, "UPD", 9L)).toDF("id", "tag", "v"), root,
      branch = Some("audit"))
    val viaConnector = spark.read.format("graft-snapshot")
      .option("branch", "audit").load(root)
    assert(asSet(viaConnector) ===
      asSet(SnapshotTable.read(spark, root, branch = Some("audit"))))
    // pushed point lookup against the branch head still prunes + answers
    assert(viaConnector.where(col("id") === 5L)
      .select("tag").as[String].collect().toSeq === Seq("UPD"))
    // keyed lookups resolve the branch head too (bloom-pruned like main)
    assert(SnapshotTable.readForKeys(Seq(5L).toDF("id"), root,
      branch = Some("audit")).select("tag").as[String]
      .collect().toSeq === Seq("UPD"))
    assert(SnapshotTable.readForKeys(Seq(12345L).toDF("id"), root,
      branch = Some("audit")).count() === 0L)
    // catalog procedures: a full create→stage→inspect→publish cycle
    val wh = java.nio.file.Files.createTempDirectory("graft_branch_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.brcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.brcat.warehouse", wh.toString)
    spark.sql("CREATE TABLE brcat.wt (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO brcat.wt VALUES (1, 'a', 10)")
    assert(spark.sql("CALL brcat.system.create_branch('wt', 'audit', 0)")
      .as[Long].head() === 2L)
    SnapshotTable.append(Seq((2L, "staged", 20L)).toDF("id", "tag", "v"),
      s"$wh/wt", branch = Some("audit"))
    assert(spark.sql("CALL brcat.system.branches('wt')")
      .as[(String, Long, Long)].collect().toSeq === Seq(("audit", 2L, 3L)))
    // the `branches` METADATA TABLE reads the same refs
    assert(spark.sql("SELECT name, base, head FROM brcat.wt.branches")
      .as[(String, Long, Long)].collect().toSeq === Seq(("audit", 2L, 3L)))
    assert(spark.sql("SELECT count(*) FROM brcat.wt").as[Long].head() === 1L)
    assert(spark.sql("CALL brcat.system.fast_forward('wt', 'audit')")
      .as[Long].head() === 3L)
    assert(spark.sql("SELECT count(*) FROM brcat.wt").as[Long].head() === 2L)
  }
}
