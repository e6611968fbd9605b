package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** Named refs (tags) + RESTORE on the snapshot table: tag resolution on
  * every read surface, vacuum pinning (a tagged version survives history
  * expiry until the tag drops), restore-as-forward-commit semantics, and
  * the SQL/procedure spellings through the catalog. */
class SnapshotRefsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_refs_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(n: Range, tag: String) =
    n.map(i => (i.toLong, tag, i * 10L)).toDF("id", "tag", "v")

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  test("createTag/tags/dropTag lifecycle; duplicate and malformed names " +
      "refused; unknown version refused") {
    val root = freshRoot("life")
    SnapshotTable.create(rows(0 until 8, "a"), root, Seq("id"), 4)
    SnapshotTable.append(rows(8 until 12, "b"), root)
    assert(SnapshotTable.createTag(spark, root, "v1-release",
      Some(1L)) === 1L)
    // default target = current head
    assert(SnapshotTable.createTag(spark, root, "head.now") === 2L)
    assert(SnapshotTable.tags(spark, root) ===
      Seq("head.now" -> 2L, "v1-release" -> 1L))
    val dup = intercept[RuntimeException](
      SnapshotTable.createTag(spark, root, "v1-release", Some(2L)))
    assert(dup.getMessage.contains("already exists"))
    val bad = intercept[IllegalArgumentException](
      SnapshotTable.createTag(spark, root, ".hidden"))
    assert(bad.getMessage.contains("must match"))
    val gone = intercept[RuntimeException](
      SnapshotTable.createTag(spark, root, "nope", Some(99L)))
    assert(gone.getMessage.contains("not in the catalog"))
    assert(SnapshotTable.dropTag(spark, root, "head.now") === 2L)
    assert(SnapshotTable.tags(spark, root) === Seq("v1-release" -> 1L))
    val missing = intercept[RuntimeException](
      SnapshotTable.dropTag(spark, root, "head.now"))
    assert(missing.getMessage.contains("no tag"))
  }

  test("tag resolution on every read surface: object read/readForKeys, " +
      "connector tagAsOf, and versionAsOf falling through to a tag name") {
    val root = freshRoot("read")
    SnapshotTable.create(rows(0 until 10, "a"), root, Seq("id"), 4)
    SnapshotTable.createTag(spark, root, "first")
    SnapshotTable.overwrite(rows(0 until 3, "z"), root)
    assert(asSet(SnapshotTable.read(spark, root, tag = Some("first"))) ===
      asSet(rows(0 until 10, "a")))
    assert(asSet(SnapshotTable.readForKeys(Seq(7L).toDF("id"), root,
      tag = Some("first"))) === Set((7L, "a", 70L)))
    assert(asSet(spark.read.format("graft-snapshot")
      .option("tagAsOf", "first").load(root)) === asSet(rows(0 until 10, "a")))
    assert(asSet(spark.read.format("graft-snapshot")
      .option("versionAsOf", "first").load(root)) ===
      asSet(rows(0 until 10, "a")))
    // selectors are exclusive; unknown tags fail loudly
    intercept[IllegalArgumentException](
      SnapshotTable.read(spark, root, version = Some(1L), tag = Some("first")))
    val unknown = intercept[RuntimeException](
      spark.read.format("graft-snapshot").option("tagAsOf", "nope")
        .load(root).collect())
    assert(unknown.getMessage.contains("no tag"))
  }

  test("vacuum keeps tagged versions: manifest + data dirs survive " +
      "expiry, reads by tag still serve them, and dropping the tag " +
      "makes the next vacuum reclaim them") {
    val root = freshRoot("vac")
    SnapshotTable.create(rows(0 until 6, "a"), root, Seq("id"), 2)
    SnapshotTable.overwrite(rows(0 until 6, "b"), root) // v2
    SnapshotTable.overwrite(rows(0 until 6, "c"), root) // v3
    SnapshotTable.createTag(spark, root, "pin", Some(2L))
    val (m1, d1) = SnapshotTable.vacuum(spark, root, keepVersions = 1)
    // v1 expires; v2 is tag-pinned, v3 is the kept head
    assert(m1 === 1)
    assert(d1 > 0) // v1's dirs are unreferenced once its manifest is gone
    assert(SnapshotTable.versions(spark, root).map(_.version) ===
      Seq(2L, 3L))
    assert(asSet(SnapshotTable.read(spark, root, tag = Some("pin"))) ===
      asSet(rows(0 until 6, "b")))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0 until 6, "c")))
    SnapshotTable.dropTag(spark, root, "pin")
    val (m2, d2) = SnapshotTable.vacuum(spark, root, keepVersions = 1)
    assert(m2 === 1 && d2 > 0) // v2's manifest and dirs reclaimed
    assert(SnapshotTable.versions(spark, root).map(_.version) === Seq(3L))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0 until 6, "c")))
  }

  test("restore rolls data+schema back as a forward commit: content " +
      "equals the target, bad history stays time-travel-readable, and " +
      "writes continue on top") {
    val root = freshRoot("rest")
    SnapshotTable.create(rows(0 until 8, "good"), root, Seq("id"), 4)
    // bad commits: an upsert and an add-column evolution
    SnapshotTable.upsert(Seq((1L, "BAD", 0L), (99L, "BAD", 0L))
      .toDF("id", "tag", "v"), root)
    SnapshotTable.append(
      Seq((500L, "BAD", 0L, "x")).toDF("id", "tag", "v", "extra"), root,
      mergeSchema = true)
    val v = SnapshotTable.restore(spark, root, version = Some(1L))
    assert(v === 4L)
    val head = SnapshotTable.versions(spark, root).last
    assert(head.op === "restore")
    // schema restored too: the evolved 'extra' column is gone
    assert(!SnapshotTable.read(spark, root).columns.contains("extra"))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0 until 8, "good")))
    // the bad version is still one time-travel hop away
    assert(SnapshotTable.read(spark, root, Some(3L))
      .columns.contains("extra"))
    // history continues forward
    SnapshotTable.append(rows(100 until 102, "new"), root)
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(rows(0 until 8, "good")) ++ asSet(rows(100 until 102, "new")))
  }

  test("restore by tag; restore of merge-on-read state reinstates the " +
      "pending delta layers") {
    val root = freshRoot("mor")
    SnapshotTable.create(rows(0 until 6, "a"), root, Seq("id"), 2)
    SnapshotTable.upsert(Seq((2L, "M", 1L)).toDF("id", "tag", "v"), root,
      mergeOnRead = true)
    SnapshotTable.createTag(spark, root, "layered") // v2: 1 pending delta
    SnapshotTable.compact(spark, root) // v3: deltas folded
    assert(SnapshotTable.versions(spark, root).last.deltas.isEmpty)
    SnapshotTable.restore(spark, root, tag = Some("layered"))
    val head = SnapshotTable.versions(spark, root).last
    assert(head.deltas.nonEmpty) // the layer is back, still unresolved
    assert(asSet(SnapshotTable.read(spark, root)) ===
      (asSet(rows(0 until 6, "a")) - ((2L, "a", 20L)) + ((2L, "M", 1L))))
  }

  test("restore refuses a vacuumed target instead of publishing a " +
      "half-restored table") {
    val root = freshRoot("gone")
    SnapshotTable.create(rows(0 until 6, "a"), root, Seq("id"), 2)
    SnapshotTable.overwrite(rows(0 until 6, "b"), root)
    SnapshotTable.vacuum(spark, root, keepVersions = 1)
    // v1's manifest is gone entirely -> unknown version
    intercept[RuntimeException](
      SnapshotTable.restore(spark, root, version = Some(1L)))
    // now fake the nastier case: manifest kept but a dir swept
    SnapshotTable.overwrite(rows(0 until 6, "c"), root) // v3
    val v2dir = SnapshotTable.versions(spark, root).head.entries.head._2
    val (fsys, _) = {
      val p = new org.apache.hadoop.fs.Path(root)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    fsys.delete(new org.apache.hadoop.fs.Path(v2dir), true)
    val e = intercept[IllegalArgumentException](
      SnapshotTable.restore(spark, root, version = Some(2L)))
    assert(e.getMessage.contains("no longer exist"))
  }

  test("SQL surface: VERSION AS OF '<tag>' and the restore/create_tag/" +
      "drop_tag/tags procedures") {
    val d = java.nio.file.Files.createTempDirectory("graft_refs_cat")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.refscat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.refscat.warehouse", d.toString)
    spark.sql("CREATE TABLE refscat.t (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO refscat.t VALUES (1, 'a', 10), (2, 'a', 20)")
    // tag the 2-row state (version <= 0 = current head)
    val tagged = spark.sql(
      "CALL refscat.system.create_tag('t', 'rel', 0)").collect()
    assert(tagged.map(_.getLong(0)).toSeq === Seq(2L))
    spark.sql("INSERT OVERWRITE refscat.t VALUES (9, 'z', 90)")
    assert(asSet(spark.sql("SELECT * FROM refscat.t VERSION AS OF 'rel'"))
      === Set((1L, "a", 10L), (2L, "a", 20L)))
    assert(asSet(spark.sql("SELECT * FROM refscat.t")) ===
      Set((9L, "z", 90L)))
    val listed = spark.sql("CALL refscat.system.tags('t')").collect()
    assert(listed.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("rel", 2L)))
    val restored = spark.sql(
      "CALL refscat.system.restore('t', 2)").collect()
    assert(restored.map(_.getLong(0)).toSeq === Seq(4L))
    assert(asSet(spark.sql("SELECT * FROM refscat.t")) ===
      Set((1L, "a", 10L), (2L, "a", 20L)))
    val dropped = spark.sql(
      "CALL refscat.system.drop_tag('t', 'rel')").collect()
    assert(dropped.map(_.getLong(0)).toSeq === Seq(2L))
    assert(spark.sql("CALL refscat.system.tags('t')").collect().isEmpty)
  }
}
