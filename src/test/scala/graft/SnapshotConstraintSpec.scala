package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Materialize
import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.ConcurrentCommitException

/** CHECK constraints ([[SnapshotTable.addConstraint]]): validated
  * against live content at ADD, enforced as an O(batch) probe on every
  * write commit (append/upsert/overwrite, merge-on-read included, and
  * the executor-staged row-level SQL writes), SQL NULL semantics
  * (violate only on FALSE), rename/drop guards on referenced columns,
  * and a rebase that refuses to sneak an unprobed batch past a
  * concurrent constraint change. */
class SnapshotConstraintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_check_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(ids: Seq[Long], tag: String) =
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")

  test("add validates live content first; writes are probed per commit " +
      "on every path; drop stops enforcing") {
    val root = freshRoot("basic")
    SnapshotTable.create(rows(0L until 16L, "a"), root, Seq("id"), 4)
    // a constraint the data violates is refused, never recorded
    intercept[IllegalArgumentException](
      SnapshotTable.addConstraint(spark, root, "vbig", "v > 100"))
    assert(SnapshotTable.addConstraint(spark, root, "vpos", "v >= 0") === 2L)
    assert(SnapshotTable.versions(spark, root).last.constraints ===
      Map("vpos" -> "v >= 0")) // manifest round-trip
    // violating batches are refused on every write shape
    val bad = Seq((100L, "x", -5L)).toDF("id", "tag", "v")
    intercept[IllegalArgumentException](SnapshotTable.append(bad, root))
    intercept[IllegalArgumentException](SnapshotTable.upsert(bad, root))
    intercept[IllegalArgumentException](
      SnapshotTable.upsert(bad, root, mergeOnRead = true))
    intercept[IllegalArgumentException](SnapshotTable.overwrite(bad, root))
    // nothing leaked: the refusals happened before any publish
    assert(SnapshotTable.versions(spark, root).size === 2)
    assert(SnapshotTable.read(spark, root).count() === 16L)
    // valid batches pass
    SnapshotTable.upsert(Seq((3L, "UPD", 7L)).toDF("id", "tag", "v"), root)
    // drop stops enforcement
    SnapshotTable.dropConstraint(spark, root, "vpos")
    SnapshotTable.append(bad, root)
    assert(SnapshotTable.read(spark, root).where(col("v") < 0)
      .count() === 1L)
  }

  test("SQL NULL semantics: a check evaluating to NULL passes (violate " +
      "only on FALSE); NOT NULL spells as IS NOT NULL") {
    val root = freshRoot("nulls")
    val d = Seq((1L, Some("a"), 10L), (2L, None, 20L))
      .toDF("id", "tag", "v")
    SnapshotTable.create(d, root, Seq("id"), 2)
    // tag = 'a' is NULL for the null row: passes (standard CHECK)
    SnapshotTable.addConstraint(spark, root, "tlen", "length(tag) <= 8")
    SnapshotTable.append(Seq((3L, None: Option[String], 1L))
      .toDF("id", "tag", "v"), root) // NULL check → pass
    intercept[IllegalArgumentException](SnapshotTable.append(
      Seq((4L, Some("waytoolongvalue"), 1L)).toDF("id", "tag", "v"), root))
    // an IS NOT NULL constraint is refused on data that has nulls...
    intercept[IllegalArgumentException](
      SnapshotTable.addConstraint(spark, root, "nn", "tag IS NOT NULL"))
    // ...and enforced once the nulls are gone
    SnapshotTable.delete(Seq(2L, 3L).toDF("id"), root)
    SnapshotTable.addConstraint(spark, root, "nn", "tag IS NOT NULL")
    intercept[IllegalArgumentException](SnapshotTable.append(
      Seq((5L, None: Option[String], 1L)).toDF("id", "tag", "v"), root))
  }

  test("referenced columns are pinned: rename/drop refused until the " +
      "constraint goes; unknown columns and dup names fail loudly") {
    val root = freshRoot("pin")
    SnapshotTable.create(rows(0L until 8L, "a"), root, Seq("id"), 2)
    SnapshotTable.addConstraint(spark, root, "vpos", "v >= 0")
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(spark, root, "v", "score"))
    intercept[IllegalArgumentException](
      SnapshotTable.dropColumn(spark, root, "v"))
    intercept[IllegalArgumentException](
      SnapshotTable.addConstraint(spark, root, "vpos", "v >= 1"))
    intercept[IllegalArgumentException](
      SnapshotTable.addConstraint(spark, root, "ghost", "nope > 0"))
    SnapshotTable.dropConstraint(spark, root, "vpos")
    SnapshotTable.renameColumn(spark, root, "v", "score")
    // constraints speak the CURRENT logical names
    SnapshotTable.addConstraint(spark, root, "spos", "score >= 0")
    intercept[IllegalArgumentException](SnapshotTable.append(
      Seq((100L, "x", -1L)).toDF("id", "tag", "score"), root))
  }

  test("row-level SQL writes are validated too (executor-staged rows); " +
      "CALL procedures drive the lifecycle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_check_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ckcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.ckcat.warehouse", wh.toString)
    spark.sql("CREATE TABLE ckcat.ct (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO ckcat.ct VALUES (1, 'a', 10), (2, 'b', 20)")
    assert(spark.sql(
      "CALL ckcat.system.add_constraint('ct', 'vpos', 'v >= 0')")
      .as[Long].head() === 3L)
    assert(spark.sql("CALL ckcat.system.constraints('ct')")
      .as[(String, String)].collect().toSeq === Seq(("vpos", "v >= 0")))
    // the `constraints` METADATA TABLE reads the same rules
    assert(spark.sql(
      "SELECT name, expression FROM ckcat.ct.constraints")
      .as[(String, String)].collect().toSeq === Seq(("vpos", "v >= 0")))
    // UPDATE that would break the constraint is refused at commit; the
    // staged replacement never becomes visible
    val e = intercept[Exception](
      spark.sql("UPDATE ckcat.ct SET v = -5 WHERE id = 1"))
    assert(e.getMessage.contains("vpos") ||
      Option(e.getCause).exists(_.getMessage.contains("vpos")))
    assert(spark.sql("SELECT v FROM ckcat.ct WHERE id = 1")
      .as[Long].head() === 10L)
    spark.sql("UPDATE ckcat.ct SET v = 99 WHERE id = 1")
    assert(spark.sql("SELECT v FROM ckcat.ct WHERE id = 1")
      .as[Long].head() === 99L)
    spark.sql("CALL ckcat.system.drop_constraint('ct', 'vpos')")
    spark.sql("UPDATE ckcat.ct SET v = -5 WHERE id = 1")
    assert(spark.sql("SELECT v FROM ckcat.ct WHERE id = 1")
      .as[Long].head() === -5L)
  }

  test("a write racing a concurrent constraint change refuses to " +
      "rebase (its batch was never probed against the new rule)") {
    val root = freshRoot("race")
    SnapshotTable.create(rows(0L until 8L, "a"), root, Seq("id"), 4)
    val tap = Materialize.Tap(() => {
      SnapshotTable.addConstraint(spark, root, "vcap", "v < 1000000"); ()
    })
    val e = intercept[ConcurrentCommitException](
      SnapshotTable.upsert(rows(Seq(3L), "B"), root, mat = tap,
        retries = 3))
    assert(e.getMessage.contains("constraint"))
    // restore takes the constraint set back with the content
    SnapshotTable.restore(spark, root, version = Some(1L))
    assert(SnapshotTable.versions(spark, root).last.constraints === Map.empty)
    SnapshotTable.append(Seq((9L, "x", 99999999L)).toDF("id", "tag", "v"),
      root)
  }
}
