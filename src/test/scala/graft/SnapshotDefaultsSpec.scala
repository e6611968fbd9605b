package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** Write-side column DEFAULTs (the Delta `DEFAULT` surface):
  * CREATE-time defaults and `ALTER COLUMN … SET/DROP DEFAULT`, filled
  * into SQL INSERTs by Spark's analyzer from the catalog schema's
  * CURRENT_DEFAULT metadata. Pins: the fill itself, explicit values
  * winning, the `DEFAULT` keyword, existing rows staying untouched
  * after SET DEFAULT, the add-column-then-default flow keeping the
  * null contract for OLD files (the EXISTS_DEFAULT read-fill hazard),
  * lifecycle carry (append/upsert/compact/clone/rename/drop), and
  * declaration-time validation. */
class SnapshotDefaultsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_defaults_wh")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.dcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.dcat.warehouse", d.toString)
    d.toString
  }

  /** Forces the catalog registration before any dcat.… reference. */
  private def sql(q: String): DataFrame = { wh; spark.sql(q) }

  private def rows(t: String) = {
    sql(s"SELECT * FROM dcat.$t").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
  }

  test("CREATE-time defaults fill SQL INSERTs that omit columns; " +
      "explicit values and the DEFAULT keyword both resolve; " +
      "SET/DROP DEFAULT change only FUTURE inserts") {
    sql("CREATE TABLE dcat.t1 (id BIGINT, tag STRING DEFAULT 'x', " +
      "v BIGINT DEFAULT 42) PARTITIONED BY (bucket(4, id))")
    assert(SnapshotTable.versions(spark, s"$wh/t1").head.colDefaults ===
      Map("tag" -> "'x'", "v" -> "42"))
    sql("INSERT INTO dcat.t1 (id) VALUES (1)")
    sql("INSERT INTO dcat.t1 VALUES (2, 'b', 20)")
    sql("INSERT INTO dcat.t1 (id, tag) VALUES (3, 'c')")
    sql("INSERT INTO dcat.t1 VALUES (4, DEFAULT, DEFAULT)")
    assert(rows("t1") === Set(
      (1L, Some("x"), Some(42L)), (2L, Some("b"), Some(20L)),
      (3L, Some("c"), Some(42L)), (4L, Some("x"), Some(42L))))
    // SET DEFAULT: existing rows untouched, new inserts get the new one
    sql("ALTER TABLE dcat.t1 ALTER COLUMN v SET DEFAULT 7")
    sql("INSERT INTO dcat.t1 (id) VALUES (5)")
    assert(rows("t1").contains((5L, Some("x"), Some(7L))))
    assert(rows("t1").contains((1L, Some("x"), Some(42L))))
    // DROP DEFAULT: a missing column falls back to null fill
    sql("ALTER TABLE dcat.t1 ALTER COLUMN v DROP DEFAULT")
    sql("INSERT INTO dcat.t1 (id) VALUES (6)")
    assert(rows("t1").contains((6L, Some("x"), None)))
    // time travel serves each version's own defaults in its schema
    val vNow = SnapshotTable.versions(spark, s"$wh/t1").last.version
    assert(SnapshotTable.versions(spark, s"$wh/t1")
      .find(_.version == 1L).get.colDefaults("v") === "42")
    assert(SnapshotTable.versions(spark, s"$wh/t1")
      .find(_.version == vNow).get.colDefaults.get("v").isEmpty)
    // the defaults metadata table reflects the head's map
    assert(sql("SELECT * FROM dcat.t1.defaults").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ===
      Set("tag" -> "'x'"))
  }

  test("ADD COLUMN with DEFAULT refuses; ADD then SET DEFAULT keeps the " +
      "NULL contract for files written before the column existed (no " +
      "read-path back-fill)") {
    sql("CREATE TABLE dcat.t2 (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    sql("INSERT INTO dcat.t2 VALUES (1, 10)")
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE dcat.t2 ADD COLUMN w BIGINT DEFAULT 3"))
    assert(e.getMessage.contains("DEFAULT") ||
      Option(e.getCause).exists(_.getMessage.contains("DEFAULT")))
    sql("ALTER TABLE dcat.t2 ADD COLUMN w BIGINT")
    sql("ALTER TABLE dcat.t2 ALTER COLUMN w SET DEFAULT 3")
    sql("INSERT INTO dcat.t2 (id, v) VALUES (2, 20)")
    // the OLD row (file physically lacks w) reads null, never 3; the
    // new row got the write-side fill
    assert(rows("t2") === Set(
      (1L, Some(10L), None), (2L, Some(20L), Some(3L))))
    // pushdown on the defaulted column stays sound
    assert(spark.sql("SELECT id FROM dcat.t2 WHERE w = 3")
      .as[Long].collect().toSeq === Seq(2L))
    assert(spark.sql("SELECT id FROM dcat.t2 WHERE w IS NULL")
      .as[Long].collect().toSeq === Seq(1L))
  }

  test("defaults travel the commit lifecycle (append/upsert/compact/" +
      "clone/restore), follow renames, and die with their column") {
    val root = s"$wh/obj"
    SnapshotTable.create(
      Seq((1L, "a", 10L)).toDF("id", "tag", "v"), root, Seq("id"), 2,
      colDefaults = Map("v" -> "42"))
    def defs = SnapshotTable.versions(spark, root).last.colDefaults
    SnapshotTable.append(Seq((2L, "b", 20L)).toDF("id", "tag", "v"), root)
    assert(defs === Map("v" -> "42"))
    SnapshotTable.upsert(Seq((2L, "B", 21L)).toDF("id", "tag", "v"), root)
    assert(defs === Map("v" -> "42"))
    SnapshotTable.compact(spark, root)
    assert(defs === Map("v" -> "42"))
    SnapshotTable.restore(spark, root, version = Some(2L))
    assert(defs === Map("v" -> "42"))
    val fork = s"$wh/obj_fork"
    SnapshotTable.cloneTable(spark, root, fork)
    assert(SnapshotTable.versions(spark, fork).last.colDefaults ===
      Map("v" -> "42"))
    SnapshotTable.renameColumn(spark, root, "v", "val")
    assert(defs === Map("val" -> "42"))
    SnapshotTable.dropColumn(spark, root, "val")
    assert(defs === Map.empty)
  }

  test("declaration-time validation: unknown columns, non-constant " +
      "expressions, and values that fail to evaluate all refuse") {
    val root = s"$wh/val"
    val df = Seq((1L, "a")).toDF("id", "tag")
    intercept[Exception](SnapshotTable.create(df, root, Seq("id"), 2,
      colDefaults = Map("nope" -> "1")))
    intercept[Exception](SnapshotTable.create(df, root, Seq("id"), 2,
      colDefaults = Map("tag" -> "rand()")))
    intercept[Exception](SnapshotTable.create(df, root, Seq("id"), 2,
      colDefaults = Map("tag" -> "some_col + 1")))
    // a parseable constant is fine; the same constraint applies to
    // setColumnDefault after create
    SnapshotTable.create(df, root, Seq("id"), 2,
      colDefaults = Map("tag" -> "upper('ok')"))
    intercept[Exception](
      SnapshotTable.setColumnDefault(spark, root, "id", Some("rand()")))
    SnapshotTable.setColumnDefault(spark, root, "tag", None) // drop: fine
    intercept[Exception]( // a second drop has nothing to remove
      SnapshotTable.setColumnDefault(spark, root, "tag", None))
    assert(SnapshotTable.versions(spark, root).last.colDefaults ===
      Map.empty)
  }

  test("line-safety: a DEFAULT whose SQL text carries a raw newline or " +
      "tab (legal inside a string literal) refuses instead of silently " +
      "truncating in the line-oriented manifest") {
    val root = s"$wh/linesafe"
    val df = Seq((1L, "a")).toDF("id", "tag")
    // raw newline inside a multi-line string literal: parses fine as
    // SQL, but would truncate at manifest serialization — refused
    val nl = intercept[Exception](SnapshotTable.create(df, root,
      Seq("id"), 2, colDefaults = Map("tag" -> "'a\nb'")))
    assert(nl.getMessage.contains("line-safe"))
    val tab = intercept[Exception](SnapshotTable.create(df, root,
      Seq("id"), 2, colDefaults = Map("tag" -> "'a\tb'")))
    assert(tab.getMessage.contains("line-safe"))
    // same guard on the post-create path
    SnapshotTable.create(df, root, Seq("id"), 2)
    val post = intercept[Exception](SnapshotTable.setColumnDefault(
      spark, root, "tag", Some("'x\ny'")))
    assert(post.getMessage.contains("line-safe"))
    // the ESCAPED spelling stays legal: '\n' as two characters is
    // line-safe text that evaluates to a newline at fill time
    SnapshotTable.setColumnDefault(spark, root, "tag", Some("'a\\nb'"))
  }
}
