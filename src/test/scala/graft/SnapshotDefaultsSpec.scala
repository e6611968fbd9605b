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

  test("plain ADD COLUMN then SET DEFAULT keeps the NULL contract for " +
      "files written before the column existed (write-side only, no " +
      "read-path back-fill)") {
    sql("CREATE TABLE dcat.t2 (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    sql("INSERT INTO dcat.t2 VALUES (1, 10)")
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

  test("ADD COLUMN … DEFAULT fills files that predate the column with " +
      "the FROZEN value at scan (the Delta metadata-fill), while newer " +
      "files — explicit nulls included — read verbatim") {
    sql("CREATE TABLE dcat.t6 (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    sql("INSERT INTO dcat.t6 VALUES (1, 10), (2, 20)")
    sql("ALTER TABLE dcat.t6 ADD COLUMN w BIGINT DEFAULT 3")
    val root = s"$wh/t6"
    val head = SnapshotTable.versions(spark, root).last
    assert(head.op === "add-column") // pure metadata, zero data files
    assert(head.existsDefaults === Map("w" -> "3L"))
    assert(head.colDefaults === Map("w" -> "3"))
    // write-side fill for new inserts; explicit value and NULL honored
    sql("INSERT INTO dcat.t6 (id, v) VALUES (3, 30)")
    sql("INSERT INTO dcat.t6 VALUES (4, 40, 99)")
    sql("INSERT INTO dcat.t6 VALUES (5, 50, NULL)")
    assert(rows("t6") === Set(
      (1L, Some(10L), Some(3L)), // pre-add file: FILLED, not null
      (2L, Some(20L), Some(3L)),
      (3L, Some(30L), Some(3L)),
      (4L, Some(40L), Some(99L)),
      (5L, Some(50L), None))) // explicit null survives the fill
    // filters on the filled column are sound both ways (connector path)
    assert(spark.sql("SELECT id FROM dcat.t6 WHERE w = 3 ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    assert(spark.sql("SELECT id FROM dcat.t6 WHERE w IS NULL")
      .as[Long].collect().toSeq === Seq(5L))
    // object-API read path fills identically
    assert(SnapshotTable.read(spark, root)
      .filter(col("w") === 3).count() === 3L)
    // time travel BEFORE the add serves the old schema (no w at all)
    assert(!SnapshotTable.read(spark, root, Some(2L))
      .columns.contains("w"))
    // the frozen fill travels rename and upsert/compact lifecycles
    sql("ALTER TABLE dcat.t6 RENAME COLUMN w TO z")
    assert(SnapshotTable.versions(spark, root).last.existsDefaults ===
      Map("z" -> "3L"))
    assert(spark.sql("SELECT id FROM dcat.t6 WHERE z = 3").count() === 3L)
    SnapshotTable.compact(spark, root)
    // compaction materialized the fill physically; answers unchanged
    assert(spark.sql("SELECT id FROM dcat.t6 WHERE z = 3").count() === 3L)
    assert(spark.sql("SELECT id FROM dcat.t6 WHERE z IS NULL").count() === 1L)
    // and dies with its column
    sql("ALTER TABLE dcat.t6 DROP COLUMN z")
    assert(SnapshotTable.versions(spark, root).last.existsDefaults ===
      Map.empty)
  }

  test("ADD COLUMN … DEFAULT freezes a non-literal constant at add " +
      "time and fills merge-on-read bases written before the add") {
    val root = s"$wh/obj_add"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    SnapshotTable.create(df, root, Seq("id"), 2)
    // MOR layer BEFORE the add: its delta dirs also predate the column
    SnapshotTable.upsert(Seq((2L, "B")).toDF("id", "tag"), root,
      mergeOnRead = true)
    val v = SnapshotTable.addColumns(spark, root, Seq(
      (org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType), Some("1.5 * 2")),
      (org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType), None)))
    val head = SnapshotTable.versions(spark, root).last
    assert(head.version === v && head.op === "add-column")
    // the expression froze to its VALUE (3.0), not its text
    assert(head.existsDefaults === Map("score" -> "3.0D"))
    val got = SnapshotTable.read(spark, root)
      .select("id", "tag", "score", "note")
      .as[(Long, String, Option[Double], Option[String])].collect().toSet
    assert(got === Set((1L, "a", Some(3.0), None),
      (2L, "B", Some(3.0), None))) // note: no default ⇒ null contract
    // a default that can't fold still refuses
    intercept[Exception](SnapshotTable.addColumns(spark, root, Seq(
      (org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.DoubleType), Some("rand()")))))
  }

  test("existence defaults survive type WIDENING and ride the change " +
      "feed: a CDF range spanning the add serves pre-add rows with the " +
      "frozen fill, post-add rows verbatim") {
    import org.apache.spark.sql.types.{StructField, IntegerType}
    val root = s"$wh/cdf_add"
    val df = Seq((1L, 10), (2L, 20)).toDF("id", "v")
    SnapshotTable.create(df, root, Seq("id"), 2, changeFeed = true)  // v1
    SnapshotTable.addColumns(spark, root,
      Seq((StructField("w", IntegerType), Some("7"))))               // v2
    SnapshotTable.append(Seq((3L, 30, 99), (4L, 40, 0))
      .toDF("id", "v", "w"), root)                                   // v3
    // widen the added column: the frozen INT literal coerces at fill
    SnapshotTable.widenColumn(spark, root, "w", "BIGINT")            // v4
    assert(SnapshotTable.read(spark, root)
      .select("id", "w").as[(Long, Option[Long])].collect().toSet ===
      Set((1L, Some(7L)), (2L, Some(7L)), (3L, Some(99L)),
        (4L, Some(0L))))
    // connector CDF across the add: pre-add inserts carry the fill
    // (the head read's value for those rows), post-add theirs
    val cdf = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(root)
      .select(col("id"), col("w"), col("_change_type"),
        col("_commit_version"))
      .as[(Long, Option[Long], String, Long)].collect().toSet
    assert(cdf === Set(
      (1L, Some(7L), "insert", 1L), (2L, Some(7L), "insert", 1L),
      (3L, Some(99L), "insert", 3L), (4L, Some(0L), "insert", 3L)))
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
