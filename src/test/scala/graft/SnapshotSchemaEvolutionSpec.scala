package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Materialize
import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.ConcurrentCommitException

/** Column mapping ([[SnapshotTable.renameColumn]] /
  * [[SnapshotTable.dropColumn]]): zero-rewrite renames and drops,
  * physical-name stability across writes, reservation guards, per-
  * version logical schemas under time travel, and the mapped read
  * surface (object API, connector pruning + aggregate pushdown, MOR
  * resolution, change feed, SQL ALTER). */
class SnapshotSchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_colmap_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  private def rows(ids: Seq[Long], tag: String) =
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")

  test("rename is a pure-metadata commit: identical entries, content " +
      "relabeled, time travel serves each version's OWN names, writes " +
      "after the rename land under the stable physical name") {
    val root = freshRoot("rn")
    SnapshotTable.create(rows(0L until 16L, "a"), root, Seq("id"), 4)
    val v1 = SnapshotTable.versions(spark, root).head
    assert(SnapshotTable.renameColumn(spark, root, "v", "score") === 2L)
    val v2 = SnapshotTable.versions(spark, root).last
    assert(v2.op === "rename-column" && v2.entries === v1.entries)
    assert(v2.colMap === Map("score" -> "v")) // manifest round-trip
    // head reads the NEW name with the OLD values
    val head = SnapshotTable.read(spark, root)
    assert(head.columns.toSeq === Seq("id", "tag", "score"))
    assert(head.select("id", "score").as[(Long, Long)].collect().toSet ===
      (0L until 16L).map(i => (i, i * 10)).toSet)
    // version 1 keeps its own logical name
    assert(SnapshotTable.read(spark, root, Some(1L)).columns.toSeq ===
      Seq("id", "tag", "v"))
    // post-rename writes speak the NEW logical name; files stay physical
    SnapshotTable.upsert(Seq((3L, "UPD", 999L)).toDF("id", "tag", "score"),
      root)
    SnapshotTable.append(Seq((100L, "new", 1L)).toDF("id", "tag", "score"),
      root)
    val after = SnapshotTable.read(spark, root)
      .select("id", "score").as[(Long, Long)].collect().toSet
    assert(after === (0L until 16L).map(i =>
      (i, if (i == 3) 999L else i * 10)).toSet + ((100L, 1L)))
    // keyed lookup across mapped files
    assert(SnapshotTable.readForKeys(Seq(3L).toDF("id"), root)
      .select("score").as[Long].collect().toSeq === Seq(999L))
    // rename BACK to the physical name drops the mapping entry
    SnapshotTable.renameColumn(spark, root, "score", "v")
    assert(SnapshotTable.versions(spark, root).last.colMap === Map.empty)
    assert(SnapshotTable.read(spark, root).columns.toSeq ===
      Seq("id", "tag", "v"))
  }

  test("drop is a pure-metadata commit; the physical name is reserved " +
      "against resurrection; time travel still serves the column") {
    val root = freshRoot("drop")
    SnapshotTable.create(rows(0L until 8L, "a"), root, Seq("id"), 2)
    assert(SnapshotTable.dropColumn(spark, root, "tag") === 2L)
    val v2 = SnapshotTable.versions(spark, root).last
    assert(v2.op === "drop-column" && v2.droppedPhys === Seq("tag"))
    assert(SnapshotTable.read(spark, root).columns.toSeq === Seq("id", "v"))
    assert(SnapshotTable.read(spark, root, Some(1L)).columns.toSeq ===
      Seq("id", "tag", "v"))
    // re-adding the dropped name would resurrect old file bytes: refused
    val bad = Seq((50L, 1L, "ghost")).toDF("id", "v", "tag")
    intercept[IllegalArgumentException](
      SnapshotTable.append(bad, root, mergeSchema = true))
    // a DIFFERENT new column is fine and reads null on old rows
    SnapshotTable.append(Seq((50L, 1L, "fresh")).toDF("id", "v", "label"),
      root, mergeSchema = true)
    val out = SnapshotTable.read(spark, root)
    assert(out.columns.toSeq === Seq("id", "v", "label"))
    assert(out.where(col("id") === 0L).select("label")
      .collect().head.isNullAt(0))
    // renamed-column physical reservation: rename label->note, then
    // adding a new column named 'label' (the physical) is refused
    SnapshotTable.renameColumn(spark, root, "label", "note")
    intercept[IllegalArgumentException](
      SnapshotTable.append(Seq((51L, 1L, "x", "y"))
        .toDF("id", "v", "note", "label"), root, mergeSchema = true))
  }

  test("key columns are not renameable or droppable; unknown/duplicate " +
      "names fail loudly") {
    val root = freshRoot("guard")
    SnapshotTable.create(rows(0L until 4L, "a"), root, Seq("id"), 2)
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(spark, root, "id", "key"))
    intercept[IllegalArgumentException](
      SnapshotTable.dropColumn(spark, root, "id"))
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(spark, root, "nope", "x"))
    intercept[IllegalArgumentException](
      SnapshotTable.renameColumn(spark, root, "tag", "v")) // exists
    intercept[IllegalArgumentException](
      SnapshotTable.dropColumn(spark, root, "nope"))
  }

  test("connector parity on a mapped table: full read, pushed point " +
      "lookup, stats range pruning, and manifest aggregate pushdown " +
      "all answer under the logical names") {
    val root = freshRoot("v2")
    SnapshotTable.create(rows(0L until 64L, "a"), root, Seq("id"), 4)
    SnapshotTable.renameColumn(spark, root, "v", "score")
    SnapshotTable.append(
      (100L until 110L).map(i => (i, "b", i * 10L))
        .toDF("id", "tag", "score"), root)
    val v2 = spark.read.format("graft-snapshot").load(root)
    assert(v2.columns.toSeq === Seq("id", "tag", "score"))
    // point lookup (bucket pruning + residual filters on mapped files)
    assert(v2.where(col("id") === 5L).select("score")
      .as[Long].collect().toSeq === Seq(50L))
    // range predicate over the renamed column: stats keyed physical,
    // filter logical — still correct (and pruning-eligible)
    assert(v2.where(col("score") >= 1000L).count() === 10L)
    // manifest aggregate pushdown translates the renamed column
    val agg = v2.agg(count(lit(1)), min(col("score")), max(col("score")))
      .as[(Long, Long, Long)].head()
    assert(agg === ((74L, 0L, 1090L)))
    import org.apache.spark.sql.execution.LocalTableScanExec
    val plan = v2.agg(count(lit(1)), min(col("score"))).queryExecution
      .executedPlan
    assert(plan.collectLeaves().forall(_.isInstanceOf[LocalTableScanExec]),
      s"expected a manifest-answered LocalTableScan, got:\n$plan")
  }

  test("merge-on-read resolution and the change feed stay exact across " +
      "a rename; the rename step itself reports zero changes") {
    val root = freshRoot("morcdf")
    val feed = rows(0L until 16L, "a")
    SnapshotTable.create(feed, root, Seq("id"), 4, changeFeed = true)
    SnapshotTable.renameColumn(spark, root, "v", "score") // v2
    assert(SnapshotTable.readChanges(spark, root, 1L, 2L).count() === 0L)
    // MOR layers against mapped files, resolved by object API + V2
    SnapshotTable.upsert(Seq((5L, "MOR", 1L)).toDF("id", "tag", "score"),
      root, mergeOnRead = true) // v3
    val expect = (0L until 16L).map(i =>
      (i, if (i == 5) "MOR" else "a", if (i == 5) 1L else i * 10)).toSet
    assert(SnapshotTable.read(spark, root)
      .select("id", "tag", "score").as[(Long, String, Long)]
      .collect().toSet === expect)
    assert(spark.read.format("graft-snapshot").load(root)
      .select("id", "tag", "score").as[(Long, String, Long)]
      .collect().toSet === expect)
    SnapshotTable.compact(spark, root) // v4: folds the layer
    // merge-on-write upsert post-rename writes a CDC file (physical);
    // the batch feed reads it back under the NEW logical names
    SnapshotTable.upsert(Seq((7L, "UPD", 2L)).toDF("id", "tag", "score"),
      root) // v5
    val ch = SnapshotTable.readChanges(spark, root, 4L, 5L)
      .select("id", "tag", "score", SnapshotTable.ChangeTypeCol)
      .as[(Long, String, Long, String)].collect().toSet
    assert(ch === Set((7L, "a", 70L, "delete"), (7L, "UPD", 2L, "insert")))
    // the DIFF across the rename boundary relabels through physical
    // names: v1 -> v5 must show only the two content changes
    val wide = SnapshotTable.readChanges(spark, root, 1L, 5L)
      .select("id", SnapshotTable.ChangeTypeCol)
      .as[(Long, String)].collect().toSet
    assert(wide === Set((5L, "delete"), (5L, "insert"),
      (7L, "delete"), (7L, "insert")))
  }

  test("SQL ALTER TABLE RENAME/DROP COLUMN land as mapping commits; " +
      "SELECT and UPDATE keep working through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_colmap_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.cmcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.cmcat.warehouse", wh.toString)
    spark.sql("CREATE TABLE cmcat.ct (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO cmcat.ct VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql("ALTER TABLE cmcat.ct RENAME COLUMN v TO score")
    assert(spark.sql("SELECT score FROM cmcat.ct WHERE id = 1")
      .as[Long].head() === 10L)
    spark.sql("UPDATE cmcat.ct SET score = 99 WHERE id = 2")
    assert(spark.sql("SELECT score FROM cmcat.ct ORDER BY id")
      .as[Long].collect().toSeq === Seq(10L, 99L))
    spark.sql("ALTER TABLE cmcat.ct DROP COLUMN tag")
    assert(spark.sql("SELECT * FROM cmcat.ct").columns.toSeq ===
      Seq("id", "score"))
    // the table's history kept every logical view
    assert(spark.sql(
      "SELECT * FROM cmcat.ct VERSION AS OF 2").columns.toSeq ===
      Seq("id", "tag", "v"))
  }

  test("a concurrent rename/drop fails racing writers loudly (their " +
      "staged ddl speaks the old names)") {
    val root = freshRoot("race")
    SnapshotTable.create(rows(0L until 8L, "a"), root, Seq("id"), 4)
    val tap = Materialize.Tap(() => {
      SnapshotTable.renameColumn(spark, root, "v", "score"); ()
    })
    val e = intercept[ConcurrentCommitException](
      SnapshotTable.upsert(rows(Seq(3L), "B"), root, mat = tap,
        retries = 3))
    assert(e.getMessage.contains("rename/drop"))
    assert(SnapshotTable.read(spark, root).columns.toSeq ===
      Seq("id", "tag", "score"))
  }

  test("zorder and rescale compose with column mapping: the clustering " +
      "rewrite keeps physical file names and logical reads") {
    val root = freshRoot("zo")
    val d = (0L until 256L).map(i => (i, i % 16, (i / 16) * 7))
      .toDF("id", "x", "y")
    SnapshotTable.create(d, root, Seq("id"), 4)
    SnapshotTable.renameColumn(spark, root, "x", "lon")
    SnapshotTable.renameColumn(spark, root, "y", "lat")
    SnapshotTable.zorder(spark, root, Seq("lon", "lat"), 4)
    val out = SnapshotTable.read(spark, root)
    assert(out.columns.toSeq === Seq("id", "lon", "lat"))
    assert(out.count() === 256L)
    assert(out.where(col("lon") < 4 && col("lat") < 14).count() ===
      d.where(col("x") < 4 && col("y") < 14).count())
    SnapshotTable.rescaleBuckets(spark, root, 16)
    SnapshotTable.upsert(Seq((7L, 99L, 99L)).toDF("id", "lon", "lat"), root)
    assert(SnapshotTable.readForKeys(Seq(7L).toDF("id"), root)
      .select("lon").as[Long].collect().toSeq === Seq(99L))
  }

  test("type widening is a pure-metadata commit: int->long and float->" +
      "double serve old narrow files promoted at scan, new writes land " +
      "wide, mixed files read exact, and time travel keeps each " +
      "version's OWN type") {
    val root = freshRoot("widen")
    val d = (0L until 16L).map(i => (i, i.toInt, i.toFloat / 2))
      .toDF("id", "n", "x")
    SnapshotTable.create(d, root, Seq("id"), 4)
    val v1 = SnapshotTable.versions(spark, root).head
    assert(SnapshotTable.widenColumn(spark, root, "n", "BIGINT") === 2L)
    assert(SnapshotTable.widenColumn(spark, root, "x", "DOUBLE") === 3L)
    val v3 = SnapshotTable.versions(spark, root).last
    assert(v3.op === "widen-column" && v3.entries === v1.entries)
    val head = SnapshotTable.read(spark, root)
    assert(head.schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(head.schema("x").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(head.select(sum("n")).as[Long].head() === 120L)
    // new writes land under the wide type; reads mix narrow + wide files
    SnapshotTable.append((16L until 20L).map(i => (i, i * 1000000000L,
      i.toDouble)).toDF("id", "n", "x"), root)
    SnapshotTable.upsert(Seq((3L, 30L, 0.25d)).toDF("id", "n", "x"), root)
    val all = SnapshotTable.read(spark, root)
    assert(all.count() === 20L)
    assert(all.filter(col("id") === 3L).select("n", "x")
      .as[(Long, Double)].head() === ((30L, 0.25d)))
    assert(all.filter(col("id") === 17L).select("n").as[Long].head() ===
      17000000000L)
    // connector parity + stats pruning across the widen: recorded
    // narrow-file stats compare exactly against wide literals
    val scan = spark.read.format("graft-snapshot").load(root)
    assert(scan.filter(col("n") === 17000000000L).count() === 1L)
    assert(scan.filter(col("n") < 0L).count() === 0L)
    // time travel: v1 under its own narrow types
    val old = SnapshotTable.read(spark, root, Some(1L))
    assert(old.schema("n").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(old.schema("x").dataType ===
      org.apache.spark.sql.types.FloatType)
    // a batch still speaking the NARROW type is refused (cast upstream)
    intercept[IllegalArgumentException](SnapshotTable.append(
      Seq((99L, 1, 0.5f)).toDF("id", "n", "x"), root))
  }

  test("widening guards: narrowing, kind changes, keys, and partition " +
      "sources are refused; the SQL ALTER COLUMN TYPE surface works " +
      "and validates mixed lists up front") {
    val root = freshRoot("wguard")
    val d = (0L until 8L).map(i =>
      (i, i.toInt, i.toFloat, java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "n", "x", "day")
    SnapshotTable.create(d, root, Seq("id"), 2,
      partitionBy = Seq("months(day)"))
    intercept[IllegalArgumentException]( // narrowing
      SnapshotTable.widenColumn(spark, root, "n", "SHORT"))
    intercept[IllegalArgumentException]( // kind change
      SnapshotTable.widenColumn(spark, root, "n", "STRING"))
    intercept[IllegalArgumentException]( // double -> nothing above it
      SnapshotTable.widenColumn(spark, root, "x", "DECIMAL(20,2)"))
    intercept[IllegalArgumentException]( // key
      SnapshotTable.widenColumn(spark, root, "id", "DECIMAL(30,0)"))
    intercept[IllegalArgumentException]( // partition source
      SnapshotTable.widenColumn(spark, root, "day", "TIMESTAMP_NTZ"))
    // SQL surface through the catalog
    val wh = java.nio.file.Files.createTempDirectory("graft_widen_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.widecat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.widecat.warehouse", wh.toString)
    spark.sql("CREATE TABLE widecat.t (id BIGINT, n INT, x FLOAT) " +
      "PARTITIONED BY (bucket(2, id))")
    spark.sql("INSERT INTO widecat.t VALUES (1, 10, 0.5), (2, 20, 1.5)")
    spark.sql("ALTER TABLE widecat.t ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql("SELECT sum(n) FROM widecat.t").as[Long].head() === 30L)
    spark.sql("INSERT INTO widecat.t VALUES (3, 30000000000, 2.5)")
    assert(spark.sql("SELECT max(n) FROM widecat.t").as[Long].head() ===
      30000000000L)
    // mixed ALTER with an invalid tail applies NOTHING
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("widecat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val before = SnapshotTable.versions(spark, s"$wh/t").size
    intercept[IllegalArgumentException](cat.alterTable(
      Identifier.of(Array.empty[String], "t"),
      TableChange.updateColumnType(Array("x"),
        org.apache.spark.sql.types.DoubleType),
      TableChange.updateColumnType(Array("id"),
        org.apache.spark.sql.types.IntegerType))) // key + narrowing
    assert(SnapshotTable.versions(spark, s"$wh/t").size === before)
    assert(spark.table("widecat.t").schema("x").dataType ===
      org.apache.spark.sql.types.FloatType)
  }

  test("widening composes with column mapping, merge-on-read deltas, " +
      "and the change feed: a renamed-then-widened column serves " +
      "narrow deltas promoted, and CDF unions across the widen") {
    val root = freshRoot("wmix")
    val d = (0L until 12L).map(i => (i, i.toInt)).toDF("id", "n")
    SnapshotTable.create(d, root, Seq("id"), 2, changeFeed = true)
    SnapshotTable.renameColumn(spark, root, "n", "m") // physical stays 'n'
    SnapshotTable.upsert(Seq((1L, 111)).toDF("id", "m"), root,
      mergeOnRead = true) // narrow delta layer
    SnapshotTable.widenColumn(spark, root, "m", "BIGINT")
    // resolved read promotes base AND delta files under the wide type
    assert(SnapshotTable.readForKeys(Seq(1L).toDF("id"), root)
      .select("m").as[Long].collect().toSeq === Seq(111L))
    SnapshotTable.upsert(Seq((2L, 40000000000L)).toDF("id", "m"), root)
    assert(SnapshotTable.read(spark, root).select(max("m"))
      .as[Long].head() === 40000000000L)
    // change feed across the widen: the union coerces to the wide type
    val feed = SnapshotTable.readChanges(spark, root, 1L, 5L)
    assert(feed.schema("m").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(feed.filter(col("_change_type") === "insert" &&
      col("id") === 2L).select("m").as[Long].head() === 40000000000L)
  }
}
