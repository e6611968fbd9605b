package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotMeta, SnapshotTable}

/** Metadata tables ([[graft.sources.SnapshotMeta]]): the manifest-only
  * `history` / `files` / `tags` relations, through both the object API
  * and the catalog's Iceberg-style multipart spelling. The q176 oracle
  * checks the arithmetic; these cases pin the shapes the oracle can't:
  * provenance columns, merge-on-read nulls, pinned-history truncation,
  * and miss-vs-meta resolution in the catalog. */
class SnapshotMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snapmeta_wh")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.metacat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.metacat.warehouse", d.toString)
    d.toString
  }

  private def freshRoot(name: String): String = {
    val p = new java.io.File(warehouse, name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(p)
    p.getAbsolutePath
  }

  private def docs(n: Int): DataFrame =
    spark.range(n).select(col("id"), (col("id") % 7).as("v"))

  test("history: one row per commit with op, provenance dir counts, " +
      "manifest-arithmetic live rows, and a monotone commit clock") {
    val root = freshRoot("tm_hist")
    SnapshotTable.create(docs(40), root, Seq("id"), buckets = 4)
    SnapshotTable.append(docs(60).filter(col("id") >= 40), root)
    SnapshotTable.delete(spark.range(10).toDF("id"), root)
    val h = SnapshotMeta.history(spark, root)
      .orderBy("version")
      .select("version", "op", "added_dirs", "live_dirs", "live_rows", "ts")
      .collect()
    assert(h.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "create"), (2L, "append"), (3L, "delete")))
    assert(h.map(_.getLong(4)).toSeq === Seq(40L, 60L, 50L))
    // v1 lists only its own dirs; the append's live set = carried + new
    assert(h(0).getInt(2) === h(0).getInt(3))
    assert(h(1).getInt(3) === h(0).getInt(3) + h(1).getInt(2))
    // commit clock: real wall time, nondecreasing
    val ts = h.map(_.getLong(5)).toSeq
    assert(ts.forall(_ > 0L) && ts === ts.sorted)
  }

  test("files: rows sum to the table count, data entries carry the " +
      "version that first listed them, and a merge-on-read layer " +
      "surfaces as kind=rows with its commit as seq (and nulls " +
      "history.live_rows, which is no longer additive)") {
    val root = freshRoot("tm_files")
    SnapshotTable.create(docs(40), root, Seq("id"), buckets = 4)
    SnapshotTable.delete(spark.range(5).toDF("id"), root) // rewrites hit buckets
    val f = SnapshotMeta.files(spark, root)
    assert(f.filter(col("kind") =!= "data").count() === 0L)
    assert(f.agg(sum("rows")).as[Long].head() === 35L)
    // provenance: every live dir was first listed at v1 or v2, and the
    // delete's rewritten dirs carry added_version = 2
    val added = f.select("added_version").as[Long].collect().toSet
    assert(added.subsetOf(Set(1L, 2L)) && added.contains(2L))
    // layer a MOR upsert on top: files gains a rows-kind entry at seq=3
    SnapshotTable.upsert(docs(40).filter(col("id") < 3), root,
      mergeOnRead = true)
    val f3 = SnapshotMeta.files(spark, root)
    val layers = f3.filter(col("kind") === "rows")
      .select("seq").as[Long].collect().toSeq
    assert(layers.nonEmpty && layers.forall(_ === 3L))
    val h3 = SnapshotMeta.history(spark, root).orderBy("version").collect()
    assert(h3.last.getString(2) === "upsert-mor" && h3.last.isNullAt(5))
  }

  test("files resolves version / tag pins with the connector's rules, " +
      "and a pinned history truncates to versions <= the pin") {
    val root = freshRoot("tm_pins")
    SnapshotTable.create(docs(20), root, Seq("id"), buckets = 4)
    SnapshotTable.append(docs(40).filter(col("id") >= 20), root)
    SnapshotTable.createTag(spark, root, "cut", Some(1L))
    assert(SnapshotMeta.files(spark, root, version = Some(1L))
      .agg(sum("rows")).as[Long].head() === 20L)
    assert(SnapshotMeta.files(spark, root, tag = Some("cut"))
      .agg(sum("rows")).as[Long].head() === 20L)
    assert(SnapshotMeta.files(spark, root)
      .agg(sum("rows")).as[Long].head() === 40L)
    assert(SnapshotMeta.tags(spark, root).as[(String, Long)]
      .collect().toSeq === Seq(("cut", 1L)))
    // SQL: multipart metadata ident + time travel on the metadata table
    val viaSql = spark.sql(
      "SELECT version, op FROM metacat.tm_pins.history VERSION AS OF 1")
      .as[(Long, String)].collect().toSeq
    assert(viaSql === Seq((1L, "create")))
    assert(spark.sql(
      "SELECT sum(rows) FROM metacat.tm_pins.files VERSION AS OF 'cut'")
      .as[Long].head() === 20L)
    assert(spark.sql("SELECT count(*) FROM metacat.tm_pins.tags")
      .as[Long].head() === 1L)
  }

  test("catalog resolution: metadata names only fill a real-table miss " +
      "— a missing parent still raises NoSuchTable, and the relation " +
      "plans as a driver-local scan (no file sources)") {
    val root = freshRoot("tm_resolve")
    SnapshotTable.create(docs(8), root, Seq("id"), buckets = 2)
    val plan = spark.sql("SELECT * FROM metacat.tm_resolve.history")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("FileScan"))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM metacat.no_such_table.history").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }
}
