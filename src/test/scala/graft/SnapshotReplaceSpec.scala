package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SnapshotMicroBatchStream, SnapshotOffset, SnapshotStreamOptions, SnapshotTable}

/** Atomic, history-preserving `CREATE OR REPLACE TABLE`
  * ([[SnapshotTable.replaceTable]] + the catalog's
  * StagingTableCatalog): ONE `replace` commit swaps content and
  * definition (schema, keys, buckets, partition spec) while prior
  * versions stay time-travelable — vs Spark's non-staging fallback,
  * which would DROP (destroying history) then CREATE, non-atomically. */
class SnapshotReplaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_replace_wh")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.repcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.repcat.warehouse", d.toString)
    d.toString
  }
  private def sql(q: String): DataFrame = { wh; spark.sql(q) }

  test("SQL CREATE OR REPLACE goes through the staged path: one " +
      "'replace' commit, history preserved, old versions time-travel " +
      "under their own schema and data") {
    sql("CREATE TABLE repcat.t1 (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    sql("INSERT INTO repcat.t1 VALUES (1, 10), (2, 20)")
    sql("CREATE OR REPLACE TABLE repcat.t1 (id BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    val root = s"$wh/t1"
    val vs = SnapshotTable.versions(spark, root)
    assert(vs.map(s => (s.version, s.op)) ===
      Seq((1L, "create"), (2L, "append"), (3L, "replace")),
      "history must survive the replace")
    // new definition: schema AND bucket count swapped
    assert(vs.last.buckets === 4)
    assert(spark.table("repcat.t1").columns.toSeq === Seq("id", "s"))
    assert(spark.table("repcat.t1").count() === 0L)
    // the pre-replace version still serves its own schema and rows
    val old = sql("SELECT * FROM repcat.t1 VERSION AS OF 2")
    assert(old.columns.toSeq === Seq("id", "v"))
    assert(old.as[(Long, Long)].collect().toSet === Set((1L, 10L), (2L, 20L)))
    // and the replaced table accepts writes under the new definition
    sql("INSERT INTO repcat.t1 VALUES (5, 'x')")
    assert(spark.table("repcat.t1").as[(Long, String)].collect().toSet ===
      Set((5L, "x")))
  }

  test("RTAS: CREATE OR REPLACE TABLE ... AS SELECT lands data and " +
      "definition in the SAME commit; REPLACE of a missing table " +
      "refuses; staged CREATE of an existing one refuses") {
    sql("CREATE TABLE repcat.t2 (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    sql("INSERT INTO repcat.t2 VALUES (1, 10)")
    sql("CREATE OR REPLACE TABLE repcat.t2 " +
      "PARTITIONED BY (bucket(2, id)) AS " +
      "SELECT * FROM VALUES (7L, 'a'), (8L, 'b') AS t(id, s)")
    val root = s"$wh/t2"
    val head = SnapshotTable.versions(spark, root).last
    assert(head.op === "replace" && head.version === 3L)
    assert(spark.table("repcat.t2").as[(Long, String)].collect().toSet ===
      Set((7L, "a"), (8L, "b")))
    intercept[Exception](sql("REPLACE TABLE repcat.nope (id BIGINT)"))
    intercept[Exception](sql(
      "CREATE TABLE repcat.t2 (id BIGINT) PARTITIONED BY (bucket(2, id))"))
    // CREATE OR REPLACE on a MISSING table is a create
    sql("CREATE OR REPLACE TABLE repcat.t3 AS SELECT 1L AS id")
    assert(SnapshotTable.versions(spark, s"$wh/t3")
      .map(_.op) === Seq("create"))
  }

  test("replace resets the full definition: new keys prune reads, the " +
      "new partition spec lays out dirs, constraints/defaults/mapping " +
      "reset, and the object API replaceTable on an absent root " +
      "creates") {
    val root = s"$wh/obj"
    val v0 = SnapshotTable.replaceTable(
      Seq((1L, "en", 5L)).toDF("id", "lang", "n"), root, Seq("id"), 2)
    assert(v0 === 1L) // absent → create
    SnapshotTable.renameColumn(spark, root, "n", "len")
    SnapshotTable.addConstraint(spark, root, "pos", "len >= 0")
    // replace with different keys + a partition transform
    val v = SnapshotTable.replaceTable(
      Seq(("a", 1L, "en"), ("b", 2L, "fr")).toDF("doc", "num", "lang"),
      root, Seq("doc"), 4, partitionBy = Seq("lang"))
    val head = SnapshotTable.versions(spark, root).last
    assert(v === 4L && head.op === "replace")
    assert(head.keys === Seq("doc") && head.buckets === 4)
    assert(head.colMap.isEmpty && head.constraints.isEmpty &&
      head.deltas.isEmpty)
    assert(head.partSpec.map(_.toString) === Seq("identity(lang)"))
    assert(head.entries.forall(_._2.contains("_pt0=")))
    // keyed lookup under the NEW keys
    assert(SnapshotTable.readForKeys(Seq("b").toDF("doc"), root)
      .select("num").as[Long].collect().toSeq === Seq(2L))
    // pre-replace version unaffected (renamed column intact)
    assert(SnapshotTable.read(spark, root, Some(2L)).columns.toSeq ===
      Seq("id", "lang", "len"))
  }

  test("the change feed treats a replace as an exact whole diff, and a " +
      "tailing stream refuses it (its dirs replace existing rows)") {
    val root = s"$wh/cdc"
    SnapshotTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"),
      root, Seq("id"), 2)
    SnapshotTable.replaceTable(Seq((2L, "b"), (3L, "c")).toDF("id", "tag"),
      root, Seq("id"), 2)
    val ch = SnapshotTable.readChanges(spark, root, 1L, 2L)
      .select(col("id"), col("tag"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set((1L, "a", "delete"), (3L, "c", "insert")),
      "unchanged row 2 must not churn; 1 deletes, 3 inserts")
    val st = new SnapshotMicroBatchStream(root, _ => null, false,
      SnapshotStreamOptions(startingVersion = Some("1")))
    val e = intercept[Exception](st.rangeDirs(
      st.initialOffset().asInstanceOf[SnapshotOffset], SnapshotOffset(2)))
    assert(e.getMessage.contains("replace"))
  }
}
