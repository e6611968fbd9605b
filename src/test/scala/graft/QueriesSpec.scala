package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Registry contract + pipeline-assembly invariants at sf0.001. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registry: unique names, oracle keys subset of query keys") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(Queries.all.count(_.oracle.isDefined) >= 40)
  }

  test("plan hygiene: no driver query plans a cartesian product") {
    // a CartesianProductExec in ANY registered query is a scale defect —
    // every pairwise operator must go through a key-equi-join (LSH band,
    // bucket code, partition column) or an explicit BROADCAST nested
    // loop over a provably tiny side (kmeans centroids, brute-force
    // query sets), which plans as BroadcastNestedLoopJoin, not
    // CartesianProduct. Building the DataFrames executes the layout-
    // staging side effects (q88/q89/q93 writes) at sf0.001 — cheap.
    Queries.all.foreach { q =>
      val plan = q.fn(TestSpark.spark, TestSpark.Sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n$plan")
    }
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("J5 upsert: updates overwrite base rows by key") {
    import org.apache.spark.sql.functions.col
    val sp = spark
    import sp.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val upd  = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    val out = graft.pipeline.LegacyMerge.upsert(base, upd, Seq("k"))
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("q54 modern pipeline: schema + semantic invariants") {
    val df = Queries.byName("q54_modern_pipeline").fn(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq ===
      Seq("image_key", "train_w", "train_h", "rating", "aesthetic_score", "ordered_tags"))
    rows.foreach { r =>
      assert(r.getInt(1) % 8 === 0 && r.getInt(2) % 8 === 0)   // P3 latent floor
      assert(r.getDouble(4) >= 0.5)                            // F1 threshold
      assert(r.getString(5).nonEmpty)                          // U3 produced tags
    }
  }
}
