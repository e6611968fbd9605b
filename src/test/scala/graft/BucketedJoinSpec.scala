package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sources

/** Scale evidence: matching bucketed layouts make the orders ⋈ lineitem
  * fact-fact join plan WITHOUT any exchange (the shuffle happens once at
  * layout time, not per query). */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-located bucketed join: no Exchange in the physical plan") {
    val o = Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val l = Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    Sources.writeBucketedTable(o, "graft_orders_b", "o_orderkey", 8)
    Sources.writeBucketedTable(l, "graft_lineitem_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val j = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      val expected = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
      assert(j.agg(sum("n")).collect()(0).getLong(0) === expected)
      val plan = j.queryExecution.executedPlan.toString
      // join AND aggregation ride the bucket partitioning — zero shuffles
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}
