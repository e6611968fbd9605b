package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopK

/** Custom whole-operator TopKPerGroup vs Spark's window spelling. */
class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom exec == window row_number spelling on part (incl. ties)") {
    val src = Tables.part(spark, TestSpark.Sf0001)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
    val custom = TopK.perGroup(src, Seq("p_brand"),
      Seq(("p_retailprice", false), ("p_partkey", true)), 3)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val window = src.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(custom.count() === window.count())
    assert(custom.exceptAll(window).count() === 0)
    assert(window.exceptAll(custom).count() === 0)
  }

  test("physical plan uses TopKPerGroupExec (no window sort)") {
    val src = Tables.part(spark, TestSpark.Sf0001)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
    val custom = TopK.perGroup(src, Seq("p_brand"), Seq(("p_retailprice", false)), 2)
    custom.count() // materialize so AQE finalizes the inner plan
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.contains("Window"))
  }

  test("two-phase: partial top-k sits below the exchange, final above") {
    val src = Tables.part(spark, TestSpark.Sf0001)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
    val custom = TopK.perGroup(src, Seq("p_brand"),
      Seq(("p_retailprice", false), ("p_partkey", true)), 3)
    custom.count()
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"))
    val iFinal = plan.indexOf("TopKPerGroup")
    val iEx = plan.indexOf("Exchange")
    val iPart = plan.indexOf("TopKPartial")
    assert(iFinal >= 0 && iEx > iFinal && iPart > iEx) // final ← shuffle ← partial
  }

  test("RankLimitRewrite: user window rank-limit spelling becomes TopKPerGroup") {
    import graft.plans.{RankLimitRewrite, TopKStrategy}
    val src = Tables.part(spark, TestSpark.Sf0001)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    def q = src.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    val expected = q.collect().toSet // rule not yet installed → window plan
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RankLimitRewrite
    try {
      val rewritten = q
      rewritten.count()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"not rewritten:\n$plan")
      assert(!plan.contains("Window"))
      assert(rewritten.collect().toSet === expected)
      // a query that KEEPS the rank column must NOT be rewritten
      val keepsRn = src.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      keepsRn.count()
      assert(keepsRn.queryExecution.executedPlan.toString.contains("Window"))
      // k above the memory gate keeps the (spilling) window spelling —
      // the heap exec has no spill path, so a huge k must not be
      // silently routed into unbounded executor memory.
      val hugeK = src.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10000000).drop("rn")
      hugeK.count()
      assert(hugeK.queryExecution.executedPlan.toString.contains("Window"),
        "huge-k rank limit must not be rewritten into the heap operator")
      // ...and raising the conf re-enables the rewrite at that k.
      spark.conf.set(graft.plans.RankLimitRewrite.MaxKConf, "20000000")
      try {
        val gated = src.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10000000).drop("rn")
        gated.count()
        assert(gated.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      } finally spark.conf.unset(graft.plans.RankLimitRewrite.MaxKConf)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RankLimitRewrite)
    }
  }

  test("driver-contract q83 ships the two-phase heap operator") {
    // The driver's Bench/Verify sessions are built plain (no
    // GraftExtensions), so q83 must compose TopKPerGroup DIRECTLY — this
    // asserts the executed plan on the driver path, not a library path.
    val q83 = Queries.byName("q83_stratified_sample").fn(spark, TestSpark.Sf0001)
    q83.count()
    val plan = q83.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"q83 lost the heap operator:\n$plan")
    assert(plan.contains("TopKPartial"))
    // the only Window left is the rank recompute over ≤ k·languages rows,
    // ABOVE the top-k cut (appears before it in the plan tree print)
    assert(plan.indexOf("Window") < plan.indexOf("TopKPerGroup"))
    // CorpusPipeline.sample ships the same operator
    val s = graft.pipeline.CorpusPipeline.sample(
      Tables.documents(spark, TestSpark.Sf0001))
    s.count()
    val sPlan = s.queryExecution.executedPlan.toString
    assert(sPlan.contains("TopKPerGroup") && !sPlan.contains("Window"))
  }

  test("k larger than group size returns whole groups") {
    val src = Tables.nation(spark, TestSpark.Sf0001)
      .select(col("n_regionkey"), col("n_nationkey"))
    val custom = TopK.perGroup(src, Seq("n_regionkey"), Seq(("n_nationkey", true)), 1000)
    assert(custom.count() === src.count())
  }
}
