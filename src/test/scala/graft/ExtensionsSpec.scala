package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing
import graft.plans.GraftExtensions

/** The config-driven registration path (`spark.sql.extensions=
  * graft.plans.GraftExtensions`): a session built withExtensions gets the
  * native function and the TopK strategy without programmatic setup. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves graft_bucket_argmin from SQL") {
    val base = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions).getOrCreate()
      val resos = Bucketing.makeBucketResolutions()
      val idx = s2.sql("SELECT graft_bucket_argmin(640, 1024) AS i")
        .collect()(0).getInt(0)
      assert(resos(idx - 1) === ((640, 1024))) // exact grid match returns own slot
      val idx2 = s2.sql("SELECT graft_bucket_argmin(333, 999) AS i")
        .collect()(0).getInt(0)
      assert(idx2 >= 1 && idx2 <= resos.size)
      // the whole native vector family is SQL-callable too
      val r = s2.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  graft_sqdist(array(1L, 5L), array(4L, 1L)) AS sq,
          |  graft_simhash16(array(1L, 3L)) AS sh,
          |  size(graft_hash31_array(array('a', 'b'))) AS nh,
          |  size(graft_chargram_hash31('abcdef', 3)) AS ng,
          |  size(graft_winnow_min(array(5L, 3L, 7L, 2L), 2)) AS nw,
          |  graft_nfc_normalize('cafe\u0301') AS nfc""".stripMargin)
        .collect()(0)
      assert(r.getDouble(0) === 11.0)
      assert(r.getLong(1) === 25L) // 3² + 4²
      assert(r.getLong(2) === (1L | 2L)) // bits where votes tie/win: 1&3 share bit0; bit1 ties→set
      assert(r.getInt(3) === 2 && r.getInt(4) === 4 && r.getInt(5) > 0)
      assert(r.getString(6) === "caf\u00e9") // composed single codepoint
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("GraftExtensions injects the rank-limit rewrite (Verify/Bench wiring)") {
    // Verify/Bench register this entry point via
    // spark.sql.extensions=graft.plans.GraftExtensions; under sbt's
    // layered TEST classloader the by-NAME load isn't visible to Spark's
    // Utils.classForName, so this test applies the same class
    // programmatically — the by-name path is exercised by the driver
    // mains themselves (runMain: rule present in optimizer batches and
    // the window lowers, verified when wiring this in)
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions).getOrCreate()
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val df = s2.range(0, 100)
        .select(col("id"), (col("id") % 7).as("g"), (col("id") * 37 % 101).as("v"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup") && !plan.contains("Window"),
        s"rank-limit window not lowered in the driver-config session:\n$plan")
      assert(df.count() === 21)
      // the domain-cap curation gate rides the same lowering: its
      // rank-limit spelling must plan onto the heap, never a full
      // per-domain Window sort — the map-side reduction is what makes
      // the cap domain-skew-safe on a crawl
      val urls = s2.range(0, 60).select(col("id"),
        concat(lit("https://www.d"), (col("id") % 5).cast("string"),
          lit(".org/x/"), col("id").cast("string")).as("url"),
        (col("id") * 13 % 17).as("q"))
      val capped = graft.ops.UrlCuration.domainCap(urls.toDF(), "url", 4,
        Seq(col("q").desc, col("id").asc))
      val cPlan = capped.queryExecution.executedPlan.toString
      assert(cPlan.contains("TopKPerGroup") && !cPlan.contains("Window"),
        s"domainCap's rank-limit not lowered:\n$cPlan")
      assert(capped.count() === 20) // 5 domains × cap 4
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("custom operators fire under AQE (the driver-session surface)") {
    // Verify/Bench sessions run with spark.sql.adaptive.enabled=true —
    // the custom strategy must survive AQE re-optimization: the FINAL
    // adaptive plan (after materialization) must still carry the heap
    // operator, both when composed directly (TopK.perGroup, the q83/q88
    // path) and when injected by RankLimitRewrite on a user window
    // spelling.
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try {
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
      val src = Tables.part(spark, TestSpark.Sf0001)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      val direct = graft.plans.TopK.perGroup(src, Seq("p_brand"),
        Seq(("p_retailprice", false), ("p_partkey", true)), 3)
      direct.count() // materialize: AQE finalizes the inner plan
      val dPlan = direct.queryExecution.executedPlan.toString
      assert(dPlan.contains("AdaptiveSparkPlan"), s"not adaptive:\n$dPlan")
      assert(dPlan.contains("TopKPerGroup") && !dPlan.contains("Window"))
      import graft.plans.{RankLimitRewrite, TopKStrategy}
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RankLimitRewrite
      try {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        val rewritten = src.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).drop("rn")
        rewritten.count()
        val rPlan = rewritten.queryExecution.executedPlan.toString
        assert(rPlan.contains("AdaptiveSparkPlan"))
        assert(rPlan.contains("TopKPerGroup") && !rPlan.contains("Window"),
          s"rewrite lost under AQE:\n$rPlan")
      } finally {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ == RankLimitRewrite)
      }
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    }
  }
}
