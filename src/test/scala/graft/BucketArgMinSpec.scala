package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing
import graft.ops.Bucketing.BucketConfig
import graft.plans.GraftFunctions

/** Native Catalyst BucketArgMin == builtin expression tree, inside
  * whole-stage codegen. */
class BucketArgMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = BucketConfig()
  private val resos = Bucketing.makeBucketResolutions(cfg)

  private lazy val dims =
    (1 to 400).map(i => (128 + i * 37 % 1900, 128 + i * 53 % 1900)) ++
      Seq((640, 1024), (1024, 1024), (4096, 64), (64, 4096))

  test("native expression agrees with the builtin argmin tree on every row") {
    GraftFunctions.register(spark, cfg)
    val df = dims.toDF("w", "h")
      .withColumn("native", element_at(Bucketing.resosLit(resos),
        call_function(GraftFunctions.BucketArgMinName, col("w"), col("h"))))
      .withColumn("builtin", Bucketing.selectBucketUpscale(col("w"), col("h"), resos))
      .filter(col("native.rw") =!= col("builtin.reso_w") ||
              col("native.rh") =!= col("builtin.reso_h"))
    assert(df.count() === 0)
  }

  test("native expression runs inside WholeStageCodegen (no fallback)") {
    GraftFunctions.register(spark, cfg)
    // Parquet-backed input — a local Seq would be constant-folded into a
    // LocalTableScan before any codegen stage exists.
    val df = Tables.part(spark, TestSpark.Sf0001)
      .select((lit(128) + col("p_partkey") % 1900).cast("int").as("w"),
        (lit(128) + (col("p_partkey") * 7) % 1900).cast("int").as("h"))
      .select(call_function(GraftFunctions.BucketArgMinName, col("w"), col("h")).as("idx"))
    // Whole-stage codegen shows as the `*(n)` stage prefix in plan strings;
    // a CodegenFallback expression would leave a bare un-starred Project.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_bucket_argmin.*"))
    val viaCodegen = df.collect().map(_.getInt(0))
    assert(viaCodegen.nonEmpty && viaCodegen.forall(i => i >= 1 && i <= resos.size))
  }

  test("exact grid resolution returns its own index") {
    GraftFunctions.register(spark, cfg)
    val (w, h) = resos(5)
    val idx = Seq((w, h)).toDF("w", "h")
      .select(call_function(GraftFunctions.BucketArgMinName, col("w"), col("h")))
      .collect()(0).getInt(0)
    assert(resos(idx - 1) === ((w, h)))
  }
}
