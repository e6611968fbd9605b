package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LinearModel

/** Closed-form OLS invariants:
  *   (1) on exactly-linear integer data the fit recovers the plane — every
  *       residual micro-rounds to 0 and predictions hit y exactly;
  *   (2) on noisy data the residuals satisfy the normal equations
  *       (Σr ≈ 0, Σr·x₁ ≈ 0, Σr·x₂ ≈ 0 — the defining property of least
  *       squares, checked against the micro outputs);
  *   (3) partitioning does not change a single output (order-free exact
  *       moments + fixed solve tree).
  */
class LinearModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen = for {
    x1 <- Gen.chooseNum(0L, 50L)
    x2 <- Gen.chooseNum(0L, 200L)
  } yield (x1, x2)

  test("recovers an exact integer plane: residuals all micro-zero") {
    val prop = Prop.forAll(
      Gen.chooseNum(4, 60).flatMap(n => Gen.listOfN(n, rowGen)),
      Gen.chooseNum(-3L, 3L), Gen.chooseNum(-2L, 2L), Gen.chooseNum(0L, 2L)
    ) { (xs, b0, b1, b2) =>
      // need full-rank design: degenerate all-equal features make det=0
      val distinct1 = xs.map(_._1).distinct.size > 2
      val distinct2 = xs.map(_._2).distinct.size > 2
      !(distinct1 && distinct2) || {
        val rows = xs.zipWithIndex.map { case ((x1, x2), i) =>
          (i.toLong, x1, x2, b0 + b1 * x1 + b2 * x2) }
        val df = rows.toDF("id", "x1", "x2", "y").repartition(3)
        val out = LinearModel.fitScore2(df, col("y"), col("x1"), col("x2"))
          .select(col("id"), col("y"), col("pred_micro"), col("resid_micro"))
          .collect()
        out.forall { r =>
          r.getLong(3) == 0L && r.getLong(2) == r.getLong(1) * 1000000L }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("normal equations hold on noisy data (orthogonal residuals)") {
    val rows = (0 until 80).map { i =>
      val x1 = (i * 7 % 50).toLong; val x2 = (i * 13 % 90).toLong
      (i.toLong, x1, x2, 2L + x1 / 2 + x2 / 3 + (i % 5) - 2L)
    }
    val df = rows.toDF("id", "x1", "x2", "y").repartition(4)
    val out = LinearModel.fitScore2(df, col("y"), col("x1"), col("x2"))
      .select(col("x1"), col("x2"), col("resid_micro")).collect()
    val n = out.length.toDouble
    val r = out.map(_.getLong(2).toDouble / 1e6)
    val sumR = r.sum
    val sumRx1 = out.zip(r).map { case (row, ri) => ri * row.getLong(0) }.sum
    val sumRx2 = out.zip(r).map { case (row, ri) => ri * row.getLong(1) }.sum
    // micro-rounding injects up to 5e-7 per row; scale tolerance by Σ|x|
    assert(math.abs(sumR) <= n * 1e-5, s"sum r = $sumR")
    assert(math.abs(sumRx1) <= n * 50 * 1e-5, s"sum r x1 = $sumRx1")
    assert(math.abs(sumRx2) <= n * 90 * 1e-5, s"sum r x2 = $sumRx2")
  }

  test("per-group fit equals independent per-slice global fits") {
    val rows = (0 until 120).map { i =>
      val g = s"g${i % 3}"
      val x1 = (i * 7 % 50).toLong; val x2 = (i * 13 % 90).toLong
      // different true planes per group
      (i.toLong, g, x1, x2, (i % 3) + x1 * (1 + i % 3) + x2 / 2 + (i % 4) - 1L)
    }
    val df = rows.toDF("id", "g", "x1", "x2", "y").repartition(4)
    val grouped = LinearModel.fitScore2ByGroup(df, Seq("g"), col("y"),
        col("x1"), col("x2"))
      .select(col("id"), col("pred_micro"), col("resid_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sliced = (0 until 3).flatMap { gi =>
      val slice = df.filter(col("g") === s"g$gi")
      LinearModel.fitScore2(slice, col("y"), col("x1"), col("x2"))
        .select(col("id"), col("pred_micro"), col("resid_micro"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(grouped == sliced)
  }

  test("partition count does not change any output value") {
    val rows = (0 until 60).map { i =>
      (i.toLong, (i % 11).toLong, (i * 3 % 17).toLong, (i % 7).toLong) }
    def run(p: Int) = {
      val df = rows.toDF("id", "x1", "x2", "y").repartition(p)
      LinearModel.fitScore2(df, col("y"), col("x1"), col("x2"))
        .select(col("id"), col("pred_micro"), col("resid_micro"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(run(1) == run(7))
  }
}
