package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Outliers

/** Robust outlier gate: exact stats against a sequential median oracle,
  * row-level flag semantics (nulls, single-value groups), and the
  * approx spelling's agreement on well-separated data. */
class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seqMedian(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2).toDouble
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("madStats matches a sequential median/MAD oracle") {
    val data = Seq(
      ("a", 10L), ("a", 12L), ("a", 11L), ("a", 13L), ("a", 500L),
      ("b", 7L), ("b", 9L), ("b", 8L))
    val got = Outliers.madStats(data.toDF("k", "v"), "k", "v", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    data.groupBy(_._1).foreach { case (key, rows) =>
      val vs = rows.map(_._2)
      val med = seqMedian(vs)
      val mad = seqMedian(vs.map(v => math.abs(v - med).toLong))
      val nOut = vs.count(v => math.abs(v - med) > 3.0 * mad)
      assert(got(key) == ((vs.size.toLong, med, mad, nOut.toLong)),
        s"group $key")
    }
    // the planted 500 in group a must be the one outlier
    assert(got("a")._4 == 1L)
    assert(got("b")._4 == 0L)
  }

  test("flagOutliers: nulls and degenerate groups are never outliers") {
    val df = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 1000L), ("a", null),
      ("solo", 42L))
      .toDF("k", "v")
    val got = Outliers.flagOutliers(df, "k", "v", k = 3)
      .select(col("k"), col("v"), col("is_outlier")).collect()
      .map(r => (r.getString(0), Option(r.get(1))) -> r.getBoolean(2)).toMap
    assert(got(("a", Some(1000L))), "planted extreme must flag")
    assert(!got(("a", Some(2L))))
    assert(!got(("a", None)), "null measurement is not an outlier")
    // single-value group: MAD = 0, adev = 0, 0 > 0 is false
    assert(!got(("solo", Some(42L))))
  }

  test("approx spelling agrees with exact on well-separated data") {
    val base = (1 to 500).map(i => ("g", 100L + (i % 7)))
    val planted = Seq(("g", 100000L), ("g", -50000L))
    val df = (base ++ planted).toDF("k", "v").repartition(8)
    val exact = Outliers.madStats(df, "k", "v", k = 5)
      .head()
    val approx = Outliers.madStats(df, "k", "v", k = 5, exact = false)
      .head()
    assert(exact.getLong(4) == 2L)
    assert(approx.getLong(4) == 2L,
      "a 1000x-separated outlier must survive the sketch error bound")
  }

  test("shuffle-join spelling (broadcastStats = false) agrees with broadcast") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 1000L),
      ("b", 5L), ("b", 6L), ("b", 7L)).toDF("k", "v")
    val b = Outliers.madStats(df, "k", "v", k = 3)
      .collect().map(_.toSeq).toSet
    val s = Outliers.madStats(df, "k", "v", k = 3, broadcastStats = false)
      .collect().map(_.toSeq).toSet
    assert(b == s)
  }
}
