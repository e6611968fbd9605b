package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

/** Profile contract: nulls counted not crashed, exact distincts,
  * partition-invariant values. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, Some(10L), Some("aa")), (2L, None, Some("bb")),
    (3L, Some(30L), None), (4L, Some(30L), Some("aa")))

  private def run(nPart: Int): Map[(String, String), Long] =
    Profile.profile(
        rows.toDF("id", "v", "s").repartition(nPart),
        longCols = Seq("id", "v"), strCols = Seq("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  test("metrics: nulls counted, distinct exact, ranges over non-null") {
    val m = run(2)
    assert(m(("_table", "rows")) == 4L)
    assert(m(("v", "n_null")) == 1L && m(("v", "min")) == 10L &&
      m(("v", "max")) == 30L && m(("v", "sum")) == 70L)
    assert(m(("s", "n_null")) == 1L && m(("s", "n_distinct")) == 2L &&
      m(("s", "min_len")) == 2L && m(("s", "max_len")) == 2L)
  }

  test("partitioning does not change any metric") {
    assert(run(1) == run(4))
  }
}
