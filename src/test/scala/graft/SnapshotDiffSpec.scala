package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SnapshotDiff

/** Diff status law on random snapshot pairs: every key in either side
  * appears exactly once, with the status a sequential comparison of the
  * two maps assigns. */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val snapGen = Gen.chooseNum(0, 30).flatMap(n =>
    Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 20L)
      v <- Gen.oneOf("alpha", "beta", "gamma")
    } yield (k, v)).map(_.toMap))

  test("diff matches the sequential map comparison on random snapshots") {
    val prop = Prop.forAll(snapGen, snapGen) { (before, after) =>
      val got = SnapshotDiff.diff(
          before.toSeq.toDF("doc_id", "text"),
          after.toSeq.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = (before.keySet ++ after.keySet).map { k =>
        k -> ((before.get(k), after.get(k)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(b), Some(a)) if b == a => "same"
          case _ => "changed"
        })
      }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("null content diffs by presence, not hash nullity") {
    val before = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("doc_id", "text")
    val after = Seq((1L, "x"), (2L, null: String), (4L, null: String))
      .toDF("doc_id", "text")
    val got = SnapshotDiff.diff(before, after, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "same", 3L -> "removed",
      4L -> "added"))
  }

  test("diffCounts partitions the key universe") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val after = Seq((2L, "b"), (3L, "x"), (4L, "d")).toDF("doc_id", "text")
    val counts = SnapshotDiff.diffCounts(before, after, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("removed" -> 1L, "same" -> 1L, "changed" -> 1L,
      "added" -> 1L))
  }
}
