package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HeavyHitters
import graft.plans.MgSketch

/** Misra–Gries invariants under Spark's real partial/final merge tree:
  * random weighted streams, random partition counts, small capacities.
  *   (1) superset: every term with true weight > W/(k+1) survives;
  *   (2) undercount-only, bounded: est ≤ true and (true−est)(k+1) ≤ W;
  *   (3) the two-pass heavyHitters answer EQUALS the exact group-by
  *       heavy set (the operator's whole contract).
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val itemGen = for {
    t <- Gen.frequency(6 -> Gen.oneOf("hh1", "hh2", "hh3"),
      4 -> Gen.oneOf((1 to 40).map(i => s"t$i")))
    w <- Gen.chooseNum(1L, 5L)
  } yield (t, w)

  test("sketch superset + bounded-undercount invariants on random streams") {
    val prop = Prop.forAll(
      Gen.chooseNum(10, 120).flatMap(n => Gen.listOfN(n, itemGen)),
      Gen.chooseNum(2, 8), Gen.chooseNum(1, 6)) { (stream, k, nPart) =>
      val df = stream.toDF("term", "w").repartition(nPart)
      val sk = df.agg(MgSketch.sketch(col("term"), col("w"), k).as("sk"))
        .select(explode(col("sk")).as("c"))
        .select(col("c.term"), col("c.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = stream.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val w = stream.map(_._2).sum
      val supersetOk = exact.forall { case (t, c) =>
        c * (k + 1) <= w || sk.contains(t) }
      val boundOk = sk.forall { case (t, est) =>
        val tru = exact(t)
        est <= tru && (tru - est) * (k + 1) <= w
      }
      val capOk = sk.size <= k
      supersetOk && boundOk && capOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("two-pass heavy hitters equals the exact heavy set") {
    val prop = Prop.forAll(
      Gen.chooseNum(20, 150).flatMap(n => Gen.listOfN(n, itemGen)),
      Gen.chooseNum(1, 6)) { (stream, nPart) =>
      val df = stream.toDF("term", "w").repartition(nPart)
      // threshold 1/8 of total weight, capacity exactly at the window edge
      val got = HeavyHitters.heavyHitters(df, "term", k = 7, num = 1L,
          den = 8L, weight = col("w"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val w = stream.map(_._2).sum
      val expected = stream.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter { case (_, c) => c * 8 > w }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("recount pass broadcasts the candidate set (no full-stream shuffle join)") {
    val df = (1 to 50).map(i => (s"t${i % 5}", 1L)).toDF("term", "w")
    val hh = HeavyHitters.heavyHitters(df, "term", k = 10, num = 1L, den = 8L,
      weight = col("w"))
    val plan = hh.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast candidate join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"stream must not shuffle-join:\n$plan")
  }

  test("threshold below the MG guarantee window is rejected") {
    val df = Seq(("a", 1L)).toDF("term", "w")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, "term", k = 5, num = 1L, den = 8L)
    }
  }

  test("grouped heavy hitters equal per-group exact heavy sets") {
    val prop = Prop.forAll(
      Gen.chooseNum(20, 120).flatMap(n => Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2", "g3")
        tw <- itemGen
      } yield (g, tw._1, tw._2))),
      Gen.chooseNum(1, 5)) { (stream, nPart) =>
      val df = stream.toDF("grp", "term", "w").repartition(nPart)
      val got = HeavyHitters.heavyHittersByGroup(df, Seq("grp"), "term",
          k = 7, num = 1L, den = 8L, weight = col("w"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val expected = stream.groupBy(_._1).flatMap { case (g, rows) =>
        val w = rows.map(_._3).sum
        rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .filter { case (_, c) => c * 8 > w }
          .map { case (t, c) => (g, t) -> c }
      }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("non-positive weights are ignored by BOTH passes (exactness holds)") {
    // k=1: the sketch must evict; if the recount included the -4 row the
    // candidate set and the "exact" filter would disagree with naive
    // GROUP BY over positive weights
    val df = Seq(("a", 5L), ("a", -4L), ("b", 3L), ("b", 0L))
      .toDF("term", "w").repartition(2)
    val got = HeavyHitters.heavyHitters(df, "term", k = 3, num = 1L,
        den = 4L, weight = col("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // positive-weight stream: a=5, b=3, W=8; threshold W/4=2 -> both
    assert(got == Map("a" -> 5L, "b" -> 3L))
  }

  test("sketch serialization round-trips terms past the writeUTF limit") {
    val big = "x" * 70000 // > 64 KB modified-UTF-8
    val df = (Seq.fill(5)(big) ++ Seq("small")).toDF("term")
      .repartition(3) // force partial-buffer serialization across tasks
    val got = df.agg(MgSketch.sketch(col("term"), lit(1L), 4).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.term"), col("c.est"))
      .collect().map(r => r.getString(0).length -> r.getLong(1)).toMap
    assert(got(70000) == 5L)
  }

  test("unit-weight defaults and null terms are ignored") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
      .toDF("term")
    val got = HeavyHitters.heavyHitters(df.filter(col("term").isNotNull),
        "term", k = 4, num = 1L, den = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L)))
  }
}
