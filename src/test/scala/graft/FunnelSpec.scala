package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

/** Funnel semantics vs a sequential greedy-chain oracle on random event
  * streams: per user, walk events in time order, advancing one step each
  * time the current step's predicate matches strictly after the previous
  * step's match. Greedy-earliest is provably optimal for a fixed step
  * order, so the oracle is exact. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Ev(user: Long, ts: Long, typ: String)

  private val evGen = for {
    u <- Gen.chooseNum(1L, 6L)
    ts <- Gen.chooseNum(0L, 500L)
    t <- Gen.oneOf("a", "b", "c", "x")
  } yield Ev(u, ts, t)

  /** Earliest-chain oracle: first a, then first b after it, then first c
    * after that. Returns per-user reached stage count (0..3). */
  private def oracle(evs: Seq[Ev]): Map[Int, Long] = {
    val steps = Seq("a", "b", "c")
    val reached = evs.groupBy(_.user).values.map { es =>
      val sorted = es.sortBy(_.ts)
      var stage = 0
      var lastTs = Long.MinValue
      steps.foreach { st =>
        if (stage == steps.indexOf(st)) {
          // min ts of matching events strictly after lastTs
          val hit = sorted.filter(e => e.typ == st &&
            (stage == 0 || e.ts > lastTs)).map(_.ts).minOption
          hit.foreach { h => stage += 1; lastTs = h }
        }
      }
      stage
    }.toSeq
    (1 to 3).map(s => s -> reached.count(_ >= s).toLong).toMap
  }

  test("funnelCounts matches the greedy-chain oracle on random streams") {
    val prop = Prop.forAll(
      Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, evGen)),
      Gen.chooseNum(1, 5)) { (evs, nPart) =>
      // duplicate-ts collisions within a user+type collapse to one min —
      // handled identically by both sides; keep them in the generator
      val df = evs.map(e => (e.user, new Timestamp(e.ts), e.typ))
        .toDF("user_id", "ts", "typ").repartition(nPart)
      val got = Funnel.funnelCounts(df, "user_id", "ts", Seq(
          "a" -> (col("typ") === "a"), "b" -> (col("typ") === "b"),
          "c" -> (col("typ") === "c")))
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      got == oracle(evs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming counts of an empty stage table are 0, not null") {
    val empty = Seq.empty[(Long, Int)].toDF("user_id", "stage")
    val got = graft.streaming.FunnelStream.countsFromStages(empty, Seq("a", "b"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 0L), (2, 0L)))
  }

  test("strictly-after semantics: same-timestamp step events do not chain") {
    val df = Seq((1L, new Timestamp(10L), "a"), (1L, new Timestamp(10L), "b"),
        (2L, new Timestamp(10L), "a"), (2L, new Timestamp(11L), "b"))
      .toDF("user_id", "ts", "typ")
    val got = Funnel.funnelCounts(df, "user_id", "ts", Seq(
        "a" -> (col("typ") === "a"), "b" -> (col("typ") === "b")))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 2L, 2 -> 1L))
  }

  test("stepTimes: one row per step-1 user, nulls from first missed step") {
    val df = Seq((1L, new Timestamp(1L), "a"), (1L, new Timestamp(2L), "c"),
        (3L, new Timestamp(5L), "b"))
      .toDF("user_id", "ts", "typ")
    val rows = Funnel.stepTimes(df, "user_id", "ts", Seq(
        "a" -> (col("typ") === "a"), "b" -> (col("typ") === "b"),
        "c" -> (col("typ") === "c")))
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && !r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
