package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Expectations
import graft.ops.Expectations._

/** The declarative quality gate: exact violation counts on planted
  * defects, empty-input semantics, and the one-pass guarantee for scalar
  * rules (adding rules must not add corpus scans). */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, rules: Seq[Rule]) =
    Expectations.check(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("each rule counts exactly its planted violations") {
    val df = Seq[(java.lang.Long, String, String)](
      (1L, "a", "en"), (2L, null, "fr"), (3L, "c", "xx"),
      (null, "d", "en"), (5L, "e", null), (1L, "f", "en"), (1L, "g", "fr"))
      .toDF("id", "body", "lang")
    val got = report(df, Seq(
      NotNull("id"), NotNull("body"),
      InRange("id", 1L, 4L),
      InSet("lang", Seq("en", "fr")),
      MinRows(10L), Unique(Seq("id"))))
    assert(got == Map(
      "not_null(id)" -> ((1L, false)),
      "not_null(body)" -> ((1L, false)),
      // null id + id=5 out of range
      "in_range(id,1,4)" -> ((2L, false)),
      // null lang + 'xx'
      "in_set(lang)" -> ((2L, false)),
      "min_rows(10)" -> ((3L, false)),
      // id=1 appears 3 times -> 2 surplus rows
      "unique(id)" -> ((2L, false))))
  }

  test("clean input is all-ok; empty input fails only MinRows") {
    val clean = Seq((1L, "en"), (2L, "fr")).toDF("id", "lang")
    val rules = Seq[Rule](NotNull("id"), InRange("id", 1L, 9L),
      InSet("lang", Seq("en", "fr")), MinRows(2L), Unique(Seq("id")))
    assert(report(clean, rules).values.forall { case (v, ok) => v == 0L && ok })

    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      clean.schema)
    val got = report(empty, rules)
    assert(got("min_rows(2)") == ((2L, false)))
    assert((got - "min_rows(2)").values.forall { case (v, ok) => v == 0L && ok })
  }

  test("scalar rules share ONE aggregation pass over the input") {
    val df = Seq((1L, "en"), (2L, "fr")).toDF("id", "lang")
    val plan = Expectations.check(df, Seq(NotNull("id"),
        InRange("id", 1L, 9L), InSet("lang", Seq("en")), MinRows(1L)))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(scans.length == 1, s"expected one scan, got:\n$plan")
    assert(aggs.length == 1, s"expected one aggregate, got:\n$plan")
  }

  test("multi-column uniqueness keys on the tuple, not the columns") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "a")).toDF("k1", "k2")
    val got = report(df, Seq(Unique(Seq("k1", "k2"))))
    assert(got == Map("unique(k1,k2)" -> ((1L, false))))
  }
}
