package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scd2

/** SCD2 intervalization: island collapse semantics, equivalence with the
  * two-shuffle groupBy spelling, and the one-exchange plan contract. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // key 1: A A B A (collapse the AA run, reopen A later)
  // key 2: single event; key 3: null state then real state
  private def changes = Seq(
    (1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"),
    (1L, 30L, 102L, "B"), (1L, 40L, 103L, "A"),
    (2L, 15L, 104L, "X"),
    (3L, 5L, 105L, null.asInstanceOf[String]), (3L, 6L, 106L, "C")
  ).toDF("k", "ord", "eid", "state")

  test("islands collapse and intervals chain [from, to)") {
    val out = Scd2.intervalize(changes, Seq("k"), "ord", "eid", Seq("state"))
      .select("k", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out === Seq(
      (1L, "A", 10L, Some(30L), false),  // AA collapsed, ends at B
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),        // A reopens — NOT merged with row 1
      (2L, "X", 15L, None, true),
      (3L, null, 5L, Some(6L), false),   // null state is a real island
      (3L, "C", 6L, None, true)))
  }

  test("equivalence with the groupBy island spelling on the events table") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val fast = Scd2.intervalize(ev, Seq("user_id"), "ts", "event_id", Seq("event_type"))
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
    // classic spelling: change flag → running island id → min per island
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val naive0 = ev
      .withColumn("chg", when(!(col("event_type") <=> lag(col("event_type"), 1).over(w)), 1L).otherwise(0L))
      .withColumn("isl", sum(col("chg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("isl"))
      .agg(first(col("event_type")).as("event_type"), min(col("ts")).as("valid_from"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("valid_from"))
    val naive = naive0
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
  }

  test("one shuffle: both windows reuse the key partitioning") {
    val out = Scd2.intervalize(changes, Seq("k"), "ord", "eid", Seq("state"))
    out.collect() // materialize so AQE finalizes the plan
    // the adaptive plan's toString appends "== Initial Plan ==" — count
    // exchanges in the final section only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange (?!SinglePartition)".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("a caller column named like the working column cannot corrupt results") {
    // non-tracked columns are projected away; a clash-named one must not
    // shadow the internal lag column and change the island detection
    val clash = changes.withColumn("scd_prev", lit("clash"))
    val plainRows = Scd2.intervalize(changes, Seq("k"), "ord", "eid", Seq("state"))
      .select("k", "state", "valid_from", "valid_to", "is_current")
    val clashRows = Scd2.intervalize(clash, Seq("k"), "ord", "eid", Seq("state"))
      .select("k", "state", "valid_from", "valid_to", "is_current")
    assert(clashRows.exceptAll(plainRows).count() === 0)
    assert(plainRows.exceptAll(clashRows).count() === 0)
  }
}
