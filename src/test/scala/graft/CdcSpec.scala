package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cdc

/** [[graft.ops.Cdc]] changelog-compaction semantics, including the
  * window-spelling equivalence the q131 oracle relies on and the
  * base+log incremental refresh. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, seq, op, value): op 'd' = delete tombstone
  private def log(rows: (Long, Long, String, Double)*) =
    rows.toDF("k", "seq", "op", "v")

  test("compact: latest op wins; tombstone-latest keys are absent") {
    val l = log(
      (1L, 1L, "u", 10.0), (1L, 3L, "u", 30.0), (1L, 2L, "u", 20.0),
      (2L, 1L, "u", 1.0), (2L, 2L, "d", 0.0),
      (3L, 2L, "u", 5.0), (3L, 1L, "d", 0.0))
    val out = Cdc.compact(l, Seq("k"), Seq(col("seq")),
        col("op") === "d", Seq("v" -> col("v")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // key 1: seq 3 wins; key 2: delete is latest → gone; key 3: delete
    // is OLDER than the upsert → row lives
    assert(out === Array((1L, 3L, 30.0), (3L, 2L, 5.0)))
  }

  test("compact: multi-column keys and multi-column sequence") {
    val l = Seq(
      (1L, "a", 1L, 5L, "u", 1.0),
      (1L, "a", 1L, 9L, "u", 2.0), // same ts, higher tiebreak → wins
      (1L, "b", 2L, 0L, "d", 0.0))
      .toDF("k1", "k2", "ts", "off", "op", "v")
    val out = Cdc.compact(l, Seq("k1", "k2"), Seq(col("ts"), col("off")),
        col("op") === "d", Seq("v" -> col("v")))
      .orderBy("k1", "k2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out === Array((1L, "a", 1L, 9L, 2.0)))
  }

  test("compact ≡ rank-window spelling on a random log") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(40).toLong, i.toLong,
        if (rnd.nextInt(5) == 0) "d" else "u", rnd.nextInt(100).toDouble)
    }
    val l = log(rows: _*)
    val agg = Cdc.compact(l, Seq("k"), Seq(col("seq")),
        col("op") === "d", Seq("v" -> col("v")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").desc)
    val win = l.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("k"), col("seq").as("seq0"), col("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(agg === win)
  }

  test("applyLog: base rows lose collisions, survive non-collisions, die on tombstones") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val l = log((1L, 5L, "u", 11.0), (3L, 5L, "d", 0.0), (4L, 5L, "u", 40.0))
    val out = Cdc.applyLog(base, l, Seq("k"), Seq("seq"), Seq(lit(Long.MinValue)),
        col("op") === "d", Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out === Array((1L, 11.0), (2L, 20.0), (4L, 40.0)))
  }

  test("compact at 90%-one-key skew: map-side partial collapses the hot key") {
    // r8 verdict #6: the scaladoc claims the max(struct) partial agg means
    // "each map task emits at most one row per local key BEFORE the
    // exchange" — measure it on the changelog shape where that claim
    // matters most: 200k log rows, 90% of them updates to ONE hot key
    // (a Debezium topic mirroring one hot entity). A window spelling
    // would funnel all 180k hot-key rows through one reducer task.
    val n = 200000L
    val log = spark.range(0, n).select(
      when(col("id") % 10 === 0, pmod(expr("id div 10"), lit(40L)) + 1)
        .otherwise(lit(0L)).as("k"), // 90% key 0, rest spread over 1..40
      col("id").as("seq"),
      when(col("id") % 97 === 0, lit("d")).otherwise(lit("u")).as("op"),
      (col("id") % 1000).cast("double").as("v"))
      .repartition(8) // fixed map-task count for the bound
    val (out, w, _, maxTask) = ShuffleMetrics.measure(spark) {
      Cdc.compact(log, Seq("k"), Seq(col("seq")),
        col("op") === "d", Seq("v" -> col("v"))).collect()
    }
    // correctness at skew: byte-for-byte the window spelling's answer
    // (computed outside the measured block)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").desc)
    val expected = log.withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("k"), col("seq"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq === expected.toSeq)
    assert(out.exists(_.getLong(0) == 0L), "hot key must survive")
    // the repartition itself shuffles all n rows; the compact exchange on
    // top of it must move only per-(task, key) winners: ≤ 41 keys × 8 maps
    val aggRows = w - n
    assert(aggRows <= 41L * 8L,
      s"compact exchange moved $aggRows rows; partial agg should cap at ${41 * 8}")
    // and no single task reads anything like the hot key's 180k history
    assert(maxTask < n / 2,
      s"one task read $maxTask rows — hot-key history leaked through the exchange")
    println(s"""{"scale_invariants":{"cdc_skew_exchange_rows":$aggRows,"cdc_skew_bound":${41 * 8}}}""")
  }

  test("compact plan: partial aggregation below the exchange (map-side combine)") {
    val l = log((1L, 1L, "u", 1.0))
    val plan = Cdc.compact(l, Seq("k"), Seq(col("seq")),
      col("op") === "d", Seq("v" -> col("v")))
      .queryExecution.executedPlan.toString.toLowerCase
    // partial max(struct) BELOW the exchange (struct buffers take the
    // SortAggregate path — still partial/final, each map task emits one
    // row per local key), and no Window operator anywhere
    assert(plan.contains("partial_max"))
    assert(plan.indexOf("partial_max") > plan.indexOf("exchange"),
      "partial aggregate must be below the exchange")
    assert(!plan.contains("window"))
  }
}
