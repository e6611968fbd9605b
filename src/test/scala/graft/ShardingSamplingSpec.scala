package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Hashing, Mixture, Sharding, Similarity}

/** Rendezvous sharding ([[graft.ops.Sharding]]), A-ES weighted sampling
  * ([[graft.ops.Mixture.weightedSample]]), and SQ8 scalar quantization
  * ([[graft.ops.Similarity.sq8Encode]]) semantics. */
class ShardingSamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- HRW sharding ----

  test("hrwShard: in range, deterministic, and narrow (no exchange)") {
    val df = (1L to 2000L).toDF("id")
      .select(col("id"), Sharding.hrwShard(col("id"), 8).as("shard"))
    val shards = df.select(col("shard")).distinct().as[Long].collect().sorted
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(shards.length === 8, "2000 ids should hit all 8 shards")
    // narrow: the assignment itself must plan without any exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hrwShard shuffled:\n$plan")
  }

  test("hrwShard: n→n−1 moves ONLY the drained shard's docs (~1/n)") {
    val n = 5000L
    val moved = (1L to n).toDF("id")
      .select(col("id"), Sharding.hrwShard(col("id"), 8).as("s8"),
        Sharding.hrwShard(col("id"), 7).as("s7"))
      .filter(col("s8") =!= col("s7"))
      .select(col("s8")).as[Long].collect()
    // minimal movement: every moved doc came from the removed shard 7
    assert(moved.forall(_ == 7L), "a doc moved between surviving shards")
    // and the drained fraction is ~1/8 (binomial, generous bounds)
    assert(moved.length > n / 8 / 2 && moved.length < n / 8 * 2,
      s"moved ${moved.length} of $n")
  }

  test("hrwShard: balance — no shard takes more than 2x the fair share") {
    val counts = (1L to 8000L).toDF("id")
      .select(Sharding.hrwShard(col("id"), 8).as("shard"))
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    counts.values.foreach(c => assert(c < 2000, s"skewed: $counts"))
  }

  // ---- A-ES weighted sampling ----

  test("weightedSample: heap operator equals the window spelling exactly") {
    val docs = (1L to 500L).map(i => (i, s"g${i % 3}", 1L + i % 17))
      .toDF("id", "grp", "w")
    val got = Mixture.weightedSample(docs, "id", "w", 10, Seq("grp"))
      .select(col("grp"), col("id")).as[(String, Long)].collect().toSet
    val key = pow((Hashing.hash31(col("id").cast("string")) + lit(0.5)) /
      lit(Hashing.P31.toDouble), lit(1.0) / col("w").cast("double"))
    val win = Window.partitionBy(col("grp")).orderBy(col("k").desc, col("id"))
    val want = docs.withColumn("k", key)
      .withColumn("rn", row_number().over(win)).filter(col("rn") <= 10)
      .select(col("grp"), col("id")).as[(String, Long)].collect().toSet
    assert(got === want)
    assert(got.size === 30)
  }

  test("weightedSample: drops non-positive weights, keeps all when k >= group") {
    val docs = Seq((1L, "a", 5L), (2L, "a", 0L), (3L, "a", -2L), (4L, "a", 1L))
      .toDF("id", "grp", "w")
    val got = Mixture.weightedSample(docs, "id", "w", 10, Seq("grp"))
      .select(col("id")).as[Long].collect().toSet
    assert(got === Set(1L, 4L))
  }

  test("weightedSample: weights bias inclusion (heavy minority usually wins)") {
    // 10 heavy docs (w=1000) among 500 light (w=1): a 20-doc sample
    // should catch most of the heavy ones; unweighted would catch ~0.4
    val docs = (1L to 510L).map(i => (i, "g", if (i <= 10) 1000L else 1L))
      .toDF("id", "grp", "w")
    val kept = Mixture.weightedSample(docs, "id", "w", 20, Seq("grp"))
      .filter(col("id") <= 10).count()
    assert(kept >= 7, s"only $kept of 10 heavy docs sampled")
  }

  // ---- SQ8 scalar quantization ----

  test("sq8Encode: codes in [0,255]; decode error within half a step") {
    val dim = 8
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i =>
      (i, Seq.fill(dim)(rnd.nextDouble() * 4 - 2))).toDF("vec_id", "ev")
    val stats = Similarity.sq8Stats(vecs)
    val st = stats.orderBy("pos").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val codes = Similarity.sq8Encode(vecs, stats, dim)
      .orderBy("vec_id").collect().map(_.getSeq[Long](1))
    val raw = vecs.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    for ((cv, xv) <- codes.zip(raw); d <- 0 until dim) {
      val c = cv(d)
      assert(c >= 0 && c <= 255, s"code $c out of range")
      val (mn, mx) = st(d)
      val step = (mx - mn) / 255.0
      val decoded = mn + c * step
      assert(math.abs(decoded - xv(d)) <= step / 2 + 1e-9,
        s"dim $d: decode off by ${math.abs(decoded - xv(d))} vs step $step")
    }
  }

  test("sq8Encode: degenerate constant dimension encodes 0") {
    val vecs = Seq((1L, Seq(3.5, 1.0)), (2L, Seq(3.5, 2.0))).toDF("vec_id", "ev")
    val codes = Similarity.sq8Encode(vecs, Similarity.sq8Stats(vecs), 2)
      .orderBy("vec_id").collect().map(_.getSeq[Long](1))
    assert(codes.forall(_.head === 0L))
    assert(codes.map(_(1)).toSet === Set(0L, 255L))
  }
}
