package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PrefixSum

/** Two-phase grouped prefix sum vs the naive unbounded window — value
  * equivalence (bit-identical integer sums) and the scale contract: no
  * window in the plan partitions on the group column alone over the full
  * row stream, so a dominant group cannot serialize through one task. */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One dominant group (the "English = most of the corpus" shape), two
    * small ones; sparse non-contiguous ids crossing bucket boundaries. */
  private def skewed = (1 to 3000).map { i =>
    val grp = if (i % 10 == 0) (if (i % 20 == 0) "ja" else "fr") else "en"
    (i.toLong * 7 + (i % 3), grp, (i % 50).toLong + 1)
  }.toDF("doc_id", "lang", "n_toks")

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pre", sum("n_toks").over(w) - col("n_toks"))
  }

  test("equivalent to the unbounded window, across bucket widths") {
    val expected = naive(skewed).select("doc_id", "lang", "n_toks", "pre")
    for (width <- Seq(1L, 64L, 4096L, 1000000L)) {
      val got = PrefixSum.exclusiveRunningSum(
        skewed, "lang", "doc_id", "n_toks", "pre", width)
        .select("doc_id", "lang", "n_toks", "pre")
      assert(got.exceptAll(expected).count() === 0, s"width=$width")
      assert(expected.exceptAll(got).count() === 0, s"width=$width")
    }
  }

  test("no full-stream window partitions by the group alone") {
    val df = PrefixSum.exclusiveRunningSum(
      skewed, "lang", "doc_id", "n_toks", "pre", 64L)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      if (w.partitionSpec.length == 1) {
        // the offsets window: must read an aggregate (the subtotal table,
        // ~rows/bucketWidth rows), never the raw row stream
        val overAggregate = w.child.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.isDefined
        assert(overAggregate,
          s"single-key window over non-aggregated input:\n$w")
      } else {
        // the in-bucket window: (group, bucket) keys → bounded groups
        assert(w.partitionSpec.length == 2)
      }
    }
  }

  test("property: ≡ naive window on random skewed, sparse, negative ord keys") {
    import org.scalacheck.Gen
    val gen = for {
      grp <- Gen.frequency((8, Gen.const("en")), (1, Gen.const("fr")),
        (1, Gen.oneOf("ja", "de", "pt")))
      // sparse across the full long range, including negatives — the
      // bucket id (ord div width) goes negative and the zero-straddling
      // bucket is wider than `width` (trunc vs floor division); both must
      // be invisible in the result
      ord <- Gen.chooseNum(-4611686018427387904L, 4611686018427387903L)
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (ord, grp, v)
    val sampled = Iterator.continually(gen.sample).flatten.take(2500).toSeq
    // enforce the documented contract: ord unique within its group
    val rows = sampled.groupBy(t => (t._2, t._1)).values.map(_.head).toSeq ++
      Seq((Long.MinValue, "en", 5L), (Long.MaxValue, "en", -5L), (0L, "fr", 0L))
    val df = rows.toDF("doc_id", "lang", "n_toks")
    val expected = naive(df).select("doc_id", "lang", "n_toks", "pre")
    for (width <- Seq(1L, 7L, 4096L, 1000000007L, Long.MaxValue)) {
      val got = PrefixSum.exclusiveRunningSum(
        df, "lang", "doc_id", "n_toks", "pre", width)
        .select("doc_id", "lang", "n_toks", "pre")
      assert(got.exceptAll(expected).count() === 0, s"width=$width")
      assert(expected.exceptAll(got).count() === 0, s"width=$width")
    }
  }

  test("caller columns named like the working columns are not clobbered") {
    // ps_b / ps_off / ps_t are the operator's internal names — a caller
    // frame already carrying them must come through untouched (the
    // operator uniquifies; ADVICE r7: withColumn would silently replace)
    val df = Seq((1L, "en", 2L, 77L, 88L, 99L), (5L, "en", 3L, 70L, 80L, 90L),
        (2L, "fr", 4L, 7L, 8L, 9L))
      .toDF("doc_id", "lang", "n_toks", "ps_b", "ps_off", "ps_t")
    val out = PrefixSum.exclusiveRunningSum(
      df, "lang", "doc_id", "n_toks", "pre")
    assert(out.columns.count(_ == "ps_b") === 1)
    val got = out.orderBy("doc_id")
      .select("doc_id", "ps_b", "ps_off", "ps_t", "pre")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 77L, 88L, 99L, 0L), (2L, 7L, 8L, 9L, 0L),
      (5L, 70L, 80L, 90L, 2L)))
  }

  test("empty input and single-row groups") {
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "n_toks")
    assert(PrefixSum.exclusiveRunningSum(
      empty, "lang", "doc_id", "n_toks", "pre").count() === 0)
    val single = Seq((5L, "en", 7L), (9L, "fr", 3L)).toDF("doc_id", "lang", "n_toks")
    val out = PrefixSum.exclusiveRunningSum(
        single, "lang", "doc_id", "n_toks", "pre")
      .select("lang", "pre").as[(String, Long)].collect().toMap
    assert(out === Map("en" -> 0L, "fr" -> 0L))
  }
}
