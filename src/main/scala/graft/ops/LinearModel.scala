package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed closed-form least squares — the trainable quality-scorer
  * primitive of a data-curation pipeline (fastText-style filters fit a
  * tiny model over cheap per-document features, then score the corpus;
  * reference analogue: the aesthetic-score gate of `dataruu/pipeline.py`
  * with a model TRAINED in-pipeline instead of fetched).
  *
  * Model: y ≈ β₀ + β₁x₁ + β₂x₂ over INTEGER features. The normal-equation
  * moments (9 sums of integer products) are exact BIGINTs computed in one
  * aggregation pass — map-side combine reduces the exchange to one partial
  * row per partition regardless of corpus size. The 3×3 Cramer solve runs
  * on those scalars INSIDE the plan (a one-row DataFrame broadcast back
  * over the corpus), so training + scoring is two narrow passes and zero
  * driver collects.
  *
  * Determinism contract: moments are integer-exact and order-free; the
  * solve converts them to doubles and evaluates a FIXED expression tree —
  * identical IEEE arithmetic in Spark and the DuckDB oracle (same
  * no-transcendentals discipline as [[Search.bm25Micro]]). Micro-unit
  * outputs via floor(x·10⁶ + 0.5) are therefore engine-exact.
  *
  * At extreme scale the BIGINT moments stay exact while Σx² stays below
  * 2⁶³ (≈10¹² documents at x ≤ 10³); past that, pre-scale the features —
  * the shape of the plan does not change.
  */
object LinearModel {

  private def momentAggs: Seq[Column] = Seq(
    count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
    sum(col("x1") * col("x1")).as("s11"),
    sum(col("x1") * col("x2")).as("s12"),
    sum(col("x2") * col("x2")).as("s22"),
    sum("y").as("sy"),
    sum(col("x1") * col("y")).as("s1y"),
    sum(col("x2") * col("y")).as("s2y"))

  /** One-row exact moment frame: n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy,
    * Σx₁y, Σx₂y — everything a 2-feature+intercept normal-equation solve
    * needs. Inputs must be integral columns. */
  def moments2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame =
    df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .agg(momentAggs.head, momentAggs.tail: _*)

  /** Per-group exact moments: one row per key tuple — a million segment
    * models cost ONE hash-aggregate pass with the same map-side combine
    * as the global fit. */
  def moments2ByGroup(df: DataFrame, keys: Seq[String], y: Column,
                      x1: Column, x2: Column): DataFrame =
    df.select(keys.map(col) ++ Seq(x1.cast("long").as("x1"),
        x2.cast("long").as("x2"), y.cast("long").as("y")): _*)
      .groupBy(keys.map(col): _*)
      .agg(momentAggs.head, momentAggs.tail: _*)

  /** Cramer determinants over the moment row(s): (keys…, det, det0, det1,
    * det2) where βᵢ = detᵢ/det. Fixed expression tree in doubles —
    * mirrored node for node by [[cramerSql]]. Key columns pass through,
    * so the same solve serves the global fit (no keys) and a
    * model-per-segment fit (one row per key tuple). */
  def cramer2(moments: DataFrame, passThrough: Seq[String] = Nil): DataFrame = {
    val m = moments.select(passThrough.map(col) ++ Seq(
      col("n").cast("double").as("a11"), col("s1").cast("double").as("a12"),
      col("s2").cast("double").as("a13"), col("s11").cast("double").as("a22"),
      col("s12").cast("double").as("a23"), col("s22").cast("double").as("a33"),
      col("sy").cast("double").as("b1"), col("s1y").cast("double").as("b2"),
      col("s2y").cast("double").as("b3")): _*)
    // symmetric A: a21 = a12, a31 = a13, a32 = a23
    m.select(passThrough.map(col) ++ Seq(
      (col("a11") * (col("a22") * col("a33") - col("a23") * col("a23"))
        - col("a12") * (col("a12") * col("a33") - col("a23") * col("a13"))
        + col("a13") * (col("a12") * col("a23") - col("a22") * col("a13"))).as("det"),
      (col("b1") * (col("a22") * col("a33") - col("a23") * col("a23"))
        - col("a12") * (col("b2") * col("a33") - col("a23") * col("b3"))
        + col("a13") * (col("b2") * col("a23") - col("a22") * col("b3"))).as("det0"),
      (col("a11") * (col("b2") * col("a33") - col("a23") * col("b3"))
        - col("b1") * (col("a12") * col("a33") - col("a23") * col("a13"))
        + col("a13") * (col("a12") * col("b3") - col("b2") * col("a13"))).as("det1"),
      (col("a11") * (col("a22") * col("b3") - col("b2") * col("a23"))
        - col("a12") * (col("a12") * col("b3") - col("b2") * col("a13"))
        + col("b1") * (col("a12") * col("a23") - col("a22") * col("a13"))).as("det2")): _*)
  }

  /** Fit on (y, x₁, x₂) and score every row: output = input plus
    * `pred_micro` and `resid_micro` (micro-quantized prediction and
    * residual). Training moments ride a broadcast one-row cross join —
    * the corpus is scanned twice (moments, scoring) and shuffled never.
    * CONTRACT: the design must be full-rank (each feature takes ≥ 2
    * values, features not collinear) — a singular A gives det = 0 and
    * null micro outputs, not an error. */
  def fitScore2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val coefs = cramer2(moments2(df, y, x1, x2))
    val pred = col("det0") / col("det") + col("det1") / col("det") * x1.cast("double") +
      col("det2") / col("det") * x2.cast("double")
    df.crossJoin(broadcast(coefs))
      .withColumn("pred_micro",
        floor(pred * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("resid_micro",
        floor((y.cast("double") - pred) * lit(1000000.0) + lit(0.5)).cast("long"))
      .drop("det", "det0", "det1", "det2")
  }

  /** Model-per-segment fit + score: one model per key tuple, trained in a
    * single grouped-moment pass and joined back on the keys. With few
    * segments the coefficient side broadcasts; with millions it is a
    * plain hash-equi-join on the group key — either way the corpus
    * shuffles at most once, on the key it is usually already
    * partitioned by. */
  def fitScore2ByGroup(df: DataFrame, keys: Seq[String], y: Column,
                       x1: Column, x2: Column,
                       broadcastCoefs: Boolean = true): DataFrame = {
    val coefs = cramer2(moments2ByGroup(df, keys, y, x1, x2), keys)
    val pred = col("det0") / col("det") + col("det1") / col("det") * x1.cast("double") +
      col("det2") / col("det") * x2.cast("double")
    df.join(if (broadcastCoefs) broadcast(coefs) else coefs, keys)
      .withColumn("pred_micro",
        floor(pred * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("resid_micro",
        floor((y.cast("double") - pred) * lit(1000000.0) + lit(0.5)).cast("long"))
      .drop("det", "det0", "det1", "det2")
  }

  // ---- DuckDB oracle spellings ----

  /** Moment CTE body over a frame exposing integer columns y, x1, x2. */
  val momentsSql: String =
    """count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
      |sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
      |sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y""".stripMargin

  /** Double-cast aliases mirroring [[cramer2]]'s input frame. */
  val castSql: String =
    """CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
      |CAST(s2 AS DOUBLE) AS a13, CAST(s11 AS DOUBLE) AS a22,
      |CAST(s12 AS DOUBLE) AS a23, CAST(s22 AS DOUBLE) AS a33,
      |CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
      |CAST(s2y AS DOUBLE) AS b3""".stripMargin

  /** Cramer determinants — node-for-node mirror of [[cramer2]]. */
  val cramerSql: String =
    """a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det,
      |b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3) + a13*(b2*a23 - a22*b3) AS det0,
      |a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13) + a13*(a12*b3 - b2*a13) AS det1,
      |a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13) + b1*(a12*a23 - a22*a13) AS det2""".stripMargin

  /** Per-row scoring exprs over (x1, x2, y) × the cramer frame. */
  def scoreSql(x1: String, x2: String, y: String): String = {
    val pred = s"det0/det + det1/det * CAST($x1 AS DOUBLE) + det2/det * CAST($x2 AS DOUBLE)"
    s"CAST(floor(($pred) * 1000000.0 + 0.5) AS BIGINT) AS pred_micro, " +
      s"CAST(floor((CAST($y AS DOUBLE) - ($pred)) * 1000000.0 + 0.5) AS BIGINT) AS resid_micro"
  }
}
