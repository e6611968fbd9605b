package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median / MAD (median absolute
  * deviation) and the Hampel-style cut `|x − med| > k·MAD` — the
  * curation-grade outlier gate (mean/stddev gates break on the very
  * outliers they hunt; the median/MAD pair has a 50% breakdown point).
  * Classic corpus uses: absurd document lengths, token-count spikes,
  * runaway perplexities.
  *
  * Two spellings, same interface:
  *  - `exact = true`: Spark's `percentile` — per-group exact interpolated
  *    median, bit-identical to the DuckDB `median` oracle (on integer
  *    inputs every value is an exact .0/.5 double, so the k·MAD compare
  *    is engine-portable with no rounding guard). Exact percentile holds
  *    each group's values on one executor — fine up to groups of tens of
  *    millions, NOT the 100 TB path.
  *  - `exact = false`: `approx_percentile` with a bounded error — constant
  *    memory per group (the KLL-style sketch), the spelling a 100 TB run
  *    uses. Same plan shape, no oracle (approximation is
  *    implementation-defined), spec-gated instead.
  *
  * Plan shape (both): two grouped aggregations over the value column and
  * two broadcast-joins of the tiny per-group stat tables back onto the
  * rows — the corpus shuffles on the group key once per median pass,
  * partial-aggregated; nothing is driver-side.
  */
object Outliers {

  private def med(c: Column, exact: Boolean, err: Double): Column =
    if (exact) percentile(c, lit(0.5))
    else approx_percentile(c, lit(0.5), lit(math.max(1, (1 / err).toInt)))

  /** Per-group `(key, n, median, mad, n_out)` for `|x − med| > k·MAD`.
    * Rows with null `valCol` are ignored (they carry no measurement).
    * `broadcastStats` (default) broadcasts the per-group stat tables —
    * right whenever group cardinality is bounded; set it false for
    * high-cardinality keys (per-domain over millions of domains) and the
    * joins fall back to hash-equi on the group key. */
  def madStats(df: DataFrame, keyCol: String, valCol: String, k: Int,
      exact: Boolean = true, err: Double = 0.001,
      broadcastStats: Boolean = true): DataFrame = {
    val hint = (d: DataFrame) => if (broadcastStats) broadcast(d) else d
    val rows = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("og_key"), col(valCol).as("og_v"))
    val meds = rows.groupBy(col("og_key"))
      .agg(med(col("og_v"), exact, err).as("og_med"))
    val dev = rows.join(hint(meds), "og_key")
      .withColumn("og_adev", abs(col("og_v") - col("og_med")))
    val mads = dev.groupBy(col("og_key"))
      .agg(med(col("og_adev"), exact, err).as("og_mad"))
    dev.join(hint(mads), "og_key")
      .groupBy(col("og_key"))
      .agg(count(lit(1)).as("n"),
        max(col("og_med")).as("median"),
        max(col("og_mad")).as("mad"),
        sum(when(col("og_adev") > lit(k.toDouble) * col("og_mad"), lit(1L))
          .otherwise(lit(0L))).as("n_out"))
      .withColumnRenamed("og_key", keyCol)
  }

  /** Row-level gate: the input plus `(median, mad, is_outlier)` — the
    * form a pipeline filters on (`!is_outlier`). Same two-pass stats as
    * [[madStats]]. */
  def flagOutliers(df: DataFrame, keyCol: String, valCol: String, k: Int,
      exact: Boolean = true, err: Double = 0.001,
      broadcastStats: Boolean = true): DataFrame = {
    val hint = (d: DataFrame) => if (broadcastStats) broadcast(d) else d
    val meds = df.filter(col(valCol).isNotNull).groupBy(col(keyCol))
      .agg(med(col(valCol), exact, err).as("og_med"))
    val dev = df.join(hint(meds), Seq(keyCol), "left")
      .withColumn("og_adev", abs(col(valCol) - col("og_med")))
    val mads = dev.filter(col("og_adev").isNotNull).groupBy(col(keyCol))
      .agg(med(col("og_adev"), exact, err).as("og_mad"))
    dev.join(hint(mads), Seq(keyCol), "left")
      .withColumn("is_outlier",
        coalesce(col("og_adev") > lit(k.toDouble) * col("og_mad"), lit(false)))
      .withColumnRenamed("og_med", "median").withColumnRenamed("og_mad", "mad")
      .drop("og_adev")
  }
}
