package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the data-card stats sheet every corpus release
  * ships (null rates, cardinalities, ranges): one aggregation pass over
  * the table produces a long-format (col_name, metric, value) frame.
  *
  * All metrics are integral (counts, distincts, integer min/max/sum) so
  * the profile is engine-exact and release-diffable ([[SnapshotDiff]] on
  * two profiles is the "what changed statistically" audit). One
  * hash-aggregate with map-side combine, then an explode of the single
  * result row — profiling 100 TB costs one scan, no shuffle beyond the
  * one-row partials. `count_distinct` is exact (one expression per
  * column in the same pass); swap `approx_count_distinct` at extreme
  * cardinalities — the frame shape does not change.
  */
object Profile {

  /** Profile `longCols` (min/max/sum/n_null) and `strCols`
    * (n_distinct/n_null/min_len/max_len) plus the row count, in one
    * pass. */
  def profile(df: DataFrame, longCols: Seq[String],
              strCols: Seq[String]): DataFrame = {
    require((longCols ++ strCols).nonEmpty, "nothing to profile")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("m_rows")) ++
      longCols.flatMap { c => Seq(
        sum(col(c).isNull.cast("long")).as(s"m_${c}_n_null"),
        min(col(c)).cast("long").as(s"m_${c}_min"),
        max(col(c)).cast("long").as(s"m_${c}_max"),
        sum(col(c)).cast("long").as(s"m_${c}_sum"))
      } ++
      strCols.flatMap { c => Seq(
        sum(col(c).isNull.cast("long")).as(s"m_${c}_n_null"),
        count_distinct(col(c)).as(s"m_${c}_n_distinct"),
        min(length(col(c))).cast("long").as(s"m_${c}_min_len"),
        max(length(col(c))).cast("long").as(s"m_${c}_max_len"))
      }
    val metricNames: Seq[(String, String, String)] =
      (("_table", "rows", "m_rows") +:
        (longCols.flatMap { c => Seq("n_null", "min", "max", "sum")
          .map(m => (c, m, s"m_${c}_$m")) } ++
         strCols.flatMap { c => Seq("n_null", "n_distinct", "min_len", "max_len")
          .map(m => (c, m, s"m_${c}_$m")) }))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(metricNames.map { case (c, m, f) =>
        struct(lit(c).as("col_name"), lit(m).as("metric"),
          col(f).as("value"))
      }: _*)).as("r"))
      .select(col("r.col_name").as("col_name"), col("r.metric").as("metric"),
        col("r.value").as("value"))
  }
}
