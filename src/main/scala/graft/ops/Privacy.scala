package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy gates for training corpora, beyond the per-cell scrubbing of
  * [[TextAnalysis.redactPii]]: group-level suppression in the
  * k-anonymity family (Sweeney, IJUFKS'02) — a row is releasable only
  * if its quasi-identifier combination is shared by ≥ k rows, so no
  * record is re-identifiable by those attributes alone.
  *
  * Scale shape: one hash aggregation on the quasi-identifier key with
  * map-side combine, then one equi-join of the (small, group-level)
  * verdict back onto the rows — the corpus shuffles once on the key.
  * AQE broadcasts the verdict side when the group count is small.
  */
object Privacy {

  /** Rows whose quasi-identifier group has ≥ k members; all input
    * columns pass through unchanged. NULL quasi-identifier values
    * group together (a null combination is itself identifying). */
  def kAnonymous(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    // uniquified working prefix — a caller column literally named
    // ka_<quasi> must not collide with the verdict side's join keys
    val pfx = Iterator.from(0).map(i => s"ka${i}_")
      .find(p => !df.columns.exists(_.startsWith(p))).get
    val keys = quasiCols.map(col)
    val ok = df.groupBy(keys: _*).agg(count(lit(1)).as(s"${pfx}n"))
      .filter(col(s"${pfx}n") >= k)
      .select(quasiCols.map(c => col(c).as(s"$pfx$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"$pfx$c")).reduce(_ && _)
    df.join(ok, cond).select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-group suppression report: every quasi-identifier combination
    * with its size and whether it survives the k gate — the audit
    * artifact a release process files alongside the corpus. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("released", (col("n") >= k).cast("long"))

  /** Distinct l-diversity (Machanavajjhala et al., TKDD'07) on top of
    * k-anonymity: a group is releasable only if it ALSO carries ≥ l
    * distinct values of the sensitive column — k-anonymous groups whose
    * members all share one sensitive value still leak it (the
    * homogeneity attack this closes). Same scale shape as
    * [[kAnonymous]] with a count_distinct riding the one aggregation. */
  def lDiverse(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
               k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"need k,l >= 1, got k=$k l=$l")
    val pfx = Iterator.from(0).map(i => s"ld${i}_")
      .find(p => !df.columns.exists(_.startsWith(p))).get
    val ok = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as(s"${pfx}n"),
        count_distinct(col(sensitiveCol)).as(s"${pfx}d"))
      .filter(col(s"${pfx}n") >= k && col(s"${pfx}d") >= l)
      .select(quasiCols.map(c => col(c).as(s"$pfx$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"$pfx$c")).reduce(_ && _)
    df.join(ok, cond).select(df.columns.map(col).toIndexedSeq: _*)
  }
}
