package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe GLOBAL ranking (the corpus-wide `dense_rank()`/`row_number()`
  * ledger the suffix-array family is built on).
  *
  * The naive spelling — `dense_rank() OVER (ORDER BY keys)` with no
  * PARTITION BY — collapses the ENTIRE dataset into one task: Spark plans
  * an empty-partitioning window as a single-partition exchange, so at
  * corpus scale the sort that defines the rank runs on one core with the
  * whole 100 TB behind it. (Spark even warns: "No Partition Defined for
  * Window operation".)
  *
  * These spellings are bit-identical to the naive window but every stage is
  * distributed, in the same two-phase style as [[PrefixSum]]:
  *
  *   1. range-partition the rows by the rank keys (`repartitionByRange`,
  *      `parts` ways) — partitions are ordered, non-overlapping key ranges,
  *      and the range sampler balances by ROW COUNT, so partition sizes are
  *      ~n/parts regardless of how skewed the key VALUES are;
  *   2. per-partition local rank — a `row_number` window partitioned by
  *      `spark_partition_id()`, whose every window group is one range
  *      partition (~n/parts rows BY CONSTRUCTION);
  *   3. per-partition row counts → exclusive running offsets: a window over
  *      the `parts`-row count table (metadata-sized, like the [[PrefixSum]]
  *      subtotal table);
  *   4. global rank = broadcast the offsets back and add the local rank.
  *
  * The range boundaries the sampler picks vary run to run — AND vary
  * between two plan branches reading the "same" repartitionByRange (the
  * sampler seeds by RDD id, and column pruning can specialize each branch
  * into a distinct exchange that ReusedExchange no longer deduplicates).
  * The emitted ranks do not depend on WHERE the boundaries fall (offset +
  * local rank reconstructs the exact global order for any placement), but
  * steps 2 and 3 MUST observe the SAME placement — so the pid-stamped
  * rows are materialized (the [[Materialize]] seam) before the plan
  * branches. That materialization is a correctness requirement, not a
  * perf tweak: without it the count table can describe a different
  * partitioning than the local ranks were computed under. With it, the
  * result is bit-identical to the naive window, so oracles spelled as
  * `dense_rank() OVER (ORDER BY …)` still hash-match.
  *
  * [[denseRank]] additionally must co-locate equal keys (a local rank per
  * partition would otherwise double-count a key straddling a boundary).
  * Range partitioning does co-locate equal keys, but that re-introduces
  * value skew — a key carrying half the corpus would drag half the rows
  * into one partition. So denseRank ranks the DISTINCT key set (one row
  * per key — no heavy key exists by construction) and hash-joins the ranks
  * back onto the full rows: the join key is the rank key itself, uniform
  * after the distinct's partial aggregation.
  */
object GlobalRank {

  /** Adds `out` = `row_number() OVER (ORDER BY keys)` (1-based, ascending,
    * nulls first). The key tuple MUST be unique per row (the usual
    * tie-broken `(rank, id)` contract) — uniqueness is what makes the
    * per-partition local rank + offset exact without key co-location. */
  def rowNumber(df: DataFrame, keys: Seq[String], out: String,
      parts: Int = 0, mat: Materialize = Materialize.Local): DataFrame =
    rankUnique(df, keys, out, resolveParts(df, parts), mat)

  /** Adds `out` = `dense_rank() OVER (ORDER BY keys)` (1-based, ascending,
    * nulls first). Keys may repeat arbitrarily — ranking happens on the
    * distinct key set, so a heavy key costs no more than a unique one.
    * Rows are matched back null-safely (a null key value joins its rank
    * like any other value). */
  def denseRank(df: DataFrame, keys: Seq[String], out: String,
      parts: Int = 0, mat: Materialize = Materialize.Local): DataFrame = {
    val p = resolveParts(df, parts)
    val taken = (df.columns :+ out).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val renamed = keys.map(k => k -> fresh("gr_" + k))
    val distinctKeys = df.select(keys.map(col): _*).distinct()
    val ranked = renamed.foldLeft(rankUnique(distinctKeys, keys, out, p, mat)) {
      case (t, (k, a)) => t.withColumnRenamed(k, a)
    }
    val cond = renamed.map { case (k, a) => col(k) <=> col(a) }.reduce(_ && _)
    df.join(ranked, cond).drop(renamed.map(_._2): _*)
  }

  private def resolveParts(df: DataFrame, parts: Int): Int =
    if (parts > 0) parts
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Global row_number for rows whose `keys` tuple is unique. */
  private def rankUnique(df: DataFrame, keys: Seq[String], out: String,
      parts: Int, mat: Materialize): DataFrame = {
    val taken = (df.columns :+ out).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val pidC = fresh("gr_pid"); val lrC = fresh("gr_lr")
    val cntC = fresh("gr_cnt"); val offC = fresh("gr_off")
    // spark_partition_id() is non-deterministic, so Catalyst cannot
    // collapse the projection below the range exchange — the pid read here
    // IS the range partition index, ordered by key range.
    // Materialized BEFORE branching: the count branch and the local-rank
    // branch must see one frozen boundary placement (see object doc).
    val ranged = mat(df.repartitionByRange(parts, keys.map(col): _*)
      .withColumn(pidC, spark_partition_id()))
    val local = ranged.withColumn(lrC,
      row_number().over(
        Window.partitionBy(col(pidC)).orderBy(keys.map(col): _*)))
    val counts = ranged.groupBy(col(pidC)).agg(count(lit(1)).as(cntC))
    // `parts` rows — metadata-sized; the single-task window is over the
    // COUNT table, never the row stream (the PrefixSum offset pattern).
    val wOff = Window.orderBy(col(pidC)).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn(offC, coalesce(sum(col(cntC)).over(wOff), lit(0L)))
      .select(col(pidC), col(offC))
    local.join(broadcast(offsets), Seq(pidC))
      .withColumn(out, (col(offC) + col(lrC)).cast("long"))
      .drop(pidC, lrC, offC)
  }
}
