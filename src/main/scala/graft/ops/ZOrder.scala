package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional range pruning for the
  * 100 TB scan path.
  *
  * A parquet scan prunes row groups by per-column min/max statistics. A
  * table sorted by ONE column has tight stats on that column only: a 2-D
  * box query (user range × time range) still reads every row group for
  * the second dimension. Interleaving the bits of both sort keys
  * (`zKey`) makes rows that are close in EITHER dimension land close in
  * the file, so row-group min/max envelopes become tight boxes in both
  * dimensions at once and a 2-D predicate skips most of the file —
  * Spark's parquet reader does the skipping automatically from the same
  * pushed filters ([[ZOrderSpec]] counts overlapping row groups from the
  * parquet footers: z-ordered « single-sorted).
  *
  * The key is a static tree of `bits × 2` codegen'd bit operations — no
  * UDF, no HOF walk — and is computed ONCE at layout-write time; queries
  * never see it. This is the classic OPTIMIZE ZORDER technique spelled
  * as plain Spark: sort-by-computed-column + parquet stats, no engine
  * extension required.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two NON-NEGATIVE longs:
    * bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. 21 bits each keeps
    * the result under 2^42 (safe in a long with headroom). Negative
    * inputs violate the contract (map dimensions to non-negative —
    * epoch seconds, ids, quantized doubles — first). */
  def zKey(a: Column, b: Column, bits: Int = 21): Column =
    zKeyN(Seq(a, b), bits)

  /** k-dimensional Morton interleave: bit i of dimension d lands at bit
    * `i*k + d`, so the 2-D [[zKey]] is exactly `zKeyN(Seq(a, b), bits)`.
    * Real curation tables cluster on three-plus dimensions — (domain,
    * lang, date) at least — and a 2-D key leaves every extra dimension
    * unpruned. `bits × k` must fit a non-negative long (≤ 62); at k=3
    * the default 16 bits give a 48-bit key, still 65k distinct values
    * per dimension — far finer than any row-group envelope. Same
    * static codegen'd bit-op tree as the 2-D case: cost is O(bits·k)
    * long ops per row, once, at layout-write time. */
  def zKeyN(cs: Seq[Column], bits: Int): Column = {
    val k = cs.size
    require(k >= 1, "zKeyN needs at least one dimension")
    require(bits >= 1 && bits * k <= 62,
      s"bits*k must be in [1,62]: bits=$bits k=$k")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cs.zipWithIndex.foldLeft(acc) { case (a, (c, d)) =>
        a.plus(shiftleft(
          shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * k + d))
      }
    }
  }

  /** Write `df` as parquet physically ordered by the z-key of `(ca, cb)`:
    * range-partition on the key (so files cover disjoint key ranges —
    * file-level pruning), sort within partitions (so row groups cover
    * tight sub-boxes — row-group-level pruning), drop the key. At 100 TB
    * this is a one-time layout cost that turns every later 2-D range
    * scan into a mostly-skipped read; re-cluster on the compaction
    * cadence. `blockSize` caps the parquet row-group size — smaller
    * groups = finer pruning granularity at slightly more footer
    * overhead. */
  def writeZOrdered(df: DataFrame, path: String, ca: String, cb: String,
      bits: Int = 21, partitions: Int = 0, blockSize: Int = 0): Unit =
    writeZOrderedN(df, path, Seq(ca, cb), bits, partitions, blockSize)

  /** k-D twin of the two-column [[writeZOrdered]]: identical layout
    * mechanics (range-partition on the key → disjoint file ranges;
    * sort within partitions → tight row groups), key from [[zKeyN]]. */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[String],
      bits: Int, partitions: Int = 0, blockSize: Int = 0): Unit = {
    val keyed = df.withColumn("__zk", zKeyN(cols.map(col), bits))
    val parted =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__zk"))
      else keyed.repartitionByRange(col("__zk"))
    val w = parted.sortWithinPartitions(col("__zk")).drop("__zk")
      .write.mode("overwrite")
    (if (blockSize > 0) w.option("parquet.block.size", blockSize.toString) else w)
      .parquet(path)
  }
}
