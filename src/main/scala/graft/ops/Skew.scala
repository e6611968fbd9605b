package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers — the manual tools for the cases AQE's runtime
  * skew-join splitting does NOT cover (sort-merge-only shapes it declines,
  * aggregation skew, deliberate pre-partitioned layouts). q62 demonstrates
  * the two-phase aggregation spelling inline; these are the reusable
  * library forms.
  *
  * Salting trades one hot shuffle key for `salts` warm ones: the big side
  * scatters each hot-key row across salt buckets, the small side
  * replicates `salts`× so every bucket can still match. Use it when ONE
  * key holds a double-digit percentage of the rows (the "null join key" /
  * "default value" pathology) — for garden-variety skew prefer AQE's
  * `skewJoin` (on in the driver sessions), which splits oversized
  * partitions without the replication cost. */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's shuffle salted
    * `salts` ways and the small side replicated per salt. Result rows are
    * identical to `big.join(small, key)` — only the exchange layout
    * changes: the hot key's rows land on `salts` reducers instead of one.
    * Deterministic: the salt derives from a hash of the big row's key
    * plus a per-row discriminator column (`disc`, e.g. a unique id), not
    * from rand(). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, disc: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val taken = (big.columns ++ small.columns).toSet
    val saltCol = Iterator.iterate("skw_salt")(_ + "_")
      .dropWhile(taken.contains).next()
    val b = big.withColumn(saltCol, pmod(xxhash64(col(key), col(disc)), lit(salts)))
    val s = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    b.join(s, Seq(key, saltCol)).drop(saltCol)
  }

  /** Two-phase (salted) aggregation: partial-aggregate per (keys, salt),
    * then merge per keys — the q62 spelling generalized. `aggs` maps each
    * output column to (partial expr over input, merge expr over partial).
    * Spark's hash aggregate already partial-aggregates map-side, so this
    * matters when the MERGE side itself skews (few giant groups with
    * high-cardinality partial state, e.g. collect-like aggregates). */
  def saltedAgg(df: DataFrame, keys: Seq[String], disc: String, salts: Int,
      partial: Seq[(String, Column)], merge: Seq[(String, Column)]): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = Iterator.iterate("skw_salt")(_ + "_")
      .dropWhile(df.columns.toSet.contains).next()
    df.withColumn(saltCol, pmod(xxhash64(col(disc)), lit(salts)))
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
