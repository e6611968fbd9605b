package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset release diff — the changelog between two corpus snapshots:
  * which keys appeared, vanished, changed content, or survived untouched.
  * Every curated-dataset release ships this audit (and incremental
  * consumers use the `added`/`changed` slice as their delta feed).
  *
  * One full outer join on the key with content compared by hash — at
  * 100 TB both sides shuffle once on the key they are usually already
  * bucketed by (`Sources.writeBucketedTable` makes the diff
  * exchange-free), and comparing md5 digests instead of text keeps the
  * exchange narrow: two 128-bit columns, not two documents. `fastHash`
  * (xxhash64) is the cheaper production swap-in; md5 is the
  * oracle-portable spelling, same trade as [[Hashing]].
  */
object SnapshotDiff {

  /** Per-key status frame: (key, status ∈ added|removed|changed|same).
    * `contentCol` is hashed on each side before the join. CONTRACT: the
    * key is unique within each snapshot (it is the release key) —
    * duplicate keys would fan out through the full-outer join. */
  def diff(before: DataFrame, after: DataFrame, keyCol: String,
           contentCol: String): DataFrame = {
    // presence is tracked with explicit flags, NOT inferred from hash
    // nullity — md5(NULL) is NULL, and a null-content row present in one
    // snapshot must diff as changed/same, never as added/removed
    val b = before.select(col(keyCol), lit(true).as("in_before"),
      md5(col(contentCol)).as("h_before"))
    val a = after.select(col(keyCol), lit(true).as("in_after"),
      md5(col(contentCol)).as("h_after"))
    b.join(a, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("in_before").isNull, lit("added"))
          .when(col("in_after").isNull, lit("removed"))
          .when(col("h_before") <=> col("h_after"), lit("same"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The release-audit rollup: one row per status with its count. */
  def diffCounts(before: DataFrame, after: DataFrame, keyCol: String,
                 contentCol: String): DataFrame =
    diff(before, after, keyCol, contentCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** DuckDB spelling of the per-key status over presence flags and
    * hashes (null-safe compare mirrors the Spark `<=>`). */
  def statusSql(inBefore: String, inAfter: String,
                hBefore: String, hAfter: String): String =
    s"CASE WHEN $inBefore IS NULL THEN 'added' " +
      s"WHEN $inAfter IS NULL THEN 'removed' " +
      s"WHEN $hBefore IS NOT DISTINCT FROM $hAfter THEN 'same' " +
      s"ELSE 'changed' END"
}
