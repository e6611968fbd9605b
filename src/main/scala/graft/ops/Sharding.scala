package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stable corpus sharding via rendezvous / highest-random-weight hashing
  * (Thaler & Ravishankar, IEEE/ACM ToN 6(1) 1998): doc d goes to the
  * shard s maximizing hash(d, s).
  *
  * Why not `hash(d) mod n`: changing the shard count reassigns almost
  * EVERY document (all but 1/lcm), so the next release rewrites the whole
  * corpus layout. Under HRW, growing n → n+1 moves exactly the docs whose
  * new shard wins the argmax — an expected 1/(n+1) of the corpus — and
  * docs never move between surviving shards. That minimal-movement
  * property is what makes periodic re-release of a 100 TB corpus cheap:
  * unchanged shards re-ship as-is ([[SnapshotDiff]] proves them
  * unchanged; [[Compaction]] keeps them well-sized).
  */
object Sharding {

  /** Max shards encodable in the packed argmax (scores pack as
    * `h·256 + (255−s)`, so s must fit a byte). */
  val MaxShards = 256

  /** The HRW score of (id, shard): the oracle-portable 31-bit hash of
    * `"id:shard"`. */
  def hrwScore(id: Column, shard: Column): Column =
    Hashing.hash31(concat(id.cast("string"), lit(":"), shard.cast("string")))

  /** Winning shard for `id` among shards 0..nShards−1 — a single NARROW
    * projection (no shuffle, no explode): scores for all n shards pack
    * into one long each (`h·256 + (255−s)` — h < 2^31 so the pack is
    * < 2^39) and `array_max` picks the winner; the `255−s` low byte makes
    * ties (hash collisions between two (id,shard) strings) break to the
    * SMALLEST shard id deterministically. */
  def hrwShard(id: Column, nShards: Int): Column = {
    require(nShards > 0 && nShards <= MaxShards,
      s"nShards must be in [1, $MaxShards], got $nShards")
    lit(255) - array_max(transform(sequence(lit(0), lit(nShards - 1)),
      s => hrwScore(id, s) * lit(256L) + (lit(255L) - s))) % lit(256L)
  }

  /** DuckDB spelling of [[hrwShard]] — identical pack/argmax arithmetic. */
  def hrwShardSql(idExpr: String, nShards: Int): String = {
    val h = Hashing.hash31Sql(s"CAST($idExpr AS VARCHAR) || ':' || CAST(s AS VARCHAR)")
    s"255 - (list_max(list_transform(range(0, $nShards), " +
      s"s -> $h * 256 + (255 - s))) % 256)"
  }
}
