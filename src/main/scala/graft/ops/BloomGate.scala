package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-gated EXACT membership: the production spelling of "is this batch
  * row already in the corpus" for repeated ingestion (the same gate the
  * reference's metadata merge implies for re-runs over an existing dataset,
  * `/root/reference/dataruu/run.py:69-87`, generalized to content keys).
  *
  * The naive spelling — `batch LEFT JOIN corpus ON key` — shuffles the
  * whole batch every run. The gate instead:
  *
  *   1. builds a Bloom filter over the corpus keys with ONE distributed
  *      aggregate (Spark's own [[BloomFilterAggregate]], the expression
  *      behind runtime row-level join filtering: partial sketches merge
  *      map-side, only per-partition sketch bytes cross the wire);
  *   2. probes every batch row scan-locally with the codegen'd
  *      [[BloomFilterMightContain]] twin — a Bloom filter has NO false
  *      negatives, so a negative probe is PROOF the row is new and it
  *      never enters a join;
  *   3. sends only the bloom-positive remainder (true matches + the fpp
  *      tail) through the exact verification join, so the final answer is
  *      EXACT — the sketch only prunes, it never decides.
  *
  * 100 TB shape: the sketch is `optimalNumOfBits(n, fpp)/8` bytes — ~1.1 GB
  * at 10^9 keys / 1% fpp — built once and shipped to executors as a plan
  * literal. Spark's aggregate caps sketch size via
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `.maxNumBits`
  * (defaults 4M items / 8 MB); raise those for corpus-scale gates, or shard
  * the gate by `key mod s` (s independent gates) when one sketch would
  * exceed executor-memory comfort. For a mostly-novel batch (the common
  * ingestion case) the join input shrinks by ~(1 - fpp), i.e. the shuffle
  * almost disappears; for a mostly-duplicate batch it degrades gracefully
  * to the plain join plus one scan-local probe.
  */
object BloomGate {

  /** Build a Bloom sketch over `xxhash64(key)` with one distributed
    * aggregate; returns the serialized sketch (null iff `keys` is empty —
    * Spark's aggregate yields NULL for zero rows). */
  def buildBloom(keys: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftSqlBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    keys.select(GraftSqlBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Scan-local sketch probe: true = maybe present, false = DEFINITELY
    * absent. Codegen'd ([[BloomFilterMightContain]]), no shuffle; the
    * sketch rides the plan as a binary literal. Must be probed with the
    * same key expression family the sketch was built over (both sides
    * hash through `xxhash64`). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      GraftSqlBridge.expression(xxhash64(key))))

  /** EXACT duplicate tagging of `batch` against `corpus` on equality of
    * column `key` (present in both): returns every batch row plus
    * `is_dup`, with only bloom-positive rows paying the verification
    * join. Row set and values are identical to the plain left-join
    * spelling — proven in BloomGateSpec. */
  def tagDuplicates(corpus: DataFrame, batch: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(corpus.select(col(key)), col(key), expectedItems, fpp)
    if (bloom == null) return batch.withColumn("is_dup", lit(false))
    // working-column names must not shadow caller columns (withColumn
    // silently replaces) — uniquify deterministically, as in PrefixSum
    val taken = batch.columns.toSet ++ corpus.columns
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val maybeC = fresh("bg_maybe"); val hitC = fresh("bg_hit")
    val probed = batch.withColumn(maybeC, mightContain(bloom, col(key)))
    val definiteNew = probed.filter(!col(maybeC)).drop(maybeC)
      .withColumn("is_dup", lit(false))
    val corpusKeys = corpus.select(col(key)).distinct()
      .withColumn(hitC, lit(1))
    val resolved = probed.filter(col(maybeC)).drop(maybeC)
      .join(corpusKeys, Seq(key), "left")
      .withColumn("is_dup", col(hitC).isNotNull).drop(hitC)
    definiteNew.unionByName(resolved)
  }
}
