package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders over the driver testdata layout — one parquet
  * file per table under the sf dir. The 8 relational tables are documented
  * in `TESTDATA.md`; the `documents`/`embeddings` extension tables in
  * `FIXTURES.md` §8.
  *
  * All loads go through `spark.read.parquet` so Catalyst sees a
  * declarative scan: filter pushdown, column pruning and partition
  * coalescing apply automatically. At cluster scale the same call
  * reads a partitioned directory tree — nothing here assumes a
  * single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized parquet reader rejects by default. Read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a micros
    * timestamp — same truncation DuckDB applies when loading NANOS into its
    * micros-precision TIMESTAMP, so oracle comparisons stay exact.
    * INTEGER division (`div`) is load-bearing: `/` promotes the ~1.7e18
    * nanos to double, which is past 2^53 and drops microseconds. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

/** One driver-visible query: the Spark plan plus (when expressible in
  * ANSI SQL) the DuckDB oracle the driver hash-compares against.
  *
  * Conventions that keep the hash-compare stable:
  *   - every output column aliased identically in Spark and SQL;
  *   - floating aggregates rounded (sums to 2dp, ratios to 4-6dp) so
  *     partition-order float drift cannot flip the compare;
  *   - deterministic total ORDER BY with a unique tiebreak column.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
