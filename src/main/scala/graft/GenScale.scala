package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the driver's synthetic tables
  * (TESTDATA.md): replicate a source SF directory `factor`× with
  * consistent key-offset strides so every foreign-key relationship of
  * the TPC-H-ish star schema holds in each copy, writing a new SF
  * directory the bench can point `SPARK_GRAFT_SF_DIR` at. The source
  * testdata is never modified.
  *
  * Scaling is shape-honest, not byte-clone:
  *   - dimension tables (`region`, `nation`) stay fixed, as TPC-H scales
  *     them;
  *   - fact/entity tables (`customer supplier part orders lineitem
  *     events`) replicate with per-copy key offsets (stride = next power
  *     of ten above the max key, so copies never collide);
  *   - `documents.text` gets a per-copy seeded word-shuffle keyed by the
  *     ORIGINAL text (identical source docs stay identical within a
  *     copy, so the corpus' exact-duplicate RATE is preserved), which
  *     destroys shingle/n-gram overlap across copies — near-duplicate
  *     density stays flat instead of exploding quadratically with the
  *     factor, keeping MinHash/SimHash bench shapes comparable across
  *     scale points;
  *   - `embeddings.embedding` vectors get a small deterministic
  *     per-copy perturbation (hash-seeded, ±1%) so ANN queries never see
  *     exact clones across copies;
  *   - `events.ts` keeps its wall-clock range: scaling traffic density
  *     (more rows per window), not history length — the shape windowed
  *     aggregations must survive at 100 TB.
  *
  * Usage: `runMain graft.GenScale <srcSfDir> <dstSfDir> [factor=10]`.
  * Fully deterministic for a (src, factor) pair: no wall-clock, no
  * unseeded randomness. */
object GenScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <srcSfDir> <dstSfDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor must be >= 1: $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, factor)
    spark.stop()
  }

  private def read(spark: SparkSession, src: String, t: String): DataFrame =
    spark.read.parquet(s"$src/$t.parquet")

  /** Smallest power of ten strictly above every id in `df.col` — the
    * per-copy offset stride. Power of ten keeps scaled ids readable
    * (copy 3 of doc 17 is 3_00017 at stride 1e5). */
  private def strideOf(df: DataFrame, c: String): Long = {
    val mx = df.agg(max(col(c))).head.getLong(0)
    var s = 1L
    while (s <= mx) s *= 10
    s
  }

  /** `factor` stacked copies with `keyCols` offset by copy × stride.
    * The cross-join side is a 1-column range — Spark broadcasts it, so
    * the write is one pass over the source. */
  private def replicate(df: DataFrame, keyStrides: Map[String, Long],
      factor: Int): DataFrame = {
    val copies = df.sparkSession.range(factor.toLong)
      .withColumnRenamed("id", "_copy")
    val out = df.crossJoin(broadcast(copies))
    keyStrides.foldLeft(out) { case (d, (c, s)) =>
      d.withColumn(c, col(c) + col("_copy") * s)
    }
  }

  /** Seeded word-shuffle: identical (copy, text) inputs yield identical
    * outputs, copy 0 is the untouched original. Token multiset (and so
    * length/token-count statistics) is preserved; shingle structure is
    * not — by design (see class doc). */
  private val shuffleWords = udf { (text: String, copy: Long) =>
    if (text == null || copy == 0L) text
    else {
      val words = text.split(" ", -1)
      val seed = scala.util.hashing.MurmurHash3.stringHash(text, copy.toInt)
      val rnd = new scala.util.Random(seed)
      val idx = rnd.shuffle(words.indices.toVector)
      idx.map(words).mkString(" ")
    }
  }

  /** Deterministic ±1% perturbation of each vector element for copies
    * > 0, seeded by (copy, vec_id, element index). */
  private val perturb = udf { (v: Seq[Float], id: Long, copy: Long) =>
    if (v == null || copy == 0L) v
    else v.zipWithIndex.map { case (x, i) =>
      val h = scala.util.hashing.MurmurHash3.productHash(
        (copy, id, i.toLong))
      // h / Int.MaxValue in [-1, 1]; scale to ±1% of the element
      x + x * 0.01f * (h.toFloat / Int.MaxValue)
    }
  }

  def generate(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val customer = read(spark, src, "customer")
    val supplier = read(spark, src, "supplier")
    val part = read(spark, src, "part")
    val orders = read(spark, src, "orders")
    val lineitem = read(spark, src, "lineitem")
    val events = read(spark, src, "events")
    val documents = read(spark, src, "documents")
    val embeddings = read(spark, src, "embeddings")

    val cs = strideOf(customer, "c_custkey")
    val ss = strideOf(supplier, "s_suppkey")
    val ps = strideOf(part, "p_partkey")
    val os = strideOf(orders, "o_orderkey")
    val es = strideOf(events, "event_id")
    val us = strideOf(events, "user_id")
    val ds = strideOf(documents, "doc_id")
    val vs = strideOf(embeddings, "vec_id")

    def write(df: DataFrame, t: String): Unit = {
      val cols = df.columns.filter(_ != "_copy").map(col).toIndexedSeq
      df.select(cols: _*)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genscale] $t written")
    }

    // dimensions: fixed, copied verbatim (one file each, tiny)
    write(read(spark, src, "region"), "region")
    write(read(spark, src, "nation"), "nation")

    write(replicate(customer, Map("c_custkey" -> cs), factor), "customer")
    write(replicate(supplier, Map("s_suppkey" -> ss), factor), "supplier")
    write(replicate(part, Map("p_partkey" -> ps), factor), "part")
    write(replicate(orders,
      Map("o_orderkey" -> os, "o_custkey" -> cs), factor), "orders")
    write(replicate(lineitem,
      Map("l_orderkey" -> os, "l_partkey" -> ps, "l_suppkey" -> ss),
      factor), "lineitem")
    write(replicate(events,
      Map("event_id" -> es, "user_id" -> us), factor), "events")

    write(replicate(documents, Map.empty, factor)
      .withColumn("text", shuffleWords(col("text"), col("_copy")))
      .withColumn("doc_id", col("doc_id") + col("_copy") * ds),
      "documents")
    write(replicate(embeddings, Map.empty, factor)
      .withColumn("embedding",
        perturb(col("embedding"), col("vec_id"), col("_copy")))
      .withColumn("vec_id", col("vec_id") + col("_copy") * vs),
      "embeddings")
  }
}
