package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Hashing, Materialize, PrefixSum, TextAnalysis}

/** End-to-end LLM training-corpus preparation — the LLM-side flagship
  * assembly, the analogue of [[ModernPipeline]] for the anime chain: one
  * composable call takes raw `(doc_id, text, lang)` documents through
  *
  *   1. exact dedup            (content-hash keep-min — [[exactDedup]])
  *   2. near-dup keep-one      (MinHash+LSH pairs → connected components
  *                              → drop non-representatives — [[nearDedup]])
  *   3. quality filter         (Gopher-style repetition fractions —
  *                              [[qualityFilter]])
  *   4. stratified sampling    (deterministic per-language quota —
  *                              [[sample]])
  *   5. sequence packing       (token-budget chunk assignment — [[pack]])
  *
  * Every stage is also usable alone. All determinism contracts of the
  * underlying operators hold through the composition, so the WHOLE
  * pipeline is oracle-checkable (q86 re-runs it in DuckDB).
  *
  * Scale shape: stages 1 and 3 are one shuffle each (content key /
  * nothing), stage 2 is the indexed near-dup machinery (band equi-join,
  * metadata-sized pair graph), stages 4–5 are one window each on the
  * language partition. Nothing ever joins the corpus with itself
  * un-bucketed, and only stage 2 re-reads an intermediate (via `mat`).
  */
object CorpusPipeline {

  final case class Config(
      shingleN: Int = 3,
      minhashK: Int = 12,
      bands: Int = 4,
      nearDupThreshold: Double = 0.5,
      maxBucket: Int = 1000,
      dupChunkMax: Double = 0.3,
      repBigramMax: Double = 0.9,
      quotaPerLang: Int = 50,
      chunkBudget: Int = 2048,
      packBucketDocs: Long = 4096L)

  private def toks(df: DataFrame): DataFrame =
    df.select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))

  /** Identical texts collapse to the min doc_id (one shuffle on the
    * content hash). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Near-duplicate groups collapse to their min-id representative:
    * pairs → components → drop every node that is not its own cluster. */
  def nearDedup(docs: DataFrame, cfg: Config = Config(),
                mat: Materialize = Materialize.Local): DataFrame = {
    val pairs = Dedup.nearDupPairs(toks(docs), "doc_id", "toks",
      Hashing.DefaultTokHash, n = cfg.shingleN, k = cfg.minhashK,
      bands = cfg.bands, threshold = cfg.nearDupThreshold,
      maxBucket = cfg.maxBucket, mat = mat)
    val drop = Dedup.connectedComponents(pairs, "doc_a", "doc_b", mat)
      .filter(col("node") =!= col("cluster_id"))
      .select(col("node").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Gopher-style repetition gate (q77's thresholds over HASHED windows —
    * [[TextAnalysis.repeatedHashFrac]]): docs under 2 tokens or over the
    * duplicate-chunk / repeated-bigram fractions are dropped. Hashed
    * windows make the gate a single native pass per doc instead of
    * building every chunk/bigram string interpretively. */
  def qualityFilter(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val t = TextAnalysis.toks(col("text"))
    docs
      .filter(size(t) >= 2)
      .filter(
        TextAnalysis.repeatedHashFrac(t, 8, 8, partial = true) <= cfg.dupChunkMax &&
          TextAnalysis.repeatedHashFrac(t, 2, 1, partial = false) <= cfg.repBigramMax)
  }

  /** Deterministic per-language quota (q83 semantics): hash-ordered
    * rank-limit — reproducible across engines, runs, and retries.
    * Runs through the two-phase [[graft.plans.TopKPerGroup]] heap
    * operator: each map task pre-cuts its partition to ≤ quota rows per
    * language below the exchange, so the dominant language of a real
    * corpus never serializes through one sorting window task. */
  def sample(docs: DataFrame, cfg: Config = Config()): DataFrame =
    graft.plans.TopK.perGroup(
        docs.withColumn("smp_h", Hashing.hash31(col("doc_id").cast("string"))),
        Seq("lang"), Seq(("smp_h", true), ("doc_id", true)), cfg.quotaPerLang)
      .drop("smp_h")

  /** Token-budget chunk assignment (q84 semantics): concat-then-cut per
    * language in doc order. Output adds n_toks, chunk_id, chunk_offset.
    * The token ledger is the two-phase [[PrefixSum.exclusiveRunningSum]]
    * — per-(lang, id-bucket) subtotals, broadcast offsets, bounded
    * within-bucket windows — NOT a per-language unbounded window, so the
    * dominant language of a real corpus never serializes its whole token
    * ledger through one task. */
  def pack(docs: DataFrame, cfg: Config = Config()): DataFrame =
    PrefixSum.exclusiveRunningSum(
        docs.withColumn("n_toks", size(TextAnalysis.toks(col("text"))).cast("long")),
        "lang", "doc_id", "n_toks", "pre", cfg.packBucketDocs)
      .withColumn("chunk_id", expr(s"pre div ${cfg.chunkBudget}"))
      .withColumn("chunk_offset", col("pre") % cfg.chunkBudget)
      .drop("pre")

  /** Benchmark-decontamination gate ([[Dedup.decontaminate]]): drop
    * every document sharing an n-gram with the held-out set. Opt-in
    * stage between dedup and quality (leakage removal belongs before
    * sampling — a contaminated doc must not consume quota). */
  def decontaminate(docs: DataFrame, testSet: DataFrame, n: Int = 8): DataFrame =
    docs.join(
      Dedup.decontaminate(toks(docs), toks(testSet), "doc_id", "toks", n)
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")

  /** The full chain. Output: (doc_id, lang, n_toks, chunk_id,
    * chunk_offset), one row per surviving document. `testSet` (opt-in)
    * inserts the [[decontaminate]] gate after near-dedup. */
  def run(docs: DataFrame, cfg: Config = Config(),
          mat: Materialize = Materialize.Local,
          testSet: Option[DataFrame] = None, contamN: Int = 8): DataFrame = {
    val deduped = nearDedup(exactDedup(docs), cfg, mat)
    val clean = testSet.fold(deduped)(t => decontaminate(deduped, t, contamN))
    pack(sample(qualityFilter(clean, cfg), cfg), cfg)
      .select(col("doc_id"), col("lang"), col("n_toks"),
        col("chunk_id"), col("chunk_offset"))
  }
}
