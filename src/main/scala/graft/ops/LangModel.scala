package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model fluency filtering (Wenzek et al., LREC 2020:
  * train a LM on a clean reference corpus, score the crawl, keep the
  * head/middle buckets). Reference analogue: the aesthetic-score gate of
  * `dataruu/pipeline.py` — same shape (model scores gate the corpus), text
  * modality instead of image.
  *
  * The model is an add-one-smoothed bigram LM. Scores are the per-document
  * MEAN per-bigram likelihood in integer nano-units — the monotone rational
  * form of the usual log-perplexity, following the same no-transcendentals
  * house rule as [[Search.bm25Micro]] (`ln` differs by ULPs across engines;
  * `floor((c12+1)/(c1+V) * 1e9)` is identical IEEE arithmetic in Spark and
  * the DuckDB oracle, and the integer sums that follow are order-free).
  *
  * 100 TB shape: the reference slice is bounded (a curated corpus), so the
  * count tables it produces are broadcast-joinable; when the reference IS
  * large the joins are hash-equi on uniformly distributed token keys. The
  * per-document re-aggregation after the explode benefits from map-side
  * partial aggregation — every bigram of a document lives in the same input
  * row, hence the same partition, so the exchange carries ONE partial row
  * per document, not one row per token.
  */
object LangModel {

  /** (w1, bigram) pairs of a token array, as parallel arrays zipped by
    * position ([[TextAnalysis.adjacentIdx]] guards the < 2-token edge). */
  def bigramPairs(toks: Column): Column =
    transform(TextAnalysis.adjacentIdx(toks), i => struct(
      element_at(toks, i).as("w1"),
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)).as("bg")))

  /** Trained model: bigram counts, prefix counts, and the smoothing
    * vocabulary size — everything scoring needs. */
  final case class BigramLm(c12: DataFrame, c1: DataFrame, vocab: DataFrame)

  /** Count tables of the reference slice. `c12(bg, c12)` counts each
    * bigram, `c1(w1, c1)` counts each bigram PREFIX (so MLE denominators
    * match numerators row-for-row), `vocab(v)` is one row with the distinct
    * unigram count used by add-one smoothing. Three narrow aggregations
    * over one explode — at scale the heavy lifting is map-side combine.
    * CONTRACT: the reference must contain at least one token (an empty
    * reference gives V = 0, a zero smoothing denominator). */
  def trainBigram(ref: DataFrame, toksCol: String): BigramLm = {
    val ex = ref.select(explode(bigramPairs(col(toksCol))).as("p"))
      .select(col("p.w1").as("w1"), col("p.bg").as("bg"))
    val c12 = ex.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val c1 = ex.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // Contract enforced in-plan: a token-free reference gives V = 0, a
    // zero add-one denominator for every unseen prefix — at scoring time
    // that surfaces as an ANSI DIVIDE_BY_ZERO deep in a join stage, so
    // fail HERE with the actual contract violation instead (the
    // Graph.positiveWeight pattern; rides the one-row vocab aggregate).
    val vocab = ref.select(explode(col(toksCol)).as("w"))
      .agg(count_distinct(col("w")).as("v"))
      .select(when(col("v") === 0L,
          raise_error(lit("trainBigram: reference slice contains no " +
            "tokens — V = 0 makes the add-one smoothing denominator " +
            "zero; train on a non-empty reference")).cast("long"))
        .otherwise(col("v")).as("v"))
    BigramLm(c12, c1, vocab)
  }

  /** Per-document fluency under the trained LM: explode bigrams, left-join
    * the count tables (unseen ⇒ 0), quantize each bigram's smoothed
    * likelihood `(c12+1)/(c1+V)` to nano-units, and re-aggregate. Output
    * `(idCol, n_bigrams, sum_nano, mean_nano)`; documents with < 2 tokens
    * carry no signal and are excluded (documented contract). The count
    * tables are broadcast when `broadcastLm` (bounded reference). */
  def scoreBigramLm(corpus: DataFrame, idCol: String, toksCol: String,
                    lm: BigramLm, broadcastLm: Boolean = true): DataFrame = {
    val hint = (d: DataFrame) => if (broadcastLm) broadcast(d) else d
    val ex = corpus.filter(size(col(toksCol)) >= 2)
      .select(col(idCol), explode(bigramPairs(col(toksCol))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.bg").as("bg"))
    ex.join(hint(lm.c12), Seq("bg"), "left")
      .join(hint(lm.c1), Seq("w1"), "left")
      .crossJoin(hint(lm.vocab))
      .select(col(idCol), floor(
        (coalesce(col("c12"), lit(0L)) + lit(1L)) /
          (coalesce(col("c1"), lit(0L)) + col("v")) * lit(1e9))
        .cast("long").as("nano"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nano")).as("sum_nano"))
      .withColumn("mean_nano", expr("sum_nano div n_bigrams"))
  }

  /** CCNet's head/middle/tail cut on the integer score — engine-exact
    * threshold compares, no quantile estimation in the gate itself
    * (production picks `headMin`/`midMin` once from reference quantiles,
    * then applies them as constants exactly like this). */
  def fluencyBucket(meanNano: Column, headMin: Long, midMin: Long): Column =
    when(meanNano >= headMin, lit("head"))
      .when(meanNano >= midMin, lit("middle"))
      .otherwise(lit("tail"))

  // ---- DuckDB oracle spellings ----

  /** Bigram string list of a token list expression (1-based slices). */
  def bigramsSql(toks: String): String =
    s"list_transform(range(1, len($toks)), i -> ($toks)[i] || ' ' || ($toks)[i+1])"

  /** Prefix (w1) list parallel to [[bigramsSql]]. */
  def prefixesSql(toks: String): String =
    s"list_transform(range(1, len($toks)), i -> ($toks)[i])"

  /** Nano-quantized smoothed likelihood — mirrors the Spark arithmetic
    * node for node: long + long, double division, × 1e9, floor. */
  def nanoSql(c12: String, c1: String, v: String): String =
    s"CAST(floor((COALESCE($c12, 0) + 1) / CAST(COALESCE($c1, 0) + $v AS DOUBLE) * 1e9) AS BIGINT)"

  def fluencyBucketSql(meanNano: String, headMin: Long, midMin: Long): String =
    s"CASE WHEN $meanNano >= $headMin THEN 'head' " +
      s"WHEN $meanNano >= $midMin THEN 'middle' ELSE 'tail' END"

  // ---- per-class unigram-LM classifier (the fastText-analog gate) ----

  /** Trained per-class model: `counts(cls, w, cwc)` token counts within
    * each class, `totals(cls, nc)` class token totals, `vocab(v)` the
    * labeled slice's distinct unigram count (shared add-one smoothing
    * denominator across classes — the standard multinomial smoothing). */
  final case class ClassLm(counts: DataFrame, totals: DataFrame,
      vocab: DataFrame)

  /** Train the class-conditional unigram models from a LABELED slice —
    * the classifier-gate shape every production corpus pipeline carries
    * (GPT-3's quality classifier, CCNet's langid gate): a bounded labeled
    * set trains a model, the model scores the whole corpus. Training is
    * two narrow aggregations plus a distinct count over one explode —
    * entirely map-side-combinable; the resulting tables are
    * classes × vocab and classes rows, broadcast-sized whenever the label
    * set is (labeled slices are curated, hence bounded, by contract). */
  def trainClassLm(labeled: DataFrame, clsCol: String,
      toksCol: String): ClassLm = {
    val ex = labeled.select(col(clsCol).as("cls"),
      explode(col(toksCol)).as("w"))
    ClassLm(
      ex.groupBy(col("cls"), col("w")).agg(count(lit(1)).as("cwc")),
      ex.groupBy(col("cls")).agg(count(lit(1)).as("nc")),
      ex.agg(count_distinct(col("w")).as("v")))
  }

  /** Classify every corpus document as the argmax class of its MEAN
    * per-token smoothed class-conditional likelihood, in the same integer
    * nano-units as [[scoreBigramLm]] (no transcendentals — `floor((cwc+1)
    * /(nc+V)·1e9)` is identical IEEE arithmetic in Spark and the DuckDB
    * oracle, and the integer sums after it are order-free; the argmax of
    * the mean-likelihood is the same monotone family as CCNet's bucketing,
    * applied per class). Ties break to the lexicographically smallest
    * class — deterministic across engines.
    *
    * Output: `(idCol, pred_cls, n_toks, mean_nano)`, one row per document
    * with ≥ 1 token (empty documents carry no signal — documented
    * contract, same as [[scoreBigramLm]]'s < 2-token cut).
    *
    * 100 TB shape: the corpus explodes to one row per (token, class) —
    * a constant `C`× blowup, NOT a join explosion — and the model tables
    * broadcast ([[ClassLm]] bounded-by-contract). Map-side partial
    * aggregation collapses each document's tokens before the exchange
    * (all of a document's tokens share its input partition), so the
    * shuffle carries one partial row per (document, class). The final
    * argmax is a `row_number ≤ 1` window that
    * [[graft.plans.RankLimitRewrite]] lowers onto the TopKPerGroup heap —
    * at most one candidate row per document per map task crosses the
    * second exchange. */
  def classifyUnigram(corpus: DataFrame, idCol: String, toksCol: String,
      lm: ClassLm, broadcastLm: Boolean = true): DataFrame = {
    val hint = (d: DataFrame) => if (broadcastLm) broadcast(d) else d
    val ex = corpus.filter(size(col(toksCol)) >= 1)
      .select(col(idCol), explode(col(toksCol)).as("w"))
      .crossJoin(hint(lm.totals)) // one row per (token, class)
      .join(hint(lm.counts), Seq("cls", "w"), "left")
      .crossJoin(hint(lm.vocab))
      .select(col(idCol), col("cls"), floor(
        (coalesce(col("cwc"), lit(0L)) + lit(1L)) /
          (coalesce(col("nc"), lit(0L)) + col("v")) * lit(1e9))
        .cast("long").as("nano"))
    val perClass = ex.groupBy(col(idCol), col("cls"))
      .agg(count(lit(1)).as("n_toks"), sum(col("nano")).as("sum_nano"))
      .withColumn("mean_nano", expr("sum_nano div n_toks"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("mean_nano").desc, col("cls"))
    perClass.withColumn("clm_rn", row_number().over(best))
      .filter(col("clm_rn") === 1)
      .select(col(idCol), col("cls").as("pred_cls"), col("n_toks"),
        col("mean_nano"))
  }
}
