package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search over a document corpus: BM25 ranking as one declarative
  * plan (inverted-index statistics are DataFrames, never driver state).
  *
  * Scale shape (the 100 TB story):
  *   - term statistics (tf, df) come from ONE explode + two hash
  *     aggregations with map-side combine — the classic inverted-index
  *     build as a term-keyed shuffle;
  *   - the query set is tiny by contract (user queries / eval probes) and
  *     is BROADCAST onto the tf table, so the corpus never reshuffles for
  *     a new query batch;
  *   - corpus-level scalars (N, total token count) ride along as a
  *     broadcast 1-row crossJoin — nothing is collected to the driver;
  *   - final ranking goes through [[graft.plans.TopK.perGroup]], so only
  *     ≤ k·queries rows cross the last exchange.
  *
  * Determinism across engines (the oracle contract): every per-term score
  * is computed from INTEGER statistics (tf, df, dl, N, Σdl) with only
  * IEEE-exact ops (+, −, ×, ÷ on doubles are correctly rounded, so both
  * engines produce bit-identical doubles from identical integer inputs),
  * then quantized to integer micro-units BEFORE the per-document sum —
  * integer sums are order-free, so partition order can never flip a rank.
  * No transcendental functions: the idf is the rational Robertson–Spärck
  * Jones form (N − df + 0.5)/(df + 0.5) WITHOUT the log wrap (the log is
  * monotone per term but not sum-invariant; the rational form keeps the
  * same document ordering per term and stays exactly portable).
  */
object Search {

  /** BM25 k1: term-frequency saturation. */
  val K1 = 1.2
  /** BM25 b: document-length normalization strength. */
  val B = 0.75

  /** Per-(qid, rnk) top-k BM25 matches: `(qid, rnk, doc_id, score_micro)`.
    *
    * @param docs    corpus with `idCol` and a tokenized array column
    * @param queries tiny query set `(qidCol, qtoksCol)` — broadcast
    * @param k       matches kept per query
    */
  def bm25TopK(docs: DataFrame, idCol: String, toksCol: String,
               queries: DataFrame, qidCol: String, qtoksCol: String,
               k: Int): DataFrame = {
    val withLen = docs.select(col(idCol), col(toksCol).as("toks"))
      .withColumn("dl", size(col("toks")))
    // corpus scalars as a broadcast single row — stays in-plan
    val stats = withLen.agg(
      count(lit(1)).as("ndocs"), sum(col("dl")).as("sdl"))
    // inverted index: tf per (doc, term); dl rides the groupBy for free
    // (constant per doc) so no second doc-keyed join is needed
    val tf = withLen
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // distinct query terms (standard BM25 scores each query term once)
    val qterms = queries
      .select(col(qidCol).as("qid"),
        explode(array_distinct(col(qtoksCol))).as("term"))
    val scored = tf
      .join(broadcast(qterms), "term")
      .join(df, "term")
      .crossJoin(broadcast(stats))
      .withColumn("micro", bm25Micro(
        col("tf"), col("df"), col("dl"), col("ndocs"), col("sdl")))
    val agg = scored.groupBy(col("qid"), col(idCol))
      .agg(sum(col("micro")).as("score_micro"))
    val top = graft.plans.TopK.perGroup(agg, Seq("qid"),
      Seq(("score_micro", false), (idCol, true)), k)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col(idCol))
    top.withColumn("rnk", row_number().over(w)) // over ≤ k rows per query
      .select(col("qid"), col("rnk"), col(idCol), col("score_micro"))
  }

  /** One term's BM25 contribution in integer micro-units. The expression
    * tree mirrors [[bm25MicroSql]] node for node — identical shape +
    * integer inputs + correctly-rounded IEEE ops = identical bits. */
  def bm25Micro(tf: Column, df: Column, dl: Column,
                ndocs: Column, sdl: Column): Column = {
    val avgdl = sdl.cast("double") / ndocs.cast("double")
    val idf = ((ndocs - df).cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    val num = lit(1.0 + K1) * tf.cast("double")
    val den = tf.cast("double") +
      lit(K1) * (lit(1.0 - B) + (lit(B) * dl.cast("double")) / avgdl)
    floor((idf * num) / den * lit(1000000.0) + lit(0.5)).cast("long")
  }

  /** DuckDB spelling of [[bm25Micro]] over integer columns/exprs. */
  def bm25MicroSql(tf: String, df: String, dl: String,
                   ndocs: String, sdl: String): String = {
    val avgdl = s"(CAST($sdl AS DOUBLE) / CAST($ndocs AS DOUBLE))"
    val idf = s"((($ndocs - $df) + 0.5) / ($df + 0.5))"
    val num = s"(${1.0 + K1} * $tf)"
    val den = s"($tf + $K1 * (${1.0 - B} + ($B * $dl) / $avgdl))"
    s"CAST(floor(($idf * $num) / $den * 1000000.0 + 0.5) AS BIGINT)"
  }
}
