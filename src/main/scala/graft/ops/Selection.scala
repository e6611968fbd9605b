package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data selection for LM training: rank a raw corpus by how much each
  * document resembles a small high-quality TARGET distribution relative to
  * the corpus background — the importance-resampling family (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS'23), with hashed unigram features.
  *
  * Scoring. Both distributions are add-one-smoothed unigram models over
  * the corpus vocabulary V:
  *
  *   weight(t)  = p_target(t) / p_background(t)
  *              = ((tcnt+1) · (SB+V)) / ((bcnt+1) · (ST+V))
  *   score(doc) = Σ_t tf(doc,t) · weight(t)  /  dl(doc)
  *
  * i.e. the mean per-token likelihood RATIO rather than the mean
  * log-ratio: monotone per token, keeps hot target tokens additive, and —
  * unlike log — exactly portable across engines (all inputs are integer
  * counts; products stay < 2^53 for any vocab/corpus this runs on per the
  * require below, so ×, ÷ are single correctly-rounded IEEE ops). Each
  * token weight is quantized to integer micro-units BEFORE the per-doc
  * sum, making the aggregation order-free.
  *
  * Scale shape: the weight table is vocab-sized (two term-keyed
  * aggregations with map-side combine) and joins term-keyed onto the
  * per-doc tf table — AQE broadcasts it when small, shuffles otherwise;
  * corpus scalars ride a broadcast 1-row crossJoin; final selection goes
  * through [[graft.plans.TopK.perGroup]] so ≤ k rows cross the last
  * exchange. Nothing touches the driver.
  */
object Selection {

  /** Top-k corpus documents by target-likeness:
    * `(rnk, idCol, score_micro)`, rank 1 = most target-like.
    *
    * @param corpus background corpus with `idCol` + tokenized `toksCol`
    * @param target sample of the target distribution (same `toksCol`)
    */
  def importanceTopK(corpus: DataFrame, target: DataFrame,
                     idCol: String, toksCol: String, k: Int): DataFrame = {
    val docs = corpus.select(col(idCol), col(toksCol).as("toks"))
      .withColumn("dl", size(col("toks")))
    val tf = docs
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val bg = tf.groupBy(col("term")).agg(sum(col("tf")).as("bcnt"))
    val tcnt = target.select(explode(col(toksCol)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tcnt"))
    // corpus-level scalars, in-plan: vocab size V over the BACKGROUND
    // vocabulary (tcnt of an unseen background term is smoothed to 1),
    // total background mass SB, total target mass ST
    val stats = bg.agg(count(lit(1)).as("v"), sum(col("bcnt")).as("sb"))
      .crossJoin(broadcast(
        target.select(explode(col(toksCol)).as("t")).agg(count(lit(1)).as("st"))))
    val weights = bg
      .join(tcnt, Seq("term"), "left")
      .na.fill(0L, Seq("tcnt"))
      .crossJoin(broadcast(stats))
      .select(col("term"), ratioMicro(
        col("tcnt"), col("bcnt"), col("st"), col("sb"), col("v")).as("wmicro"))
    val scored = tf.join(weights, "term")
      .groupBy(col(idCol), col("dl"))
      .agg(sum(col("tf") * col("wmicro")).as("wsum")) // pure integer sum
      .select(col(idCol),
        // mean per-token micro-weight: exact-integer sum, ONE correctly-
        // rounded divide, half-up to an integer — portable
        floor(col("wsum").cast("double") / col("dl").cast("double") + lit(0.5))
          .cast("long").as("score_micro"))
    val top = graft.plans.TopK.perGroup(scored.withColumn("g", lit(1)),
      Seq("g"), Seq(("score_micro", false), (idCol, true)), k)
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score_micro").desc, col(idCol))
    top.withColumn("rnk", row_number().over(w)) // over ≤ k rows
      .select(col("rnk"), col(idCol), col("score_micro"))
  }

  /** One term's smoothed likelihood ratio in integer micro-units;
    * mirrors [[ratioMicroSql]] node for node. Each FACTOR casts to
    * double BEFORE the multiply: the products stay correctly-rounded
    * IEEE (identical in both engines) for any factor < 2^53 — a long
    * product would silently wrap (Spark) or throw (DuckDB ANSI) near
    * 2^63, which web-scale token masses can reach. */
  def ratioMicro(tcnt: Column, bcnt: Column,
                 st: Column, sb: Column, v: Column): Column =
    floor((tcnt + lit(1)).cast("double") * (sb + v).cast("double") /
      ((bcnt + lit(1)).cast("double") * (st + v).cast("double")) * lit(1000000.0) + lit(0.5))
      .cast("long")

  /** DuckDB spelling of [[ratioMicro]] over integer exprs. */
  def ratioMicroSql(tcnt: String, bcnt: String,
                    st: String, sb: String, v: String): String =
    s"CAST(floor(CAST($tcnt + 1 AS DOUBLE) * CAST($sb + $v AS DOUBLE) / " +
      s"(CAST($bcnt + 1 AS DOUBLE) * CAST($st + $v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
}
