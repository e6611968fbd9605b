package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al., ACL'16) — the
  * tokenizer-building step of an LLM data pipeline, run where the data
  * is: each round counts adjacent symbol pairs across the whole corpus
  * with one hash-aggregate, takes the arg-max pair under a deterministic
  * total order (count desc, then pair lexicographic — ties can't flap
  * between runs or partitionings), and rewrites every sequence with the
  * merged symbol via a codegen'd left-to-right fold. No reference
  * analogue — beyond-reference surface like the rest of the LLM family.
  *
  * Scale shape: pair counting is explode → groupBy with map-side combine
  * (exchange rows bounded by distinct pairs per partition, not corpus
  * tokens); the per-round arg-max moves ONE row to the driver (the merge
  * TABLE is the model — vocab-sized by definition); the rewrite is a
  * narrow per-row projection. Rounds compose lazily, so the strategy
  * parameter re-materializes the corpus every few rounds to stop plan
  * growth — same [[Materialize]] seam as the dedup family.
  */
object BpeTrainer {

  /** Adjacent (a, b) symbol pairs of a sequence column (empty for < 2
    * symbols — [[TextAnalysis.adjacentIdx]] guards the edge). */
  def pairsOf(syms: Column): Column =
    transform(TextAnalysis.adjacentIdx(syms), i => struct(
      element_at(syms, i).as("a"), element_at(syms, i + 1).as("b")))

  /** Left-to-right non-overlapping application of ONE merge rule
    * (a, b) → a+b: the standard BPE rewrite where a freshly merged token
    * does not re-merge within the same pass ("aaa" + (a,a) → ["aa","a"]).
    * A single codegen'd fold carrying (result, pending) — the empty
    * string is the no-pending sentinel (symbols are never empty). */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val merged = a + b
    val folded = aggregate(
      syms,
      struct(array().cast("array<string>").as("res"), lit("").as("prev")),
      (st, s) => {
        val res = st.getField("res"); val prev = st.getField("prev")
        when(prev === lit(a) && s === lit(b),
          struct(concat(res, array(lit(merged))).as("res"), lit("").as("prev")))
          .otherwise(struct(
            when(prev === lit(""), res)
              .otherwise(concat(res, array(prev))).as("res"),
            s.as("prev")))
      },
      st => when(st.getField("prev") === lit(""), st.getField("res"))
        .otherwise(concat(st.getField("res"), array(st.getField("prev")))))
    // a sequence with < 1 symbol folds to itself; keep nulls null
    when(syms.isNull, syms).otherwise(folded)
  }

  /** Train `k` merges over `corpus(symsCol)`; returns the learned merge
    * table in order plus the rewritten corpus. Stops early when no pair
    * occurs twice. `rematerializeEvery` bounds plan depth. */
  def trainMerges(corpus: DataFrame, symsCol: String, k: Int,
                  mat: Materialize = Materialize.Local,
                  rematerializeEvery: Int = 4): (Seq[(String, String)], DataFrame) = {
    require(k >= 0, s"k must be >= 0, got $k")
    var df = corpus
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val best = df.select(explode(pairsOf(col(symsCol))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        df = df.withColumn(symsCol, applyMerge(col(symsCol), a, b))
        round += 1
        if (round % rematerializeEvery == 0) df = mat(df)
      }
    }
    (merges.toSeq, df)
  }

  /** Tokenize with a learned merge table: apply every rule in training
    * order — the standard BPE inference pass, one narrow projection per
    * rule. A vocab-scale table (10⁴+ rules) nests 10⁴ fold expressions,
    * so the SAME materialization seam as training bounds plan depth
    * here too. */
  def tokenize(corpus: DataFrame, symsCol: String,
               merges: Seq[(String, String)],
               mat: Materialize = Materialize.Local,
               rematerializeEvery: Int = 16): DataFrame =
    merges.zipWithIndex.foldLeft(corpus) { case (df, ((a, b), i)) =>
      val next = df.withColumn(symsCol, applyMerge(col(symsCol), a, b))
      if ((i + 1) % rematerializeEvery == 0) mat(next) else next
    }
}
