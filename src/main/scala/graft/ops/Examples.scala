package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-example construction: rewrite documents into the (input,
  * target) shapes LM objectives train on. First citizen here is the
  * fill-in-the-middle / span-corruption split (T5's span corruption,
  * Raffel et al., JMLR'20; FIM for code models, Bavarian et al., 2022):
  * cut a middle span out of each document and emit (prefix, middle,
  * suffix).
  *
  * The cut is DETERMINISTIC per document — span length = ⌊dl·num/den⌋,
  * start = 1 + (hash31(id) mod (dl − len + 1)) — so example construction
  * is reproducible across runs and engines (the hash is the portable
  * [[Hashing.hash31]]; all arithmetic is integer). A pipeline reruns and
  * gets byte-identical examples: the property that makes training-data
  * audits and resume-after-failure possible at 100 TB.
  *
  * Scale shape: pure per-row narrow work — one projection, no shuffle,
  * no state. Documents shorter than `minToks` are passed through as
  * prefix-only rows (middle and suffix empty) rather than dropped, so
  * the output row set is exactly the input row set.
  */
object Examples {

  /** `(idCol, prefix, middle, suffix)` token-string split per document.
    *
    * @param frac  middle-span fraction as a rational num/den (default
    *              1/3), kept rational so both engines compute the same
    *              integer length
    */
  def fimSplit(docs: DataFrame, idCol: String, toksCol: String,
               fracNum: Int = 1, fracDen: Int = 3,
               minToks: Int = 3): DataFrame = {
    require(fracNum > 0 && fracDen > fracNum,
      s"middle fraction must be in (0,1), got $fracNum/$fracDen")
    val dl = size(col(toksCol))
    val len = expr(s"(size(`$toksCol`) * $fracNum) div $fracDen")
    val start = lit(1) +
      Hashing.hash31(col(idCol).cast("string")) % (dl - len + lit(1))
    val eligible = dl >= minToks && len >= 1
    def joined(c: Column) = concat_ws(" ", c)
    docs.select(col(idCol),
      when(eligible, joined(slice(col(toksCol), lit(1), start - 1)))
        .otherwise(joined(col(toksCol))).as("prefix"),
      when(eligible, joined(slice(col(toksCol), start, len)))
        .otherwise(lit("")).as("middle"),
      when(eligible, joined(slice(col(toksCol), start + len,
          dl - (start - 1) - len)))
        .otherwise(lit("")).as("suffix"))
  }

  /** DuckDB spelling of [[fimSplit]]'s three fields over a list column
    * `toks` and id expr — 1-based inclusive list slicing mirrors Spark's
    * `slice` exactly. Returns (prefix, middle, suffix) SQL exprs. */
  def fimSplitSql(idExpr: String, toks: String,
                  fracNum: Int = 1, fracDen: Int = 3,
                  minToks: Int = 3): (String, String, String) = {
    val dl = s"len($toks)"
    val len = s"(($dl * $fracNum) // $fracDen)"
    val start = s"(1 + ${Hashing.hash31Sql(s"CAST($idExpr AS VARCHAR)")} % ($dl - $len + 1))"
    val ok = s"($dl >= $minToks AND $len >= 1)"
    // COALESCE: DuckDB's array_to_string of an EMPTY list is NULL, where
    // Spark's concat_ws is '' — normalize to Spark's spelling
    def j(sliceExpr: String) = s"COALESCE(array_to_string($sliceExpr, ' '), '')"
    (s"CASE WHEN $ok THEN ${j(s"($toks)[1:$start - 1]")} ELSE ${j(toks)} END",
     s"CASE WHEN $ok THEN ${j(s"($toks)[$start:$start + $len - 1]")} ELSE '' END",
     s"CASE WHEN $ok THEN ${j(s"($toks)[$start + $len:$dl]")} ELSE '' END")
  }
}
