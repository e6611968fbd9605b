package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Aggregators, TextAnalysis}
import graft.plans.TopKWordsAgg

/** TypedImperativeAggregate top-k == the typed Aggregator UDAF spelling,
  * on real corpus word counts, across a real shuffle (partial/final merge
  * exercises serialize/deserialize). */
class TopKWordsAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("imperative top-k aggregate == Aggregator UDAF on corpus word counts") {
    val sp = spark
    import sp.implicits._
    val pre = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("lang"), explode(TextAnalysis.toks(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      .repartition(7) // force cross-partition partial/final merge
    val viaImperative = pre
      .groupBy(col("lang"))
      .agg(TopKWordsAgg.topK(col("word"), col("cnt"), 5).as("top"))
      .select(col("lang"), explode(col("top")).as("t"))
      .select(col("lang"), col("t.word"), col("t.cnt"))
      .orderBy(col("lang"), col("cnt").desc, col("word"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val topkUdaf = udaf(new Aggregators.TopKWords(5))
    val viaAggregator = pre
      .select(col("lang"), struct(col("word"), col("cnt")).as("wc"))
      .groupBy(col("lang"))
      .agg(topkUdaf(col("wc.word"), col("wc.cnt")).as("top"))
      .select(col("lang"), explode(col("top")).as("t"))
      .select(col("lang"), col("t.word"), col("t.cnt"))
      .orderBy(col("lang"), col("cnt").desc, col("word"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(viaImperative.nonEmpty)
    assert(viaImperative.toSeq === viaAggregator.toSeq)
  }
}
