package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** ANN quality: recall@k of single-probe and multi-probe LSH against the
  * brute-force ground truth. Multi-probe must dominate single-probe. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multi-probe ANN recall >= single-probe recall, both vs brute force") {
    val planes = Similarity.planes(4, 64)
    val e = Similarity.prepare(
      Tables.embeddings(spark, TestSpark.Sf0001), "vec_id", "embedding")
    val isQuery = col("vec_id") % 50 === 0
    val q = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("ev").as("qv"), col("nrm").as("qn"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val truth = pairs(Similarity.bruteForceTopK(e, q, 5))
    val single = pairs(Similarity.annTopK(e, isQuery, planes, 5))
    val multi = pairs(Similarity.annTopKMultiProbe(e, isQuery, planes, 5))
    def recall(found: Set[(Long, Long)]): Double =
      found.intersect(truth).size.toDouble / truth.size
    assert(truth.nonEmpty)
    // candidate sets widen, so TRUE matches can only be displaced by other
    // true matches — recall is monotone (top-k sets themselves are not)
    assert(recall(multi) >= recall(single))
    assert(recall(multi) > 0.3) // 5 probes of 16 buckets find a real share
  }

  test("stored IVF layout: multi-probe recall >= single-probe, vs brute force") {
    val planes = Similarity.planes(4, 64)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_recall")
      .resolve("emb").toString
    val e = Similarity.prepare(
      Tables.embeddings(spark, TestSpark.Sf0001), "vec_id", "embedding")
    Similarity.writeBucketed(e.select(col("vec_id"), col("ev").as("v")),
      planes, dir)
    val isQuery = col("vec_id") % 50 === 0
    val q = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("ev").as("qv"), col("nrm").as("qn"))
    val probes = q.select(col("qid"), col("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth excludes self-matches like bruteForceTopK does; the
    // stored probe keeps self (a real user query is not in the corpus),
    // so drop self pairs from both sides before comparing
    def noSelf(s: Set[(Long, Long)]) = s.filterNot { case (a, b) => a == b }
    val truth = pairs(Similarity.bruteForceTopK(e, q, 6)) // 6 ≥ 5 non-self
    val single = noSelf(pairs(
      Similarity.probeBucketedMany(spark, dir, probes, planes, 6)))
    val multi = noSelf(pairs(
      Similarity.probeBucketedMany(spark, dir, probes, planes, 6,
        multiProbe = true)))
    def recall(found: Set[(Long, Long)]): Double =
      found.intersect(truth).size.toDouble / truth.size
    assert(truth.nonEmpty)
    assert(recall(multi) >= recall(single))
    assert(recall(multi) > 0.3)
    assert(recall(single) > 0.0)
  }
}
