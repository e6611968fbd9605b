package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LangModel

/** Property-based check of the distributed bigram-LM fluency scorer
  * against a sequential in-test oracle on random corpora — the same
  * exact-integer nano-unit contract, independently implemented. Also
  * pins the bigram generator's edge cases (the descending-`sequence`
  * trap) and the broadcast/shuffle spelling equivalence. */
class LangModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential scorer in plain Scala mirroring the quantization:
    * floor((c12+1)/(c1+V) * 1e9) summed per doc. */
  private def oracle(ref: Seq[Seq[String]], corpus: Seq[(Long, Seq[String])])
      : Map[Long, (Long, Long, Long)] = {
    val refBgs = ref.filter(_.length >= 2)
      .flatMap(t => t.init.zip(t.tail).map { case (a, b) => (a, s"$a $b") })
    val c12 = refBgs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = refBgs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = ref.flatten.distinct.size.toLong
    corpus.filter(_._2.length >= 2).map { case (id, toks) =>
      val nanos = toks.init.zip(toks.tail).map { case (a, b) =>
        val num = c12.getOrElse(s"$a $b", 0L) + 1L
        val den = c1.getOrElse(a, 0L) + v
        math.floor(num.toDouble / den.toDouble * 1e9).toLong
      }
      id -> ((nanos.length.toLong, nanos.sum, nanos.sum / nanos.length))
    }.toMap
  }

  private val tokGen = Gen.oneOf("a", "b", "c", "dd", "ee", "f0", "g")
  private val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tokGen))

  test("distributed scorer matches the sequential oracle on random corpora") {
    val prop = Prop.forAll(
      Gen.listOfN(8, docGen), Gen.chooseNum(1, 20).flatMap(n =>
        Gen.listOfN(n, docGen))) { (ref, corpus) =>
      val refDf = ref.map(Tuple1(_)).toDF("toks")
      val corpusIdx = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val corpusDf = corpusIdx.toDF("doc_id", "toks")
      val lm = LangModel.trainBigram(refDf, "toks")
      val got = LangModel.scoreBigramLm(corpusDf, "doc_id", "toks", lm)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      got == oracle(ref, corpusIdx)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("bigramPairs: empty, single-token, and two-token arrays") {
    val df = Seq(
      (1L, Seq.empty[String]), (2L, Seq("x")), (3L, Seq("x", "y")))
      .toDF("id", "toks")
      .select(col("id"), LangModel.bigramPairs(col("toks")).as("p"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Any](1).length).toMap
    assert(rows == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("broadcast and shuffle spellings agree; short docs are excluded") {
    val ref = Seq(Seq("a", "b", "a"), Seq("b", "b")).map(Tuple1(_)).toDF("toks")
    val corpus = Seq((1L, Seq("a", "b", "b")), (2L, Seq("only")), (3L, Seq[String]()))
      .toDF("doc_id", "toks")
    val lm = LangModel.trainBigram(ref, "toks")
    val b = LangModel.scoreBigramLm(corpus, "doc_id", "toks", lm, broadcastLm = true)
      .collect().map(_.toSeq).toSet
    val s = LangModel.scoreBigramLm(corpus, "doc_id", "toks", lm, broadcastLm = false)
      .collect().map(_.toSeq).toSet
    assert(b == s)
    assert(b.map(_.head) == Set(1L)) // doc 2 (1 token) and doc 3 (empty) excluded
  }

  test("fluency buckets split on the integer thresholds exactly") {
    val df = Seq(35000000L, 34999999L, 31000000L, 30999999L).toDF("m")
      .select(LangModel.fluencyBucket(col("m"), 35000000L, 31000000L).as("b"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("head", "middle", "middle", "tail"))
  }
}
