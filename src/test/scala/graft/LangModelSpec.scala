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

  /** A reference satisfying trainBigram's contract (≥ 1 token): the
    * unconstrained generator can shrink a failure all the way to eight
    * empty docs, which is a CONTRACT violation (V = 0), not a scoring
    * discrepancy — that edge has its own loud-fail test below. */
  private val refGen =
    Gen.listOfN(8, docGen).suchThat(_.exists(_.nonEmpty))

  test("distributed scorer matches the sequential oracle on random corpora") {
    val prop = Prop.forAll(
      refGen, Gen.chooseNum(1, 20).flatMap(n =>
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

  test("token-free reference fails loudly at scoring, not DIVIDE_BY_ZERO") {
    val lm = LangModel.trainBigram(
      Seq(Seq.empty[String], Seq.empty[String]).map(Tuple1(_)).toDF("toks"),
      "toks")
    val corpus = Seq((1L, Seq("a", "b"))).toDF("doc_id", "toks")
    val ex = intercept[Exception](
      LangModel.scoreBigramLm(corpus, "doc_id", "toks", lm).collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("reference slice contains no tokens"))),
      s"unexpected: $ex")
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

  test("classifier matches a sequential oracle on random labeled corpora") {
    val labGen = Gen.oneOf("en", "fr", "de")
    val labeledGen = Gen.listOfN(12,
      for { c <- labGen; d <- docGen.suchThat(_.nonEmpty) } yield (c, d))
    val corpusGen = Gen.listOfN(15, for {
      id <- Gen.chooseNum(0L, 50L); d <- docGen } yield (id, d))
      .map(_.distinctBy(_._1))
    val prop = Prop.forAll(labeledGen, corpusGen) { (lab, corp) =>
      val labDf = lab.toDF("cls", "toks")
      val corpDf = corp.toDF("doc_id", "toks")
      val lm = LangModel.trainClassLm(labDf, "cls", "toks")
      val got = LangModel.classifyUnigram(corpDf, "doc_id", "toks", lm)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      // sequential argmax with the same tie order
      val ex = lab.flatMap { case (c, ts) => ts.map(c -> _) }
      val cwc = ex.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nc = ex.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val v = ex.map(_._2).distinct.size.toLong
      val classes = nc.keys.toSeq.sorted
      val want = corp.filter(_._2.nonEmpty).map { case (id, toks) =>
        val scored = classes.map { c =>
          val nanos = toks.map { w =>
            math.floor((cwc.getOrElse((c, w), 0L) + 1L).toDouble /
              (nc(c) + v).toDouble * 1e9).toLong
          }
          (c, nanos.sum / nanos.length)
        }
        // max mean; ties to lexicographically SMALLEST class — classes is
        // sorted asc and maxBy keeps the FIRST of equal keys
        val (cls, mean) = scored.maxBy(_._2)
        id -> ((cls, toks.length.toLong, mean))
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("classifier tie-break is the lexicographically smallest class") {
    // symmetric training: both classes give every token identical counts,
    // so every document ties across classes and must resolve to "aa"
    val lab = Seq(("bb", Seq("x", "y")), ("aa", Seq("x", "y"))).toDF("cls", "toks")
    val corpus = Seq((1L, Seq("x")), (2L, Seq("y", "z"))).toDF("doc_id", "toks")
    val lm = LangModel.trainClassLm(lab, "cls", "toks")
    val got = LangModel.classifyUnigram(corpus, "doc_id", "toks", lm)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "aa", 2L -> "aa"))
  }
}
