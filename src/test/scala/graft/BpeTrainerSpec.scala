package graft

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BpeTrainer

/** Distributed BPE training vs a sequential in-test oracle on random
  * corpora: identical merge tables (same deterministic tie-break) and
  * identical rewritten corpora, across partitionings. */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def applyMergeSeq(syms: List[String], a: String, b: String): List[String] = {
    val out = ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def trainSeq(corpus0: List[List[String]], k: Int)
      : (List[(String, String)], List[List[String]]) = {
    var corpus = corpus0
    val merges = ListBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val counts = corpus.filter(_.length >= 2).flatMap(s => s.init.zip(s.tail))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val (a, b) = eligible.toSeq
          .minBy { case ((pa, pb), c) => (-c, pa, pb) }._1
        merges += ((a, b))
        corpus = corpus.map(applyMergeSeq(_, a, b))
        round += 1
      }
    }
    (merges.toList, corpus)
  }

  private val symGen = Gen.oneOf("a", "b", "c", "d")
  private val seqGen = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, symGen))

  test("distributed training matches the sequential oracle") {
    val prop = Prop.forAll(
      Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, seqGen)),
      Gen.chooseNum(1, 4)) { (corpus, nPart) =>
      val df = corpus.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "syms").repartition(nPart)
      val (merges, rewritten) = BpeTrainer.trainMerges(df, "syms", 5)
      val gotCorpus = rewritten.collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val (expMerges, expCorpus) = trainSeq(corpus.map(_.toList), 5)
      merges == expMerges &&
        gotCorpus == corpus.indices.map(i => i.toLong -> expCorpus(i)).toMap
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("applyMerge: non-overlapping left-to-right semantics") {
    val df = Seq(
      (1L, Seq("a", "a", "a")), (2L, Seq("a", "b", "b")),
      (3L, Seq("a")), (4L, Seq.empty[String]))
      .toDF("id", "syms")
    val aa = df.select(col("id"),
        BpeTrainer.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(aa == Map(1L -> List("aa", "a"), 2L -> List("a", "b", "b"),
      3L -> List("a"), 4L -> Nil))
  }

  test("tokenize replays the learned table; early-stop when nothing repeats") {
    val df = Seq((1L, Seq("x", "y", "x", "y")), (2L, Seq("x", "y")))
      .toDF("id", "syms")
    val (merges, _) = BpeTrainer.trainMerges(df, "syms", 10)
    // round 1: (x,y) x3 -> xy; round 2: (xy,xy) occurs once only -> stop
    assert(merges == Seq(("x", "y")))
    val tok = BpeTrainer.tokenize(df, "syms", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(tok == Map(1L -> List("xy", "xy"), 2L -> List("xy")))
  }
}
