package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Search

/** Property-based check of the distributed BM25 against a sequential
  * in-test oracle on random corpora and queries — same exact-integer
  * micro-unit contract, independently implemented, compared value for
  * value (stronger than the fixed hand-computed example: a systematic
  * bug in the Spark spelling cannot track a bug here). */
class SearchPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential BM25 in plain Scala, mirroring [[Search.bm25Micro]]. */
  private def bm25Oracle(docs: Seq[(Long, Seq[String])],
                         queries: Seq[(Int, Seq[String])],
                         k: Int): Map[(Int, Int), (Long, Long)] = {
    val n = docs.length.toLong
    val sdl = docs.map(_._2.length.toLong).sum
    val avgdl = sdl.toDouble / n.toDouble
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    def micro(tf: Long, dfT: Long, dl: Long): Long = {
      val idf = ((n - dfT) + 0.5) / (dfT + 0.5)
      val num = (1.0 + Search.K1) * tf
      val den = tf + Search.K1 * ((1.0 - Search.B) + (Search.B * dl) / avgdl)
      math.floor(idf * num / den * 1000000.0 + 0.5).toLong
    }
    queries.flatMap { case (qid, qtoks) =>
      val scored = docs.flatMap { case (id, toks) =>
        val s = qtoks.distinct.map { t =>
          val tf = toks.count(_ == t).toLong
          if (tf == 0) 0L else micro(tf, df(t), toks.length.toLong)
        }.sum
        if (s == 0 && qtoks.distinct.forall(t => !toks.contains(t))) None
        else Some(id -> s)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (qid, i + 1) -> ((id, s))
      }
    }.toMap
  }

  private val vocab = ('a' to 'j').map(_.toString)
  private val corpusGen: Gen[(List[(Long, List[String])], List[(Int, List[String])])] =
    for {
      nDocs <- Gen.choose(2, 20)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 15)
        toks <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield toks)
      nQ <- Gen.choose(1, 3)
      qs <- Gen.listOfN(nQ, for {
        len <- Gen.choose(1, 4)
        toks <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield toks)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      qs.zipWithIndex.map { case (t, i) => (i + 1, t) })

  test("distributed BM25 == sequential oracle on random corpora") {
    val prop = Prop.forAllNoShrink(corpusGen) { case (docs, queries) =>
      val k = 5
      val expected = bm25Oracle(docs, queries, k)
      val docsDF = docs.map { case (id, t) => (id, t.toArray) }.toDF("doc_id", "toks")
      val qsDF = queries.map { case (q, t) => (q, t.toArray) }.toDF("qid", "qtoks")
      val got = Search.bm25TopK(docsDF, "doc_id", "toks", qsDF, "qid", "qtoks", k)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }
}
