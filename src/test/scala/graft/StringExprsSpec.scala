package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Hashing, TextAnalysis}

/** Native NFC normalization: agreement with java.text.Normalizer,
  * idempotence, null propagation, and the dedup motivation (equivalent
  * forms hash identically after normalization). */
class StringExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples = Seq(
    "plain ascii",
    "café decomposed",          // e + combining acute
    "café composed",                  // precomposed
    "mixed Å and Å rings", // A+ring vs Å
    "")

  test("normalizeNfc == java.text.Normalizer NFC, null propagates") {
    val got = (samples.map(Option(_)) :+ None).toDF("s")
      .select(TextAnalysis.normalizeNfc(col("s"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    val want = samples.map(Normalizer.normalize(_, Normalizer.Form.NFC)) :+ null
    assert(got.toSeq === want)
  }

  test("normalizeNfc is idempotent and shrinks decomposed length by one") {
    val df = Seq("abc é xyz").toDF("s")
      .select(col("s"), TextAnalysis.normalizeNfc(col("s")).as("n1"))
      .select(col("s"), col("n1"), TextAnalysis.normalizeNfc(col("n1")).as("n2"),
        length(col("s")).as("lr"), length(col("n1")).as("ln"))
    val r = df.collect().head
    assert(r.getString(1) === r.getString(2))          // idempotent
    assert(r.getInt(4) === r.getInt(3) - 1)            // é composed
  }

  test("canonically equivalent forms hash identically after NFC") {
    val df = Seq(("café", "café")).toDF("a", "b")
      .select(
        Hashing.hash31(TextAnalysis.normalizeNfc(col("a"))).as("ha"),
        Hashing.hash31(TextAnalysis.normalizeNfc(col("b"))).as("hb"),
        Hashing.hash31(col("a")).as("ra"), Hashing.hash31(col("b")).as("rb"))
    val r = df.collect().head
    assert(r.getLong(0) === r.getLong(1))  // normalized: same signature
    assert(r.getLong(2) !== r.getLong(3))  // raw: dedup would miss them
  }
}
