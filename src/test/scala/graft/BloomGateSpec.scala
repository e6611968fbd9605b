package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.BloomGate

/** Bloom-gated exact membership: equivalence with the plain left-join
  * spelling (the sketch prunes, never decides), the no-false-negative
  * guarantee the pruning relies on, and the gate actually pruning. */
class BloomGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus keys k0..k499; batch overlaps on the even half, adds novel
  // keys, a duplicate-keyed row pair, and a null key
  private def corpus = (0 until 500).map(i => s"k$i").toDF("ck")
  private def batch = (
    (0 until 250).map(i => (i.toLong, s"k${2 * i}")) ++      // dups
    (0 until 250).map(i => (1000L + i, s"new$i")) ++          // novel
    Seq((2000L, "k0"), (2001L, null.asInstanceOf[String]))    // repeat + null
  ).toDF("id", "ck")

  test("tagDuplicates == plain left-join spelling, row for row") {
    val gated = BloomGate.tagDuplicates(corpus, batch, "ck", 1000, 0.01)
      .select("id", "ck", "is_dup")
    val plain = batch.join(
        corpus.select(col("ck")).distinct().withColumn("hit", lit(1)),
        Seq("ck"), "left")
      .select(col("id"), col("ck"), col("hit").isNotNull.as("is_dup"))
    assert(gated.count() === batch.count())
    assert(gated.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(gated).count() === 0)
  }

  test("no false negatives: every corpus key probes positive") {
    val bloom = BloomGate.buildBloom(corpus, col("ck"), 1000, 0.01)
    val misses = corpus.filter(!BloomGate.mightContain(bloom, col("ck"))).count()
    assert(misses === 0)
  }

  test("the gate prunes: most novel keys never reach the join") {
    val bloom = BloomGate.buildBloom(corpus, col("ck"), 1000, 0.01)
    val novel = (0 until 1000).map(i => s"zz$i").toDF("ck")
    val passed = novel.filter(BloomGate.mightContain(bloom, col("ck"))).count()
    // fpp 1% over 1000 disjoint keys: expect ~10 through, allow slack
    assert(passed < 100, s"bloom passed $passed of 1000 disjoint keys")
  }

  test("empty corpus: everything is new") {
    val out = BloomGate.tagDuplicates(corpus.filter(lit(false)), batch, "ck", 10)
    assert(out.filter(col("is_dup")).count() === 0)
    assert(out.count() === batch.count())
  }

  test("caller columns named like the working columns survive") {
    val clash = batch.withColumn("bg_maybe", lit("keep"))
      .withColumn("bg_hit", lit(7))
    val out = BloomGate.tagDuplicates(corpus, clash, "ck", 1000)
    assert(out.columns.count(_ == "bg_maybe") === 1)
    assert(out.select("bg_maybe").distinct().as[String].collect().toSeq === Seq("keep"))
    assert(out.filter(col("bg_hit") =!= 7).count() === 0)
  }
}
