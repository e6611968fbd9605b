package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Salted join/agg: result equivalence with the plain spellings, and the
  * exchange actually scatters the hot key across salt buckets. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one key — the single-hot-key pathology
  private def big = spark.range(0, 20000).select(
    when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(99L)).as("k"),
    col("id").as("rid"),
    (col("id") % 1000).as("v"))
  private def small = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "label")

  test("saltedJoin == plain join, row for row") {
    val plain = big.join(small, Seq("k")).select("k", "rid", "v", "label")
    val salted = Skew.saltedJoin(big, small, "k", "rid", salts = 8)
      .select("k", "rid", "v", "label")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin scatters the hot key across salt buckets") {
    val spread = big.filter(col("k") === 99L)
      .select(pmod(xxhash64(col("k"), col("rid")), lit(8L)).as("salt"))
      .groupBy("salt").count().collect()
    assert(spread.length === 8) // hot key present in every bucket
    val counts = spread.map(_.getLong(1))
    assert(counts.max < counts.sum / 2) // no bucket dominates
  }

  test("saltedJoin survives caller columns named like the salt") {
    val clash = big.withColumn("skw_salt", lit("keep me"))
    val out = Skew.saltedJoin(clash, small, "k", "rid", salts = 4)
    assert(out.columns.count(_ == "skw_salt") === 1)
    assert(out.select("skw_salt").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("keep me"))
  }

  test("saltedAgg == plain aggregation") {
    val plain = big.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k")
    val salted = Skew.saltedAgg(big, Seq("k"), "rid", 8,
      partial = Seq("pn" -> count(lit(1)), "ps" -> sum(col("v"))),
      merge = Seq("n" -> sum(col("pn")), "s" -> sum(col("ps"))))
      .orderBy("k")
    assert(salted.collect().toSeq === plain.collect().toSeq)
  }
}
