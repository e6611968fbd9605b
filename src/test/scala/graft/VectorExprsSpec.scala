package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Hashing, Similarity, TextAnalysis}

/** Native codegen'd vector expressions vs their builtin HOF twins —
  * BIT-exact equivalence on real testdata, plus null-propagation parity. */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProduct == aggregate(zip_with) HOF spelling, bit for bit") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .limit(500)
      .select(
        Similarity.dot(col("x.v"), col("y.v")).as("native"),
        Similarity.dotHof(col("x.v"), col("y.v")).as("hof"))
    val rows = pairs.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct == HOF on adversarial doubles (NaN, ±Inf, denormal, ±0.0)") {
    val specials = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, -0.0, 0.0, 1e308, -1e308, 1e-300, math.Pi)
    val gen = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      def v = (1 to 16).map { _ =>
        if (gen.nextDouble() < 0.2) specials(gen.nextInt(specials.length))
        else gen.nextDouble() * math.pow(10, gen.nextInt(600) - 300)
      }
      (v, v.map(x => if (gen.nextBoolean()) x else gen.nextDouble()))
    }
    val out = rows.toDF("a", "b").select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct null propagation: null array, length mismatch, null element") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (2L, Seq(1.0, 2.0), Seq(3.0))).toDF("id", "a", "b")
      .withColumn("a", when(col("id") === 3, lit(null)).otherwise(col("a")))
    val out = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) === 11.0)
    assert(out(1).isNullAt(1)) // length mismatch → null, like zip_with padding
    val withNullArr = df.select(
      Similarity.dot(lit(null).cast("array<double>"), col("b")).as("d")).collect()
    assert(withNullArr.forall(_.isNullAt(0)))
  }

  test("ArrayHash31 == transform(arr, hash31), incl. null elements") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(TextAnalysis.toks(col("text")).as("toks"))
      .withColumn("toks",
        // plant a null element to check null mapping parity
        concat(col("toks"), array(lit(null).cast("string"))))
    val out = docs.select(
      Hashing.hash31Array(col("toks")).as("native"),
      transform(col("toks"), t => Hashing.hash31(t)).as("hof"))
    assert(out.count() > 0)
    assert(out.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("CharGramHash31 == HOF substr/hash31 spelling on real text") {
    val out = Tables.documents(spark, TestSpark.Sf0001)
      .filter(length(col("text")) >= 4)
      .select(
        Dedup.charGramHashes(col("text"), 4).as("native"),
        Dedup.charGramHashesHof(col("text"), 4).as("hof"))
    assert(out.count() > 0)
    assert(out.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("WinnowMin == HOF slice/array_min/array_distinct spelling") {
    val out = Tables.documents(spark, TestSpark.Sf0001)
      .filter(length(col("text")) >= 9)
      .select(Dedup.charGramHashes(col("text"), 4).as("g"))
      .localCheckpoint() // materialize so both spellings read stored longs
      .select(
        Dedup.winnowFingerprints(col("g"), 5).as("native"),
        Dedup.winnowFingerprintsHof(col("g"), 5).as("hof"))
    assert(out.count() > 0)
    assert(out.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("WinnowMin null contract: null element → null result, like DotProduct/SimHash16") {
    val df = Seq(
      (1L, Seq[java.lang.Long](5L, 3L, 7L, 2L, 9L, 4L)),
      (2L, Seq[java.lang.Long](5L, null, 7L, 2L, 9L, 4L))).toDF("id", "g")
    val out = df.select(col("id"), Dedup.winnowFingerprints(col("g"), 3).as("fp"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(0).getSeq[Long](1).nonEmpty)
    assert(out(1).isNullAt(1), "a null hash slot must not leak into fingerprints")
    // whole-array null propagates too
    val nullArr = df.select(
      Dedup.winnowFingerprints(lit(null).cast("array<bigint>"), 3).as("fp")).collect()
    assert(nullArr.forall(_.isNullAt(0)))
  }

  test("SimHash16 == 16-fold aggregate vote spelling on real bigram bags") {
    val wh = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        transform(Dedup.shingleBag(col("toks"), 2), g => Hashing.hash31(g)).as("hs"))
      .localCheckpoint()
    val out = wh.select(
      Dedup.simhash16(col("hs")).as("native"),
      Dedup.simhash16Hof(col("hs")).as("hof"))
    assert(out.count() > 0)
    assert(out.filter(col("native") =!= col("hof")).count() === 0)
    assert(out.filter(col("native") < 0 || col("native") >= 65536).count() === 0)
  }
  test("SqDistLong == HOF zip_with spelling on quantized embeddings, incl. null contract") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"), Similarity.quantize(col("embedding"), 1000).as("q"))
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id")).limit(300)
      .select(
        Similarity.sqDistInt(col("x.q"), col("y.q")).as("native"),
        Similarity.sqDistIntHof(col("x.q"), col("y.q")).as("hof"))
    assert(pairs.count() === 300)
    assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
    val nulls = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, null)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L))).toDF("a", "b")
      .select(Similarity.sqDistInt(col("a"), col("b")).as("d")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }
  test("TokenShingleHash31 == hash31Array + shingleHashes chain, incl. null tokens") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(TextAnalysis.toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val out = docs
      .withColumn("th", Hashing.hash31Array(col("toks")))
      .select(
        Dedup.tokenShingleHashes(col("toks"), 3).as("fused"),
        Dedup.shingleHashes(col("th"), 3).as("chain"))
    assert(out.count() > 0)
    assert(out.filter(not(col("fused") <=> col("chain"))).count() === 0)
    // null token → null shingle hashes for its windows, same as the chain
    val withNull = Seq(Seq[String]("a", "b", null, "c", "d", "e")).toDF("toks")
      .withColumn("th", Hashing.hash31Array(col("toks")))
      .select(
        Dedup.tokenShingleHashes(col("toks"), 3).as("fused"),
        Dedup.shingleHashes(col("th"), 3).as("chain"))
      .collect()(0)
    assert(withNull.getSeq[Any](0) === withNull.getSeq[Any](1))
  }
  test("RepeatedHashFrac == string-window repeatedFrac when windows are collision-free") {
    // On real text the mix-hash windows collide with negligible probability,
    // so hashed and string fractions agree exactly; assert doc by doc.
    val out = Tables.documents(spark, TestSpark.Sf0001)
      .select(TextAnalysis.toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        TextAnalysis.repeatedHashFrac(col("toks"), 8, 8, partial = true).as("hc"),
        TextAnalysis.repeatedFrac(TextAnalysis.tokenChunks(col("toks"), 8)).as("sc"),
        TextAnalysis.repeatedHashFrac(col("toks"), 2, 1, partial = false).as("hb"),
        TextAnalysis.repeatedFrac(Dedup.shingleBag(col("toks"), 2)).as("sb"))
    assert(out.count() > 0)
    assert(out.filter(col("hc") =!= col("sc") || col("hb") =!= col("sb")).count() === 0)
    // degenerate repetition: 30 identical tokens → both fracs near 1
    val spam = Seq(Seq.fill(30)("spam")).toDF("toks").select(
      TextAnalysis.repeatedHashFrac(col("toks"), 2, 1, partial = false).as("hb")).collect()
    assert(spam(0).getDouble(0) > 0.95)
  }
  test("TokenWindowHash64: positional, equality ≡ window equality on " +
      "real text, sub-n empty, null token nulls covering windows") {
    // hash equality must match string-window equality exactly on the
    // corpus (64-bit collisions are negligible at this scale): compare
    // the distinct-count of hashes vs of the window STRINGS per doc
    val n = 3
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(TextAnalysis.toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
    val out = docs.select(
      Hashing.windowHash64(col("toks"), n).as("wh"),
      transform(sequence(lit(1), size(col("toks")) - (n - 1)),
        p => array_join(slice(col("toks"), p, lit(n)), " ")).as("ws"))
    assert(out.count() > 0)
    // positional: same length; same equality classes position by position
    val bad = out.filter(
      size(col("wh")) =!= size(col("ws")) ||
      size(array_distinct(col("wh"))) =!= size(array_distinct(col("ws"))))
    assert(bad.count() === 0)
    // sub-n input → empty array, never negative-length fabrication
    val short = Seq(Seq("a", "b")).toDF("toks")
      .select(Hashing.windowHash64(col("toks"), 3).as("wh")).collect()(0)
    assert(short.getSeq[Any](0) === Seq.empty)
    // null token nulls exactly the windows covering it
    val withNull = Seq(Seq[String]("a", "b", null, "c", "d", "e")).toDF("toks")
      .select(Hashing.windowHash64(col("toks"), 3).as("wh")).collect()(0)
      .getSeq[Any](0)
    assert(withNull.size === 4)
    assert(withNull(0) == null && withNull(1) == null && withNull(2) == null)
    assert(withNull(3) != null) // window c,d,e is clean
  }
  test("WindowFold64(TokenHash64(toks), n) ≡ TokenWindowHash64(toks, n) " +
      "at every width on real text — the hash-once contract q158's " +
      "six-width build relies on") {
    val ns = Seq(2, 3, 5, 10)
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .withColumn("tokh", Hashing.tokenHash64(col("toks")))
    ns.foreach { n =>
      val bad = docs.filter(not(
        Hashing.windowFold64(col("tokh"), n) <=>
          Hashing.windowHash64(col("toks"), n)))
      assert(bad.count() === 0, s"width $n fold/fused mismatch")
    }
    // sub-n input → empty, not negative-length fabrication
    val short = Seq(Seq("a", "b")).toDF("toks")
      .select(Hashing.windowFold64(
        Hashing.tokenHash64(col("toks")), 3).as("wh")).collect()(0)
    assert(short.getSeq[Any](0) === Seq.empty)
    // null token → null hash slot → null covering windows, same as fused
    val withNull = Seq(Seq[String]("a", "b", null, "c", "d", "e")).toDF("toks")
      .select(Hashing.windowFold64(
        Hashing.tokenHash64(col("toks")), 3).as("wh")).collect()(0)
      .getSeq[Any](0)
    assert(withNull.size === 4)
    assert(withNull.take(3).forall(_ == null) && withNull(3) != null)
  }
}
