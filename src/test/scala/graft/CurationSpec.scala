package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Examples, Mixture, TextAnalysis}

/** Mixture sampling and FIM example construction: exact-count and
  * reassembly invariants, determinism, and pass-through edge cases. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 60 a-docs, 30 b-docs, 10 c-docs, 50 unweighted d-docs
  private def corpus = (
    (0 until 60).map(i => (i.toLong, "a")) ++
    (100 until 130).map(i => (i.toLong, "b")) ++
    (200 until 210).map(i => (i.toLong, "c")) ++
    (300 until 350).map(i => (i.toLong, "d"))
  ).toDF("doc_id", "src")

  test("sampleToMixture: kept counts are exactly w_s * min_floor(n_s/w_s)") {
    // u = min(60/3, 30/2, 10/1) = min(20, 15, 10) = 10 → keep 30a 20b 10c
    val kept = Mixture.sampleToMixture(corpus, "doc_id", "src",
      Seq("a" -> 3, "b" -> 2, "c" -> 1))
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc === Map("a" -> 30L, "b" -> 20L, "c" -> 10L))
  }

  test("sampleToMixture: unweighted sources are dropped, runs are stable") {
    val sel = Mixture.sampleToMixture(corpus, "doc_id", "src",
      Seq("a" -> 1, "b" -> 1))
    assert(sel.filter(col("src").isin("c", "d")).count() === 0)
    val ids1 = sel.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val ids2 = Mixture.sampleToMixture(corpus, "doc_id", "src",
        Seq("a" -> 1, "b" -> 1)).orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids1 === ids2)
    assert(ids1.nonEmpty)
  }

  test("sampleToMixture: kept set is hash-rank prefix (growth-stable)") {
    // with every source weight 1 and k = n (u = min n_s = 10), everything
    // weighted is kept — the rank cutoff never drops below the source size
    val allKept = Mixture.sampleToMixture(corpus, "doc_id", "src",
      Seq("a" -> 6, "b" -> 3, "c" -> 1))
    assert(allKept.count() === 100) // u=10 → 60+30+10
  }

  test("sampleToMixture: rejects empty or non-positive weights") {
    intercept[IllegalArgumentException] {
      Mixture.sampleToMixture(corpus, "doc_id", "src", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleToMixture(corpus, "doc_id", "src", Seq("a" -> 0))
    }
  }

  test("lDiverse: homogeneous groups suppressed even when k-anonymous") {
    import graft.ops.Privacy
    val rows = (
      (0 until 6).map(i => (i.toLong, "web", s"lang${i % 3}")) ++   // 6 rows, 3 langs
      (10 until 16).map(i => (i.toLong, "forum", "en"))             // 6 rows, 1 lang
    ).toDF("id", "src", "lang")
    // both groups pass k = 5; only web passes l = 2
    val out = Privacy.lDiverse(rows, Seq("src"), "lang", 5, 2)
    assert(out.select("src").distinct().collect().map(_.getString(0)).toSeq === Seq("web"))
    // and the k gate still applies underneath
    assert(Privacy.lDiverse(rows, Seq("src"), "lang", 7, 1).count() === 0)
  }

  test("fimSplit: prefix+middle+suffix reassemble the document exactly") {
    val docs = (0L until 40L).map(i =>
        (i, (0 until (3 + (i % 17)).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val out = Examples.fimSplit(docs, "doc_id", "toks")
      .withColumn("back", concat_ws(" ",
        filter(split(concat_ws(" ", col("prefix"), col("middle"), col("suffix")),
          " "), w => w =!= "")))
    val orig = docs.select(col("doc_id"), concat_ws(" ", col("toks")).as("orig"))
    val bad = out.join(orig, "doc_id")
      .filter(col("back") =!= col("orig")).count()
    assert(bad === 0)
    // middle length = floor(dl/3) tokens on every eligible doc
    val lens = Examples.fimSplit(docs, "doc_id", "toks")
      .join(docs, "doc_id")
      .select(size(filter(split(col("middle"), " "), w => w =!= "")).as("ml"),
        (size(col("toks")) / 3).cast("int").as("want"))
    assert(lens.filter(col("ml") =!= col("want")).count() === 0)
  }

  test("working columns uniquify against caller collisions") {
    import graft.ops.Privacy
    // caller columns spelled exactly like the operators' internals must
    // pass through untouched (the PrefixSum advice-fix contract)
    val clash = (0 until 6).map(i => (i.toLong, "a", 99L, 77L))
      .toDF("doc_id", "src", "mix_k", "ka_src")
    val mixed = Mixture.sampleToMixture(clash, "doc_id", "src", Seq("a" -> 1))
    assert(mixed.columns.toSeq === Seq("doc_id", "src", "mix_k", "ka_src"))
    assert(mixed.count() === 6 && mixed.select("mix_k").distinct().head().getLong(0) === 99L)
    val anon = Privacy.kAnonymous(clash, Seq("src"), 3)
    assert(anon.columns.toSeq === Seq("doc_id", "src", "mix_k", "ka_src"))
    assert(anon.count() === 6 && anon.select("ka_src").distinct().head().getLong(0) === 77L)
  }

  test("kAnonymous: small groups suppressed, nulls group together, columns intact") {
    import graft.ops.Privacy
    val rows = (
      (0 until 5).map(i => (i.toLong, "en", "web")) ++          // size 5 → kept
      (10 until 12).map(i => (i.toLong, "en", "forum")) ++      // size 2 → dropped
      (20 until 23).map(i => (i.toLong, null.asInstanceOf[String], "web")) // 3 nulls
    ).toDF("id", "lang", "src")
    val k3 = Privacy.kAnonymous(rows, Seq("lang", "src"), 3)
    assert(k3.columns.toSeq === Seq("id", "lang", "src"))
    assert(k3.collect().map(_.getLong(0)).toSet ===
      ((0L until 5L) ++ (20L until 23L)).toSet) // null group of 3 survives k=3
    val k6 = Privacy.kAnonymous(rows, Seq("lang", "src"), 6)
    assert(k6.count() === 0)
    val report = Privacy.kAnonymityReport(rows, Seq("lang", "src"), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(report.toSet === Set(("en", "web", 5L, 1L), ("en", "forum", 2L, 0L),
      (null, "web", 3L, 1L)))
  }

  test("fimSplit: short documents pass through prefix-only") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "x y z"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val rows = Examples.fimSplit(docs, "doc_id", "toks")
      .orderBy("doc_id").collect()
    assert(rows.length === 3) // row set preserved
    assert(rows(0).getString(1) === "a b" && rows(0).getString(2) === ""
      && rows(0).getString(3) === "")
    assert(rows(1).getString(1) === "")
    assert(rows(2).getString(2).nonEmpty) // dl=3 → middle of 1 token
  }
}
