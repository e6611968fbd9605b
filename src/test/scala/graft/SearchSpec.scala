package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Search, Selection, TextAnalysis}

/** BM25 search, decontamination, and importance selection: hand-checked
  * scores on tiny corpora, ranking invariants, and the plan shapes the
  * 100 TB story depends on (query side broadcast, heap top-k). */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toksDF(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))

  // ---- BM25 ----

  test("bm25: hand-computed score on a two-doc corpus") {
    // corpus: d1 = "a b", d2 = "a a c d" → N=2, sdl=6, avgdl=3
    val docs = toksDF(Seq(1L -> "a b", 2L -> "a a c d"))
    val qs = Seq((1, "a")).toDF("qid", "qtext")
      .select(col("qid"), TextAnalysis.toks(col("qtext")).as("qtoks"))
    val out = Search.bm25TopK(docs, "doc_id", "toks", qs, "qid", "qtoks", 10)
      .orderBy("rnk").collect()
    // term a: df=2 → idf = (2-2+0.5)/(2+0.5) = 0.2
    def micro(tf: Int, dl: Int): Long = {
      val num = 2.2 * tf
      val den = tf + 1.2 * (0.25 + (0.75 * dl) / 3.0)
      math.floor(0.2 * num / den * 1e6 + 0.5).toLong
    }
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L)) // tf=2 beats tf=1
    assert(out(0).getLong(3) === micro(2, 4))
    assert(out(1).getLong(3) === micro(1, 2))
  }

  test("bm25: more matched query terms outrank one hot term (saturation)") {
    // d1 repeats "x" eight times; d2 has x+y+z once each — BM25's tf
    // saturation must prefer the multi-term match for query "x y z"
    val docs = toksDF(Seq(
      1L -> "x x x x x x x x",
      2L -> "x y z p q r s t",
      3L -> "p q r s t u v w"))
    val qs = Seq((1, "x y z")).toDF("qid", "qtext")
      .select(col("qid"), TextAnalysis.toks(col("qtext")).as("qtoks"))
    val top = Search.bm25TopK(docs, "doc_id", "toks", qs, "qid", "qtoks", 3)
      .orderBy("rnk").collect()
    assert(top.head.getLong(2) === 2L)
    // d3 shares no query term → never retrieved at all
    assert(!top.map(_.getLong(2)).contains(3L))
  }

  test("bm25: plan broadcasts the query side and ranks via the heap operator") {
    val docs = toksDF((0L until 50L).map(i => i -> s"w$i common"))
    val qs = Seq((1, "common w7")).toDF("qid", "qtext")
      .select(col("qid"), TextAnalysis.toks(col("qtext")).as("qtoks"))
    val plan = Search.bm25TopK(docs, "doc_id", "toks", qs, "qid", "qtoks", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"no broadcast:\n$plan")
    assert(plan.contains("TopKPerGroup"), s"no heap top-k:\n$plan")
  }

  // ---- decontamination ----

  test("decontaminate: finds embedded test items, counts shared grams") {
    val test = toksDF(Seq(100L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9"))
    val corpus = toksDF(Seq(
      // contains the test doc verbatim behind a prefix → both interior
      // 8-grams (t1..t8, t2..t9) survive
      1L -> "junk t1 t2 t3 t4 t5 t6 t7 t8 t9",
      // shares only a 7-gram → below the n=8 bar
      2L -> "t1 t2 t3 t4 t5 t6 t7 x y z",
      3L -> "clean words only here nothing shared at all"))
    val hits = Dedup.decontaminate(corpus, test, "doc_id", "toks", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(1L -> 2L))
  }

  test("decontaminate: document shorter than n cannot be flagged") {
    val test = toksDF(Seq(100L -> "a b c d e f g h"))
    val corpus = toksDF(Seq(1L -> "a b c d e f g")) // 7 < n=8
    assert(Dedup.decontaminate(corpus, test, "doc_id", "toks", 8).count() === 0)
  }

  // ---- cross-source overlap matrix ----

  private def srcDF(rows: Seq[(String, String)]) =
    rows.toDF("source", "text")
      .select(col("source"), TextAnalysis.toks(col("text")).as("toks"))

  test("crossOverlap: shared grams counted once per pair, disjoint pairs absent") {
    val span = "s1 s2 s3 s4 s5 s6 s7 s8" // one 8-gram, shared by a and b
    val docs = srcDF(Seq(
      "a" -> s"$span tail1 tail2 tail3",
      // b carries the span twice (two docs) — distinct-per-group still 1
      "b" -> s"$span other1 other2",
      "b" -> s"prefix $span",
      "c" -> "entirely different words with no shared window at all x1 x2"))
    val got = Dedup.crossOverlap(docs, "source", "toks", 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set(("a", "b")), s"got $got")
    assert(got(("a", "b")) == 1L, "the span is ONE distinct 8-gram per group")
  }

  test("crossOverlap: containment normalizes by the smaller gram set") {
    // a = exactly the 9-token doc (2 distinct 8-grams), b = the same doc
    // plus unrelated bulk → shared = 2, containment = 2 / |grams_a| = 1.0
    val core = "c1 c2 c3 c4 c5 c6 c7 c8 c9"
    val docs = srcDF(Seq(
      "a" -> core,
      "b" -> s"$core b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"))
    val row = Dedup.crossOverlap(docs, "source", "toks", 8).collect().head
    assert(row.getLong(2) == 2L, "shared")
    assert(row.getLong(3) == 2L, "grams_a")
    assert(row.getLong(4) > 2L, "grams_b")
    assert(math.abs(row.getDouble(5) - 1.0) < 1e-12, "containment")
  }

  test("crossOverlap: three-way shared gram yields all three pairs") {
    val span = "z1 z2 z3 z4 z5 z6 z7 z8"
    val docs = srcDF(Seq("a" -> span, "b" -> s"$span u1", "c" -> s"v1 $span"))
    val pairs = Dedup.crossOverlap(docs, "source", "toks", 8)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  // ---- importance selection ----

  test("importanceTopK: target-like documents outrank background-like") {
    // target speaks mostly "tgt"; background docs speak "bg"
    val corpus = toksDF(Seq(
      1L -> "tgt tgt tgt tgt",
      2L -> "tgt tgt bg bg",
      3L -> "bg bg bg bg",
      4L -> "bg bg bg bg"))
    val target = toksDF(Seq(100L -> "tgt tgt tgt tgt tgt tgt tgt tgt"))
      .select(col("toks"))
    val out = Selection.importanceTopK(corpus, target, "doc_id", "toks", 4)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq.take(2) === Seq(1L, 2L))
    // scores strictly decrease from all-target to no-target (ties between
    // the two identical bg docs broken by doc_id)
    val scores = out.map(_.getLong(2)).toSeq
    assert(scores(0) > scores(1) && scores(1) > scores(2))
    assert(scores(2) === scores(3))
  }

  test("importanceTopK: k caps the selection") {
    val corpus = toksDF((0L until 30L).map(i => i -> "w x y z"))
    val target = toksDF(Seq(100L -> "w w w")).select(col("toks"))
    assert(Selection.importanceTopK(corpus, target, "doc_id", "toks", 7).count() === 7)
  }

  // ---- degenerate inputs: empty/null rows must not fail the plans ----

  test("edge cases: empty-token and null-token rows flow through, never throw") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Some(Seq("a", "b", "c"))),
      (2L, Some(Seq.empty[String])), // empty doc
      (3L, None))                    // null toks
      .toDF("doc_id", "toks")
    val qs = Seq((1, Seq("a"))).toDF("qid", "qtoks")
    // BM25: doc 2 contributes no terms, doc 3's explode drops the row
    val bm = Search.bm25TopK(corpus, "doc_id", "toks", qs, "qid", "qtoks", 10)
      .collect()
    assert(bm.map(_.getLong(2)).toSet === Set(1L))
    // decontaminate: short/empty/null docs simply cannot be flagged
    val test = Seq((9L, Seq("a", "b", "c", "d", "e", "f", "g", "h")))
      .toDF("doc_id", "toks")
    assert(Dedup.decontaminate(corpus, test, "doc_id", "toks", 8).count() === 0)
    // selection: docs with no tokens are dropped (no score is defined),
    // the rest rank normally
    val sel = Selection.importanceTopK(corpus,
      Seq(Tuple1(Seq("a"))).toDF("toks"), "doc_id", "toks", 10).collect()
    assert(sel.map(_.getLong(1)).toSet === Set(1L))
  }

  // ---- fuzzy join ----

  test("fuzzyJoin: one-token edits pair up, two-token edits stay unblocked") {
    import spark.implicits._
    val ents = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta GAMMA delta"),   // 1 substitution → shares deletion key
      (3L, "alpha BETA gamma DELTA"),   // 2 substitutions vs 1 → no shared key
      (4L, "totally different name here"))
      .toDF("id", "name")
    val out = Dedup.fuzzyJoin(ents, "id", "name", maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(t => (t._1, t._2)).toSet === Set((1L, 2L)))
    assert(out.head._3 === 5L) // GAMMA vs gamma: 5 char substitutions
  }

  test("fuzzyJoin: insertion/deletion of a token is one edit too") {
    import spark.implicits._
    val ents = Seq(
      (1L, "acme data systems"),
      (2L, "acme systems"))             // token deletion
      .toDF("id", "name")
    val out = Dedup.fuzzyJoin(ents, "id", "name", maxDist = 10).collect()
    assert(out.length === 1 && out.head.getLong(2) === 5L) // "data " removed
  }

  test("fuzzyJoin: maxBucket drops degenerate blocks") {
    import spark.implicits._
    // every "inc N" collapses to the key "inc" when N is deleted — one
    // 50-wide block yielding ~1225 low-quality pairs; the cap drops it
    val ents = (0L until 50L).map(i => (i, s"inc $i")).toDF("id", "name")
    assert(Dedup.fuzzyJoin(ents, "id", "name", 100).count() > 1000)
    assert(Dedup.fuzzyJoin(ents, "id", "name", 100, maxBucket = 10).count() === 0)
  }

  test("bm25: query with no corpus-known terms returns empty, not error") {
    val docs = toksDF(Seq(1L -> "a b c"))
    val qs = Seq((1, "zzz qqq")).toDF("qid", "qtext")
      .select(col("qid"), TextAnalysis.toks(col("qtext")).as("qtoks"))
    assert(Search.bm25TopK(docs, "doc_id", "toks", qs, "qid", "qtoks", 5).count() === 0)
  }
}
