package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Hashing, Similarity}

/** Dedup / similarity operator semantics on planted fixtures. */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokDF(rows: (Long, String)*) =
    rows.toDF("id", "text").select(col("id"),
      filter(split(col("text"), " "), w => w =!= "").as("toks"))

  test("sub-n documents yield EMPTY grams everywhere, never throw or fabricate") {
    // Spark's sequence(1, x) turns DESCENDING for x < 1 — unguarded, a
    // 2-token doc under n=3 would fabricate bogus windows (or throw via
    // element_at(·, 0) on the hashed path); every gram builder must
    // instead agree with the oracle's empty range
    val short = tokDF((1L, "a b"), (2L, ""), (3L, "x y z"))
    val out = short.select(
      Dedup.shingles(col("toks"), 3).as("sh"),
      Dedup.shingleBag(col("toks"), 3).as("bag"),
      Dedup.shingleHashes(Hashing.hash31Array(col("toks")), 3).as("hs"),
      Dedup.tokenShingleHashes(col("toks"), 3).as("nat"),
      Dedup.winnowFingerprintsHof(Hashing.hash31Array(col("toks")), 4).as("win"),
      graft.ops.TextAnalysis.tokenChunks(col("toks"), 8).as("ch"))
      .orderBy(lit(1)).collect()
    // docs 1-2 are sub-n: every N-GRAM family must be empty (chunks are
    // not n-grams — a short doc yields one short chunk, an empty doc none)
    for (r <- out.take(2); i <- 0 until 5) {
      assert(r.getSeq[Any](i).isEmpty, s"col $i not empty on short doc")
    }
    assert(out(0).getSeq[String](5) === Seq("a b"))
    assert(out(1).getSeq[String](5).isEmpty)
    // doc 3 (= n) produces exactly one 3-gram on each path, one chunk
    assert(out(2).getSeq[String](0) === Seq("x y z"))
    assert(out(2).getSeq[Long](2) === out(2).getSeq[Long](3)) // HOF == native
    assert(out(2).getSeq[String](5) === Seq("x y z"))
  }

  test("MinHash: identical shingle sets → identical signatures; disjoint → different") {
    val df = tokDF(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .select(col("id"), Dedup.minhashSig(
        transform(Dedup.shingles(col("toks"), 3), s => Hashing.hash31(s)), 12).as("sig"))
    val sigs = df.orderBy("id").collect().map(_.getSeq[Long](1))
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
    assert(sigs(0).forall(v => v >= 0 && v < Hashing.P31))
  }

  test("LSH bands: near-identical docs collide on at least one band") {
    val df = tokDF(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "zz w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .select(col("id"), Dedup.bandHashes(Dedup.minhashSig(
        transform(Dedup.shingles(col("toks"), 3), s => Hashing.hash31(s)), 12), 4, 3).as("b"))
    val bands = df.orderBy("id").collect().map(_.getSeq[org.apache.spark.sql.Row](1))
    val shared = bands(0).map(r => (r.getInt(0), r.getLong(1)))
      .intersect(bands(1).map(r => (r.getInt(0), r.getLong(1))))
    assert(shared.nonEmpty)
  }

  test("Jaccard: exact on known sets") {
    val j = Seq(1).toDF("i").select(
      Dedup.jaccard(typedLit(Seq("a", "b", "c")), typedLit(Seq("b", "c", "d"))).as("j"))
      .collect()(0).getDouble(0)
    assert(math.abs(j - 0.5) < 1e-15)
  }

  test("SimHash: equal bags → hamming 0; one-word edit → small hamming") {
    val df = tokDF(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"), (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "zz w1 w2 w3 w4 w5 w6 w7 w8"))
      .select(col("id"), Dedup.simhash16(
        transform(Dedup.shingleBag(col("toks"), 2), g => Hashing.hash31(g))).as("s"))
    val s = df.orderBy("id").collect().map(_.getLong(1))
    assert(s(0) === s(1))
    assert(java.lang.Long.bitCount(s(0) ^ s(2)) <= 4)
    assert(s.forall(v => v >= 0 && v < 65536))
  }

  test("winnowing: fingerprints overlap heavily under a local edit") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the hazy dog again and again"))
      .toDF("id", "text")
      .select(col("id"), Dedup.winnowFingerprints(
        Dedup.charGramHashes(col("text"), 4), 5).as("f"))
    val fp = df.orderBy("id").collect().map(_.getSeq[Long](1).toSet)
    val inter = fp(0).intersect(fp(1)).size.toDouble
    assert(inter / math.max(fp(0).size, fp(1).size) > 0.5)
  }

  test("cosine: self-similarity 1, orthogonal 0 (sequential fold)") {
    val a = typedLit(Seq(1.0, 0.0, 2.0))
    val b = typedLit(Seq(0.0, 3.0, 0.0))
    val r = Seq(1).toDF("i").select(
      Similarity.cosine(a, a).as("aa"), Similarity.cosine(a, b).as("ab"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(r.getDouble(1)) < 1e-15)
  }

  test("LSH buckets: identical vectors share a bucket; planes are ±1") {
    val planes = Similarity.planes(4, 8)
    assert(planes.flatten.forall(v => v == 1 || v == -1))
    val v = typedLit(Seq(0.5, -1.0, 2.0, 0.1, -0.3, 0.9, -2.0, 1.1))
    val r = Seq(1).toDF("i")
      .select(Similarity.lshBucket(v, planes).as("b1"), Similarity.lshBucket(v, planes).as("b2"))
      .collect()(0)
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) >= 0 && r.getLong(0) < 16)
  }

  test("nearDupPairs: Persist materialization ≡ Local (cluster-scale path)") {
    val df = tokDF(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "zz w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (3L, "q r s t u v x y z q2 r2 s2"),
      (4L, "q r s t u v x y z q2 r2 s2"))
    def run(m: graft.ops.Materialize) =
      Dedup.nearDupPairs(df, "id", "toks", Hashing.hash31Array, mat = m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val local   = run(graft.ops.Materialize.Local)
    val persist = run(graft.ops.Materialize.Persist())
    val stage   = run(graft.ops.Materialize.Stage(
      java.nio.file.Files.createTempDirectory("graft_stage").toString))
    assert(local === persist)
    assert(local === stage)
    assert(local.map(p => (p._1, p._2)).contains((1L, 2L)))   // planted near-dup
    assert(local.map(p => (p._1, p._2)).contains((3L, 4L)))   // exact dup
  }

  test("exact dedup keeps min id per content group (q40 semantics)") {
    val df = Seq((1L, "same text"), (5L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("k"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    val out = df.orderBy("keep").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L), (3L, 1L)))
  }
  test("connectedComponents: chain, triangle, and singletons get min-id clusters") {
    // Components: chain 1-2-3-4 (diameter 3 — needs real propagation),
    // triangle 10-11-12 (cycle), pair 20-21. Node 30 appears only via a
    // self-contained pair with 31. Min id labels each component.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (30L, 31L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("connectedComponents agrees across materialization strategies") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    def run(m: graft.ops.Materialize) =
      Dedup.connectedComponents(pairs, "a", "b", m)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L)
    assert(run(graft.ops.Materialize.Local) === expected)
    assert(run(graft.ops.Materialize.Persist()) === expected)
  }
  test("incrementalNearDup: batch near-copy matches its original; novel doc is clean") {
    val corpus = tokDF(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different content about spark catalyst plans"),
      (3L, "a third document with its own words and phrases here"))
    val batch = tokDF(
      (10L, "zz the quick brown fox jumps over the lazy dog today"), // near-copy of 1
      (11L, "nothing like anything in the corpus whatsoever at all"))
    val m = Dedup.incrementalNearDup(
        corpus.withColumnRenamed("id", "doc_id"),
        batch.withColumnRenamed("id", "doc_id"), "doc_id", "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m.get(10L) === Some(1L))
    assert(!m.contains(11L))
  }
  test("incrementalNearDup plan: batch band table is broadcast (no corpus shuffle join)") {
    val corpus = tokDF(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different content about spark catalyst plans"))
    val batch = tokDF((10L, "zz the quick brown fox jumps over the lazy dog today"))
    val m = Dedup.incrementalNearDup(
      corpus.withColumnRenamed("id", "doc_id"),
      batch.withColumnRenamed("id", "doc_id"), "doc_id", "toks")
    m.count()
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
  }
  test("connectedComponentsStar == min-label CC on random graphs; handles deep chains") {
    val rnd = new scala.util.Random(7)
    val randomPairs = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val pairsDf = randomPairs.toDF("a", "b")
    val byLabel = Dedup.connectedComponents(pairsDf, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStar = Dedup.connectedComponentsStar(pairsDf, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byStar === byLabel)
    // A 400-node path: diameter 399 — far past the label propagator's
    // round budget, but star contraction folds it in O(log n) rounds.
    val chain = (0L until 399L).map(i => (i, i + 1)).toDF("a", "b")
    val chainCc = Dedup.connectedComponentsStar(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(chainCc.length === 400)
    assert(chainCc.forall(_._2 === 0L))
  }
  test("kmeans: separated blobs cluster correctly; deterministic across materializations") {
    import graft.ops.Similarity
    // Two tight 4-dim blobs around (0,0,0,0) and (100,100,100,100); seeds
    // one vector from each blob.
    val rnd = new scala.util.Random(3)
    def blob(base: Long, off: Int) = (0 until 20).map { i =>
      (base + i, (1 to 4).map(_ => (off + rnd.nextInt(5)).toLong))
    }
    val vecs = (blob(0L, 0) ++ blob(100L, 100)).toDF("vec_id", "qv")
    val seeds = vecs.filter(col("vec_id") === 0L || col("vec_id") === 100L)
      .select((col("vec_id") / 100).cast("long").as("cid"), col("qv").as("cv"))
    def run(m: graft.ops.Materialize) = {
      val (assign, cent) = Similarity.kmeans(vecs, seeds, iters = 2, mat = m)
      (assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        cent.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
    }
    val (asgn, cent) = run(graft.ops.Materialize.Local)
    assert(asgn.count { case (id, c) => id < 100 && c === 0L } === 20)
    assert(asgn.count { case (id, c) => id >= 100 && c === 1L } === 20)
    // centroids land inside their blobs
    assert(cent(0L).forall(x => x >= 0 && x <= 5))
    assert(cent(1L).forall(x => x >= 100 && x <= 105))
    assert(run(graft.ops.Materialize.Persist()) === ((asgn, cent)))
  }
  test("CorpusPipeline stages: exact dedup, near-dup keep-one, quality, quota, packing") {
    import graft.pipeline.CorpusPipeline
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "en"),
      (2L, "the quick brown fox jumps over the lazy dog today", "en"),  // exact dup of 1
      (3L, "zz the quick brown fox jumps over the lazy dog today", "en"), // near dup of 1
      (4L, Seq.fill(30)("spam").mkString(" "), "en"),                    // repetitive
      (5L, "a completely different and varied sentence with many unique words", "en"),
      (6L, "ein ganz anderer deutscher satz mit vielen verschiedenen worten", "de"))
      .toDF("doc_id", "text", "lang")
    val cfg = CorpusPipeline.Config(quotaPerLang = 10, chunkBudget = 8)
    val out = CorpusPipeline.run(docs, cfg).orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(!ids.contains(2L), "exact duplicate must be dropped")
    assert(!ids.contains(3L), "near duplicate must be dropped")
    assert(!ids.contains(4L), "repetitive doc must be dropped")
    assert(ids.contains(1L) && ids.contains(5L) && ids.contains(6L))
    // packing: budget 8 tokens — doc 1 (10 toks) fills chunk 0 and spills;
    // whichever en doc comes first by hash, offsets are cumulative.
    val en = out.filter(_.getString(1) == "en")
    assert(en.map(_.getLong(2)).sum === 10 + 10) // n_toks of docs 1 and 5
    assert(out.forall(r => r.getLong(4) < 8 || r.getLong(3) > 0))
    // opt-in decontamination gate: doc 5 embeds the held-out 8-gram → only
    // it is additionally dropped; omitting testSet reproduces the baseline
    val heldOut = Seq((100L, "a completely different and varied sentence with many"))
      .toDF("doc_id", "text")
    val gated = CorpusPipeline.run(docs, cfg, testSet = Some(heldOut))
      .collect().map(_.getLong(0)).toSet
    assert(gated === ids - 5L)
  }

  test("duplicateSpanStats: cross-doc spans counted, within-doc repeats are not") {
    val docs = tokDF(
      (1L, "a b c d e f g h i j"),          // 6 spans at w=5
      (2L, "x y a b c d e z1 z2 z3"),       // shares exactly span (a b c d e)
      (3L, "p q r s t u"),                  // disjoint: 2 spans, 0 dup
      (4L, "m m m m m m m m m"))            // internal repetition only
    val out = Dedup.duplicateSpanStats(docs.withColumnRenamed("id", "doc_id"),
        "doc_id", "toks", w = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1L, 6L, 1L, 0.166667)))
    assert(out(1) === ((2L, 6L, 1L, 0.166667)))
    assert(out(2) === ((3L, 2L, 0L, 0.0)))
    // doc 4's windows are all identical → ONE distinct span, and it
    // repeats only within the doc itself → not duplicated
    assert(out(3) === ((4L, 1L, 0L, 0.0)))
  }

  test("semanticDedup: within-cluster near-dups collapse to one representative") {
    // two well-separated direction clusters in R^4; ids 1/2 are near-
    // identical (cosine ≈ 1), ids 3/4 share a cluster but point 45° apart
    // (cosine ≈ 0.707 < 0.95) so both survive
    val vecs = Seq(
      (1L, Seq(10.0, 0.0, 0.0, 0.0)),
      (2L, Seq(10.001, 0.0, 0.0, 0.0)),
      (3L, Seq(0.0, 10.0, 0.0, 0.0)),
      (4L, Seq(0.0, 7.0, 7.0, 0.0)))
      .toDF("vec_id", "v")
      .withColumn("qv", Similarity.quantize(col("v"), 1000))
    val seeds = Seq(
      (0L, Seq(10000L, 0L, 0L, 0L)),
      (1L, Seq(0L, 10000L, 0L, 0L)))
      .toDF("cid", "cv")
    val out = Similarity.semanticDedup(vecs, seeds, iters = 2, threshold = 0.95)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, 0L, 1L, 1L),   // representative of the {1,2} component
      (2L, 0L, 1L, 0L),   // collapsed onto 1
      (3L, 1L, 3L, 1L),   // same cluster as 4 but below threshold → kept
      (4L, 1L, 4L, 1L)))
  }

  test("segmentDedup: first occurrence wins, docs reassemble in position order") {
    // w=2 segments; doc 1 owns [a b][c d][e f]; doc 2 repeats [a b] and
    // [e f] (both seen at doc 1) around its own [x y]; doc 3 is an exact
    // copy of doc 1 and must VANISH; doc 4 shares nothing.
    val docs = tokDF(
      (1L, "a b c d e f"),
      (2L, "a b x y e f"),
      (3L, "a b c d e f"),
      (4L, "p q r s"))
    val out = Dedup.segmentDedup(docs, "id", "toks", w = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Array(
      (1L, 3L, 3L, "a b c d e f"),
      (2L, 3L, 1L, "x y"),
      (4L, 2L, 2L, "p q r s")))
  }

  test("segmentDedup: ragged tail segment is its own unit; empty docs absent") {
    // 5 tokens at w=2 → segments [a b][c d][e]; the lone tail 'e' of doc
    // 2 duplicates doc 1's tail segment and is removed
    val docs = tokDF((1L, "a b c d e"), (2L, "q r e"), (3L, ""))
    val out = Dedup.segmentDedup(docs, "id", "toks", w = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Array(
      (1L, 3L, 3L, "a b c d e"),
      (2L, 2L, 1L, "q r")))
  }

  test("segmentDedup: within-doc repeated segments collapse to the first") {
    val docs = tokDF((1L, "a b a b c d"))
    val out = Dedup.segmentDedup(docs, "id", "toks", w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Array((1L, 3L, 2L, "a b c d")))
  }

  test("contentChunkDedup: boundaries re-synchronize after a head insertion") {
    // doc 2 = doc 1 with one token PREPENDED. The fixed grid shifts every
    // segment, so segmentDedup keeps (almost) all of doc 2; content-defined
    // boundaries depend only on local content, so beyond the first chunk
    // doc 2's chunks are bit-identical to doc 1's and dedup away.
    val body = (1 to 120).map(i => s"t${i % 37}w$i").mkString(" ")
    val docs = tokDF((1L, body), (2L, s"zz $body"))
    val cdc = Dedup.contentChunkDedup(docs, "id", "toks", w = 4, every = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (total1, kept1) = (cdc(0)._2, cdc(0)._3)
    assert(kept1 == total1, "first copy keeps everything")
    // doc 2 present but mostly deduped: strictly fewer than half its
    // chunks survive (only the prefix up to the first re-synced boundary)
    val doc2 = cdc.find(_._1 == 2L)
    assert(doc2.forall(d => d._3 < d._2 / 2),
      s"shifted copy should mostly dedup, got $doc2")
    // the grid spelling CANNOT do this on the same input: every grid
    // segment of doc 2 differs, so it keeps them all
    val grid = Dedup.segmentDedup(docs, "id", "toks", w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val gdoc2 = grid.find(_._1 == 2L).get
    assert(gdoc2._3 == gdoc2._2, "grid keeps every shifted segment")
  }

  test("contentChunkDedup: exact copies vanish; chunks reassemble in order") {
    val body = (1 to 80).map(i => s"k${i % 23}x$i").mkString(" ")
    val docs = tokDF((1L, body), (2L, body), (3L, "lone wolf content"))
    val out = Dedup.contentChunkDedup(docs, "id", "toks", w = 4, every = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L), "exact copy must vanish")
    assert(out(0)._4 == body, "chunks reassemble to the original text")
    assert(out(1)._4 == "lone wolf content")
  }

  test("contentChunkDedup: sub-window and empty docs behave") {
    val docs = tokDF((1L, "a b"), (2L, "a b"), (3L, ""))
    val out = Dedup.contentChunkDedup(docs, "id", "toks", w = 4, every = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // below w: one whole-doc chunk; doc 2 is an exact duplicate; empty
    // docs are absent entirely
    assert(out === Array((1L, 1L, 1L, "a b")))
  }

  // ---- exactSubstrDedup (Lee et al. ExactSubstr transform) ----

  /** Sequential reference: process windows in (doc_id, ws) order; a
    * window whose gram was seen at a smaller (doc, ws) marks its L
    * positions removed (regardless of whether the first occurrence is
    * itself covered by some other gram's span — matching the operator's
    * global-min semantics). */
  private def bruteExactSubstr(docs: Seq[(Long, String)], l: Int)
      : Map[Long, (Long, Long, String)] = {
    val toks = docs.sortBy(_._1).map { case (id, t) =>
      id -> t.split(" ").toSeq.filter(_.nonEmpty)
    }
    val seen = scala.collection.mutable.Set[Seq[String]]()
    val removed = scala.collection.mutable.Map[Long, Set[Int]]()
    toks.foreach { case (id, tk) =>
      var rp = Set.empty[Int]
      (0 to tk.length - l).foreach { ws =>
        val g = tk.slice(ws, ws + l)
        if (seen.contains(g)) rp ++= (ws until ws + l)
        else seen += g
      }
      removed(id) = rp
    }
    toks.map { case (id, tk) =>
      val rp = removed(id)
      val kept = tk.zipWithIndex.collect { case (t, i) if !rp.contains(i) => t }
      id -> ((tk.length.toLong, rp.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("exactSubstrDedup: later occurrences of shared runs are cut, " +
      "exact copies vanish, shifted copies survive only their novelty") {
    // L=3; doc 2 embeds doc 1's run shifted by one token (the fixed-grid
    // killer), doc 3 is an exact copy of doc 1, doc 4 shares nothing
    val docs = tokDF(
      (1L, "a b c d e f g"),
      (2L, "z a b c d e f g"),
      (3L, "a b c d e f g"),
      (4L, "p q r s t u v"))
    val expected = bruteExactSubstr(
      Seq(1L -> "a b c d e f g", 2L -> "z a b c d e f g",
        3L -> "a b c d e f g", 4L -> "p q r s t u v"), 3)
    val out = Dedup.exactSubstrDedup(docs, "id", "toks", L = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out === expected)
    // the exact copy is erased entirely; the shifted copy keeps only its
    // one novel token — every other position sits inside the duplicated
    // run "a b c d e f g" (the window starting at it or covering it was
    // seen in doc 1), which is precisely the span ExactSubstr cuts
    assert(out(3L)._3 === "")
    assert(out(3L)._2 === 7L)
    assert(out(2L)._3 === "z")
    assert(out(4L)._2 === 0L)
  }

  test("exactSubstrDedup: docs shorter than L pass through untouched") {
    val docs = tokDF((1L, "a b"), (2L, "a b"), (3L, "a b c"))
    val out = Dedup.exactSubstrDedup(docs, "id", "toks", L = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(1L -> ((2L, 0L, "a b")), 2L -> ((2L, 0L, "a b")),
      3L -> ((3L, 0L, "a b c"))))
  }

  test("exactSubstrDedup property: random corpora vs the sequential reference") {
    val rnd = new scala.util.Random(1550814L)
    for (trial <- 1 to 5) {
      val vocab = Seq("a", "b", "c", "d")
      val docs = (1L to 7L).map { id =>
        val len = 2 + rnd.nextInt(14)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val l = 2 + rnd.nextInt(3)
      val expected = bruteExactSubstr(docs, l)
      val out = Dedup.exactSubstrDedup(
          tokDF(docs.map { case (i, t) => (i, t) }: _*), "id", "toks", L = l)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(out === expected, s"trial=$trial L=$l docs=$docs")
    }
  }

  test("duplicateSpanStats (w-window approx) vs perDocDupRun (exact SA " +
      "statistic): approx positive implies exact >= w; internal repetition " +
      "is the documented divergence") {
    // Distinct single-occurrence filler everywhere else so the planted
    // runs are the ONLY duplication:
    //   docs 1,2 share an 11-token run (cross-doc: BOTH stats fire)
    //   doc 3 repeats its own 10-token run (within-doc: exact fires,
    //     cross-doc approx stays 0 by its >= minDocs DISTINCT contract)
    //   doc 4 is all-unique (NEITHER fires)
    val shared = (1 to 11).map(i => s"s$i").mkString(" ")
    val rep = (1 to 10).map(i => s"r$i").mkString(" ")
    def filler(tag: String, n: Int) =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = tokDF(
      (1L, s"${filler("a", 6)} $shared ${filler("b", 6)}"),
      (2L, s"${filler("c", 6)} $shared ${filler("d", 6)}"),
      (3L, s"${filler("e", 6)} $rep ${filler("f", 3)} $rep ${filler("g", 6)}"),
      (4L, filler("h", 30)))
    val w = 8
    val approx = Dedup.duplicateSpanStats(docs, "id", "toks", w = w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // n_dup_spans
    val exact = graft.ops.SuffixArray
      .perDocDupRun(docs, "id", "toks", rounds = 4) // cap 16 >= planted runs
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // max_dup_len
    // soundness: any doc the approximation flags has an exact dup run of
    // at least the window width
    docs.select("id").collect().map(_.getLong(0)).foreach { id =>
      if (approx(id) > 0L)
        assert(exact(id) >= w.toLong,
          s"doc $id: approx flagged but exact run ${exact(id)} < w=$w")
    }
    // agreement on the cross-doc plant: 11-run ⇒ 11-8+1 = 4 shared windows
    assert(approx(1L) === 4L && approx(2L) === 4L)
    assert(exact(1L) === 11L && exact(2L) === 11L)
    // divergence on within-doc repetition: exact sees the 10-run, the
    // cross-doc approximation must NOT (>= 2 DISTINCT docs contract)
    assert(exact(3L) === 10L && approx(3L) === 0L)
    // both silent on the unique doc
    assert(exact(4L) === 0L && approx(4L) === 0L)
  }
}
