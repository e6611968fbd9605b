package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, PrefixSum}
import graft.plans.TopK

/** Scale-stress evidence for the 100 TB claims (VERDICT r7 next-round #3):
  * the dedup/sampling/packing family on a 10× GENERATED corpus (never
  * stored), with the scale invariants MEASURED from SparkListener task
  * metrics rather than argued from plan shape:
  *
  *   - MinHash+LSH candidate generation shuffles O(bands·docs) records,
  *     not O(docs²) — the never-all-pairs contract;
  *   - star-contraction connected components converges within the
  *     O(log n) round bound on a maximally deep chain;
  *   - TopKPerGroup moves ≤ k·groups·mapTasks rows through the exchange
  *     (partial heaps below the shuffle);
  *   - the two-phase prefix sum caps the biggest task far below the
  *     dominant group's share, where the naive window funnels that whole
  *     group through one task.
  *
  * The measured numbers print as one `{"scale_invariants": …}` JSON line
  * so a run's evidence lands in its log artifact.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** See [[ShuffleMetrics.measure]] (shared with CdcSpec's skew bound). */
  private def measure[A](action: => A): (A, Long, Long, Long) =
    ShuffleMetrics.measure(spark)(action)

  /** 10× the sf0.001 documents table, generated: 5000 docs of ~40 tokens,
    * every 10th followed by a near-duplicate (2 words prepended). */
  private def corpus10x: DataFrame = {
    // token = hash(doc, pos): cross-doc shingle overlap is negligible (an
    // affine formula like 31·id+7·i makes docs id and id+7 share SHIFTED
    // token runs — hot LSH buckets that the maxBucket cap then drops)
    val base = spark.range(0, 5000).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(40)),
        i => concat(lit("w"), pmod(xxhash64(col("id") * 100 + i), lit(99991)))))
        .as("text"))
    base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("zz yy "), col("text")).as("text")))
  }
  private def toks(df: DataFrame): DataFrame =
    df.select(col("doc_id"), split(col("text"), " ").as("toks"))

  test("LSH near-dup at 10x: shuffle stays O(bands·docs), all plants found") {
    val docs = toks(corpus10x)
    val nDocs = docs.count()
    val (pairs, w, _, _) = measure {
      Dedup.nearDupPairs(docs, "doc_id", "toks", threshold = 0.5).collect()
    }
    // planted near-dups (2 tokens prepended on 40 → shingle jaccard
    // ≈ 0.95) recall through 4 bands of 3 rows: P(pair found) =
    // 1-(1-0.95³)⁴ ≈ 0.9996 per pair, so a handful of the 500 can miss —
    // that's LSH's documented recall/cost trade, not a defect; require
    // ≥ 97% observed
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    assert(planted.length >= 485, s"recall ${planted.length}/500")
    // never-all-pairs: total shuffled records across ALL stages of the
    // operator bounded by a small multiple of docs (signatures, 4 band
    // rows/doc, candidates, verification) — all-pairs would be ~15M pairs
    assert(w < 40L * nDocs, s"shuffled $w records for $nDocs docs")
    println(s"""{"scale_invariants":{"lsh_docs":$nDocs,"lsh_shuffle_write":$w}}""")
  }

  test("star-contraction CC: 4096-deep chain converges within the log bound") {
    // maximally adversarial shape for label propagation (diameter = n);
    // large-star/small-star must close it in O(log n) rounds — maxRounds
    // is the assertion: convergence is require()d inside
    val n = 4096L
    val chain = spark.range(1, n)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val cc = Dedup.connectedComponentsStar(chain, "a", "b",
      maxRounds = 2 * 12 + 4) // 2·log2(4096) + slack
    val labels = cc.agg(countDistinct(col("cluster_id")),
      min(col("cluster_id")), count(lit(1))).head()
    assert(labels.getLong(0) === 1L) // one component
    assert(labels.getLong(1) === 1L) // rooted at the min node
    assert(labels.getLong(2) === n)
    println(s"""{"scale_invariants":{"cc_chain_n":$n,"cc_round_bound":28}}""")
  }

  test("TopKPerGroup at 10x skew: exchange moves ≤ k·groups·mapTasks rows") {
    // 150k rows, 20 groups, 90% in one group — the stratified-sample shape
    val rows = spark.range(0, 150000).select(
      when(col("id") % 10 === 0, col("id") % 19).otherwise(lit(19L)).as("grp"),
      col("id").as("ord"),
      pmod(col("id") * 2654435761L, lit(1000000007L)).as("score"))
      .repartition(8) // fixed map-task count for the bound
    val k = 10
    val (out, w, _, _) = measure {
      TopK.perGroup(rows, Seq("grp"), Seq(("score", false), ("ord", true)), k)
        .collect()
    }
    assert(out.length === 20 * k)
    // partial heaps below the exchange: each of 8 map tasks emits ≤ k
    // rows per group it sees (the repartition itself shuffles 150k rows;
    // the operator's exchange must stay ≤ k·groups·maps + that input)
    val bound = 150000L + k * 20L * 8L
    assert(w <= bound, s"shuffled $w > $bound")
    assert(w - 150000L <= k * 20L * 8L,
      s"top-k exchange moved ${w - 150000L} rows; bound ${k * 20 * 8}")
    println(s"""{"scale_invariants":{"topk_exchange_rows":${w - 150000L},"topk_bound":${k * 20 * 8}}}""")
  }

  test("PQ encode at 10x: argmin collapses map-side, exchange ≤ vectors·M") {
    // 20k vectors × M=4 subspaces × k=40 centroids: a window-spelled
    // argmin would shuffle all N·M·k candidate rows (3.2M); the
    // min(struct) partial aggregation must emit ≤ N·M (80k) — the
    // encode-at-scale contract ([[Similarity.pqEncode]])
    val n = 20000L; val m = 4; val dim = 16; val k = 40
    // repartition: range's id-partitioning would satisfy the argmin's
    // clustering and elide the exchange outright (real file scans give
    // no such guarantee) — round-robin forces the general shape
    val vecs = spark.range(0, n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => pmod(xxhash64(col("id") * 37 + i), lit(2000L))).as("qv"))
      .repartition(8)
    val codebook = spark.range(0, m * k).select(
      (col("id") % m).cast("int").as("m"), expr(s"id div $m").as("cid"),
      transform(sequence(lit(1), lit(dim / m)),
        i => pmod(xxhash64(col("id") * 13 + i), lit(2000L))).as("cv"))
    // collect (not count): a count-over-groupBy lets Catalyst drop the
    // argmin aggregate and the measured exchange with it
    val (rows, w, _, _) = measure {
      graft.ops.Similarity.pqEncode(vecs, codebook, m, dim).collect()
    }
    assert(rows.length === n * m)
    val bound = n * m + n // partial rows + slack for AQE bookkeeping
    assert(w <= bound, s"encode exchange moved $w rows (bound $bound); " +
      s"window spelling would move ${n * m * k}")
    println(s"""{"scale_invariants":{"pq_encode_rows":$w,"pq_encode_bound":$bound,"pq_naive_rows":${n * m * k}}}""")
  }

  test("decontaminate at 10x: corpus shingles never shuffle, only hits do") {
    // 5k-doc corpus with 100 planted copies of held-out docs: the test
    // side broadcasts, so the ~190k corpus shingle rows must NOT cross
    // an exchange — only the (rare) hits reach the per-doc aggregation
    val base = corpus10x.filter(col("doc_id") < 100000) // 5000 clean docs
    val test = toks(base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text")))
    val corpus = toks(base.unionByName(
      base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(lit("aa bb "), col("text")).as("text"))))
    val nCorpus = corpus.count()
    val corpusShingles = nCorpus * 33L // ~40 toks → 33 8-gram shingles/doc
    val (hits, w, _, _) = measure {
      Dedup.decontaminate(corpus, test, "doc_id", "toks", 8).collect()
    }
    // every planted doc and its source doc share the held-out 8-grams
    assert(hits.length >= 200, s"found ${hits.length} contaminated docs")
    assert(w < corpusShingles / 10,
      s"shuffled $w records; corpus shingle explosion would be ~$corpusShingles")
    println(s"""{"scale_invariants":{"decontam_shuffle":$w,"decontam_corpus_shingles":$corpusShingles}}""")
  }

  test("triangle count on a 20k-spoke hub: oriented wedges never explode") {
    // r8 verdict #7: q138's √m claim, asserted on the adversarial shape —
    // one hub of degree 20k. Unoriented wedge enumeration generates
    // C(20k,2) ≈ 2·10⁸ wedges AT the hub; degree orientation points every
    // spoke→hub edge at the hub (higher degree), so the hub has out-degree
    // 0 and generates ZERO wedges — wedges come only from low-out-degree
    // corners. 300 planted spoke-spoke edges close 300 hub triangles.
    val m = 20000L
    val spokes = spark.range(1, m + 1).select(lit(0L).as("a"), col("id").as("b"))
    val chain = spark.range(1, 301)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val edges = spokes.unionByName(chain).repartition(8)
    val (out, w, _, _) = measure {
      graft.ops.Graph.triangleCounts(edges, "a", "b").collect()
    }
    val hub = out.find(_.getLong(0) == 0L).get
    assert(hub.getLong(1) === 300L, s"hub counted ${hub.getLong(1)} triangles")
    val e = m + 300L
    // whole pipeline (distinct, degrees, orientation joins, wedge join,
    // closure join) bounded by a small multiple of |E| — the naive hub
    // wedge set alone would be ~2e8 records
    assert(w < 40L * e, s"shuffled $w records for $e edges — hub wedges leaked")
    println(s"""{"scale_invariants":{"tri_edges":$e,"tri_shuffle_write":$w,"tri_naive_wedges":${m * (m - 1) / 2}}}""")
  }

  test("fuzzy join at 10x: blocked candidates, never all-pairs") {
    // 20k four-token entity names over a wide vocab + 1000 planted
    // one-token edits: all-pairs would consider ~200M pairs; deletion-
    // neighborhood blocking must keep total shuffle within a small
    // multiple of rows·keys (5 keys per 4-token name)
    val base = spark.range(0, 20000).select(col("id"),
      concat_ws(" ", transform(sequence(lit(1), lit(4)),
        i => concat(lit("n"), pmod(xxhash64(col("id") * 31 + i), lit(99991)))))
        .as("name"))
    val ents = base.unionByName(
      base.filter(col("id") < 1000)
        .select((col("id") + 100000).as("id"),
          concat(col("name").substr(lit(1), length(col("name"))
            - length(element_at(split(col("name"), " "), -1))), lit("zz"))
            .as("name")))
    val n = ents.count()
    val (pairs, w, _, _) = measure {
      Dedup.fuzzyJoin(ents, "id", "name", maxDist = 12).collect()
    }
    // every planted pair survives (last token swapped → shared deletion
    // key; levenshtein = |zz| vs |n#####| ≤ 8)
    val planted = pairs.count(r => r.getLong(1) == r.getLong(0) + 100000)
    assert(planted === 1000, s"recall $planted/1000")
    assert(w < 30L * n, s"shuffled $w records for $n names")
    println(s"""{"scale_invariants":{"fuzzy_names":$n,"fuzzy_shuffle_write":$w,"fuzzy_allpairs":${n * n / 2}}}""")
  }

  test("two-phase prefix sum at 10x skew: biggest task « dominant group") {
    // 100k rows, 95% one group: the naive window reads the whole dominant
    // group in ONE task; the two-phase ledger's biggest task is bounded
    // by bucket width × buckets-per-task, independent of group size
    val rows = spark.range(0, 100000).select(
      when(col("id") % 20 === 0, concat(lit("g"), col("id") % 7))
        .otherwise(lit("dominant")).as("grp"),
      col("id").as("ord"), lit(1L).as("v"))
    // AQE's small-data partition coalescing would merge this toy shuffle
    // into ONE task and mask the shape; at scale the partitions are far
    // above the advisory size and never coalesce — measure the shape
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    val (_, _, _, naiveMax) = measure {
      val w = Window.partitionBy(col("grp")).orderBy(col("ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rows.withColumn("pre", sum("v").over(w) - col("v"))
        .agg(sum("pre")).head()
    }
    val (_, _, _, twoPhaseMax) = measure {
      PrefixSum.exclusiveRunningSum(rows, "grp", "ord", "v", "pre", 1024L)
        .agg(sum("pre")).head()
    }
    assert(naiveMax >= 95000L, s"naive window max task read $naiveMax")
    assert(twoPhaseMax <= naiveMax / 2,
      s"two-phase max task $twoPhaseMax not « naive $naiveMax")
    println(s"""{"scale_invariants":{"prefix_naive_max_task":$naiveMax,"prefix_twophase_max_task":$twoPhaseMax}}""")
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("MG heavy hitters at 10x: sketch bytes replace the token-stream shuffle") {
    // 200k-token stream over a 50k vocab with 5 planted heavies — the
    // regime where candidate pruning matters (naive group-by exchanges
    // ~vocab×partitions partial rows; two-pass exchanges ≤ k×partitions)
    // NO repartition here: the source must stay narrow so the measured
    // shuffle is the OPERATOR's, not test scaffolding re-run per pass
    val stream = spark.range(0, 200000, 1, 8).select(
      when(col("id") % 8 < 3, concat(lit("hot"), col("id") % 5))
        .otherwise(concat(lit("t"), pmod(xxhash64(col("id")), lit(50000))))
        .as("term"))
    val nPart = stream.rdd.getNumPartitions
    val (got, w, _, _) = measure {
      graft.ops.HeavyHitters.heavyHitters(stream, "term",
        k = 60, num = 1L, den = 50L).collect()
    }
    // the 5 planted terms are 7.5% each — all must surface, nothing else
    // clears 2%
    assert(got.map(_.getString(0)).toSet ==
      (0 until 5).map(i => s"hot$i").toSet, got.mkString(","))
    // both passes together: sketch buffers (1 row/partition) + candidate
    // partials (≤ k+1 rows/partition each side of the recount) — far
    // below one row per distinct term per partition, let alone per token
    val bound = 3L * (60 + 2) * nPart + 200
    assert(w <= bound, s"shuffled $w records, bound $bound")
    println(s"""{"scale_invariants":{"hh_stream":200000,"hh_shuffle_write":$w,"hh_bound":$bound}}""")
  }

  test("funnel at 10x: stages shuffle matching rows, not the stream") {
    // 200k events, 2k users; step predicates select ~12%/6%/3% — the
    // operator must exchange only those slices (plus per-user minima),
    // never sort or shuffle the full stream
    val events = spark.range(0, 200000).select(
      pmod(col("id") * 31 + 7, lit(2000)).as("user_id"),
      col("id").as("ts"),
      pmod(xxhash64(col("id") + 1), lit(100)).as("bucket"))
    val stepA = col("bucket") < 12
    val stepB = col("bucket") >= 12 && col("bucket") < 18
    val stepC = col("bucket") >= 18 && col("bucket") < 21
    val nMatch = events.filter(stepA || stepB || stepC).count()
    val (counts, w, _, _) = measure {
      graft.ops.Funnel.funnelCounts(events, "user_id", "ts",
        Seq("a" -> stepA, "b" -> stepB, "c" -> stepC)).collect()
    }
    assert(counts.length == 3)
    assert(counts.map(_.getLong(2)).forall(_ > 0))
    // matching slices + three rounds of per-user minima (≤ users each);
    // the full stream (200k × stages) never crosses an exchange
    val bound = 2L * nMatch + 12L * 2000
    assert(w <= bound, s"shuffled $w records, bound $bound (stream 200000)")
    println(s"""{"scale_invariants":{"funnel_events":200000,"funnel_matching":$nMatch,"funnel_shuffle_write":$w}}""")
  }

  test("bigram LM at 10x: corpus-side exchange carries docs, not tokens") {
    // 5000 docs × 40 tokens: scoring explodes ~195k corpus bigrams, but
    // map-side combine must collapse them to ONE partial row per doc
    // before the exchange; the LM tables ride broadcasts
    val docs = toks(corpus10x)
    val nDocs = docs.count()
    val ref = docs.filter(col("doc_id") % 5 === 0)
    val lm = graft.ops.LangModel.trainBigram(ref, "toks")
    val refInstances = ref.select(explode(col("toks"))).count()
    val (scored, w, _, _) = measure {
      graft.ops.LangModel.scoreBigramLm(docs, "doc_id", "toks", lm).count()
    }
    assert(scored == nDocs, s"scored $scored of $nDocs")
    // training aggregates shuffle ≤ ref bigram partials; scoring
    // shuffles ≤ one partial per doc per partition — the ~195k corpus
    // bigram instances never cross an exchange
    val corpusInstances = 195000L
    val bound = refInstances + 10L * nDocs
    assert(w <= bound && bound < corpusInstances,
      s"shuffled $w, bound $bound, corpus instances $corpusInstances")
    println(s"""{"scale_invariants":{"lm_docs":$nDocs,"lm_shuffle_write":$w,"lm_corpus_bigrams":$corpusInstances}}""")
  }

  test("pageRank at 10x: per-round shuffle is O(E + V), never E², mass conserved") {
    // 5k nodes, ~50k deterministic edges + a hub every 100th edge; node
    // V-1 never sources an edge → a real dangling node at scale
    val v = 5000L
    val nE = 50000
    val edges = (1 to nE).map { i =>
      val s = (i * 2654435761L) % (v - 1)
      val d = if (i % 100 == 0) 0L else (i * 40503L) % v
      (s, d, 1.0)
    }.distinct.toDF("src", "dst", "w").repartition(32)
    val e = edges.count()
    val iters = 3
    val (ranks, w, _, _) = measure {
      graft.ops.Graph.pageRank(edges, iters).collect()
    }
    assert(math.abs(ranks.map(_.getDouble(1)).sum - 1.0) < 1e-9, "mass lost")
    // the hub (dst of every 100th edge) outranks a typical node by far
    val byNode = ranks.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // expected ≈ d·(hub-indegree/E) ≈ 0.0085 — ~43× the uniform 1/v
    assert(byNode(0L) > 10.0 / v, s"hub rank ${byNode(0L)}")
    // Shuffle discipline: setup (node distinct, out-weight, prob build)
    // plus per-round (prob⋈ranks re-exchange ≤ E+V, partial-aggregated
    // contrib ≤ E, rank rebuild ≤ 2V) — all linear in E and V. All-pairs
    // or per-round recompute of the edge normalization would blow past
    // this bound (E² = 2.5e9; recompute adds ≥ E·iters on top).
    val bound = 4L * e + 2L * v + iters.toLong * (2L * e + 4L * v)
    assert(w <= bound, s"shuffled $w records, bound $bound (E=$e V=$v)")
    println(s"""{"scale_invariants":{"pr_edges":$e,"pr_shuffle_write":$w,"pr_bound":$bound}}""")
  }

  test("triangles at 10x hub skew: wedge join is degree-capped, never deg²") {
    // hub 0 joined to 2000 spokes + a spoke ring: naive wedge enumeration
    // emits C(2000,2) ≈ 2.0e6 hub wedges; degree orientation points every
    // spoke→hub edge AT the hub (highest degree), so the hub sources NO
    // wedges and each spoke (degree 3) sources ≤ 3 — the curse-of-the-
    // last-reducer case the orientation exists for
    val h = 2000L
    val spokes = spark.range(1, h + 1).select(lit(0L).as("a"), col("id").as("b"))
    val ring = spark.range(1, h).select(col("id").as("a"), (col("id") + 1).as("b"))
    val edges = spokes.unionByName(ring).repartition(32)
    val e = edges.count()
    val (rows, w, _, _) = measure {
      graft.ops.Graph.triangleCounts(edges, "a", "b")
        .orderBy(col("node")).collect()
    }
    val byNode = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byNode(0L) == h - 1, "hub corners every spoke-pair triangle")
    assert(byNode.values.sum == 3L * (h - 1), "each triangle credited thrice")
    val naiveWedges = h * (h - 1) / 2
    // linear shuffle budget: distinct/degree/orientation passes + the
    // wedge and closing joins over ≤ 3-out-degree spokes — c·(E+V) with
    // room for AQE variance, still 20× under the naive wedge count
    val bound = 25L * e
    assert(w <= bound, s"shuffled $w records, bound $bound (E=$e)")
    assert(w < naiveWedges / 20,
      s"shuffle $w should stay far below naive wedges $naiveWedges")
    println(s"""{"scale_invariants":{"tri_edges":$e,"tri_shuffle_write":$w,"tri_bound":$bound,"tri_naive_wedges":$naiveWedges}}""")
  }

  test("labelPropagation at 10x: per-round shuffle is O(E + V), labels never cross the weak bridge") {
    // two 2500-node star communities (heavy weight-3 hub edges) joined by
    // ONE weight-1 bridge between the hubs. Synchronous star LPA
    // oscillates (hub↔spokes swap labels each round) — which is exactly
    // why the assertion is weight-dominance, not convergence: every vote
    // a node receives from inside its own community carries weight 3, the
    // bridge only 1, so no label can ever migrate across communities.
    val half = 2500L
    val starA = spark.range(1, half)
      .select(lit(0L).as("src"), col("id").as("dst"), lit(3.0).as("w"))
    val starB = spark.range(half + 1, 2 * half)
      .select(lit(half).as("src"), col("id").as("dst"), lit(3.0).as("w"))
    val bridge = Seq((0L, half, 1.0)).toDF("src", "dst", "w")
    val edges = starA.unionByName(starB).unionByName(bridge).repartition(32)
    val e = edges.count()
    val v = 2 * half
    val rounds = 3
    val (rows, w, _, _) = measure {
      graft.ops.Graph.labelPropagation(edges, "src", "dst", "w", rounds)
        .collect()
    }
    val lbl = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.size.toLong == v, "every node labeled")
    assert((0L until half).forall(n => lbl(n) < half), "A labels stay in A")
    assert((half until 2 * half).forall(n => lbl(n) >= half), "B labels stay in B")
    // Shuffle discipline: setup (symmetrize+sum ≤ 2E, node distinct ≤ 2E,
    // label init ≤ V) plus per-round (edge⋈label exchange ≤ 2E+V,
    // partial-aggregated vote groupBy ≤ 2E, argmax regroup ≤ 2E) — all
    // linear in E and V; an all-pairs or window-sort spelling would not be.
    val bound = 6L * e + 2L * v + rounds.toLong * (6L * e + 4L * v)
    assert(w <= bound, s"shuffled $w records, bound $bound (E=$e V=$v)")
    println(s"""{"scale_invariants":{"lpa_edges":$e,"lpa_shuffle_write":$w,"lpa_bound":$bound}}""")
  }

  test("hits at 10x: per-round shuffle is O(E + V), sparse intermediates never densify") {
    // 5k-spoke star + a chain tail: hubs/authorities polarize (spokes are
    // pure hubs, the center a pure authority) and the chain keeps both
    // score tables non-trivial across rounds
    val s5 = 5000L
    val spokes = spark.range(1, s5 + 1)
      .select(col("id").as("src"), lit(0L).as("dst"), lit(1.0).as("w"))
    val chain = spark.range(0, 50)
      .select((col("id") + s5 + 1).as("src"), (col("id") + s5 + 2).as("dst"),
        lit(1.0).as("w"))
    val edges = spokes.unionByName(chain).repartition(32)
    val e = edges.count()
    // derive V from the data (like the LPA test derives E) rather than
    // hand-counting the star+chain construction
    val v = edges.select(col("src").as("n"))
      .unionByName(edges.select(col("dst").as("n"))).distinct().count()
    val iters = 3
    val (rows, w, _, _) = measure {
      graft.ops.Graph.hits(edges, iters = iters).collect()
    }
    val byNode = rows.map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(byNode(0L)._2 - byNode.values.map(_._2).max) < 1e-12,
      "the star center is the top authority")
    assert(byNode(0L)._1 == 0.0, "the center sources nothing — hub exactly 0")
    // per round: two edge⋈score joins (≤ 2(E+V) exchange each) + two
    // partial-aggregated score groupBys (≤ E) + broadcast normalizers;
    // setup ≤ a few E. Densifying intermediates (a nodes-join each
    // half-round) or an all-pairs spelling would overshoot.
    val bound = 6L * e + 2L * v + iters.toLong * (6L * e + 6L * v)
    assert(w <= bound, s"shuffled $w records, bound $bound (E=$e V=$v)")
    println(s"""{"scale_invariants":{"hits_edges":$e,"hits_shuffle_write":$w,"hits_bound":$bound}}""")
  }

  test("crossOverlap at 10x skewed sources: shuffle O(distinct (source,gram)), " +
      "per-fingerprint state ≤ #sources") {
    // 5500 docs across 10 sources, HEAVILY skewed (≈80% in s0) — the
    // realistic corpus-mix shape; every 20th base doc is replicated
    // verbatim into a second source family (r0..r4) so cross-source
    // overlap exists with known structure
    val srcOf = when(pmod(col("doc_id"), lit(100)) < 80, lit("s0"))
      .otherwise(concat(lit("s"), pmod(col("doc_id"), lit(4)) + 1))
    val base = corpus10x.select(srcOf.as("source"), col("doc_id"), col("text"))
    val replicas = corpus10x.filter(col("doc_id") % 20 === 0)
      .select(concat(lit("r"),
          pmod(floor(col("doc_id") / 20).cast("long"), lit(5))).as("source"),
        col("doc_id"), col("text"))
    val docs = base.unionByName(replicas)
      .select(col("source"), split(col("text"), " ").as("toks"))
    val nSources = 10L
    // the operator's own fingerprint spelling, counted for the bound:
    // P = distinct (source, gram) pairs — the claimed shuffle currency
    val p = docs.select(col("source"),
        explode(Dedup.tokenShingleHashes(col("toks"), 8)).as("sh"))
      .distinct().count()
    val (rows, w, _, _) = measure {
      Dedup.crossOverlap(docs, "source", "toks").collect()
    }
    // structure: every replica source overlaps something; no pair ever
    // exceeds the unordered-pairs cap; skew didn't manufacture overlap
    // between disjoint s-sources (distinct token streams)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert((0 to 4).forall(k => pairs.exists(pr =>
      pr._1 == s"r$k" || pr._2 == s"r$k")), s"replica coverage in $pairs")
    assert(rows.forall(_.getLong(2) > 0))
    assert(pairs.size <= nSources * (nSources - 1) / 2)
    // per-fingerprint state cap: the collected group-set is bounded by
    // the SOURCE COUNT, not the doc count — re-derive with the same
    // grouping and assert the max observed set size
    val maxSet = docs.select(col("source"),
        explode(Dedup.tokenShingleHashes(col("toks"), 8)).as("sh"))
      .distinct().groupBy(col("sh")).agg(countDistinct(col("source")).as("k"))
      .agg(max(col("k"))).head().getLong(0)
    assert(maxSet <= nSources, s"per-fingerprint group-set $maxSet")
    // shuffle: three keyed exchanges (the (source,gram) distinct, the
    // fingerprint groupBy, the pair-count groupBy ≤ S²) — each ∝ P, so
    // a small multiple of P; an sh-keyed SELF-JOIN spelling re-exchanges
    // the pair table wide of this bound, and any all-pairs-of-docs
    // spelling is out by orders of magnitude
    val bound = 3L * p + nSources * nSources + 1000L
    assert(w <= bound, s"shuffled $w records, bound $bound (P=$p)")
    println(s"""{"scale_invariants":{"xover_distinct_pairs":$p,"xover_shuffle_write":$w,"xover_bound":$bound}}""")
  }

  test("longestDupNgram at 10x: walk path finds the planted 40-run, " +
      "shuffle stays a small multiple of n") {
    // the near-dup corpus: every 10th doc reappears with 2 tokens
    // prepended, so the longest duplicated run is each copied doc's full
    // 40-token body — 500 distinct duplicated 40-grams, all below the
    // 64 cap, forcing the LCP-walk path (no tie survives depth 64)
    val docs = toks(corpus10x)
    val nTok = docs.agg(sum(size(col("toks")))).head().getLong(0)
    val (row, w, _, _) = measure {
      graft.ops.SuffixArray
        .longestDupNgram(docs, "doc_id", "toks", rounds = 6).head()
    }
    assert(row.getLong(0) === 40L, s"max_dup_len ${row.getLong(0)}")
    assert(row.getLong(1) === 500L, s"n_dup_grams ${row.getLong(1)}")
    // jump-start rank (~1·n) + two tied-only refinements (O(tied)) +
    // the order sort + SA-adjacent pairing (~3·n), then the walk: the
    // pair table re-keys at every lookup (the join key is i+off, off
    // changes per level), so each of the 6 level lookups and 2 window
    // fetches exchanges pairs + level ≈ 2·n — ~22·n measured in total,
    // rows of two/three LONGS. The enumeration spelling ships n·cap
    // ≈ 64× the corpus in rows, each CARRYING a ~400-byte 64-token gram
    // — ~80× the bytes of this plan before its first aggregation.
    assert(w <= 26L * nTok, s"shuffled $w rows for $nTok tokens")
    println(s"""{"scale_invariants":{"ldn_tokens":$nTok,"ldn_shuffle_write":$w,"ldn_naive_rows":${nTok * 64}}}""")
  }

  test("exactSubstrDedup at 10x: shuffle O(windows), never the covered-" +
      "position explode; planted copies erased, shifted copies keep novelty") {
    // 5500 docs incl. 500 one-token-shifted near-copies: every shifted
    // doc's tail windows duplicate the original, so ~10% of the corpus
    // is removable — the realistic boilerplate fraction
    val docs = toks(corpus10x)
    val nTok = docs.agg(sum(size(col("toks")))).head().getLong(0)
    val l = 16
    val (rows, w, _, _) = measure {
      Dedup.exactSubstrDedup(docs, "doc_id", "toks", L = l).collect()
    }
    val byId = rows.map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // every shifted copy (doc_id ≥ 100000) loses its duplicated tail and
    // keeps ≤ L+1 tokens of novelty; originals are untouched (their
    // windows are the corpus-first occurrences)
    val shifted = byId.filter(_._1 >= 100000L)
    assert(shifted.nonEmpty)
    assert(shifted.forall { case (_, (nRem, text)) =>
      nRem >= 40L - l && text.split(" ").length <= l + 1
    }, "shifted copies must lose their duplicated tails")
    assert(byId.filter(_._1 < 100000L).forall(_._2._1 == 0L),
      "originals are first occurrences — nothing removed")
    // shuffled rows ∝ windows (one per position) across the hash
    // aggregate + join + per-doc interval/reassembly exchanges — a small
    // multiple of n; the covered-position spelling explodes n·L rows
    // before ever shuffling
    assert(w <= 8L * nTok, s"shuffled $w rows for $nTok tokens")
    println(s"""{"scale_invariants":{"esd_tokens":$nTok,"esd_shuffle_write":$w,"esd_naive_rows":${nTok * l}}}""")
  }

  test("globalRank at 10x heavy-key skew: no task ever holds the stream, " +
      "and the heavy key costs no more than a unique one") {
    // 200k rows, HALF carrying one key — the shape that melts both the
    // naive unpartitioned window (whole stream through one task) and a
    // co-locating range partition (half the stream in the heavy key's
    // partition). The distinct-key spelling ranks ~100k UNIQUE keys.
    val rows = spark.range(0, 200000, 1, 8).select(
      col("id"),
      when(col("id") % 2 === 0, lit(7L))
        .otherwise(pmod(xxhash64(col("id")), lit(1000000L))).as("k"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val n = rows.count()
      val (_, _, _, naiveMax) = measure {
        rows.withColumn("r", dense_rank().over(Window.orderBy(col("k"))))
          .agg(sum(col("r"))).head()
      }
      val (ranked, _, _, twoPhaseMax) = measure {
        graft.ops.GlobalRank.denseRank(rows, Seq("k"), "r")
          .agg(sum(col("r")), max(col("r"))).head()
      }
      // the naive window funnels everything through one task; the
      // two-phase plan's biggest task sees ~distinct/shufflePartitions
      // (the pid-hash window over the ranked distinct-key stream) — the
      // heavy key contributes ONE row there, and its 100k carriers ride
      // the broadcast rank join without ever re-shuffling
      assert(naiveMax >= n, s"naive window max task read $naiveMax")
      assert(twoPhaseMax <= naiveMax / 4,
        s"two-phase max task $twoPhaseMax not « naive $naiveMax")
      assert(ranked.getLong(0) > 0)
      // sparseRank sorts the FULL row stream (its scan needs every row),
      // so the skew question is sharper: Spark's range partitioner maps
      // equal sort keys to ONE partition, and without the synthetic
      // tiebreak the heavy key's 100k rows all sort in one task
      // (measured before the fix: one partition held >n/2). With the
      // tiebreak the partitioner balances by count and the boundary
      // carry restitches the split group.
      val (sparse, _, _, sparseMax) = measure {
        graft.ops.GlobalRank.sparseRank(rows, Seq("k"), "r")
          .agg(sum(col("r")), max(col("r"))).head()
      }
      assert(sparse.getLong(0) > 0)
      // balanced sort partitions here are ~n/4 (4 shuffle partitions);
      // a concentrated heavy group would read ≥ its full 100k rows in
      // one task — assert clearly below the group size
      val heavy = n / 2
      assert(sparseMax <= heavy * 4 / 5,
        s"sparseRank max task $sparseMax ≥ ~heavy group $heavy — " +
          "tie group concentrated in one sort partition")
      println(s"""{"scale_invariants":{"grank_naive_max_task":$naiveMax,"grank_twophase_max_task":$twoPhaseMax,"grank_sparse_max_task":$sparseMax}}""")
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("suffix doubling at 10x: shuffled rows O(n log cap), never O(n·cap)") {
    // 100k-token corpus (2500 docs × 40 tokens) over a 100-token
    // vocabulary — dense repetition, so rank groups stay non-trivial
    // deep into the doubling. Depth cap 16 (4 rounds).
    val docs = spark.range(0, 2500, 1, 8).select(
      col("id").as("doc_id"),
      transform(sequence(lit(0), lit(39)),
        i => concat(lit("w"), pmod(xxhash64(col("id") * 40 + i), lit(100))))
        .as("toks"))
    val nPos = 2500L * 41L // tokens + one separator per doc
    val rounds = 4
    // Two AQE small-data accommodations would mask the at-scale shape on
    // this toy corpus: partition coalescing (merges every exchange into
    // one task) and runtime SMJ→broadcast conversion (collects a whole
    // ~100k-row side in ONE build task). At 100 TB neither fires — the
    // rank/level tables are corpus-sized, far above both thresholds — so
    // pin the at-scale plan: no coalescing, no broadcast, every join a
    // genuine shuffle join.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val (_, w, _, maxTask) = try {
      measure {
        graft.ops.SuffixArray
          .suffixRanks(docs, "doc_id", "toks", rounds,
            docsPerBucket = 128L)
          .agg(sum(col("r"))).head()
      }
    } finally {
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    // construction = one window-string sort (the jump-start: sort +
    // group-aware zip scan) over the position explode — measured ≈1.0·n
    // exchanged rows in total, NOT n·cap: the enumeration spelling this
    // replaces shuffles n·cap gram rows carrying length-cap payloads
    // (here 16× the corpus in rows alone, with 16-token strings per
    // row). Bound at 4·n for headroom; the first doubling spelling of
    // this operator measured 36·n on the same corpus before the
    // jump-start + tied-only-refinement rework.
    val bound = 4L * nPos
    assert(w <= bound, s"shuffled $w records, bound $bound (n=$nPos)")
    assert(maxTask < nPos, s"one task read $maxTask of $nPos — not distributed")
    println(s"""{"scale_invariants":{"suffix_n":$nPos,"suffix_shuffle_write":$w,"suffix_bound":$bound,"suffix_max_task":$maxTask}}""")
  }

  test("suffix refinement at cap 1024: six rounds above the jump-start, " +
      "tied set tracks the surviving run and dies at the cap") {
    // 100 docs × 1000 tokens over a 99991 vocab (16-token windows
    // essentially collision-free), plus ONE full-document copy — a
    // planted 1000-token duplicated run, the "1k-token runs at 100 TB"
    // shape the doubling-depth claim is about. At depth d the tied set
    // is exactly the copy-pair suffixes whose d-window still fits before
    // the unique separator: 2·max(0, 1001−d) — so the decay curve is the
    // run's own geometry, measurable level by level.
    val base = spark.range(0, 100, 1, 8).select(
      col("id").as("doc_id"),
      transform(sequence(lit(0), lit(999)),
        i => concat(lit("w"), pmod(xxhash64(col("id") * 1000 + i), lit(99991))))
        .as("toks"))
    val docs = base.unionByName(
      base.filter(col("doc_id") === 0)
        .select(lit(100L).as("doc_id"), col("toks")))
    val rounds = 10 // cap 1024
    val (k0, _, deeper) = graft.ops.SuffixArray.rankStack(
      docs, "doc_id", "toks", rounds,
      graft.ops.Materialize.Local, docsPerBucket = 16L)
    assert(k0 === 4)
    assert(deeper.size === rounds - k0 + 1,
      "jump-start level + six refinement rounds")
    val tiedPerLevel = deeper.map(_.filter(col("tied")).count())
    val expected = (k0 to rounds).map(k => 2L * math.max(0L, 1001L - (1L << k)))
    assert(tiedPerLevel === expected,
      s"tied decay $tiedPerLevel != run geometry $expected")
    // the planted run dies before the cap: depth-1024 has zero ties, so
    // the walk (not the saturation short-circuit) reports exactly 1000
    val top = graft.ops.SuffixArray
      .longestDupNgram(docs, "doc_id", "toks", rounds, docsPerBucket = 16L)
      .head()
    assert(top.getLong(0) === 1000L, s"expected the planted 1000-run: $top")
    println(s"""{"scale_invariants":{"suffix1024_k0":$k0,"suffix1024_refine_rounds":${rounds - k0},"suffix1024_tied_per_level":[${tiedPerLevel.mkString(",")}]}}""")
  }

  test("SnapshotTable upsert at 10x: merge-on-write reads only the hit " +
      "buckets' bytes, never the table") {
    import graft.sources.SnapshotTable
    val root = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap10x").toFile,
      "tbl").getAbsolutePath
    val buckets = 32
    val big = spark.range(0, 100000, 1, 8).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") * 7).as("v"))
    SnapshotTable.create(big, root, Seq("id"), buckets)
    // denominator: what a full-table scan costs in input bytes
    val (_, fullBytes, fullRecs) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.read(spark, root).agg(count(lit(1))).head()
    }
    assert(fullRecs >= 100000L)
    // single-key upsert: the merge plan may only touch ONE bucket's
    // files (the guard probe + hit-bucket distinct scan the BATCH, not
    // the table; the 4× slack covers parquet footer overhead and the
    // merged read+rewrite of the one hit bucket)
    val batch = Seq((5L, "UPD", 999L)).toDF("id", "tag", "v")
    val (_, upBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.upsert(batch, root)
    }
    val bound = 4L * fullBytes / buckets
    assert(upBytes <= bound,
      s"upsert read $upBytes bytes; full table is $fullBytes over $buckets buckets (bound $bound)")
    // content sanity after the pruned merge
    val row = SnapshotTable.read(spark, root)
      .filter(col("id") === 5L).collect()
    assert(row.map(r => (r.getString(1), r.getLong(2))).toSeq === Seq(("UPD", 999L)))
    assert(SnapshotTable.read(spark, root).count() === 100000L)
    println(s"""{"scale_invariants":{"snap_full_bytes":$fullBytes,"snap_upsert_bytes":$upBytes,"snap_buckets":$buckets}}""")
  }

  test("SnapshotTable key-pruned reads at 10x: readForKeys and the DSv2 " +
      "connector's pushed point lookup both read only the hit buckets' " +
      "bytes") {
    import graft.sources.SnapshotTable
    val root = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snaprd10x").toFile,
      "tbl").getAbsolutePath
    val buckets = 32
    val big = spark.range(0, 100000, 1, 8).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") * 7).as("v"))
    SnapshotTable.create(big, root, Seq("id"), buckets)
    val (_, fullBytes, fullRecs) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.read(spark, root).agg(count(lit(1))).head()
    }
    assert(fullRecs >= 100000L)
    // object API: single-key probe → one hit bucket's files (4× slack
    // for parquet footers; the probe side itself is 3 driver-local rows)
    val probe = Seq(5L, 77777L, 99999L).toDF("id") // 3 keys ≤ 3 buckets
    val (rows1, keyBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.readForKeys(probe, root).collect()
    }
    val bound = 4L * 3L * fullBytes / buckets
    assert(rows1.map(_.getLong(0)).toSet === Set(5L, 77777L, 99999L))
    assert(keyBytes <= bound,
      s"readForKeys read $keyBytes bytes; full=$fullBytes/$buckets buckets (bound $bound)")
    // DSv2 connector: the pushed `id = 5` predicate must prune files
    // before the scan plans — same envelope as the object API
    val (rows2, v2Bytes, _) = ShuffleMetrics.measureInput(spark) {
      spark.read.format("graft-snapshot").load(root)
        .filter(col("id") === 5L).collect()
    }
    val v2Bound = 4L * fullBytes / buckets
    assert(rows2.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((5L, "v5")))
    assert(v2Bytes <= v2Bound,
      s"connector lookup read $v2Bytes bytes; bound $v2Bound")
    println(s"""{"scale_invariants":{"snap_read_full_bytes":$fullBytes,"snap_readforkeys_bytes":$keyBytes,"snap_connector_lookup_bytes":$v2Bytes,"snap_read_buckets":$buckets}}""")
  }

  test("SnapshotTable rescale at 10x: the layout grow moves zero data " +
      "bytes, a mixed-layout point lookup prunes old dirs at 1/oldB " +
      "and fresh dirs at 1/newB, and compaction tightens it to 1/newB") {
    import graft.sources.SnapshotTable
    val root = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snaprs10x").toFile,
      "tbl").getAbsolutePath
    val (oldB, newB) = (8, 32)
    val big = spark.range(0, 100000, 1, 8).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") * 7).as("v"))
    SnapshotTable.create(big, root, Seq("id"), oldB)
    val (_, baseBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.read(spark, root).agg(count(lit(1))).head()
    }
    // the grow itself: O(entries) driver metadata, ZERO data input
    val (_, rescaleBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.rescaleBuckets(spark, root, newB)
    }
    assert(rescaleBytes === 0L,
      s"rescale read $rescaleBytes data bytes; must be metadata-only")
    // fresh commit under the new layout → mixed-layout table
    val fresh = spark.range(100000, 110000, 1, 4).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") * 7).as("v"))
    SnapshotTable.append(fresh, root)
    val (_, fullBytes, fullRecs) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.read(spark, root).agg(count(lit(1))).head()
    }
    assert(fullRecs >= 110000L)
    // point lookup across the mix: ≤ one OLD dir (1/oldB of the base
    // table) + the congruent fresh dirs (1/newB of the append); 4×
    // slack for parquet footers
    val (rows1, mixBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.readForKeys(Seq(4242L).toDF("id"), root).collect()
    }
    assert(rows1.map(_.getLong(0)).toSeq === Seq(4242L))
    val mixBound = 4L * (baseBytes / oldB + (fullBytes - baseBytes) / newB)
    assert(mixBytes <= mixBound,
      s"mixed-layout lookup read $mixBytes bytes (bound $mixBound)")
    // full compact migrates everything; the same lookup now prunes at
    // the NEW layout — the end state the incremental migration reaches
    SnapshotTable.compact(spark, root)
    val (rows2, newBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.readForKeys(Seq(4242L).toDF("id"), root).collect()
    }
    assert(rows2.map(_.getLong(0)).toSeq === Seq(4242L))
    val newBound = 4L * fullBytes / newB
    assert(newBytes <= newBound,
      s"post-migration lookup read $newBytes bytes (bound $newBound)")
    println(s"""{"scale_invariants":{"snap_rescale_input_bytes":$rescaleBytes,"snap_mixed_lookup_bytes":$mixBytes,"snap_mixed_lookup_bound":$mixBound,"snap_migrated_lookup_bytes":$newBytes,"snap_migrated_lookup_bound":$newBound,"snap_rescale_layouts":"$oldB->$newB"}}""")
  }

  test("SnapshotTable key blooms at 10x: an absent-key point lookup " +
      "plans ZERO input bytes through the connector; a present key " +
      "stays inside the single-bucket envelope") {
    import graft.sources.SnapshotTable
    val root = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snapbloom10x").toFile,
      "tbl").getAbsolutePath
    val buckets = 32
    val big = spark.range(0, 100000, 1, 8).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") * 7).as("v"))
    SnapshotTable.create(big, root, Seq("id"), buckets)
    val (_, fullBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.read(spark, root).agg(count(lit(1))).head()
    }
    // absent key: the bucket pruner keeps 1 dir, the bloom rejects it —
    // the scan plans no partitions at all
    val (miss, missBytes, _) = ShuffleMetrics.measureInput(spark) {
      spark.read.format("graft-snapshot").load(root)
        .filter(col("id") === 7777777L).collect()
    }
    assert(miss.isEmpty && missBytes === 0L,
      s"absent-key lookup read $missBytes bytes")
    // present key: bloom keeps exactly the hit dir
    val (hit, hitBytes, _) = ShuffleMetrics.measureInput(spark) {
      spark.read.format("graft-snapshot").load(root)
        .filter(col("id") === 4242L).collect()
    }
    assert(hit.length === 1 && hitBytes <= 4L * fullBytes / buckets)
    println(s"""{"scale_invariants":{"snap_bloom_full_bytes":$fullBytes,"snap_bloom_miss_bytes":$missBytes,"snap_bloom_hit_bytes":$hitBytes,"snap_bloom_buckets":$buckets}}""")
  }

  test("SnapshotTable data-skipping at 10x: a range predicate over " +
      "window-correlated append commits reads only the matching " +
      "commits' bytes") {
    import graft.sources.SnapshotTable
    val root = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snapskip10x").toFile,
      "tbl").getAbsolutePath
    // 10 append commits, 10k rows each, DISJOINT v windows — the
    // time-series shape whose per-dir min/max the manifest records
    def window(w: Int) = spark.range(w * 10000L, (w + 1) * 10000L, 1, 4)
      .select(col("id"), concat(lit("v"), col("id")).as("tag"),
        (col("id") * 7).as("v"))
    SnapshotTable.create(window(0), root, Seq("id"), 4)
    (1 until 10).foreach(w => SnapshotTable.append(window(w), root))
    // denominator must FORCE a scan: a SUM can never be answered from
    // manifest row counts, so the SnapshotMetadataOnlyCount rule
    // (installed on this shared session by SnapshotV2Spec) leaves it
    // alone — count(*) AND count(non-null col) (NullPropagation folds
    // it to count(1)) would both be metadata-answered with zero input
    val (_, fullBytes, fullRecs) = ShuffleMetrics.measureInput(spark) {
      spark.read.format("graft-snapshot").load(root)
        .agg(sum(col("v"))).head()
    }
    assert(fullRecs >= 100000L)
    // newest-window range: only the last commit's dirs (10% of rows);
    // 2× slack for parquet footer overhead and window-boundary files
    val (n, rangeBytes, _) = ShuffleMetrics.measureInput(spark) {
      spark.read.format("graft-snapshot").load(root)
        .filter(col("v") >= 7L * 90000L).agg(count(lit(1))).head().getLong(0)
    }
    assert(n === 10000L)
    val bound = 2L * fullBytes / 10L
    assert(rangeBytes <= bound,
      s"range read $rangeBytes bytes; full=$fullBytes over 10 commits (bound $bound)")
    println(s"""{"scale_invariants":{"snap_skip_full_bytes":$fullBytes,"snap_skip_range_bytes":$rangeBytes,"snap_skip_commits":10}}""")
  }

  test("Snapshot streaming source at 10x: a checkpointed resume reads " +
      "only the new commits' bytes, never the already-served snapshot") {
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_snapstr10x")
    val root = new java.io.File(base.toFile, "tbl").getAbsolutePath
    val ckpt = new java.io.File(base.toFile, "ckpt").getAbsolutePath
    val out = new java.io.File(base.toFile, "out").getAbsolutePath
    val big = spark.range(0, 100000, 1, 8).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") * 7).as("v"))
    SnapshotTable.create(big, root, Seq("id"), 4)
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(root)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: the whole snapshot (denominator for the resume bound); the
    // output count is read OUTSIDE the measured block — it scans the
    // sink, not the source
    val (_, fullBytes, _) = ShuffleMetrics.measureInput(spark)(drain())
    assert(spark.read.parquet(out).count() === 100000L)
    // one 10% append, then resume from the checkpoint: the second run
    // may only scan the fresh commit's ROWS (records, not bytes — at
    // this fixture size parquet footers dominate byte counts, and the
    // record metric is the actual O(new data) claim)
    SnapshotTable.append(spark.range(100000, 110000, 1, 4).select(col("id"),
      concat(lit("v"), col("id")).as("tag"), (col("id") * 7).as("v")), root)
    val (_, resumeBytes, resumeRecs) =
      ShuffleMetrics.measureInput(spark)(drain())
    assert(spark.read.parquet(out).count() === 110000L)
    assert(resumeRecs === 10000L,
      s"resume scanned $resumeRecs source records; the append was 10000 " +
        s"(already-served snapshot rows must not be re-read)")
    println(s"""{"scale_invariants":{"snap_stream_full_bytes":$fullBytes,"snap_stream_resume_bytes":$resumeBytes,"snap_stream_resume_records":$resumeRecs,"snap_stream_append_frac":10}}""")
  }

  // ---- streaming state bounds (measured, not documented) ----

  /** Stage `batches` as one parquet file each with ascending mtimes, so a
    * `maxFilesPerTrigger=1` file stream replays them as ordered
    * micro-batches — the same staging discipline as the q150 drain. */
  private def stageBatches(batches: Seq[DataFrame]): String = {
    import org.apache.hadoop.fs.Path
    val stage = java.nio.file.Files.createTempDirectory("graft_scale_stream")
    val streamDir = new Path(stage.toString, "in")
    val fs = streamDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(streamDir)
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = new Path(stage.toString, s"tmp_$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.globStatus(new Path(tmp, "part-*"))(0).getPath
      val dst = new Path(streamDir, f"b$i%03d.parquet")
      fs.rename(part, dst)
      fs.setTimes(dst, 1000000L * (i + 1), -1)
      fs.delete(tmp, true)
    }
    streamDir.toString
  }

  /** Drain a streaming DataFrame with AvailableNow into a memory sink and
    * return (result rows, per-batch state rows) — `numRowsTotal` of the
    * single stateful operator, in batch order. */
  private def drainWithState(out: DataFrame, name: String)
      : (Array[org.apache.spark.sql.Row], Seq[Long]) = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val state = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal)
    (spark.table(name).collect(), state)
  }

  private def ts(secs: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(secs))

  test("stream-stream left-outer join state is watermark-bounded: peak <= " +
      "rows in horizon, drained to the sentinels after eviction") {
    // 500 clicks (users 1..500), purchases for even users 5 min later —
    // 250 matches, 250 null emissions at eviction. The 1 h watermark
    // means NOTHING evicts until the sentinel batch outruns it.
    val ev = (1L to 500L).map(u => (u, ts(u), u, "click")) ++
      (2L to 500L by 2).map(u => (u + 10000L, ts(u + 300L), u, "purchase"))
    val real = ev.toDF("event_id", "ts", "user_id", "event_type")
    val sentinels = Seq(
      (-1L, ts(36000L), -1L, "click"),
      (-2L, ts(36000L), -2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val none = real.filter(lit(false))
    val dir = stageBatches(Seq(real, sentinels, none, none))
    val stream = spark.readStream.schema(real.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // NOTE: the sentinel filter must run on the SINK table, not inside
    // the streaming plan — pre-sink it pushes below the watermark nodes
    // and deletes the sentinels before they can advance the watermark
    // (measured: state pinned at 750 for every batch, zero evictions)
    val (allRows, state) = drainWithState(
      graft.streaming.EventStream.clickPurchaseJoin(stream, "left_outer"),
      "scale_ssjoin_state")
    val rows = allRows.filter(r => r.getLong(0) >= 0)
    assert(rows.length === 500)
    assert(rows.count(_.isNullAt(2)) === 250) // unmatched → null purchase_id
    // peak state = every row inside the (still-open) watermark horizon,
    // plus the two sentinels — never more
    assert(state.max <= 500L + 250L + 2L, s"state per batch: $state")
    // after the sentinel advances the watermark and the bridge batch
    // rotates it in, eviction drains ALL real rows: only sentinels remain
    assert(state.last <= 2L,
      s"join state not drained after eviction: $state")
    println(s"""{"scale_invariants":{"ssjoin_state_per_batch":[${state.mkString(",")}],"ssjoin_rows_in_horizon":752}}""")
  }

  test("streaming dedup state is key-bounded: re-sent keys never grow " +
      "state, eviction drains it") {
    // three identical 2000-row batches over the SAME 1000 keys (2 events
    // per key per batch): input triples, state must stay <= 1000+sentinel
    val keys = 0L until 1000L
    def batch(gen: Long) = keys.flatMap(u => Seq(
        (gen * 10000L + u * 2, ts(u % 600), u, "click"),
        (gen * 10000L + u * 2 + 1, ts(u % 600 + 1), u, "click")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val sentinel = Seq((999999L, ts(36000L), -1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val none = batch(0).filter(lit(false))
    val dir = stageBatches(Seq(batch(0), batch(1), batch(2), sentinel, none))
    val stream = spark.readStream.schema(batch(0).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val (rows, state) = drainWithState(
      graft.streaming.EventStream.dedupKeys(stream, Seq("user_id")),
      "scale_dedup_state")
    // 1000 keys emitted once each + the sentinel key
    assert(rows.length === 1001)
    // bounded by live-key cardinality at every batch, 6000 inputs or not
    assert(state.max <= 1001L, s"state per batch: $state")
    // sentinel watermark (+10 h vs 1 h lateness) evicts every real key
    assert(state.last <= 2L,
      s"dedup state not drained after eviction: $state")
    println(s"""{"scale_invariants":{"dedup_state_per_batch":[${state.mkString(",")}],"dedup_distinct_keys":1001}}""")
  }
}
