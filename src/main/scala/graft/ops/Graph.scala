package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality: weighted PageRank by power iteration (Page,
  * Brin, Motwani, Winograd 1999, "The PageRank Citation Ranking").
  *
  * Complements [[Dedup.connectedComponents]]/[[Dedup.connectedComponentsStar]]
  * — the other half of the graph toolkit a curation pipeline needs once it
  * has a link structure over its corpus (navigation graphs, citation
  * graphs, near-dup graphs): CC answers "which pages form one group",
  * PageRank answers "which pages matter", e.g. for importance-weighted
  * sampling of crawl data.
  */
object Graph {

  /** Cast `w` to double, failing the job loudly on a null or
    * non-positive weight. The normalizing operators ([[hits]],
    * [[labelPropagation]]) divide by / argmax over weight SUMS; a zero
    * or negative weight would corrupt those silently (0-normalizer →
    * NaN, signed sums ≠ Σ|·|), so it is an input-contract violation,
    * not a value to filter away behind the caller's back. Rides inside
    * the one-time edge projection — no extra pass over the data. */
  private def positiveWeight(w: org.apache.spark.sql.Column,
      op: String): org.apache.spark.sql.Column = {
    val d = w.cast("double")
    when(d.isNull || d <= 0.0,
      raise_error(concat(lit(s"$op: edge weight must be strictly positive, got "),
        coalesce(w.cast("string"), lit("null")))).cast("double"))
      .otherwise(d)
  }

  /** Weighted PageRank over a directed edge list `(src, dst, w)` →
    * `(node, rank)` for every node appearing as src or dst.
    *
    * Semantics — the classic random surfer with uniform dangling-mass
    * redistribution, so Σ rank = 1 after every round:
    * {{{
    *   r_0(v)     = 1/N
    *   r_{t+1}(v) = (1-d)/N + d · ( Σ_{u→v} r_t(u) · w(u,v)/W(u) + D_t/N )
    * }}}
    * where `W(u)` is u's total out-weight and `D_t = Σ r_t(u)` over
    * dangling nodes (nodes with no out-edges).
    *
    * Scale shape (the [[Dedup.connectedComponents]] shuffle discipline):
    *   - The normalized transition table `(src, dst, p = w/W(u))` is built
    *     ONCE and materialized via `mat`; rounds never recompute it.
    *   - Per round: one join of the (node, rank) table against the
    *     transition table plus one partial-aggregated `groupBy(dst)` — the
    *     Pregel message exchange, linear in |E| and unavoidable — and the
    *     dangling mass as an IN-PLAN broadcast 1-row aggregate (no
    *     per-round driver action). Only (node, rank) pairs ever shuffle;
    *     payloads/documents do not. The eager `Local` default is the
    *     MEASURED best materialization: a lazy `Persist` sounds cheaper
    *     (one job at the final action) but each round's dangling-mass
    *     broadcast plans against a not-yet-filled cache and re-derives
    *     the rank lineage — 2–4× slower end-to-end at sf0.1.
    *   - `mat` cuts plan depth every round (localCheckpoint / persist /
    *     parquet stage), so `iters` rounds never stack an `iters`-deep
    *     Catalyst plan.
    *
    * The dangling-node table is computed once (anti-join against out-degree)
    * and is at most |V| node ids; at 100 TB the rank table is |V| rows —
    * orders of magnitude smaller than the corpus the graph was built from.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      mat: Materialize = Materialize.Local): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
    val nodes = mat(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count().toDouble
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    val prob = mat(e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("tw")).as("p")))
    // the dangling flag rides ON the rank table (derived once, carried
    // through every checkpoint): the per-round dangling-mass aggregate
    // is then a filter+sum SCAN of the already-materialized ranks
    // instead of an anti-join table plus a per-round join (guide §2.4 —
    // one less join subplan per iteration, same float arithmetic)
    var ranks = mat(nodes
      .join(outW.select(col("src").as("node"), lit(true).as("_out")),
        Seq("node"), "left")
      .select(col("node"), lit(1.0 / n).as("rank"),
        coalesce(col("_out"), lit(false)).as("_out")))
    for (_ <- 1 to iters) {
      // dangling mass rides IN-PLAN as a broadcast 1-row aggregate — no
      // per-round driver action
      val dm = broadcast(ranks.filter(!col("_out"))
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm")))
      val contrib = prob
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst")).agg(sum(col("p") * col("rank")).as("c"))
        .select(col("dst").as("node"), col("c"))
      ranks = mat(ranks.select(col("node"), col("_out"))
        .join(contrib, Seq("node"), "left").crossJoin(dm)
        .select(col("node"), (lit((1 - damping) / n) + lit(damping) *
          (coalesce(col("c"), lit(0.0)) + col("dm") / lit(n))).as("rank"),
          col("_out")))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Personalized PageRank / TrustRank (Gyöngyi, Garcia-Molina, Pedersen,
    * VLDB'04 "Combating Web Spam with TrustRank"): the random surfer
    * teleports to the `teleport` distribution instead of uniformly, so
    * rank measures importance RELATIVE TO the trusted seeds — the
    * propagate-trust-from-curated-sources primitive of web-corpus
    * curation (seed quality flows along links; far-from-any-seed pages
    * score ≈ 0).
    *
    * {{{
    *   r_0(v)     = t(v)
    *   r_{t+1}(v) = (1-d)·t(v) + d · ( Σ_{u→v} r_t(u)·w(u,v)/W(u) + D_t·t(v) )
    * }}}
    * `teleport` = (node, t) with t ≥ 0 summing to 1 (caller contract;
    * GraphSpec asserts mass conservation follows from it). Dangling mass
    * also re-enters through t — the standard personalized formulation, so
    * Σ r stays 1. Nodes absent from `teleport` get t = 0; nodes present
    * only in `teleport` still receive their teleport share.
    *
    * Kept as a SEPARATE spelling from [[pageRank]] rather than one core
    * with a uniform default: the classic path's `(1-d)/N` scalar is a
    * division, the general path's `(1-d)·t(v)` a multiplication — not
    * bit-identical for t = 1/N, and both methods' oracles hash-compare
    * their exact float spellings. Same per-round shuffle discipline as
    * [[pageRank]]: the teleport table is (node, t) — broadcast-sized in
    * any real seeding — and everything else is identical.
    */
  def personalizedPageRank(edges: DataFrame, teleport: DataFrame,
      iters: Int = 5, damping: Double = 0.85,
      mat: Materialize = Materialize.Local): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
    val t0 = teleport.select(col("node").cast("long").as("node"),
      col("t").cast("double").as("t"))
    val nodes = mat(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .unionByName(t0.select(col("node"))).distinct())
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    val prob = mat(e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("tw")).as("p")))
    // teleport value AND dangling flag ride ON the rank table (derived
    // once, carried through every checkpoint): each round reads t from
    // its own materialized input and the dangling mass is a filter+sum
    // scan — two fewer per-round joins than the join-per-round spelling
    // (guide §2.4), identical float arithmetic
    var ranks = mat(nodes.join(t0, Seq("node"), "left")
      .join(outW.select(col("src").as("node"), lit(true).as("_out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("t"), lit(0.0)).as("t"),
        coalesce(col("_out"), lit(false)).as("_out"))
      .select(col("node"), col("t").as("rank"), col("t"), col("_out")))
    for (_ <- 1 to iters) {
      // same in-plan dangling-mass broadcast as [[pageRank]]
      val dm = broadcast(ranks.filter(!col("_out"))
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm")))
      val contrib = prob
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst")).agg(sum(col("p") * col("rank")).as("c"))
        .select(col("dst").as("node"), col("c"))
      ranks = mat(ranks.select(col("node"), col("t"), col("_out"))
        .join(contrib, Seq("node"), "left").crossJoin(dm)
        .select(col("node"), (lit(1 - damping) * col("t") + lit(damping) *
          (coalesce(col("c"), lit(0.0)) + col("dm") * col("t"))).as("rank"),
          col("t"), col("_out")))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** k-core peeling after exactly `rounds` rounds: each round computes
    * degrees over the SURVIVING undirected edge set and drops every node
    * (with its incident edges) whose degree is below `k` — the standard
    * iterative decomposition (Seidman, "Network structure and minimum
    * degree", Social Networks 1983; distributed peeling as in
    * Montresor et al., IEEE TPDS 2013). Peeling cascades: removing a
    * weak node can push its neighbors below `k` next round, which is why
    * the operator iterates rather than filtering once. A fixpoint is
    * stable under further rounds (peel of a stable set is a no-op), so
    * pinning `rounds` gives a deterministic, oracle-unrollable contract;
    * production runs size `rounds` ≈ the peel depth (rarely more than a
    * few dozen) or wrap the loop with the XOR-signature convergence
    * check used by [[graft.ops.Dedup.connectedComponents]].
    *
    * Returns `(node, degree)` over the post-peel edge set.
    *
    * Scale shape: per round, one node-keyed degree aggregation (map-side
    * combined) and two hash-equi joins of the edge list against the
    * surviving-node set — everything keys on node ids, the edge set
    * shrinks monotonically, and `mat` re-materializes it per round to
    * cut the iterative lineage (the same discipline as the CC loops).
    * Nothing is driver-side. */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int, mat: Materialize = Materialize.Local): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("u")).unionByName(e.select(col("b").as("u")))
        .groupBy("u").agg(count(lit(1)).as("d"))
    var edges = mat(pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    var r = 0
    while (r < rounds) {
      val keep = degrees(edges).filter(col("d") >= k).select(col("u"))
      edges = mat(edges
        .join(keep.withColumnRenamed("u", "a"), "a")
        .join(keep.withColumnRenamed("u", "b"), "b"))
      r += 1
    }
    degrees(edges).select(col("u").as("node"), col("d").as("degree"))
  }

  /** Exact per-node triangle counts + local clustering coefficient by
    * DEGREE-ORDERED edge orientation (Schank & Wagner's forward
    * algorithm; distributed analysis in Suri & Vassilvitskii, "Counting
    * Triangles and the Curse of the Last Reducer", WWW'11): orient every
    * undirected edge from its lower (degree, id) endpoint to the higher,
    * enumerate wedges from each node's ORIENTED out-neighbors, and close
    * them against the oriented edge set. Orientation caps every node's
    * out-degree at O(√m) — a hub of degree 10⁶ contributes wedges only
    * through its few higher-degree neighbors, not deg² pairs — which is
    * exactly what makes the wedge join survive skewed degree
    * distributions at scale. Each triangle is found ONCE (at its
    * lowest-ordered corner) and credited to all three corners.
    *
    * Returns `(node, tri, degree, coeff)` for nodes in ≥ 1 triangle,
    * with `coeff = 2·tri / (degree·(degree−1))` rounded to 6dp (the
    * local clustering coefficient). Self-loops are dropped; parallel /
    * reverse duplicate edges collapse (undirected simple graph
    * semantics). Ties in degree break by node id — total, so the
    * orientation is acyclic and deterministic in both engines.
    *
    * Scale shape: two node-keyed aggregations (degrees, final counts),
    * the orientation join of the edge list against the degree table,
    * one wedge self-join on the ORIENTED source (bounded by the √m
    * out-degree cap), and one closing equi-join on (v, w). All shuffles
    * key on node/edge ids; nothing is driver-side. */
  def triangleCounts(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val und = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("u"))
      .unionByName(und.select(col("b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("d"))
    val withD = und
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
    // orient lower (degree, id) → higher; (a < b already, so the id
    // tiebreak keeps a → b)
    val fwd = col("da") < col("db") || (col("da") === col("db"))
    val oe = withD.select(
      when(fwd, col("a")).otherwise(col("b")).as("s"),
      when(fwd, col("b")).otherwise(col("a")).as("t"),
      when(fwd, col("db")).otherwise(col("da")).as("td"))
    val wedges = oe.select(col("s"), col("t").as("v"), col("td").as("vd"))
      .join(oe.select(col("s"), col("t").as("w"), col("td").as("wd")), Seq("s"))
      .filter(col("vd") < col("wd") ||
        (col("vd") === col("wd") && col("v") < col("w")))
    val tri = wedges
      .join(oe.select(col("s").as("v"), col("t").as("w")), Seq("v", "w"))
      .select(col("s").as("n1"), col("v").as("n2"), col("w").as("n3"))
    tri.select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
      .join(deg.select(col("u").as("node"), col("d").as("degree")), "node")
      .withColumn("coeff",
        round(lit(2.0) * col("tri") / (col("degree") * (col("degree") - 1)), 6))
  }

  /** Synchronous label propagation after exactly `rounds` rounds
    * (Raghavan, Albert, Kumara 2007, "Near linear time algorithm to
    * detect community structures in large-scale networks") — the
    * community-detection complement to [[triangleCounts]]/[[kCore]]:
    * every node starts labeled with its own id; each round it adopts the
    * label with the largest total edge weight among its neighbors, ties
    * broken by the SMALLEST label. The weight sums are sums of integral
    * edge counts, so the argmax is exact in both engines, and the
    * min-label tiebreak makes the synchronous update fully deterministic
    * — unlike the paper's randomized asynchronous schedule, which is why
    * `rounds` is pinned rather than run to (oscillation-prone)
    * convergence. Returns `(node, community)`.
    *
    * Input `pairs` is a DIRECTED weighted edge list `(aCol, bCol, wCol)`;
    * it is symmetrized here (weights across both directions of a pair
    * sum), and self-loops vote for the node's own current label —
    * harmless and kept, so the operator needs no loop filter.
    *
    * Scale shape (the [[pageRank]] discipline): the symmetrized edge
    * table is built ONCE and materialized; per round there is one
    * edge⋈label hash join keyed on node id, one partial-aggregated
    * `groupBy(node, label)` (map-side combined), and one per-node argmax.
    * The argmax is a max(struct(score, -label)) aggregation, NOT a
    * row_number window — two chained aggregations over the same grouping
    * key hash-partition once and avoid a full per-node sort. Only
    * (node, label, score) triples shuffle; `mat` cuts the iterative
    * lineage per round. */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
      wCol: String, rounds: Int,
      mat: Materialize = Materialize.Local): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val dir = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v"),
      positiveWeight(col(wCol), "Graph.labelPropagation").as("w"))
    val und = mat(dir
      .unionByName(dir.select(col("v").as("u"), col("u").as("v"), col("w")))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w")))
    var labels = mat(und.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    for (_ <- 1 to rounds) {
      labels = mat(und
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u"), col("lbl")).agg(sum(col("w")).as("s"))
        // argmax(score, then min label) without a window sort: negate the
        // label inside the struct so max() realizes the min-label tiebreak
        .groupBy(col("u"))
        .agg(max(struct(col("s"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("lbl")))
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999, "Authoritative
    * sources in a hyperlinked environment") after exactly `iters` mutual
    * reinforcement rounds over a directed weighted edge list:
    * {{{
    *   a_t(v) = Σ_{u→v} w(u,v) · h_{t-1}(u)   then L1-normalize
    *   h_t(u) = Σ_{u→v} w(u,v) · a_t(v)       then L1-normalize
    * }}}
    * L1 normalization (divide by the sum) instead of the textbook L2:
    * same fixpoint direction, but the per-round arithmetic stays plain
    * sum-and-divide — no sqrt — which keeps the unrolled SQL oracle's
    * float spelling aligned with this plan's. Start h_0 = 1/N. Returns
    * `(node, hub, auth)` for every node; nodes with no out-edges have
    * hub 0, no in-edges auth 0 — kept, not dropped (rank-0 is a
    * result, not an absence).
    *
    * Scale shape: identical discipline to [[pageRank]] — edge table
    * materialized once, per round two edge⋈score hash joins each
    * followed by a partial-aggregated groupBy on a node key, and the L1
    * sums as in-plan broadcast 1-row aggregates. Only (node, score)
    * pairs shuffle.
    *
    * Weights must be strictly positive: a zero/negative/null weight
    * would make the L1 normalizer 0 or a signed sum (sum ≠ Σ|·|),
    * silently yielding NaN/absurd scores — so the edge projection fails
    * loudly instead (see [[positiveWeight]]). */
  def hits(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      wCol: String = "w", iters: Int = 3,
      mat: Materialize = Materialize.Local): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val e = mat(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      positiveWeight(col(wCol), "Graph.hits").as("w")))
    val nodes = mat(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count().toDouble
    // Intermediate vectors stay SPARSE (only nonzero scores): a zero-score
    // node contributes nothing to the edge joins OR the L1 sums, so
    // densifying per round (a nodes-join + coalesce each half-step) buys
    // nothing — the zeros are materialized once, at the final output.
    var hub = mat(nodes.select(col("node"), lit(1.0 / n).as("h")))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("w") * col("h")).as("a"))
        .select(col("dst").as("node"), col("a"))
      auth = mat(aRaw
        .crossJoin(broadcast(aRaw.agg(sum(col("a")).as("s"))))
        .select(col("node"), (col("a") / col("s")).as("a")))
      val hRaw = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src")).agg(sum(col("w") * col("a")).as("h"))
        .select(col("src").as("node"), col("h"))
      hub = mat(hRaw
        .crossJoin(broadcast(hRaw.agg(sum(col("h")).as("s"))))
        .select(col("node"), (col("h") / col("s")).as("h")))
    }
    nodes.join(hub, Seq("node"), "left").join(auth, Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0.0)).as("hub"),
        coalesce(col("a"), lit(0.0)).as("auth"))
  }
}
