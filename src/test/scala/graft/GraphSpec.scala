package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

/** [[graft.ops.Graph.pageRank]] semantics: agreement with a local
  * reference implementation on planted and randomized graphs, mass
  * conservation, and dangling-node redistribution. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference: the identical recurrence on Scala Maps. */
  private def localPageRank(edges: Seq[(Long, Long, Double)], iters: Int,
      d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => r(u) * (w / outW(u)) }.sum).toMap
      r = nodes.map(v => v ->
        ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Double)], iters: Int = 5,
      d: Double = 0.85): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), iters, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("cycle: symmetric graph keeps the uniform distribution exactly") {
    // a→b→c→a: every node has rank 1/3 at every iteration
    val got = run(Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0)))
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("star with dangling center: matches the reference recurrence") {
    // leaves 2..5 all point at 1; node 1 has NO out-edges (dangling):
    // its mass redistributes uniformly each round
    val edges = (2L to 5L).map(l => (l, 1L, 1.0))
    val got = run(edges)
    val want = localPageRank(edges, 5, 0.85)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    // the hub must dominate every leaf
    assert(got(1L) > got(2L) * 2)
  }

  test("weighted edges shift rank toward the heavy target") {
    // a splits 9:1 between b and c → b ends above c
    val got = run(Seq((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0)))
    assert(got(2L) > got(3L))
  }

  test("randomized graphs: distributed equals local reference, mass sums to 1") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 8 + trial * 4
      val edges = (1 to n * 3).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, 1.0 + rnd.nextInt(5))
      }.distinct
      val got = run(edges, iters = 4)
      val want = localPageRank(edges, 4, 0.85)
      assert(got.keySet === want.keySet)
      for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-10, s"trial $trial node $k")
      assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass not conserved")
    }
  }

  test("zero iterations returns the uniform start vector") {
    val got = run(Seq((1L, 2L, 1.0), (3L, 4L, 1.0)), iters = 0)
    got.values.foreach(v => assert(v === 0.25))
  }

  // ---- personalized PageRank ----

  private def localPpr(edges: Seq[(Long, Long, Double)],
      tele: Map[Long, Double], iters: Int, d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2) ++ tele.keys).distinct.sorted
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val t = nodes.map(v => v -> tele.getOrElse(v, 0.0)).toMap
    var r = t
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => r(u) * (w / outW(u)) }.sum).toMap
      r = nodes.map(v => v ->
        ((1 - d) * t(v) + d * (contrib.getOrElse(v, 0.0) + dangling * t(v)))).toMap
    }
    r
  }

  private def runPpr(edges: Seq[(Long, Long, Double)], tele: Map[Long, Double],
      iters: Int = 5, d: Double = 0.85): Map[Long, Double] =
    Graph.personalizedPageRank(edges.toDF("src", "dst", "w"),
      tele.toSeq.toDF("node", "t"), iters, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("ppr: matches the reference recurrence, conserves seed mass") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 2.0), (4L, 1L, 1.0),
      (2L, 4L, 1.0), (5L, 1L, 1.0))
    val tele = Map(1L -> 0.7, 5L -> 0.3)
    val got = runPpr(edges, tele)
    val want = localPpr(edges, tele, 5, 0.85)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("ppr: rank concentrates near the seed, vanishes far from it") {
    // ring 1→2→…→6→1 with teleport all on node 1: at the STATIONARY
    // point r(k) ∝ 0.85^(k−1), so rank decays strictly with ring
    // distance. 36 rounds first (the initial unit pulse circulates as a
    // transient of magnitude 0.85^t — at t=5 it still sits on node 6 at
    // 0.44, which is why few-iteration decay assertions are wrong).
    val ring = (1L to 5L).map(i => (i, i + 1, 1.0)) :+ ((6L, 1L, 1.0))
    val got = runPpr(ring, Map(1L -> 1.0), iters = 36)
    for (i <- 1L to 5L) assert(got(i) > got(i + 1),
      s"rank not decaying at $i: $got")
    // closed form: r(k) = 0.15·0.85^(k−1)/(1−0.85⁶) — check the ends
    assert(math.abs(got(1L) - 0.15 / (1 - math.pow(0.85, 6))) < 0.01)
    assert(math.abs(got(6L) - 0.15 * math.pow(0.85, 5) / (1 - math.pow(0.85, 6))) < 0.01)
  }

  test("ppr: teleport-only node still receives its teleport share") {
    // node 9 has no edges at all; with t(9)=0.5 it must hold ≥ (1−d)·t
    val got = runPpr(Seq((1L, 2L, 1.0), (2L, 1L, 1.0)), Map(1L -> 0.5, 9L -> 0.5))
    assert(got.contains(9L))
    assert(got(9L) >= (1 - 0.85) * 0.5 - 1e-12)
  }

  test("ppr: zero-heavy teleport ≡ classic when teleport is exactly uniform") {
    // sanity link between the two spellings: same fixed point family —
    // with uniform t the PPR recurrence equals classic pageRank up to
    // float-op order; 5 rounds stay within 1e-12
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0), (1L, 3L, 1.0))
    val uni = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    val ppr = runPpr(edges, uni)
    val classic = run(edges)
    for ((k, v) <- classic) assert(math.abs(ppr(k) - v) < 1e-12, s"node $k")
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("triangles: K4 gives every node 3 triangles, coefficient 1") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = tri(k4)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    got.values.foreach { case (t, d, c) => assert((t, d, c) == ((3L, 3L, 1.0))) }
  }

  test("triangles: square with one diagonal; stars and paths have none") {
    // 1-2-3-4-1 plus diagonal 1-3: triangles (1,2,3) and (1,3,4)
    val got = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    assert(got(1L) == ((2L, 3L, round6(2.0 * 2 / (3 * 2)))))
    assert(got(3L) == ((2L, 3L, round6(2.0 * 2 / (3 * 2)))))
    assert(got(2L) == ((1L, 2L, 1.0)))
    assert(got(4L) == ((1L, 2L, 1.0)))
    // a star has wedges but no closures; a path has neither
    assert(tri(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))).isEmpty)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("triangles: duplicate, reversed, and self-loop edges collapse") {
    val got = tri(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L)))
    assert(got == Map(
      1L -> ((1L, 2L, 1.0)), 2L -> ((1L, 2L, 1.0)), 3L -> ((1L, 2L, 1.0))))
  }

  test("triangles: each triangle counted once on a hub-skewed graph") {
    // hub 0 connects to all of 1..20; ring edges i—(i+1) close exactly
    // one triangle per consecutive pair at the hub
    val spokes = (1L to 20L).map(0L -> _)
    val ring = (1L until 20L).map(i => (i, i + 1))
    val got = tri(spokes ++ ring)
    assert(got(0L)._1 == 19L, "hub joins every consecutive-spoke triangle")
    assert(got(1L)._1 == 1L && got(20L)._1 == 1L)
    (2L until 20L).foreach(i => assert(got(i)._1 == 2L, s"node $i"))
    // total triangle mass = 3 × number of triangles
    assert(got.values.map(_._1).sum == 3L * 19L)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] =
    Graph.kCore(edges.toDF("a", "b"), "a", "b", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: clique survives its own core, pendant tail peels by cascade") {
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    // tail 5-6-7-8: degree-1 node 8 peels first, then 7, then 6 — each
    // removal only happens because the PREVIOUS round removed its support
    val tail = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val got = core(k5 ++ tail, k = 2, rounds = 3)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got.values.forall(_ == 4L), "K5 core degrees")
    // one round is NOT enough: only node 8 is gone, 7 still holds on
    val partial = core(k5 ++ tail, k = 2, rounds = 1)
    assert(partial.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("kCore: fixpoint is stable under extra rounds; k above max degree empties") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(core(k4, k = 3, rounds = 1) == core(k4, k = 3, rounds = 6))
    assert(core(k4, k = 4, rounds = 2).isEmpty)
  }

  private def lpa(edges: Seq[(Long, Long, Double)], rounds: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      rounds).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: two cliques joined by one weak bridge separate") {
    val c1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j, 1.0)
    val c2 = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j, 1.0)
    val got = lpa(c1 ++ c2 :+ ((4L, 10L, 1.0)), rounds = 3)
    // min-label tiebreak floods each clique from its smallest id
    assert((1L to 4L).forall(n => got(n) == 1L))
    assert((10L to 13L).forall(n => got(n) == 10L), s"got $got")
  }

  test("labelPropagation: weights dominate counts in the neighbor vote") {
    // node 3 has two unit-weight neighbors labeled {1,2} and ONE heavy
    // neighbor labeled 9 — the weighted vote must beat the plurality
    val got = lpa(Seq((1L, 3L, 1.0), (2L, 3L, 1.0), (9L, 3L, 5.0)), rounds = 1)
    assert(got(3L) == 9L)
  }

  test("labelPropagation: tie on score adopts the smallest label; " +
      "symmetrization sums both directions") {
    // equal-weight tie between labels 1 and 2 → 1 wins
    assert(lpa(Seq((1L, 3L, 1.0), (2L, 3L, 1.0)), rounds = 1)(3L) == 1L)
    // directed duplicates (u→v and v→u) sum: 1.5+1.5 beats the single 2.0
    val got = lpa(Seq((1L, 3L, 1.5), (3L, 1L, 1.5), (2L, 3L, 2.0)), rounds = 1)
    assert(got(3L) == 1L)
  }

  test("labelPropagation: matches a driver-side reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
      (rnd.nextInt(3) + 1).toDouble))
    def local(rounds: Int): Map[Long, Long] = {
      val und = (edges ++ edges.map(e => (e._2, e._1, e._3)))
        .groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
      val nodes = und.keys.map(_._1).toSeq.distinct
      var lbl = nodes.map(n => n -> n).toMap
      for (_ <- 1 to rounds) {
        lbl = nodes.map { u =>
          // .toSeq first: collecting a Map into (label, w) pairs would
          // key-dedup same-label votes instead of keeping them for the sum
          val votes = und.toSeq.collect { case ((`u`, v), w) => (lbl(v), w) }
            .groupBy(_._1).view.mapValues(_.map(_._2).sum)
          u -> votes.toSeq.minBy { case (l, s) => (-s, l) }._1
        }.toMap
      }
      lbl
    }
    for (r <- Seq(1, 3)) assert(lpa(edges, r) == local(r), s"rounds=$r")
  }

  private def runHits(edges: Seq[(Long, Long, Double)],
      iters: Int = 3): Map[Long, (Double, Double)] =
    Graph.hits(edges.toDF("src", "dst", "w"), iters = iters)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("hits: star — center is the sole authority, spokes the equal hubs") {
    val got = runHits(Seq((1L, 9L, 1.0), (2L, 9L, 1.0), (3L, 9L, 1.0)))
    assert(math.abs(got(9L)._2 - 1.0) < 1e-12, "center holds all authority")
    assert(math.abs(got(9L)._1) < 1e-12, "center sources nothing")
    Seq(1L, 2L, 3L).foreach { n =>
      assert(math.abs(got(n)._1 - 1.0 / 3) < 1e-12, s"hub $n")
      assert(math.abs(got(n)._2) < 1e-12, s"auth $n")
    }
  }

  test("hits: weights skew authority toward the heavier target") {
    // one hub points at two targets with weights 3 vs 1 → auth 3/4 vs 1/4
    val got = runHits(Seq((1L, 2L, 3.0), (1L, 3L, 1.0)))
    assert(math.abs(got(2L)._2 - 0.75) < 1e-12)
    assert(math.abs(got(3L)._2 - 0.25) < 1e-12)
  }

  test("hits: matches a driver-side reference; scores L1-normalize each round") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(50)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong,
      (rnd.nextInt(3) + 1).toDouble)).distinct
    def local(iters: Int): Map[Long, (Double, Double)] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var h = nodes.map(_ -> 1.0 / nodes.size).toMap
      var a = Map.empty[Long, Double]
      for (_ <- 1 to iters) {
        val ar = nodes.map(v => v ->
          edges.collect { case (u, `v`, w) => w * h(u) }.sum).toMap
        val as = ar.values.sum
        a = ar.view.mapValues(_ / as).toMap
        val hr = nodes.map(u => u ->
          edges.collect { case (`u`, v, w) => w * a(v) }.sum).toMap
        val hs = hr.values.sum
        h = hr.view.mapValues(_ / hs).toMap
      }
      nodes.map(n => n -> (h(n), a(n))).toMap
    }
    val got = runHits(edges)
    val want = local(3)
    assert(got.keySet == want.keySet)
    got.foreach { case (n, (hh, aa)) =>
      assert(math.abs(hh - want(n)._1) < 1e-9, s"hub $n")
      assert(math.abs(aa - want(n)._2) < 1e-9, s"auth $n")
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9, "hub mass")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9, "auth mass")
  }

  test("hits: custom column names match the src/dst/w defaults") {
    val edges = Seq((1L, 9L, 1.0), (2L, 9L, 2.0), (9L, 2L, 1.0))
    val renamed = Graph.hits(edges.toDF("from", "to", "weight"),
        "from", "to", "weight")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(renamed == runHits(edges))
  }

  test("hits / labelPropagation fail loudly on non-positive or null weights") {
    // a 0/negative weight corrupts the L1 normalizer / weighted vote
    // silently — the contract is a loud failure, not a silent NaN
    def chainMsg(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chainMsg(t.getCause)
    for (w <- Seq(0.0, -1.0)) {
      val bad = Seq((1L, 2L, 1.0), (2L, 3L, w)).toDF("src", "dst", "w")
      val e1 = intercept[Exception] { Graph.hits(bad).collect() }
      assert(chainMsg(e1).contains("strictly positive"), s"hits w=$w: $e1")
      val e2 = intercept[Exception] {
        Graph.labelPropagation(bad, "src", "dst", "w", 1).collect()
      }
      assert(chainMsg(e2).contains("strictly positive"), s"lpa w=$w: $e2")
    }
    val nullW = Seq((1L, 2L, Some(1.0)), (2L, 3L, None))
      .toDF("src", "dst", "w")
    val e3 = intercept[Exception] { Graph.hits(nullW).collect() }
    assert(chainMsg(e3).contains("strictly positive"), s"null w: $e3")
  }
}
