package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pca, Similarity}
import graft.plans.GramAgg

/** PCA: the Gram-moment aggregate against a sequential oracle across
  * partitionings, the Jacobi eigensolver's invariants, axis recovery on
  * anisotropic data, and the in-plan projection against driver math. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 5

  /** Deterministic pseudo-random vectors (no Math.random — fixed LCG). */
  private def vecs(n: Int): Seq[Seq[Double]] = {
    var s = 12345L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Seq.fill(n)(Seq.fill(d)(next()))
  }

  test("GramAgg moments match sequential sums across partitionings") {
    val data = vecs(40)
    val q = data.map(_.map(x => math.round(x * 1000)))
    val expN = q.size.toLong
    val expS = Array.tabulate(d)(i => q.map(_(i)).sum)
    val expP = for (i <- 0 until d; j <- i until d)
      yield q.map(v => v(i) * v(j)).sum
    for (parts <- Seq(1, 7)) {
      val df = q.map(Tuple1(_)).toDF("qv").repartition(parts)
      val g = df.agg(GramAgg.gram(col("qv"), d).as("g"))
        .head().getSeq[Long](0).toArray
      assert(g(0) == expN)
      assert(g.slice(1, 1 + d).toSeq == expS.toSeq)
      assert(g.drop(1 + d).toSeq == expP.toSeq)
    }
  }

  test("GramAgg skips null vectors and wrong-length vectors") {
    val df = Seq(Some(Seq(1L, 2L)), None, Some(Seq(3L)), Some(Seq(4L, 5L)))
      .toDF("qv")
    val g = df.agg(GramAgg.gram(col("qv"), 2).as("g"))
      .head().getSeq[Long](0).toArray
    // rows (1,2) and (4,5): n=2, s=(5,7), products (1+16, 2+20, 4+25)
    assert(g.toSeq == Seq(2L, 5L, 7L, 17L, 22L, 29L))
  }

  test("jacobiEigen: A·v = λ·v and the basis is orthonormal") {
    val a = Array(
      Array(4.0, 1.0, 0.5), Array(1.0, 3.0, 0.25), Array(0.5, 0.25, 2.0))
    val (vals, v) = Pca.jacobiEigen(a)
    for (k <- 0 until 3) {
      val ev = Array.tabulate(3)(r => v(r)(k))
      val av = Array.tabulate(3)(r => (0 until 3).map(c => a(r)(c) * ev(c)).sum)
      for (r <- 0 until 3) assert(math.abs(av(r) - vals(k) * ev(r)) < 1e-9)
    }
    for (k1 <- 0 until 3; k2 <- 0 until 3) {
      val dot = (0 until 3).map(r => v(r)(k1) * v(r)(k2)).sum
      assert(math.abs(dot - (if (k1 == k2) 1.0 else 0.0)) < 1e-9)
    }
    // trace preserved
    assert(math.abs(vals.sum - (4.0 + 3.0 + 2.0)) < 1e-9)
  }

  test("fit recovers the dominant axis of anisotropic data") {
    // points = t·axis + small isotropic noise, t in [-1, 1]
    val axis = {
      val raw = Array(3.0, 1.0, 0.0, -2.0, 1.0)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val noise = vecs(200)
    val data = noise.zipWithIndex.map { case (nv, i) =>
      val t = (i % 41).toDouble / 20.0 - 1.0
      Seq.tabulate(d)(j => t * axis(j) + 0.05 * nv(j))
    }
    val df = data.map(Tuple1(_)).toDF("v")
      .select(Similarity.quantize(col("v"), 1000).as("qv"))
    val model = Pca.fit(df, "qv", d, 2, 1000)
    val cosine = math.abs(model.basis(0).zip(axis).map { case (a, b) => a * b }.sum)
    assert(cosine > 0.99, s"dominant axis not recovered: |cos|=$cosine")
    assert(model.eigenvalues(0) > 5 * model.eigenvalues(1),
      "variance should concentrate on the planted axis")
  }

  test("in-plan projection equals driver-side centered dot products") {
    val data = vecs(30)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val qdf = df.select(col("id"), col("v"),
      Similarity.quantize(col("v"), 1000).as("qv"))
    val model = Pca.fit(qdf, "qv", d, 3, 1000)
    val got = Pca.project(qdf, "v", model)
      .select(col("id"), col("pc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    data.zipWithIndex.foreach { case (v, i) =>
      val centered = v.zip(model.mean).map { case (x, m) => x - m }
      val want = model.basis.map(b => b.zip(centered).map { case (w, x) => w * x }.sum)
      val g = got(i.toLong)
      want.zip(g).foreach { case (w, x) => assert(math.abs(w - x) < 1e-9) }
    }
  }

  test("covPairs matches the driver covariance numerators") {
    val data = vecs(25)
    val df = data.map(Tuple1(_)).toDF("v")
      .select(Similarity.quantize(col("v"), 1000).as("qv"))
    val q = data.map(_.map(x => math.round(x * 1000)))
    val n = q.size.toLong
    val got = Pca.covPairs(Pca.moments(df, "qv", d), d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 0 until d; j <- i until d) {
      val sij = q.map(v => v(i) * v(j)).sum
      val si = q.map(_(i)).sum
      val sj = q.map(_(j)).sum
      assert(got((i, j)) == n * sij - si * sj)
    }
  }
}
