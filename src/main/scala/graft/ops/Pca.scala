package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.GramAgg

/** Distributed PCA in the "sufficient statistics, not data" shape: ONE
  * corpus pass accumulates exact integer Gram moments ([[GramAgg]] — a
  * d(d+1)/2-long buffer per task, merged across the exchange), the driver
  * eigendecomposes the resulting d×d covariance (a model-sized object:
  * 64×64 doubles, nothing like the corpus), and projection back onto the
  * corpus is an in-plan broadcast of the basis as literal arrays. The
  * corpus itself never shuffles and is scanned exactly twice (fit +
  * project) — the standard large-scale PCA split (e.g. Spark MLlib's
  * RowMatrix.computePrincipalComponents does the same Gram-then-driver
  * factorization; re-derived here over exact integer moments so the
  * fitted basis is bit-reproducible run to run).
  *
  * Embedding-pipeline uses: dimensionality reduction before ANN indexing
  * (shorter codes, same neighbors), decorrelation before scalar/product
  * quantization ([[Similarity.sq8Encode]]/[[Similarity.pqTrain]] both
  * improve on decorrelated inputs), and energy-based dim pruning.
  */
object Pca {

  /** The fitted model: row count it was fitted on, per-dimension mean (in
    * UNQUANTIZED units), top-k principal axes (rows, unit-norm,
    * eigenvalue-descending), and their eigenvalues (variance explained). */
  final case class PcaModel(n: Long, mean: Array[Double],
      basis: Array[Array[Double]], eigenvalues: Array[Double])

  /** One-row integer moment buffer of a quantized vector column — the
    * whole distributed cost of [[fit]]. */
  def moments(vecs: DataFrame, qvCol: String, d: Int): DataFrame =
    vecs.agg(GramAgg.gram(col(qvCol), d).as("g"))

  /** Upper-triangle covariance NUMERATORS from the moment buffer, in-plan:
    * `(i, j, cov_num)` with `cov_num = n·s_ij − s_i·s_j` (= n²·cov(i,j),
    * still integer-exact — division into float covariance is deferred to
    * the driver so the oracle can hash-compare exact longs). */
  def covPairs(moments: DataFrame, d: Int): DataFrame = {
    val pairs = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        struct(i.as("i"), j.as("j")))))
    moments.select(col("g"), explode(pairs).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        (element_at(col("g"), lit(1)) *
          element_at(col("g"), expr(
            s"CAST(2 + $d + p.i * $d - (p.i * (p.i - 1)) div 2 + (p.j - p.i) AS INT)")) -
          element_at(col("g"), col("p.i") + 2) *
            element_at(col("g"), col("p.j") + 2)).as("cov_num"))
  }

  /** Fit from quantized vectors: one [[moments]] pass, then driver-side
    * covariance + cyclic-Jacobi eigendecomposition of the d×d matrix.
    * `scale` must be the [[Similarity.quantize]] scale used to build
    * `qvCol` (converts integer moments back to input units). Principal
    * axes are eigenvalue-descending; ties and the eigensolver itself are
    * deterministic (fixed sweep order, integer inputs), so the basis is
    * identical on every run — no seed, no partition sensitivity. */
  def fit(vecs: DataFrame, qvCol: String, d: Int, k: Int,
      scale: Int): PcaModel = {
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val g = moments(vecs, qvCol, d).head().getSeq[Long](0).toArray
    val n = g(0)
    require(n > 0, "PCA needs at least one non-null vector")
    val nd = n.toDouble
    val s = scale.toDouble
    val mean = Array.tabulate(d)(i => g(1 + i) / nd / s)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val sij = g(1 + d + GramAgg.triIndex(i, j, d)).toDouble
        val c = (nd * sij - g(1 + i).toDouble * g(1 + j).toDouble) /
          (nd * nd) / (s * s)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (vals, vecsE) = jacobiEigen(cov)
    val order = vals.zipWithIndex.sortBy { case (v, ix) => (-v, ix) }.take(k)
    PcaModel(n, mean,
      order.map { case (_, ix) => Array.tabulate(d)(r => vecsE(r)(ix)) }.toArray,
      order.map(_._1).toArray)
  }

  /** Project a float/double vector column onto the fitted basis: center by
    * the model mean, dot with each principal axis — all in-plan over
    * broadcast literal arrays (the model is driver-sized by construction).
    * Appends `outCol` as `array<double>` of length k. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pc"): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(Similarity.toDouble(col(vecCol)), meanLit,
      (x, m) => x - m)
    val dots = model.basis.map { b =>
      aggregate(zip_with(centered, typedLit(b.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
    }
    df.withColumn(outCol, array(dots.toIndexedSeq: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5 — the classic O(d³)-per-sweep rotation method; fine for
    * model-sized d, which is the contract here). Returns (eigenvalues,
    * eigenvector MATRIX with eigenvectors as COLUMNS), unordered. */
  def jacobiEigen(aIn: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val sn = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - sn * arq
              a(r)(q) = sn * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - sn * aqr
              a(q)(r) = sn * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - sn * vrq
              v(r)(q) = sn * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
