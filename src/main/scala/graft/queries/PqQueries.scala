package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.Similarity

/** Product-quantization queries ([[graft.ops.Similarity.pqTrain]] /
  * `pqEncode` / `pqTopK`): the compressed-corpus ANN path. The oracle
  * re-runs the ENTIRE method in DuckDB — all four subspace k-means
  * trainings, the encoding argmin, and the ADC scoring — which is only
  * possible because every step is exact integer arithmetic (the q85
  * determinism contract, per subspace).
  */
object PqQueries {

  /** Subspaces / dims / seed stride / Lloyd iterations for q105. */
  val M = 4
  val Dim = 64
  val SeedEvery = 125
  val Iters = 2

  private val D = Dim / M

  /** One subspace's two-iteration k-means CTE chain (16-dim twin of the
    * q85 spelling), suffix `_s`. */
  private def subspaceCtes(s: Int): String = {
    val lo = s * D + 1; val hi = s * D + D
    def assign(name: String, cent: String) =
      s"""$name AS (SELECT vec_id, qv, cid FROM (
        |  SELECT v.vec_id AS vec_id, v.qv AS qv, c.cid AS cid,
        |    ${Similarity.sqDistIntSql("v.qv", "c.cv", D)} AS dist
        |  FROM sv$s v CROSS JOIN $cent c) x
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)"""
        .stripMargin
    def update(name: String, from: String) =
      s"""$name AS (
        |  SELECT cid, list(cx ORDER BY pos) AS cv FROM (
        |    SELECT cid, i AS pos, CAST(sum(qv[i]) AS BIGINT) // count(*) AS cx
        |    FROM $from, range(1, ${D + 1}) t(i) GROUP BY cid, i) GROUP BY cid)"""
        .stripMargin
    s"""sv$s AS (SELECT vec_id, (qv)[$lo:$hi] AS qv FROM vecs),
      |c0_$s AS (SELECT vec_id // $SeedEvery AS cid, qv AS cv FROM sv$s
      |          WHERE vec_id % $SeedEvery = 0),
      |${assign(s"a1_$s", s"c0_$s")},
      |${update(s"c1_$s", s"a1_$s")},
      |${assign(s"a2_$s", s"c1_$s")},
      |${update(s"c2_$s", s"a2_$s")}""".stripMargin
  }

  // ---- Q105: PQ train → encode → asymmetric-distance top-k ----

  /** Codes trained per subspace (k = corpus/125 centroids), the whole
    * corpus encoded to M centroid ids, and every 100th vector used as a
    * query probe: top-5 by exact-integer ADC distance. */
  val q105 = Q("q105_pq_adc", {
    val subs = (0 until M).map(subspaceCtes).mkString(",\n")
    val svu = (0 until M)
      .map(s => s"SELECT $s AS m, vec_id, qv FROM sv$s")
      .mkString(" UNION ALL ")
    val cb = (0 until M)
      .map(s => s"SELECT $s AS m, cid, cv FROM c2_$s")
      .mkString(" UNION ALL ")
    s"""WITH vecs AS (SELECT vec_id, ${Similarity.quantizeSql("embedding", 1000)} AS qv
      |  FROM embeddings),
      |$subs,
      |svu AS ($svu),
      |cb AS ($cb),
      |enc AS (SELECT vec_id, m, cid FROM (
      |    SELECT s.vec_id AS vec_id, s.m AS m, cb.cid AS cid,
      |      ${Similarity.sqDistIntSql("s.qv", "cb.cv", D)} AS dist
      |    FROM svu s JOIN cb ON cb.m = s.m) x
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) = 1),
      |dt AS (SELECT s.vec_id AS qid, s.m AS m, cb.cid AS cid,
      |         ${Similarity.sqDistIntSql("s.qv", "cb.cv", D)} AS dd
      |       FROM svu s JOIN cb ON cb.m = s.m WHERE s.vec_id % 100 = 0),
      |adc AS (SELECT d.qid AS qid, e.vec_id AS vec_id,
      |          CAST(sum(d.dd) AS BIGINT) AS adc
      |        FROM enc e JOIN dt d ON d.m = e.m AND d.cid = e.cid
      |        GROUP BY d.qid, e.vec_id),
      |r AS (SELECT qid, vec_id, adc,
      |        row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rnk
      |      FROM adc)
      |SELECT qid, rnk, vec_id, adc FROM r WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin
  }) { (s, dir) =>
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.quantize(col("embedding"), 1000).as("qv"))
    val cb = Similarity.pqTrain(vecs, M, Dim, SeedEvery, Iters,
      mat = graft.ops.Materialize.Persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val enc = Similarity.pqEncode(vecs, cb, M, Dim)
    val qs = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("qv"))
    Similarity.pqTopK(enc, cb, qs, M, Dim, 5)
      .orderBy(col("qid"), col("rnk"))
  }

  // ---- Q106: stored IVFADC layout (coarse-bucket-partitioned codes) ----

  /** Coarse quantizer for the q106 layout: the q88/q93 hyperplane family
    * (4 planes → 16 buckets over 64 dims). */
  val CoarsePlanes: Seq[Seq[Int]] = Similarity.planes(4, Dim)

  /** Per-JVM scratch root (pid-keyed; same contract as LlmQueries /
    * SourceQueries — concurrent harness runs never collide, the tree
    * dies with the JVM). */
  private lazy val scratchRoot: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-pq-${ProcessHandle.current().pid()}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(d)
    }))
    d.getAbsolutePath
  }

  /** [[Similarity.writePqIvf]] + [[Similarity.probePqIvf]]: train
    * codebooks, write the code table PARTITIONED BY coarse LSH bucket,
    * then probe the STORED layout with every 100th vector in one
    * DPP-pruned plan — ADC ranking inside the query's bucket only. The
    * oracle reruns training + encoding and restricts the ADC join to
    * bucket-equal pairs. */
  val q106 = Q("q106_pq_ivf_probe", {
    val subs = (0 until M).map(subspaceCtes).mkString(",\n")
    val svu = (0 until M)
      .map(s => s"SELECT $s AS m, vec_id, qv FROM sv$s")
      .mkString(" UNION ALL ")
    val cb = (0 until M)
      .map(s => s"SELECT $s AS m, cid, cv FROM c2_$s")
      .mkString(" UNION ALL ")
    s"""WITH vecs AS (SELECT vec_id, ${Similarity.quantizeSql("embedding", 1000)} AS qv
      |  FROM embeddings),
      |$subs,
      |svu AS ($svu),
      |cb AS ($cb),
      |bv AS (SELECT vec_id, ${Similarity.lshBucketSql("embedding", CoarsePlanes)} AS bkt
      |       FROM embeddings),
      |enc AS (SELECT vec_id, m, cid FROM (
      |    SELECT s.vec_id AS vec_id, s.m AS m, cb.cid AS cid,
      |      ${Similarity.sqDistIntSql("s.qv", "cb.cv", D)} AS dist
      |    FROM svu s JOIN cb ON cb.m = s.m) x
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) = 1),
      |dt AS (SELECT s.vec_id AS qid, s.m AS m, cb.cid AS cid,
      |         ${Similarity.sqDistIntSql("s.qv", "cb.cv", D)} AS dd
      |       FROM svu s JOIN cb ON cb.m = s.m WHERE s.vec_id % 100 = 0),
      |adc AS (SELECT d.qid AS qid, e.vec_id AS vec_id,
      |          CAST(sum(d.dd) AS BIGINT) AS adc
      |        FROM enc e JOIN dt d ON d.m = e.m AND d.cid = e.cid
      |        JOIN bv eb ON eb.vec_id = e.vec_id
      |        JOIN bv qb ON qb.vec_id = d.qid AND qb.bkt = eb.bkt
      |        GROUP BY d.qid, e.vec_id),
      |r AS (SELECT qid, vec_id, adc,
      |        row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rnk
      |      FROM adc)
      |SELECT qid, rnk, vec_id, adc FROM r WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin
  }) { (s, dir) =>
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"),
        Similarity.quantize(col("embedding"), 1000).as("qv"))
    val cbk = Similarity.pqTrain(
      vecs.select(col("vec_id"), col("qv")), M, Dim, SeedEvery, Iters,
      mat = graft.ops.Materialize.Persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val path = s"$scratchRoot/ivfadc_${new java.io.File(dir).getName}"
    Similarity.writePqIvf(vecs, cbk, CoarsePlanes, M, Dim, path)
    val probes = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("qv").as("qqv"))
    Similarity.probePqIvf(s, path, probes, CoarsePlanes, 5)
      .orderBy(col("qid"), col("rnk"))
  }

  // ---- Q127: int8 scalar quantization (SQ8) top-k ----

  /** [[Similarity.sq8Stats]]/[[Similarity.sq8Encode]] + integer-domain
    * scoring: per-dim affine codes in [0,255] (4× storage cut), every
    * 125th vector queries the code corpus by integer squared-L2
    * ([[Similarity.sqDistInt]], native codegen'd), top-5 per query on the
    * [[graft.plans.TopKPerGroup]] heap. The oracle recomputes stats,
    * codes, AND distances — all integer past encode, so the compare is
    * exact with no rounding column. */
  val q127 = Q("q127_sq8_topk",
    s"""WITH s AS (SELECT i - 1 AS pos,
      |    min(CAST(embedding[i] AS DOUBLE)) AS mn,
      |    max(CAST(embedding[i] AS DOUBLE)) AS mx
      |  FROM embeddings, range(1, ${Dim + 1}) t(i) GROUP BY pos),
      |sa AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM s),
      |c AS (SELECT vec_id, ${Similarity.sq8EncodeSql("embedding", Dim)} AS cv
      |  FROM embeddings CROSS JOIN sa),
      |q AS (SELECT vec_id AS qid, cv AS qcv FROM c WHERE vec_id % $SeedEvery = 0),
      |p AS (SELECT qid, vec_id, ${Similarity.sqDistIntSql("qcv", "cv", Dim)} AS dist
      |  FROM q CROSS JOIN c WHERE vec_id <> qid),
      |r AS (SELECT qid, vec_id, dist,
      |  row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM p)
      |SELECT qid, rn AS rnk, vec_id, dist FROM r WHERE rn <= 5
      |ORDER BY qid, rn""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Similarity.prepare(Tables.embeddings(s, dir), "vec_id", "embedding")
      .select(col("vec_id"), col("ev"))
    val codes = Similarity.sq8Encode(e, Similarity.sq8Stats(e), Dim)
    val q = codes.filter(col("vec_id") % SeedEvery === 0)
      .select(col("vec_id").as("qid"), col("cv").as("qcv"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.sqDistInt(col("qcv"), col("cv")).as("dist"))
    val top = graft.plans.TopK.perGroup(scored, Seq("qid"),
      Seq(("dist", true), ("vec_id", true)), 5)
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("qid"), col("rnk"), col("vec_id"), col("dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** [[graft.ops.Pca]]: the distributed half of PCA — ONE
    * [[graft.plans.GramAgg]] pass accumulates exact integer Gram moments,
    * and the upper-triangle covariance numerators
    * `cov_num(i,j) = n·s_ij − s_i·s_j` (= n²·cov, still integer) are
    * emitted in-plan. The driver-side eigensolve that completes PCA is
    * model-sized and spec-gated (PcaSpec); THIS query oracle-proves the
    * corpus-side statistics bit-for-bit — the oracle recomputes every
    * pairwise product sum from scratch. */
  val q135 = Q("q135_gram_covariance",
    s"""WITH vecs AS (SELECT ${Similarity.quantizeSql("embedding", 1000)} AS qv
      |  FROM embeddings),
      |dims AS (SELECT CAST(unnest(range(0, $Dim)) AS INTEGER) AS i),
      |idx AS (SELECT a.i AS i, b.i AS j FROM dims a JOIN dims b ON b.i >= a.i),
      |nn AS (SELECT count(*) AS n FROM vecs),
      |s1 AS (SELECT dims.i AS k, CAST(sum(qv[dims.i + 1]) AS BIGINT) AS s
      |       FROM dims, vecs GROUP BY dims.i),
      |s2 AS (SELECT idx.i AS i, idx.j AS j,
      |         CAST(sum(qv[idx.i + 1] * qv[idx.j + 1]) AS BIGINT) AS sij
      |       FROM idx, vecs GROUP BY idx.i, idx.j)
      |SELECT s2.i AS i, s2.j AS j, nn.n * s2.sij - a.s * b.s AS cov_num
      |FROM s2 JOIN s1 a ON a.k = s2.i JOIN s1 b ON b.k = s2.j CROSS JOIN nn
      |ORDER BY i, j""".stripMargin) { (s, dir) =>
    val vecs = Tables.embeddings(s, dir)
      .select(Similarity.quantize(col("embedding"), 1000).as("qv"))
    graft.ops.Pca.covPairs(graft.ops.Pca.moments(vecs, "qv", Dim), Dim)
      .orderBy(col("i"), col("j"))
  }

  val all: Seq[Q] = Seq(q105, q106, q127, q135)
}
