package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (brief: brute-force cosine top-k baseline +
  * an LSH-bucketed approximate variant as the scale path) over the
  * `embeddings` testdata table (`FIXTURES.md` §8: vec_id, embedding
  * float[64], label).
  *
  * Determinism contract: every float op is spelled as the identical
  * sequential expression tree in Spark and the DuckDB oracle — elements
  * cast float→double (exact), products left-folded in index order — so
  * cosine values are bit-identical and comparisons/top-k never diverge.
  *
  * Scale design: brute-force is a broadcast of the (small) query set over a
  * narrow scan — linear, no shuffle of the corpus. The LSH variant buckets
  * both sides by a 4-bit random-hyperplane code: the join shuffles on the
  * bucket key only, cutting the candidate set ~16× (and generalizing to
  * IVF-style partition pruning at 100 TB, where the bucket id becomes a
  * partition column and Catalyst prunes scans to the probed buckets).
  */
object Similarity {

  /** float[] → double[] (exact widening; keeps later arithmetic identical
    * across engines). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold dot product — index order, like the oracle's
    * list_reduce over range(1, dim+1). Native codegen'd expression
    * ([[graft.plans.DotProduct]]): a primitive loop inside whole-stage
    * codegen instead of the interpreted HOF walk, bit-identical to
    * [[dotHof]] (same index order and accumulation — VectorExprsSpec). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.DotProduct(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** The pure-builtin HOF spelling — the equivalence baseline [[dot]] is
    * tested against (interpreted; ~an order of magnitude slower per row). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)), (x, y) -> x + y)"

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def cosineSql(a: String, b: String, dim: Int): String =
    s"${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)}))"

  /** Euclidean norm — precompute ONCE per vector before a pairwise stage:
    * `dot(a,b)/(na*nb)` is bit-identical to [[cosine]] (same op order) but
    * folds each vector once per corpus instead of twice per pair. */
  def norm(v: Column): Column = sqrt(dot(v, v))
  def normSql(v: String, dim: Int): String = s"sqrt(${dotSql(v, v, dim)})"

  /** Cosine from a precomputed-norm pair. */
  def cosinePre(dotAB: Column, na: Column, nb: Column): Column = dotAB / (na * nb)

  /** Corpus preparation for the pairwise operators: (vec_id, ev double[],
    * nrm) — widening + norm computed once per vector. */
  def prepare(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("ev"))
      .withColumn("nrm", norm(col("ev")))

  /** Brute-force cosine top-k: the (small) query set broadcasts over one
    * corpus scan; per-query ranking via row_number. The exact baseline. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosinePre(dot(col("qv"), col("ev")), col("qn"), col("nrm")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").as("rnk"), col("vec_id"), round(col("sim"), 6).as("cosine"))
      .orderBy(col("qid"), col("rn"))
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * hyperplane bucket (the IVF-style scale path — at 100 TB the bucket id
    * becomes a partition column and pruning does the fan-out cut). */
  def annTopK(corpus: DataFrame, queryFilter: Column, planes: Seq[Seq[Int]],
              k: Int): DataFrame = {
    val e = corpus.withColumn("bkt", lshBucket(col("ev"), planes))
    val q = e.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("ev").as("qv"), col("bkt").as("qbkt"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(q), col("bkt") === col("qbkt") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosinePre(dot(col("qv"), col("ev")), col("qn"), col("nrm")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").as("rnk"), col("vec_id"), round(col("sim"), 6).as("cosine"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Multi-probe variant of [[annTopK]]: each query probes its own bucket
    * PLUS every Hamming-1 neighbor bucket (one hyperplane flipped) — the
    * standard LSH recall booster: vectors just across one boundary stop
    * being missed, at (planes+1)× the candidate cost instead of the
    * 2^planes× of exact search. The probe set stays a broadcast equi-join
    * key list, so the scale shape is unchanged (and under the IVF layout
    * the probes are exactly the partitions read). Recall ≥ single-probe
    * by construction; measured against brute force in AnnRecallSpec. */
  def annTopKMultiProbe(corpus: DataFrame, queryFilter: Column,
                        planes: Seq[Seq[Int]], k: Int): DataFrame = {
    val e = corpus.withColumn("bkt", lshBucket(col("ev"), planes))
    val probeSet = (c: Column) =>
      array(c +: planes.indices.map(j => c.bitwiseXOR(lit(1L << j))): _*)
    val q = e.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("ev").as("qv"), col("nrm").as("qn"),
        explode(probeSet(col("bkt"))).as("qbkt"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(q), col("bkt") === col("qbkt") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosinePre(dot(col("qv"), col("ev")), col("qn"), col("nrm")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").as("rnk"), col("vec_id"), round(col("sim"), 6).as("cosine"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Embedding-space near-duplicate pairs: bucketed self-join (never
    * all-pairs) + exact-cosine threshold. `vectors` = (vec_id, v double[]).
    * `mat` materializes the bucket/vec/norm table both self-join sides
    * read — [[Materialize.Local]] for local runs, `Persist`/`Stage` at
    * cluster scale. */
  def embedNearDupPairs(vectors: DataFrame, planes: Seq[Seq[Int]],
                        threshold: Double,
                        mat: Materialize = Materialize.Local): DataFrame = {
    val b = mat(vectors
      .withColumn("bkt", lshBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v"))))
    b.as("x").join(b.as("y"),
        col("x.bkt") === col("y.bkt") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        round(cosinePre(dot(col("x.v"), col("y.v")), col("x.nrm"), col("y.nrm")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540 — public method): partition the
    * embedding space with the deterministic integer [[kmeans]], generate
    * candidate pairs ONLY within a cluster, confirm with exact cosine ≥
    * `threshold`, and keep one representative (component-min vec_id) per
    * connected component of confirmed pairs.
    *
    * `vectors` = (vec_id, v double[], qv long[]) — `v` scores the exact
    * cosine, `qv` ([[quantize]]d) trains the clusters; `seeds` = initial
    * (cid, cv) centroids. Returns every input row as
    * (vec_id, cid, rep_id, kept 0/1).
    *
    * Scale shape: clustering is the [[kmeans]] broadcast-assign loop (the
    * corpus never shuffles to be assigned); the pairwise stage self-joins
    * on the CLUSTER KEY, so candidate fan-out is bounded by cluster size —
    * k is the skew/volume knob exactly like an LSH band width, and the
    * join is never all-pairs. Pairs crossing a cluster boundary are the
    * method's documented recall trade (same in every SemDeDup
    * deployment); both engines compute identical clusters so the oracle
    * compare is exact. CC shuffles (node, label) pairs only. */
  def semanticDedup(vectors: DataFrame, seeds: DataFrame, iters: Int,
                    threshold: Double,
                    mat: Materialize = Materialize.Local): DataFrame = {
    val (assign, _) = kmeans(vectors.select(col("vec_id"), col("qv")), seeds, iters, mat)
    val b = mat(vectors.select(col("vec_id"), col("v"))
      .join(assign.select(col("vec_id"), col("cid")), Seq("vec_id"))
      .withColumn("nrm", norm(col("v"))))
    val pairs = b.as("x").join(b.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        round(cosinePre(dot(col("x.v"), col("y.v")), col("x.nrm"), col("y.nrm")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
    val cc = Dedup.connectedComponents(pairs, "vec_a", "vec_b", mat)
    b.select(col("vec_id"), col("cid"))
      .join(cc, col("vec_id") === col("node"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("cluster_id"), col("vec_id")).as("rep_id"))
      .withColumn("kept", (col("rep_id") === col("vec_id")).cast("long"))
  }

  // ---- IVF-style bucket-partitioned layout (the 100 TB ANN path) ----

  /** Driver-side bucket code of a literal query vector — same fold order
    * as [[lshBucket]]. */
  def bucketOf(v: Seq[Double], planes: Seq[Seq[Int]]): Long =
    planes.zipWithIndex.map { case (p, j) =>
      val d = v.zip(p).foldLeft(0.0)((acc, t) => acc + t._1 * t._2)
      if (d >= 0) 1L << j else 0L
    }.sum

  /** Write `(vec_id, v)` vectors as a parquet tree PARTITIONED BY the LSH
    * bucket code, with per-vector norms precomputed — the IVF-style layout
    * the [[annTopK]] docs promise for 100 TB: a probe's filter on `bkt`
    * becomes Catalyst PARTITION PRUNING, so the scan touches only the
    * probed bucket's files instead of the whole corpus
    * (`PruningSpec` asserts the pruned scan). */
  def writeBucketed(vectors: DataFrame, planes: Seq[Seq[Int]], path: String): Unit =
    vectors
      .withColumn("bkt", lshBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v")))
      // cluster rows by bucket BEFORE the partitioned write: without it
      // every write task opens a file in every bucket directory it sees
      // (tasks × buckets small files — the classic partitionBy mistake);
      // with it each bucket's rows land in a handful of files
      .repartition(col("bkt"))
      .write.partitionBy("bkt").mode("overwrite").parquet(path)

  /** Fold NEW vectors into a [[writeBucketed]] layout — the ANN-side
    * ingestion cadence (the [[graft.ops.Dedup.appendToIndex]] analogue):
    * each new vector's files land in its bucket's partition directory, so
    * existing data never rewrites and later probes see the union. MUST use
    * the same `planes` the layout was written with (the bucket function
    * IS the layout contract). Caller contract: don't append a vec_id
    * twice. */
  def appendBucketed(vectors: DataFrame, planes: Seq[Seq[Int]], path: String): Unit =
    vectors
      .withColumn("bkt", lshBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v")))
      .write.partitionBy("bkt").mode("append").parquet(path)

  /** Probe a [[writeBucketed]] layout: top-k cosine inside the query's
    * bucket only. The `bkt` equality is a pure partition filter — zero
    * data rows outside the bucket are read. */
  def probeBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                    query: Seq[Double], planes: Seq[Seq[Int]], k: Int): DataFrame = {
    val qn = math.sqrt(query.foldLeft(0.0)((acc, x) => acc + x * x))
    spark.read.parquet(path)
      .filter(col("bkt") === lit(bucketOf(query, planes)))
      .select(col("vec_id"),
        cosinePre(dot(typedLit(query), col("v")), lit(qn), col("nrm")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Probe a [[writeBucketed]] layout with a whole probe SET in ONE plan —
    * the scale spelling of [[probeBucketed]]: `probes` is `(qid, qv
    * double[])`; bucket codes and norms derive in-plan, the probe side
    * BROADCASTS into an equi-join on the layout's partition column, and
    * Catalyst's dynamic partition pruning turns the join key into a
    * runtime partition filter on the parquet scan (PruningSpec asserts the
    * `dynamicpruning` filter) — so only probed buckets are read, the plan
    * has exactly ONE layout subtree regardless of probe count, and nothing
    * is collected to the driver. Top-k per probe runs through
    * [[graft.plans.TopK.perGroup]] (bounded heap, ≤ k rows per probe cross
    * the exchange), then ranks are numbered over those ≤ k survivors.
    *
    * `multiProbe = true` additionally probes every Hamming-1 neighbor
    * bucket of each query (one hyperplane flipped — the standard LSH
    * recall booster, see [[annTopKMultiProbe]]): the probe side explodes
    * to (planes+1) rows per query BEFORE the broadcast, so the join/DPP
    * shape is unchanged and the partitions read are exactly the probed
    * bucket set. Each corpus vector lives in exactly one bucket, so no
    * candidate is seen twice and no dedup stage is needed. Recall ≥
    * single-probe by construction (AnnRecallSpec measures both paths). */
  def probeBucketedMany(spark: org.apache.spark.sql.SparkSession, path: String,
                        probes: DataFrame, planes: Seq[Seq[Int]], k: Int,
                        multiProbe: Boolean = false,
                        broadcastProbes: Boolean = true): DataFrame = {
    val layout = spark.read.parquet(path)
    // partition-column types are directory-inferred (a small bucket code
    // reads back as int) — cast the PROBE side so the layout's partition
    // column stays a bare reference, which DPP insertion requires
    val bktType = layout.schema("bkt").dataType
    val base = probes.select(col("qid"), col("qv"),
      lshBucket(col("qv"), planes).as("qb0"), norm(col("qv")).as("qn"))
    val q = (if (!multiProbe) base.withColumnRenamed("qb0", "qbkt")
      else base.select(col("qid"), col("qv"), col("qn"),
        explode(array(col("qb0") +:
          planes.indices.map(j => col("qb0").bitwiseXOR(lit(1L << j))): _*))
          .as("qbkt")))
      .withColumn("qbkt", col("qbkt").cast(bktType))
    // broadcastProbes = false is the degrade path for probe sets too big
    // to broadcast (a batch re-scoring run, not a user query): a plain
    // shuffle equi-join on the bucket key — partition pruning is lost
    // (most buckets are probed anyway at that scale) but the join stays
    // bucket-local and never goes all-pairs
    val probeSide = if (broadcastProbes) broadcast(q) else q
    val cand = layout.join(probeSide, col("bkt") === col("qbkt"))
      .select(col("qid"), col("vec_id"),
        cosinePre(dot(col("qv"), col("v")), col("qn"), col("nrm")).as("sim"))
    val top = graft.plans.TopK.perGroup(cand, Seq("qid"),
      Seq(("sim", false), ("vec_id", true)), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    top.withColumn("rnk", row_number().over(w)) // over ≤ k rows per probe
      .select(col("qid"), col("rnk"), col("vec_id"),
        round(col("sim"), 6).as("cosine"))
  }

  // ---- deterministic integer k-means (IVF centroid training) ----

  /** Quantize a float vector to integers: round(x·scale). Exact and
    * identical across engines (double product + half-away-from-zero
    * rounding on both sides), so every k-means iteration below runs in
    * pure INTEGER arithmetic — squared distances, sums, and truncating
    * floor-mean centroids are all exact, which is what makes distributed
    * k-means reproducible: float mean accumulation order varies with
    * partitioning, integer sums do not. The quantization error (≤ 1/(2·
    * scale) per dim) is irrelevant to centroid TRAINING quality. */
  def quantize(v: Column, scale: Int): Column =
    transform(v, x => round(x.cast("double") * scale).cast("long"))

  def quantizeSql(v: String, scale: Int): String =
    s"list_transform($v, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))"

  // ---- int8 scalar quantization (SQ8) ----
  // The middle rung of the embedding-compression ladder this library
  // ships: float32 exact (q48) → SQ8 4× (q127) → PQ ~32× (q105/q106).
  // Per-dimension affine codes c_d = round((x_d − mn_d)·255/(mx_d − mn_d))
  // ∈ [0,255] — the classic scalar quantizer (e.g. Faiss SQ8). Distances
  // compare in the INTEGER code domain ([[sqDistInt]], native codegen'd),
  // so scoring is branch-free long arithmetic and fully oracle-portable —
  // no float rounding anywhere past encode.

  /** Per-dimension corpus (mn, mx) — ONE partial-aggregated pass, `dim`
    * rows out. Input (vec_id, ev) from [[prepare]]. */
  def sq8Stats(vecs: DataFrame): DataFrame =
    vecs.select(posexplode(col("ev")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Encode (vec_id, ev double[dim]) → (vec_id, cv long[dim] ∈ [0,255]).
    * `stats` (from [[sq8Stats]]) collapses to ONE broadcast row of
    * per-dim (mn, mx) arrays — the encode pass itself is narrow: no
    * shuffle, 4× the storage cut of the float corpus (the cv longs carry
    * 8-bit payloads; a parquet sink dictionary/bit-packs them). A
    * degenerate dimension (mx = mn) encodes 0. */
  def sq8Encode(vecs: DataFrame, stats: DataFrame, dim: Int): DataFrame = {
    val sarr = stats
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("sa"))
    vecs.crossJoin(broadcast(sarr))
      .select(col("vec_id"), transform(sequence(lit(1), lit(dim)), i => {
        val e = element_at(col("sa"), i)
        val x = element_at(col("ev"), i)
        when(e.getField("mx") === e.getField("mn"), lit(0L))
          .otherwise(round((x - e.getField("mn")) * lit(255.0) /
            (e.getField("mx") - e.getField("mn"))).cast("long"))
      }).as("cv"))
  }

  /** DuckDB spelling of [[sq8Encode]]'s code lambda given per-dim stat
    * lists `mns`/`mxs` (1-based, built with `list(mn ORDER BY pos)`) —
    * the identical (x−mn)·255/(mx−mn) op order, so codes match exactly. */
  def sq8EncodeSql(vecExpr: String, dim: Int): String =
    s"list_transform(range(1, ${dim + 1}), i -> CASE WHEN mxs[i] = mns[i] THEN 0 " +
      s"ELSE CAST(round((CAST(($vecExpr)[i] AS DOUBLE) - mns[i]) * 255.0 / " +
      s"(mxs[i] - mns[i])) AS BIGINT) END)"

  /** Integer squared L2 distance — native codegen'd single pass
    * ([[graft.plans.SqDistLong]]); [[sqDistIntHof]] is the builtin twin it
    * is equivalence-tested against. */
  def sqDistInt(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.SqDistLong(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def sqDistIntHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  def sqDistIntSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> (($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i])), (x, y) -> x + y)"

  /** Lloyd's k-means over integer-quantized vectors — the IVF coarse
    * quantizer trained for real (the hyperplane buckets above are the
    * data-independent alternative): `iters` rounds of (assign to nearest
    * centroid, recompute centroids as truncating per-dim mean), then a
    * final assignment. Returns (assignments `(vec_id, cid, dist)`,
    * centroids `(cid, cv)`).
    *
    * Determinism: distances/sums are exact integers; argmin ties break to
    * the min cid; the truncating mean (`sum div n` — toward-zero in BOTH
    * engines) keeps centroids integer. Every step is order-insensitive,
    * so the result is identical across partitionings, retries, and
    * engines (q85's oracle re-runs the whole training in DuckDB).
    *
    * Scale shape: centroids (k × dim, driver-tiny) BROADCAST to the
    * assignment join — the corpus never shuffles for assignment; the
    * update is one posexplode + (cid, dim)-keyed partial-aggregated sum,
    * i.e. one narrow shuffle of k·dim·tasks partial rows per iteration.
    * Assignments re-materialize per iteration via `mat` (lineage cut).
    * At 100 TB: identical plan, with `mat = Persist/Stage`. */
  def kmeans(vecs: DataFrame, seeds: DataFrame, iters: Int,
             mat: Materialize = Materialize.Local): (DataFrame, DataFrame) = {
    def assignTo(cent: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      vecs.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("qv"), col("cid"),
          sqDistInt(col("qv"), col("cv")).as("dist"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("qv"), col("cid"), col("dist"))
    }
    var cent = seeds
    for (_ <- 1 to iters) {
      val assign = mat(assignTo(cent))
      cent = mat(assign
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(sum("x").as("s"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"), expr("s div n").as("cx"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pc"))
        .select(col("cid"), transform(col("pc"), p => p.getField("cx")).as("cv")))
    }
    (assignTo(cent).select(col("vec_id"), col("cid"), col("dist")), cent)
  }

  /** Deterministic ±1 random hyperplanes, seeded from md5 — driver-side
    * constants inlined into both plans (the Catalyst analogue of a
    * broadcast variable; never recomputed per row). */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until dim).map { i =>
        val h = md.digest(s"plane_${j}_$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  /** Random-hyperplane LSH bucket code: bit j = sign of dot(v, plane_j).
    * With the plane as an int-literal array the product int→double
    * promotion is exact in both engines. */
  def lshBucket(vd: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val d = aggregate(zip_with(vd, typedLit(p), (x, s) => x * s),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(v: String, planes: Seq[Seq[Int]]): String =
    "CAST(" + planes.zipWithIndex.map { case (p, j) =>
      val lit = p.mkString("[", ", ", "]")
      val d = s"list_reduce(list_transform(range(1, ${p.size + 1}), " +
        s"i -> CAST(($v)[i] AS DOUBLE) * ($lit)[i]), (x, y) -> x + y)"
      s"(CASE WHEN $d >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ") + " AS BIGINT)"

  // ---- product quantization (Jégou et al., TPAMI'11: "Product
  // quantization for nearest neighbor search") ----

  /** PQ codebooks: split each `dim`-dim quantized vector into `m` equal
    * subspaces and train an independent integer k-means
    * ([[kmeans]]) in each. Returns `(m, cid, cv)` — subspace id,
    * centroid id, subspace centroid (dim/m longs).
    *
    * Seeds per subspace are every `seedEvery`-th vector's subvector (cid
    * = vec_id div seedEvery) — deterministic, no RNG. All arithmetic is
    * the exact-integer k-means, so training reproduces bit-for-bit
    * across engines/partitionings (the q105 oracle re-runs all `m`
    * trainings in DuckDB).
    *
    * Scale shape: `m` independent trainings, each the [[kmeans]] plan
    * (broadcast centroids, narrow (cid, pos) update shuffle); the
    * returned codebook is m·k rows — driver-tiny, broadcast everywhere
    * downstream. */
  /** Marker magnitude for the fused training below: its squared
    * inter-subspace distance (≥ 10^12) dominates any within-subspace
    * distance for quantized values up to |q| < ~5·10^5 per dim. */
  private val PqMarker = 1000000L

  def pqTrain(vecs: DataFrame, m: Int, dim: Int, seedEvery: Int,
              iters: Int, mat: Materialize = Materialize.Local): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val d = dim / m
    // All m trainings FUSED into one kmeans loop: subvector rows get a
    // remapped id (vec_id·m + sub) and a leading marker dim (sub·PqMarker)
    // whose cross-subspace distance dwarfs any real distance, so no
    // vector can be assigned outside its subspace and the marker dim's
    // truncating mean reproduces itself exactly — assignments and
    // centroid updates are bit-identical to m independent trainings
    // (PqSpec asserts the equivalence), with ONE materialization per
    // iteration instead of m.
    val sv = (0 until m).map { sub =>
      vecs.select((col("vec_id") * m + sub).as("vec_id"),
        concat(array(lit(sub * PqMarker)),
          slice(col("qv"), sub * d + 1, d)).as("qv"))
    }.reduce(_ unionByName _)
    val seeds = sv.filter(expr(s"(vec_id div $m) % $seedEvery") === 0)
      .select(expr(s"((vec_id div $m) div $seedEvery) * $m + (vec_id % $m)")
        .as("cid"), col("qv").as("cv"))
    val (_, cent) = kmeans(sv, seeds, iters, mat)
    cent.select((col("cid") % m).cast("int").as("m"),
      expr(s"cid div $m").as("cid"),
      slice(col("cv"), 2, d).as("cv")) // drop the marker dim
  }

  /** PQ-encode a corpus against a trained codebook: each vector becomes
    * `m` centroid ids — `(vec_id, codes array<(m, cid)> sorted by m)`
    * kept EXPLODED as `(vec_id, m, cid)` rows, the shape both the ADC
    * join and a parquet code table want (dim·8 bytes → m·~1 byte per
    * vector: the compression that lets 100 TB of embeddings sit in a
    * code table a fraction of the size).
    *
    * Argmin ties break to the min cid (same rule as [[kmeans]]),
    * spelled `min(struct(dist, cid))` — a PARTIAL-aggregable argmin, so
    * the k candidate rows per (vec, m) collapse map-side and only one
    * row per (vec, m) crosses the exchange (a window spelling would
    * shuffle-and-sort all m·k candidates per vector). */
  def pqEncode(vecs: DataFrame, codebook: DataFrame,
               m: Int, dim: Int): DataFrame = {
    val d = dim / m
    vecs.select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("m"),
        col("qv"))
      .select(col("vec_id"), col("m"),
        slice(col("qv"), col("m") * d + 1, lit(d)).as("sv"))
      .join(broadcast(codebook), "m")
      .select(col("vec_id"), col("m"), col("cid"),
        sqDistInt(col("sv"), col("cv")).as("dist"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .select(col("vec_id"), col("m"), col("best").getField("cid").as("cid"))
  }

  /** IVFADC layout version ([[writePqIvf]]/[[loadPqIvf]]); bump on any
    * schema/hash change so stale layouts fail fast at load. */
  val PqIvfFormatVersion = 1

  /** A stored [[writePqIvf]] layout: the exploded code table (lazy,
    * partition-pruned on `bkt`), the codebook, and the parameters it was
    * written with — probe with THESE, not caller defaults. */
  final case class PqIvfIndex(codes: DataFrame, codebook: DataFrame,
                              nPlanes: Int, m: Int, dim: Int)

  /** Write the IVFADC layout (Jégou TPAMI'11 §IV: coarse inverted lists +
    * PQ residual codes — here the coarse quantizer is the deterministic
    * hyperplane bucket and codes quantize the vector itself): the
    * [[pqEncode]]d code table partitioned by coarse LSH bucket, plus the
    * codebook and a version/params manifest. At 100 TB this is the shape
    * that serves ANN from a FRACTION of the corpus bytes: a probe prunes
    * to its bucket's partitions (like [[probeBucketedMany]]) and ranks
    * m-byte codes — the full-width vectors are never read at query time.
    *
    * `vectors` = (vec_id, v double[], qv long[]) — `v` places the vector
    * in its coarse bucket, `qv` is what the codes quantize. */
  def writePqIvf(vectors: DataFrame, codebook: DataFrame,
                 planes: Seq[Seq[Int]], m: Int, dim: Int, path: String): Unit = {
    val bkts = vectors.select(col("vec_id"),
      lshBucket(col("v"), planes).as("bkt"))
    pqEncode(vectors.select(col("vec_id"), col("qv")), codebook, m, dim)
      .join(bkts, "vec_id")
      // cluster by bucket before the partitioned write (see
      // [[writeBucketed]]) — tasks × buckets tiny files otherwise
      .repartition(col("bkt"))
      .write.partitionBy("bkt").mode("overwrite").parquet(s"$path/codes")
    codebook.write.mode("overwrite").parquet(s"$path/codebook")
    val spark = vectors.sparkSession
    import spark.implicits._
    Seq((PqIvfFormatVersion, planes.size, m, dim))
      .toDF("version", "nplanes", "m", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[writePqIvf]] layout, failing fast on a version mismatch. */
  def loadPqIvf(spark: org.apache.spark.sql.SparkSession, path: String): PqIvfIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    require(meta.getInt(0) == PqIvfFormatVersion,
      s"PQ-IVF layout at $path has version ${meta.getInt(0)}, " +
        s"need $PqIvfFormatVersion — rebuild the layout")
    PqIvfIndex(spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/codebook"),
      meta.getInt(1), meta.getInt(2), meta.getInt(3))
  }

  /** Fold NEW vectors into a stored [[writePqIvf]] layout — the ANN
    * ingestion cadence ([[appendBucketed]] / [[Dedup.appendToIndex]]
    * analogue): the new vectors encode against the STORED codebook
    * (codebooks are trained once; re-training would orphan every
    * existing code) and their code rows land in their buckets'
    * partition directories — existing data never rewrites, O(batch)
    * work. Parameters come from the manifest, never the caller. Caller
    * contract: don't append a vec_id twice. */
  def appendPqIvf(spark: org.apache.spark.sql.SparkSession, path: String,
                  vectors: DataFrame, planes: Seq[Seq[Int]]): Unit = {
    val ix = loadPqIvf(spark, path) // validates version
    require(planes.size == ix.nPlanes,
      s"append planes ${planes.size} != layout planes ${ix.nPlanes}")
    val bkts = vectors.select(col("vec_id"),
      lshBucket(col("v"), planes).as("bkt"))
    pqEncode(vectors.select(col("vec_id"), col("qv")), ix.codebook, ix.m, ix.dim)
      .join(bkts, "vec_id")
      .write.partitionBy("bkt").mode("append").parquet(s"$path/codes")
  }

  /** Probe a stored [[writePqIvf]] layout with a probe SET in ONE plan:
    * `probes` = (qid, qv double[], qqv long[]). Each query's coarse
    * bucket (optionally + every Hamming-1 neighbor) derives in-plan and
    * BROADCASTS into an equi-join on the layout's partition column —
    * dynamic partition pruning reads only the probed buckets, exactly
    * the [[probeBucketedMany]] contract — then the query's PQ distance
    * table joins on (m, cid) and the ADC sum ranks through the heap
    * top-k. No driver collect; plan size independent of probe count. */
  def probePqIvf(spark: org.apache.spark.sql.SparkSession, path: String,
                 probes: DataFrame, planes: Seq[Seq[Int]], k: Int,
                 multiProbe: Boolean = false): DataFrame = {
    val ix = loadPqIvf(spark, path)
    require(planes.size == ix.nPlanes,
      s"probe planes ${planes.size} != layout planes ${ix.nPlanes}")
    val d = ix.dim / ix.m
    val bktType = ix.codes.schema("bkt").dataType
    val base = probes.select(col("qid"), col("qqv"),
      lshBucket(col("qv"), planes).as("qb0"))
    val withBkt = (if (!multiProbe) base.withColumnRenamed("qb0", "qbkt")
      else base.select(col("qid"), col("qqv"),
        explode(array(col("qb0") +:
          planes.indices.map(j => col("qb0").bitwiseXOR(lit(1L << j))): _*))
          .as("qbkt")))
      .withColumn("qbkt", col("qbkt").cast(bktType))
    val dt = probes
      .select(col("qid"), explode(sequence(lit(0), lit(ix.m - 1))).as("m"),
        col("qqv"))
      .select(col("qid"), col("m"),
        slice(col("qqv"), col("m") * d + 1, lit(d)).as("sv"))
      .join(broadcast(ix.codebook), "m")
      .select(col("qid"), col("m"), col("cid"),
        sqDistInt(col("sv"), col("cv")).as("dd"))
    val adc = ix.codes
      .join(broadcast(withBkt.select(col("qid"), col("qbkt"))),
        col("bkt") === col("qbkt"))
      .join(broadcast(dt), Seq("qid", "m", "cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("dd")).as("adc"))
    val top = graft.plans.TopK.perGroup(adc, Seq("qid"),
      Seq(("adc", true), ("vec_id", true)), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))
    top.withColumn("rnk", row_number().over(w)) // over ≤ k rows per probe
      .select(col("qid"), col("rnk"), col("vec_id"), col("adc"))
  }

  /** Asymmetric-distance top-k over PQ codes: per query, a distance
    * table d(q, m, cid) = sqdist(q's m-th subvector, codebook[m][cid])
    * (q·m·k rows — broadcast), then every encoded vector's approximate
    * distance is the SUM of its m table lookups — one broadcast join on
    * (m, cid) + one integer sum per (qid, vec), never touching the
    * original vectors. Returns `(qid, rnk, vec_id, adc)` with adc the
    * exact-integer ADC distance.
    *
    * Scale: the corpus side is the code table (m rows of a few bytes
    * per vector); no full-width vector is read at query time — that is
    * the PQ trade: ~d/(m·~1B) compression for approximate distances. */
  def pqTopK(encoded: DataFrame, codebook: DataFrame, queries: DataFrame,
             m: Int, dim: Int, k: Int): DataFrame = {
    val d = dim / m
    val dt = queries
      .select(col("qid"), explode(sequence(lit(0), lit(m - 1))).as("m"),
        col("qv"))
      .select(col("qid"), col("m"),
        slice(col("qv"), col("m") * d + 1, lit(d)).as("sv"))
      .join(broadcast(codebook), "m")
      .select(col("qid"), col("m"), col("cid"),
        sqDistInt(col("sv"), col("cv")).as("dd"))
    val adc = encoded.join(broadcast(dt), Seq("m", "cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("dd")).as("adc")) // exact integer sum over m lookups
    val top = graft.plans.TopK.perGroup(adc, Seq("qid"),
      Seq(("adc", true), ("vec_id", true)), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))
    top.withColumn("rnk", row_number().over(w)) // over ≤ k rows per query
      .select(col("qid"), col("rnk"), col("vec_id"), col("adc"))
  }
}
