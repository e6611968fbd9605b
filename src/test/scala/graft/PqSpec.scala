package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Product quantization: encoding shape, ADC lookup-sum identity against
  * a direct recomputation, cluster-separation sanity, and determinism. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 2
  private val Dim = 8

  // two well-separated clusters in integer space: ids 0-19 near the
  // origin, ids 100-119 near (1000, ..., 1000); deterministic jitter
  private def vecs = (
    (0L until 20L).map(i => i -> (0 until Dim).map(j => (i * 7 + j * 3) % 13)) ++
    (100L until 120L).map(i => i -> (0 until Dim).map(j => 1000 + (i * 5 + j) % 11))
  ).map { case (id, v) => (id, v.map(_.toLong).toArray) }.toDF("vec_id", "qv")

  private def trained = Similarity.pqTrain(vecs, M, Dim, seedEvery = 10, iters = 2)

  test("pqTrain: fused training equals M independent subspace trainings") {
    val d = Dim / M
    val want = (0 until M).flatMap { sub =>
      val sv = vecs.select(col("vec_id"),
        slice(col("qv"), sub * d + 1, d).as("qv"))
      val seeds = sv.filter(col("vec_id") % 10 === 0)
        .select(expr("vec_id div 10").as("cid"), col("qv").as("cv"))
      val (_, cent) = Similarity.kmeans(sv, seeds, 2)
      cent.collect().map(r =>
        (sub, r.getLong(0), r.getSeq[Long](1).toList))
    }.sortBy(t => (t._1, t._2))
    val got = trained.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList))
      .toList.sortBy(t => (t._1, t._2))
    assert(got === want.toList)
  }

  test("pqEncode: exactly M code rows per vector, cids from the codebook") {
    val cb = trained
    val enc = Similarity.pqEncode(vecs, cb, M, Dim)
    assert(enc.groupBy("vec_id").count().filter(col("count") =!= M).count() === 0)
    val orphan = enc.join(cb.select(col("m"), col("cid")).distinct(),
      Seq("m", "cid"), "left_anti")
    assert(orphan.count() === 0)
  }

  test("pqTopK: adc equals the direct sum of subspace distances to codes") {
    val cb = trained
    val enc = Similarity.pqEncode(vecs, cb, M, Dim)
    val qs = vecs.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("qv"))
    val got = Similarity.pqTopK(enc, cb, qs, M, Dim, 40)
      .select(col("qid"), col("vec_id"), col("adc"))
    // recompute: join codes to centroids, slice the query, sum sq dists
    val d = Dim / M
    val want = enc.join(cb, Seq("m", "cid"))
      .join(qs, qs("qid") =!= lit(-1)) // cross: every (query, code row)
      .select(col("qid"), col("vec_id"),
        Similarity.sqDistInt(
          slice(col("qv"), col("m") * d + 1, lit(d)), col("cv")).as("dd"))
      .groupBy("qid", "vec_id").agg(sum("dd").as("adc"))
    assert(got.join(want, Seq("qid", "vec_id", "adc")).count() === got.count())
  }

  test("pqTopK: queries retrieve their own cluster under ADC") {
    val cb = trained
    val enc = Similarity.pqEncode(vecs, cb, M, Dim)
    val qs = vecs.filter(col("vec_id").isin(0L, 100L))
      .select(col("vec_id").as("qid"), col("qv"))
    val top = Similarity.pqTopK(enc, cb, qs, M, Dim, 5).collect()
    top.foreach { r =>
      val sameCluster = (r.getLong(0) < 50L) == (r.getLong(2) < 50L)
      assert(sameCluster, s"query ${r.getLong(0)} retrieved ${r.getLong(2)}")
    }
  }

  test("stored IVFADC layout: probe plan prunes partitions, matches in-memory ADC") {
    val planes = Similarity.planes(3, Dim)
    val cb = trained
    val vd = vecs.withColumn("v",
      transform(col("qv"), x => x.cast("double")))
    val path = java.nio.file.Files.createTempDirectory("graft_pqivf").toString
    Similarity.writePqIvf(vd, cb, planes, M, Dim, path)
    // probes must come from a FILTERED file scan for DPP to see a
    // selective build side (a LocalTableScan carries no predicate and
    // the pruning rule skips it) — q106 probes the same way
    vd.write.mode("overwrite").parquet(s"$path/srcvecs")
    val probes = spark.read.parquet(s"$path/srcvecs")
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("qv").as("qqv"))
    val got = Similarity.probePqIvf(spark, path, probes, planes, 50)
    // DPP: the code-table scan must carry a runtime partition filter
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), s"no DPP:\n$plan")
    // equivalence: in-memory ADC restricted to bucket-equal (query, vec)
    val enc = Similarity.pqEncode(vecs, cb, M, Dim)
    val bkts = vd.select(col("vec_id"),
      Similarity.lshBucket(col("v"), planes).as("bkt"))
    val full = Similarity.pqTopK(enc, cb,
        probes.select(col("qid"), col("qqv").as("qv")), M, Dim, 1000)
      .join(bkts.select(col("vec_id"), col("bkt")), "vec_id")
      .join(bkts.select(col("vec_id").as("qid"), col("bkt").as("qbkt")), "qid")
      .filter(col("bkt") === col("qbkt"))
      .select(col("qid"), col("vec_id"), col("adc"))
    val gotSet = got.select(col("qid"), col("vec_id"), col("adc"))
    assert(gotSet.exceptAll(full).count() === 0)
    assert(full.exceptAll(gotSet).count() === 0)
    // version guard fails fast
    intercept[IllegalArgumentException] {
      spark.range(1).selectExpr("99 AS version", "3 AS nplanes",
          s"$M AS m", s"$Dim AS dim")
        .selectExpr("CAST(version AS INT) version", "CAST(nplanes AS INT) nplanes",
          "CAST(m AS INT) m", "CAST(dim AS INT) dim")
        .write.mode("overwrite").parquet(s"$path/meta")
      Similarity.loadPqIvf(spark, path)
    }
  }

  test("appendPqIvf: new vectors fold in; probes see the union") {
    val planes = Similarity.planes(3, Dim)
    val cb = trained
    val vd = vecs.withColumn("v", transform(col("qv"), x => x.cast("double")))
    val path = java.nio.file.Files.createTempDirectory("graft_pqapp").toString
    val first = vd.filter(col("vec_id") < 100L)
    val extra = vd.filter(col("vec_id") >= 100L)
      .select(col("vec_id"), col("v"), col("qv"))
    Similarity.writePqIvf(first, cb, planes, M, Dim, path)
    val before = Similarity.loadPqIvf(spark, path).codes.count()
    Similarity.appendPqIvf(spark, path, extra, planes)
    val ix = Similarity.loadPqIvf(spark, path)
    assert(ix.codes.count() === before + 20L * M)
    // a probe from the appended half retrieves appended vectors
    val probes = vd.filter(col("vec_id") === 100L)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("qv").as("qqv"))
    val hits = Similarity.probePqIvf(spark, path, probes, planes, 5).collect()
    assert(hits.nonEmpty)
    // the probe's own cluster (the appended half) dominates the ranking
    val best = hits.filter(_.getInt(1) == 1).head
    assert(best.getLong(2) >= 100L, s"rank-1 hit ${best.getLong(2)}")
  }

  test("ADC recall vs exact integer search, measured on the fixture") {
    // recall@5 of ADC against exact full-vector sqdist ranking — the
    // compression trade printed as evidence (codes are M=2 bytes vs 8
    // dims × 8 bytes here)
    val cb = trained
    val enc = Similarity.pqEncode(vecs, cb, M, Dim)
    val qs = vecs.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("qid"), col("qv"))
    val k = 5
    val adc = Similarity.pqTopK(enc, cb, qs, M, Dim, k)
      .select(col("qid"), col("vec_id"))
    val exact = qs.crossJoin(vecs.select(col("vec_id"), col("qv").as("cv")))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        Similarity.sqDistInt(col("qv"), col("cv")).as("d"))
    val exactTop = graft.plans.TopK.perGroup(exact, Seq("qid"),
      Seq(("d", true), ("vec_id", true)), k).select(col("qid"), col("vec_id"))
    val nQ = qs.count()
    val hit = adc.join(exactTop, Seq("qid", "vec_id")).count()
    val recall = hit.toDouble / (nQ * k)
    println(s"""{"pq_recall_at_$k":$recall,"queries":$nQ}""")
    // the two clusters are far apart and codes preserve cluster
    // membership, so ADC must keep at least the cluster-level structure
    assert(recall >= 0.5, s"ADC recall@$k collapsed: $recall")
  }

  test("pq pipeline is deterministic across runs") {
    val qs = vecs.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("qv"))
    def run() = Similarity.pqTopK(
        Similarity.pqEncode(vecs, trained, M, Dim), trained, qs, M, Dim, 3)
      .orderBy("qid", "rnk").collect().map(_.toSeq).toSeq
    assert(run() === run())
  }
}
