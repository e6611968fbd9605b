package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence: partitioned layouts prune at the scan (what SCALE.md
  * promises for the 100 TB directory-tree layout) and filters push into
  * the parquet reader. */
class PruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partition pruning: event_type-partitioned layout reads one partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").resolve("events").toString
    Tables.events(spark, TestSpark.Sf0001)
      .write.partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      s"no partition filter in:\n$scan")
    // and the pruned read returns exactly the one type
    assert(q.select(countDistinct(col("event_type"))).collect()(0).getLong(0) === 1L)
  }

  test("IVF-style ANN: bucket-partitioned layout prunes the probe scan") {
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").resolve("emb").toString
    val planes = Similarity.planes(4, 8)
    val vecs = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"),
        Similarity.toDouble(slice(col("embedding"), 1, 8)).as("v"))
    Similarity.writeBucketed(vecs, planes, dir)
    val query = vecs.filter(col("vec_id") === 0)
      .collect()(0).getSeq[Double](1).toIndexedSeq
    val probe = Similarity.probeBucketed(spark, dir, query, planes, 5)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*bkt[^\\]]*\\].*"),
      s"no bkt partition filter in:\n$scan")
    val rows = probe.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    // the query vector itself lives in its own bucket with cosine 1
    assert(rows.exists(r => r.getLong(0) === 0L && math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("IVF probe set: single-plan probe join prunes via dynamic partition pruning") {
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_many").resolve("emb").toString
    val planes = Similarity.planes(4, 8)
    val vecs = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"),
        Similarity.toDouble(slice(col("embedding"), 1, 8)).as("v"))
    Similarity.writeBucketed(vecs, planes, dir)
    val probes = vecs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val res = Similarity.probeBucketedMany(spark, dir, probes, planes, 5)
    val rows = res.collect()
    // the runtime partition filter must be a DPP subquery on bkt — the
    // probed buckets, not a static all-partition scan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the layout scan in:\n$plan")
    assert(!plan.contains("collect("), "probe path must not collect")
    // every probe finds itself at rank 1 with cosine 1 (it lives in its
    // own bucket), and each probe returns at most k rows
    val qids = probes.select("qid").collect().map(_.getLong(0)).toSet
    assert(qids.nonEmpty)
    assert(rows.map(_.getLong(0)).toSet === qids)
    for (qid <- qids) {
      val mine = rows.filter(_.getLong(0) == qid)
      assert(mine.length <= 5)
      val r1 = mine.find(_.getInt(1) == 1).get
      assert(r1.getLong(2) === qid)
      assert(math.abs(r1.getDouble(3) - 1.0) < 1e-6)
    }
    // multi-probe on the same layout: same plan shape, recall ≥ single
    val multi = Similarity.probeBucketedMany(spark, dir, probes, planes, 5,
      multiProbe = true)
    val mRows = multi.collect()
    val mPlan = multi.queryExecution.executedPlan.toString
    assert(mPlan.toLowerCase.contains("dynamicpruning"),
      s"no DPP on the multi-probe layout scan in:\n$mPlan")
    assert(mRows.length >= rows.length) // ≥ candidates ⇒ ≥ filled ranks
    // the huge-probe-set degrade path (shuffle join, no broadcast) must
    // return the identical answer
    val shuffled = Similarity.probeBucketedMany(spark, dir, probes, planes, 5,
        broadcastProbes = false)
      .orderBy("qid", "rnk").collect()
    assert(shuffled.toSeq === res.orderBy("qid", "rnk").collect().toSeq)
  }

  test("predicate pushdown: filter reaches the parquet scan (PushedFilters)") {
    val q = Tables.lineitem(spark, TestSpark.Sf0001)
      .filter(col("l_quantity") > 30.0).select(col("l_orderkey"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity[^\\]]*\\].*"),
      s"no pushed filter in:\n$scan")
    // column pruning: scan schema holds only the two needed columns
    assert(scan.matches("(?s).*ReadSchema: [^\\n]*l_orderkey[^\\n]*l_quantity.*"))
    assert(!scan.matches("(?s).*ReadSchema: [^\\n]*l_comment.*"))
  }
}
