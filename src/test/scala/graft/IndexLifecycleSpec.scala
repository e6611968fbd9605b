package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Materialize, TextAnalysis}

/** Persisted dedup-index lifecycle (VERDICT r7 next-round #5): build once,
  * writeIndex, loadIndex, probe the STORED tables — plus the
  * Materialize.Stage temp-hygiene contract. */
class IndexLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))

  test("writeIndex/loadIndex roundtrip: stored probe ≡ in-session probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ix").toString
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.limit(40)
    val (csh, cbands) = Dedup.shingleBandIndex(toks(corpus), "doc_id", "toks")
    Dedup.writeIndex(csh, cbands, s"$dir/ix")
    val ix = Dedup.loadIndex(spark, s"$dir/ix")
    assert((ix.n, ix.k, ix.bandCount) === (3, 12, 4))
    val stored = Dedup.probeIndex(ix.shingles, ix.bands, toks(batch),
        "doc_id", "toks", n = ix.n, k = ix.k, bands = ix.bandCount)
      .orderBy("batch_id").collect()
    val live = Dedup.probeIndex(csh, cbands, toks(batch), "doc_id", "toks")
      .orderBy("batch_id").collect()
    assert(stored.nonEmpty, "planted self-duplicates must match")
    assert(stored.toSeq === live.toSeq)
  }

  test("loadIndex fails fast on a format-version mismatch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ixv").toString
    val docs = toks(Tables.documents(spark, TestSpark.Sf0001).limit(20)
      .select(col("doc_id"), col("text")))
    val (csh, cbands) = Dedup.shingleBandIndex(docs, "doc_id", "toks")
    Dedup.writeIndex(csh, cbands, s"$dir/ix")
    // overwrite the manifest with a future version
    import spark.implicits._
    Seq((Dedup.IndexFormatVersion + 1, 3, 12, 4))
      .toDF("version", "n", "k", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/ix/meta")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadIndex(spark, s"$dir/ix")
    }
    assert(e.getMessage.contains("format version"))
  }

  test("buildIndex (one-pass staged build) ≡ shingleBandIndex + writeIndex") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ixbuild").toString
    val docs = toks(Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")))
    val built = Dedup.buildIndex(spark, docs, "doc_id", "toks", s"$dir/a")
    val (csh, cbands) = Dedup.shingleBandIndex(docs, "doc_id", "toks")
    Dedup.writeIndex(csh, cbands, s"$dir/b")
    val stored = Dedup.loadIndex(spark, s"$dir/b")
    assert((built.n, built.k, built.bandCount) === (3, 12, 4))
    assert(built.shingles.exceptAll(stored.shingles).count() === 0)
    assert(stored.shingles.exceptAll(built.shingles).count() === 0)
    assert(built.bands.exceptAll(stored.bands).count() === 0)
    assert(stored.bands.exceptAll(built.bands).count() === 0)
  }

  test("appendToIndex: index(A) + append(B) probes identically to index(A∪B)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ixapp").toString
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"))
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.limit(60)
    // incremental: A written, B appended (params read from the manifest)
    val (ash, abands) = Dedup.shingleBandIndex(toks(a), "doc_id", "toks")
    Dedup.writeIndex(ash, abands, s"$dir/inc")
    Dedup.appendToIndex(spark, s"$dir/inc", toks(b), "doc_id", "toks")
    // oracle: the union indexed in one shot
    val (ush, ubands) = Dedup.shingleBandIndex(toks(docs), "doc_id", "toks")
    Dedup.writeIndex(ush, ubands, s"$dir/full")
    val inc = Dedup.loadIndex(spark, s"$dir/inc")
    val full = Dedup.loadIndex(spark, s"$dir/full")
    assert(inc.shingles.count() === full.shingles.count())
    assert(inc.bands.exceptAll(full.bands).count() === 0)
    assert(full.bands.exceptAll(inc.bands).count() === 0)
    val pInc = Dedup.probeIndex(inc.shingles, inc.bands, toks(batch),
      "doc_id", "toks").orderBy("batch_id").collect()
    val pFull = Dedup.probeIndex(full.shingles, full.bands, toks(batch),
      "doc_id", "toks").orderBy("batch_id").collect()
    assert(pInc.nonEmpty)
    assert(pInc.toSeq === pFull.toSeq)
  }

  test("appendBucketed: layout(A) + append(B) probes identically to layout(A∪B)") {
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfapp").toString
    val planes = Similarity.planes(4, 8)
    val vecs = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"),
        Similarity.toDouble(slice(col("embedding"), 1, 8)).as("v"))
    Similarity.writeBucketed(vecs.filter(col("vec_id") % 2 === 0), planes, s"$dir/inc")
    Similarity.appendBucketed(vecs.filter(col("vec_id") % 2 =!= 0), planes, s"$dir/inc")
    Similarity.writeBucketed(vecs, planes, s"$dir/full")
    val probes = vecs.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    def run(p: String) = Similarity.probeBucketedMany(spark, p, probes, planes, 5)
      .orderBy("qid", "rnk").collect().toSeq
    val inc = run(s"$dir/inc")
    assert(inc.nonEmpty)
    assert(inc === run(s"$dir/full"))
  }

  test("full ingestion loop: probe, keep clean, append, next batch dedups against it") {
    import org.apache.spark.sql.functions.{concat, concat_ws, lit, pmod, sequence, transform, xxhash64}
    val dir = java.nio.file.Files.createTempDirectory("graft_loop").toString
    // hash-token synthetic docs (ScaleSpec's generator): cross-doc shingle
    // overlap is negligible, so match sets are exact by construction
    def gen(ids: Range, prefix: String) = {
      import spark.implicits._
      ids.toDF("id").select(col("id").cast("long").as("doc_id"),
        concat(lit(prefix), concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("w"), pmod(xxhash64(col("id") * 100 + i), lit(99991))))))
          .as("text"))
    }
    def t(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.ops.TextAnalysis.toks(col("text")).as("toks"))
    val corpus = gen(0 until 100, "")
    Dedup.buildIndex(spark, t(corpus), "doc_id", "toks", s"$dir/ix")
    // batch 1: brand-new docs — must come through clean
    val batch1 = gen(1000 until 1050, "").select(
      (col("doc_id") + 9000).as("doc_id"), col("text"))
    val ix1 = Dedup.loadIndex(spark, s"$dir/ix")
    val m1 = Dedup.probeIndex(ix1.shingles, ix1.bands, t(batch1), "doc_id", "toks")
    assert(m1.count() === 0L, "fresh docs must not match the corpus")
    // the cadence step: fold the CLEAN batch into the stored index
    Dedup.appendToIndex(spark, s"$dir/ix", t(batch1), "doc_id", "toks")
    // batch 2: near-copies of batch 1 (2 tokens prepended) — every one
    // must now dedup against its batch-1 source
    val batch2 = gen(1000 until 1050, "zz yy ").select(
      (col("doc_id") + 20000).as("doc_id"), col("text"))
    val ix2 = Dedup.loadIndex(spark, s"$dir/ix")
    val m2 = Dedup.probeIndex(ix2.shingles, ix2.bands, t(batch2), "doc_id", "toks")
      .collect()
    assert(m2.length >= 48, s"near-copies must match their sources (got ${m2.length}/50)")
    assert(m2.forall(r => r.getLong(1) === r.getLong(0) - 20000 + 9000),
      "each duplicate must resolve to its batch-1 source")
  }

  test("VecIngest: streamed vector appends probe identically to a batch build") {
    import graft.ops.Similarity
    val root = java.nio.file.Files.createTempDirectory("graft_vecingest").toString
    val planes = Similarity.planes(4, 64)
    val vecs = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    // seed an empty layout, then let the stream fold the table in
    Similarity.writeBucketed(vecs.limit(0), planes, s"$root/streamed")
    graft.streaming.VecIngest.ingestAvailableNow(spark, TestSpark.Sf0001,
      s"$root/streamed", planes, checkpoint = Some(s"$root/ckpt"))
    Similarity.writeBucketed(vecs, planes, s"$root/batch")
    val probes = vecs.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    def run(p: String) = Similarity.probeBucketedMany(spark, p, probes, planes, 5)
      .orderBy("qid", "rnk").collect().toSeq
    val streamed = run(s"$root/streamed")
    assert(streamed.nonEmpty)
    assert(streamed === run(s"$root/batch"))
  }

  test("Materialize.Stage tracks staging tables and cleanup removes them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stage").toString
    val stage = Materialize.Stage(dir)
    val df = Tables.documents(spark, TestSpark.Sf0001).limit(10)
      .select(col("doc_id"))
    val a = stage(df)
    val b = stage(df.withColumn("two", col("doc_id") * 2))
    assert(a.count() === 10L && b.count() === 10L)
    assert(stage.stagedPaths.length === 2)
    assert(stage.stagedPaths.forall(p => new java.io.File(p).isDirectory))
    val paths = stage.stagedPaths
    stage.cleanup(spark)
    assert(stage.stagedPaths.isEmpty)
    assert(paths.forall(p => !new java.io.File(p).exists))
  }
}
