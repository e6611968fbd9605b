package graft

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sources

/** S1–S9 sources + K1/K2 sinks over a real temp-dir fixture (FIXTURES.md
  * §1/§3/§6 layout). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(p: Path, s: String): Unit = Files.write(p, s.getBytes(UTF_8))

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("graft_src")
    write(d.resolve("123_a.jpg"), "fakejpegbytes123")
    write(d.resolve("456_b.png"), "fakepngbytes456")
    write(d.resolve("789_c.gif"), "not-matched-by-glob")
    write(d.resolve("123.txt"), "s, 1girl, long hair\nsecond line ignored")
    write(d.resolve("456.txt"), "general")
    write(d.resolve("123.caption"), "a girl with long hair\n")
    val sub = Files.createDirectory(d.resolve("sub"))
    write(sub.resolve("999_d.jpg"), "nestedimage")
    write(d.resolve("scores1.json"), """{"image_id": "123", "aesthetic_score": 0.83}""")
    write(d.resolve("scores2.json"), """{"image_id": "456", "aesthetic_score": 0.42}""")
    write(d.resolve("vocab.csv"), "tag_id,name,category,count\n1,long_hair,0,120\n2,hatsune_miku,4,50\n3,general,9,4\n")
    write(d.resolve("chars.csv"), "id,platform,character\n1,x,Miku (Vocaloid)\n2,y,Solo Char\n")
    write(d.resolve("meta.json"),
      """{"/d/123_a.jpg": {"rating": "s", "score": 0.8}, "/d/456_b.png": {"rating": "g", "score": 0.3}}""")
    d
  }

  test("S1: non-recursive binaryFile glob picks jpg/png only") {
    val df = Sources.imageDir(spark, dir.toString)
    val names = df.select(col("path")).collect().map(_.getString(0).split('/').last).sorted
    assert(names.toSeq === Seq("123_a.jpg", "456_b.png"))
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
  }

  test("S2: recursive lookup finds nested images") {
    val df = Sources.imageDir(spark, dir.toString, recursive = true)
    val names = df.select(col("path")).collect().map(_.getString(0).split('/').last).sorted
    assert(names.toSeq === Seq("123_a.jpg", "456_b.png", "999_d.jpg"))
  }

  test("S4: sidecar tag parse — first line, rating-first CSV") {
    val out = Sources.sidecarTags(spark, dir.toString).orderBy("image_key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[String](2)))
    assert(out.toSeq === Seq(
      ("123", "s", Seq("1girl", "long hair")),
      ("456", "general", Seq())))
  }

  test("S5: caption sidecar") {
    val out = Sources.sidecarCaptions(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("123", "a girl with long hair")))
  }

  test("S4+J1: left join images to sidecars with empty defaults (run.py:53-55,66-68)") {
    val images = Sources.imageDir(spark, dir.toString)
      .select(graft.ops.Paths.imageKey(col("path")).as("image_key"))
    val joined = images.join(Sources.sidecarTags(spark, dir.toString), Seq("image_key"), "left")
      .select(col("image_key"), coalesce(col("rating"), lit("")).as("rating"))
      .orderBy("image_key").collect().map(r => (r.getString(0), r.getString(1)))
    assert(joined.toSeq === Seq(("123", "s"), ("456", "general")))
  }

  test("S6: dict-keyed JSON → rows") {
    val out = Sources.keyedJson(spark, dir.resolve("meta.json").toString,
        org.apache.spark.sql.types.StructType.fromDDL("rating STRING, score DOUBLE"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("/d/123_a.jpg", "s", 0.8), ("/d/456_b.png", "g", 0.3)))
  }

  test("S7: multi-file JSON list = union all") {
    val df = Sources.jsonList(spark,
      Seq(dir.resolve("scores1.json").toString, dir.resolve("scores2.json").toString))
    assert(df.count() === 2)
    assert(df.agg(round(sum("aesthetic_score"), 2)).collect()(0).getDouble(0) === 1.25)
  }

  test("S7 permissive: corrupt JSON rows are quarantined, not fatal") {
    val mixed = java.nio.file.Files.createTempDirectory("graft_perm")
      .resolve("mixed.jsonl")
    java.nio.file.Files.write(mixed, java.util.Arrays.asList(
      """{"image_path": "a.jpg", "aesthetic_score": 0.9}""",
      """{"image_path": "b.jpg", "aesthetic_score": NOT_JSON}""",
      """{"image_path": "c.jpg", "aesthetic_score": 0.4}"""))
    val (good, bad) = Sources.jsonListPermissive(spark, Seq(mixed.toString),
      "image_path STRING, aesthetic_score DOUBLE")
    assert(good.count() === 2)
    assert(good.columns.toSeq === Seq("image_path", "aesthetic_score"))
    assert(bad.count() === 1)
    assert(bad.collect()(0).getString(0).contains("NOT_JSON"))
  }

  test("S8: headered CSV with schema (selected_tags shape)") {
    val df = Sources.csvWithHeader(spark, dir.resolve("vocab.csv").toString,
      "tag_id LONG, name STRING, category INT, count LONG")
    assert(df.count() === 3)
    assert(df.filter(col("category") === 9).select("name").collect()(0).getString(0) === "general")
  }

  test("S9: headerless column projection with header-value drop") {
    val out = Sources.csvColumn(spark, dir.resolve("chars.csv").toString, 2, "character")
      .orderBy("value").collect().map(_.getString(0))
    assert(out.toSeq === Seq("Miku (Vocaloid)", "Solo Char"))
  }

  test("S4 as a DataSource V2 connector: format() read == binaryFile spelling") {
    val raw = spark.read.format(graft.sources.SidecarDataSource.Name)
      .option("ext", "txt").load(dir.toString)
    val v1 = Sources.sidecarText(spark, dir.toString, "txt").orderBy("image_key")
    val a = raw.orderBy("image_key").collect().map(r => (r.getString(0), r.getString(1)))
    val b = v1.collect().map(r => (r.getString(0), r.getString(1)))
    assert(a.nonEmpty && a.toSeq === b.toSeq)
    // file-granularity parallelism: one input partition per sidecar file
    assert(raw.rdd.getNumPartitions === a.length)
    // column pruning pushes into the connector: key-only projection scans
    // with a pruned schema (and never opens the files)
    val keysOnly = raw.select("image_key")
    val plan = keysOnly.queryExecution.executedPlan.toString
    assert(plan.contains("columns=image_key"), s"not pruned:\n$plan")
    assert(keysOnly.collect().map(_.getString(0)).sorted.toSeq === a.map(_._1).toSeq)
  }

  test("K1 ↔ S6 roundtrip: dict-keyed sink reads back identically") {
    val df = Seq(("k1", "s", 0.9), ("k2", "g", 0.1)).toDF("image_key", "rating", "score")
    val out = Files.createTempDirectory("graft_k1").resolve("meta").toString
    Sources.writeKeyedJson(df, "image_key", out)
    val back = Sources.keyedJson(spark, out,
        org.apache.spark.sql.types.StructType.fromDDL("rating STRING, score DOUBLE"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq === Seq(("k1", "s", 0.9), ("k2", "g", 0.1)))
  }

  test("K1 streams: many-row dump is valid JSON with no driver-sized row") {
    val df = spark.range(0, 5000)
      .selectExpr("concat('key', lpad(cast(id as string), 6, '0')) AS image_key",
        "cast(id as double) / 10 AS score")
    val out = Files.createTempDirectory("graft_k1big").resolve("meta").toString
    Sources.writeKeyedJson(df, "image_key", out)
    val back = Sources.keyedJson(spark, out,
        org.apache.spark.sql.types.StructType.fromDDL("score DOUBLE"))
    assert(back.count() === 5000)
    assert(back.filter(col("key") === "key004999").collect()(0).getDouble(1) === 499.9)
  }

  test("K2: jsonl roundtrip (row-per-line, parallel)") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    val out = Files.createTempDirectory("graft_k2").resolve("rows").toString
    Sources.writeJsonl(df, out)
    val back = spark.read.json(out).orderBy("k").collect().map(r =>
      (r.getAs[String]("k"), r.getAs[Long]("n")))
    assert(back.toSeq === Seq(("a", 1L), ("b", 2L)))
  }
}
