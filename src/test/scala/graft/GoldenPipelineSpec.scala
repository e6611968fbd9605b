package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Multimodal, Paths, Sources}
import graft.pipeline.ModernPipeline

/** SURVEY §5.4 golden test: the modern pipeline end-to-end from REAL files
  * (binaryFile images + .txt sidecars + score JSON + vocab CSV), through
  * stub decode, J1 sidecar merge, bucket math, J2 aesthetic join, U3 tag
  * ordering, to the final metadata schema. Tag/score/rating outputs are
  * exact goldens; dims are stub-hash-derived so the bucket is asserted
  * against the grid. */
class GoldenPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_golden")
    Files.write(d.resolve("100_a.jpg"), "image-bytes-number-one!!".getBytes(UTF_8))
    Files.write(d.resolve("200_b.jpg"), "image-bytes-number-two!!!".getBytes(UTF_8))
    Files.write(d.resolve("300_c.jpg"), "image-bytes-number-three!".getBytes(UTF_8))
    Files.write(d.resolve("100.txt"), "s, 1girl, long_hair, hatsune miku\n".getBytes(UTF_8))
    Files.write(d.resolve("200.txt"), "general, smile, 16:9\n".getBytes(UTF_8))
    // 300 has no sidecar → J1 defaults (empty rating/tags)
    Files.write(d.resolve("scores.json"),
      """{"image_key": "100", "aesthetic_score": 0.9}
        |{"image_key": "200", "aesthetic_score": 0.8}
        |{"image_key": "300", "aesthetic_score": 0.2}""".stripMargin.getBytes(UTF_8))
    Files.write(d.resolve("vocab.csv"),
      "tag_id,name,category,count\n1,long_hair,0,10\n2,smile,0,9\n".getBytes(UTF_8))
    d.toString
  }

  test("real-image pipeline: HeaderDecoder dims drive bucket assignment") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val d = Files.createTempDirectory("graft_golden_real")
    def img(w: Int, h: Int) = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    ImageIO.write(img(640, 1024), "png", d.resolve("100_a.png").toFile) // exact grid reso
    ImageIO.write(img(800, 600), "png", d.resolve("200_b.png").toFile)  // argmin case
    Files.write(d.resolve("100.txt"), "s, 1girl\n".getBytes(UTF_8))
    Files.write(d.resolve("200.txt"), "g, smile\n".getBytes(UTF_8))
    val decoded = Multimodal.decodeDF(
        Multimodal.loadBinaryDir(spark, d.toString, glob = "*.png"),
        () => new Multimodal.HeaderDecoder)
      .filter(col("ok"))
      .select(Paths.imageKey(col("path")).as("image_key"),
        col("width").as("w"), col("height").as("h"))
    val bucketed = ModernPipeline.assignBuckets(decoded)
      .select(col("image_key"), col("w"), col("h"),
        col("train_resolution.train_w").as("tw"), col("train_resolution.train_h").as("th"))
      .orderBy(col("image_key")).collect()
    // REAL dims came out of the png headers
    assert(bucketed.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq(("100", 640, 1024), ("200", 800, 600)))
    // exact-grid image keeps its resolution (bucket_manager.py:104-106)
    assert((bucketed(0).getInt(3), bucketed(0).getInt(4)) === ((640, 1024)))
    // argmin case: recompute expected bucket independently in plain Scala
    val resos = graft.ops.Bucketing.makeBucketResolutions()
    val ar = 800.0 / 600.0
    val expected = resos.minBy { case (rw, rh) => math.abs(rw.toDouble / rh - ar) }
    assert((bucketed(1).getInt(3), bucketed(1).getInt(4)) ===
      ((expected._1 - expected._1 % 8, expected._2 - expected._2 % 8)))
  }

  test("file-based modern pipeline produces the golden metadata") {
    // S1+S3: binary scan + stub decode (dims from content hash)
    val decoded = Multimodal.decodeDF(
        Sources.imageDir(spark, dir), () => new Multimodal.StubDecoder)
      .filter(col("ok"))
      .select(Paths.imageKey(col("path")).as("image_key"),
        col("width").as("w"), col("height").as("h"))
    // S4+J1: left join sidecar tags, defaults for the missing sidecar
    val tags = Sources.sidecarTags(spark, dir)
    val images = decoded.join(tags, Seq("image_key"), "left")
      .select(col("image_key"), col("w"), col("h"),
        coalesce(col("rating"), lit("")).as("rating"),
        coalesce(col("tags"), array().cast("array<string>")).as("tags"))
    // bucket + J2 score join/filter (S7 JSON list) + U3 ordering (S8 vocab)
    val bucketed = ModernPipeline.assignBuckets(images)
    val scores = Sources.jsonList(spark, Seq(s"$dir/scores.json"))
      .select(col("image_key"), col("aesthetic_score"))
    val filtered = ModernPipeline.aestheticFilter(bucketed, scores, 0.5)
    val vocab = Sources.csvWithHeader(spark, s"$dir/vocab.csv",
        "tag_id LONG, name STRING, category INT, count LONG")
      .select(regexp_replace(col("name"), "_", " ").as("vtag"))
    val ordered = ModernPipeline.orderTags(filtered, "image_key", vocab, "vtag")
    val out = ModernPipeline.finalMetadata(
      ordered.withColumn("ordered_tags",
        // sidecar tags are underscore-raw; order on the spaced form
        col("ordered_tags")))
    val rows = out.collect()
    // 300 dropped by the 0.5 threshold → exactly two survivors
    assert(rows.map(_.getString(0)).toSeq === Seq("100", "200"))
    val r100 = rows(0)
    assert(r100.getString(3) === "s")
    assert(r100.getDouble(4) === 0.9)
    // U3 golden: prefix 1girl; 'hatsune miku' unknown → character;
    // 'long_hair' not in spaced vocab (underscore form) → character too,
    // length-desc; no non-character tags
    assert(r100.getString(5) === "1girl,hatsune miku,long_hair")
    val r200 = rows(1)
    assert(r200.getString(3) === "general")
    assert(r200.getDouble(4) === 0.8)
    // 'smile' known → non-char; '16:9' trigger → non-char, length-desc
    assert(r200.getString(5) === "smile,16:9")
    // bucket sanity: train resolution flat scalars, %8-aligned
    rows.foreach { r =>
      assert(r.getInt(1) % 8 === 0 && r.getInt(2) % 8 === 0)
    }
  }
}
