package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Multimodal, Tagger}

/** U1 tagger stub + multimodal decode: the mapPartitions paths must agree
  * bit for bit with the oracle-checked column expressions. */
class TaggerMultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("U1: StubScorer via mapPartitions == stubConf column expression") {
    val vocab = Seq("long hair", "smile", "general")
    val keys = Seq("doc1", "doc2", "doc42").toDF("key")
    val viaMap = Tagger.scoreDF(keys, "key", () => new Tagger.StubScorer(vocab))
      .select(col("key"), explode(col("scores")).as("s"))
      .select(col("key"), col("s.tag"), col("s.conf"))
    val viaCol = keys.select(col("key"),
        explode(transform(typedLit(vocab),
          t => struct(t.as("tag"), Tagger.stubConf(col("key"), t).as("conf")))).as("s"))
      .select(col("key"), col("s.tag"), col("s.conf").as("cconf"))
    val joined = viaMap.join(viaCol, Seq("key", "tag"))
    assert(joined.count() === 9)
    assert(joined.filter(col("conf") =!= col("cconf")).count() === 0)
  }

  test("U1: batched scoring (batchSize 3) == row-at-a-time path") {
    val vocab = Seq("long hair", "smile", "general")
    val keys = (1 to 10).map(i => s"doc$i").toDF("key")
    val rowwise = Tagger.scoreDF(keys, "key", () => new Tagger.StubScorer(vocab))
      .select(col("key"), explode(col("scores")).as("s"))
      .select(col("key"), col("s.tag"), col("s.conf"))
    val batched = Tagger.scoreDFBatched(keys, "key",
        () => new Tagger.RowwiseBatch(new Tagger.StubScorer(vocab)), batchSize = 3)
      .select(col("key"), explode(col("scores")).as("s"))
      .select(col("key"), col("s.tag"), col("s.conf").as("bconf"))
    val j = rowwise.join(batched, Seq("key", "tag"))
    assert(j.count() === 30)
    assert(j.filter(col("conf") =!= col("bconf")).count() === 0)
  }

  test("U1: F3 threshold semantics on stub scores") {
    val vocab = (1 to 50).map(i => s"tag$i")
    val df = Tagger.scoreDF(Seq("k").toDF("key"), "key", () => new Tagger.StubScorer(vocab))
      .select(explode(col("scores")).as("s")).select(col("s.conf"))
    val confs = df.collect().map(_.getDouble(0))
    assert(confs.forall(c => c >= 0.0 && c < 1.0))
    assert(confs.count(_ > 0.35) > 0 && confs.count(_ <= 0.35) > 0) // threshold splits
  }

  test("multimodal: StubDecoder via mapPartitions == column stub dims; corrupt flagged") {
    val d = Files.createTempDirectory("graft_mm")
    Files.write(d.resolve("1_a.jpg"), "some-fake-image-bytes-1".getBytes(UTF_8))
    Files.write(d.resolve("2_b.jpg"), "other-fake-image-bytes-22".getBytes(UTF_8))
    Files.write(d.resolve("3_c.jpg"), "tiny".getBytes(UTF_8)) // < 8 bytes → corrupt
    val bin = Multimodal.loadBinaryDir(spark, d.toString)
    val viaMap = Multimodal.decodeDF(bin, () => new Multimodal.StubDecoder)
    assert(viaMap.filter(!col("ok")).count() === 1) // F4: corrupt detected
    val viaCol = bin.select(col("path").cast("string").as("path"),
        Multimodal.contentHash(col("content")).as("chash"))
      .select(col("path"),
        Multimodal.stubWidth(col("chash")).as("cw"),
        Multimodal.stubHeight(col("chash")).as("ch"))
    val j = viaMap.filter(col("ok")).join(viaCol, "path")
    assert(j.count() === 2)
    assert(j.filter(col("width") =!= col("cw") || col("height") =!= col("ch")).count() === 0)
  }

  test("multimodal: HeaderDecoder reads REAL JPEG/PNG/GIF dims, skips corrupt") {
    // Real files written by the JDK's own encoders — no external codecs.
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val d = Files.createTempDirectory("graft_hdr")
    def img(w: Int, h: Int) = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    ImageIO.write(img(320, 200), "jpg", d.resolve("10_a.jpg").toFile)
    ImageIO.write(img(640, 480), "png", d.resolve("20_b.png").toFile)
    ImageIO.write(img(17, 31), "gif", d.resolve("30_c.jpeg").toFile) // gif bytes, jpeg name
    Files.write(d.resolve("40_d.jpg"), "not an image at all".getBytes(UTF_8))
    val out = Multimodal.decodeDF(
        Multimodal.loadBinaryDir(spark, d.toString, glob = "*.{jpg,png,jpeg,gif}"),
        () => new Multimodal.HeaderDecoder)
      .select(regexp_extract(col("path"), "([0-9]+)_[a-z]", 1).cast("int").as("id"),
        col("mime"), col("width"), col("height"), col("ok"))
      .orderBy(col("id")).collect()
    assert(out.map(r => (r.getInt(0), r.getBoolean(4))).toSeq ===
      Seq((10, true), (20, true), (30, true), (40, false)))
    assert(out(0).getString(1) === "image/jpeg" &&
      out(0).getInt(2) === 320 && out(0).getInt(3) === 200)
    assert(out(1).getString(1) === "image/png" &&
      out(1).getInt(2) === 640 && out(1).getInt(3) === 480)
    // content sniffing, not extension sniffing
    assert(out(2).getString(1) === "image/gif" &&
      out(2).getInt(2) === 17 && out(2).getInt(3) === 31)
  }

  test("multimodal: MediaDecoder — animated-GIF frame counts + WAV audio meta") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val d = Files.createTempDirectory("graft_media")
    def img(w: Int, h: Int, c: Int) = {
      val i = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) i.setRGB(x, y, c)
      i
    }
    // 3-frame animated GIF via the JDK's own sequence writer
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(d.resolve("1_anim.gif").toFile)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(0xff0000, 0x00ff00, 0x0000ff).foreach(c =>
      writer.writeToSequence(new javax.imageio.IIOImage(img(12, 9, c), null, null), null))
    writer.endWriteSequence(); ios.close(); writer.dispose()
    // single-frame GIF
    ImageIO.write(img(7, 5, 0x123456), "gif", d.resolve("2_still.gif").toFile)
    // canonical PCM WAV: 16 kHz, mono, 16-bit, 1234 samples
    val (rate, samples, blockAlign) = (16000, 1234, 2)
    val bb = java.nio.ByteBuffer.allocate(44 + samples * blockAlign)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + samples * blockAlign); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(rate); bb.putInt(rate * blockAlign); bb.putShort(blockAlign.toShort)
    bb.putShort(16); bb.put("data".getBytes); bb.putInt(samples * blockAlign)
    Files.write(d.resolve("3_tone.wav"), bb.array())
    Files.write(d.resolve("4_junk.wav"), "RIFFnot really wave data".getBytes(UTF_8))
    val out = Multimodal.decodeDF(
        Multimodal.loadBinaryDir(spark, d.toString, glob = "*.{gif,wav}"),
        () => new Multimodal.MediaDecoder)
      .select(regexp_extract(col("path"), "([0-9]+)_", 1).cast("int").as("id"),
        col("mime"), col("width"), col("height"), col("n_frames"),
        col("sample_rate"), col("ok"))
      .orderBy(col("id")).collect()
    assert(out.map(r => (r.getInt(0), r.getBoolean(6))).toSeq ===
      Seq((1, true), (2, true), (3, true), (4, false)))
    assert(out(0).getString(1) === "image/gif" && out(0).getInt(2) === 12 &&
      out(0).getInt(3) === 9 && out(0).getInt(4) === 3) // real frame count
    assert(out(1).getString(1) === "image/gif" && out(1).getInt(4) === 1)
    assert(out(2).getString(1) === "audio/wav" && out(2).getInt(5) === rate &&
      out(2).getInt(4) === samples)
  }

  test("multimodal: frame sampling every k-th frame") {
    val r = Seq(10).toDF("n")
      .select(Multimodal.frameSampleIndices(col("n"), 3).as("f")).collect()(0).getSeq[Int](0)
    assert(r === Seq(0, 3, 6, 9))
  }
}
