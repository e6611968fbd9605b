package graft

import java.awt.image.BufferedImage
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImagePreproc, Multimodal, Tagger}

/** Golden tests for the REAL pixel decode + tagger preprocessing chain
  * (alpha-composite white → BGR → pad-square → area/cubic resize →
  * float32 HWC): exact expected tensors for hand-computable cases, a
  * pinned checksum for a PRNG image (oracle-exempt per contract — this
  * is the golden test the correctness gate can't express in SQL), and
  * the Spark plumbing (mapPartitions preprocess + batched tensor
  * scoring) against the direct function. */
class ImagePreprocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def rgbImage(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  test("pad-to-square centers the image at floor-half offsets on white") {
    // 6×4 constant (r=10, g=20, b=30), target 8 → left pad 1, top pad 2,
    // no resize; tensor is BGR so the color reads (30, 20, 10).
    val bytes = pngBytes(rgbImage(6, 4)((_, _) => (10 << 16) | (20 << 8) | 30))
    val t = ImagePreproc.preprocess(bytes, 8).get
    assert(t.length === 8 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
      val inside = x >= 1 && x <= 6 && y >= 2 && y <= 5
      val expect = if (!inside) 255f else Seq(30f, 20f, 10f)(c)
      assert(t((y * 8 + x) * 3 + c) === expect, s"($x,$y,$c)")
    }
  }

  test("alpha composites onto white (PIL paste-on-WHITE semantics)") {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 0x00000000)          // fully transparent → white
    img.setRGB(1, 0, 0xff000000)          // opaque black
    img.setRGB(0, 1, 0xffc86432)          // opaque (200, 100, 50)
    img.setRGB(1, 1, 0x007b2d43)          // transparent w/ junk color → white
    val t = ImagePreproc.preprocess(pngBytes(img), 2).get
    def bgr(x: Int, y: Int) = (0 until 3).map(c => t((y * 2 + x) * 3 + c))
    assert(bgr(0, 0) === Seq(255f, 255f, 255f))
    assert(bgr(1, 0) === Seq(0f, 0f, 0f))
    assert(bgr(0, 1) === Seq(50f, 100f, 200f))
    assert(bgr(1, 1) === Seq(255f, 255f, 255f))
  }

  test("area downscale is the exact box mean (integer-aligned boxes)") {
    // 4×4 of constant 2×2 blocks, target 2: each dst pixel = its block.
    val blocks = Map((0, 0) -> (10, 20, 30), (1, 0) -> (50, 60, 70),
      (0, 1) -> (90, 100, 110), (1, 1) -> (130, 140, 150))
    val bytes = pngBytes(rgbImage(4, 4) { (x, y) =>
      val (r, g, b) = blocks((x / 2, y / 2)); (r << 16) | (g << 8) | b
    })
    val t = ImagePreproc.preprocess(bytes, 2).get
    for (((bx, by), (r, g, b)) <- blocks) {
      assert(t((by * 2 + bx) * 3) === b.toFloat)
      assert(t((by * 2 + bx) * 3 + 1) === g.toFloat)
      assert(t((by * 2 + bx) * 3 + 2) === r.toFloat)
    }
  }

  test("area downscale fractional coverage (3 → 2)") {
    // rows all [0, 90, 255]: dst = [(0·1 + 90·0.5)/1.5, (90·0.5 + 255·1)/1.5]
    val plane = Array.fill(3)(Array(0.0, 90.0, 255.0)).flatten
    val out = ImagePreproc.resizePlane(plane, 3, 2)
    assert(out.toSeq === Seq(30.0, 200.0, 30.0, 200.0))
  }

  test("bicubic upscale preserves constants (kernel partition of unity)") {
    val out = ImagePreproc.resizePlane(Array.fill(4)(7.0), 2, 4)
    out.foreach(v => assert(math.abs(v - 7.0) < 1e-12))
  }

  test("golden checksum: PRNG image end to end (decode→pad→area→float32)") {
    // Deterministic LCG pixels, 13×7, target 8: pads to 13×13 then area-
    // resamples with fractional coverage — locks every stage's arithmetic.
    var seed = 42L
    def next(): Int = { seed = (seed * 1103515245L + 12345L) & 0x7fffffff; (seed % 256).toInt }
    val bytes = pngBytes(rgbImage(13, 7)((_, _) => (next() << 16) | (next() << 8) | next()))
    val t = ImagePreproc.preprocess(bytes, 8).get
    assert(t.length === 8 * 8 * 3)
    val sum = t.map(_.toLong).sum
    val mix = t.foldLeft(0L)((acc, v) => (acc * 31 + v.toLong) & 0xffffffffL)
    assert(sum === 36057L)
    assert(mix === 3153000307L)
    // first row is pure padding (13×7 pads 3 white rows on top)
    assert(t.take(6).toSeq === Seq.fill(6)(255f))
  }

  test("preprocessDF: mapPartitions plumbing == direct function; corrupt flagged") {
    val d = Files.createTempDirectory("graft_pp")
    val imgs = Map(
      "10_a.png" -> pngBytes(rgbImage(5, 9)((x, y) => (x * 40 << 16) | (y * 25 << 8) | 128)),
      "20_b.png" -> pngBytes(rgbImage(16, 16)((x, y) => ((x * y) % 256) << 8)))
    imgs.foreach { case (n, b) => Files.write(d.resolve(n), b) }
    Files.write(d.resolve("30_c.png"), "definitely not a png".getBytes("UTF-8"))
    val out = ImagePreproc.preprocessDF(
        Multimodal.loadBinaryDir(spark, d.toString, glob = "*.png"), 8)
      .collect().map(r => new java.io.File(r.getString(0)).getName ->
        ((Option(r.getSeq[Float](1)), r.getBoolean(2)))).toMap
    assert(out.keySet === Set("10_a.png", "20_b.png", "30_c.png"))
    assert(!out("30_c.png")._1.isDefined && !out("30_c.png")._2)
    imgs.foreach { case (n, b) =>
      assert(out(n)._2)
      assert(out(n)._1.get === ImagePreproc.preprocess(b, 8).get.toSeq, n)
    }
  }

  test("scoreImagesDF: decode → preprocess → batched stub model end to end") {
    val d = Files.createTempDirectory("graft_sc")
    val imgs = (1 to 5).map { i =>
      s"${i}0_x.png" -> pngBytes(rgbImage(6 + i, 11)((x, y) => (i * 30 << 16) | (x * y) % 256))
    }.toMap
    imgs.foreach { case (n, b) => Files.write(d.resolve(n), b) }
    Files.write(d.resolve("99_bad.png"), Array[Byte](1, 2, 3))
    val vocab = Seq("tagA", "tagB", "tagC")
    val out = ImagePreproc.scoreImagesDF(
        Multimodal.loadBinaryDir(spark, d.toString, glob = "*.png"), 8,
        () => new Tagger.StubTensorScorer(vocab), batchSize = 2)
      .select(col("path"), col("ok"), col("scores"))
      .collect().map(r => new java.io.File(r.getString(0)).getName -> r).toMap
    assert(!out("99_bad.png").getBoolean(1))
    assert(out("99_bad.png").isNullAt(2))
    val scorer = new Tagger.StubTensorScorer(vocab)
    imgs.foreach { case (n, b) =>
      val r = out(n)
      assert(r.getBoolean(1))
      val got = r.getSeq[org.apache.spark.sql.Row](2)
        .map(s => s.getString(0) -> s.getDouble(1))
      val want = vocab.zip(
        scorer.scoreBatch(Seq(ImagePreproc.preprocess(b, 8).get)).head)
      assert(got === want, n)
    }
  }

  test("PixelDecoder: real-decode dims agree with the header sniff") {
    val d = Files.createTempDirectory("graft_px")
    javax.imageio.ImageIO.write(
      rgbImage(37, 21)((x, y) => x * y), "png", d.resolve("1_a.png").toFile)
    javax.imageio.ImageIO.write(
      rgbImage(64, 48)((x, y) => x + y), "jpg", d.resolve("2_b.jpg").toFile)
    val out = Multimodal.decodeDF(
        Multimodal.loadBinaryDir(spark, d.toString, glob = "*.{png,jpg}"),
        () => new ImagePreproc.PixelDecoder)
      .orderBy(col("path")).collect()
    assert(out.map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(6))).toSeq
      === Seq(("image/png", 37, 21, true), ("image/jpeg", 64, 48, true)))
  }
}
