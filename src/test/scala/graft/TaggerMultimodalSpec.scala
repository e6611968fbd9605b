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

  test("multimodal: frame sampling every k-th frame") {
    val r = Seq(10).toDF("n")
      .select(Multimodal.frameSampleIndices(col("n"), 3).as("f")).collect()(0).getSeq[Int](0)
    assert(r === Seq(0, 3, 6, 9))
  }
}
