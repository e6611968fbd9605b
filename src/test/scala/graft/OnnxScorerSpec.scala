package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{OnnxScorer, Tagger}

/** The env-gated real-ONNX seam ([[graft.ops.OnnxScorer]]): the gating
  * logic is fully testable without the runtime; the inference path
  * runs HERMETICALLY against the test-classpath fake of the public
  * onnxruntime API ([[ai.onnxruntime.OrtSession]] — same class names,
  * same method signatures the reflective binding resolves) over a
  * generated, structurally valid ONNX model ([[OnnxTestModel]]), so
  * the Class.forName/getMethod/invoke chain executes end-to-end in
  * this offline container instead of cancelling. Pointing
  * `GRAFT_ONNX_MODEL`/`GRAFT_ONNX_LABELS` at a real model on a host
  * with the real jar exercises the identical path. */
class OnnxScorerSpec extends AnyFunSuite {

  test("unset GRAFT_ONNX_MODEL means None — the stub path stays in " +
      "force and nothing touches the classpath") {
    assert(OnnxScorer.ifConfigured(Map.empty) === None)
    assert(OnnxScorer.ifConfigured(
      Map("GRAFT_ONNX_LABELS" -> "/nope.csv")) === None)
  }

  test("a configured-but-unusable setup refuses LOUDLY (never a silent " +
      "stub): missing model file, missing labels, absent runtime") {
    val eMissing = intercept[Exception](OnnxScorer.ifConfigured(
      Map("GRAFT_ONNX_MODEL" -> "/no/such/model.onnx")))
    assert(eMissing.getMessage.contains("does not exist"))
    val model = java.nio.file.Files.createTempFile("fake", ".onnx")
    model.toFile.deleteOnExit()
    if (!OnnxScorer.runtimeAvailable) {
      // this container: the runtime is absent — the error must say so
      val eRt = intercept[Exception](OnnxScorer.ifConfigured(
        Map("GRAFT_ONNX_MODEL" -> model.toString,
          "GRAFT_ONNX_LABELS" -> "/any.csv")))
      assert(eRt.getMessage.contains("onnxruntime"))
    } else {
      // a real-runtime host: missing labels is the next refusal
      val eLb = intercept[Exception](OnnxScorer.ifConfigured(
        Map("GRAFT_ONNX_MODEL" -> model.toString)))
      assert(eLb.getMessage.contains("GRAFT_ONNX_LABELS"))
    }
  }

  test("loadVocab reads the selected_tags.csv shape (header skipped, " +
      "name column)") {
    val f = java.nio.file.Files.createTempFile("tags", ".csv")
    f.toFile.deleteOnExit()
    java.nio.file.Files.writeString(f,
      "tag_id,name,category,count\n1,general,9,100\n2,1girl,0,50\n")
    assert(OnnxScorer.loadVocab(f.toString) === Seq("general", "1girl"))
  }

  test("INTEGRATION: a session scores a batch through the " +
      "TensorBatchScorer contract end-to-end (reflective binding, " +
      "generated valid ONNX bytes, hermetic when GRAFT_ONNX_MODEL is " +
      "unset)") {
    assert(OnnxScorer.runtimeAvailable,
      "the ai.onnxruntime test fake must be on the test classpath")
    // point at a REAL model via env when available; otherwise generate
    // a tiny valid one (mean·W semantics, wd14 I/O shape contract)
    val env: Map[String, String] =
      if (sys.env.contains("GRAFT_ONNX_MODEL")) sys.env.toMap
      else {
        val (model, labels) = OnnxTestModel.writeModel(
          weights = Seq(0.2f, 0.4f, 0.8f),
          tags = Seq("general", "1girl", "solo"))
        Map("GRAFT_ONNX_MODEL" -> model, "GRAFT_ONNX_LABELS" -> labels)
      }
    val scorer = OnnxScorer.ifConfigured(env).get
    val side = 448 // the wd14 input shape ImagePreproc emits
    val tensor = Array.fill(side * side * 3)(0.5f)
    val out = scorer.scoreBatch(Seq(tensor, tensor))
    assert(out.length === 2)
    assert(out.head.length === scorer.vocab.length)
    assert(out.head === out(1)) // deterministic on identical input
    if (!sys.env.contains("GRAFT_ONNX_MODEL")) {
      // hermetic path: scores are the graph's exact arithmetic —
      // mean(0.5-filled image) · W — so a buffer-offset, batch-order,
      // or shape bug in the NHWC marshalling shows up as wrong values,
      // not just wrong shapes
      assert(scorer.vocab === Seq("general", "1girl", "solo"))
      out.foreach { row =>
        Seq(0.1, 0.2, 0.4).zip(row).foreach { case (want, got) =>
          assert(math.abs(want - got) < 1e-6, s"want $want got $got")
        }
      }
    }
    // plugs into the same integration path the stub uses
    assert(scorer.isInstanceOf[Tagger.TensorBatchScorer])
  }

  test("U1 DF hot path end-to-end: scoreImagesDF decodes PNGs, batches " +
      "NHWC tensors, and scores through the reflective ONNX session") {
    val spark = TestSpark.spark
    import spark.implicits._
    val side = 8
    val (model, labels) = OnnxTestModel.writeModel(
      weights = Seq(1.0f, 2.0f), tags = Seq("a", "b"), side = side)
    val env = Map("GRAFT_ONNX_MODEL" -> model, "GRAFT_ONNX_LABELS" -> labels)
    def png(v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until side).foreach(x => (0 until side).foreach(y =>
        img.setRGB(x, y, (v << 16) | (v << 8) | v)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(("p1", png(50)), ("p2", png(200)), ("p3", "junk".getBytes))
      .toDF("path", "content")
    val out = graft.ops.ImagePreproc.scoreImagesDF(df, side,
        () => graft.ops.OnnxScorer.ifConfigured(env).get, batchSize = 2)
      .select($"path", $"ok", $"scores").as[(String, Boolean, Seq[(String, Double)])]
      .collect().sortBy(_._1)
    assert(out.map(t => (t._1, t._2)) ===
      Seq(("p1", true), ("p2", true), ("p3", false)))
    val Seq(s1, s2) = Seq(out(0)._3, out(1)._3)
    assert(s1.map(_._1) === Seq("a", "b")) // vocab alignment
    // graph semantics: score = mean(tensor) · W — a brighter uniform
    // image scores proportionally higher, and W doubles tag b vs a,
    // regardless of what scale preprocess normalizes pixels to
    assert(math.abs(s1(1)._2 / s1(0)._2 - 2.0) < 1e-5)
    assert(math.abs(s2(1)._2 / s2(0)._2 - 2.0) < 1e-5)
    assert(s2(0)._2 > s1(0)._2 * 2,
      s"brighter image must score higher: $s1 vs $s2")
    assert(out(2)._3 == null) // corrupt row: null scores, not a crash
  }

  test("a second batch with DIFFERENT per-image content keeps rows " +
      "aligned to inputs (batch marshalling, not just batch shape)") {
    val side = 4
    val (model, labels) = OnnxTestModel.writeModel(
      weights = Seq(1.0f, 2.0f), tags = Seq("a", "b"), side = side)
    val scorer = OnnxScorer.ifConfigured(
      Map("GRAFT_ONNX_MODEL" -> model, "GRAFT_ONNX_LABELS" -> labels)).get
    def img(v: Float) = Array.fill(side * side * 3)(v)
    val out = scorer.scoreBatch(Seq(img(0.25f), img(0.75f), img(1.0f)))
    assert(out.map(_.head) === Seq(0.25, 0.75, 1.0))
    assert(out.map(_(1)) === Seq(0.5, 1.5, 2.0))
  }
}
