package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{OnnxScorer, Tagger}

/** The env-gated real-ONNX seam ([[graft.ops.OnnxScorer]]): the gating
  * logic is fully testable without the runtime; the inference path
  * itself is an integration case that CANCELS (assume) in this
  * container, where neither onnxruntime nor a model exists. */
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

  test("INTEGRATION (cancels without onnxruntime + GRAFT_ONNX_MODEL): " +
      "a real session scores a batch through the TensorBatchScorer " +
      "contract end-to-end") {
    assume(OnnxScorer.runtimeAvailable,
      "onnxruntime not on the classpath")
    assume(sys.env.contains("GRAFT_ONNX_MODEL"),
      "GRAFT_ONNX_MODEL not set")
    val scorer = OnnxScorer.ifConfigured().get
    val side = 448 // the wd14 input shape ImagePreproc emits
    val tensor = Array.fill(side * side * 3)(0.5f)
    val out = scorer.scoreBatch(Seq(tensor, tensor))
    assert(out.length === 2)
    assert(out.head.length === scorer.vocab.length)
    assert(out.head === out(1)) // deterministic on identical input
    // plugs into the same integration path the stub uses
    assert(scorer.isInstanceOf[Tagger.TensorBatchScorer])
  }
}
