package graft.ops

/** REAL ONNX inference behind [[Tagger.TensorBatchScorer]] — the S10
  * seam (reference: `dataruu/tagger/tagger.py:64-66`, one
  * `InferenceSession.run` per batch; `:21-31` fetches the model, which
  * here arrives as a local file path — no network in the data plane).
  *
  * onnxruntime-java is NOT a build dependency (this container has no
  * ONNX runtime and zero egress), so the binding is REFLECTIVE: when
  * the onnxruntime jar is on the runtime classpath (`spark-submit
  * --jars onnxruntime.jar`) and `GRAFT_ONNX_MODEL` names a model file,
  * [[ifConfigured]] returns a scorer; otherwise the deterministic
  * [[Tagger.StubTensorScorer]] path stays in force and every oracle
  * query is unchanged. Activation is ENV-GATED:
  *
  *   - `GRAFT_ONNX_MODEL`  — path to the .onnx file (required)
  *   - `GRAFT_ONNX_LABELS` — path to the vocabulary CSV
  *     (`tag_id,name,category,count` with header, the selected_tags.csv
  *     shape); required
  *   - `GRAFT_ONNX_INPUT`  — model input name (default: the session's
  *     sole input)
  *
  * Execution shape: the scorer is constructed on the DRIVER (cheap —
  * paths + vocab only), shipped to executors, and opens ONE
  * `OrtSession` lazily per executor JVM (`@transient lazy val`), which
  * [[Tagger.scoreDFBatched]]'s per-partition init then reuses — the
  * Spark analogue of the reference's per-process session. Batches feed
  * as one NHWC float32 tensor (`tagger.py:62` expand_dims generalized
  * past batch=1). */
object OnnxScorer {

  /** Is the onnxruntime jar loadable in this JVM? */
  def runtimeAvailable: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: Throwable => false }

  /** The env-gated factory: None when `GRAFT_ONNX_MODEL` is unset (the
    * sandbox default — callers keep the stub); a configured scorer when
    * set; a CLEAR error when set but unusable (missing file, absent
    * runtime, bad labels) — a user who asked for real inference must
    * never silently get the stub. */
  def ifConfigured(env: Map[String, String] = sys.env)
      : Option[Tagger.TensorBatchScorer] =
    env.get("GRAFT_ONNX_MODEL").map { model =>
      require(new java.io.File(model).isFile,
        s"GRAFT_ONNX_MODEL=$model does not exist")
      require(runtimeAvailable,
        "GRAFT_ONNX_MODEL is set but ai.onnxruntime is not on the " +
          "classpath — add the onnxruntime jar (e.g. spark-submit " +
          "--jars onnxruntime-<ver>.jar)")
      val labels = env.getOrElse("GRAFT_ONNX_LABELS", sys.error(
        "GRAFT_ONNX_MODEL is set but GRAFT_ONNX_LABELS is not — the " +
          "vocabulary CSV (tag_id,name,category,count) is required"))
      new OnnxTensorScorer(model, loadVocab(labels),
        env.get("GRAFT_ONNX_INPUT"))
    }

  /** Vocabulary from the selected_tags.csv shape: column 2 (`name`),
    * header skipped — `tagger.py:32-36`'s pandas read, driver-side. */
  def loadVocab(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().drop(1).filter(_.nonEmpty).zipWithIndex
      .map { case (l, i) =>
        val fields = l.split(",", -1)
        // fail loudly on malformed/quoted rows: a silently mis-parsed
        // name would shift every tag-score alignment downstream
        require(fields.length >= 2 && !fields(0).contains("\"") &&
          !fields(1).startsWith("\""),
          s"$path line ${i + 2} is not plain tag_id,name,... CSV: $l")
        fields(1)
      }.toList
    finally src.close()
  }
}

/** One ONNX session per executor JVM, reflective binding (see
  * [[OnnxScorer]]). Tensors arrive as flat HWC float32 rows from
  * [[ImagePreproc]]; a batch becomes one NHWC tensor. */
final class OnnxTensorScorer(modelPath: String,
    override val vocab: Seq[String], inputNameOpt: Option[String])
    extends Tagger.TensorBatchScorer {

  // reflective handles, resolved once per JVM; everything here is
  // @transient — executors re-resolve from their own classpath
  @transient private lazy val ortEnvCls = Class.forName("ai.onnxruntime.OrtEnvironment")
  @transient private lazy val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
  @transient private lazy val sessionCls = Class.forName("ai.onnxruntime.OrtSession")
  @transient private lazy val ortEnv =
    ortEnvCls.getMethod("getEnvironment").invoke(null)
  @transient private lazy val session = {
    val m = ortEnvCls.getMethod("createSession", classOf[String])
    m.invoke(ortEnv, modelPath)
  }
  @transient private lazy val inputName: String = inputNameOpt.getOrElse {
    val names = sessionCls.getMethod("getInputNames").invoke(session)
      .asInstanceOf[java.util.Set[String]]
    require(names.size == 1, s"model has ${names.size} inputs " +
      s"($names) — set GRAFT_ONNX_INPUT")
    names.iterator().next()
  }

  def scoreBatch(tensors: Seq[Array[Float]]): Seq[Seq[Double]] = {
    if (tensors.isEmpty) return Seq.empty
    val hwc = tensors.head.length
    require(tensors.forall(_.length == hwc),
      "ragged tensor batch: preprocessing must emit fixed-size tensors")
    // assume square HxW x3 (the wd14 preprocessing shape ImagePreproc
    // emits); the model's own input shape validates on run
    val side = math.sqrt(hwc / 3.0).toInt
    require(side * side * 3 == hwc,
      s"tensor length $hwc is not a square HxWx3 image")
    val flat = java.nio.FloatBuffer.allocate(tensors.length * hwc)
    tensors.foreach(flat.put)
    flat.rewind()
    val shape = Array(tensors.length.toLong, side.toLong, side.toLong, 3L)
    val create = tensorCls.getMethod("createTensor",
      ortEnvCls, classOf[java.nio.FloatBuffer], classOf[Array[Long]])
    val tensor = create.invoke(null, ortEnv, flat, shape)
    try {
      val run = sessionCls.getMethod("run", classOf[java.util.Map[_, _]])
      val inputs = java.util.Collections.singletonMap(inputName, tensor)
      val result = run.invoke(session, inputs)
      try {
        val first = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        val value = first.getClass.getMethod("getValue").invoke(first)
          .asInstanceOf[Array[Array[Float]]]
        require(value.length == tensors.length,
          s"model returned ${value.length} rows for ${tensors.length} inputs")
        value.toSeq.map { row =>
          require(row.length == vocab.length,
            s"model emits ${row.length} scores but the vocabulary has " +
              s"${vocab.length} tags — wrong GRAFT_ONNX_LABELS?")
          row.toSeq.map(_.toDouble)
        }
      } finally result.getClass.getMethod("close").invoke(result)
    } finally tensorCls.getMethod("close").invoke(tensor)
  }
}
