package ai.onnxruntime;

/**
 * TEST-ONLY fake of the public onnxruntime-java API surface (the
 * classes {@code graft.ops.OnnxTensorScorer} binds reflectively). The
 * real runtime cannot exist in this offline container, so without this
 * the reflective session path would never execute anywhere; with it,
 * OnnxScorerSpec's integration case runs the exact Class.forName /
 * getMethod / invoke chain against the same method signatures the real
 * jar exposes. Test classpath only — never ships with the library.
 */
public interface OnnxValue extends AutoCloseable {
  Object getValue();

  @Override
  void close();
}
