package ai.onnxruntime;

/** TEST-ONLY fake; see {@link OnnxValue} for why this package exists. */
public final class OrtEnvironment {
  private static final OrtEnvironment INSTANCE = new OrtEnvironment();

  private OrtEnvironment() {}

  public static OrtEnvironment getEnvironment() {
    return INSTANCE;
  }

  public OrtSession createSession(String modelPath) throws java.io.IOException {
    return new OrtSession(modelPath);
  }
}
