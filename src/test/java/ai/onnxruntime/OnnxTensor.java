package ai.onnxruntime;

import java.nio.FloatBuffer;

/** TEST-ONLY fake; see {@link OnnxValue} for why this package exists. */
public final class OnnxTensor implements OnnxValue {
  final FloatBuffer data;
  final long[] shape;
  private boolean closed = false;

  private OnnxTensor(FloatBuffer data, long[] shape) {
    this.data = data;
    this.shape = shape;
  }

  public static OnnxTensor createTensor(OrtEnvironment env, FloatBuffer data, long[] shape) {
    if (env == null || data == null || shape == null) {
      throw new IllegalArgumentException("null argument to createTensor");
    }
    long n = 1;
    for (long d : shape) n *= d;
    if (n != data.remaining()) {
      throw new IllegalArgumentException(
          "shape " + java.util.Arrays.toString(shape) + " wants " + n
              + " floats, buffer has " + data.remaining());
    }
    return new OnnxTensor(data, shape.clone());
  }

  boolean isClosed() {
    return closed;
  }

  @Override
  public Object getValue() {
    throw new UnsupportedOperationException("input tensor, not a result");
  }

  @Override
  public void close() {
    closed = true;
  }
}
