package ai.onnxruntime;

import java.io.IOException;
import java.util.ArrayList;
import java.util.Collections;
import java.util.List;
import java.util.Map;
import java.util.Set;

/**
 * TEST-ONLY fake; see {@link OnnxValue} for why this package exists.
 *
 * <p>The session PARSES the model file as real protobuf (the ONNX
 * ModelProto wire format) — it is not a canned stub: the input name,
 * the weight initializer, and the op chain all come from the bytes, so
 * a malformed generator, a wrong field tag, or a bad packed-float
 * encoding fails here exactly as it would against the real runtime.
 * Execution supports the one graph family graft's test generator emits
 * (ReduceMean[axes=1,2,3] -&gt; Flatten -&gt; MatMul with a [1,K]
 * initializer): out[b][k] = mean(input_b) * W[k].
 */
public final class OrtSession implements AutoCloseable {
  private final String inputName;
  private final float[] weights;
  /** Declared fixed input dims (dim_param entries are -1 = dynamic). */
  private final long[] inputDims;

  OrtSession(String modelPath) throws IOException {
    byte[] bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(modelPath));
    Pb model = new Pb(bytes, 0, bytes.length);
    Pb graph = null;
    while (model.hasMore()) {
      int tag = model.key();
      if ((tag >>> 3) == 7 && (tag & 7) == 2) graph = model.sub();
      else model.skip(tag & 7);
    }
    if (graph == null) throw new IOException(modelPath + ": no GraphProto (field 7) — not an ONNX model");
    String input = null;
    float[] w = null;
    long[] declaredDims = null;
    List<String> ops = new ArrayList<>();
    while (graph.hasMore()) {
      int tag = graph.key();
      int field = tag >>> 3;
      if (field == 1 && (tag & 7) == 2) { // node: NodeProto
        Pb node = graph.sub();
        while (node.hasMore()) {
          int nt = node.key();
          if ((nt >>> 3) == 4 && (nt & 7) == 2) ops.add(node.string());
          else node.skip(nt & 7);
        }
      } else if (field == 5 && (tag & 7) == 2) { // initializer: TensorProto
        Pb tp = graph.sub();
        List<Long> dims = new ArrayList<>();
        List<Float> floats = new ArrayList<>();
        while (tp.hasMore()) {
          int tt = tp.key();
          int tf = tt >>> 3;
          if (tf == 1 && (tt & 7) == 0) dims.add(tp.varint());
          else if (tf == 1 && (tt & 7) == 2) { // packed dims
            Pb p = tp.sub();
            while (p.hasMore()) dims.add(p.varint());
          } else if (tf == 4 && (tt & 7) == 5) floats.add(tp.fixed32Float());
          else if (tf == 4 && (tt & 7) == 2) { // packed float_data
            Pb p = tp.sub();
            while (p.hasMore()) floats.add(p.fixed32Float());
          } else tp.skip(tt & 7);
        }
        long want = 1;
        for (long d : dims) want *= d;
        if (want != floats.size()) {
          throw new IOException("initializer dims " + dims + " vs " + floats.size() + " floats");
        }
        w = new float[floats.size()];
        for (int i = 0; i < w.length; i++) w[i] = floats.get(i);
      } else if (field == 11 && (tag & 7) == 2) { // input: ValueInfoProto
        Pb vi = graph.sub();
        List<Long> dims = new ArrayList<>();
        while (vi.hasMore()) {
          int vt = vi.key();
          int vf = vt >>> 3;
          if (vf == 1 && (vt & 7) == 2) input = vi.string();
          else if (vf == 2 && (vt & 7) == 2) { // TypeProto
            Pb ty = vi.sub();
            while (ty.hasMore()) {
              int yt = ty.key();
              if ((yt >>> 3) == 1 && (yt & 7) == 2) { // tensor_type
                Pb tt2 = ty.sub();
                while (tt2.hasMore()) {
                  int st = tt2.key();
                  if ((st >>> 3) == 2 && (st & 7) == 2) { // shape
                    Pb sh = tt2.sub();
                    while (sh.hasMore()) {
                      int dt = sh.key();
                      if ((dt >>> 3) == 1 && (dt & 7) == 2) { // Dimension
                        Pb dm = sh.sub();
                        long v = -1; // dim_param → dynamic
                        while (dm.hasMore()) {
                          int mt = dm.key();
                          if ((mt >>> 3) == 1 && (mt & 7) == 0) v = dm.varint();
                          else dm.skip(mt & 7);
                        }
                        dims.add(v);
                      } else sh.skip(dt & 7);
                    }
                  } else tt2.skip(st & 7);
                }
              } else ty.skip(yt & 7);
            }
          } else vi.skip(vt & 7);
        }
        declaredDims = new long[dims.size()];
        for (int i = 0; i < dims.size(); i++) declaredDims[i] = dims.get(i);
      } else graph.skip(tag & 7);
    }
    if (input == null) throw new IOException("graph has no input ValueInfoProto");
    if (w == null) throw new IOException("graph has no weight initializer");
    List<String> expected = java.util.Arrays.asList("ReduceMean", "Flatten", "MatMul");
    if (!ops.equals(expected)) {
      throw new IOException("this fake executes only " + expected + ", model has " + ops);
    }
    this.inputName = input;
    this.weights = w;
    this.inputDims = declaredDims == null ? new long[0] : declaredDims;
  }

  public Set<String> getInputNames() {
    return Collections.singleton(inputName);
  }

  public Result run(Map<String, OnnxTensor> inputs) {
    if (inputs.size() != 1 || !inputs.containsKey(inputName)) {
      throw new IllegalArgumentException(
          "model wants input '" + inputName + "', got " + inputs.keySet());
    }
    OnnxTensor t = inputs.get(inputName);
    if (t.isClosed()) throw new IllegalStateException("input tensor already closed");
    if (t.shape.length != 4) {
      throw new IllegalArgumentException(
          "NHWC rank-4 tensor expected, got rank " + t.shape.length);
    }
    // enforce the graph's declared fixed dims, as the real runtime does
    if (inputDims.length == 4) {
      for (int d = 0; d < 4; d++) {
        if (inputDims[d] >= 0 && inputDims[d] != t.shape[d]) {
          throw new IllegalArgumentException(
              "input dim " + d + ": model declares " + inputDims[d]
                  + ", tensor has " + t.shape[d]);
        }
      }
    }
    int n = (int) t.shape[0];
    int per = (int) (t.shape[1] * t.shape[2] * t.shape[3]);
    float[][] out = new float[n][weights.length];
    for (int b = 0; b < n; b++) {
      double sum = 0;
      for (int i = 0; i < per; i++) sum += t.data.get(b * per + i);
      float mean = (float) (sum / per);
      for (int k = 0; k < weights.length; k++) out[b][k] = mean * weights[k];
    }
    return new Result(new FloatMatrixValue(out));
  }

  @Override
  public void close() {}

  /** Mirrors the real OrtSession.Result's {@code get(int)} accessor. */
  public static final class Result implements AutoCloseable {
    private final OnnxValue value;

    Result(OnnxValue value) {
      this.value = value;
    }

    public OnnxValue get(int index) {
      if (index != 0) throw new IndexOutOfBoundsException("one output, asked for " + index);
      return value;
    }

    @Override
    public void close() {}
  }

  /** Public so {@code getClass().getMethod("getValue").invoke} works. */
  public static final class FloatMatrixValue implements OnnxValue {
    private final float[][] m;

    FloatMatrixValue(float[][] m) {
      this.m = m;
    }

    @Override
    public Object getValue() {
      return m;
    }

    @Override
    public void close() {}
  }

  /** Minimal protobuf wire-format reader (varint / length-delimited / fixed). */
  private static final class Pb {
    private final byte[] b;
    private int pos;
    private final int end;

    Pb(byte[] b, int pos, int end) {
      this.b = b;
      this.pos = pos;
      this.end = end;
    }

    boolean hasMore() {
      return pos < end;
    }

    int key() {
      return (int) varint();
    }

    long varint() {
      long v = 0;
      int shift = 0;
      while (true) {
        byte x = b[pos++];
        v |= (long) (x & 0x7f) << shift;
        if ((x & 0x80) == 0) return v;
        shift += 7;
      }
    }

    float fixed32Float() {
      int bits = (b[pos] & 0xff) | (b[pos + 1] & 0xff) << 8
          | (b[pos + 2] & 0xff) << 16 | (b[pos + 3] & 0xff) << 24;
      pos += 4;
      return Float.intBitsToFloat(bits);
    }

    Pb sub() {
      int len = (int) varint();
      Pb s = new Pb(b, pos, pos + len);
      pos += len;
      return s;
    }

    String string() {
      int len = (int) varint();
      String s = new String(b, pos, len, java.nio.charset.StandardCharsets.UTF_8);
      pos += len;
      return s;
    }

    void skip(int wire) {
      switch (wire) {
        case 0: varint(); break;
        case 1: pos += 8; break;
        case 2: {
          // NOT `pos += (int) varint()`: Java loads the LHS of +=
          // BEFORE evaluating the right side, so varint()'s own
          // advance of pos would be overwritten
          int len = (int) varint();
          pos += len;
          break;
        }
        case 5: pos += 4; break;
        default: throw new IllegalStateException("wire type " + wire);
      }
    }
  }
}
