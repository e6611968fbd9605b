package graft

/** Generates a TINY but structurally VALID ONNX model (ModelProto
  * protobuf wire bytes, written by hand — no protobuf library, no
  * network): ir_version 7, opset 13, one graph
  *
  *   images:[N,side,side,3] → ReduceMean(axes=1,2,3) → Flatten →
  *   MatMul(W:[1,K]) → scores:[N,K]
  *
  * i.e. scores[b][k] = mean(images[b]) · W[k] — the wd14 tagger's
  * input/output SHAPE contract (NHWC float32 in, [N, vocab] float32
  * out, `dataruu/tagger/tagger.py:60-66`) at toy size. A real
  * onnxruntime would accept these bytes; the in-repo test fake
  * ([[ai.onnxruntime.OrtSession]]) parses them as real protobuf and
  * executes the same semantics, so OnnxScorerSpec's integration case
  * runs the reflective session path hermetically in this offline
  * container. */
object OnnxTestModel {

  private def varint(x0: Long): Array[Byte] = {
    var x = x0
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += x.toByte
    out.toArray
  }
  private def key(field: Int, wire: Int) = varint((field.toLong << 3) | wire)
  private def ld(field: Int, body: Array[Byte]) =
    key(field, 2) ++ varint(body.length) ++ body
  private def vi(field: Int, v: Long) = key(field, 0) ++ varint(v)
  private def str(field: Int, s: String) = ld(field, s.getBytes("UTF-8"))
  private def packedVarints(vs: Seq[Long]) = vs.toArray.flatMap(varint)
  private def packedFloats(fs: Seq[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * fs.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fs.foreach(bb.putFloat)
    bb.array()
  }

  // AttributeProto: name=1, i=3, ints=8, type=20 (INT=2, INTS=7)
  private def attrInt(name: String, v: Long) =
    str(1, name) ++ vi(3, v) ++ vi(20, 2)
  private def attrInts(name: String, vs: Seq[Long]) =
    str(1, name) ++ ld(8, packedVarints(vs)) ++ vi(20, 7)

  // NodeProto: input=1(rep), output=2(rep), op_type=4, attribute=5(rep)
  private def node(op: String, ins: Seq[String], out: String,
      attrs: Seq[Array[Byte]] = Nil): Array[Byte] =
    ins.toArray.flatMap(str(1, _)) ++ str(2, out) ++ str(4, op) ++
      attrs.toArray.flatMap(ld(5, _))

  // ValueInfoProto: name=1, type=2{tensor_type=1{elem_type=1,
  // shape=2{dim=1(rep){dim_value=1|dim_param=2}}}}
  private def valueInfo(name: String, dims: Seq[Either[String, Long]]) = {
    val shape = dims.toArray.flatMap {
      case Left(param) => ld(1, str(2, param))
      case Right(v)    => ld(1, vi(1, v))
    }
    str(1, name) ++ ld(2, ld(1, vi(1, 1L /* FLOAT */) ++ ld(2, shape)))
  }

  /** The full ModelProto bytes. `weights` is the [1,K] MatMul
    * initializer — K is the vocabulary size. */
  def modelBytes(weights: Seq[Float], side: Int = 448,
      inputName: String = "images"): Array[Byte] = {
    // TensorProto: dims=1(rep int64), data_type=2 (FLOAT=1),
    // float_data=4(packed), name=8
    val w = ld(1, packedVarints(Seq(1L, weights.length.toLong))) ++
      vi(2, 1) ++ ld(4, packedFloats(weights)) ++ str(8, "W")
    val graph =
      ld(1, node("ReduceMean", Seq(inputName), "pooled",
        Seq(attrInts("axes", Seq(1, 2, 3)), attrInt("keepdims", 1)))) ++
      ld(1, node("Flatten", Seq("pooled"), "flat")) ++
      ld(1, node("MatMul", Seq("flat", "W"), "scores")) ++
      str(2, "graft_test_graph") ++
      ld(5, w) ++
      ld(11, valueInfo(inputName, Seq(Left("N"), Right(side.toLong),
        Right(side.toLong), Right(3L)))) ++
      ld(12, valueInfo("scores", Seq(Left("N"), Right(weights.length.toLong))))
    // ModelProto: ir_version=1, producer_name=2, graph=7,
    // opset_import=8{version=2}
    vi(1, 7) ++ str(2, "graft-test") ++ ld(7, graph) ++ ld(8, vi(2, 13))
  }

  /** Write the model plus a matching selected_tags.csv-shaped label
    * file; returns (modelPath, labelsPath). */
  def writeModel(weights: Seq[Float], tags: Seq[String],
      side: Int = 448): (String, String) = {
    require(weights.length == tags.length, "one weight per tag")
    val model = java.nio.file.Files.createTempFile("graft_test", ".onnx")
    model.toFile.deleteOnExit()
    java.nio.file.Files.write(model, modelBytes(weights, side))
    val csv = java.nio.file.Files.createTempFile("graft_tags", ".csv")
    csv.toFile.deleteOnExit()
    java.nio.file.Files.writeString(csv,
      "tag_id,name,category,count\n" +
        tags.zipWithIndex.map { case (t, i) => s"$i,$t,0,10" }.mkString("\n") + "\n")
    (model.toString, csv.toString)
  }
}
