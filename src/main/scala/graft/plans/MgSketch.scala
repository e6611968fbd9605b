package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Weighted Misra–Gries frequency sketch as a `TypedImperativeAggregate`:
  * at most `k` counters survive in the buffer; any term whose true weight
  * exceeds W/(k+1) (W = total stream weight) is guaranteed present, and
  * every surviving estimate undercounts by at most W/(k+1). Both
  * invariants are property-tested in `HeavyHittersSpec`.
  *
  * Update: add the weight; on overflow past k entries subtract the
  * current minimum counter from everything and drop the zeros (the
  * weighted generalization of MG's decrement-all). Merge: pointwise sum,
  * then subtract the (k+1)-st largest value — the mergeable-summaries
  * rule (Agarwal et al., PODS'12), which preserves the error bound under
  * Spark's arbitrary partial/final merge tree.
  *
  * 100 TB shape: the shuffle carries ONE ≤k-entry buffer per partition —
  * candidate generation over any stream size moves O(k × partitions)
  * bytes, never the stream. Pair with an exact recount of the ≤k
  * candidates ([[graft.ops.HeavyHitters]]) for exact-answer semantics.
  */
case class MgSketch(
    termExpr: Expression,
    weightExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"sketch capacity must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(termExpr, weightExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (termExpr.dataType == StringType && weightExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, BIGINT), " +
        s"got (${termExpr.dataType}, ${weightExpr.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType))))

  override def prettyName: String = "graft_mg_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Subtract `d` from every counter, dropping non-positives. */
  private def decrement(buf: mutable.HashMap[String, Long], d: Long): Unit = {
    buf.filterInPlace((_, c) => c > d)
    buf.mapValuesInPlace((_, c) => c - d)
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val t = termExpr.eval(input)
    val w = weightExpr.eval(input)
    if (t != null && w != null && w.asInstanceOf[Long] > 0L) {
      val key = t.asInstanceOf[UTF8String].toString
      buf.update(key, buf.getOrElse(key, 0L) + w.asInstanceOf[Long])
      if (buf.size > k) decrement(buf, buf.valuesIterator.min)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      // (k+1)-st largest counter = the largest d making ≤ k survivors
      val d = buf.valuesIterator.toArray.sortBy(-_).apply(k)
      decrement(buf, d)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val out = buf.toSeq.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(out.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toArray[Any])
  }

  // int-length-prefixed UTF-8, not writeUTF: a crawl term can exceed
  // writeUTF's 64 KB modified-UTF-8 limit (base64 blob, minified JS) and
  // must serialize, not kill the task
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgSketch =
    copy(termExpr = newChildren(0), weightExpr = newChildren(1))
}

object MgSketch {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column-API entry: `sketch(col("term"), lit(1L), 800)`. */
  def sketch(term: Column, weight: Column, k: Int): Column =
    GraftSqlBridge.column(MgSketch(
      GraftSqlBridge.expression(term),
      GraftSqlBridge.expression(weight), k).toAggregateExpression())
}
