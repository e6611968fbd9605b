package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact integer Gram/covariance moments of a quantized vector column in
  * ONE pass — the distributed half of PCA ([[graft.ops.Pca]]): the
  * d-dimensional second-moment matrix is tiny (d(d+1)/2 longs) while the
  * corpus is not, so each task accumulates a local moment buffer and only
  * the buffers cross the exchange — the classic "sufficient statistics,
  * not data" shape (same reasoning as [[MgSketch]]: per-task state
  * replaces a corpus-wide shuffle).
  *
  * Buffer layout (length 1 + d + d(d+1)/2, all longs):
  * `[n, s_0..s_{d-1}, s_00, s_01, .., s_0(d-1), s_11, ..]` — count,
  * per-dimension sums, and the upper-triangle sums of products. The
  * upper-triangle index of (i ≤ j) is `i·d − i·(i−1)/2 + (j−i)`.
  *
  * Inputs are QUANTIZED longs ([[graft.ops.Similarity.quantize]]), so all
  * sums are integer-exact and partition-order-free — the covariance the
  * driver derives is bit-identical on every run, which float accumulation
  * cannot promise. Overflow headroom: |q| ≤ Q requires
  * n·Q² < 2^63 (Q=1000 ⇒ n < 9.2e12 rows) — beyond that, lower the
  * quantization scale. Null vectors and null elements are skipped
  * (contract: a malformed row must not poison the corpus statistics).
  */
case class GramAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d > 0, s"dimension must be positive, got $d")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram"

  private val len = 1 + d + d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var ok = arr.numElements() == d
      var c = 0
      while (ok && c < d) { ok = !arr.isNullAt(c); c += 1 }
      if (ok) {
        buf(0) += 1L
        var i = 0
        while (i < d) {
          val qi = arr.getLong(i)
          buf(1 + i) += qi
          var j = i
          var idx = 1 + d + i * d - i * (i - 1) / 2
          while (j < d) {
            buf(idx) += qi * arr.getLong(j)
            j += 1; idx += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](len * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < len) { bb.putLong(buf(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren(0))
}

object GramAgg {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column-API entry: `gram(col("qv"), 64)` → `array<bigint>` of the
    * [n, sums, upper-triangle products] moment buffer. */
  def gram(qv: Column, d: Int): Column =
    GraftSqlBridge.column(GramAgg(
      GraftSqlBridge.expression(qv), d).toAggregateExpression())

  /** Upper-triangle buffer index of pair (i ≤ j) within the moments
    * array (0-based, AFTER the 1+d header). */
  def triIndex(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
}
