package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The exact top-k word-frequency aggregate as a
  * `TypedImperativeAggregate` — the imperative-buffer aggregate surface
  * (raw JVM object buffer + custom binary serialization), complementing
  * the typed `Aggregator` spelling in [[graft.ops.Aggregators.TopKWords]].
  *
  * vs the Aggregator: the buffer is a plain mutable HashMap that only
  * serializes at shuffle boundaries (length-prefixed UTF-8 + varint-free
  * longs), where the Aggregator round-trips its buffer through an Encoder.
  * Same semantics bit for bit: counts summed per word, result = top k by
  * (cnt desc, word asc) as array<struct<word, cnt>> — equivalence proven
  * in `TopKWordsAggSpec`.
  *
  * Scale contract (same as the Aggregator): feed PRE-AGGREGATED
  * (word, cnt) rows so the buffer holds one entry per distinct word of
  * the group, with Spark's partial/final split merging maps across
  * partitions.
  */
case class TopKWordsAgg(
    wordExpr: Expression,
    cntExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(wordExpr, cntExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (wordExpr.dataType == StringType && cntExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, BIGINT), " +
        s"got (${wordExpr.dataType}, ${cntExpr.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("cnt", LongType))))

  override def prettyName: String = "graft_topk_words"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val w = wordExpr.eval(input)
    val c = cntExpr.eval(input)
    if (w != null && c != null) {
      val key = w.asInstanceOf[UTF8String].toString
      buf.update(key, buf.getOrElse(key, 0L) + c.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (w, c) => buf.update(w, buf.getOrElse(w, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
    new GenericArrayData(top.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKWordsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKWordsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKWordsAgg =
    copy(wordExpr = newChildren(0), cntExpr = newChildren(1))
}

object TopKWordsAgg {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column-API entry: `topK(col("word"), col("cnt"), 10)`. */
  def topK(word: Column, cnt: Column, k: Int): Column =
    GraftSqlBridge.column(TopKWordsAgg(
      GraftSqlBridge.expression(word),
      GraftSqlBridge.expression(cnt), k).toAggregateExpression())
}
