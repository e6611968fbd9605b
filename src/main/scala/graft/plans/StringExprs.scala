package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * text-cleaning step that belongs BEFORE any hashing/dedup operator
  * (canonically-equivalent strings, e.g. `é` vs `e`+U+0301, must hash
  * identically or every dedup signature silently misses them). Spark has
  * no builtin normalizer; a Scala UDF would box every row and block
  * codegen, so this is the `doGenCode` spelling: one static call inside
  * the generated loop, with an `isNormalized` fast path that returns the
  * input buffer untouched for the (overwhelmingly common) already-NFC
  * case. DuckDB's `nfc_normalize` computes the identical form (both
  * implement UAX #15), which is what makes q111 oracle-checkable. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got $t")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc_normalize"

  /** Shared by eval and the generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(v: Any): Any =
    normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
      s"${ev.value} = $ref.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
