package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * text-canonicalization step a multilingual training corpus needs
  * before hashing: the same visible string can arrive precomposed
  * (U+00E9) or decomposed (U+0065 U+0301), and every downstream
  * exact-dedup hash, shingle, and fingerprint treats those as
  * different documents unless the corpus is normalized first.
  *
  * Spark has no built-in normalizer, and the house rule is a native
  * `Expression` over a UDF: the generated code is one static
  * `java.text.Normalizer` call (in-JDK, no dependency), kept inside
  * whole-stage codegen with no row-at-a-time serde boundary. The
  * common all-ASCII fast path is short-circuited with
  * `Normalizer.isNormalized` (an O(n) scan, no allocation) so the
  * dominant case never copies the string.
  *
  * DuckDB's `nfc_normalize` implements the same Unicode algorithm, so
  * the operator is oracle-checkable byte-for-byte (md5 over the
  * normalized text).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${other.sql}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    NfcNormalize.normalize(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Shared by eval and codegen: normalize-if-needed, allocation-free
    * when the input is already NFC (ASCII always is).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  import org.apache.spark.sql.GraftBridge
  /** Column-level entry point: nfc_normalize(text). */
  def nfc(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
