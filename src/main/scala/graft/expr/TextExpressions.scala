package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Hashing

/** Executor-side static kernels for the text expressions, referenced by
  * generated Java code (stable static-forwarder paths).
  */
object TextKernels {

  /** Winnowing fingerprint over UTF-8 bytes — same semantics as
    * [[graft.ops.TextAnalysis.fingerprintKernel]] but fed the
    * UTF8String's bytes directly (no java.lang.String round-trip).
    * The short-text guard is on CHARACTER count, exactly like the
    * String kernel — a 10-char CJK document must hash whole, not
    * window over its 30 bytes.
    */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    if (s.numChars() < 16 || bytes.length < 16) return Hashing.hashBytes(bytes)
    var min = Long.MaxValue
    var i = 0
    val end = bytes.length - 16
    while (i <= end) {
      val h = Hashing.xxh64(bytes, i, 16, 0L)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Language-ID kernel returning the struct row directly. */
  def langId(s: UTF8String): InternalRow = {
    val (lang, conf) = graft.ops.TextAnalysis.detectLanguage(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(lang), conf))
  }
}

/** `doc_fingerprint(text) -> long`: min XXH64 over sliding character
  * 16-grams (winnowing representative). A native expression rather than
  * a Scala UDF so the hot path stays inside whole-stage codegen — no
  * encoder round-trip, no String materialization.
  */
case class DocFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
  override def prettyName: String = "doc_fingerprint"
}

/** `lang_id(text) -> struct<lang:string, confidence:double>`: stopword-
  * profile language identification (see
  * [[graft.ops.TextAnalysis.detectLanguage]]). Native expression for the
  * same codegen reasons as [[DocFingerprint]].
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}
