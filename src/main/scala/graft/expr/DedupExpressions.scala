package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side static kernels for the dedup expressions (referenced
  * from generated Java). The String/Array kernels themselves live in
  * [[graft.ops.Dedup]] and stay directly testable.
  */
object DedupKernels {

  def shingleHashes(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(graft.ops.Dedup.shingleHashKernel(s.toString, n))

  /** `ArrayData.toLongArray` silently reads null slots as 0 — reject
    * them loudly instead of treating null as shingle-hash 0. Called only
    * when the input type admits nulls (`containsNull`), so the
    * shingle_hashes-produced hot path never pays the scan. */
  def requireNoNulls(a: ArrayData, fn: String): ArrayData = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"$fn: array element $i is NULL")
      i += 1
    }
    a
  }

  def windowHashes(s: UTF8String, w: Int): ArrayData =
    new GenericArrayData(graft.ops.Dedup.windowHashKernel(s.toString, w))

  def maskSpans(s: UTF8String, positions: ArrayData, w: Int): UTF8String =
    UTF8String.fromString(graft.ops.Dedup.maskSpansKernel(
      s.toString, requireNoNulls(positions, "mask_spans").toIntArray(), w))

  def minhashSig(hashes: ArrayData, k: Int): ArrayData =
    new GenericArrayData(graft.ops.Dedup.minhashKernel(hashes.toLongArray(), k))

  def minhashSigChecked(hashes: ArrayData, k: Int): ArrayData =
    minhashSig(requireNoNulls(hashes, "minhash_signature"), k)

  def simhash(s: UTF8String): Long =
    graft.ops.Dedup.simhashTextKernel(s.toString)

  def jaccardSorted(a: ArrayData, b: ArrayData): Double =
    graft.ops.Dedup.jaccardSortedKernel(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a.toLongArray()),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b.toLongArray()))

  def jaccardSortedChecked(a: ArrayData, b: ArrayData): Double =
    jaccardSorted(requireNoNulls(a, "jaccard_sorted"),
      requireNoNulls(b, "jaccard_sorted"))

  def intersectSorted(a: ArrayData, b: ArrayData): Long =
    graft.ops.Dedup.intersectCountKernel(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a.toLongArray()),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b.toLongArray()))

  def intersectSortedChecked(a: ArrayData, b: ArrayData): Long =
    intersectSorted(requireNoNulls(a, "intersect_count_sorted"),
      requireNoNulls(b, "intersect_count_sorted"))
}

/** `shingle_hashes(text, n) -> array<long>`: sorted distinct XXH64
  * hashes of the word n-gram shingle set — the document's dedup
  * footprint. Native expression so the dedup pipeline's per-document
  * pass stays inside whole-stage codegen (no encoder round-trip for
  * the result array).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 64, "shingle size must be in [1, 64]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    DedupKernels.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DedupKernels.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** `window_hashes(text, w) -> array<long>`: XXH64 of every sliding
  * `w`-code-point character window, index = start position — the
  * candidate generator for exact duplicate-substring detection
  * ([[graft.ops.Dedup.duplicateSpans]]). Native expression so the
  * per-document window pass stays inside whole-stage codegen.
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 2 && w <= 1024, "window size must be in [2, 1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    DedupKernels.windowHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DedupKernels.windowHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
  override def prettyName: String = "window_hashes"
}

/** `mask_spans(text, positions, w) -> string`: remove the code points
  * covered by the union of `w`-code-point windows at the given 0-based
  * positions — the span-removal half of exact duplicate-substring dedup
  * ([[graft.ops.Dedup.maskDuplicateSpans]]).
  */
case class MaskSpans(left: Expression, right: Expression, w: Int)
  extends BinaryExpression {
  require(w >= 2 && w <= 1024, "window size must be in [2, 1024]")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"mask_spans expects (STRING, ARRAY<INT>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(text: Any, positions: Any): Any =
    DedupKernels.maskSpans(
      text.asInstanceOf[UTF8String], positions.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.expr.DedupKernels.maskSpans($t, $p, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaskSpans =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "mask_spans"
}

/** `minhash_signature(hashes, k) -> array<long>`: Kirsch-Mitzenmacher
  * MinHash signature (h1 + j*h2) from a shingle-hash set.
  */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 4096, "signature size must be in [1, 4096]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects ARRAY<BIGINT>, got ${other.sql}")
  }

  private lazy val mayHaveNullElements =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      DedupKernels.minhashSigChecked(input.asInstanceOf[ArrayData], k)
    else DedupKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mayHaveNullElements) "minhashSigChecked" else "minhashSig"
    defineCodeGen(ctx, ev, c => s"graft.expr.DedupKernels.$fn($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** `simhash64(text) -> long`: 64-bit SimHash over whitespace tokens,
  * single-pass tokenizer (see `Dedup.simhashTextKernel`).
  */
case class SimhashText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    DedupKernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DedupKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** `jaccard_sorted(a, b) -> double`: exact Jaccard similarity of two
  * SORTED DISTINCT long arrays (O(m+n) merge).
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  private lazy val mayHaveNullElements =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (mayHaveNullElements)
      DedupKernels.jaccardSortedChecked(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else DedupKernels.jaccardSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mayHaveNullElements) "jaccardSortedChecked" else "jaccardSorted"
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.DedupKernels.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sorted"
}

/** `intersect_count_sorted(a, b) -> bigint`: intersection size of two
  * sorted distinct long arrays (O(m+n) merge) — the containment-score
  * numerator of the decontamination screen
  * ([[graft.ops.Dedup.contamination]]): containment(B in A) =
  * intersect / |B|.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted expects two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  private lazy val mayHaveNullElements =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (mayHaveNullElements)
      DedupKernels.intersectSortedChecked(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else DedupKernels.intersectSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mayHaveNullElements) "intersectSortedChecked" else "intersectSorted"
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.DedupKernels.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "intersect_count_sorted"
}
