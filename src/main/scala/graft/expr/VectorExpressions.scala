package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Executor-side static kernels for the ANN vector expressions. The
  * hyperplane family is the one defined in [[graft.ops.Similarity]]
  * (components derived on the fly from mix64(plane, dim), cached per
  * executor) — these kernels read the vector straight out of the
  * Tungsten array instead of round-tripping a `Seq[Double]` through an
  * encoder, which was the slowest serialization path in the ANN plans.
  * Bit-identical to the driver-side Seq kernels (same plane vectors,
  * same ascending-dimension summation order), so driver-computed probe
  * buckets always match executor-computed signatures.
  */
object VectorKernels {

  // `isFloat` selects the Tungsten accessor for ARRAY<FLOAT> vs
  // ARRAY<DOUBLE> inputs — the expressions take float embeddings
  // directly, so no cast-transform (a CodegenFallback higher-order
  // function that would break the whole-stage span AND materialize a
  // second array per row) is ever needed upstream. Float values widen
  // exactly, so results are bit-identical to the double path fed the
  // same values.
  @inline private def elem(vec: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)

  @inline private def dot(vec: ArrayData, plane: Array[Double], isFloat: Boolean): Double = {
    var acc = 0.0
    var d = 0
    val n = vec.numElements()
    while (d < n) { acc += elem(vec, d, isFloat) * plane(d); d += 1 }
    acc
  }

  /** nPlanes-bit hyperplane signature — mirror of
    * [[graft.ops.Similarity.signatureKernel]]. */
  def lshSignature(vec: ArrayData, nPlanes: Int, isFloat: Boolean): Long = {
    val dim = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      if (dot(vec, graft.ops.Similarity.planeVector(p, dim), isFloat) >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def lshSignatureChecked(vec: ArrayData, nPlanes: Int, isFloat: Boolean): Long =
    lshSignature(DedupKernels.requireNoNulls(vec, "lsh_signature"), nPlanes, isFloat)

  /** One `bits`-bit signature per table from independent plane families —
    * mirror of [[graft.ops.Similarity.tableSignature]] over all tables.
    */
  def tableSignatures(vec: ArrayData, tables: Int, bits: Int, isFloat: Boolean): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        if (dot(vec, graft.ops.Similarity.planeVector(t * 131 + p, dim), isFloat) >= 0)
          sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  def tableSignaturesChecked(vec: ArrayData, tables: Int, bits: Int, isFloat: Boolean): ArrayData =
    tableSignatures(DedupKernels.requireNoNulls(vec, "lsh_table_signatures"), tables, bits, isFloat)

  /** Index of the nearest centroid by squared L2 (ties -> lowest index) —
    * mirror of [[graft.ops.Similarity.nearestCentroid]]. */
  def nearestCentroid(vec: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(vec.numElements(), cent.length)
      while (i < n) { val x = elem(vec, i, isFloat) - cent(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearestCentroidChecked(vec: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Int =
    nearestCentroid(DedupKernels.requireNoNulls(vec, "vec_nearest_centroid"), centroids, isFloat)
}

/** Shared type check: the vector operand must be ARRAY<DOUBLE> or
  * ARRAY<FLOAT> (raw embedding columns probe directly — no cast
  * transform, no second array materialization).
  */
private[expr] trait VectorArgExpression { self: UnaryExpression =>
  protected def fnName: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fnName expects ARRAY<DOUBLE> or ARRAY<FLOAT>, got ${other.sql}")
  }

  protected lazy val mayHaveNullElements: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  protected lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** `lsh_signature(vec, nPlanes) -> long`: random-hyperplane LSH signature
  * (sign of dot with deterministic pseudo-random planes). Native codegen
  * expression so bucketing stays inside whole-stage codegen — no
  * Seq[Double] encoder round-trip per row.
  */
case class LshSignature(child: Expression, nPlanes: Int)
  extends UnaryExpression with VectorArgExpression {
  require(nPlanes >= 1 && nPlanes <= 63, "nPlanes must be in [1, 63]")

  override protected def fnName: String = "lsh_signature"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.lshSignatureChecked(input.asInstanceOf[ArrayData], nPlanes, isFloat)
    else VectorKernels.lshSignature(input.asInstanceOf[ArrayData], nPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mayHaveNullElements) "lshSignatureChecked" else "lshSignature"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $nPlanes, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
  override def prettyName: String = "lsh_signature"
}

/** `lsh_table_signatures(vec, tables, bits) -> array<long>`: one
  * independent `bits`-bit hyperplane signature per LSH table (the
  * candidate generator of [[graft.ops.Dedup.embeddingPairs]]).
  */
case class LshTableSignatures(child: Expression, tables: Int, bits: Int)
  extends UnaryExpression with VectorArgExpression {
  require(tables >= 1 && tables <= 1024, "tables must be in [1, 1024]")
  require(bits >= 1 && bits <= 24, "bits must be in [1, 24]")

  override protected def fnName: String = "lsh_table_signatures"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.tableSignaturesChecked(input.asInstanceOf[ArrayData], tables, bits, isFloat)
    else VectorKernels.tableSignatures(input.asInstanceOf[ArrayData], tables, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mayHaveNullElements) "tableSignaturesChecked" else "tableSignatures"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $tables, $bits, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshTableSignatures =
    copy(child = newChild)
  override def prettyName: String = "lsh_table_signatures"
}

/** `vec_nearest_centroid(vec) -> int`: index of the nearest centroid by
  * squared L2 — the IVF coarse-quantizer assignment. The centroid matrix
  * (k x dim doubles, small by IVF design) rides the expression as a
  * task-binary reference object, not a per-row closure.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression with VectorArgExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")

  override protected def fnName: String = "vec_nearest_centroid"
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.nearestCentroidChecked(input.asInstanceOf[ArrayData], centroids, isFloat)
    else VectorKernels.nearestCentroid(input.asInstanceOf[ArrayData], centroids, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val fn = if (mayHaveNullElements) "nearestCentroidChecked" else "nearestCentroid"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $centRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "vec_nearest_centroid"
}

/** `mix64(x) -> long`: the abloom finalizer mix as a standalone codegen
  * expression — deterministic per-row pseudo-randomness (sampling,
  * seeding, synthetic workloads) without a UDF.
  */
case class Mix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 expects BIGINT, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    graft.core.Hashing.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Hashing.mix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
  override def prettyName: String = "mix64"
}
