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

  /** The `nprobe` centroid indices nearest to `vec` by squared L2,
    * ascending distance with ties broken by lower index — the batched
    * IVF probe-list assignment (one selection pass, O(k * nprobe)).
    * Mirrors [[graft.ops.Similarity.probeLists]] exactly (same summation
    * order), so driver- and executor-computed probe lists agree.
    */
  def probeLists(vec: ArrayData, centroids: Array[Array[Double]], nprobe: Int,
      isFloat: Boolean): ArrayData = {
    val k = centroids.length
    val m = math.min(nprobe, k)
    val bestIdx = new Array[Int](m)
    val bestD = new Array[Double](m)
    var size = 0
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(vec.numElements(), cent.length)
      while (i < n) { val x = elem(vec, i, isFloat) - cent(i); d += x * x; i += 1 }
      // insertion sort into the bounded (distance asc, index asc) list;
      // strict < keeps the earlier (lower) index on distance ties
      if (size < m || d < bestD(size - 1)) {
        var pos = if (size < m) size else size - 1
        while (pos > 0 && d < bestD(pos - 1)) {
          bestD(pos) = bestD(pos - 1); bestIdx(pos) = bestIdx(pos - 1); pos -= 1
        }
        bestD(pos) = d
        bestIdx(pos) = c
        if (size < m) size += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestIdx, size))
  }

  def probeListsChecked(vec: ArrayData, centroids: Array[Array[Double]], nprobe: Int,
      isFloat: Boolean): ArrayData =
    probeLists(DedupKernels.requireNoNulls(vec, "vec_probe_lists"), centroids, nprobe, isFloat)

  /** Int8 vector quantization: `[8-byte BE double scale][n int8 codes]`,
    * scale = maxAbs / 127, code_i = clamp(floor(x_i / scale + 0.5), -127,
    * 127); an all-zero vector encodes scale 0 with zero codes. Every
    * reduction is a MAX (exact comparisons — no float summation), and
    * every per-element op (widen, divide, +0.5, floor, clamp) is a single
    * correctly-rounded IEEE operation, so any engine reproduces the codes
    * bit-for-bit — the cross-engine-oracle property the harness exploits.
    * 4x (vs float) / 8x (vs double) memory and scan-bytes for ANN serving.
    */
  def quantize8(vec: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(elem(vec, i, isFloat))
      if (a.isNaN || a.isInfinite)
        throw new IllegalArgumentException(
          s"vec8_quantize: non-finite element at index $i")
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    // subnormal corner: 0 < maxAbs < ~6.3e-322 underflows scale to 0 and
    // would silently zero every code — reject loudly instead
    if (scale == 0.0 && maxAbs > 0.0)
      throw new IllegalArgumentException(
        "vec8_quantize: vector magnitude underflows the int8 scale")
    val out = new Array[Byte](8 + n)
    val bits = java.lang.Double.doubleToLongBits(scale)
    var o = 0
    while (o < 8) { out(o) = (bits >>> (56 - 8 * o)).toByte; o += 1 }
    i = 0
    while (i < n) {
      out(8 + i) =
        if (scale == 0.0) 0
        else {
          val q = math.floor(elem(vec, i, isFloat) / scale + 0.5).toLong
          math.max(-127L, math.min(127L, q)).toByte
        }
      i += 1
    }
    out
  }

  def quantize8Checked(vec: ArrayData, isFloat: Boolean): Array[Byte] =
    quantize8(DedupKernels.requireNoNulls(vec, "vec8_quantize"), isFloat)

  /** L2 normalization: x / |x| (ascending-dimension norm accumulation;
    * an all-zero vector stays all-zero). Scaled copies normalize to
    * BIT-IDENTICAL vectors: (c*x_i) / sqrt(sum (c*x_i)^2) for c a power
    * of two is exactly x_i / |x| under IEEE (exact scaling, exact sqrt
    * of 4^k * s, correctly-rounded division of equal reals) — the
    * property that pins semantic dedup's planted-duplicate co-clustering.
    */
  def normalize(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = elem(vec, i, isFloat); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    if (norm > 0.0) {
      i = 0
      while (i < n) { out(i) = elem(vec, i, isFloat) / norm; i += 1 }
    }
    new GenericArrayData(out)
  }

  def normalizeChecked(vec: ArrayData, isFloat: Boolean): ArrayData =
    normalize(DedupKernels.requireNoNulls(vec, "vec_normalize"), isFloat)

  // ---- Product quantization (PQ) ----------------------------------
  //
  // Codebooks are Array[subspace][code][subdim] doubles, trained by
  // [[graft.ops.Similarity.pqTrain]]. A vector of dimension D splits
  // into m = codebooks.length contiguous subvectors; each subvector is
  // replaced by the index of its nearest codeword (squared L2, ties to
  // the lower index). The encoded form is ONE BYTE per subspace — for a
  // 64-dim float embedding with m=8 that is 8 bytes against 256 raw
  // (32x), the storage lever that makes a 100 TB embedding table
  // serveable from memory-sized inverted lists. Scoring uses ADC
  // (asymmetric distance computation): the query stays full-precision,
  // a per-query lookup table of sub-dot-products is built once, and
  // each candidate costs m table lookups instead of D multiplies.

  private def subspaceOffsets(codebooks: Array[Array[Array[Double]]]): Array[Int] = {
    val offs = new Array[Int](codebooks.length + 1)
    var s = 0
    while (s < codebooks.length) {
      offs(s + 1) = offs(s) + codebooks(s)(0).length; s += 1
    }
    offs
  }

  /** PQ code assignment: the nearest-codeword index per subspace
    * (squared L2, ties to the lower index), as an int array — the
    * training-loop form (groupable). Summation is ascending-dimension,
    * mirroring [[nearestCentroid]].
    */
  def pqAssign(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = codebooks.length
    val offs = subspaceOffsets(codebooks)
    if (vec.numElements() != offs(m))
      throw new IllegalArgumentException(
        s"pq_assign: vector dimension ${vec.numElements()} != codebook total ${offs(m)}")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = offs(s)
      val subDim = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = elem(vec, base + i, isFloat) - cw(i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  def pqAssignChecked(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData =
    pqAssign(DedupKernels.requireNoNulls(vec, "pq_assign"), codebooks, isFloat)

  /** PQ encoding: the [[pqAssign]] codes packed one UNSIGNED byte per
    * subspace (codebooks are capped at 256 codewords).
    */
  def pqEncode(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): Array[Byte] = {
    val codes = pqAssign(vec, codebooks, isFloat)
    val out = new Array[Byte](codes.numElements())
    var s = 0
    while (s < out.length) { out(s) = (codes.getInt(s) & 0xff).toByte; s += 1 }
    out
  }

  def pqEncodeChecked(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): Array[Byte] =
    pqEncode(DedupKernels.requireNoNulls(vec, "pq_encode"), codebooks, isFloat)

  /** Per-query ADC lookup table: LUT[s * ncodes + c] = dot(query
    * subvector s, codeword c of subspace s), ascending-dimension
    * summation. ncodes is the (uniform) codebook size.
    */
  def pqLut(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = codebooks.length
    val offs = subspaceOffsets(codebooks)
    if (vec.numElements() != offs(m))
      throw new IllegalArgumentException(
        s"pq_lut: vector dimension ${vec.numElements()} != codebook total ${offs(m)}")
    val ncodes = codebooks(0).length
    val out = new Array[Double](m * ncodes)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = offs(s)
      val subDim = cb(0).length
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) { acc += elem(vec, base + i, isFloat) * cw(i); i += 1 }
        out(s * ncodes + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  def pqLutChecked(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData =
    pqLut(DedupKernels.requireNoNulls(vec, "pq_lut"), codebooks, isFloat)

  /** ADC score of a PQ-coded candidate against a query LUT: m lookups,
    * summed ascending-subspace — approximates dot(query, candidate).
    */
  def pqAdc(codes: Array[Byte], lut: ArrayData, ncodes: Int): Double = {
    if (lut.numElements() != codes.length * ncodes)
      throw new IllegalArgumentException(
        s"pq_adc_score: LUT length ${lut.numElements()} != " +
          s"${codes.length} subspaces x $ncodes codes")
    var acc = 0.0
    var s = 0
    while (s < codes.length) {
      acc += lut.getDouble(s * ncodes + (codes(s) & 0xff)); s += 1
    }
    acc
  }

  /** Exact integer dot product of two quantized vectors. */
  def dot8(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length < 8 || b.length < 8)
      throw new IllegalArgumentException("vec8_dot: not a vec8 blob (too short)")
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vec8_dot: dimension mismatch (${a.length - 8} vs ${b.length - 8})")
    var acc = 0L
    var i = 8
    while (i < a.length) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }

  /** The quantization scale stored in a vec8 blob. */
  def scale8(a: Array[Byte]): Double = {
    if (a.length < 8)
      throw new IllegalArgumentException("vec8_scale: not a vec8 blob (too short)")
    var bits = 0L
    var i = 0
    while (i < 8) { bits = (bits << 8) | (a(i) & 0xffL); i += 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Cosine similarity, replicating EXACTLY the higher-order-function
    * formulation it replaced ([[graft.ops.Dedup.cosine]]'s former
    * zip_with/aggregate chain — a CodegenFallback stack that broke the
    * whole-stage span at every re-rank and pair-verify site):
    *
    *  - dot and both norms use sequential ascending-index summation
    *    (`((0 + x0) + x1) + ...`) — bit-identical to `aggregate`'s fold;
    *  - either norm exactly 0.0 -> 0.0 (checked BEFORE the null cases,
    *    matching the three-valued `when(na === 0 || nb === 0, ...)`,
    *    where `null OR true` is true);
    *  - a null element in either array, or a length mismatch, -> null
    *    (zip_with pads with nulls; null poisons the aggregate fold);
    *  - result = dot / (na * nb) with the product formed first.
    *
    * Boxed return so codegen can express the null-on-non-null-inputs
    * cases.
    */
  def cosineBoxed(
      a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val an = a.numElements()
    val bn = b.numElements()
    var aHasNull = false
    var bHasNull = false
    var sa = 0.0
    var i = 0
    while (i < an) {
      if (a.isNullAt(i)) aHasNull = true
      else { val x = elem(a, i, aFloat); sa += x * x }
      i += 1
    }
    var sb = 0.0
    i = 0
    while (i < bn) {
      if (b.isNullAt(i)) bHasNull = true
      else { val x = elem(b, i, bFloat); sb += x * x }
      i += 1
    }
    val na = math.sqrt(sa)
    val nb = math.sqrt(sb)
    if ((!aHasNull && na == 0.0) || (!bHasNull && nb == 0.0))
      return java.lang.Double.valueOf(0.0)
    if (aHasNull || bHasNull || an != bn) return null
    var dot = 0.0
    i = 0
    while (i < an) { dot += elem(a, i, aFloat) * elem(b, i, bFloat); i += 1 }
    java.lang.Double.valueOf(dot / (na * nb))
  }
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

/** `vec_probe_lists(vec, nprobe) -> array<int>`: the nprobe nearest
  * centroid indices (ascending distance, ties to the lower index) — the
  * per-query probe-list assignment for BATCHED IVF serving. Like
  * [[NearestCentroid]], the centroid matrix rides as a reference object.
  */
case class ProbeLists(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
  extends UnaryExpression with VectorArgExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nprobe >= 1, "nprobe must be >= 1")

  override protected def fnName: String = "vec_probe_lists"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.probeListsChecked(input.asInstanceOf[ArrayData], centroids, nprobe, isFloat)
    else VectorKernels.probeLists(input.asInstanceOf[ArrayData], centroids, nprobe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val fn = if (mayHaveNullElements) "probeListsChecked" else "probeLists"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $centRef, $nprobe, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeLists =
    copy(child = newChild)
  override def prettyName: String = "vec_probe_lists"
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

/** `vec8_quantize(vec) -> binary`: int8 quantization of a float/double
  * embedding — `[8-byte BE double scale][n int8 codes]`, scale =
  * maxAbs/127. 4x/8x smaller than the float/double array; codes are
  * engine-reproducible bit-for-bit (max-based scale — no float
  * summation), so a SQL engine can recompute identical blobs.
  */
case class Vec8Quantize(child: Expression)
  extends UnaryExpression with VectorArgExpression {

  override protected def fnName: String = "vec8_quantize"
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.quantize8Checked(input.asInstanceOf[ArrayData], isFloat)
    else VectorKernels.quantize8(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mayHaveNullElements) "quantize8Checked" else "quantize8"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Vec8Quantize =
    copy(child = newChild)
  override def prettyName: String = "vec8_quantize"
}

/** `vec8_dot(a, b) -> bigint`: EXACT integer dot product of two
  * quantized vectors — the cheap ranking kernel of the quantized ANN
  * path (`(vec8_scale(a) * vec8_scale(b)) * vec8_dot(a, b)` approximates
  * the true dot product).
  */
case class Vec8Dot(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec8_dot expects (binary, binary), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorKernels.dot8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Vec8Dot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec8_dot"
}

/** `vec_cosine(a, b) -> double`: cosine similarity of two float/double
  * arrays as ONE whole-stage-codegen kernel — the hot scoring expression
  * of every exact re-rank and pair-verify path. Semantics are an exact
  * replica of the zip_with/transform/aggregate chain it replaced (see
  * [[VectorKernels.cosineBoxed]]); accepting ARRAY<FLOAT> natively also
  * removes the upstream cast-transform (a CodegenFallback HOF that broke
  * the span AND materialized a second array per row — round-4 lesson).
  */
case class VecCosine(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_cosine expects two ARRAY<DOUBLE>/ARRAY<FLOAT> operands, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  private lazy val aFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val bFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineBoxed(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cosBoxed")
      s"""
         |java.lang.Double $boxed =
         |  graft.expr.VectorKernels.cosineBoxed($a, $b, $aFloat, $bFloat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
}

/** `vec_normalize(vec) -> array<double>`: x / |x| (zeros stay zeros) —
  * the cosine-world projection for scale-invariant clustering.
  */
case class VecNormalize(child: Expression)
  extends UnaryExpression with VectorArgExpression {

  override protected def fnName: String = "vec_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.normalizeChecked(input.asInstanceOf[ArrayData], isFloat)
    else VectorKernels.normalize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mayHaveNullElements) "normalizeChecked" else "normalize"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNormalize =
    copy(child = newChild)
  override def prettyName: String = "vec_normalize"
}

/** Shared shape checks for the PQ expressions' codebook constant. */
private[expr] object PqCodebooks {
  def validate(codebooks: Array[Array[Array[Double]]], fn: String): Unit = {
    require(codebooks.nonEmpty, s"$fn: codebooks must be non-empty")
    val ncodes = codebooks(0).length
    require(ncodes >= 1 && ncodes <= 256,
      s"$fn: codebook size must be in [1, 256] (one byte per code), got $ncodes")
    require(codebooks.forall(_.length == ncodes),
      s"$fn: all subspaces must have the same codebook size")
    require(codebooks.forall(cb => cb.nonEmpty && cb.forall(_.length == cb(0).length)),
      s"$fn: codewords within a subspace must share one dimension")
  }
}

/** `pq_assign(vec) -> array<int>`: nearest-codeword index per subspace —
  * the PQ training-loop assignment (groupable by (subspace, code)). The
  * codebook tensor rides the expression as a task-binary reference
  * object, like [[NearestCentroid]]'s centroids.
  */
case class PqAssign(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with VectorArgExpression {
  PqCodebooks.validate(codebooks, "pq_assign")

  override protected def fnName: String = "pq_assign"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.pqAssignChecked(input.asInstanceOf[ArrayData], codebooks, isFloat)
    else VectorKernels.pqAssign(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val fn = if (mayHaveNullElements) "pqAssignChecked" else "pqAssign"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $cbRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
  override def prettyName: String = "pq_assign"
}

/** `pq_encode(vec) -> binary`: product-quantization code, ONE unsigned
  * byte per subspace — the extreme-compression index form (a 64-dim
  * float embedding at m=8 stores 8 bytes, 32x smaller; vec8 is 4x).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with VectorArgExpression {
  PqCodebooks.validate(codebooks, "pq_encode")

  override protected def fnName: String = "pq_encode"
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.pqEncodeChecked(input.asInstanceOf[ArrayData], codebooks, isFloat)
    else VectorKernels.pqEncode(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val fn = if (mayHaveNullElements) "pqEncodeChecked" else "pqEncode"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $cbRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** `pq_lut(vec) -> array<double>`: the per-query ADC lookup table
  * (LUT[s * ncodes + c] = dot of query subvector s with codeword c).
  * Computed ONCE per query; each candidate then costs m lookups.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with VectorArgExpression {
  PqCodebooks.validate(codebooks, "pq_lut")

  override protected def fnName: String = "pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    if (mayHaveNullElements)
      VectorKernels.pqLutChecked(input.asInstanceOf[ArrayData], codebooks, isFloat)
    else VectorKernels.pqLut(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val fn = if (mayHaveNullElements) "pqLutChecked" else "pqLut"
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.$fn($c, $cbRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** `pq_adc_score(codes, lut) -> double`: ADC lookup-sum — the PQ serving
  * kernel (m table reads per candidate, no per-candidate multiplies).
  */
case class PqAdcScore(left: Expression, right: Expression, ncodes: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(ncodes >= 1 && ncodes <= 256, "ncodes must be in [1, 256]")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (binary codes, array<double> lut), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    VectorKernels.pqAdc(codes.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData], ncodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.expr.VectorKernels.pqAdc($c, $l, $ncodes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc_score"
}

/** `vec8_scale(a) -> double`: the stored quantization scale. */
case class Vec8Scale(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec8_scale expects BINARY, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.scale8(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorKernels.scale8($c)")

  override protected def withNewChildInternal(newChild: Expression): Vec8Scale =
    copy(child = newChild)
  override def prettyName: String = "vec8_scale"
}
