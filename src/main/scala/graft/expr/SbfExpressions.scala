package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.core.Sbf

/** Distributed Scalable-Bloom-filter build for UNKNOWN-cardinality key
  * streams: no capacity sizing needed — each partition's partial grows its
  * own stage series, the merge is a pure stage concatenation, and `eval`
  * runs one deterministic compaction pass. Because concatenation is a
  * multiset union and both serialization and compaction are pure
  * functions of the stage multiset (canonical stage order — see
  * [[graft.core.Sbf]]), the OUTPUT BYTES ARE MERGE-ORDER-CANONICAL:
  * the same partials produce the same blob under any aggregation tree,
  * matching the byte-determinism contract of the fixed filters. (The
  * partials themselves still depend on the PARTITIONING of the input —
  * which keys grew which lineage — as any partitioned SBF build must.)
  */
case class SbfAgg(
    child: Expression,
    capacityExpr: Expression,
    fpRateExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Sbf] {

  def this(child: Expression, capacityExpr: Expression, fpRateExpr: Expression) =
    this(child, capacityExpr, fpRateExpr, 0, 0)

  private lazy val initialCapacity: Long = capacityExpr.eval() match {
    case d: Decimal => d.toLong
    case n: Number => n.longValue()
  }
  private lazy val fp0: Double = fpRateExpr.eval() match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def children: Seq[Expression] = Seq(child, capacityExpr, fpRateExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"sbf_agg expects a 64-bit key hash (use abloom_key_hash), got ${child.dataType.sql}")
    else if (!capacityExpr.foldable || !fpRateExpr.foldable)
      TypeCheckResult.TypeCheckFailure("initial_capacity and fp_rate must be constants")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Sbf = Sbf.empty(initialCapacity, fp0)

  override def update(buffer: Sbf, input: InternalRow): Sbf = {
    val v = child.eval(input)
    if (v != null) buffer.addHash(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Sbf, other: Sbf): Sbf = buffer.mergeInPlace(other)

  // compact ONLY at finalization: intermediate serialize must preserve
  // the raw stage multiset (compacting mid-tree is not confluent)
  override def eval(buffer: Sbf): Any = buffer.compact().toBytes

  override def serialize(buffer: Sbf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): Sbf = Sbf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SbfAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SbfAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SbfAgg =
    copy(child = newChildren(0), capacityExpr = newChildren(1), fpRateExpr = newChildren(2))

  override def prettyName: String = "sbf_agg"
}

/** Concat merge of a column of serialized scalable filters — tree-merge
  * stored partials (e.g. per-partition checkpoints) without re-reading
  * source data. Same canonical-bytes guarantee as [[SbfAgg]]: the merge
  * concatenates stage multisets and `eval` compacts once, so the output
  * blob is identical for any merge order over the same input filters.
  */
case class SbfUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Sbf]] {

  def this(child: Expression) = this(child, 0, 0)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"sbf_union_agg expects binary filters, got ${dt.sql}")
  }

  override def createAggregationBuffer(): Option[Sbf] = None

  override def update(buffer: Option[Sbf], input: InternalRow): Option[Sbf] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val f = Sbf.fromBytes(v.asInstanceOf[Array[Byte]])
      buffer match {
        case Some(acc) => Some(acc.mergeInPlace(f))
        case None => Some(f)
      }
    }
  }

  override def merge(a: Option[Sbf], b: Option[Sbf]): Option[Sbf] = (a, b) match {
    case (Some(x), Some(y)) => Some(x.mergeInPlace(y))
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }

  override def eval(buffer: Option[Sbf]): Any = buffer.map(_.compact().toBytes).orNull

  override def serialize(buffer: Option[Sbf]): Array[Byte] =
    buffer.map(_.toBytes).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[Sbf] =
    if (bytes.isEmpty) None else Some(Sbf.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): SbfUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SbfUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SbfUnionAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "sbf_union_agg"
}

/** Runtime parse cache for scalable filters (task-scoped identity cache,
  * same design as [[BloomRuntime]]).
  */
object SbfRuntime {
  private val cache = new ThreadLocal[(Array[Byte], Sbf)]

  // driver-side (no TaskContext) single-slot cache: SoftReference so the
  // GC — not a task-completion hook, which does not exist there — bounds
  // the blob's lifetime; without it a constant-folded probe over a
  // LocalRelation would re-parse the same literal array per ROW
  private val driverCache =
    new ThreadLocal[java.lang.ref.SoftReference[(Array[Byte], Sbf)]]

  def parse(bytes: Array[Byte]): Sbf = {
    val c = cache.get()
    if (c != null && (c._1 eq bytes)) c._2
    else {
      val tc = org.apache.spark.TaskContext.get()
      if (tc == null) {
        val sr = driverCache.get()
        val entry = if (sr != null) sr.get() else null
        if (entry != null && (entry._1 eq bytes)) entry._2
        else {
          val f = Sbf.fromBytes(bytes)
          driverCache.set(new java.lang.ref.SoftReference((bytes, f)))
          f
        }
      } else {
        val f = Sbf.fromBytes(bytes)
        if (c == null) tc.addTaskCompletionListener[Unit](_ => cache.remove())
        cache.set((bytes, f))
        f
      }
    }
  }

  def checkHash(filterBytes: Array[Byte], hash: Long): Boolean =
    parse(filterBytes).checkHash(hash)
}

/** `sbf_contains(filter, key_hash)` — OR across stages; zero FN. */
case class SbfContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sbf_contains expects (binary filter, long key hash), got (${l.sql}, ${r.sql})")
    }

  @transient private lazy val foldedFilter: Sbf =
    if (left.foldable) {
      val b = left.eval(null)
      if (b == null) null else Sbf.fromBytes(b.asInstanceOf[Array[Byte]])
    } else null

  override def nullSafeEval(filterBytes: Any, hash: Any): Any = {
    val f =
      if (foldedFilter != null) foldedFilter
      else SbfRuntime.parse(filterBytes.asInstanceOf[Array[Byte]])
    f.checkHash(hash.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (left.foldable && foldedFilter != null) {
      val ref = ctx.addReferenceObj("sbf", foldedFilter, classOf[Sbf].getName)
      defineCodeGen(ctx, ev, (_, h) => s"$ref.checkHash($h)")
    } else {
      val rt = SbfRuntime.getClass.getName.stripSuffix("$")
      defineCodeGen(ctx, ev, (f, h) => s"$rt$$.MODULE$$.checkHash($f, $h)")
    }
  }

  override def prettyName: String = "sbf_contains"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SbfContains =
    copy(left = newLeft, right = newRight)
}

/** Broadcast-backed SBF membership probe: a grown stage series over a
  * large stream crosses the ~1 MB "ship it as a literal" line — the
  * broadcast variant sends the blob once per executor and parses it once
  * (cf. [[BloomBroadcastContain]]).
  */
case class SbfBroadcastContains(
    bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sbf_contains(broadcast) expects a long key hash, got ${dt.sql}")
  }

  @transient private lazy val filter: Sbf = Sbf.fromBytes(bcast.value)

  def probe(hash: Long): Boolean = filter.checkHash(hash)

  override def nullSafeEval(hash: Any): Any = probe(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sbfBcExpr", this, classOf[SbfBroadcastContains].getName)
    defineCodeGen(ctx, ev, h => s"$ref.probe($h)")
  }

  override def prettyName: String = "sbf_contains_bc"

  override protected def withNewChildInternal(newChild: Expression): SbfBroadcastContains =
    copy(child = newChild)
}

/** `sbf_describe(filter)` -> struct(initial_capacity, fp0, growth,
  * tightening, stage_count, inserted_count, compound_fp_bound).
  */
case class SbfDescribe(child: Expression) extends UnaryExpression {
  override def dataType: DataType = SbfDescribe.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"sbf_describe expects binary, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SbfDescribe.describe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = SbfDescribe.getClass.getName.stripSuffix("$")
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $d$$.MODULE$$.describe($c);"
    })

  override def prettyName: String = "sbf_describe"

  override protected def withNewChildInternal(newChild: Expression): SbfDescribe =
    copy(child = newChild)
}

object SbfDescribe {
  val schema: StructType = StructType(Seq(
    StructField("initial_capacity", LongType, nullable = false),
    StructField("fp0", DoubleType, nullable = false),
    StructField("growth", LongType, nullable = false),
    StructField("tightening", DoubleType, nullable = false),
    StructField("stage_count", IntegerType, nullable = false),
    StructField("inserted_count", LongType, nullable = false),
    StructField("compound_fp_bound", DoubleType, nullable = false)))

  def describe(bytes: Array[Byte]): InternalRow = {
    val f = Sbf.fromBytes(bytes)
    InternalRow(f.initialCapacity, f.fp0, f.growth, f.tightening,
      f.stageCount, f.insertedCount, f.compoundFpBound)
  }
}
