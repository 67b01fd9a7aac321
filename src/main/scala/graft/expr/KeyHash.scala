package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Hashing

/** Catalyst expression computing the abloom serializable-mode 64-bit key
  * hash for a column (reference `get_hash_serializable`,
  * `/root/reference/abloom/_abloom.c:183-204`):
  *
  *   string/binary -> XXH64(bytes, seed=0); integral -> mix64(CPython int
  *   hash); float/double -> mix64(CPython float hash).
  *
  * Type dispatch happens once at analysis time (not per row), and codegen
  * emits a direct static call — this expression stays inside whole-stage
  * codegen, so hashing never breaks the pipeline. All sketch build/probe
  * operators consume this hash, mirroring the reference's "one 64-bit hash
  * per key, everything derives from it" design.
  */
/** Shard selector for [[graft.job.BloomShards]]: mix64 of the key hash
  * modulo the shard count — independent of the SBBF's block-select and
  * salt bits. Codegen'd, stays inside whole-stage codegen.
  */
case class ShardOf(child: Expression, shardsExpr: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = child
  override def right: Expression = shardsExpr
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, shardsExpr.dataType) match {
      case (LongType, IntegerType) if shardsExpr.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "shard_of expects (long key hash, constant int shard count)")
    }

  override def nullSafeEval(hash: Any, shards: Any): Any =
    graft.job.BloomShards.shardOf(hash.asInstanceOf[Long], shards.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, s) =>
      s"graft.job.BloomShards$$.MODULE$$.shardOf($h, $s)")

  override def prettyName: String = "shard_of"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShardOf =
    copy(child = newLeft, shardsExpr = newRight)
}

case class AbloomKeyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | LongType | IntegerType | ShortType |
        ByteType | DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"abloom_key_hash supports string/binary/integral/floating keys, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => Hashing.hashUTF8String(input.asInstanceOf[UTF8String])
    case BinaryType => Hashing.hashBytes(input.asInstanceOf[Array[Byte]])
    case LongType => Hashing.hashLong(input.asInstanceOf[Long])
    case IntegerType => Hashing.hashLong(input.asInstanceOf[Int].toLong)
    case ShortType => Hashing.hashLong(input.asInstanceOf[Short].toLong)
    case ByteType => Hashing.hashLong(input.asInstanceOf[Byte].toLong)
    case DoubleType => Hashing.hashDouble(input.asInstanceOf[Double])
    case FloatType => Hashing.hashDouble(input.asInstanceOf[Float].toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = Hashing.getClass.getName.stripSuffix("$") // graft.core.Hashing
    val call = child.dataType match {
      case StringType => (c: String) => s"$h$$.MODULE$$.hashUTF8String($c)"
      case BinaryType => (c: String) => s"$h$$.MODULE$$.hashBytes($c)"
      case LongType => (c: String) => s"$h$$.MODULE$$.hashLong($c)"
      case IntegerType | ShortType | ByteType =>
        (c: String) => s"$h$$.MODULE$$.hashLong((long) $c)"
      case DoubleType => (c: String) => s"$h$$.MODULE$$.hashDouble($c)"
      case FloatType => (c: String) => s"$h$$.MODULE$$.hashDouble((double) $c)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override def prettyName: String = "abloom_key_hash"

  override protected def withNewChildInternal(newChild: Expression): AbloomKeyHash =
    copy(child = newChild)
}
