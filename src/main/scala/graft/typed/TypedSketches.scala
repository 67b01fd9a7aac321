package graft.typed

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.{Hashing, Hll, Sbbf}

/** Typed `Dataset[T]` surface: `org.apache.spark.sql.expressions.Aggregator`
  * facades over the same sketch kernels the Catalyst expressions use
  * (north rule: "mergeable Aggregator/UDAF ... over typed Datasets").
  *
  * Use when the input is a typed Dataset and the key is a field access —
  * the aggregator composes with `groupByKey(...).agg(...)` and keeps the
  * case-class types end to end:
  *
  * {{{
  *   case class File(repo: String, sha: String)
  *   ds.groupByKey(_.repo).agg(TypedSketches.bloomOfString[File](_.sha, 1 << 20, 0.01))
  * }}}
  *
  * The untyped column API ([[graft.functions]]) stays the faster path for
  * wide scans (codegen'd key hash, no object deserialization); these
  * aggregators pay the Dataset object codec, which is the normal typed
  * trade in Spark.
  */
object TypedSketches {

  private def kryo[A](implicit ct: scala.reflect.ClassTag[A]): Encoder[A] =
    Encoders.kryo[A]

  /** Bloom filter over a string key of `IN`; output = ABLM v2 bytes,
    * bit-identical to the expression build over the same keys. Null keys
    * are SKIPPED, matching the expression aggregates' null handling
    * (`bloom_agg`/`hll_agg` never insert a null).
    */
  def bloomOfString[IN](key: IN => String, capacity: Long, fpRate: Double): Aggregator[IN, Sbbf, Array[Byte]] =
    new BloomAggregator[IN](in => {
      val k = key(in)
      if (k == null) null else java.lang.Long.valueOf(Hashing.hashString(k))
    }, capacity, fpRate)

  /** Bloom filter over an integral key of `IN`. */
  def bloomOfLong[IN](key: IN => Long, capacity: Long, fpRate: Double): Aggregator[IN, Sbbf, Array[Byte]] =
    new BloomAggregator[IN](in => java.lang.Long.valueOf(Hashing.hashLong(key(in))), capacity, fpRate)

  /** HLL distinct-count sketch over a string key of `IN`; null keys skipped. */
  def hllOfString[IN](key: IN => String, p: Int = Hll.DefaultP): Aggregator[IN, Hll, Array[Byte]] =
    new HllAggregator[IN](in => {
      val k = key(in)
      if (k == null) null else java.lang.Long.valueOf(Hashing.hashString(k))
    }, p)

  // hashOf returns a boxed hash, null meaning "null key — skip the row"
  // (the same semantics as the Catalyst aggregates' update path)
  private final class BloomAggregator[IN](
      hashOf: IN => java.lang.Long, capacity: Long, fpRate: Double)
    extends Aggregator[IN, Sbbf, Array[Byte]] {
    override def zero: Sbbf = Sbbf.empty(capacity, fpRate)
    override def reduce(b: Sbbf, a: IN): Sbbf = {
      val h = hashOf(a)
      if (h != null) b.insertHash(h.longValue())
      b
    }
    override def merge(a: Sbbf, b: Sbbf): Sbbf = a.orInPlace(b)
    override def finish(b: Sbbf): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[Sbbf] = kryo[Sbbf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class HllAggregator[IN](hashOf: IN => java.lang.Long, p: Int)
    extends Aggregator[IN, Hll, Array[Byte]] {
    override def zero: Hll = Hll.empty(p)
    override def reduce(b: Hll, a: IN): Hll = {
      val h = hashOf(a)
      if (h != null) b.addHash(h.longValue())
      b
    }
    override def merge(a: Hll, b: Hll): Hll = a.merge(b)
    override def finish(b: Hll): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[Hll] = kryo[Hll]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
