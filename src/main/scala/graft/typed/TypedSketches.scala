package graft.typed

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.{Hashing, Hll, Kll, MisraGries, Sbbf, TDigest}

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

  /** Aggregation buffer that serializes a t-digest through its WIRE
    * format instead of raw fields: the digest's pending-point buffers
    * are `@transient` (a deliberate choice — `toBytes` compresses them
    * first), so a field-level kryo/Java round-trip mid-aggregation
    * would silently DROP up to `4*compression` buffered points per
    * ser/de. Caught by the typed-facade spec: count came back 1600 of
    * 3000.
    */
  final class TDigestBuffer(@transient var td: TDigest)
    extends com.esotericsoftware.kryo.KryoSerializable with Serializable {
    override def write(kryo: com.esotericsoftware.kryo.Kryo,
        out: com.esotericsoftware.kryo.io.Output): Unit = {
      val b = td.toBytes
      out.writeInt(b.length); out.writeBytes(b)
    }
    override def read(kryo: com.esotericsoftware.kryo.Kryo,
        in: com.esotericsoftware.kryo.io.Input): Unit =
      td = TDigest.fromBytes(in.readBytes(in.readInt()))
    private def writeObject(o: java.io.ObjectOutputStream): Unit = {
      val b = td.toBytes
      o.writeInt(b.length); o.write(b)
    }
    private def readObject(i: java.io.ObjectInputStream): Unit = {
      val b = new Array[Byte](i.readInt()); i.readFully(b)
      td = TDigest.fromBytes(b)
    }
  }

  /** t-digest quantile sketch over a numeric value of `IN`. */
  def tdigestOf[IN](value: IN => Double,
      compression: Double = TDigest.DefaultCompression): Aggregator[IN, TDigestBuffer, Array[Byte]] =
    new Aggregator[IN, TDigestBuffer, Array[Byte]] {
      override def zero: TDigestBuffer = new TDigestBuffer(TDigest.empty(compression))
      override def reduce(b: TDigestBuffer, a: IN): TDigestBuffer = {
        b.td.add(value(a)); b
      }
      override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = {
        a.td.merge(b.td); a
      }
      override def finish(b: TDigestBuffer): Array[Byte] = b.td.toBytes
      override def bufferEncoder: Encoder[TDigestBuffer] = kryo[TDigestBuffer]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** KLL quantile sketch over a numeric value of `IN`. */
  def kllOf[IN](value: IN => Double, k: Int = Kll.DefaultK): Aggregator[IN, Kll, Array[Byte]] =
    new Aggregator[IN, Kll, Array[Byte]] {
      override def zero: Kll = Kll.empty(k)
      override def reduce(b: Kll, a: IN): Kll = { b.add(value(a)); b }
      override def merge(a: Kll, b: Kll): Kll = a.merge(b)
      override def finish(b: Kll): Array[Byte] = b.toBytes
      override def bufferEncoder: Encoder[Kll] = kryo[Kll]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Misra-Gries heavy-hitter summary over a string key of `IN`; null
    * keys skipped (expression-aggregate semantics). */
  def misraGriesOf[IN](key: IN => String, k: Int): Aggregator[IN, MisraGries, Array[Byte]] =
    new Aggregator[IN, MisraGries, Array[Byte]] {
      override def zero: MisraGries = MisraGries.empty(k)
      override def reduce(b: MisraGries, a: IN): MisraGries = {
        val s = key(a)
        if (s != null) b.add(s)
        b
      }
      override def merge(a: MisraGries, b: MisraGries): MisraGries = a.merge(b)
      override def finish(b: MisraGries): Array[Byte] = b.toBytes
      override def bufferEncoder: Encoder[MisraGries] = kryo[MisraGries]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

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
