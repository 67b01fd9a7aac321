package graft.core

import java.nio.ByteBuffer

/** KMV bottom-k distinct sketch WITH an attached payload per retained
  * key — a uniform distinct-sample and a cardinality estimate in ONE
  * pass (the "give me ~k example distinct values of this 100 TB column,
  * and how many there are" primitive).
  *
  * State: the k smallest distinct 64-bit key hashes in unsigned order
  * ([[Kmv]] semantics — same estimator, same exact-below-k regime),
  * each carrying the payload bytes that arrived with the key. Because
  * the retained set is a pure function of the input hash set, the
  * SAMPLE is a uniform random sample of the distinct keys (the hash is
  * the randomness) — unbiased regardless of row duplication, ordering,
  * partitioning or skew.
  *
  * Payload canonicality: two rows can legally carry the same key hash
  * with DIFFERENT payloads (same key re-observed with another payload,
  * or a 64-bit hash collision between distinct keys). The sketch keeps
  * the lexicographically-smallest payload bytes (unsigned byte order) —
  * a deterministic, merge-order-independent rule, so the wire bytes
  * stay content-canonical: any merge tree over any partitioning of the
  * same (hash, payload) multiset yields byte-identical sketches, the
  * same contract [[Kmv]] and the cell-wise families property-test.
  *
  * Scale: memory is k * (8 + payload) bytes; payloads are capped at
  * [[KmvSample.MaxPayloadBytes]] (oversized payloads are truncated to
  * the cap at insert — a sample PREVIEW, not an archival copy) so a
  * single huge document cannot blow up an aggregation buffer.
  */
final class KmvSample private[core] (
    val k: Int,
    private val map: java.util.TreeMap[java.lang.Long, Array[Byte]]) {

  def size: Int = map.size
  def isSaturated: Boolean = map.size >= k

  private def kthMin: Long = map.lastKey()

  /** Inclusion threshold in (0, 1]: 1 while unsaturated. */
  def theta: Double = if (!isSaturated) 1.0 else Kmv.normalize(kthMin)

  /** Distinct-count estimate: exact below k, (k-1)/theta at/above. */
  def estimate: Double =
    if (!isSaturated) map.size.toDouble else (k - 1).toDouble / theta

  /** Unsigned-lexicographic byte comparison (the payload tie rule) —
    * the JDK intrinsic, not a hand-rolled loop: wire canonicality
    * depends on this ordering being exactly right.
    */
  private def lexLt(a: Array[Byte], b: Array[Byte]): Boolean =
    java.util.Arrays.compareUnsigned(a, b) < 0

  /** Cheap pre-check for callers that want to avoid materializing (or
    * copying) the payload for rows the sketch would reject outright:
    * true iff [[add]] with this hash could change the state (a present
    * hash counts — the tie rule may swap its payload).
    */
  def wouldAccept(h: Long): Boolean =
    map.size < k || map.containsKey(java.lang.Long.valueOf(h)) ||
      java.lang.Long.compareUnsigned(h, kthMin) < 0

  def add(h: Long, payload: Array[Byte]): Unit = {
    val p =
      if (payload.length <= KmvSample.MaxPayloadBytes) payload
      else java.util.Arrays.copyOf(payload, KmvSample.MaxPayloadBytes)
    val boxed = java.lang.Long.valueOf(h)
    val existing = map.get(boxed)
    if (existing != null) {
      // deterministic tie rule: keep the lexicographically-smallest
      if (lexLt(p, existing)) { map.put(boxed, p); () }
    } else if (map.size < k) {
      map.put(boxed, p); ()
    } else if (java.lang.Long.compareUnsigned(h, kthMin) < 0) {
      map.put(boxed, p)
      map.remove(map.lastKey()); ()
    }
  }

  /** Union into this sketch (k must match, like [[Kmv.mergeIn]]). */
  def mergeIn(other: KmvSample): KmvSample = {
    require(other.k == k,
      s"cannot merge KMV sample sketches with different k: $k vs ${other.k}")
    if (other eq this) return this // self-union is the identity
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey.longValue(), e.getValue)
    }
    this
  }

  /** Retained (hash, payload) entries ascending by unsigned hash. */
  def entries: Iterator[(Long, Array[Byte])] = {
    import scala.jdk.CollectionConverters._
    map.entrySet().iterator().asScala
      .map(e => (e.getKey.longValue(), e.getValue))
  }

  /** The uniform distinct-sample payloads, ascending by key hash. */
  def payloads: Iterator[Array[Byte]] = entries.map(_._2)

  def copySketch(): KmvSample = {
    val m = new java.util.TreeMap[java.lang.Long, Array[Byte]](Kmv.UnsignedOrder)
    m.putAll(map)
    new KmvSample(k, m)
  }

  /** Wire: [ver:1=1][k:4 BE][n:4 BE] then n entries of
    * [hash:8 BE][len:4 BE][payload bytes], ascending unsigned hash —
    * content-canonical (sorted map + deterministic payload rule).
    */
  def toBytes: Array[Byte] = {
    // size in LONG space: k up to 2^20 entries x 64 KiB payloads is a
    // legal-but-absurd ~68 GiB sketch — fail loudly, never Int-wrap
    var totalL = 9L
    val it = map.values().iterator()
    while (it.hasNext) totalL += 12L + it.next().length
    require(totalL <= KmvSample.MaxBlobBytes,
      s"KMV sample sketch serializes to $totalL bytes (> " +
        s"${KmvSample.MaxBlobBytes}): lower k or shorten payloads")
    val total = totalL.toInt
    val out = ByteBuffer.allocate(total)
    out.put(1.toByte).putInt(k).putInt(map.size)
    val es = map.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next()
      out.putLong(e.getKey.longValue()).putInt(e.getValue.length)
        .put(e.getValue)
    }
    out.array()
  }

  override def equals(o: Any): Boolean = o match {
    case that: KmvSample =>
      k == that.k && map.size == that.map.size && {
        val a = map.entrySet().iterator()
        val b = that.map.entrySet().iterator()
        var eq = true
        while (eq && a.hasNext) {
          val ea = a.next()
          val eb = b.next()
          eq = ea.getKey == eb.getKey &&
            java.util.Arrays.equals(ea.getValue, eb.getValue)
        }
        eq
      }
    case _ => false
  }
  override def hashCode(): Int = {
    var h = 31 * k
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      h = 31 * h + e.getKey.hashCode() +
        java.util.Arrays.hashCode(e.getValue)
    }
    h
  }
  override def toString: String =
    s"KmvSample(k=$k, n=${map.size}, theta=$theta, estimate=$estimate)"
}

object KmvSample {
  /** Per-entry payload cap: keeps one aggregation buffer bounded at
    * k * (12 + cap) bytes even over a column of huge documents.
    */
  val MaxPayloadBytes = 1 << 16

  /** Whole-blob serialization cap (1 GiB): k and the payload cap are
    * individually legal at sizes whose PRODUCT cannot serialize — the
    * bound turns an Int wrap / BufferOverflow at shuffle time into a
    * loud, actionable error.
    */
  val MaxBlobBytes = 1L << 30

  def empty(k: Int): KmvSample = {
    require(k >= Kmv.MinK && k <= Kmv.MaxK,
      s"k must be in [${Kmv.MinK}, ${Kmv.MaxK}], got $k")
    new KmvSample(k,
      new java.util.TreeMap[java.lang.Long, Array[Byte]](Kmv.UnsignedOrder))
  }

  def fromBytes(bytes: Array[Byte]): KmvSample = {
    require(bytes.length >= 9, s"KMV sample blob too short: ${bytes.length}")
    val in = ByteBuffer.wrap(bytes)
    val ver = in.get()
    require(ver == 1, s"unsupported KMV sample wire version $ver")
    val k = in.getInt
    require(k >= Kmv.MinK && k <= Kmv.MaxK, s"corrupt KMV sample blob: k=$k")
    val n = in.getInt
    require(n >= 0 && n <= k, s"corrupt KMV sample blob: n=$n k=$k")
    val m = new java.util.TreeMap[java.lang.Long, Array[Byte]](Kmv.UnsignedOrder)
    var prev = 0L
    var i = 0
    while (i < n) {
      require(in.remaining() >= 12, "truncated KMV sample blob")
      val h = in.getLong
      require(i == 0 || java.lang.Long.compareUnsigned(prev, h) < 0,
        "corrupt KMV sample blob: hashes not strictly ascending")
      prev = h
      val len = in.getInt
      require(len >= 0 && len <= MaxPayloadBytes && in.remaining() >= len,
        s"corrupt KMV sample blob: payload length $len")
      val p = new Array[Byte](len)
      in.get(p)
      m.put(java.lang.Long.valueOf(h), p)
      i += 1
    }
    require(!in.hasRemaining, "trailing bytes in KMV sample blob")
    new KmvSample(k, m)
  }
}
