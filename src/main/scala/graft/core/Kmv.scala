package graft.core

import java.nio.ByteBuffer

/** KMV (k-minimum-values, "bottom-k") distinct-value sketch with
  * theta-style set algebra.
  *
  * State: the `k` smallest DISTINCT 64-bit key hashes in UNSIGNED order.
  * Because the state is a canonical set (sorted, duplicate-free, fully
  * determined by the input value set), the wire bytes are
  * merge-order-canonical by construction — any merge tree over any
  * partitioning of the same inputs yields byte-identical sketches, the
  * strongest form of the associativity contract the Bloom/HLL families
  * property-test.
  *
  * Estimation (Beyer et al. 2007; Dasgupta et al. "theta sketches"):
  *  - UNSATURATED (fewer than k distinct hashes seen): the sketch holds
  *    EVERY distinct hash — `estimate` = exact distinct count, and set
  *    operations are exact set operations. This regime is what the
  *    cross-engine oracle pins bit-exactly.
  *  - SATURATED: theta = normalized k-th minimum; estimate = (k-1)/theta,
  *    relative standard error ~ 1/sqrt(k-2).
  *
  * Set algebra restricts both operands below thetaJoint =
  * min(theta_a, theta_b): every surviving hash is an unbiased uniform
  * sample of the underlying union, so |A ∩ B below thetaJoint| /
  * thetaJoint estimates the intersection — structurally unlike HLL's
  * inclusion-exclusion, whose error compounds from three estimates.
  *
  * Unlike HLL (fixed 2^p registers), KMV memory is k hashes but gives
  * exactness below k and principled intersections — the right tool when
  * group cardinalities straddle the small/huge boundary.
  */
final class Kmv private[core] (
    val k: Int,
    private val set: java.util.TreeSet[java.lang.Long]) {

  def size: Int = set.size
  def isSaturated: Boolean = set.size >= k

  /** Largest retained hash (unsigned order); only meaningful saturated. */
  private def kthMin: Long = set.last()

  /** Inclusion threshold in (0, 1]: 1 while unsaturated. */
  def theta: Double = if (!isSaturated) 1.0 else Kmv.normalize(kthMin)

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, kthMin) < 0) {
      if (set.add(h) && set.size > k) { set.remove(set.last()); () }
    }
  }

  /** Distinct-count estimate: exact below k, (k-1)/theta at/above. */
  def estimate: Double =
    if (!isSaturated) set.size.toDouble else (k - 1).toDouble / theta

  /** Union into this sketch (k must match — a mixed-k union would have
    * to degrade to min(k) and silently change accuracy; be explicit).
    */
  def mergeIn(other: Kmv): Kmv = {
    require(other.k == k,
      s"cannot merge KMV sketches with different k: $k vs ${other.k}")
    if (other eq this) return this // self-union is the identity
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
    this
  }

  /** Retained hashes strictly below the normalized threshold `t`,
    * ascending unsigned. */
  private[core] def below(t: Double): Iterator[Long] = {
    import scala.jdk.CollectionConverters._
    // t == 1.0 from an UNSATURATED sketch means "no threshold" (theta is
    // the constant 1, not a kth-min). A SATURATED sketch's theta can also
    // be exactly 1.0 in the corner where kthMin's top 53 bits are all set
    // (normalize maps into (0, 1], hitting 1.0 there) — keep the strict
    // below-theta contract in that case so the kth minimum is excluded.
    val admitAll = t >= 1.0 && !isSaturated
    set.iterator().asScala.map(_.longValue())
      .takeWhile(h => admitAll || Kmv.normalize(h) < t)
  }

  def copySketch(): Kmv = {
    val s = new java.util.TreeSet[java.lang.Long](Kmv.UnsignedOrder)
    s.addAll(set)
    new Kmv(k, s)
  }

  /** Wire: [ver:1=1][k:4 BE][n:4 BE][n hashes BE, ascending unsigned]. */
  def toBytes: Array[Byte] = {
    val out = ByteBuffer.allocate(9 + 8 * set.size)
    out.put(1.toByte).putInt(k).putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }

  override def equals(o: Any): Boolean = o match {
    case that: Kmv => k == that.k && set.equals(that.set)
    case _ => false
  }
  override def hashCode(): Int = 31 * k + set.hashCode()
  override def toString: String =
    s"Kmv(k=$k, n=${set.size}, theta=$theta, estimate=$estimate)"
}

object Kmv {
  val MinK = 16
  val MaxK = 1 << 20
  val DefaultK = 1024

  private[core] val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a.longValue(), b.longValue())

  /** Unsigned 64-bit hash -> (0, 1]: top 53 bits (exact in a double),
    * +1 so the all-zero hash cannot yield theta == 0 (division guard).
    * The upper bound IS attainable: a hash with all top 53 bits set maps
    * to exactly 1.0 (see [[Kmv.below]]'s saturated-corner handling).
    */
  private[core] def normalize(h: Long): Double =
    ((h >>> 11) + 1).toDouble / (1L << 53).toDouble

  def empty(k: Int): Kmv = {
    require(k >= MinK && k <= MaxK, s"k must be in [$MinK, $MaxK], got $k")
    new Kmv(k, new java.util.TreeSet[java.lang.Long](UnsignedOrder))
  }

  def fromBytes(bytes: Array[Byte]): Kmv = {
    require(bytes.length >= 9, s"KMV blob too short: ${bytes.length} bytes")
    val in = ByteBuffer.wrap(bytes)
    val ver = in.get()
    require(ver == 1, s"unsupported KMV wire version $ver")
    val k = in.getInt
    require(k >= MinK && k <= MaxK, s"corrupt KMV blob: k=$k")
    val n = in.getInt
    require(n >= 0 && n <= k, s"corrupt KMV blob: n=$n for k=$k")
    require(bytes.length == 9 + 8L * n,
      s"corrupt KMV blob: ${bytes.length} bytes for n=$n")
    val set = new java.util.TreeSet[java.lang.Long](UnsignedOrder)
    var prev = 0L
    var i = 0
    while (i < n) {
      val h = in.getLong
      require(i == 0 || java.lang.Long.compareUnsigned(prev, h) < 0,
        "corrupt KMV blob: hashes not strictly ascending unsigned")
      set.add(h)
      prev = h
      i += 1
    }
    new Kmv(k, set)
  }

  /** Theta-style intersection estimate: both operands restricted below
    * thetaJoint = min(theta_a, theta_b); |A ∩ B| there over thetaJoint.
    * EXACT (a true set intersection size) while both are unsaturated.
    */
  def intersectEstimate(a: Kmv, b: Kmv): Double = {
    val t = math.min(a.theta, b.theta)
    val bs = b.below(t).toSet
    val common = a.below(t).count(bs.contains)
    common.toDouble / t
  }
}
