package graft.core

import java.nio.ByteBuffer
import java.nio.ByteOrder
import scala.collection.mutable.ArrayBuffer

/** KLL quantile sketch over doubles (Karnin, Lang, Liberty, "Optimal
  * Quantile Approximation in Streams", FOCS 2016; see also KLL± VLDB'21 in
  * PAPERS.md). Compactor hierarchy with geometrically decaying capacities
  * (c = 2/3): level h holds items of weight 2^h; compaction sorts a level
  * and promotes every other item (random offset) to level h+1.
  *
  * Additive rank error: |R_est(x)/n - R(x)/n| <= eps with eps ~ 2.5/k at
  * k = 200 (empirically ~1% or better); merge concatenates levels and
  * re-compacts, preserving the bound.
  *
  * Randomness: per-compaction coin from a deterministic splitmix stream
  * seeded at construction, so a given plan/partitioning reproduces
  * byte-identical sketches run-to-run (answers under different
  * partitionings agree within eps, not byte-exactly — inherent to KLL).
  */
final class Kll private[core] (
    val k: Int,
    private var levels: ArrayBuffer[ArrayBuffer[Double]],
    private var n: Long,
    private var minV: Double,
    private var maxV: Double,
    private var rngState: Long) extends Serializable {

  private def nextCoin(): Boolean = {
    rngState = Hashing.mix64(rngState + 0x9e3779b97f4a7c15L)
    (rngState & 1L) == 1L
  }

  private def capacity(h: Int): Int = {
    val depth = levels.length
    // top level (largest) gets k; lower levels decay by (2/3)^distance
    val c = math.pow(2.0 / 3.0, (depth - 1 - h).toDouble) * k
    math.max(2, math.ceil(c).toInt)
  }

  def add(x: Double): Unit = {
    if (java.lang.Double.isNaN(x)) return
    levels(0) += x
    n += 1
    if (x < minV) minV = x
    if (x > maxV) maxV = x
    compactIfNeeded()
  }

  private def totalItems: Int = levels.map(_.length).sum

  private def capacityTotal: Int = levels.indices.map(capacity).sum

  private def compactIfNeeded(): Unit = {
    while (totalItems > capacityTotal) {
      // find lowest over-capacity level and compact it
      var h = 0
      var done = false
      while (h < levels.length && !done) {
        if (levels(h).length > capacity(h)) {
          compact(h)
          done = true
        }
        h += 1
      }
      if (!done) compact(0) // safety: compact lowest
    }
  }

  private def compact(h: Int): Unit = {
    val lvl = levels(h)
    if (lvl.length < 2) return
    val sorted = lvl.sorted
    // odd length: one unpaired item stays at this level (weight preserved);
    // the even prefix is compacted pairwise — promote one item per pair
    // (random side), discard the other (its weight moves up with the pair)
    val even = sorted.length & ~1
    val keepOdd = nextCoin()
    val promoted = new ArrayBuffer[Double](even / 2)
    var i = if (keepOdd) 1 else 0
    while (i < even) {
      promoted += sorted(i)
      i += 2
    }
    levels(h) =
      if (sorted.length % 2 == 1) ArrayBuffer(sorted(sorted.length - 1))
      else new ArrayBuffer[Double]()
    if (h + 1 == levels.length) levels += new ArrayBuffer[Double]()
    levels(h + 1) ++= promoted
  }

  def merge(other: Kll): Kll = {
    require(k == other.k, "Cannot merge KLL sketches with different k")
    while (levels.length < other.levels.length) levels += new ArrayBuffer[Double]()
    var h = 0
    while (h < other.levels.length) {
      levels(h) ++= other.levels(h)
      h += 1
    }
    n += other.n
    if (other.minV < minV) minV = other.minV
    if (other.maxV > maxV) maxV = other.maxV
    rngState ^= Hashing.mix64(other.rngState)
    compactIfNeeded()
    this
  }

  def count: Long = n

  /** Estimated rank (CDF) of x: fraction of items <= x. */
  def rank(x: Double): Double = {
    if (n == 0) return Double.NaN
    var below = 0.0
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      val lvl = levels(h)
      var i = 0
      while (i < lvl.length) {
        if (lvl(i) <= x) below += w
        i += 1
      }
      h += 1
    }
    below / n
  }

  /** Quantile estimate: smallest retained item whose estimated rank >= q. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    if (n == 0) return Double.NaN
    if (q == 0.0) return minV
    if (q == 1.0) return maxV
    // weighted sorted walk
    val items = new ArrayBuffer[(Double, Long)](totalItems)
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val target = q * n
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    maxV
  }

  /** Published additive rank-error bound for this k (conservative). */
  def epsilon: Double = 2.5 / k

  def copy(): Kll =
    new Kll(k, levels.map(_.clone()), n, minV, maxV, rngState)

  /** Wire format: "GKLL" + version(1) + k(4 BE) + n(8 BE) + min(8) +
    * max(8) + rng(8) + numLevels(4) + per level: count(4) + doubles(8 BE).
    */
  def toBytes: Array[Byte] = {
    val size = 45 + 4 * levels.length + 8 * totalItems
    val bb = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    bb.put('G'.toByte).put('K'.toByte).put('L'.toByte).put('L'.toByte)
    bb.put(1.toByte)
    bb.putInt(k)
    bb.putLong(n)
    bb.putDouble(minV)
    bb.putDouble(maxV)
    bb.putLong(rngState)
    bb.putInt(levels.length)
    levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object Kll {
  val DefaultK = 200

  def empty(k: Int = DefaultK): Kll = {
    require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")
    new Kll(k, ArrayBuffer(new ArrayBuffer[Double]()), 0L,
      Double.PositiveInfinity, Double.NegativeInfinity, 0x6b6c6c2d736b65L)
  }

  def fromBytes(data: Array[Byte]): Kll = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < 45) fail("Invalid KLL data: too short for header")
    if (data(0) != 'G' || data(1) != 'K' || data(2) != 'L' || data(3) != 'L')
      fail("Invalid KLL data: wrong magic bytes")
    if (data(4) != 1) fail(s"Unsupported KLL version: ${data(4)}")
    val bb = ByteBuffer.wrap(data, 5, data.length - 5).order(ByteOrder.BIG_ENDIAN)
    val k = bb.getInt
    val n = bb.getLong
    val minV = bb.getDouble
    val maxV = bb.getDouble
    val rng = bb.getLong
    val numLevels = bb.getInt
    if (k < 8 || numLevels < 1 || numLevels > 64) fail("Invalid KLL data: bad header fields")
    val levels = new ArrayBuffer[ArrayBuffer[Double]](numLevels)
    var h = 0
    while (h < numLevels) {
      if (bb.remaining() < 4) fail("Invalid KLL data: truncated levels")
      val c = bb.getInt
      if (c < 0 || bb.remaining() < 8L * c) fail("Invalid KLL data: truncated level items")
      val lvl = new ArrayBuffer[Double](c)
      var i = 0
      while (i < c) { lvl += bb.getDouble; i += 1 }
      levels += lvl
      h += 1
    }
    if (bb.remaining() != 0) fail("Invalid KLL data: trailing bytes")
    new Kll(k, levels, n, minV, maxV, rng)
  }
}
