package graft.core

import java.nio.ByteBuffer
import java.nio.ByteOrder

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", 2019): centroids sized by the k1 scale
  * function so accuracy concentrates at the tails; `merge` folds another
  * digest's centroids through the same compression, making it a mergeable
  * aggregation buffer like the SBBF/HLL (merge is commutative and
  * associative up to the published error bound — quantile answers are
  * bound-exact, not byte-exact, under re-partitioning).
  *
  * compression (delta) default 100: mid-range rank error well under 1%,
  * much tighter at the tails.
  */
final class TDigest private[core] (
    val compression: Double,
    private var means: Array[Double],
    private var weights: Array[Double],
    private var nCentroids: Int,
    private var totalWeight: Double,
    private var minV: Double,
    private var maxV: Double) extends Serializable {

  private val bufCap = math.max(32, (4 * compression).toInt)
  @transient private var bufM: Array[Double] = _
  @transient private var bufW: Array[Double] = _
  @transient private var bufN: Int = 0

  private def ensureBuf(): Unit =
    if (bufM == null) { bufM = new Array[Double](bufCap); bufW = new Array[Double](bufCap) }

  def add(x: Double, w: Double = 1.0): Unit = {
    if (java.lang.Double.isNaN(x)) return
    ensureBuf()
    if (bufN == bufCap) compress()
    bufM(bufN) = x
    bufW(bufN) = w
    bufN += 1
    if (x < minV) minV = x
    if (x > maxV) maxV = x
  }

  def merge(other: TDigest): TDigest = {
    require(compression == other.compression,
      "Cannot merge t-digests with different compression")
    other.compress()
    var i = 0
    while (i < other.nCentroids) {
      add(other.means(i), other.weights(i))
      i += 1
    }
    if (other.minV < minV) minV = other.minV
    if (other.maxV > maxV) maxV = other.maxV
    this
  }

  // k1 scale function and inverse (Dunning & Ertl eq. 2)
  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)
  private def kInv(k: Double): Double =
    (math.sin(k * 2.0 * math.Pi / compression) + 1.0) / 2.0

  /** Fold buffered points into the centroid list (merging compression). */
  def compress(): Unit = {
    if (bufN == 0) return
    // gather centroids + buffer, sort by mean
    val n = nCentroids + bufN
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, ms, 0, nCentroids)
    System.arraycopy(weights, 0, ws, 0, nCentroids)
    System.arraycopy(bufM, 0, ms, nCentroids, bufN)
    System.arraycopy(bufW, 0, ws, nCentroids, bufN)
    val order = (0 until n).sortBy(ms)
    val total = {
      var s = 0.0; var i = 0
      while (i < n) { s += ws(i); i += 1 }
      s
    }

    val outM = new Array[Double](math.max(16, (2 * compression).toInt + 8))
    val outW = new Array[Double](outM.length)
    var outN = 0
    var wSoFar = 0.0
    var qLimit = total * kInv(kScale(0.0) + 1.0)
    var curM = ms(order(0))
    var curW = ws(order(0))
    var i = 1
    while (i < n) {
      val m = ms(order(i))
      val w = ws(order(i))
      if (wSoFar + curW + w <= qLimit) {
        // fold into current centroid (weighted mean)
        curM = curM + (m - curM) * w / (curW + w)
        curW += w
      } else {
        outM(outN) = curM; outW(outN) = curW; outN += 1
        wSoFar += curW
        qLimit = total * kInv(kScale(wSoFar / total) + 1.0)
        curM = m; curW = w
      }
      i += 1
    }
    outM(outN) = curM; outW(outN) = curW; outN += 1

    means = java.util.Arrays.copyOf(outM, outN)
    weights = java.util.Arrays.copyOf(outW, outN)
    nCentroids = outN
    totalWeight = total
    bufN = 0
  }

  def count: Double = { compress(); totalWeight }

  /** Quantile estimate by piecewise-linear interpolation over centroid
    * midpoints, clamped to observed min/max.
    */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    compress()
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) return means(0)
    val target = q * totalWeight
    if (target <= weights(0) / 2.0) // left tail: interpolate from min
      return minV + (means(0) - minV) * (target / (weights(0) / 2.0))
    var cum = 0.0
    var i = 0
    while (i < nCentroids - 1) {
      val mid = cum + weights(i) / 2.0
      val nextMid = cum + weights(i) + weights(i + 1) / 2.0
      if (target <= nextMid && target >= mid) {
        val frac = (target - mid) / (nextMid - mid)
        return means(i) + (means(i + 1) - means(i)) * frac
      }
      cum += weights(i)
      i += 1
    }
    // right tail
    val lastMid = totalWeight - weights(nCentroids - 1) / 2.0
    if (target >= lastMid) {
      val frac = (target - lastMid) / (weights(nCentroids - 1) / 2.0)
      maxV.min(means(nCentroids - 1) + (maxV - means(nCentroids - 1)) * frac)
    } else means(nCentroids - 1)
  }

  /** Approximate rank (CDF) of a value. */
  def cdf(x: Double): Double = {
    compress()
    if (nCentroids == 0) return Double.NaN
    if (x <= minV) return 0.0
    if (x >= maxV) return 1.0
    var cum = 0.0
    var i = 0
    while (i < nCentroids) {
      if (x < means(i)) {
        val prevMean = if (i == 0) minV else means(i - 1)
        val prevCum = if (i == 0) 0.0 else cum - weights(i - 1) / 2.0
        val thisCum = cum + weights(i) / 2.0
        val frac = if (means(i) == prevMean) 1.0 else (x - prevMean) / (means(i) - prevMean)
        return ((prevCum + (thisCum - prevCum) * frac) / totalWeight).max(0.0).min(1.0)
      }
      cum += weights(i)
      i += 1
    }
    1.0
  }

  def centroidCount: Int = { compress(); nCentroids }

  /** Wire format: "GTDG" + version(1) + compression(8 BE double) +
    * min(8) + max(8) + nCentroids(4 BE) + (mean, weight) pairs (8 BE each).
    */
  def toBytes: Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(33 + nCentroids * 16).order(ByteOrder.BIG_ENDIAN)
    bb.put('G'.toByte).put('T'.toByte).put('D'.toByte).put('G'.toByte)
    bb.put(1.toByte)
    bb.putDouble(compression)
    bb.putDouble(minV)
    bb.putDouble(maxV)
    bb.putInt(nCentroids)
    var i = 0
    while (i < nCentroids) {
      bb.putDouble(means(i)); bb.putDouble(weights(i))
      i += 1
    }
    bb.array()
  }
}

object TDigest {
  val DefaultCompression = 100.0

  def empty(compression: Double = DefaultCompression): TDigest = {
    require(compression >= 20, s"compression must be >= 20, got $compression")
    new TDigest(compression, new Array[Double](0), new Array[Double](0), 0, 0.0,
      Double.PositiveInfinity, Double.NegativeInfinity)
  }

  def fromBytes(data: Array[Byte]): TDigest = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < 33) fail("Invalid TDG data: too short for header")
    if (data(0) != 'G' || data(1) != 'T' || data(2) != 'D' || data(3) != 'G')
      fail("Invalid TDG data: wrong magic bytes")
    if (data(4) != 1) fail(s"Unsupported TDG version: ${data(4)}")
    val bb = ByteBuffer.wrap(data, 5, data.length - 5).order(ByteOrder.BIG_ENDIAN)
    val compression = bb.getDouble
    val minV = bb.getDouble
    val maxV = bb.getDouble
    val n = bb.getInt
    if (n < 0 || data.length != 33 + n * 16)
      fail(s"Invalid TDG data: expected ${33 + n.max(0) * 16} bytes, got ${data.length}")
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var total = 0.0
    var i = 0
    while (i < n) {
      means(i) = bb.getDouble
      weights(i) = bb.getDouble
      total += weights(i)
      i += 1
    }
    new TDigest(compression, means, weights, n, total, minV, maxV)
  }
}
