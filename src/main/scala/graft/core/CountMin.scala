package graft.core

/** Count-min sketch (Cormode & Muthukrishnan 2005): depth x width counter
  * matrix; point query = min over rows; guarantees, with probability
  * >= 1 - delta, `true <= estimate <= true + eps * N` where N is the total
  * added count.
  *
  * width = ceil(e / eps), depth = ceil(ln(1 / delta)).
  *
  * Row hashes derive from the single 64-bit key hash via the
  * Kirsch-Mitzenmacher double-hashing construction h_i = h1 + i*h2
  * (public result: preserves CM guarantees), mirroring the reference's
  * "one hash per key, everything derives from it" design.
  *
  * merge = cell-wise add (commutative/associative; NOT idempotent — like
  * any counter, Spark must not replay rows, which its aggregation contract
  * guarantees).
  */
final class CountMin private[core] (
    val depth: Int,
    val width: Int,
    val counters: Array[Long], // depth * width, row-major
    private var totalCount: Long) extends Serializable {

  def total: Long = totalCount

  def addHash(hash: Long, count: Long = 1L): Unit = {
    val h2 = Hashing.mix64(hash) | 1L // odd second hash
    var i = 0
    while (i < depth) {
      val cell = java.lang.Long.remainderUnsigned(hash + i.toLong * h2, width.toLong).toInt
      counters(i * width + cell) += count
      i += 1
    }
    totalCount += count
  }

  def queryHash(hash: Long): Long = {
    val h2 = Hashing.mix64(hash) | 1L
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val cell = java.lang.Long.remainderUnsigned(hash + i.toLong * h2, width.toLong).toInt
      val v = counters(i * width + cell)
      if (v < min) min = v
      i += 1
    }
    min
  }

  def merge(other: CountMin): CountMin = {
    require(depth == other.depth && width == other.width,
      "Cannot merge count-min sketches with different dimensions")
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
    totalCount += other.totalCount
    this
  }

  /** Overestimate bound additive term: eps * N with eps = e / width. */
  def errorBound: Long = math.ceil(math.E / width * totalCount).toLong

  def copy(): CountMin = new CountMin(depth, width, counters.clone(), totalCount)

  override def equals(o: Any): Boolean = o match {
    case that: CountMin => depth == that.depth && width == that.width &&
      totalCount == that.totalCount && java.util.Arrays.equals(counters, that.counters)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(counters)

  /** Wire format: "GCMS" + version(1) + depth(4 BE) + width(4 BE) +
    * total(8 BE) + counters(8 BE each).
    */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](21 + counters.length * 8)
    out(0) = 'G'; out(1) = 'C'; out(2) = 'M'; out(3) = 'S'
    out(4) = 1
    writeBE32(out, 5, depth)
    writeBE32(out, 9, width)
    Sbbf.writeBE64(out, 13, totalCount)
    var i = 0
    while (i < counters.length) {
      Sbbf.writeBE64(out, 21 + i * 8, counters(i))
      i += 1
    }
    out
  }

  private def writeBE32(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >>> 24).toByte
    buf(off + 1) = (v >>> 16).toByte
    buf(off + 2) = (v >>> 8).toByte
    buf(off + 3) = v.toByte
  }
}

object CountMin {

  /** Sized from the published (eps, delta) guarantees. */
  def forError(eps: Double, delta: Double): CountMin = {
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    require(delta > 0 && delta < 1, "delta must be in (0, 1)")
    val width = math.ceil(math.E / eps).toInt
    val depth = math.ceil(math.log(1.0 / delta)).toInt.max(1)
    empty(depth, width)
  }

  def empty(depth: Int, width: Int): CountMin = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    new CountMin(depth, width, new Array[Long](depth * width), 0L)
  }

  def fromBytes(data: Array[Byte]): CountMin = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < 21) fail("Invalid CMS data: too short for header")
    if (data(0) != 'G' || data(1) != 'C' || data(2) != 'M' || data(3) != 'S')
      fail("Invalid CMS data: wrong magic bytes")
    if (data(4) != 1) fail(s"Unsupported CMS version: ${data(4)}")
    val depth = readBE32(data, 5)
    val width = readBE32(data, 9)
    if (depth <= 0 || width <= 0) fail("Invalid CMS data: non-positive dimensions")
    val expected = 21L + depth.toLong * width * 8
    if (data.length.toLong != expected)
      fail(s"Invalid CMS data: expected $expected bytes, got ${data.length}")
    val total = Sbbf.readBE64(data, 13)
    val counters = new Array[Long](depth * width)
    var i = 0
    while (i < counters.length) {
      counters(i) = Sbbf.readBE64(data, 21 + i * 8)
      i += 1
    }
    new CountMin(depth, width, counters, total)
  }

  private def readBE32(buf: Array[Byte], off: Int): Int =
    ((buf(off) & 0xff) << 24) | ((buf(off + 1) & 0xff) << 16) |
      ((buf(off + 2) & 0xff) << 8) | (buf(off + 3) & 0xff)
}
