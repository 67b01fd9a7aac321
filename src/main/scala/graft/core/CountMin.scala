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
  private[core] def addTotal(c: Long): Unit = totalCount += c
  private[core] def setTotal(c: Long): Unit = totalCount = c

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

  /** AMS/CMS inner-product estimate of sum_k fA(k)*fB(k) — the join
    * cardinality of two key streams on their shared key (Cormode &
    * Muthukrishnan 2005, §4.2): min over rows of the row-wise dot
    * product. NEVER underestimates the true inner product (collisions
    * only add non-negative cross terms) and overestimates by at most
    * eps * totalA * totalB with probability 1 - delta. The row hash
    * derivation is a pure function of (key hash, row), so any two
    * sketches with equal dimensions are compatible. Saturates toward the
    * sign of the true result instead of overflowing (10^12-row streams
    * can legitimately exceed 2^63 in a product; negative cells from
    * weighted deletes can overflow downward).
    */
  def innerProduct(other: CountMin): Long = {
    require(depth == other.depth && width == other.width,
      "Cannot inner-product count-min sketches with different dimensions")
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      var sum = 0L
      var j = 0
      // a rail-pinned row sum stays pinned (saturation, either direction)
      while (j < width && sum != Long.MaxValue && sum != Long.MinValue) {
        val a = counters(i * width + j)
        val b = other.counters(i * width + j)
        if (a != 0L && b != 0L) {
          // EXACT signed multiply/add, saturating on true overflow TOWARD
          // THE SIGN OF THE TRUE RESULT: weighted deletes can leave
          // negative cells, and saturating a hugely-negative product to
          // +MaxValue would RAISE the min-over-rows estimate
          val p =
            try Math.multiplyExact(a, b)
            catch { case _: ArithmeticException =>
              if ((a > 0L) == (b > 0L)) Long.MaxValue else Long.MinValue }
          sum =
            if (p == Long.MaxValue || p == Long.MinValue) p
            else try Math.addExact(sum, p)
            catch { case _: ArithmeticException =>
              // addExact only overflows when sum and p share p's sign
              if (p > 0L) Long.MaxValue else Long.MinValue }
        }
        j += 1
      }
      if (sum < min) min = sum
      i += 1
    }
    min
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

  /** Content-canonical wire bytes (dense v1 or sparse v2, whichever is
    * smaller — [[CountMin.encode]]).
    */
  def toBytes: Array[Byte] = CountMin.encode(depth, width, totalCount, counters)
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

  /** Sparse v2 is emitted iff `25 + 12c < 21 + 8*cells`, i.e.
    * `c < (8*cells - 4) / 12` — strictly smaller than dense, a pure
    * function of counter content.
    */
  private[core] def sparseCutoff(cells: Int): Long = (8L * cells - 4L) / 12L

  /** Canonical encoder: counts nonzero cells and picks the smaller
    * encoding. Dense v1: "GCMS" 1 depth width total + cells x 8 BE.
    * Sparse v2: "GCMS" 2 depth width total + count(4 BE) + count x
    * (cellIdx 4 BE, value 8 BE) in ascending cellIdx order.
    */
  private[core] def encode(
      depth: Int, width: Int, total: Long, counters: Array[Long]): Array[Byte] = {
    var c = 0
    var i = 0
    while (i < counters.length) { if (counters(i) != 0L) c += 1; i += 1 }
    if (c < sparseCutoff(counters.length)) {
      val out = new Array[Byte](25 + 12 * c)
      writeHeader(out, 2, depth, width, total)
      writeBE32(out, 21, c)
      var o = 25
      i = 0
      while (i < counters.length) {
        if (counters(i) != 0L) {
          writeBE32(out, o, i)
          Sbbf.writeBE64(out, o + 4, counters(i))
          o += 12
        }
        i += 1
      }
      out
    } else {
      val out = new Array[Byte](21 + counters.length * 8)
      writeHeader(out, 1, depth, width, total)
      i = 0
      while (i < counters.length) {
        Sbbf.writeBE64(out, 21 + i * 8, counters(i))
        i += 1
      }
      out
    }
  }

  private def writeHeader(
      out: Array[Byte], version: Int, depth: Int, width: Int, total: Long): Unit = {
    out(0) = 'G'; out(1) = 'C'; out(2) = 'M'; out(3) = 'S'
    out(4) = version.toByte
    writeBE32(out, 5, depth)
    writeBE32(out, 9, width)
    Sbbf.writeBE64(out, 13, total)
  }

  private[core] def writeBE32(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >>> 24).toByte
    buf(off + 1) = (v >>> 16).toByte
    buf(off + 2) = (v >>> 8).toByte
    buf(off + 3) = v.toByte
  }

  /** Validate magic/version/dimensions; returns (depth, width, total). */
  private[core] def validateHeader(data: Array[Byte]): (Int, Int, Long) = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < 21) fail("Invalid CMS data: too short for header")
    if (data(0) != 'G' || data(1) != 'C' || data(2) != 'M' || data(3) != 'S')
      fail("Invalid CMS data: wrong magic bytes")
    val version = data(4)
    if (version != 1 && version != 2) fail(s"Unsupported CMS version: $version")
    val depth = readBE32(data, 5)
    val width = readBE32(data, 9)
    if (depth <= 0 || width <= 0) fail("Invalid CMS data: non-positive dimensions")
    if (depth.toLong * width > Int.MaxValue) fail("Invalid CMS data: dimensions overflow")
    (depth, width, Sbbf.readBE64(data, 13))
  }

  /** Validate and stream a sparse v2 payload's (cellIdx, value) pairs. */
  private[core] def forEachSparseCell(
      data: Array[Byte], cells: Int)(sink: (Int, Long) => Unit): Unit = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < 25) fail("Invalid CMS data: too short for sparse header")
    val c = readBE32(data, 21)
    if (c < 0 || c >= sparseCutoff(cells))
      fail(s"Invalid CMS data: sparse count $c out of range")
    if (data.length.toLong != 25L + 12L * c)
      fail(s"Invalid CMS data: expected ${25L + 12L * c} bytes, got ${data.length}")
    var prev = -1
    var i = 0
    while (i < c) {
      val idx = readBE32(data, 25 + 12 * i)
      val v = Sbbf.readBE64(data, 29 + 12 * i)
      if (idx < 0 || idx >= cells) fail(s"Invalid CMS data: cell index $idx out of range")
      if (idx <= prev) fail("Invalid CMS data: sparse cells not strictly ascending")
      if (v == 0L) fail("Invalid CMS data: sparse zero cell")
      prev = idx
      sink(idx, v)
      i += 1
    }
  }

  def fromBytes(data: Array[Byte]): CountMin = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    val (depth, width, total) = validateHeader(data)
    val cells = depth * width
    val counters = new Array[Long](cells)
    if (data(4) == 1) {
      val expected = 21L + cells.toLong * 8
      if (data.length.toLong != expected)
        fail(s"Invalid CMS data: expected $expected bytes, got ${data.length}")
      var i = 0
      while (i < cells) {
        counters(i) = Sbbf.readBE64(data, 21 + i * 8)
        i += 1
      }
    } else {
      forEachSparseCell(data, cells)((idx, v) => counters(idx) = v)
    }
    new CountMin(depth, width, counters, total)
  }

  private def readBE32(buf: Array[Byte], off: Int): Int =
    ((buf(off) & 0xff) << 24) | ((buf(off + 1) & 0xff) << 16) |
      ((buf(off + 2) & 0xff) << 8) | (buf(off + 3) & 0xff)
}

/** Memory-adaptive count-min AGGREGATION BUFFER, the CMS analogue of
  * [[HllBuffer]] and the bigger win: a dense eps=1e-3, delta=1e-2 CMS is
  * `5 x 2719` longs = ~106 KB per group regardless of what the group saw.
  * The buffer keeps touched cells in an open-addressing (cellIdx -> count)
  * table (~24 B per touched cell) and promotes to the dense matrix past
  * cells/3 entries; the wire codec's sparse v2 encoding (chosen
  * content-canonically in [[CountMin.encode]]) shrinks partial-shuffle
  * rows the same way. Counts, queries, and bytes are identical to the
  * dense path under any merge order / promotion history.
  */
final class CountMinBuffer private (val depth: Int, val width: Int)
    extends Serializable {
  import CountMinBuffer._

  private val cells = depth * width
  private var dense: CountMin = _
  private var keys: Array[Int] = new Array[Int](InitialCapacity) // cellIdx+1; 0=empty
  private var vals: Array[Long] = new Array[Long](InitialCapacity)
  private var entries = 0
  private var totalCount = 0L
  private val promoteAt: Int =
    math.min(math.max(16L, cells / 3L), CountMin.sparseCutoff(cells) - 1L).toInt

  def isSparse: Boolean = dense == null
  def total: Long = if (dense == null) totalCount else dense.total

  def addHash(hash: Long, count: Long = 1L): Unit = {
    if (dense != null) { dense.addHash(hash, count); return }
    val h2 = Hashing.mix64(hash) | 1L
    var i = 0
    while (i < depth) {
      val cell = java.lang.Long.remainderUnsigned(hash + i.toLong * h2, width.toLong).toInt
      addCell(i * width + cell, count)
      if (dense != null) { // promoted mid-row: finish remaining rows densely
        var j = i + 1
        while (j < depth) {
          val cj = java.lang.Long.remainderUnsigned(hash + j.toLong * h2, width.toLong).toInt
          dense.counters(j * width + cj) += count
          j += 1
        }
        // promote() copied totalCount accumulated so far; account this row
        denseAddTotal(count)
        return
      }
      i += 1
    }
    totalCount += count
  }

  private def denseAddTotal(count: Long): Unit = {
    // CountMin.totalCount is private; reconstruct via merge of an empty
    // delta — cheaper: track through a tiny adder sketch would be silly,
    // so CountMin exposes addTotal within the package
    dense.addTotal(count)
  }

  def queryHash(hash: Long): Long = {
    if (dense != null) return dense.queryHash(hash)
    val h2 = Hashing.mix64(hash) | 1L
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val cell = java.lang.Long.remainderUnsigned(hash + i.toLong * h2, width.toLong).toInt
      val v = cellValue(i * width + cell)
      if (v < min) min = v
      i += 1
    }
    min
  }

  private def cellValue(cellIdx: Int): Long = {
    val mask = keys.length - 1
    var s = (cellIdx * 0x9E3779B9) & mask
    while (true) {
      val k = keys(s)
      if (k == 0) return 0L
      if (k - 1 == cellIdx) return vals(s)
      s = (s + 1) & mask
    }
    0L // unreachable
  }

  private def addCell(cellIdx: Int, count: Long): Unit = {
    if (dense != null) { // may promote mid-decode/merge (v2 wire holds up to ~2cells/3, promoteAt ~cells/3)
      dense.counters(cellIdx) += count
      return
    }
    val mask = keys.length - 1
    var s = (cellIdx * 0x9E3779B9) & mask
    while (true) {
      val k = keys(s)
      if (k == 0) {
        keys(s) = cellIdx + 1
        vals(s) = count
        entries += 1
        if (entries > promoteAt) promote()
        else if (entries * 2 > keys.length) grow()
        return
      } else if (k - 1 == cellIdx) {
        vals(s) += count
        return
      }
      s = (s + 1) & mask
    }
  }

  private def grow(): Unit = {
    val ok = keys
    val ov = vals
    keys = new Array[Int](ok.length * 2)
    vals = new Array[Long](ok.length * 2)
    val mask = keys.length - 1
    var i = 0
    while (i < ok.length) {
      val k = ok(i)
      if (k != 0) {
        var s = ((k - 1) * 0x9E3779B9) & mask
        while (keys(s) != 0) s = (s + 1) & mask
        keys(s) = k
        vals(s) = ov(i)
      }
      i += 1
    }
  }

  private def promote(): Unit = {
    val counters = new Array[Long](cells)
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0) counters(keys(i) - 1) += vals(i)
      i += 1
    }
    dense = new CountMin(depth, width, counters, totalCount)
    keys = null
    vals = null
    entries = 0
    totalCount = 0L
  }

  /** In-place cell-wise add; promotes if the union outgrows the cap. */
  def mergeIn(other: CountMinBuffer): CountMinBuffer = {
    require(depth == other.depth && width == other.width,
      "Cannot merge count-min buffers with different dimensions")
    if (other.dense != null) {
      if (dense == null) promote()
      dense.merge(other.dense)
    } else {
      var i = 0
      while (i < other.keys.length) {
        val k = other.keys(i)
        if (k != 0) {
          if (dense != null) dense.counters(k - 1) += other.vals(i)
          else addCell(k - 1, other.vals(i))
        }
        i += 1
      }
      if (dense != null) dense.addTotal(other.totalCount)
      else totalCount += other.totalCount
    }
    this
  }

  /** Materialize as a dense [[CountMin]] (copy; the buffer stays usable). */
  def toCountMin: CountMin = {
    if (dense != null) dense.copy()
    else {
      val counters = new Array[Long](cells)
      var i = 0
      while (i < keys.length) {
        if (keys(i) != 0) counters(keys(i) - 1) += vals(i)
        i += 1
      }
      new CountMin(depth, width, counters, totalCount)
    }
  }

  /** Content-canonical bytes — identical to `toCountMin.toBytes` always;
    * the sparse path avoids materializing the dense matrix.
    */
  def toBytes: Array[Byte] = {
    if (dense != null) CountMin.encode(depth, width, dense.total, dense.counters)
    else {
      // gather (cellIdx, value) pairs with value != 0 (negative-weight
      // merges can cancel a cell to zero; canonical form omits it)
      var c = 0
      var i = 0
      while (i < keys.length) {
        if (keys(i) != 0 && vals(i) != 0L) c += 1
        i += 1
      }
      // sparse invariant: entries <= promoteAt < cutoff
      val idxs = new Array[Long](c) // (cellIdx << 1) packed for sort: use Long (idx, slot)
      var n = 0
      i = 0
      while (i < keys.length) {
        if (keys(i) != 0 && vals(i) != 0L) {
          idxs(n) = ((keys(i) - 1).toLong << 32) | i.toLong
          n += 1
        }
        i += 1
      }
      java.util.Arrays.sort(idxs)
      val out = new Array[Byte](25 + 12 * c)
      out(0) = 'G'; out(1) = 'C'; out(2) = 'M'; out(3) = 'S'
      out(4) = 2
      CountMin.writeBE32(out, 5, depth)
      CountMin.writeBE32(out, 9, width)
      Sbbf.writeBE64(out, 13, totalCount)
      CountMin.writeBE32(out, 21, c)
      i = 0
      while (i < c) {
        val cellIdx = (idxs(i) >>> 32).toInt
        val slot = (idxs(i) & 0xffffffffL).toInt
        CountMin.writeBE32(out, 25 + 12 * i, cellIdx)
        Sbbf.writeBE64(out, 29 + 12 * i, vals(slot))
        i += 1
      }
      out
    }
  }
}

object CountMinBuffer {
  private val InitialCapacity = 16 // power of two

  /** Same geometry as [[CountMin.forError]] WITHOUT allocating the dense
    * matrix — this runs once per group buffer (audited constant).
    */
  def forError(eps: Double, delta: Double): CountMinBuffer = {
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    require(delta > 0 && delta < 1, "delta must be in (0, 1)")
    val width = math.ceil(math.E / eps).toInt
    val depth = math.ceil(math.log(1.0 / delta)).toInt.max(1)
    empty(depth, width)
  }

  def empty(depth: Int, width: Int): CountMinBuffer = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    require(depth.toLong * width <= Int.MaxValue, "dimensions overflow")
    new CountMinBuffer(depth, width)
  }

  /** Decode either wire version: sparse v2 decodes DIRECTLY into the
    * sparse table — no transient dense matrix on the merge path (the 100
    * TB final stage deserializes once per incoming partial row); dense v1
    * stays dense. Validation matches [[CountMin.fromBytes]] exactly.
    */
  def fromBytes(data: Array[Byte]): CountMinBuffer = {
    if (data.length >= 5 && data(4) == 2) {
      val (depth, width, total) = CountMin.validateHeader(data)
      val b = new CountMinBuffer(depth, width)
      CountMin.forEachSparseCell(data, depth * width) { (idx, v) =>
        b.addCell(idx, v)
      }
      if (b.dense == null) b.totalCount = total
      else b.dense.setTotal(total)
      b
    } else {
      val cm = CountMin.fromBytes(data) // full validation
      val b = new CountMinBuffer(cm.depth, cm.width)
      b.dense = cm
      b.keys = null
      b.vals = null
      b
    }
  }
}
