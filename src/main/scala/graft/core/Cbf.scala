package graft.core

/** Counting Bloom filter, CBF-512 — the reference's planned "Counting BF"
  * variant (`/root/reference/CHANGELOG.md:9-11`, roadmap only; no reference
  * implementation exists, so this is a parity-plus design, not a port).
  *
  * Geometry is IDENTICAL to [[Sbbf]] (SBBF-512): same capacity/fp_rate
  * sizing, same block selection (upper 32 hash bits, unsigned modulo),
  * same 8 salted multiply-shift probes — one cell per bit position, so
  * the false-positive analysis of the SBBF carries over unchanged when
  * no over-deletion occurs. Each 512-bit block becomes 512 SIGNED 32-bit
  * counter cells (2 KB/block, 32x the SBBF's memory — the price of
  * deletion support).
  *
  * Signed cells make the filter a MERGEABLE MULTISET under addition:
  *   - `add(key, +1)` inserts, `add(key, -1)` deletes;
  *   - merge = cell-wise add — commutative/associative with the zero
  *     filter as identity, so Spark partial aggregation is correct under
  *     any partitioning AND any insert/delete interleaving (a delete may
  *     arrive in a different partition, or earlier, than its insert:
  *     intermediate cells go negative, the merged total is exact);
  *   - `contains` = all 8 probed cells > 0: zero false negatives for any
  *     key with positive net count, false positives at the SBBF rate;
  *   - `count` = min of the 8 probed cells: an UPPER bound on the key's
  *     net count (count-min style), never an underestimate.
  *
  * Caveat (standard for counting filters): deleting a key that was never
  * inserted corrupts neighboring guarantees. Cell arithmetic SATURATES at
  * the int32 rails (unreachable at capacity-bounded +1/-1 use, but
  * `cbf_agg_weighted` takes arbitrary user weights): a saturated cell
  * stays pinned rather than wrapping negative, so membership never gains
  * a false negative; per-key counts above Int.MaxValue are clamped.
  *
  * Wire format ABCM v1: mirrors ABLM v2's layout (`to_bytes`,
  * `/root/reference/abloom/_abloom.c:350-396`) — 30-byte header (4 magic
  * "ABCM" + 1 version + 8 BE capacity + 8 BE fp-rate raw bits + 8 BE
  * block count + 1 flags) followed by big-endian int32 cells.
  */
final class Cbf private[core] (
    val capacity: Long,
    val fpRateBits: Long,
    val blockCount: Long,
    val cells: Array[Int]) extends Serializable {

  def fpRate: Double = java.lang.Double.longBitsToDouble(fpRateBits)

  // Lemire–Kaser exact fastmod for the block select (see [[Sbbf]] — same
  // derivation, bit-identical to remainderUnsigned for u32 inputs)
  private val modMagic: Long = java.lang.Long.divideUnsigned(-1L, blockCount) + 1L

  @inline private def mulHiU(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  @inline private def cellBase(hash: Long): Int =
    (mulHiU(modMagic * (hash >>> 32), blockCount) * Cbf.BlockCells).toInt

  // ----------------------------------------------------------- add / probe

  /** Saturating int32 add with a STICKY positive rail: once a cell has
    * hit Int.MaxValue it stays pinned there forever (adds of either sign
    * are ignored); below the rail, sums clamp at Int.MinValue. Rationale:
    *  - wraparound would flip a heavily-weighted cell negative — a
    *    positive-net key probing FALSE, the one thing the filter must
    *    never do;
    *  - a non-sticky clamp has a subtler FN: clamp loses positive weight,
    *    so a later delete could take the cell below the key's true net
    *    (add MAX, add MAX, delete MAX -> cell 0, net +MAX — probed
    *    FALSE). Pinning makes an overflowed cell permanently >= any
    *    representable net: zero FN always, at the cost of `count` (and
    *    deletes through that cell) degrading to an overestimate — the
    *    correct direction for both guarantees.
    *  - the NEGATIVE rail is deliberately not sticky: a massively
    *    over-deleted cell must be able to recover when real inserts
    *    arrive, or those future keys would gain false negatives.
    * At the rails the add is no longer strictly associative (clamping
    * loses information); every order still preserves cell >= min(true
    * sum, Int.MaxValue), which is the invariant the guarantees need.
    */
  @inline private def satAdd(idx: Int, w: Int): Unit = {
    val c = cells(idx)
    if (c != Int.MaxValue) {
      val s = c.toLong + w
      cells(idx) =
        if (s > Int.MaxValue) Int.MaxValue
        else if (s < Int.MinValue) Int.MinValue
        else s.toInt
    }
  }

  /** Add `weight` (use +1 to insert, -1 to delete) for a pre-computed
    * 64-bit key hash. Same probe derivation as `bloom_insert`
    * (`_abloom.c:132-149`): block from the upper 32 bits, one cell per
    * salted multiply-shift of the lower 32. Cell arithmetic saturates
    * (see [[satAdd]]) — `cbf_agg_weighted` accepts arbitrary user
    * weights, so overflow must not corrupt the no-FN guarantee.
    */
  def addHash(hash: Long, weight: Int): Unit = {
    val hLow = hash.toInt
    val base = cellBase(hash)
    var i = 0
    while (i < Sbbf.BlockWords) {
      val cell = ((hLow * Sbbf.Salt(i)) >>> 26) + i * 64
      satAdd(base + cell, weight)
      i += 1
    }
  }

  def insertHash(hash: Long): Unit = addHash(hash, 1)
  def removeHash(hash: Long): Unit = addHash(hash, -1)

  /** All 8 probed cells strictly positive — zero FN for net-present keys. */
  def checkHash(hash: Long): Boolean = {
    val hLow = hash.toInt
    val base = cellBase(hash)
    var i = 0
    while (i < Sbbf.BlockWords) {
      if (cells(base + ((hLow * Sbbf.Salt(i)) >>> 26) + i * 64) <= 0) return false
      i += 1
    }
    true
  }

  /** Count-min style net-count upper bound (clamped at 0). */
  def countHash(hash: Long): Long = {
    val hLow = hash.toInt
    val base = cellBase(hash)
    var min = Int.MaxValue
    var i = 0
    while (i < Sbbf.BlockWords) {
      val v = cells(base + ((hLow * Sbbf.Salt(i)) >>> 26) + i * 64)
      if (v < min) min = v
      i += 1
    }
    math.max(0, min).toLong
  }

  // typed key surface (same serializable-mode hash rules as Sbbf)
  def add(key: String, weight: Int = 1): Unit = addHash(Hashing.hashString(key), weight)
  def add(key: Long, weight: Int): Unit = addHash(Hashing.hashLong(key), weight)
  def add(key: Array[Byte], weight: Int): Unit = addHash(Hashing.hashBytes(key), weight)
  def contains(key: String): Boolean = checkHash(Hashing.hashString(key))
  def contains(key: Long): Boolean = checkHash(Hashing.hashLong(key))
  def count(key: String): Long = countHash(Hashing.hashString(key))
  def count(key: Long): Long = countHash(Hashing.hashLong(key))

  // ---------------------------------------------------------------- algebra

  def compatible(other: Cbf): Boolean =
    capacity == other.capacity && fpRateBits == other.fpRateBits

  private def requireCompatible(other: Cbf): Unit =
    if (!compatible(other))
      throw new IllegalArgumentException(
        "CountingBloomFilters must have the same capacity and fp_rate")

  /** In-place cell-wise SATURATING add — THE merge (commutative,
    * associative, zero-filter identity for all cells within int32 range,
    * i.e. every realistic capacity-bounded use). Once a cell hits a rail
    * (>= 2^31 cumulative weight) its value is a clamp, not a sum: counts
    * become approximate-but-positive and may differ slightly by merge
    * order — the deliberate trade against silent wraparound, which would
    * flip the cell negative and produce false negatives.
    *
    * The positive rail is ABSORBING across merges: a pinned
    * (Int.MaxValue) cell in EITHER input pins the result. Without this,
    * merging a pinned cell into a locally NEGATIVE cell would compute
    * MaxValue + negative and un-pin it — violating the documented
    * invariant `cell >= min(true sum, Int.MaxValue)` when one partition
    * drove the cell past the rail while another went net-negative
    * (cross-filter sticky-rail property test pins this). Returns this.
    */
  def addInPlace(other: Cbf): Cbf = {
    requireCompatible(other)
    var i = 0
    while (i < cells.length) {
      if (other.cells(i) == Int.MaxValue) cells(i) = Int.MaxValue
      else satAdd(i, other.cells(i))
      i += 1
    }
    this
  }

  def isEmpty: Boolean = {
    var i = 0
    while (i < cells.length) { if (cells(i) != 0) return false; i += 1 }
    true
  }

  def copy(): Cbf = new Cbf(capacity, fpRateBits, blockCount, cells.clone())

  override def equals(o: Any): Boolean = o match {
    case that: Cbf =>
      compatible(that) && java.util.Arrays.equals(cells, that.cells)
    case _ => false
  }
  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(cells) + capacity.hashCode

  override def toString: String =
    s"<Cbf capacity=$capacity fp_rate=$fpRate blocks=$blockCount>"

  def byteCount: Long = blockCount * Cbf.BlockCells * 4L

  // ------------------------------------------------------------------ wire

  /** ABCM v1 wire bytes: 30-byte header + big-endian int32 cells. */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](Cbf.HeaderSize + cells.length * 4)
    out(0) = 'A'; out(1) = 'B'; out(2) = 'C'; out(3) = 'M'
    out(4) = Cbf.Version
    Sbbf.writeBE64(out, 5, capacity)
    Sbbf.writeBE64(out, 13, fpRateBits)
    Sbbf.writeBE64(out, 21, blockCount)
    out(29) = 0
    var i = 0
    var off = Cbf.HeaderSize
    while (i < cells.length) {
      val v = cells(i)
      out(off) = (v >>> 24).toByte
      out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte
      out(off + 3) = v.toByte
      i += 1
      off += 4
    }
    out
  }
}

object Cbf {
  final val BlockCells = 512 // one int cell per SBBF bit position
  final val HeaderSize = 30
  final val Version: Byte = 1

  /** New zeroed filter — same parameter validation and sizing as
    * [[Sbbf.empty]] so a CBF and an SBBF of the same (capacity, fp_rate)
    * probe identical (block, cell) coordinates.
    */
  def empty(capacity: Long, fpRate: Double): Cbf = {
    if (capacity <= 0)
      throw new IllegalArgumentException("Capacity must be greater than 0")
    if (!(fpRate > 0.0 && fpRate < 1.0))
      throw new IllegalArgumentException(
        "False positive rate must be between 0.0 and 1.0")
    val blocks = Sbbf.blockCountFor(capacity, fpRate)
    // the binding cap is the WIRE blob (HeaderSize + cells*4 must fit one
    // byte array — the aggregate always serializes for the shuffle), which
    // is tighter than the cells-array cap; failing here keeps the clean
    // construction-time error instead of a NegativeArraySizeException in
    // toBytes after an expensive build
    if (blocks > (Int.MaxValue.toLong - HeaderSize) / (BlockCells * 4L))
      throw new IllegalArgumentException(
        s"Capacity too large for a single JVM array: $blocks blocks")
    new Cbf(capacity, java.lang.Double.doubleToRawLongBits(fpRate), blocks,
      new Array[Int](blocks.toInt * BlockCells))
  }

  /** Parse + validate ABCM v1 bytes — the same validation battery as
    * [[Sbbf.fromBytes]] (magic, version, exact length, capacity, fp_rate
    * range, block-count consistency), via the shared header validator.
    */
  def fromBytes(data: Array[Byte]): Cbf = {
    val (capacity, fpRateBits, blockCount) =
      Sbbf.validateHeader(data, "ABCM", Version, BlockCells * 4L)
    val cells = new Array[Int](blockCount.toInt * BlockCells)
    var i = 0
    var off = HeaderSize
    while (i < cells.length) {
      cells(i) = ((data(off) & 0xff) << 24) |
        ((data(off + 1) & 0xff) << 16) |
        ((data(off + 2) & 0xff) << 8) |
        (data(off + 3) & 0xff)
      i += 1
      off += 4
    }
    new Cbf(capacity, fpRateBits, blockCount, cells)
  }
}
