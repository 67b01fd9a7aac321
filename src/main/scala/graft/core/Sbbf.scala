package graft.core


/** Split Block Bloom Filter, SBBF-512 — bit-exact re-expression of the
  * reference's `BloomFilter` (`/root/reference/abloom/_abloom.c`).
  *
  * Layout: `blockCount` blocks of 512 bits (8 x 64-bit words), flat
  * `Array[Long]`. One 64-bit hash per key: upper 32 bits select the block
  * (modulo — NOT pow2 mask, a deliberate memory/speed trade in the
  * reference, `docs/IMPLEMENTATION.md:43-45`), lower 32 bits drive 8
  * salted multiply-shift probes, one bit per word (`_abloom.c:132-171`).
  *
  * Guarantees (mirrored from the reference test suite):
  *   - zero false negatives, ever;
  *   - empirical FPR <= 1.05 x target at capacity;
  *   - `or` is commutative, associative, idempotent, with the empty filter
  *     as identity — exactly the laws Spark requires of an aggregation
  *     buffer merge for correct partial (map-side) aggregation.
  *
  * Not thread-safe: one instance per aggregation buffer / partition,
  * which is Spark's execution contract (the reference's `free_threading`
  * atomics mode is replaced by partition isolation + merge; the wire-format
  * flag byte is kept, always 0 — SURVEY.md §2.8).
  */
final class Sbbf private[core] (
    val capacity: Long,
    val fpRateBits: Long, // raw IEEE-754 bits: round-trips exactly (_abloom.c:376-382)
    val blockCount: Long,
    val words: Array[Long],
    val freeThreading: Boolean) extends Serializable {

  def fpRate: Double = java.lang.Double.longBitsToDouble(fpRateBits)

  /** Lemire–Kaser fastmod magic for `x % blockCount` without the 64-bit
    * divider: `M = floor(2^64 / d) + 1`; then for any u32 numerator n,
    * `n % d = mulHiU(M * n, d)` EXACTLY (n and d both < 2^32 here —
    * block-select input is `hash >>> 32` and `blockCount` is capped by
    * the array guard). Bit-identical to `remainderUnsigned`, ~3 multiply
    * latencies instead of a 20-90-cycle unpipelined divide per key —
    * the divide was a hard serial cost on every insert AND probe.
    * (Published technique: Lemire, Kaser, Kurz, "Faster remainder by
    * direct computation", Software: Practice & Experience 49(6), 2019.)
    */
  private val modMagic: Long = java.lang.Long.divideUnsigned(-1L, blockCount) + 1L

  /** Unsigned 64x64 -> high 64 multiply (Math.multiplyHigh is a JDK 17
    * intrinsic; the two corrective terms lift signed to unsigned).
    */
  @inline private def mulHiU(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** Word-array base offset of the key's block: `((hash>>>32) % blockCount) * 8`. */
  @inline private def blockBase(hash: Long): Int =
    (mulHiU(modMagic * (hash >>> 32), blockCount) * Sbbf.BlockWords).toInt

  // ------------------------------------------------------------- insert / probe

  /** Insert a pre-computed 64-bit key hash (`bloom_insert`, `_abloom.c:132-149`). */
  def insertHash(hash: Long): Unit = {
    val hLow = hash.toInt // lower 32 bits, uint32 semantics via Int wrap-around
    val base = blockBase(hash)
    var i = 0
    while (i < Sbbf.BlockWords) {
      // 32-bit wrap-around multiply (C uint32_t), then top-6-bit shift -> 0..63
      words(base + i) |= 1L << ((hLow * Sbbf.Salt(i)) >>> 26)
      i += 1
    }
  }

  /** Batched insert of `len` pre-computed hashes. Semantically identical
    * to calling [[insertHash]] per element (OR order is irrelevant).
    * NOTE: a two-phase "compute bases + dependent-read prefetch, then
    * insert" variant was measured on this host and was NOT faster —
    * once the block-select divide is gone (fastmod above), the plain
    * loop already reaches the line-fill-buffer miss-parallelism limit;
    * see BENCH/BASELINE.md §1.
    */
  def insertHashes(hashes: Array[Long], offset: Int, len: Int): Unit = {
    var i = offset
    val end = offset + len
    while (i < end) { insertHash(hashes(i)); i += 1 }
  }

  /** Batched [[insertHashAtomic]] (see [[insertHashes]] note). */
  def insertHashesAtomic(hashes: Array[Long], offset: Int, len: Int): Unit = {
    var i = offset
    val end = offset + len
    while (i < end) { insertHashAtomic(hashes(i)); i += 1 }
  }

  /** Lock-free concurrent insert: atomic fetch-OR per word — the
    * reference's `free_threading=True` mode (`_abloom.c:137-144`, C11
    * `atomic_fetch_or`). Used by the per-executor shared-filter build
    * (multiple Spark tasks of one executor inserting into a single
    * filter), which keeps the merge fan-in at O(executors) instead of
    * O(partitions) and the insert working set at one filter per node.
    * Bit-equivalent to sequential insert for any interleaving (OR is
    * commutative/associative), so partition-count invariance holds.
    */
  def insertHashAtomic(hash: Long): Unit = {
    val hLow = hash.toInt
    val base = blockBase(hash)
    var i = 0
    while (i < Sbbf.BlockWords) {
      val bit = 1L << ((hLow * Sbbf.Salt(i)) >>> 26)
      val idx = base + i
      // skip the atomic when the bit is already visible (common once warm)
      if ((words(idx) & bit) == 0L)
        Sbbf.WordsHandle.getAndBitwiseOr(words, idx, bit)
      i += 1
    }
  }

  /** Membership probe for a pre-computed hash (`bloom_check`, `_abloom.c:151-171`). */
  def checkHash(hash: Long): Boolean = {
    val hLow = hash.toInt
    val base = blockBase(hash)
    var i = 0
    while (i < Sbbf.BlockWords) {
      if ((words(base + i) & (1L << ((hLow * Sbbf.Salt(i)) >>> 26))) == 0L) return false
      i += 1
    }
    true
  }

  // typed add/contains (serializable-mode key types: bytes/str/long/double)
  def add(key: Array[Byte]): Unit = insertHash(Hashing.hashBytes(key))
  def add(key: String): Unit = insertHash(Hashing.hashString(key))
  def add(key: Long): Unit = insertHash(Hashing.hashLong(key))
  def add(key: Double): Unit = insertHash(Hashing.hashDouble(key))

  def contains(key: Array[Byte]): Boolean = checkHash(Hashing.hashBytes(key))
  def contains(key: String): Boolean = checkHash(Hashing.hashString(key))
  def contains(key: Long): Boolean = checkHash(Hashing.hashLong(key))
  def contains(key: Double): Boolean = checkHash(Hashing.hashDouble(key))

  // ------------------------------------------------------------------ algebra

  /** Two filters can be OR-merged / compared only with identical parameters
    * (`BloomFilter_compatible`, `_abloom.c:206-210`).
    */
  def compatible(other: Sbbf): Boolean =
    capacity == other.capacity && fpRateBits == other.fpRateBits &&
      freeThreading == other.freeThreading

  private def requireCompatible(other: Sbbf): Unit =
    if (!compatible(other))
      throw new IllegalArgumentException(
        "BloomFilters must have the same capacity, fp_rate, serializable, " +
          "and free_threading") // reference message, _abloom.c:246-249

  /** In-place word-wise OR (`__ior__`, `_abloom.c:283-307`). Returns this. */
  def orInPlace(other: Sbbf): Sbbf = {
    requireCompatible(other)
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  /** New filter = word-wise OR (`__or__`, `_abloom.c:238-281`). */
  def or(other: Sbbf): Sbbf = copy().orInPlace(other)

  /** True iff any bit is set (`__bool__`, `_abloom.c:309-317`). */
  def nonEmpty: Boolean = {
    var i = 0
    while (i < words.length) { if (words(i) != 0L) return true; i += 1 }
    false
  }
  def isEmpty: Boolean = !nonEmpty

  /** Linear-counting cardinality estimate from bit occupancy (Whang,
    * Vander-Zanden, Taylor, "A linear-time probabilistic counting
    * algorithm for database applications", ACM TODS 15(2), 1990 — the
    * classic load-factor inversion, applied per word). Each inserted key
    * sets EXACTLY ONE bit in each of its block's 8 words (the salted
    * multiply-shift picks one of 64 positions per word), so a word with
    * X bits set estimates its block's key count as `-64 ln(1 - X/64)`;
    * the 8 words of a block observe the same count, so their log terms
    * average, and blocks sum:
    * `est = -(64/8) * sum over all words of ln(1 - X_w/64)`.
    * Duplicates are counted once (this estimates DISTINCT keys). A fully
    * saturated word is clamped to X = 63.5 (its block is beyond
    * resolution). Relative error is sub-1% at design load — see
    * SbbfSpec's accuracy test.
    */
  def estimateCardinality: Double = {
    var sum = 0.0
    var i = 0
    while (i < words.length) {
      val x = java.lang.Long.bitCount(words(i))
      sum += Math.log1p(-(if (x >= 64) 63.5 else x.toDouble) / 64.0)
      i += 1
    }
    -8.0 * sum
  }

  /** Intersection-size estimate via inclusion-exclusion over the linear-
    * counting estimates: `|A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)`, with
    * the union occupancy read directly off the OR of the word pairs (no
    * materialized union filter). Clamped at 0. Inherits the estimator's
    * error on each term, so absolute error scales with |A| + |B|, not
    * with the (possibly tiny) intersection — the standard caveat of
    * sketch inclusion-exclusion.
    */
  def intersectEstimate(other: Sbbf): Double = {
    requireCompatible(other)
    var sumA = 0.0
    var sumB = 0.0
    var sumU = 0.0
    var i = 0
    while (i < words.length) {
      val xa = java.lang.Long.bitCount(words(i))
      val xb = java.lang.Long.bitCount(other.words(i))
      val xu = java.lang.Long.bitCount(words(i) | other.words(i))
      sumA += Math.log1p(-(if (xa >= 64) 63.5 else xa.toDouble) / 64.0)
      sumB += Math.log1p(-(if (xb >= 64) 63.5 else xb.toDouble) / 64.0)
      sumU += Math.log1p(-(if (xu >= 64) 63.5 else xu.toDouble) / 64.0)
      i += 1
    }
    math.max(0.0, -8.0 * (sumA + sumB - sumU))
  }

  def clear(): Unit = java.util.Arrays.fill(words, 0L)

  def copy(): Sbbf =
    new Sbbf(capacity, fpRateBits, blockCount, words.clone(), freeThreading)

  override def equals(o: Any): Boolean = o match {
    case that: Sbbf =>
      compatible(that) && java.util.Arrays.equals(words, that.words)
    case _ => false
  }
  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(words) + capacity.hashCode

  override def toString: String =
    s"<Sbbf capacity=$capacity fp_rate=$fpRate blocks=$blockCount>"

  def byteCount: Long = blockCount * Sbbf.BlockBytes
  def bitCount: Long = byteCount * 8
  /** Probes per key — structurally 8 for SBBF-512 (`_abloom.c:590-593`). */
  def k: Int = Sbbf.BlockWords

  // -------------------------------------------------------------------- wire

  /** ABLM v2 wire format (`to_bytes`, `_abloom.c:350-396`): 30-byte header +
    * big-endian words. This is the aggregation-shuffle format, the
    * BinaryType at-rest format, and the checkpoint payload.
    */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](Sbbf.HeaderSize + words.length * 8)
    out(0) = 'A'; out(1) = 'B'; out(2) = 'L'; out(3) = 'M'
    out(4) = Sbbf.Version
    Sbbf.writeBE64(out, 5, capacity)
    Sbbf.writeBE64(out, 13, fpRateBits)
    Sbbf.writeBE64(out, 21, blockCount)
    out(29) = if (freeThreading) 1 else 0
    var i = 0
    var off = Sbbf.HeaderSize
    while (i < words.length) {
      Sbbf.writeBE64(out, off, words(i))
      i += 1
      off += 8
    }
    out
  }
}

object Sbbf {
  /** VarHandle for atomic fetch-OR on the words array (C11 atomics
    * equivalent, `_abloom.c:6-25`).
    */
  private val WordsHandle: java.lang.invoke.VarHandle =
    java.lang.invoke.MethodHandles.arrayElementVarHandle(classOf[Array[Long]])

  final val BlockBits = 512
  final val BlockBytes = 64
  final val BlockWords = 8
  final val HeaderSize = 30 // 4 magic + 1 version + 8 cap + 8 fp + 8 blocks + 1 flag
  final val Version: Byte = 2

  /** Salt constants from the Parquet SBBF spec (`_abloom.c:62-64`). */
  final val Salt: Array[Int] = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  // ----------------------------------------------------------------- sizing

  /** Analytic FPR of SBBF-512 at `bitsPerElement` bits/key — Poisson mixture
    * over per-block load (`sbbf_fpr`, `_abloom.c:75-95`; derivation in
    * reference `docs/IMPLEMENTATION.md:47-68`). Term-for-term identical,
    * including the 500-term cap and `pmf < 1e-15 && i > a` early exit —
    * any deviation shifts the bisection result and breaks `fromBytes`
    * cross-validation (SURVEY.md §7.6).
    */
  def sbbfFpr(bitsPerElement: Double): Double = {
    val a = 512.0 / bitsPerElement
    var poissonPmf = math.exp(-a)
    val pMiss = 63.0 / 64.0
    var fpr = 0.0
    var i = 0
    var done = false
    while (i < 500 && !done) {
      if (i > 0) poissonPmf *= a / i
      val pBitSet = 1.0 - math.pow(pMiss, i.toDouble)
      fpr += poissonPmf * math.pow(pBitSet, 8.0)
      if (poissonPmf < 1e-15 && i > a) done = true
      i += 1
    }
    fpr
  }

  /** Bisection inverse of [[sbbfFpr]] over [0.5, 300], tol 1e-6
    * (`sbbf_bits_for_fpr`, `_abloom.c:97-109`).
    */
  // bitsForFpr is ~28 bisection steps x a 500-term exp/pow series —
  // ~0.3 ms. A GROUPED sketch build calls Sbbf.empty once per group
  // (millions of times at high cardinality): without memoization the
  // sizing math dominated the whole aggregation (measured ~70 s of the
  // 8M-buffer bench). Keyed on the fp-rate bits; values are pure
  // functions of the key, so the benign put race is idempotent; bounded
  // by the distinct fp rates a job uses (cap as a safety rail).
  private val bitsForFprCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Double]()

  def bitsForFpr(targetFpr: Double): Double = {
    val key = java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(targetFpr))
    val cached = bitsForFprCache.get(key)
    if (cached != null) return cached.doubleValue()
    var lo = 0.5
    var hi = 300.0
    while (hi - lo > 1e-6) {
      val mid = (lo + hi) / 2.0
      if (sbbfFpr(mid) > targetFpr) lo = mid else hi = mid
    }
    val bits = (lo + hi) / 2.0
    if (bitsForFprCache.size < 4096) bitsForFprCache.put(key, bits)
    bits
  }

  /** `ceil(capacity * bits/key / 512)` with the reference's double-space
    * uint64-overflow guard (`calculate_block_count`, `_abloom.c:120-130`):
    * capacity 2^62 @ 1% and 2^60 @ 1e-6 must throw, matching
    * `tests/test_initialization.py:222-252`.
    */
  def blockCountFor(capacity: Long, fpRate: Double): Long = {
    val bitsPerItem = bitsForFpr(fpRate)
    // (double)UINT64_MAX == 2^64 in IEEE-754
    if (capacity.toDouble > 1.8446744073709552E19 / bitsPerItem)
      throw new IllegalArgumentException(
        "Capacity too large: would cause integer overflow")
    val totalBitsD = math.ceil(capacity.toDouble * bitsPerItem)
    if (totalBitsD >= 9.223372036854776E18) {
      // beyond int64: doubles this large are exact multiples of >=2^10, so
      // BigDecimal conversion is exact and matches C uint64 arithmetic
      val tb = BigDecimal(totalBitsD).toBigInt
      ((tb + (BlockBits - 1)) / BlockBits).toLong
    } else {
      val totalBits = totalBitsD.toLong
      (totalBits + BlockBits - 1) / BlockBits
    }
  }

  // ----------------------------------------------------------- construction

  /** New zeroed filter (`BloomFilter_init`, `_abloom.c:607-663`). */
  def empty(capacity: Long, fpRate: Double): Sbbf = {
    if (capacity <= 0)
      throw new IllegalArgumentException("Capacity must be greater than 0")
    if (!(fpRate > 0.0 && fpRate < 1.0))
      throw new IllegalArgumentException(
        "False positive rate must be between 0.0 and 1.0")
    val blocks = blockCountFor(capacity, fpRate)
    // bind to the WIRE blob limit (HeaderSize + blocks*64 bytes in one
    // array), tighter than the words-array limit: every distributed path
    // serializes, so an unserializable filter should fail at construction.
    // Beyond this (~33.5M blocks, ~2.1 GB) use [[graft.job.BloomShards]].
    if (blocks > (Int.MaxValue.toLong - HeaderSize) / BlockBytes)
      throw new IllegalArgumentException(
        s"Capacity too large for a single JVM array: $blocks blocks")
    new Sbbf(capacity, java.lang.Double.doubleToRawLongBits(fpRate), blocks,
      new Array[Long](blocks.toInt * BlockWords), freeThreading = false)
  }

  /** Shared 30-byte header validation for all block-filter wire formats
    * (ABLM words, ABCM int cells): magic, version, EXACT total length for
    * the format's bytes-per-block, capacity/fp-rate ranges, and the
    * block-count-vs-sizing consistency recompute — same order, same
    * messages as the reference's `from_bytes` (`_abloom.c:398-507`).
    * Returns (capacity, fpRateBits, blockCount).
    */
  private[core] def validateHeader(
      data: Array[Byte],
      magic: String,
      version: Byte,
      bytesPerBlock: Long): (Long, Long, Long) = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < HeaderSize) fail("Invalid data: too short for header")
    var i = 0
    while (i < 4) {
      if (data(i) != magic.charAt(i).toByte) fail("Invalid data: wrong magic bytes")
      i += 1
    }
    val v = data(4) & 0xff
    if (v != version)
      fail(s"Unsupported version: $v (expected $version)")
    val capacity = readBE64(data, 5)
    val fpRateBits = readBE64(data, 13)
    val fpRate = java.lang.Double.longBitsToDouble(fpRateBits)
    val blockCount = readBE64(data, 21)
    // exact length: truncated AND trailing bytes rejected (_abloom.c:450-456)
    val expectedTotal =
      if (blockCount < 0 || blockCount > (Int.MaxValue.toLong - HeaderSize) / bytesPerBlock) -1L
      else HeaderSize + blockCount * bytesPerBlock
    if (data.length.toLong != expectedTotal)
      fail(s"Invalid data: expected $expectedTotal bytes, got ${data.length}")
    if (capacity == 0) fail("Invalid data: capacity is 0")
    if (!(fpRate > 0.0 && fpRate < 1.0)) fail("Invalid data: fp_rate out of range")
    val expectedBlocks =
      try blockCountFor(capacity, fpRate)
      catch { case _: IllegalArgumentException => -1L }
    if (expectedBlocks <= 0 || blockCount != expectedBlocks)
      fail("Invalid data: block_count doesn't match capacity/fp_rate")
    (capacity, fpRateBits, blockCount)
  }

  /** Parse + validate ABLM v2 bytes (`from_bytes`, `_abloom.c:398-507`).
    * All seven reference validations, same order, same messages.
    */
  def fromBytes(data: Array[Byte]): Sbbf = {
    val (capacity, fpRateBits, blockCount) =
      validateHeader(data, "ABLM", Version, BlockBytes)
    val freeThreading = data(29) != 0
    val words = new Array[Long](blockCount.toInt * BlockWords)
    var i = 0
    var off = HeaderSize
    while (i < words.length) {
      words(i) = readBE64(data, off)
      i += 1
      off += 8
    }
    new Sbbf(capacity, fpRateBits, blockCount, words, freeThreading)
  }

  /** Header-only peek: (capacity, fpRate, blockCount) without copying
    * words. Validates magic/version/length/parameter consistency exactly
    * like [[fromBytes]] but reads only the 30-byte header — O(1) even for
    * the 63 MB filters the bench builds.
    */
  def describe(data: Array[Byte]): (Long, Double, Long) = {
    val (capacity, fpRateBits, blockCount) =
      validateHeader(data, "ABLM", Version, BlockBytes)
    (capacity, java.lang.Double.longBitsToDouble(fpRateBits), blockCount)
  }

  // --------------------------------------------------------------- BE codec

  @inline private[core] def writeBE64(buf: Array[Byte], off: Int, v: Long): Unit = {
    buf(off) = (v >>> 56).toByte
    buf(off + 1) = (v >>> 48).toByte
    buf(off + 2) = (v >>> 40).toByte
    buf(off + 3) = (v >>> 32).toByte
    buf(off + 4) = (v >>> 24).toByte
    buf(off + 5) = (v >>> 16).toByte
    buf(off + 6) = (v >>> 8).toByte
    buf(off + 7) = v.toByte
  }

  @inline private[core] def readBE64(buf: Array[Byte], off: Int): Long =
    ((buf(off) & 0xffL) << 56) |
      ((buf(off + 1) & 0xffL) << 48) |
      ((buf(off + 2) & 0xffL) << 40) |
      ((buf(off + 3) & 0xffL) << 32) |
      ((buf(off + 4) & 0xffL) << 24) |
      ((buf(off + 5) & 0xffL) << 16) |
      ((buf(off + 6) & 0xffL) << 8) |
      (buf(off + 7) & 0xffL)
}

/** Typed wire-format validation failure (mirrors the reference's
  * `ValueError`s from `from_bytes`, `_abloom.c:421-471`).
  */
final class SbbfFormatException(msg: String) extends IllegalArgumentException(msg)
