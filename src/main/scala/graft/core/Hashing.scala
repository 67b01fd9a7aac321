package graft.core

/** Deterministic key hashing for the SBBF sketch family.
  *
  * Reproduces the reference's "serializable mode" hash semantics
  * (`/root/reference/abloom/_abloom.c:183-204`):
  *
  *   - bytes  -> XXH64(data, seed=0)
  *   - string -> XXH64(utf8 bytes, seed=0)
  *   - long   -> mix64(CPython numeric hash)   (hash(n) = ±(|n| mod 2^61-1), -1 -> -2)
  *   - double -> mix64(CPython float hash)     (hash(42.0) == hash(42), -0.0 == 0.0)
  *
  * XXH64 is implemented from the public xxHash specification
  * (https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md); the
  * reference vendors the same algorithm (`abloom/xxhash.h:3692-3747`).
  * Spark's built-in `xxhash64` is NOT bit-compatible (seed 42 + type-tagged
  * input encoding), hence this hand-rolled version.
  *
  * All functions here are static, allocation-free and codegen-callable
  * (invoked from generated code via `graft.core.Hashing.hashUtf8(...)`).
  */
object Hashing {

  // ---------------------------------------------------------------- mix64

  /** MurmurHash3 64-bit finalizer (`_abloom.c:111-118`). Applied to CPython
    * numeric hashes because hash(n) == n for small ints, which would put
    * sequential keys in the same 512-bit block (100% FPR).
    */
  @inline def mix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  // ------------------------------------------------------ CPython numerics

  private final val PyHashModulus = (1L << 61) - 1 // 2^61 - 1 (Mersenne prime)
  private final val PyHashBits = 61
  private final val PyHashInf = 314159L

  /** CPython `hash(n)` for int64 n: n mod (2^61-1) with sign preserved;
    * a result of -1 maps to -2 (CPython reserves -1 for errors).
    * Exercised by reference tests `tests/test_serialization.py:571-594`.
    */
  def pyHashLong(n: Long): Long = {
    val x =
      if (n >= 0) n % PyHashModulus
      else {
        // -n wraps for Long.MinValue to itself, whose *unsigned* value is
        // 2^63 — exactly the magnitude we need, so unsigned remainder works
        // for the full int64 range.
        -java.lang.Long.remainderUnsigned(-n, PyHashModulus)
      }
    if (x == -1L) -2L else x
  }

  /** CPython `hash(v)` for doubles — faithful `_Py_HashDouble` (pyhash.c):
    * fold the mantissa into Z/(2^61-1) 28 bits at a time, then rotate by the
    * exponent. Guarantees hash(42.0) == hash(42) and hash(-0.0) == hash(0.0)
    * (reference tests `tests/test_serialization.py:504-515`).
    *
    * NaN: CPython >= 3.10 hashes NaN by object identity, which is
    * inherently non-deterministic; a distributed engine needs a stable
    * value, so we use 0 (CPython <= 3.9 behavior). The reference only
    * asserts NaN is *insertable* (`test_serialization.py:499-503`).
    */
  def pyHashDouble(v: Double): Long = {
    if (java.lang.Double.isNaN(v)) return 0L
    if (java.lang.Double.isInfinite(v)) return if (v > 0) PyHashInf else -PyHashInf
    if (v == 0.0) return 0L

    // frexp: v = m * 2^e with 0.5 <= |m| < 1
    var d = v
    var eAdj = 0
    if (Math.getExponent(d) < java.lang.Double.MIN_EXPONENT) { // subnormal
      d = d * 1.8446744073709552E19 // 2^64, exact scaling
      eAdj = -64
    }
    var e = Math.getExponent(d) + 1 + eAdj
    var m = Math.scalb(d, -(e - eAdj)) // in [0.5, 1)

    var sign = 1L
    if (m < 0) { sign = -1L; m = -m }

    var x = 0L
    while (m != 0.0) {
      x = ((x << 28) & PyHashModulus) | (x >>> (PyHashBits - 28))
      m *= 268435456.0 // 2^28
      e -= 28
      val y = m.toLong
      m -= y.toDouble
      x += y
      if (x >= PyHashModulus) x -= PyHashModulus
    }

    val eMod = if (e >= 0) e % PyHashBits else PyHashBits - 1 - ((-1 - e) % PyHashBits)
    x = ((x << eMod) & PyHashModulus) | (x >>> (PyHashBits - eMod))

    x *= sign
    if (x == -1L) -2L else x
  }

  // ----------------------------------------------------------------- XXH64

  private final val P1 = 0x9e3779b185ebca87L
  private final val P2 = 0xc2b2ae3d27d4eb4fL
  private final val P3 = 0x165667b19e3779f9L
  private final val P4 = 0x85ebca77c2b2ae63L
  private final val P5 = 0x27d4eb2f165667c5L

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  @inline private def readLE64(a: Array[Byte], i: Int): Long =
    (a(i) & 0xffL) |
      ((a(i + 1) & 0xffL) << 8) |
      ((a(i + 2) & 0xffL) << 16) |
      ((a(i + 3) & 0xffL) << 24) |
      ((a(i + 4) & 0xffL) << 32) |
      ((a(i + 5) & 0xffL) << 40) |
      ((a(i + 6) & 0xffL) << 48) |
      ((a(i + 7) & 0xffL) << 56)

  @inline private def readLE32(a: Array[Byte], i: Int): Long =
    (a(i) & 0xffL) |
      ((a(i + 1) & 0xffL) << 8) |
      ((a(i + 2) & 0xffL) << 16) |
      ((a(i + 3) & 0xffL) << 24)

  /** xxHash64 over `data[off, off+len)` with the given seed. */
  def xxh64(data: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var h: Long = 0L
    var i = off
    val end = off + len

    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 32
      while (i <= limit) {
        v1 = round(v1, readLE64(data, i))
        v2 = round(v2, readLE64(data, i + 8))
        v3 = round(v3, readLE64(data, i + 16))
        v4 = round(v4, readLE64(data, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1)
      h = mergeRound(h, v2)
      h = mergeRound(h, v3)
      h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }

    h += len

    while (i + 8 <= end) {
      h = rotl(h ^ round(0L, readLE64(data, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h = rotl(h ^ (readLE32(data, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h = rotl(h ^ ((data(i) & 0xffL) * P5), 11) * P1
      i += 1
    }

    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  def xxh64(data: Array[Byte], seed: Long): Long = xxh64(data, 0, data.length, seed)

  /** Zero-copy XXH64 over arbitrary memory (on-heap array + offset or
    * off-heap), used to hash Spark `UTF8String` payloads without the
    * per-row byte-array copy `getBytes` would cost. Little-endian reads
    * via Platform match the byte-array path on x86/arm (Spark itself
    * assumes unaligned LE access in its own hash expressions).
    */
  def xxh64Unsafe(base: AnyRef, offset: Long, len: Int, seed: Long): Long = {
    import org.apache.spark.unsafe.Platform
    var h: Long = 0L
    var i = offset
    val end = offset + len

    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 32
      while (i <= limit) {
        v1 = round(v1, Platform.getLong(base, i))
        v2 = round(v2, Platform.getLong(base, i + 8))
        v3 = round(v3, Platform.getLong(base, i + 16))
        v4 = round(v4, Platform.getLong(base, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1)
      h = mergeRound(h, v2)
      h = mergeRound(h, v3)
      h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }

    h += len

    while (i + 8 <= end) {
      h = rotl(h ^ round(0L, Platform.getLong(base, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h = rotl(h ^ ((Platform.getInt(base, i) & 0xffffffffL) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h = rotl(h ^ ((Platform.getByte(base, i) & 0xffL) * P5), 11) * P1
      i += 1
    }

    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  /** Hash a Spark UTF8String key without copying its bytes. */
  def hashUTF8String(s: org.apache.spark.unsafe.types.UTF8String): Long =
    xxh64Unsafe(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)

  // ------------------------------------------------- abloom key-hash entry

  /** Hash of a binary key (reference serializable-mode bytes path). */
  @inline def hashBytes(data: Array[Byte]): Long = xxh64(data, 0, data.length, 0L)

  /** Hash of a string key: XXH64 over its UTF-8 bytes, seed 0. */
  def hashString(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    xxh64(b, 0, b.length, 0L)
  }

  /** Hash of an integer key (CPython numeric hash + mix64). */
  @inline def hashLong(n: Long): Long = mix64(pyHashLong(n))

  /** Hash of a double key; bit-equal to hashLong for integral doubles. */
  @inline def hashDouble(v: Double): Long = mix64(pyHashDouble(v))
}
