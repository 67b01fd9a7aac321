package graft.core

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary ("heavy hitters") over string keys
  * — the deterministic counterpart of the count-min sketch for token /
  * URL / key frequency analysis in training-data pipelines.
  *
  * Published algorithm (Misra & Gries 1982; mergeability per Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012):
  * keep at most `k` counters; a new key either increments its counter,
  * claims a free slot, or triggers a global decrement round. Guarantees
  * for a stream of n items, with `err` = total decremented weight:
  *  - `counter(x) <= true(x) <= counter(x) + err` for every key
  *    (tracked keys AND evicted ones, whose counter is 0);
  *  - `err <= n / (k + 1)` — so any key with frequency > n/(k+1) is
  *    guaranteed present;
  *  - when the stream has at most `k` distinct keys, no decrement ever
  *    fires: counts are EXACT (the oracle-query case).
  *
  * Merge (the PODS-2012 construction): sum counters key-wise; if more
  * than `k` survive, subtract the (k+1)-th largest counter value from
  * all and drop the non-positive — `err` adds across inputs plus the
  * subtracted value, preserving both bounds. Commutative; associative
  * up to the bound (the kept SET can differ by merge order at ties, the
  * [counter, counter+err] interval always contains the truth — like
  * t-digest, this is a bound-preserving summary, not a byte-canonical
  * one; the wire codec sorts entries so equal summaries serialize
  * equally).
  *
  * Wire format ABMG v1: 4 magic + 1 version + 4 BE k + 8 BE n + 8 BE err
  * + 4 BE entry count, then per entry: 4 BE key byte length + UTF-8 key
  * bytes + 8 BE count, entries sorted by (count DESC, key ASC).
  */
final class MisraGries private[core] (
    val k: Int,
    private[core] var n: Long,
    private[core] var err: Long,
    private[core] val counters: mutable.HashMap[UTF8String, Long]) extends Serializable {

  def itemCount: Long = n
  def decrementedWeight: Long = err
  def trackedKeys: Int = counters.size

  /** Add one occurrence of `key`. */
  def add(key: String): Unit = add(UTF8String.fromString(key), 1L)

  /** Add `weight` occurrences (weight > 0). */
  def add(key: String, weight: Long): Unit =
    add(UTF8String.fromString(key), weight)

  /** UTF8String-native update — THE hot path. The distributed update
    * (aggregate expressions, [[graft.job.SketchBuild]]) hands in the
    * row's borrowed UTF8String: lookups hash/compare the borrowed bytes
    * with NO allocation (the round-3 path allocated one java.lang.String
    * per row), and only a key's FIRST insertion copies it (`copy()`, not
    * `clone()` — clone's getBytes fast path can SHARE the backing array
    * when the string spans it exactly, and the borrowed value may point
    * into a reused row buffer).
    */
  def add(key: UTF8String, weight: Long): Unit = {
    require(weight > 0, "weight must be positive")
    n += weight
    counters.get(key) match {
      case Some(c) => counters.update(key, c + weight)
      case None if counters.size < k => counters.update(key.copy(), weight)
      case None =>
        // decrement round(s): remove min(weight, current minimum) from
        // every counter; repeat until the new key fits or its weight is
        // absorbed. Equivalent to `weight` unit-decrement rounds, done
        // in O(k log k) instead of O(weight * k).
        var w = weight
        while (w > 0) {
          if (counters.size < k) {
            counters.update(key.copy(), w)
            w = 0
          } else {
            val minC = counters.valuesIterator.min
            val step = math.min(w, minC)
            err += step
            w -= step
            val dead = mutable.ArrayBuffer.empty[UTF8String]
            counters.mapValuesInPlace((_, c) => c - step)
            counters.foreach { case (kk, c) => if (c <= 0) dead += kk }
            dead.foreach(counters.remove)
          }
        }
    }
  }

  def add(key: UTF8String): Unit = add(key, 1L)

  /** Lower/upper bound on the true count of `key`:
    * `[counter, counter + err]` (counter 0 for untracked keys).
    */
  def bounds(key: String): (Long, Long) = {
    val c = counters.getOrElse(UTF8String.fromString(key), 0L)
    (c, c + err)
  }

  /** Entries sorted by (counter DESC, key ASC): (key, lower, upper).
    * Sorting is by java.lang.String (UTF-16) order — the wire-format
    * order, unchanged from the String-keyed implementation. */
  def topK(m: Int): Seq[(String, Long, Long)] =
    counters.toSeq.map { case (key, c) => (key.toString, c) }
      .sortBy { case (key, c) => (-c, key) }.take(m)
      .map { case (key, c) => (key, c, c + err) }

  /** Merge (PODS-2012): key-wise sum, then reduce to k entries by
    * subtracting the (k+1)-th largest value. Returns this.
    */
  def merge(other: MisraGries): MisraGries = {
    require(k == other.k, "MisraGries summaries must have the same k")
    n += other.n
    err += other.err
    other.counters.foreach { case (key, c) =>
      // keys held by a summary are owned (copied at insert) — safe to share
      counters.update(key, counters.getOrElse(key, 0L) + c)
    }
    if (counters.size > k) {
      val sorted = counters.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - k - 1) // (k+1)-th largest
      err += cut
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counters.mapValuesInPlace((_, c) => c - cut)
      counters.foreach { case (kk, c) => if (c <= 0) dead += kk }
      dead.foreach(counters.remove)
    }
    this
  }

  def copy(): MisraGries = new MisraGries(k, n, err, counters.clone())

  // ------------------------------------------------------------------ wire

  def toBytes: Array[Byte] = {
    // sort on java.lang.String (UTF-16 order): keeps the wire bytes
    // identical to the String-keyed implementation for any key set
    val entries = counters.toSeq.map { case (key, c) => (key.toString, c) }
      .sortBy { case (key, c) => (-c, key) }
    val keyBytes = entries.map { case (key, c) =>
      (key.getBytes(java.nio.charset.StandardCharsets.UTF_8), c)
    }
    val total = MisraGries.HeaderSize + keyBytes.map(12 + _._1.length).sum
    val out = new Array[Byte](total)
    out(0) = 'A'; out(1) = 'B'; out(2) = 'M'; out(3) = 'G'
    out(4) = MisraGries.Version
    out(5) = (k >>> 24).toByte; out(6) = (k >>> 16).toByte
    out(7) = (k >>> 8).toByte; out(8) = k.toByte
    Sbbf.writeBE64(out, 9, n)
    Sbbf.writeBE64(out, 17, err)
    val cnt = keyBytes.size
    out(25) = (cnt >>> 24).toByte; out(26) = (cnt >>> 16).toByte
    out(27) = (cnt >>> 8).toByte; out(28) = cnt.toByte
    var off = MisraGries.HeaderSize
    keyBytes.foreach { case (kb, c) =>
      out(off) = (kb.length >>> 24).toByte
      out(off + 1) = (kb.length >>> 16).toByte
      out(off + 2) = (kb.length >>> 8).toByte
      out(off + 3) = kb.length.toByte
      off += 4
      System.arraycopy(kb, 0, out, off, kb.length)
      off += kb.length
      Sbbf.writeBE64(out, off, c)
      off += 8
    }
    out
  }
}

object MisraGries {
  final val HeaderSize = 29 // 4 magic + 1 ver + 4 k + 8 n + 8 err + 4 count
  final val Version: Byte = 1

  def empty(k: Int): MisraGries = {
    if (k < 1 || k > 1000000)
      throw new IllegalArgumentException("k must be in [1, 1000000]")
    new MisraGries(k, 0L, 0L, mutable.HashMap.empty)
  }

  private def readBE32(data: Array[Byte], off: Int): Int =
    ((data(off) & 0xff) << 24) | ((data(off + 1) & 0xff) << 16) |
      ((data(off + 2) & 0xff) << 8) | (data(off + 3) & 0xff)

  def fromBytes(data: Array[Byte]): MisraGries = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < HeaderSize) fail("Invalid data: too short for header")
    if (data(0) != 'A' || data(1) != 'B' || data(2) != 'M' || data(3) != 'G')
      fail("Invalid data: wrong magic bytes")
    val version = data(4) & 0xff
    if (version != Version) fail(s"Unsupported version: $version (expected $Version)")
    val k = readBE32(data, 5)
    if (k < 1 || k > 1000000) fail("Invalid data: k out of range")
    val n = Sbbf.readBE64(data, 9)
    val err = Sbbf.readBE64(data, 17)
    if (n < 0 || err < 0) fail("Invalid data: negative counts")
    val cnt = readBE32(data, 25)
    if (cnt < 0 || cnt > k) fail("Invalid data: entry count out of range")
    val counters = mutable.HashMap.empty[UTF8String, Long]
    var off = HeaderSize
    var i = 0
    while (i < cnt) {
      if (off + 4 > data.length) fail("Invalid data: truncated entry")
      val len = readBE32(data, off)
      off += 4
      if (len < 0 || off + len + 8 > data.length) fail("Invalid data: truncated entry")
      val key = UTF8String.fromBytes(java.util.Arrays.copyOfRange(data, off, off + len))
      off += len
      val c = Sbbf.readBE64(data, off)
      off += 8
      if (c <= 0) fail("Invalid data: non-positive counter")
      counters.update(key, c)
      i += 1
    }
    if (off != data.length) fail(s"Invalid data: expected $off bytes, got ${data.length}")
    new MisraGries(k, n, err, counters)
  }
}
