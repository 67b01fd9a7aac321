package graft.core

import java.nio.ByteBuffer

/** Mergeable WEIGHTED distinct-sample sketch (Efraimidis & Spirakis
  * 2006 A-RES): each distinct key gets the priority u^(1/w), where u in
  * (0, 1] is the key hash normalized ([[Kmv.normalize]]) and w > 0 its
  * weight; the sketch keeps the k LARGEST priorities. Because the
  * priority is a pure function of (key hash, weight), the retained set
  * is a weighted sample WITHOUT replacement of the distinct keys —
  * P(key in sample) increases with its weight — and is invariant to row
  * duplication, ordering, partitioning and merge shape.
  *
  * Determinism rules (merge-order canonicality):
  *  - the same key re-observed with DIFFERENT weights keeps the MAX
  *    weight (priority is monotone in w, so max weight == max priority
  *    — re-observation can only promote);
  *  - at equal (priority, hash, weight), the lexicographically-smallest
  *    payload wins ([[KmvSample]]'s tie rule).
  *
  * Wire: entries sorted by ascending unsigned key hash — a canonical
  * SET encoding (priorities are recomputed from (hash, weight) on
  * load), so any merge tree over the same inputs yields byte-identical
  * blobs, property-tested like the other families.
  *
  * Scale: memory k * (20 + payload preview); same payload cap and
  * Long-space wire sizing as [[KmvSample]].
  */
final class WeightedSample private (
    val k: Int,
    // hash -> (weight, payload); priority derived
    private val byHash: java.util.HashMap[java.lang.Long, (Double, Array[Byte])],
    // eviction order: (priority ASC, hash unsigned ASC) -> hash
    private val byPriority: java.util.TreeMap[(Double, Long), java.lang.Long]) {

  def size: Int = byHash.size
  def isSaturated: Boolean = byHash.size >= k

  // ---- saturated fast-reject accelerator (pure cache, never on the
  // wire): for any weight w <= maxWeightSeen, priority u^(1/w) <=
  // u^(1/maxWeightSeen), so u < worstPriority^maxWeightSeen implies the
  // entry loses to the current minimum for EVERY admissible weight —
  // one normalize + one compare instead of a StrictMath.pow per row
  // (measured 6-10 -> see KernelBench ws_add). The cut is shrunk by a
  // (maxWeightSeen + 4) * 1e-12 relative margin: after the ^(1/w)
  // exponentiation the surviving margin is >= ~1e-12 relative, four
  // orders above pow's <= 1 ulp error, so a fast-rejected row can never
  // be one the exact test would have accepted (gray-band rows fall
  // through to the exact test).
  private var maxWeightSeen: Double = 0.0
  private var rejectCut: Double = 0.0 // u below this loses; 0 = disabled
  private var cutValid: Boolean = false

  private def recomputeCut(): Unit = {
    val worstP = byPriority.firstKey()._1
    val margin = 1.0 - (maxWeightSeen + 4.0) * 1e-12
    rejectCut =
      if (margin <= 0.5 || worstP <= 0.0) 0.0
      else StrictMath.pow(worstP, maxWeightSeen) * margin
    cutValid = true
  }

  /** True iff (h, weight) provably loses to the retained minimum — the
    * O(1) saturated-path reject. Only ever called with the key ABSENT
    * and the sketch saturated.
    */
  private def fastRejects(h: Long, weight: Double): Boolean = {
    if (weight > maxWeightSeen) { maxWeightSeen = weight; cutValid = false }
    if (!cutValid) recomputeCut()
    Kmv.normalize(h) < rejectCut
  }

  /** Smallest retained priority (the eviction threshold); 0 while
    * unsaturated (everything is retained).
    */
  def threshold: Double =
    if (!isSaturated) 0.0 else byPriority.firstKey()._1

  private def remove(h: java.lang.Long): Unit = {
    val e = byHash.remove(h)
    if (e != null) {
      byPriority.remove((WeightedSample.priority(h.longValue(), e._1), h.longValue()))
      cutValid = false
      ()
    }
  }

  /** True iff [[add]] with this (hash, weight) could change the sketch —
    * the O(1) reject test callers use to skip materializing payloads on
    * the saturated hot path (the KmvSample reject-before-copy rule).
    */
  def wouldAccept(h: Long, weight: Double): Boolean =
    byHash.size < k || byHash.containsKey(java.lang.Long.valueOf(h)) ||
      (!fastRejects(h, weight) &&
        beatsWorst(WeightedSample.priority(h, weight), h))

  private def beatsWorst(pr: Double, h: Long): Boolean = {
    val worst = byPriority.firstKey()
    // strict composite order (priority, hash): total and deterministic,
    // so the retained set is insertion-order-free
    pr > worst._1 ||
      (pr == worst._1 && java.lang.Long.compareUnsigned(h, worst._2) > 0)
  }

  def add(h: Long, weight: Double, payload: Array[Byte]): Unit = {
    require(WeightedSample.validWeight(weight),
      s"weight must be a finite number >= ${WeightedSample.MinWeight}, got $weight")
    val p =
      if (payload.length <= KmvSample.MaxPayloadBytes) payload
      else java.util.Arrays.copyOf(payload, KmvSample.MaxPayloadBytes)
    val boxed = java.lang.Long.valueOf(h)
    val existing = byHash.get(boxed)
    if (existing != null) {
      if (weight > existing._1) {
        // re-observation with a larger weight promotes the priority
        remove(boxed)
        insertEntry(boxed, weight, p)
      } else if (weight == existing._1 &&
          java.util.Arrays.compareUnsigned(p, existing._2) < 0) {
        byHash.put(boxed, (weight, p)); () // payload tie rule
      }
    } else {
      if (byHash.size < k) insertEntry(boxed, weight, p)
      else if (!fastRejects(h, weight) &&
          beatsWorst(WeightedSample.priority(h, weight), h)) {
        remove(byPriority.firstEntry().getValue)
        insertEntry(boxed, weight, p)
      }
    }
  }

  private def insertEntry(
      h: java.lang.Long, weight: Double, payload: Array[Byte]): Unit = {
    byHash.put(h, (weight, payload))
    byPriority.put((WeightedSample.priority(h.longValue(), weight), h.longValue()), h)
    cutValid = false // the retained minimum may have changed
    ()
  }

  def mergeIn(other: WeightedSample): WeightedSample = {
    require(other.k == k,
      s"cannot merge weighted samples with different k: $k vs ${other.k}")
    if (other eq this) return this
    val it = other.byHash.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey.longValue(), e.getValue._1, e.getValue._2)
    }
    this
  }

  /** Retained (hash, weight, payload) ascending by unsigned hash. */
  def entries: Iterator[(Long, Double, Array[Byte])] = {
    import scala.jdk.CollectionConverters._
    byHash.keySet().asScala.toSeq
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
      .iterator.map { h =>
        val e = byHash.get(h)
        (h.longValue(), e._1, e._2)
      }
  }

  def copySketch(): WeightedSample = {
    val c = WeightedSample.empty(k)
    val it = byHash.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      c.add(e.getKey.longValue(), e.getValue._1, e.getValue._2)
    }
    c
  }

  /** Wire: [ver:1=1][k:4 BE][n:4 BE] then n entries of
    * [hash:8 BE][weight:8 BE raw bits][len:4 BE][payload], ascending
    * unsigned hash — content-canonical.
    */
  def toBytes: Array[Byte] = {
    var totalL = 9L
    val vit = byHash.values().iterator()
    while (vit.hasNext) totalL += 20L + vit.next()._2.length
    require(totalL <= KmvSample.MaxBlobBytes,
      s"weighted sample serializes to $totalL bytes (> " +
        s"${KmvSample.MaxBlobBytes}): lower k or shorten payloads")
    val out = ByteBuffer.allocate(totalL.toInt)
    out.put(1.toByte).putInt(k).putInt(byHash.size)
    entries.foreach { case (h, w, p) =>
      out.putLong(h).putDouble(w).putInt(p.length).put(p)
      ()
    }
    out.array()
  }

  override def equals(o: Any): Boolean = o match {
    case that: WeightedSample =>
      k == that.k && java.util.Arrays.equals(toBytes, that.toBytes)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(toBytes)
  override def toString: String =
    s"WeightedSample(k=$k, n=$size, threshold=$threshold)"
}

object WeightedSample {

  /** Weights below this (subnormals) are invalid: 1/w would overflow to
    * +Infinity and u^Inf is NaN at u == 1.0, which Double.compare sorts
    * GREATEST — an unevictable entry whose retention would depend on
    * arrival order. MIN_NORMAL is comfortably above the 1/Double.MaxValue
    * overflow threshold and easy to document.
    */
  val MinWeight: Double = java.lang.Double.MIN_NORMAL

  def validWeight(w: Double): Boolean =
    w >= MinWeight && !w.isInfinite // NaN fails >=

  /** A-RES priority: u^(1/w) with u = normalize(hash) in (0, 1].
    * Monotone in w; a pure deterministic function of (hash, weight) —
    * StrictMath.pow, NOT Math.pow: Math.pow may differ by 1 ulp across
    * platforms/JITs, and a last-bit divergence at the eviction threshold
    * would break the byte-identical wire/resume contract on a cluster
    * with heterogeneous executors.
    */
  def priority(h: Long, weight: Double): Double =
    StrictMath.pow(Kmv.normalize(h), 1.0 / weight)

  private val PriorityHashOrder: java.util.Comparator[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compareUnsigned(a._2, b._2)
    }

  def empty(k: Int): WeightedSample = {
    require(k >= Kmv.MinK && k <= Kmv.MaxK,
      s"k must be in [${Kmv.MinK}, ${Kmv.MaxK}], got $k")
    new WeightedSample(k,
      new java.util.HashMap[java.lang.Long, (Double, Array[Byte])](),
      new java.util.TreeMap[(Double, Long), java.lang.Long](PriorityHashOrder))
  }

  def fromBytes(bytes: Array[Byte]): WeightedSample = {
    require(bytes.length >= 9, s"weighted sample blob too short: ${bytes.length}")
    val in = ByteBuffer.wrap(bytes)
    val ver = in.get()
    require(ver == 1, s"unsupported weighted sample wire version $ver")
    val k = in.getInt
    require(k >= Kmv.MinK && k <= Kmv.MaxK, s"corrupt weighted sample blob: k=$k")
    val n = in.getInt
    require(n >= 0 && n <= k, s"corrupt weighted sample blob: n=$n k=$k")
    val s = empty(k)
    var prev = 0L
    var i = 0
    while (i < n) {
      require(in.remaining() >= 20, "truncated weighted sample blob")
      val h = in.getLong
      require(i == 0 || java.lang.Long.compareUnsigned(prev, h) < 0,
        "corrupt weighted sample blob: hashes not strictly ascending")
      prev = h
      val w = in.getDouble
      require(validWeight(w), s"corrupt weighted sample blob: weight $w")
      val len = in.getInt
      require(len >= 0 && len <= KmvSample.MaxPayloadBytes &&
        in.remaining() >= len,
        s"corrupt weighted sample blob: payload length $len")
      val p = new Array[Byte](len)
      in.get(p)
      s.add(h, w, p)
      i += 1
    }
    require(!in.hasRemaining, "trailing bytes in weighted sample blob")
    s
  }
}
