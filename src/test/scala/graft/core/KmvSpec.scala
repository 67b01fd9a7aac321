package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** KMV bottom-k sketch: exactness below k, accuracy vs the published
  * RSE ~ 1/sqrt(k-2) above, merge-order byte canonicality (the state is
  * a canonical set), theta-style intersection, codec validation.
  */
class KmvSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def build(k: Int, hashes: Iterable[Long]): Kmv = {
    val s = Kmv.empty(k)
    hashes.foreach(s.add)
    s
  }

  test("unsaturated: estimate is EXACT and wire holds the full hash set") {
    val r = rng(1)
    for (n <- Seq(0, 1, 100, 1023)) {
      val hashes = Seq.fill(n)(r.nextLong()).distinct
      // duplicates must not count: feed each hash three times
      val s = build(1024, hashes ++ hashes ++ hashes)
      assert(!s.isSaturated)
      assert(s.estimate === hashes.size.toDouble)
      assert(s.theta === 1.0)
      val round = Kmv.fromBytes(s.toBytes)
      assert(round.size === hashes.size && round.estimate === s.estimate)
    }
  }

  test("saturated: estimate within 4 RSE of exact across cardinalities") {
    for ((k, n) <- Seq((64, 5000), (256, 50000), (1024, 200000))) {
      val s = Kmv.empty(k)
      var i = 0
      while (i < n) { s.add(Hashing.hashString(s"item$i")); i += 1 }
      assert(s.isSaturated && s.size === k)
      val rse = 1.0 / math.sqrt(k - 2.0)
      assert(math.abs(s.estimate - n) <= 4 * rse * n,
        s"k=$k n=$n est=${s.estimate}")
    }
  }

  test("merge-order byte canonicality: any partitioning, any tree") {
    val r = rng(7)
    val hashes = Array.fill(30000)(r.nextLong())
    val direct = build(512, hashes)
    for (seed <- 1 to 5) {
      val rr = rng(seed)
      val shuffled = rr.shuffle(hashes.toVector)
      val parts = shuffled.grouped(1 + rr.nextInt(7000)).toVector
      val sketches = rr.shuffle(parts.map(build(512, _)))
      // left fold in one order, pairwise tree in another
      val folded = sketches.reduceLeft((a, b) => a.mergeIn(b))
      assert(java.util.Arrays.equals(folded.toBytes, direct.toBytes),
        s"seed=$seed fold")
    }
    // commutativity on fresh copies + self-merge identity
    val a = build(512, hashes.take(1000))
    val b = build(512, hashes.drop(25000))
    val ab = a.copySketch().mergeIn(b.copySketch())
    val ba = b.copySketch().mergeIn(a.copySketch())
    assert(java.util.Arrays.equals(ab.toBytes, ba.toBytes))
    assert(java.util.Arrays.equals(
      a.copySketch().mergeIn(a).toBytes, a.toBytes))
  }

  test("unsigned ordering: negative longs sort above positive (MSB set)") {
    val s = Kmv.empty(16)
    // 17 values: 0..15 (small unsigned) and -1 (largest unsigned) —
    // the retained set must be 0..15, never -1
    (0L to 15L).foreach(s.add)
    s.add(-1L)
    assert(s.size === 16)
    val bytes = s.toBytes
    val round = Kmv.fromBytes(bytes)
    assert(round.estimate === Kmv.fromBytes(bytes).estimate)
    val retained = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.position(9)
      (0 until 16).map(_ => bb.getLong)
    }
    assert(!retained.contains(-1L) && retained.contains(0L))
  }

  test("theta intersection: exact when unsaturated, bounded when saturated") {
    val r = rng(42)
    val shared = Seq.fill(400)(r.nextLong())
    val onlyA = Seq.fill(300)(r.nextLong())
    val onlyB = Seq.fill(500)(r.nextLong())
    // unsaturated regime: exact set intersection
    val ua = build(2048, shared ++ onlyA)
    val ub = build(2048, shared ++ onlyB)
    assert(Kmv.intersectEstimate(ua, ub) === shared.size.toDouble)
    // saturated regime: within 5 joint-RSE of truth
    val sharedBig = (0 until 40000).map(i => Hashing.hashString(s"s$i"))
    val aBig = sharedBig ++ (0 until 30000).map(i => Hashing.hashString(s"a$i"))
    val bBig = sharedBig ++ (0 until 50000).map(i => Hashing.hashString(s"b$i"))
    val k = 4096
    val sa = build(k, aBig)
    val sb = build(k, bBig)
    val est = Kmv.intersectEstimate(sa, sb)
    val tol = 5.0 / math.sqrt(k - 2.0) * sharedBig.size
    assert(math.abs(est - sharedBig.size) <= tol,
      s"est=$est true=${sharedBig.size} tol=$tol")
    // mixed saturation: small exact set against a saturated sketch
    val mixed = Kmv.intersectEstimate(ua, sa)
    assert(mixed >= 0.0 && mixed <= (shared.size + onlyA.size) * 1.5)
  }

  test("saturated theta == 1.0 corner keeps the strict-below contract") {
    // normalize maps a hash with all top 53 bits set to exactly 1.0
    val top = 0xfffffffffffff800L
    assert(Kmv.normalize(top) === 1.0)
    val s = build(16, (1L to 15L) ++ Seq(top)) // saturated, kthMin = top
    assert(s.isSaturated && s.theta === 1.0)
    // below(theta) must EXCLUDE the kth minimum for a saturated sketch
    assert(s.below(s.theta).size === 15)
    // an unsaturated sketch's theta == 1.0 still means "no threshold"
    val u = build(16, Seq(1L, 2L, top))
    assert(!u.isSaturated && u.below(u.theta).size === 3)
  }

  test("codec validation rejects corruption") {
    val good = build(64, (1L to 100L).map(Hashing.mix64)).toBytes
    intercept[IllegalArgumentException](Kmv.fromBytes(Array.emptyByteArray))
    intercept[IllegalArgumentException](Kmv.fromBytes(good.take(5)))
    val badVer = good.clone(); badVer(0) = 9
    intercept[IllegalArgumentException](Kmv.fromBytes(badVer))
    val badK = good.clone(); badK(1) = -1 // k out of range
    intercept[IllegalArgumentException](Kmv.fromBytes(badK))
    val badN = good.clone()
    // n > k: k at offset 1..4 is 64; write n = 65 at offset 5..8
    badN(5) = 0; badN(6) = 0; badN(7) = 0; badN(8) = 65
    intercept[IllegalArgumentException](Kmv.fromBytes(badN))
    val truncated = good.dropRight(8)
    intercept[IllegalArgumentException](Kmv.fromBytes(truncated))
    val unsorted = good.clone()
    // swap the first two stored hashes (offsets 9..16 and 17..24)
    for (i <- 0 until 8) {
      val t = unsorted(9 + i); unsorted(9 + i) = unsorted(17 + i); unsorted(17 + i) = t
    }
    intercept[IllegalArgumentException](Kmv.fromBytes(unsorted))
    // k mismatch on merge
    intercept[IllegalArgumentException](
      Kmv.empty(64).mergeIn(Kmv.empty(128)))
  }

  test("estimate monotone under union; union >= max operand (set law)") {
    val r = rng(99)
    val a = build(256, Seq.fill(20000)(r.nextLong()))
    val b = build(256, Seq.fill(20000)(r.nextLong()))
    val ea = a.estimate
    val eb = b.estimate
    val u = a.copySketch().mergeIn(b)
    assert(u.estimate >= math.max(ea, eb) * 0.95) // sketch noise margin
  }
}
