package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Weighted distinct-sample (A-RES): exact below k, top-k-by-priority
  * retention above, weight-proportional inclusion, merge-order byte
  * canonicality (incl. the max-weight and payload tie rules), codec
  * validation.
  */
class WeightedSampleSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def build(
      k: Int, entries: Iterable[(Long, Double, String)]): WeightedSample = {
    val s = WeightedSample.empty(k)
    entries.foreach { case (h, w, p) => s.add(h, w, p.getBytes("UTF-8")) }
    s
  }

  test("unsaturated: every distinct key retained regardless of weight") {
    val r = rng(1)
    val entries = Seq.fill(300)(r.nextLong()).distinct
      .map(h => (h, 0.1 + r.nextDouble() * 10, s"v$h"))
    val s = build(1024, entries ++ entries)
    assert(!s.isSaturated && s.size === entries.size)
    assert(s.threshold === 0.0)
    assert(s.entries.map(_._1).toSeq ===
      entries.map(_._1).sortWith(java.lang.Long.compareUnsigned(_, _) < 0))
  }

  test("saturated: retained set == independent top-k by (priority, hash)") {
    val r = rng(2)
    val entries = Seq.fill(5000)(r.nextLong()).distinct
      .map(h => (h, 0.1 + r.nextDouble() * 5, s"p$h"))
    val k = 128
    val s = build(k, entries)
    assert(s.isSaturated && s.size === k)
    val expect = entries
      .sortWith { case ((h1, w1, _), (h2, w2, _)) =>
        val p1 = WeightedSample.priority(h1, w1)
        val p2 = WeightedSample.priority(h2, w2)
        p1 > p2 || (p1 == p2 && java.lang.Long.compareUnsigned(h1, h2) > 0)
      }
      .take(k).map(_._1)
      .sortWith(java.lang.Long.compareUnsigned(_, _) < 0)
    assert(s.entries.map(_._1).toSeq === expect)
    // threshold is the smallest retained priority
    val minP = s.entries.map { case (h, w, _) =>
      WeightedSample.priority(h, w)
    }.min
    assert(s.threshold === minP)
  }

  test("weight-proportional inclusion: a heavy key is (almost) always sampled") {
    // 2000 keys of weight 1 and ONE key of weight 10000, k = 64: the
    // heavy key's priority u^(1/10000) is ~1 for any u, so it must be
    // retained across many independent hash universes
    val r = rng(3)
    val included = (0 until 50).count { round =>
      val keys = Seq.fill(2000)(r.nextLong()).distinct
      val heavy = r.nextLong()
      val s = build(64,
        keys.map(h => (h, 1.0, s"l$h")) :+ ((heavy, 10000.0, "HEAVY")))
      s.entries.exists(_._3.sameElements("HEAVY".getBytes("UTF-8")))
    }
    assert(included >= 48, s"heavy key sampled only $included/50 times")
  }

  test("merge-order byte canonicality incl. max-weight + payload tie rules") {
    val r = rng(4)
    (0 until 30).foreach { round =>
      val k = Seq(16, 64, 256)(round % 3)
      // duplicate keys with DIFFERENT weights and payloads: max weight
      // wins; at equal weight the lexicographically-smallest payload
      val hashes = Seq.fill(400)(r.nextLong() % 60)
      val entries = hashes.map(h =>
        (h, 1.0 + r.nextInt(4), s"pay${r.nextInt(3)}_$h"))
      val flat = build(k, entries)
      val parts = entries.groupBy(_ => r.nextInt(1 + r.nextInt(6)))
        .values.map(build(k, _)).toBuffer
      while (parts.size > 1) {
        val i = r.nextInt(parts.size)
        val a = parts.remove(i)
        val j = r.nextInt(parts.size)
        parts(j) = a.mergeIn(parts(j))
      }
      assert(java.util.Arrays.equals(parts.head.toBytes, flat.toBytes),
        s"round $round not canonical")
      // wire round-trip is the identity
      assert(java.util.Arrays.equals(
        WeightedSample.fromBytes(flat.toBytes).toBytes, flat.toBytes))
    }
  }

  test("max-weight rule: re-observation can only promote; eviction respects it") {
    val s = build(16, Seq((5L, 1.0, "a"), (5L, 3.0, "a"), (5L, 2.0, "a")))
    assert(s.entries.next()._2 === 3.0)
    // equal weight: lexicographically-smallest payload wins
    val t = build(16, Seq((7L, 2.0, "zeta"), (7L, 2.0, "alpha")))
    assert(new String(t.entries.next()._3, "UTF-8") === "alpha")
  }

  test("fast-reject path == brute-force top-k across weight scales") {
    // the cached-cut accelerator must never change the retained set;
    // sweep weight magnitudes so the cut margin sees small AND huge
    // maxWeightSeen values (incl. a mid-stream max jump invalidating it)
    val r = rng(7)
    Seq(1.0, 100.0, 1e6, 1e9).foreach { scale =>
      val entries = Seq.fill(4000)(r.nextLong()).distinct.map { h =>
        (h, (0.5 + r.nextDouble()) * scale, s"v$h")
      }
      // a late maximal weight forces a cut recompute mid-stream
      val withJump = entries.take(2000) ++
        Seq((r.nextLong(), scale * 50, "JUMP")) ++ entries.drop(2000)
      val k = 64
      val s = build(k, withJump)
      val expect = withJump
        .sortWith { case ((h1, w1, _), (h2, w2, _)) =>
          val p1 = WeightedSample.priority(h1, w1)
          val p2 = WeightedSample.priority(h2, w2)
          p1 > p2 || (p1 == p2 && java.lang.Long.compareUnsigned(h1, h2) > 0)
        }
        .take(k).map(_._1).toSet
      assert(s.entries.map(_._1).toSet === expect, s"scale=$scale")
    }
  }

  test("wouldAccept agrees with add on every step of a random stream") {
    val r = rng(6)
    val s = WeightedSample.empty(32)
    (0 until 3000).foreach { i =>
      val h = r.nextLong() % 500
      val w = 1.0 + r.nextInt(9)
      val before = s.toBytes
      val wa = s.wouldAccept(h, w)
      s.add(h, w, s"p$i$h".getBytes("UTF-8"))
      val changed = !java.util.Arrays.equals(s.toBytes, before)
      // add may be a no-op when wouldAccept is true (same key, smaller
      // weight, larger payload) but must NEVER change when it is false
      if (!wa) assert(!changed, s"step $i: rejected insert changed the sketch")
      if (changed) assert(wa, s"step $i: accepted insert was pre-rejected")
    }
  }

  test("invalid weights rejected loudly at the core; codec validation") {
    val s = WeightedSample.empty(16)
    intercept[IllegalArgumentException](s.add(1L, 0.0, Array[Byte](1)))
    intercept[IllegalArgumentException](s.add(1L, -2.0, Array[Byte](1)))
    intercept[IllegalArgumentException](s.add(1L, Double.NaN, Array[Byte](1)))
    intercept[IllegalArgumentException](
      s.add(1L, Double.PositiveInfinity, Array[Byte](1)))
    // subnormal weights: 1/w overflows to +Inf and u^Inf is NaN at
    // u == 1.0 (an unevictable entry) — rejected below MinWeight
    intercept[IllegalArgumentException](
      s.add(1L, java.lang.Double.MIN_VALUE, Array[Byte](1)))
    s.add(1L, WeightedSample.MinWeight, Array[Byte](1)) // boundary is valid
    assert(!WeightedSample.priority(-1L, WeightedSample.MinWeight).isNaN)

    val good = build(64, (1L to 100L).map(h =>
      (Hashing.mix64(h), 1.0 + (h % 5), s"v$h"))).toBytes
    assert(java.util.Arrays.equals(
      WeightedSample.fromBytes(good).toBytes, good))
    intercept[IllegalArgumentException](
      WeightedSample.fromBytes(Array.emptyByteArray))
    val badVer = good.clone(); badVer(0) = 9
    intercept[IllegalArgumentException](WeightedSample.fromBytes(badVer))
    val badK = good.clone(); badK(1) = -1
    intercept[IllegalArgumentException](WeightedSample.fromBytes(badK))
    intercept[IllegalArgumentException](WeightedSample.fromBytes(good.dropRight(3)))
    intercept[IllegalArgumentException](
      WeightedSample.fromBytes(good ++ Array[Byte](0)))
    // mixed-k merge rejected; self-merge is the identity
    val a = build(16, Seq((1L, 1.0, "x")))
    intercept[IllegalArgumentException](a.mergeIn(WeightedSample.empty(64)))
    val before = a.toBytes
    a.mergeIn(a)
    assert(java.util.Arrays.equals(a.toBytes, before))
  }
}
