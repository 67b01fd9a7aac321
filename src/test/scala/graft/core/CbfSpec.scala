package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CbfSpec extends AnyFunSuite {

  test("insert/delete: remaining keys always contained, counts upper-bound") {
    val f = Cbf.empty(10000, 0.01)
    (0L until 5000L).foreach(k => f.add(k, 1))
    (0L until 5000L by 7).foreach(k => f.add(k, -1))
    // zero FN on every net-present key
    (0L until 5000L).filter(_ % 7 != 0).foreach(k => assert(f.contains(k), s"k=$k"))
    // count is an upper bound on the net count
    (0L until 5000L).foreach { k =>
      val net = if (k % 7 == 0) 0 else 1
      assert(f.count(k) >= net)
    }
  }

  test("cell arithmetic saturates with a sticky positive rail: zero FN survives") {
    val f = Cbf.empty(100, 0.01)
    // without saturation this wraps to -2 and the key probes FALSE
    f.add(42L, Int.MaxValue)
    f.add(42L, Int.MaxValue)
    assert(f.contains(42L), "saturated key must still be contained")
    assert(f.count(42L) === Int.MaxValue.toLong, "count clamps at the rail")
    // THE sticky case: a clamp lost MaxValue-1 of weight above, so a
    // plain clamp would let this delete drive the cell to 0 and lose the
    // key (net is +MaxValue — representable!). Pinned cells ignore adds.
    f.add(42L, -Int.MaxValue)
    assert(f.contains(42L), "delete after overflow must not create an FN")
    assert(f.count(42L) === Int.MaxValue.toLong)

    // negative rail is NOT sticky: an over-deleted cell recovers when
    // real inserts arrive (otherwise future keys would gain FNs)
    val g = Cbf.empty(100, 0.01)
    g.add(9L, Int.MinValue); g.add(9L, Int.MinValue)
    assert(!g.contains(9L) && g.count(9L) === 0L)
    g.add(9L, Int.MaxValue); g.add(9L, Int.MaxValue); g.add(9L, 5)
    assert(g.contains(9L), "negative rail must be recoverable")

    // merge path saturates too (addInPlace goes through the same clamp)
    val a = Cbf.empty(100, 0.01); a.add(7L, Int.MaxValue)
    val b = Cbf.empty(100, 0.01); b.add(7L, Int.MaxValue)
    a.addInPlace(b)
    assert(a.contains(7L) && a.count(7L) === Int.MaxValue.toLong)
    // pinned side absorbs a delete-carrying partial without losing the key
    val d = Cbf.empty(100, 0.01); d.add(7L, -3)
    a.addInPlace(d)
    assert(a.contains(7L))
  }

  test("positive rail is absorbing ACROSS filters: pinned cell in either input pins the merge") {
    // one partition drives the cell past the rail, another goes net
    // NEGATIVE on the same key — distributed cbf_agg_weighted can emit
    // exactly these partials. The true sum exceeds Int.MaxValue, so the
    // invariant cell >= min(true sum, Int.MaxValue) requires the merged
    // cell to stay pinned, whichever side the merge is called on.
    def pinned(): Cbf = {
      val f = Cbf.empty(100, 0.01)
      f.add(11L, Int.MaxValue); f.add(11L, Int.MaxValue) // pinned at the rail
      f
    }
    def negative(): Cbf = {
      val f = Cbf.empty(100, 0.01)
      f.add(11L, -100000)
      f
    }
    val ab = pinned().addInPlace(negative()) // pinned receiver (sticky satAdd)
    val ba = negative().addInPlace(pinned()) // pinned in OTHER (absorbing rule)
    assert(ab.contains(11L) && ab.count(11L) === Int.MaxValue.toLong)
    assert(ba.contains(11L) && ba.count(11L) === Int.MaxValue.toLong,
      "merging a pinned partial into a negative cell must not un-pin it")
    assert(ab === ba, "merge with pinned cells commutes")
    // and the pin survives a further merge chain in either order
    val chain1 = ab.copy().addInPlace(negative())
    val chain2 = negative().addInPlace(ab)
    assert(chain1 === chain2 && chain1.count(11L) === Int.MaxValue.toLong)
  }

  test("deleted-key FPR stays near the SBBF target") {
    val f = Cbf.empty(20000, 0.01)
    (0L until 20000L).foreach(k => f.add(k, 1))
    (0L until 20000L by 2).foreach(k => f.add(k, -1))
    val fp = (0L until 20000L by 2).count(f.contains)
    // deleted keys may false-positive via surviving neighbors; with half
    // the keys removed the filter is under-loaded, so the SBBF bound holds
    assert(fp.toDouble / 10000 <= 0.01 * 1.5, s"fp=$fp")
    // definite never-members too
    val fpOut = (1000000L until 1050000L).count(f.contains)
    assert(fpOut.toDouble / 50000 <= 0.01 * 1.5, s"fpOut=$fpOut")
  }

  test("multiset counts: weights add, min-cell never underestimates") {
    val f = Cbf.empty(1000, 0.01)
    f.add("a", 3)
    f.add("b", 1)
    f.add("a", 2)
    assert(f.count("a") >= 5)
    assert(f.count("b") >= 1)
    f.add("a", -4)
    assert(f.count("a") >= 1)
    assert(f.contains("a"))
  }

  test("merge: cell-wise add is commutative/associative, zero identity, order-free deletes") {
    val r = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val keys = Seq.fill(200)(r.nextLong() % 1000)
      val dels = keys.filter(_ => r.nextBoolean())
      // sequential truth: all inserts then all deletes
      val seqF = Cbf.empty(500, 0.05)
      keys.foreach(k => seqF.add(k, 1))
      dels.foreach(k => seqF.add(k, -1))
      // partitioned: deletes land in a DIFFERENT partial than inserts and
      // merge in the opposite order
      val p1 = Cbf.empty(500, 0.05)
      val p2 = Cbf.empty(500, 0.05)
      dels.foreach(k => p2.add(k, -1)) // deletes first
      keys.zipWithIndex.foreach { case (k, i) =>
        (if (i % 2 == 0) p1 else p2).add(k, 1)
      }
      val merged = p2.copy().addInPlace(p1) // reverse merge order
      assert(merged === seqF)
      // identity
      assert(seqF.copy().addInPlace(Cbf.empty(500, 0.05)) === seqF)
      // associativity with a third partial
      val p3 = Cbf.empty(500, 0.05)
      val left = p1.copy().addInPlace(p2).addInPlace(p3)
      val right = p1.copy().addInPlace(p2.copy().addInPlace(p3))
      assert(left === right)
    }
  }

  test("wire round trip is exact; validation matrix rejects corruption") {
    val f = Cbf.empty(300, 0.02)
    (0L until 250L).foreach(k => f.add(k, 1))
    (0L until 250L by 3).foreach(k => f.add(k, -1))
    val bytes = f.toBytes
    val g = Cbf.fromBytes(bytes)
    assert(g === f)
    assert(g.toBytes.toSeq === bytes.toSeq)

    def corrupt(mut: Array[Byte] => Unit): Unit = {
      val b = bytes.clone()
      mut(b)
      intercept[SbbfFormatException](Cbf.fromBytes(b))
    }
    corrupt(b => b(0) = 'X')                      // magic
    corrupt(b => b(4) = 9)                        // version
    intercept[SbbfFormatException](Cbf.fromBytes(bytes.take(10)))     // short
    intercept[SbbfFormatException](Cbf.fromBytes(bytes ++ Array[Byte](0))) // trailing
    corrupt(b => Sbbf.writeBE64(b, 5, 0L))        // capacity 0
    corrupt(b => Sbbf.writeBE64(b, 13,
      java.lang.Double.doubleToRawLongBits(2.0))) // fp out of range
    corrupt(b => Sbbf.writeBE64(b, 21, 1L))       // block-count mismatch (also length)
  }

  test("incompatible merge throws; geometry matches SBBF probes") {
    val a = Cbf.empty(1000, 0.01)
    val b = Cbf.empty(2000, 0.01)
    intercept[IllegalArgumentException](a.addInPlace(b))
    // a CBF with net-positive keys probes positive exactly where the SBBF
    // with the same (capacity, fp_rate) and keys does
    val s = Sbbf.empty(1000, 0.01)
    val c = Cbf.empty(1000, 0.01)
    (0L until 1000L).foreach { k => s.add(k); c.add(k, 1) }
    (5000L until 7000L).foreach { k =>
      assert(s.contains(k) === c.contains(k), s"k=$k")
    }
  }
}
