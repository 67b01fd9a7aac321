package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct-sample-with-payload: exactness below k, uniform bottom-k
  * retention above, merge-order byte canonicality (including the
  * deterministic payload tie rule), payload cap, codec validation.
  */
class KmvSampleSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def build(k: Int, entries: Iterable[(Long, String)]): KmvSample = {
    val s = KmvSample.empty(k)
    entries.foreach { case (h, p) => s.add(h, p.getBytes("UTF-8")) }
    s
  }

  private def payloadStrings(s: KmvSample): Seq[String] =
    s.payloads.map(p => new String(p, "UTF-8")).toSeq

  test("unsaturated: every distinct key retained, estimate exact, hash-ascending") {
    val r = rng(1)
    val entries = Seq.fill(500)(r.nextLong()).distinct.map(h => h -> s"v$h")
    val s = build(1024, entries ++ entries) // duplicates must not count
    assert(!s.isSaturated)
    assert(s.estimate === entries.size.toDouble)
    val got = s.entries.toSeq
    assert(got.map(_._1) ===
      entries.map(_._1).sortWith(java.lang.Long.compareUnsigned(_, _) < 0))
    assert(payloadStrings(s).toSet === entries.map(_._2).toSet)
  }

  test("saturated: retains exactly the k smallest unsigned hashes with their payloads") {
    val r = rng(2)
    val entries = Seq.fill(5000)(r.nextLong()).distinct.map(h => h -> s"p$h")
    val k = 128
    val s = build(k, entries)
    assert(s.isSaturated && s.size === k)
    val expected = entries.map(_._1)
      .sortWith(java.lang.Long.compareUnsigned(_, _) < 0).take(k)
    assert(s.entries.map(_._1).toSeq === expected)
    assert(payloadStrings(s) === expected.map(h => s"p$h"))
    // estimator identical to the payload-free Kmv over the same hash set
    val plain = Kmv.empty(k)
    entries.foreach { case (h, _) => plain.add(h) }
    assert(s.estimate === plain.estimate && s.theta === plain.theta)
  }

  test("merge-order byte canonicality incl. payload tie rule (property)") {
    val r = rng(3)
    (0 until 30).foreach { round =>
      val k = Seq(16, 64, 256)(round % 3)
      // deliberately include duplicate hashes with DIFFERENT payloads:
      // the lexicographically-smallest must win under any merge order
      val hashes = Seq.fill(300)(r.nextLong() % 50) // heavy collisions
      val entries = hashes.map(h => h -> s"pay${r.nextInt(5)}_$h")
      val flat = build(k, entries)
      // random partitioning into 1..6 parts, random tree merge
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
    }
  }

  test("payload tie rule: lexicographically smallest wins, insert-order independent") {
    val a = build(16, Seq(7L -> "zebra", 7L -> "apple", 7L -> "mango"))
    val b = build(16, Seq(7L -> "apple", 7L -> "mango", 7L -> "zebra"))
    assert(payloadStrings(a) === Seq("apple"))
    assert(java.util.Arrays.equals(a.toBytes, b.toBytes))
    // unsigned byte order, not signed: 0xFF sorts after 0x01
    val c = KmvSample.empty(16)
    c.add(1L, Array(0xff.toByte))
    c.add(1L, Array(0x01.toByte))
    assert(c.payloads.next().toSeq === Seq(0x01.toByte))
  }

  test("payload cap: oversized payloads truncate deterministically") {
    val big = "x" * (KmvSample.MaxPayloadBytes + 100)
    val s = build(16, Seq(5L -> big))
    assert(s.payloads.next().length === KmvSample.MaxPayloadBytes)
    // cap applies BEFORE the tie rule: a pre-truncated equal payload
    // yields identical bytes
    val t = build(16, Seq(5L -> big.take(KmvSample.MaxPayloadBytes)))
    assert(java.util.Arrays.equals(s.toBytes, t.toBytes))
  }

  test("self-merge is the identity; mixed-k merge rejected") {
    val s = build(32, (1L to 40L).map(h => h -> s"v$h"))
    val before = s.toBytes
    s.mergeIn(s)
    assert(java.util.Arrays.equals(s.toBytes, before))
    intercept[IllegalArgumentException](
      s.mergeIn(KmvSample.empty(64)))
  }

  test("wire round-trip and codec validation") {
    val s = build(64, (1L to 100L).map(h => Hashing.mix64(h) -> s"val$h"))
    val bytes = s.toBytes
    val round = KmvSample.fromBytes(bytes)
    assert(round === s)
    assert(java.util.Arrays.equals(round.toBytes, bytes))
    intercept[IllegalArgumentException](KmvSample.fromBytes(Array.emptyByteArray))
    val badVer = bytes.clone(); badVer(0) = 9
    intercept[IllegalArgumentException](KmvSample.fromBytes(badVer))
    val badK = bytes.clone(); badK(1) = -1
    intercept[IllegalArgumentException](KmvSample.fromBytes(badK))
    // n > k
    val badN = bytes.clone()
    badN(5) = 0; badN(6) = 0; badN(7) = 0; badN(8) = 65
    intercept[IllegalArgumentException](KmvSample.fromBytes(badN))
    intercept[IllegalArgumentException](KmvSample.fromBytes(bytes.dropRight(3)))
    intercept[IllegalArgumentException](
      KmvSample.fromBytes(bytes ++ Array[Byte](0)))
    // non-ascending hashes: swap the first two entries' hash bytes only
    // (entries are [hash:8][len:4][payload...]; payloads are same-length
    // here so swapping the 8 hash bytes breaks ordering cleanly when
    // payload lengths differ -> rebuild two-entry blob instead
    val two = build(16, Seq(10L -> "a", 20L -> "b")).toBytes
    val swapped = two.clone()
    // entry1 hash at 9..16, entry2 hash at 9+12+1+...: compute offsets
    val e1 = 9
    val e2 = 9 + 12 + 1 // 12 header + 1-byte payload "a"
    (0 until 8).foreach { i =>
      val t = swapped(e1 + i); swapped(e1 + i) = swapped(e2 + i); swapped(e2 + i) = t
    }
    intercept[IllegalArgumentException](KmvSample.fromBytes(swapped))
  }

  test("uniformity: sample membership is a pure function of the hash set") {
    // two streams with the same distinct keys in different multiplicities
    // and orders produce the SAME sample
    val r = rng(9)
    val keys = (0 until 2000).map(i => Hashing.mix64(i.toLong))
    val s1 = build(64, r.shuffle(keys).map(h => h -> s"k$h"))
    val s2 = build(64,
      (keys ++ keys.take(500) ++ keys.drop(1500)).map(h => h -> s"k$h"))
    assert(java.util.Arrays.equals(s1.toBytes, s2.toBytes))
  }
}
