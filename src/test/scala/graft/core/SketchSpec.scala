package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy-vs-published-bound and merge-law tests for the sibling
  * sketches (HLL, count-min, t-digest, KLL). Exact answers computed
  * in-test; bounds are the published ones (SURVEY.md §7.4).
  */
class SketchSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  // -------------------------------------------------------------------- HLL

  test("HLL estimate within 3 sigma of exact across cardinalities") {
    for (n <- Seq(100, 1000, 10000, 100000, 1000000)) {
      val h = Hll.empty()
      var i = 0
      while (i < n) { h.addHash(Hashing.hashString(s"item$i")); i += 1 }
      val est = h.estimate
      val bound = 3 * h.relativeError * n
      assert(math.abs(est - n) <= bound.max(3), s"n=$n est=$est")
    }
  }

  test("HLL merge == union build; merge laws") {
    val a = Hll.empty()
    val b = Hll.empty()
    val u = Hll.empty()
    (0 until 5000).foreach { i => a.addHash(Hashing.hashLong(i)); u.addHash(Hashing.hashLong(i)) }
    (2500 until 7500).foreach { i => b.addHash(Hashing.hashLong(i)); u.addHash(Hashing.hashLong(i)) }
    val m = a.copy().merge(b)
    assert(m === u) // register-wise max is exact set union of sketches
    assert(b.copy().merge(a) === m) // commutative
    assert(m.copy().merge(m) === m) // idempotent
  }

  test("HLL round-trip and codec validation") {
    val h = Hll.empty(12)
    (0 until 1000).foreach(i => h.addHash(Hashing.hashLong(i)))
    val h2 = Hll.fromBytes(h.toBytes)
    assert(h2 === h && h2.estimate === h.estimate)
    intercept[SbbfFormatException](Hll.fromBytes("XXXX".getBytes ++ h.toBytes.drop(4)))
    intercept[SbbfFormatException](Hll.fromBytes(h.toBytes.dropRight(1)))
    intercept[SbbfFormatException](Hll.fromBytes(Array[Byte](1, 2)))
  }

  test("HllBuffer: byte-identical to the dense build at every cardinality (incl. promote boundary)") {
    for (p <- Seq(4, 12, 14); n <- Seq(0, 1, 3, 50, 1000, 5000, 60000)) {
      val buf = HllBuffer.empty(p)
      val dense = Hll.empty(p)
      var i = 0
      while (i < n) {
        val h = Hashing.hashLong(i * 7919L + p)
        buf.addHash(h); dense.addHash(h)
        i += 1
      }
      assert(java.util.Arrays.equals(buf.toBytes, dense.toBytes),
        s"p=$p n=$n sparse=${buf.isSparse}")
      assert(buf.estimate === dense.estimate)
      assert(buf.toHll === dense)
    }
    // low-cardinality sketches must actually BE sparse on the wire
    val small = HllBuffer.empty(14)
    (0 until 100).foreach(i => small.addHash(Hashing.hashLong(i)))
    assert(small.isSparse && small.toBytes.length < 600,
      s"expected sparse wire, got ${small.toBytes.length} bytes")
    // high-cardinality ones must promote and encode dense
    val big = HllBuffer.empty(12)
    (0 until 60000).foreach(i => big.addHash(Hashing.hashLong(i)))
    assert(!big.isSparse && big.toBytes.length === 6 + 4096)
  }

  test("HllBuffer: merges across sparse/dense representations are canonical") {
    val r = rng(7)
    val p = 12
    // four chunks of very different sizes -> mixed representations
    val chunks = Seq(5, 40, 3000, 20000).map { n =>
      Array.fill(n)(r.nextLong())
    }
    val union = Hll.empty(p)
    chunks.foreach(_.foreach(union.addHash))
    val expected = union.toBytes
    // every permutation of pairwise mergeIn over buffers round-tripped
    // through the wire (the shuffle path) must reproduce the same bytes
    for (perm <- chunks.permutations.take(12)) {
      val bufs = perm.map { ch =>
        val b = HllBuffer.empty(p); ch.foreach(b.addHash)
        HllBuffer.fromBytes(b.toBytes) // wire round-trip like a shuffle
      }
      val merged = bufs.reduce((a, b) => a.mergeIn(b))
      assert(java.util.Arrays.equals(merged.toBytes, expected))
    }
    // mixed-version wire: dense v1 bytes of a sparse-content sketch must
    // still decode and merge (old artifacts stay readable)
    val sparseContent = Hll.empty(p)
    (0 until 10).foreach(i => sparseContent.addHash(Hashing.hashLong(i)))
    val denseV1 = {
      val out = new Array[Byte](6 + (1 << p))
      out(0) = 'G'; out(1) = 'H'; out(2) = 'L'; out(3) = 'L'; out(4) = 1; out(5) = p.toByte
      System.arraycopy(sparseContent.registers, 0, out, 6, 1 << p)
      out
    }
    assert(Hll.fromBytes(denseV1) === sparseContent)
    // canonical re-encode of v1 input emits the sparse form
    assert(Hll.fromBytes(denseV1).toBytes.length === 10 + 4 * 10)
  }

  test("HllBuffer: v2 wire in the promote window (promoteAt < count < cutoff) decodes") {
    // p=12: promoteAt=512, sparse cutoff=1023 — a v2 blob with ~800
    // entries promotes MID-decode; regression for the null-table NPE
    val p = 12
    val dense = Hll.empty(p)
    var i = 0L
    var c = 0
    while (c < 800) {
      val before = c
      dense.addHash(Hashing.hashLong(i))
      c = dense.registers.count(_ != 0)
      if (c == before) () // collision, keep going
      i += 1
    }
    val bytes = dense.toBytes
    assert(bytes(4) === 2.toByte, "expected sparse v2 in the promote window")
    val buf = HllBuffer.fromBytes(bytes)
    assert(!buf.isSparse, "expected promotion during decode")
    assert(java.util.Arrays.equals(buf.toBytes, bytes))
    assert(buf.toHll === dense)
  }

  test("HLL sparse v2 codec validation") {
    val b = HllBuffer.empty(12)
    (0 until 50).foreach(i => b.addHash(Hashing.hashLong(i)))
    val bytes = b.toBytes
    assert(bytes(4) === 2.toByte)
    assert(Hll.fromBytes(bytes).toBytes.sameElements(bytes)) // round-trip canonical
    intercept[SbbfFormatException](Hll.fromBytes(bytes.dropRight(1)))
    intercept[SbbfFormatException](Hll.fromBytes(bytes ++ Array[Byte](0)))
    // non-ascending entries rejected (canonicality guard)
    val swapped = bytes.clone()
    val tmp = swapped.slice(10, 14)
    Array.copy(swapped, 14, swapped, 10, 4)
    Array.copy(tmp, 0, swapped, 14, 4)
    intercept[SbbfFormatException](Hll.fromBytes(swapped))
    // rank 0 entry rejected
    val zeroRank = bytes.clone()
    zeroRank(13) = (zeroRank(13) & 0xc0).toByte
    intercept[SbbfFormatException](Hll.fromBytes(zeroRank))
    // count out of range rejected
    val badCount = bytes.clone()
    badCount(6) = 0x7f.toByte
    intercept[SbbfFormatException](Hll.fromBytes(badCount))
  }

  test("HLL small-range linear counting is near-exact") {
    val h = Hll.empty()
    (0 until 50).foreach(i => h.addHash(Hashing.hashString(s"s$i")))
    assert(math.abs(h.estimate - 50) <= 2)
  }

  // -------------------------------------------------------------- count-min

  test("CMS never underestimates; overestimate within eps*N") {
    val cms = CountMin.forError(0.001, 0.01)
    val r = rng(1)
    // zipf-ish: key j appears ~ 10000/j times
    val truth = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    for (j <- 1 to 200; _ <- 1 to (10000 / j)) {
      cms.addHash(Hashing.hashLong(j))
      truth(j) += 1
    }
    for (j <- 1 to 200) {
      val est = cms.queryHash(Hashing.hashLong(j))
      assert(est >= truth(j), s"underestimate at $j")
      assert(est <= truth(j) + cms.errorBound, s"overestimate beyond bound at $j")
    }
  }

  test("CMS merge == combined build") {
    val a = CountMin.forError(0.01, 0.01)
    val b = CountMin.forError(0.01, 0.01)
    val u = CountMin.forError(0.01, 0.01)
    (0 until 1000).foreach { i => a.addHash(Hashing.hashLong(i % 50)); u.addHash(Hashing.hashLong(i % 50)) }
    (0 until 500).foreach { i => b.addHash(Hashing.hashLong(i % 20)); u.addHash(Hashing.hashLong(i % 20)) }
    assert(a.copy().merge(b) === u)
    assert(u.total === 1500)
  }

  test("CMS inner product: never under, within eps*Na*Nb over, saturating") {
    // known multisets: A = {k0:3, k1:2, k2:1}, B = {k0:4, k2:5, k3:7}
    // true inner product = 3*4 + 1*5 = 17
    val a = CountMin.forError(1e-4, 0.001)
    val b = CountMin.forError(1e-4, 0.001)
    a.addHash(Hashing.hashLong(0L), 3); a.addHash(Hashing.hashLong(1L), 2)
    a.addHash(Hashing.hashLong(2L), 1)
    b.addHash(Hashing.hashLong(0L), 4); b.addHash(Hashing.hashLong(2L), 5)
    b.addHash(Hashing.hashLong(3L), 7)
    val est = a.innerProduct(b)
    assert(est >= 17L && est <= 17L + 1L, s"est=$est")
    assert(b.innerProduct(a) === est) // symmetric
    // random streams: bound holds at every checkpoint
    val r = rng(5)
    val x = CountMin.forError(0.001, 0.01)
    val y = CountMin.forError(0.001, 0.01)
    val fx = new scala.collection.mutable.HashMap[Long, Long]()
    val fy = new scala.collection.mutable.HashMap[Long, Long]()
    (0 until 20000).foreach { _ =>
      val k = r.nextInt(500).toLong
      x.addHash(Hashing.hashLong(k)); fx.update(k, fx.getOrElse(k, 0L) + 1)
      val k2 = r.nextInt(800).toLong
      y.addHash(Hashing.hashLong(k2)); fy.update(k2, fy.getOrElse(k2, 0L) + 1)
    }
    val trueIp = fx.map { case (k, c) => c * fy.getOrElse(k, 0L) }.sum
    val ip = x.innerProduct(y)
    val slack = math.ceil(math.E / x.width * x.total * y.total).toLong
    assert(ip >= trueIp && ip <= trueIp + slack, s"ip=$ip true=$trueIp")
    // dimension mismatch rejected
    intercept[IllegalArgumentException](
      a.innerProduct(CountMin.forError(0.01, 0.01)))
    // saturation instead of overflow
    val big1 = CountMin.forError(0.01, 0.5)
    val big2 = CountMin.forError(0.01, 0.5)
    big1.addHash(Hashing.hashLong(9L), Long.MaxValue / 2)
    big2.addHash(Hashing.hashLong(9L), 8)
    assert(big1.innerProduct(big2) === Long.MaxValue)
    // negative cells (weighted deletes) multiply EXACTLY, never saturate
    val na = CountMin.forError(0.01, 0.5)
    val nb = CountMin.forError(0.01, 0.5)
    na.addHash(Hashing.hashLong(9L), 3); na.addHash(Hashing.hashLong(9L), -2)
    nb.addHash(Hashing.hashLong(9L), -1)
    assert(na.innerProduct(nb) === -1L)
    // NEGATIVE overflow saturates toward Long.MinValue, never +MaxValue
    // (a hugely negative product must not RAISE the min-over-rows estimate)
    val pa = CountMin.forError(0.01, 0.5)
    val pb = CountMin.forError(0.01, 0.5)
    pa.addHash(Hashing.hashLong(9L), Long.MaxValue / 2)
    pb.addHash(Hashing.hashLong(9L), -8)
    assert(pa.innerProduct(pb) === Long.MinValue)
    assert(pb.innerProduct(pa) === Long.MinValue)
  }

  test("CMS round-trip and codec validation") {
    val cms = CountMin.forError(0.01, 0.05)
    (0 until 1000).foreach(i => cms.addHash(Hashing.hashLong(i % 37)))
    val c2 = CountMin.fromBytes(cms.toBytes)
    assert(c2 === cms)
    intercept[SbbfFormatException](CountMin.fromBytes(cms.toBytes.dropRight(3)))
    intercept[SbbfFormatException](CountMin.fromBytes("bogus".getBytes))
  }

  test("CountMinBuffer: byte-identical to the dense build at every cardinality") {
    for ((eps, delta) <- Seq((0.01, 0.01), (0.001, 0.01));
         n <- Seq(0, 1, 10, 200, 3000, 50000)) {
      val buf = CountMinBuffer.forError(eps, delta)
      val dense = CountMin.forError(eps, delta)
      var i = 0
      while (i < n) {
        val h = Hashing.hashLong(i % (n / 3 + 1))
        buf.addHash(h); dense.addHash(h)
        i += 1
      }
      assert(java.util.Arrays.equals(buf.toBytes, dense.toBytes),
        s"eps=$eps n=$n sparse=${buf.isSparse}")
      assert(buf.total === dense.total)
      assert(buf.toCountMin === dense)
      // point queries agree in both representations
      (0 until 20).foreach { k =>
        assert(buf.queryHash(Hashing.hashLong(k)) === dense.queryHash(Hashing.hashLong(k)))
      }
    }
    // low-cardinality: sparse on the wire, far below the dense size
    val small = CountMinBuffer.forError(0.001, 0.01) // dense = 106 KB
    (0 until 300).foreach(i => small.addHash(Hashing.hashLong(i % 10)))
    assert(small.isSparse && small.toBytes.length < 1000,
      s"expected sparse wire, got ${small.toBytes.length} bytes")
  }

  test("CountMinBuffer: merges across sparse/dense representations are canonical") {
    val r = rng(11)
    val (eps, delta) = (0.01, 0.05) // cells = 272*3
    val chunks = Seq(3, 25, 400, 5000).map(n => Array.fill(n)(r.nextLong()))
    val union = CountMin.forError(eps, delta)
    chunks.foreach(_.foreach(h => union.addHash(h)))
    val expected = union.toBytes
    for (perm <- chunks.permutations.take(12)) {
      val bufs = perm.map { ch =>
        val b = CountMinBuffer.forError(eps, delta); ch.foreach(h => b.addHash(h))
        CountMinBuffer.fromBytes(b.toBytes) // wire round-trip like a shuffle
      }
      val merged = bufs.reduce((a, b) => a.mergeIn(b))
      assert(java.util.Arrays.equals(merged.toBytes, expected))
      assert(merged.total === union.total)
    }
  }

  test("CountMinBuffer: v2 wire in the promote window (promoteAt < count < cutoff) decodes") {
    // cells=816 at (0.01, 0.05): promoteAt=272, cutoff=543 — a v2 blob in
    // between promotes MID-decode; regression for the null-keys NPE
    val dense = CountMin.forError(0.01, 0.05)
    var i = 0L
    while (dense.counters.count(_ != 0L) < 400) {
      dense.addHash(Hashing.hashLong(i)); i += 1
    }
    val bytes = dense.toBytes
    assert(bytes(4) === 2.toByte, "expected sparse v2 in the promote window")
    val buf = CountMinBuffer.fromBytes(bytes)
    assert(!buf.isSparse, "expected promotion during decode")
    assert(java.util.Arrays.equals(buf.toBytes, bytes))
    assert(buf.total === dense.total)
  }

  test("CMS sparse v2 codec validation") {
    val b = CountMinBuffer.forError(0.001, 0.01)
    (0 until 50).foreach(i => b.addHash(Hashing.hashLong(i % 7)))
    val bytes = b.toBytes
    assert(bytes(4) === 2.toByte)
    assert(CountMin.fromBytes(bytes).toBytes.sameElements(bytes))
    assert(CountMin.fromBytes(bytes).total === 50L)
    intercept[SbbfFormatException](CountMin.fromBytes(bytes.dropRight(1)))
    intercept[SbbfFormatException](CountMin.fromBytes(bytes ++ Array[Byte](0)))
    // non-ascending cells rejected
    val swapped = bytes.clone()
    val tmp = swapped.slice(25, 37)
    Array.copy(swapped, 37, swapped, 25, 12)
    Array.copy(tmp, 0, swapped, 37, 12)
    intercept[SbbfFormatException](CountMin.fromBytes(swapped))
    // zero-valued sparse cell rejected (canonical form omits them)
    val zeroVal = bytes.clone()
    java.util.Arrays.fill(zeroVal, 29, 37, 0.toByte)
    intercept[SbbfFormatException](CountMin.fromBytes(zeroVal))
    // count out of range rejected
    val badCount = bytes.clone()
    badCount(21) = 0x7f.toByte
    intercept[SbbfFormatException](CountMin.fromBytes(badCount))
  }

  // --------------------------------------------------------------- t-digest

  test("t-digest quantiles: rank error small mid-range, tiny at tails") {
    val n = 100000
    val r = rng(7)
    val data = Array.fill(n)(r.nextGaussian() * 100 + 50)
    val td = TDigest.empty()
    data.foreach(td.add(_))
    val sorted = data.sorted
    def exactRank(x: Double): Double = {
      val idx = java.util.Arrays.binarySearch(sorted, x)
      val pos = if (idx >= 0) idx else -idx - 1
      pos.toDouble / n
    }
    for (q <- Seq(0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)) {
      val est = td.quantile(q)
      val rankErr = math.abs(exactRank(est) - q)
      val bound = if (q <= 0.01 || q >= 0.99) 0.003 else 0.02
      assert(rankErr <= bound, s"q=$q est=$est rankErr=$rankErr")
    }
  }

  test("t-digest merged across 8 shards stays within bounds") {
    val n = 80000
    val r = rng(11)
    val data = Array.fill(n)(r.nextDouble() * 1000)
    val shards = (0 until 8).map { s =>
      val td = TDigest.empty()
      data.zipWithIndex.filter(_._2 % 8 == s).foreach(x => td.add(x._1))
      td
    }
    val merged = shards.reduce(_ merge _)
    assert(math.abs(merged.count - n) < 1e-6)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.5, 0.99)) {
      val est = merged.quantile(q)
      val exact = sorted((q * (n - 1)).toInt)
      val rankErr = math.abs(sorted.count(_ <= est).toDouble / n - q)
      assert(rankErr <= 0.03, s"q=$q est=$est exact=$exact rankErr=$rankErr")
    }
  }

  test("t-digest cdf/quantile round-trip, codec, edge cases") {
    val td = TDigest.empty()
    (1 to 10000).foreach(i => td.add(i.toDouble))
    val t2 = TDigest.fromBytes(td.toBytes)
    assert(math.abs(t2.quantile(0.5) - td.quantile(0.5)) < 1e-9)
    assert(t2.quantile(0.0) === 1.0)
    assert(t2.quantile(1.0) === 10000.0)
    assert(math.abs(t2.cdf(5000) - 0.5) < 0.02)
    assert(t2.cdf(0) === 0.0 && t2.cdf(20000) === 1.0)
    intercept[SbbfFormatException](TDigest.fromBytes(td.toBytes.dropRight(1)))
    val empty = TDigest.empty()
    assert(empty.quantile(0.5).isNaN)
  }

  // -------------------------------------------------------------------- KLL

  test("KLL rank error within additive epsilon") {
    val n = 200000
    val r = rng(13)
    val data = Array.fill(n)(r.nextDouble() * 1e6)
    val kll = Kll.empty()
    data.foreach(kll.add)
    assert(kll.count === n)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = kll.quantile(q)
      val rankErr = math.abs(sorted.count(_ <= est).toDouble / n - q)
      assert(rankErr <= kll.epsilon, s"q=$q rankErr=$rankErr eps=${kll.epsilon}")
    }
  }

  test("KLL merge across shards within epsilon") {
    val n = 100000
    val r = rng(17)
    val data = Array.fill(n)(r.nextGaussian())
    val shards = (0 until 5).map { s =>
      val k = Kll.empty()
      data.zipWithIndex.filter(_._2 % 5 == s).foreach(x => k.add(x._1))
      k
    }
    val merged = shards.reduce(_ merge _)
    assert(merged.count === n)
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      val rankErr = math.abs(sorted.count(_ <= est).toDouble / n - q)
      assert(rankErr <= 2 * merged.epsilon, s"q=$q rankErr=$rankErr")
    }
  }

  test("KLL round-trip and codec validation") {
    val kll = Kll.empty(128)
    (0 until 50000).foreach(i => kll.add(i.toDouble))
    val k2 = Kll.fromBytes(kll.toBytes)
    assert(k2.count === kll.count)
    assert(k2.quantile(0.5) === kll.quantile(0.5))
    assert(java.util.Arrays.equals(k2.toBytes, kll.toBytes))
    intercept[SbbfFormatException](Kll.fromBytes(kll.toBytes.dropRight(1)))
    intercept[SbbfFormatException](Kll.fromBytes(kll.toBytes ++ Array[Byte](0)))
    intercept[SbbfFormatException](Kll.fromBytes("nope".getBytes))
  }

  test("KLL deterministic: same input, same bytes") {
    def build() = {
      val k = Kll.empty()
      (0 until 30000).foreach(i => k.add((i * 2654435761L % 99991).toDouble))
      k
    }
    assert(java.util.Arrays.equals(build().toBytes, build().toBytes))
  }
}
