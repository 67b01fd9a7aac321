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

  test("CMS round-trip and codec validation") {
    val cms = CountMin.forError(0.01, 0.05)
    (0 until 1000).foreach(i => cms.addHash(Hashing.hashLong(i % 37)))
    val c2 = CountMin.fromBytes(cms.toBytes)
    assert(c2 === cms)
    intercept[SbbfFormatException](CountMin.fromBytes(cms.toBytes.dropRight(3)))
    intercept[SbbfFormatException](CountMin.fromBytes("bogus".getBytes))
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
