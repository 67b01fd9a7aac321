package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(21L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("at most k distinct keys: counts exact, zero decremented weight") {
    val mg = MisraGries.empty(8)
    val stream = (0 until 10000).map(i => s"key${i % 5}")
    stream.foreach(mg.add)
    assert(mg.decrementedWeight === 0L)
    assert(mg.itemCount === 10000L)
    (0 until 5).foreach { i =>
      val (lb, ub) = mg.bounds(s"key$i")
      assert(lb === 2000L && ub === 2000L)
    }
    assert(mg.topK(10).map(_._1).toSet === (0 until 5).map(i => s"key$i").toSet)
  }

  test("skewed stream beyond k: bounds contain truth, err within n/(k+1)") {
    val k = 16
    val mg = MisraGries.empty(k)
    // zipf-ish: key i appears 10000/(i+1) times, 200 distinct
    val truth = (0 until 200).map(i => s"w$i" -> (10000 / (i + 1)).max(1)).toMap
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      truth.toSeq.flatMap { case (key, c) => Seq.fill(c)(key) })
    stream.foreach(mg.add)
    val n = stream.size.toLong
    assert(mg.decrementedWeight <= n / (k + 1), s"err=${mg.decrementedWeight}")
    truth.foreach { case (key, c) =>
      val (lb, ub) = mg.bounds(key)
      assert(lb <= c && c <= ub, s"$key true=$c bounds=($lb,$ub)")
    }
    // guaranteed presence above the error threshold
    truth.filter(_._2 > n / (k + 1)).keys.foreach { key =>
      assert(mg.bounds(key)._1 > 0, s"$key must be tracked")
    }
  }

  test("weighted add equals repeated unit adds") {
    val a = MisraGries.empty(4)
    val b = MisraGries.empty(4)
    val ops = Seq(("x", 5L), ("y", 3L), ("z", 2L), ("w", 7L), ("v", 4L), ("x", 2L))
    ops.foreach { case (key, w) => a.add(key, w) }
    ops.foreach { case (key, w) => (0L until w).foreach(_ => b.add(key)) }
    assert(a.itemCount === b.itemCount)
    // bounds contain truth in both; exact counters may differ only in
    // how decrement rounds interleave, never in the containment
    val truth = ops.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    truth.foreach { case (key, c) =>
      val (la, ua) = a.bounds(key)
      val (lb2, ub2) = b.bounds(key)
      assert(la <= c && c <= ua, s"a: $key")
      assert(lb2 <= c && c <= ub2, s"b: $key")
    }
  }

  test("merge preserves bounds under any partitioning/order (100 cases)") {
    val gen = for {
      keys <- Gen.choose(1, 400).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0, 30).map(i => s"m$i")))
      cut <- Gen.chooseNum(0, 100)
      k <- Gen.oneOf(4, 8, 64)
    } yield (keys, cut, k)
    forAllN(gen) { case (keys, cut, k) =>
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val i = cut % (keys.size + 1)
      val (l, r) = keys.splitAt(i)
      def build(ks: Seq[String]): MisraGries = {
        val m = MisraGries.empty(k)
        ks.foreach(m.add)
        m
      }
      val ab = build(l).merge(build(r))
      val ba = build(r).merge(build(l))
      for (m <- Seq(ab, ba)) {
        assert(m.itemCount === keys.size.toLong)
        assert(m.decrementedWeight <= keys.size.toLong / (k + 1) + 1)
        truth.foreach { case (key, c) =>
          val (lb, ub) = m.bounds(key)
          assert(lb <= c && c <= ub, s"k=$k $key true=$c bounds=($lb,$ub)")
        }
      }
      // with k >= distinct keys everything is exact and merge order moot
      if (k >= truth.size) {
        assert(ab.decrementedWeight === 0L)
        assert(ab.toBytes.toSeq === ba.toBytes.toSeq)
      }
    }
  }

  test("wire round trip exact; corruption matrix rejects") {
    val mg = MisraGries.empty(8)
    (0 until 5000).foreach(i => mg.add(s"rt${i % 20}"))
    val bytes = mg.toBytes
    val back = MisraGries.fromBytes(bytes)
    assert(back.itemCount === mg.itemCount)
    assert(back.decrementedWeight === mg.decrementedWeight)
    assert(back.topK(8) === mg.topK(8))
    assert(back.toBytes.toSeq === bytes.toSeq)

    def corrupt(mut: Array[Byte] => Unit): Unit = {
      val b = bytes.clone(); mut(b)
      intercept[SbbfFormatException](MisraGries.fromBytes(b))
    }
    corrupt(b => b(0) = 'X') // magic
    corrupt(b => b(4) = 9) // version
    intercept[SbbfFormatException](MisraGries.fromBytes(bytes.take(10)))
    intercept[SbbfFormatException](MisraGries.fromBytes(bytes ++ Array[Byte](0)))
  }

  test("constructor validation") {
    intercept[IllegalArgumentException](MisraGries.empty(0))
    intercept[IllegalArgumentException](MisraGries.empty(1000001))
    intercept[IllegalArgumentException](MisraGries.empty(4).add("x", 0))
    intercept[IllegalArgumentException](
      MisraGries.empty(4).merge(MisraGries.empty(8)))
  }

  test("UTF8String path: equals the String path; borrowed buffers are cloned on insert") {
    import org.apache.spark.unsafe.types.UTF8String
    val keys = (0 until 5000).map(i => s"k${i % 37}")
    val viaString = MisraGries.empty(16)
    keys.foreach(viaString.add)
    val viaUtf8 = MisraGries.empty(16)
    keys.foreach(k => viaUtf8.add(UTF8String.fromString(k)))
    assert(viaString.toBytes.toSeq === viaUtf8.toBytes.toSeq)

    // the distributed update hands in BORROWED UTF8Strings (pointers into
    // a reused row buffer) — the summary must clone at first insertion or
    // later buffer writes would corrupt tracked keys
    val buf = "alpha".getBytes("UTF-8")
    val borrowed = UTF8String.fromBytes(buf)
    val mg = MisraGries.empty(8)
    mg.add(borrowed)
    buf(0) = 'z'; buf(1) = 'z' // simulate the row buffer being reused
    assert(mg.bounds("alpha")._1 === 1L, "tracked key must be an owned copy")
    assert(mg.bounds("zzpha")._1 === 0L)
    assert(mg.topK(8).map(_._1) === Seq("alpha"))
  }
}
