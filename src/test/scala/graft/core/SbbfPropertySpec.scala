package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests mirroring reference tests/test_properties.py — the union
  * algebra laws here are exactly what Spark requires of an aggregation
  * buffer `merge` for correct partial aggregation under any partitioning.
  *
  * (Plain ScalaCheck generators driven from ScalaTest; the scalatestplus
  * bridge isn't in the offline dependency cache.)
  */
class SbbfPropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val keyGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s"s:$s"),
    Gen.long.map(n => s"n:$n"),
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(b => "b:" + b.mkString(",")))

  private val keysGen: Gen[List[String]] =
    Gen.choose(0, 80).flatMap(k => Gen.listOfN(k, keyGen))

  private val twoKeySets: Gen[(List[String], List[String])] =
    for { a <- keysGen; b <- keysGen } yield (a, b)

  private val threeKeySets: Gen[(List[String], List[String], List[String])] =
    for { a <- keysGen; b <- keysGen; c <- keysGen } yield (a, b, c)

  private def build(keys: Seq[String], cap: Long = 1000, fp: Double = 0.01): Sbbf = {
    val f = Sbbf.empty(cap, fp)
    keys.foreach(f.add)
    f
  }

  test("fastmod block select is bit-exact vs remainderUnsigned (property)") {
    // the block index is computed with Lemire-Kaser fastmod (no divider);
    // verify against the straightforward modulo on every geometry: insert
    // ONE hash into an empty filter and check that exactly the 8 expected
    // (block, word, bit) positions are set
    val gen = for {
      cap <- Gen.chooseNum(1L, 5000000L)
      h <- Gen.long
    } yield (cap, h)
    forAllN(gen, n = 300) { case (cap, h) =>
      val f = Sbbf.empty(cap, 0.01)
      f.insertHash(h)
      val base = (java.lang.Long.remainderUnsigned(h >>> 32, f.blockCount) *
        Sbbf.BlockWords).toInt
      val hLow = h.toInt
      var setWords = 0
      f.words.zipWithIndex.foreach { case (w, i) => if (w != 0L) setWords += 1 }
      assert(setWords <= Sbbf.BlockWords) // nothing outside one block
      (0 until Sbbf.BlockWords).foreach { j =>
        val expected = 1L << ((hLow * Sbbf.Salt(j)) >>> 26)
        assert(f.words(base + j) === expected, s"cap=$cap h=$h word=$j")
      }
    }
  }

  test("no false negatives (property)") {
    forAllN(keysGen) { keys =>
      val f = build(keys)
      keys.foreach(k => assert(f.contains(k)))
    }
  }

  test("determinism: same keys, any insertion order, same bytes") {
    forAllN(keysGen) { keys =>
      val a = build(keys)
      val b = build(new scala.util.Random(keys.size).shuffle(keys))
      assert(java.util.Arrays.equals(a.toBytes, b.toBytes))
    }
  }

  test("union commutativity: a|b == b|a") {
    forAllN(twoKeySets) { case (k1, k2) =>
      assert(build(k1).or(build(k2)) === build(k2).or(build(k1)))
    }
  }

  test("union associativity: (a|b)|c == a|(b|c)") {
    forAllN(threeKeySets) { case (k1, k2, k3) =>
      val (a, b, c) = (build(k1), build(k2), build(k3))
      assert(a.or(b).or(c) === a.or(b.or(c)))
    }
  }

  test("union idempotence and identity: a|a == a, a|empty == a") {
    forAllN(keysGen) { keys =>
      val a = build(keys)
      assert(a.or(a) === a)
      assert(a.or(Sbbf.empty(1000, 0.01)) === a)
    }
  }

  test("in-place union equals pure union") {
    forAllN(twoKeySets) { case (k1, k2) =>
      val pure = build(k1).or(build(k2))
      val inPlace = build(k1)
      inPlace.orInPlace(build(k2))
      assert(inPlace === pure)
    }
  }

  test("union contains all items from both sides") {
    forAllN(twoKeySets) { case (k1, k2) =>
      val u = build(k1).or(build(k2))
      (k1 ++ k2).foreach(k => assert(u.contains(k)))
    }
  }

  test("partitioned build == sequential build (Spark shuffle equivalence)") {
    forAllN(for { ks <- keysGen; p <- Gen.choose(1, 8) } yield (ks, p)) {
      case (keys, parts) =>
        val sequential = build(keys)
        val partitioned = keys.zipWithIndex
          .groupBy(_._2 % parts).values
          .map(g => build(g.map(_._1)))
          .reduceOption(_ orInPlace _)
          .getOrElse(Sbbf.empty(1000, 0.01))
        assert(partitioned === sequential)
        assert(java.util.Arrays.equals(partitioned.toBytes, sequential.toBytes))
    }
  }

  test("round-trip preserves equality and membership (property)") {
    forAllN(keysGen) { keys =>
      val f = build(keys)
      val f2 = Sbbf.fromBytes(f.toBytes)
      assert(f2 === f)
      keys.foreach(k => assert(f2.contains(k)))
    }
  }

  test("long and double hashing agree on integral values (property)") {
    forAllN(Gen.choose(-1000000L, 1000000L)) { n =>
      assert(Hashing.hashLong(n) === Hashing.hashDouble(n.toDouble))
    }
  }
}
