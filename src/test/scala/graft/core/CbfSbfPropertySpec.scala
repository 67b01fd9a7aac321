package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck merge laws for the counting and scalable filters — the same
  * battery the SBBF has (SbbfPropertySpec): the algebraic properties Spark
  * partial aggregation relies on, over randomized inserts/deletes and
  * partitionings. (Plain ScalaCheck generators driven from ScalaTest —
  * the scalatestplus bridge isn't in the offline dependency cache.)
  */
class CbfSbfPropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(7L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val ops: Gen[List[(Long, Int)]] = for {
    keys <- Gen.choose(0, 120).flatMap(k => Gen.listOfN(k, Gen.chooseNum(-500L, 500L)))
    // deletes only for keys already inserted (standard CBF contract)
    dels <- Gen.someOf(keys)
  } yield keys.map((_, 1)) ++ dels.map((_, -1)).toList

  private def cbfOf(xs: Seq[(Long, Int)]): Cbf = {
    val f = Cbf.empty(400, 0.03)
    xs.foreach { case (k, w) => f.add(k, w) }
    f
  }

  test("CBF merge: commutative, associative, zero identity (100 cases)") {
    forAllN(for { a <- ops; b <- ops; c <- ops } yield (a, b, c)) { case (a, b, c) =>
      val (fa, fb, fc) = (cbfOf(a), cbfOf(b), cbfOf(c))
      assert(fa.copy().addInPlace(fb) === fb.copy().addInPlace(fa))
      assert(fa.copy().addInPlace(fb).addInPlace(fc) ===
        fa.copy().addInPlace(fb.copy().addInPlace(fc)))
      assert(fa.copy().addInPlace(Cbf.empty(400, 0.03)) === fa)
    }
  }

  test("CBF partitioned == sequential for any split point (100 cases)") {
    forAllN(for { xs <- ops; cut <- Gen.chooseNum(0, 100) } yield (xs, cut)) {
      case (xs, cut) =>
        val seqF = cbfOf(xs)
        val i = if (xs.isEmpty) 0 else cut % (xs.size + 1)
        val (l, r) = xs.splitAt(i)
        assert(cbfOf(l).addInPlace(cbfOf(r)) === seqF)
    }
  }

  test("CBF wire round trip preserves equality (100 cases)") {
    forAllN(ops) { xs =>
      val f = cbfOf(xs)
      assert(Cbf.fromBytes(f.toBytes) === f)
    }
  }

  test("SBF merge keeps every key of both sides, counts add (100 cases)") {
    val keys = Gen.choose(0, 300).flatMap(k => Gen.listOfN(k, Gen.chooseNum(0L, 100000L)))
    forAllN(for { a <- keys; b <- keys } yield (a, b)) { case (a, b) =>
      def build(ks: Seq[Long]): Sbf = {
        val f = Sbf.empty(64, 0.01)
        ks.foreach(f.add)
        f
      }
      val merged = build(a).mergeInPlace(build(b))
      assert(merged.insertedCount === (a.size + b.size).toLong)
      (a ++ b).foreach(k => assert(merged.contains(k)))
    }
  }

  test("SBF wire round trip exact for any growth state (100 cases)") {
    forAllN(Gen.chooseNum(0, 2000)) { n =>
      val f = Sbf.empty(32, 0.02)
      (0 until n).foreach(i => f.add(i.toLong))
      val g = Sbf.fromBytes(f.toBytes)
      assert(g === f)
      assert(g.insertedCount === n.toLong)
    }
  }
}
