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

  test("SBF bytes are merge-order-canonical over any merge tree (100 cases)") {
    // the judge-level contract: the same PARTIALS (per-partition lineages)
    // must serialize to the SAME blob no matter the order or tree shape
    // Spark merges them in — both raw (pre-compaction, the shuffle form)
    // and finalized (post-compaction, the eval form)
    val partialsGen = for {
      nParts <- Gen.choose(1, 6)
      parts <- Gen.listOfN(nParts,
        Gen.choose(0, 400).flatMap(k => Gen.listOfN(k, Gen.chooseNum(0L, 100000L))))
      perm <- Gen.choose(0, 719) // index into the permutations of <= 6 parts
    } yield (parts, perm)
    forAllN(partialsGen) { case (parts, perm) =>
      def build(ks: Seq[Long]): Sbf = {
        val f = Sbf.empty(64, 0.01)
        ks.foreach(f.add)
        f
      }
      def leftFold(ps: Seq[Seq[Long]]): Sbf =
        ps.map(build).reduceLeft((x, y) => x.mergeInPlace(y))
      def treeFold(ps: Vector[Sbf]): Sbf =
        if (ps.size == 1) ps.head
        else treeFold(ps.grouped(2).map {
          case Vector(x, y) => x.mergeInPlace(y)
          case Vector(x) => x
        }.toVector)
      // deterministic reordering: rotate by perm, reverse on odd perm
      // (permutations.drop can run past the DISTINCT-permutation count)
      val rotated = parts.drop(perm % parts.size) ++ parts.take(perm % parts.size)
      val shuffled = if (perm % 2 == 1) rotated.reverse else rotated
      val a = leftFold(parts)
      val b = leftFold(shuffled)
      val c = treeFold(shuffled.map(build).toVector)
      assert(a.toBytes.toSeq === b.toBytes.toSeq, "raw bytes, shuffled order")
      assert(a.toBytes.toSeq === c.toBytes.toSeq, "raw bytes, tree shape")
      assert(a === b && a.hashCode === b.hashCode)
      val keys = parts.flatten
      val compacted = Seq(a, b, c).map(_.compact())
      assert(compacted(0).toBytes.toSeq === compacted(1).toBytes.toSeq, "compacted bytes")
      assert(compacted(0).toBytes.toSeq === compacted(2).toBytes.toSeq, "compacted bytes tree")
      compacted.foreach { f =>
        assert(f.insertedCount === keys.size.toLong)
        keys.foreach(k => assert(f.contains(k), s"k=$k zero FN after compact"))
      }
      // compaction is idempotent on already-compacted series
      val once = compacted(0).toBytes.toSeq
      assert(compacted(0).compact().toBytes.toSeq === once)
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
