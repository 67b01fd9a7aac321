package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SbfSpec extends AnyFunSuite {

  test("grows stages on demand, zero FN at any cardinality") {
    val f = Sbf.empty(1024, 0.001)
    assert(f.stageCount === 0)
    (0L until 50000L).foreach(f.add)
    assert(f.stageCount > 1, "must have grown past the first stage")
    assert(f.insertedCount === 50000L)
    (0L until 50000L).foreach(k => assert(f.contains(k), s"k=$k"))
    // stage capacities follow the geometric schedule
    val caps = f.toBytes // round-trip to inspect via parse
    val g = Sbf.fromBytes(caps)
    assert(g.stageCount === f.stageCount)
  }

  test("empirical FP within the compound union bound") {
    val f = Sbf.empty(4096, 0.001)
    (0L until 40000L).foreach(f.add)
    val probes = 200000
    val fp = (1000000L until 1000000L + probes).count(f.contains)
    val bound = f.compoundFpBound
    assert(bound <= 0.001 / (1 - 0.9) + 1e-9, s"schedule bound: $bound")
    assert(fp.toDouble / probes <= bound * 1.5, s"fp=$fp bound=$bound")
  }

  test("wire round trip exact; corruption matrix rejects") {
    val f = Sbf.empty(512, 0.01)
    (0L until 2000L).foreach(f.add)
    val bytes = f.toBytes
    val g = Sbf.fromBytes(bytes)
    assert(g === f)
    assert(g.toBytes.toSeq === bytes.toSeq)
    (0L until 2000L).foreach(k => assert(g.contains(k)))

    def corrupt(mut: Array[Byte] => Unit): Unit = {
      val b = bytes.clone(); mut(b)
      intercept[SbbfFormatException](Sbf.fromBytes(b))
    }
    corrupt(b => b(0) = 'X')                        // magic
    corrupt(b => b(4) = 9)                          // version
    intercept[SbbfFormatException](Sbf.fromBytes(bytes.take(20)))          // short
    intercept[SbbfFormatException](Sbf.fromBytes(bytes ++ Array[Byte](1))) // trailing
    corrupt(b => b(Sbf.HeaderSize + 12) = 'X')      // stage magic (inner SBBF validation)
  }

  test("merge: all keys of both sides contained, counts add, any tree shape") {
    val keys = (0L until 30000L).toVector
    val parts = keys.grouped(5000).toVector
    def build(ks: Seq[Long]): Sbf = {
      val f = Sbf.empty(2048, 0.001)
      ks.foreach(f.add)
      f
    }
    // left-fold shape
    val a = parts.map(build).reduceLeft((x, y) => x.mergeInPlace(y))
    // balanced-tree shape
    def treeMerge(fs: Vector[Sbf]): Sbf =
      if (fs.size == 1) fs.head
      else treeMerge(fs.grouped(2).map {
        case Vector(x, y) => x.mergeInPlace(y)
        case Vector(x) => x
      }.toVector)
    val b = treeMerge(parts.map(build))
    // the two trees hold the same stage MULTISET -> identical bytes
    assert(a.toBytes.toSeq === b.toBytes.toSeq)
    for (f <- Seq(a, b)) {
      assert(f.insertedCount === 30000L)
      keys.foreach(k => assert(f.checkHash(Hashing.hashLong(k)), s"k=$k"))
      // explicit compaction bounds the series (full stages cannot pack,
      // so the honest bound is stages-per-partial x partials) and keeps
      // every key
      f.compact()
      assert(f.stageCount <= 2 * parts.size)
      assert(f.insertedCount === 30000L)
      keys.foreach(k => assert(f.checkHash(Hashing.hashLong(k)), s"k=$k compacted"))
    }
    assert(a.toBytes.toSeq === b.toBytes.toSeq) // canonical after compact too
    // identity
    val c = build(keys.take(100))
    val before = c.toBytes.toSeq
    assert(c.mergeInPlace(Sbf.empty(2048, 0.001)).toBytes.toSeq === before)
    // incompatible params throw
    intercept[IllegalArgumentException](
      Sbf.empty(2048, 0.001).mergeInPlace(Sbf.empty(1024, 0.001)))
  }

  test("constructor validation mirrors the SBBF error conditions") {
    intercept[IllegalArgumentException](Sbf.empty(0, 0.01))
    intercept[IllegalArgumentException](Sbf.empty(100, 0.0))
    intercept[IllegalArgumentException](Sbf.empty(100, 1.0))
    intercept[IllegalArgumentException](Sbf.empty(100, 0.01, growth = 1))
    intercept[IllegalArgumentException](Sbf.empty(100, 0.01, tightening = 1.0))
  }
}
