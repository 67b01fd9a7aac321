package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Bit-compatibility against golden filters produced by the reference C
  * extension (scripts/gen_golden.py), plus the wire-format corruption
  * matrix from reference tests/test_serialization.py:181-331.
  */
class SbbfSpec extends AnyFunSuite {

  private def goldenLines(name: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource $name")
    try Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(l => l.startsWith("#") || l.isEmpty).map(_.split("\t")).toList
    finally in.close()
  }

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // ------------------------------------------------------------------ sizing

  test("block count matches reference across (capacity, fp_rate) grid") {
    for (row <- goldenLines("sizing_kat.txt")) {
      val cap = row(0).toLong
      val fp = java.lang.Double.longBitsToDouble(row(1).toLong)
      assert(Sbbf.blockCountFor(cap, fp) === row(2).toLong, s"cap=$cap fp=$fp")
    }
  }

  test("overflow capacities raise like the reference") {
    // tests/test_initialization.py:222-252
    intercept[IllegalArgumentException](Sbbf.blockCountFor(1L << 62, 0.01))
    intercept[IllegalArgumentException](Sbbf.blockCountFor(1L << 60, 1e-6))
  }

  test("constructor validation matches reference") {
    intercept[IllegalArgumentException](Sbbf.empty(0, 0.01))
    intercept[IllegalArgumentException](Sbbf.empty(-5, 0.01))
    intercept[IllegalArgumentException](Sbbf.empty(100, 0.0))
    intercept[IllegalArgumentException](Sbbf.empty(100, 1.0))
    intercept[IllegalArgumentException](Sbbf.empty(100, -0.1))
    intercept[IllegalArgumentException](Sbbf.empty(100, 1.5))
  }

  test("properties: k=8, byte alignment, >=8 bits/key") {
    val f = Sbbf.empty(1000, 0.01)
    assert(f.k === 8)
    assert(f.byteCount % 64 === 0)
    assert(f.bitCount >= 8 * 1000)
  }

  // ------------------------------------------------ golden filter bit-compat

  /** Key sets replicated 1:1 from scripts/gen_golden.py::gen_filters. */
  private def buildCase(name: String, cap: Long, fp: Double): Sbbf = {
    val f = Sbbf.empty(cap, fp)
    name match {
      case "bytes_small" =>
        Seq[Array[Byte]]("hello".getBytes, "world".getBytes, Array.emptyByteArray,
          Array[Byte](0, 1, 2), Array.fill[Byte](100)('a')).foreach(f.add)
      case "strings" =>
        (0 until 500).foreach(i => f.add(s"key$i"))
      case "unicode" =>
        Seq("héllo wörld", "日本語テキスト",
          "emoji 😀", "", "\u0000nul").foreach(f.add)
      case "ints" =>
        (-250L until 250L).foreach(f.add)
        Seq(Long.MaxValue, Long.MinValue, (1L << 61) - 2, -1L).foreach(f.add)
      case "floats" =>
        Seq(0.0, -0.0, 42.0, 3.14159, -2.71828, 1e100, 1e-100,
          Double.PositiveInfinity, Double.NegativeInfinity,
          java.lang.Double.MIN_VALUE, 0.1, 0.2, 0.3).foreach(f.add)
      case "mixed" =>
        f.add("bin".getBytes); f.add("str"); f.add(7L); f.add(-7L)
        f.add(7.5); f.add(42L); f.add(42.0); f.add("sha-like-" + "ab" * 20)
      case "single" => f.add("only")
      case "repo_paths" =>
        (0 until 300).foreach(i => f.add(s"org${i % 7}/repo${i % 13}"))
        (0 until 300).foreach(i => f.add(s"src/pkg${i % 5}/File$i.scala"))
    }
    f
  }

  test("golden filters byte-identical to reference (all key types)") {
    for (row <- goldenLines("filter_kat.txt")) {
      val (name, cap, fp, expectedHex) =
        (row(0), row(1).toLong, row(2).toDouble, row(3))
      val f = buildCase(name, cap, fp)
      assert(hex(f.toBytes) === expectedHex, s"case=$name")
      // and keys must all probe positive (zero false negatives)
      val back = Sbbf.fromBytes(unhex(expectedHex))
      assert(back === f)
    }
  }

  test("golden union byte-identical to reference (a|b)") {
    val rows = goldenLines("union_kat.txt").map(r => r(0) -> unhex(r(1))).toMap
    val a = Sbbf.fromBytes(rows("a"))
    val b = Sbbf.fromBytes(rows("b"))
    assert(hex(a.or(b).toBytes) === hex(rows("a_or_b")))
    assert(hex(b.or(a).toBytes) === hex(rows("a_or_b")))
  }

  // ------------------------------------------------------------ round trips

  test("to_bytes/from_bytes round-trips byte-identically") {
    val f = Sbbf.empty(1000, 0.01)
    (0 until 800).foreach(i => f.add(s"item$i"))
    val bytes = f.toBytes
    val f2 = Sbbf.fromBytes(bytes)
    assert(java.util.Arrays.equals(f2.toBytes, bytes))
    assert(f2 === f)
    (0 until 800).foreach(i => assert(f2.contains(s"item$i")))
  }

  test("fp_rate round-trips as raw IEEE-754 bits") {
    val fp = 0.1 + 0.2 - 0.25 // a value with messy binary representation
    val f = Sbbf.empty(100, fp)
    val f2 = Sbbf.fromBytes(f.toBytes)
    assert(java.lang.Double.doubleToRawLongBits(f2.fpRate) ===
      java.lang.Double.doubleToRawLongBits(fp))
  }

  // ------------------------------------------- corruption matrix (7 checks)

  private def validBytes: Array[Byte] = {
    val f = Sbbf.empty(100, 0.01)
    f.add("x")
    f.toBytes
  }

  private def expectFormatError(data: Array[Byte], msgPart: String): Unit = {
    val e = intercept[SbbfFormatException](Sbbf.fromBytes(data))
    assert(e.getMessage.contains(msgPart), s"got: ${e.getMessage}")
  }

  test("from_bytes rejects too-short data") {
    expectFormatError(validBytes.take(29), "too short")
    expectFormatError(Array.emptyByteArray, "too short")
  }

  test("from_bytes rejects wrong magic") {
    val d = validBytes; d(0) = 'X'
    expectFormatError(d, "wrong magic")
  }

  test("from_bytes rejects bad version") {
    val d = validBytes; d(4) = 1
    expectFormatError(d, "Unsupported version: 1")
    val d3 = validBytes; d3(4) = 3
    expectFormatError(d3, "Unsupported version: 3")
  }

  test("from_bytes rejects truncated and trailing bytes") {
    expectFormatError(validBytes.dropRight(1), "expected")
    expectFormatError(validBytes ++ Array[Byte](0), "expected")
  }

  test("from_bytes rejects capacity=0") {
    val d = validBytes
    for (i <- 5 until 13) d(i) = 0
    expectFormatError(d, "capacity is 0")
  }

  test("from_bytes rejects fp_rate out of range") {
    for (bad <- Seq(0.0, 1.0, -0.01, 1.5)) {
      val d = validBytes
      Sbbf.writeBE64(d, 13, java.lang.Double.doubleToRawLongBits(bad))
      expectFormatError(d, "fp_rate out of range")
    }
  }

  test("from_bytes rejects inconsistent block_count") {
    val f = Sbbf.empty(100, 0.01)
    val good = f.toBytes
    val blocks = f.blockCount
    for (bad <- Seq(blocks + 1, blocks - 1, 0L)) {
      // resize payload to match the lied block_count so the length check
      // passes and the consistency check is what fires (ref test :214-244)
      val d = new Array[Byte](Sbbf.HeaderSize + (bad * 64).toInt)
      System.arraycopy(good, 0, d, 0, math.min(good.length, d.length))
      Sbbf.writeBE64(d, 21, bad)
      expectFormatError(d, "block_count doesn't match")
    }
  }

  // -------------------------------------------------------------- semantics

  test("no false negatives at and over capacity") {
    val f = Sbbf.empty(100, 0.01)
    val keys = (0 until 500).map(i => s"over$i") // 5x over capacity
    keys.foreach(f.add)
    keys.foreach(k => assert(f.contains(k), k))
  }

  test("empirical FPR <= 1.05 x target (100k keys @ 1%)") {
    val cap = 100000
    val f = Sbbf.empty(cap, 0.01)
    var i = 0
    while (i < cap) { f.add(i.toLong); i += 1 }
    var fp = 0
    val probes = 500000
    var j = 0
    while (j < probes) { if (f.checkHash(Hashing.hashLong(cap + j.toLong))) fp += 1; j += 1 }
    val rate = fp.toDouble / probes
    assert(rate <= 0.01 * 1.05, s"fpr=$rate")
    // zero false negatives
    i = 0
    while (i < cap) { assert(f.contains(i.toLong)); i += 1 }
  }

  test("empirical FPR <= 1.05 x target (1M keys @ 0.1%) — reference grid") {
    // tests/test_fpr.py grid: (100k, 1M) x (1%, 0.1%); the 1M x 0.1% cell
    val cap = 1000000
    val f = Sbbf.empty(cap, 0.001)
    var i = 0
    while (i < cap) { f.insertHash(Hashing.hashLong(i.toLong)); i += 1 }
    var fp = 0
    val probes = 500000
    var j = 0
    while (j < probes) { if (f.checkHash(Hashing.hashLong(cap + j.toLong))) fp += 1; j += 1 }
    assert(fp.toDouble / probes <= 0.001 * 1.05, s"fpr=${fp.toDouble / probes}")
  }

  test("linear-counting cardinality estimate within ~2% at and under load") {
    // m=64 per word is small, so the estimator carries a known upward
    // convexity bias of ~1%; 2.5% is the honest test bound
    for ((n, cap) <- Seq((5000, 100000L), (60000, 100000L), (100000, 100000L))) {
      val f = Sbbf.empty(cap, 0.01)
      (0 until n).foreach(i => f.add(Hashing.mix64(i.toLong).toString))
      val est = f.estimateCardinality
      assert(math.abs(est - n) <= 0.025 * n + 5, s"n=$n est=$est")
    }
    assert(Sbbf.empty(1000, 0.01).estimateCardinality === 0.0)
    // duplicates count once — it estimates DISTINCT keys
    val f = Sbbf.empty(10000, 0.01)
    (0 until 30000).foreach(i => f.add((i % 3000).toLong))
    assert(math.abs(f.estimateCardinality - 3000) <= 0.025 * 3000 + 5)
  }

  test("intersect estimate: overlap via inclusion-exclusion, disjoint near 0") {
    val cap = 100000L
    def build(range: Range): Sbbf = {
      val f = Sbbf.empty(cap, 0.01)
      range.foreach(i => f.add(Hashing.mix64(i.toLong).toString))
      f
    }
    val a = build(0 until 60000)
    val b = build(30000 until 90000)
    val est = a.intersectEstimate(b)
    assert(math.abs(est - 30000) <= 0.02 * 120000, s"est=$est (true 30000)")
    val disjoint = build(200000 until 205000)
    assert(a.intersectEstimate(disjoint) <= 0.01 * 65000, "disjoint sets must estimate near 0")
    // symmetric
    assert(math.abs(a.intersectEstimate(b) - b.intersectEstimate(a)) < 1e-9)
    // incompatible params throw
    intercept[IllegalArgumentException](a.intersectEstimate(Sbbf.empty(5000, 0.01)))
  }

  test("incompatible filters cannot merge") {
    val a = Sbbf.empty(100, 0.01)
    intercept[IllegalArgumentException](a.or(Sbbf.empty(200, 0.01)))
    intercept[IllegalArgumentException](a.or(Sbbf.empty(100, 0.02)))
  }

  test("copy is independent; clear preserves params") {
    val a = Sbbf.empty(100, 0.01)
    a.add("x")
    val b = a.copy()
    b.add("this-key-only-in-b")
    assert(b.contains("x") && b.contains("this-key-only-in-b"))
    assert(a !== b) // mutation of the copy did not leak back
    a.clear()
    assert(a.isEmpty && a.capacity === 100)
  }
}
