package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.TextKernels
import org.apache.spark.unsafe.types.UTF8String

/** Randomized cross-checks of the round-5 text/substring kernels against
  * independent collection-idiom references — beyond the curated spec
  * cases, these sweep arbitrary unicode shapes (whitespace runs, astral
  * chars, bullets/ellipses, newline layouts).
  */
class TextKernelPropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(4242L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // text fragments that exercise every gopher rule and both BMP/astral
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "THE", "With", "wİth", "and", "tok", "x", "#", "...",
      "…", "-", "*", "•", "𝕏ab", "café", "12345", "a#b…c"),
    Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.oneOf(
      ('a' to 'e') ++ Seq(' ', '\t', '\n', '\f', '\r', '.', '#', '…')))))

  private val textGen: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString(""))
      .flatMap(s => Gen.oneOf(s, s + "\n", "\n" + s, s + "  \t"))

  /** Same independent reference as TextExpressionsSpec's curated test. */
  private def refGopher(t: String): Seq[Long] = {
    val ws = t.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty).toSeq
    val sumWordChars = ws.map(w => w.codePointCount(0, w.length).toLong).sum
    val nAlpha = ws.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val stops = TextKernels.GopherStopwords.toSet
    val fold = (w: String) =>
      w.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    val nStop = ws.map(fold).toSet.count(stops.contains).toLong
    val nHash = t.count(_ == '#').toLong
    var nEll = t.count(_ == '…').toLong
    var i = 0
    while (i <= t.length - 3) {
      if (t.charAt(i) == '.' && t.charAt(i + 1) == '.' && t.charAt(i + 2) == '.') {
        nEll += 1; i += 3
      } else i += 1
    }
    val lines = t.split("\n", -1).toSeq
    val strip = (s: String, end: Boolean) =>
      if (end) s.reverse.dropWhile(c => c == ' ' || c == '\t').reverse
      else s.dropWhile(c => c == ' ' || c == '\t')
    val nBullet = lines.count { l =>
      val s = strip(l, false); s.nonEmpty && "-*•".contains(s.head)
    }.toLong
    val nEllLines = lines.count { l =>
      val s = strip(l, true); s.endsWith("…") || s.endsWith("...")
    }.toLong
    val counts = lines.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nDup = counts.values.filter(_ > 1).sum
    val dupChars = counts.collect { case (l, c) if c > 1 =>
      c * l.codePointCount(0, l.length).toLong }.sum
    Seq(ws.size.toLong, sumWordChars, nAlpha, nStop, nHash, nEll,
      lines.size.toLong, nBullet, nEllLines, nDup, dupChars,
      lines.map(l => l.codePointCount(0, l.length).toLong).sum)
  }

  test("gopherSignals == reference on 200 random unicode texts") {
    forAllN(textGen) { t =>
      val row = TextKernels.gopherSignals(UTF8String.fromString(t))
      val actual = (0 until 12).map(row.getLong)
      assert(actual === refGopher(t), s"text=${t.replace("\n", "\\n")}")
    }
  }

  test("windowHashKernel positions hash exactly their code-point windows") {
    val tg = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "b", "ab", "𝕏", "é", " ", "xy"))).map(_.mkString(""))
    forAllN(tg) { t =>
      for (w <- Seq(2, 5)) {
        val hs = Dedup.windowHashKernel(t, w)
        val cps = t.codePoints.toArray
        assert(hs.length === math.max(0, cps.length - w + 1))
        hs.indices.foreach { p =>
          val sub = new String(cps, p, w)
          assert(hs(p) === graft.core.Hashing.hashBytes(
            sub.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }
    }
  }

  test("maskSpansKernel equals direct marking on random position sets") {
    val tg = Gen.choose(4, 40).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "b", "𝕏", "é"))).map(_.mkString(""))
    forAllN(tg) { t =>
      val cps = t.codePoints.toArray
      val w = 3
      if (cps.length >= w) {
        val maxP = cps.length - w
        val positions = (0 to maxP).filter(p =>
          graft.core.Hashing.mix64(p.toLong + cps.length) % 3 == 0).toArray
        val keep = Array.fill(cps.length)(true)
        positions.foreach(p => (p until p + w).foreach(keep(_) = false))
        val expected = {
          val sb = new java.lang.StringBuilder
          cps.indices.foreach(i => if (keep(i)) sb.appendCodePoint(cps(i)))
          sb.toString
        }
        assert(Dedup.maskSpansKernel(t, positions, w) === expected)
      }
    }
  }
}
