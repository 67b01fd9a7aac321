package graft

import graft.core.{Hashing, Sbbf}

/** Single-core kernel microbenchmark — the BENCH/BASELINE.md §1 numbers
  * (same workload shape as the reference's single-threaded C bench:
  * long keys, capacity = n, 1% FPR, serializable-mode hashing).
  *
  * Run without a SparkSession (the MG path needs the spark-unsafe
  * classes for UTF8String, so glob the whole Spark jars directory onto
  * the classpath next to target/scala-2.13/classes):
  * {{{
  *   java -cp "/opt/spark/jars/STAR:target/scala-2.13/classes" graft.KernelBench [reps]
  * }}}
  * (STAR = the shell classpath wildcard; a literal one would close this
  * comment.)
  *
  * Prints one JSON line with M keys/s for add (per-key and batched
  * paths) and lookup at 1M and 10M keys — best of `reps` (single-core
  * kernel peak is the comparable number on a shared host; default 5).
  * Build paths are asserted byte-identical before timing.
  * [[graft.Bench]] embeds [[measure]]'s numbers in its recorded JSON so
  * there is exactly ONE definition of each kernel metric.
  */
object KernelBench {

  private[graft] def hashesFor(n: Int): Array[Long] = {
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = Hashing.hashLong(i.toLong); i += 1 }
    hs
  }

  private[graft] def bestOf(reps: Int)(f: => Unit): Double = {
    var best = Double.MaxValue
    var r = 0
    while (r < reps) {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) best = sec
      r += 1
    }
    best
  }

  /** Core measurement: (metric name -> M keys/s) at the given sizes.
    * `add` times the per-key [[Sbbf.insertHash]] loop (the headline
    * comparable to the reference C), `add_batched` the [[Sbbf.insertHashes]]
    * API, `lookup` the counted [[Sbbf.checkHash]] loop. The two build
    * paths are asserted byte-identical before any timing.
    */
  private[graft] def measure(
      reps: Int, sizes: Seq[Int] = Seq(1000000, 10000000)): Seq[(String, Double)] =
    sizes.flatMap { n =>
      val hs = hashesFor(n)

      // correctness gate: batched == per-key, byte for byte
      val a = Sbbf.empty(n, 0.01)
      var i = 0
      while (i < n) { a.insertHash(hs(i)); i += 1 }
      val b = Sbbf.empty(n, 0.01)
      b.insertHashes(hs, 0, n)
      require(java.util.Arrays.equals(a.toBytes, b.toBytes),
        s"batched insert diverged from per-key at n=$n")

      val addSec = bestOf(reps) {
        val f = Sbbf.empty(n, 0.01)
        var i = 0
        while (i < n) { f.insertHash(hs(i)); i += 1 }
      }
      val addBatchSec = bestOf(reps) {
        val f = Sbbf.empty(n, 0.01)
        f.insertHashes(hs, 0, n)
      }
      val lookupSec = bestOf(reps) {
        var hits = 0L
        var i = 0
        while (i < n) { if (a.checkHash(hs(i))) hits += 1; i += 1 }
        require(hits == n, "zero-FN violated in lookup bench")
      }
      val m = n / 1e6
      val tag = s"${n / 1000000}m"
      Seq(
        s"add_${tag}_mkeys_s" -> m / addSec,
        s"add_batched_${tag}_mkeys_s" -> m / addBatchSec,
        s"lookup_${tag}_mkeys_s" -> m / lookupSec)
    } ++ Seq(
      "mg_add_2m_mkeys_s" -> mgAddThroughput(reps),
      "kmv_add_10m_mkeys_s" -> kmvAddThroughput(reps),
      "ws_add_10m_mkeys_s" -> wsAddThroughput(reps),
      "window_hash_2m_mchars_s" -> windowHashThroughput(reps),
      "jpeg_encode_mpixels_s" -> jpegEncodeThroughput(reps),
      "jpeg_decode_mpixels_s" -> jpegDecodeThroughput(reps))

  /** Misra–Gries update throughput (M keys/s): 2M UTF8String keys over a
    * 10k-key zipf-ish stream into a k=256 summary — the UTF8String-native
    * hot path ([[graft.core.MisraGries.add]]), which hashes borrowed
    * bytes with no per-row String allocation.
    */
  private[graft] def mgAddThroughput(reps: Int): Double = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = 2000000
    val distinct = 10000
    val pool = Array.tabulate(distinct)(i => UTF8String.fromString(s"token_$i"))
    val keys = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // skewed stream: low ids repeat heavily (heavy-hitter workload shape)
      val u = Hashing.mix64(i.toLong) >>> 1
      keys(i) = pool(((u % distinct) * (u % 7 + 1) / 7 % distinct).toInt)
      i += 1
    }
    val sec = bestOf(reps) {
      val mg = graft.core.MisraGries.empty(256)
      var j = 0
      while (j < n) { mg.add(keys(j)); j += 1 }
    }
    n / 1e6 / sec
  }

  /** KMV update throughput (M keys/s): 10M hashed longs into a k=4096
    * sketch. Once saturated, almost every add is a single unsigned
    * compare against the retained maximum — the O(1) reject path that
    * makes bottom-k cheap at 10^12 keys.
    */
  private[graft] def kmvAddThroughput(reps: Int): Double = {
    val n = 10000000
    val hs = hashesFor(n)
    val sec = bestOf(reps) {
      val s = graft.core.Kmv.empty(4096)
      var j = 0
      while (j < n) { s.add(hs(j)); j += 1 }
      require(s.isSaturated, "sketch must saturate in the bench stream")
    }
    n / 1e6 / sec
  }

  /** Weighted-sample (A-RES) update throughput (M keys/s): 10M hashed
    * longs with cycling weights 1..8 into a k=4096 sketch. The
    * saturated path is the cached-cut fast reject (normalize + one
    * compare; see [[graft.core.WeightedSample]]) — the exact
    * StrictMath.pow runs only for gray-band candidates. Official
    * record: 35.8 M keys/s best-of (BENCH/BASELINE.md §8) vs a
    * 6-10 M keys/s pow-per-row baseline measured the same way.
    */
  private[graft] def wsAddThroughput(reps: Int): Double = {
    val n = 10000000
    val hs = hashesFor(n)
    val pay = Array[Byte]('w')
    val sec = bestOf(reps) {
      val s = graft.core.WeightedSample.empty(4096)
      var j = 0
      while (j < n) { s.add(hs(j), 1.0 + (j & 7), pay); j += 1 }
      require(s.isSaturated, "sketch must saturate in the bench stream")
    }
    n / 1e6 / sec
  }

  /** window_hashes kernel throughput (M chars/s) over 2M chars of
    * synthetic ASCII text at the default 40-char window — the dominant
    * scan term of exact duplicate-substring dedup.
    */
  private[graft] def windowHashThroughput(reps: Int): Double = {
    val n = 2000000
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val u = Hashing.mix64(i.toLong) >>> 1
      sb.append(if (u % 7 == 0) ' ' else ('a' + (u % 26)).toChar)
      i += 1
    }
    val text = sb.toString
    val sec = bestOf(reps) {
      val out = graft.ops.Dedup.windowHashKernel(text, 40)
      require(out.length == n - 39, "unexpected window count")
    }
    n / 1e6 / sec
  }

  /** Baseline-JPEG codec throughput (M pixels/s) on a 640x480 NON-FLAT
    * grayscale image (every block takes the full FDCT / Huffman / IDCT
    * path, no DC-only shortcut) — the per-image cost of the de-faked
    * multimodal content decode.
    */
  private val jpegBenchW = 640
  private val jpegBenchH = 480
  private def jpegBenchPixel(x: Int, y: Int): Int =
    (x * 31 + y * 17 + (x * y) % 7) % 256

  private[graft] def jpegEncodeThroughput(reps: Int): Double = {
    val px = jpegBenchW.toLong * jpegBenchH
    val sec = bestOf(reps) {
      val out = graft.ops.MediaCodecs.encodeJpegGray(
        jpegBenchW, jpegBenchH, jpegBenchPixel)
      require(out.length > 1000, "unexpected jpeg size")
    }
    px / 1e6 / sec
  }

  private[graft] def jpegDecodeThroughput(reps: Int): Double = {
    val bytes = graft.ops.MediaCodecs.encodeJpegGray(
      jpegBenchW, jpegBenchH, jpegBenchPixel)
    val px = jpegBenchW.toLong * jpegBenchH
    val sec = bestOf(reps) {
      val st = graft.ops.MediaCodecs.decodeJpegGray(bytes)
      require(st.exists(_.n == px), "jpeg decode failed")
    }
    px / 1e6 / sec
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val parts = measure(reps).map { case (k, v) => f""""$k":$v%.1f""" }
    println(parts.mkString("{", ",", s""","reps":$reps}"""))
  }
}
