package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sbbf
import graft.functions._
import graft.job.BloomBuild

/** Benchmark main. Prints ONE JSON line (undecorated on stdout — build.sbt
  * sets `run / outputStrategy := StdoutOutput` so sbt does not prefix it):
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"failed":{...},
  *  "sf":...,"bloom_build":{...north-rule scaling results...}}
  *
  * Two parts:
  *  1. per-query timings of SparkEntry.queries on SPARK_GRAFT_SF_DIR
  *     (driver contract). Each query runs TWICE and the min is reported:
  *     this host has ~1.8x run-to-run CPU variance and the first pass
  *     carries codegen/session warmup, so pass-2 (warm) is the honest
  *     steady-state number; both pass totals are recorded. A query that
  *     throws is listed in "failed" with its error and contributes no
  *     timing (never a fake near-zero one).
  *  2. the BASELINE.json north-rule metric: Bloom build+merge keys/sec at
  *     multiple parallelism levels over the same input, with empirical FPR
  *     and scaling efficiency = throughput(4N) / (4 x throughput(N)) — the
  *     sandbox stand-in for N vs 4N executor clusters.
  *
  * Protocol notes (documented in BENCH/BASELINE.md):
  *  - build strategy = per-executor shared filter with atomic bit-OR
  *    (the reference's free-threading mode, graft.job.BloomBuild.concurrent);
  *    merge fan-in is O(executors), zero in single-JVM local mode.
  *  - runs are interleaved across core counts and the MEDIAN of `reps`
  *    per level is taken (round 1 used best-of-2, which let one
  *    catastrophically slow c2 run produce a >1 efficiency — medians of
  *    interleaved sweeps are the noise-robust estimator on this shared
  *    host).
  *  - spark.local.dir points at /dev/shm (126 GB tmpfs) so shuffle/spill
  *    never touches the 434 MB/s disk.
  *  - both (2 -> 8) and (8 -> 32) pairs are reported. Insert is
  *    DRAM-latency-bound at high core counts on a single box (one memory
  *    system — unlike a real 4N-node cluster, which adds DRAM with nodes);
  *    a pure-CPU scaling probe is included so the efficiency numbers can
  *    be read against what the hardware itself allows.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** One timed build at `cores`: global SBBF over `n` long keys through
    * the full Spark path (codegen'd key hash -> shared-filter atomic
    * insert). Returns seconds.
    */
  private def buildOnce(cores: Int, n: Long): Double = {
    val s = session(cores)
    try {
      val keys = s.range(0L, n, 1L, cores * 2).select(col("id").as("k"))
      val (_, sec) = time(BloomBuild.concurrent(keys, col("k"), n, 0.01))
      sec
    } finally s.stop()
  }

  /** Pure-CPU scaling probe (no sketch, no memory pressure): bounds what
    * this host can show for ANY embarrassingly parallel job. Levels are
    * INTERLEAVED across reps like the build sweeps — back-to-back level
    * blocks would expose the ceiling estimate to the same host-drift
    * artifact the build protocol was fixed for.
    */
  private def cpuProbeInterleaved(levels: Seq[Int], reps: Int): Map[Int, Double] = {
    val n = 30000000L
    val samples = scala.collection.mutable.Map[Int, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      levels.foreach { c =>
        val s = session(c)
        try {
          val (_, sec) = time {
            s.range(0L, n, 1L, c)
              .select(sha2(col("id").cast("string"), 256).as("h"))
              .select(length(col("h")).as("l")).agg(max("l")).head()
          }
          samples(c) = samples(c) :+ sec
        } finally s.stop()
      }
    }
    levels.map(c => c -> n / median(samples(c))).toMap
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_KEYS", "50000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

    // -------- part 1: harness queries at local[cpus], two passes, min
    val s = session(cpus)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[String, Double]()
    val failed = scala.collection.mutable.Map[String, String]()
    val passTotals = scala.collection.mutable.ArrayBuffer[Double]()
    try {
      for (pass <- 1 to 2) {
        var passTotal = 0.0
        names.foreach { name =>
          if (!failed.contains(name)) {
            try {
              val (_, sec) = time(SparkEntry.queries(name)(s, sfDir).count())
              passTotal += sec
              if (!times.contains(name) || sec < times(name)) times(name) = sec
            } catch {
              case e: Throwable =>
                failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                  .linesIterator.take(1).mkString
                times.remove(name)
            }
          }
        }
        passTotals += passTotal
      }
    } finally s.stop()

    // -------- part 1b: grouped sketch aggregation at HIGH cardinality —
    // the regime SketchAggExec exists for (200k groups, far past
    // ObjectHashAggregate's 128-group sort fallback). A/B vs the builtin
    // operator on the same data, interleaved, min of `reps`; also records
    // the partial-map flush count (the bounded-memory evidence).
    val sketchAggJson = {
      val s3 = session(cpus)
      graft.sql.Registry.register(s3)
      try {
        val rows = 8000000L
        val nGroups = 200000
        def aggDf() = s3.range(0L, rows, 1L, cpus)
          .select((col("id") % nGroups).as("g"), col("id").as("k"))
          .groupBy(col("g"))
          .agg(bloom_agg(col("k"), 64, 0.01).as("f"))
        var flushes = 0L
        def runOnce(custom: Boolean, flushThreshold: Option[Int]): Double = {
          s3.conf.set("spark.graft.sketchAgg.enabled", custom.toString)
          flushThreshold match {
            case Some(t) => s3.conf.set("spark.graft.sketchAgg.flushThreshold", t.toString)
            case None => s3.conf.unset("spark.graft.sketchAgg.flushThreshold")
          }
          val df = aggDf()
          // execute the aggregate's OWN query execution (df.count() plans
          // a separate execution whose metrics are not df's — and lets
          // Catalyst prune the sketch column away entirely)
          val (cnt, sec) = time(df.queryExecution.toRdd.count())
          require(cnt == nGroups, s"grouped agg returned $cnt groups")
          if (custom && flushThreshold.isDefined) {
            def find(p: org.apache.spark.sql.execution.SparkPlan):
                Option[graft.plans.SketchPartialAggExec] = p match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                find(a.executedPlan)
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
              case x: graft.plans.SketchPartialAggExec => Some(x)
              case other => other.children.view.flatMap(find).headOption
            }
            find(df.queryExecution.executedPlan)
              .foreach(p => flushes = p.metrics("numFlushes").value)
          }
          sec
        }
        // three variants, interleaved, min of >= 2: custom under the
        // default conf (byte budget governs — the whole 200k-group map
        // fits, no flush), custom FORCED to flush (65536-group rail — the
        // bounded-memory mode, fragmenting partials on purpose), builtin
        // ObjectHashAggregate (sort-based fallback past 128 groups)
        runOnce(custom = true, None); runOnce(custom = false, None) // warm
        var cDefault = Vector.empty[Double]
        var cFlush = Vector.empty[Double]
        var bSecs = Vector.empty[Double]
        (1 to math.max(2, reps - 1)).foreach { _ =>
          cDefault :+= runOnce(custom = true, None)
          cFlush :+= runOnce(custom = true, Some(1 << 16))
          bSecs :+= runOnce(custom = false, None)
        }
        s3.conf.unset("spark.graft.sketchAgg.flushThreshold")
        s"""{"rows":$rows,"groups":$nGroups,"custom_sec":${"%.3f".format(cDefault.min)},""" +
          s""""custom_flush_mode_sec":${"%.3f".format(cFlush.min)},""" +
          s""""builtin_sec":${"%.3f".format(bSecs.min)},""" +
          s""""flush_mode_partial_flushes":$flushes,"flush_mode_threshold":${1 << 16}}"""
      } finally s3.stop()
    }

    // -------- part 1c: grouped HLL at high cardinality — the SPARSE
    // buffer payoff: per-group agg-buffer and partial-shuffle bytes
    // proportional to the keys each group actually saw, not 2^p. Records
    // wall time plus MEASURED partial-shuffle write bytes vs the
    // dense-equivalent arithmetic (groups x (6 + 2^p) wire bytes).
    val hllHighcardJson = {
      val s3 = session(cpus)
      graft.sql.Registry.register(s3)
      try {
        val rows = 8000000L
        val nGroups = 200000
        val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (e.taskMetrics != null)
              shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        def df() = s3.range(0L, rows, 1L, cpus)
          .select((col("id") % nGroups).as("g"), col("id").as("k"))
          .groupBy(col("g"))
          .agg(hll_agg(col("k")).as("h"))
        def run(): Double = {
          val (cnt, sec) = time(df().queryExecution.toRdd.count())
          require(cnt == nGroups, s"grouped hll returned $cnt groups")
          sec
        }
        run() // warm
        s3.sparkContext.addSparkListener(listener)
        val first = run()
        org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(s3)
        s3.sparkContext.removeSparkListener(listener)
        val measuredMb = shuffleBytes.get / 1e6
        val secs = first +: (2 to math.max(2, reps)).map(_ => run())
        val denseEquivMb = nGroups.toLong * (6L + (1L << graft.core.Hll.DefaultP)) / 1e6
        s"""{"rows":$rows,"groups":$nGroups,"sec":${"%.3f".format(secs.min)},""" +
          s""""partial_shuffle_mb":${"%.1f".format(measuredMb)},""" +
          s""""dense_equiv_partial_mb":${"%.1f".format(denseEquivMb)}}"""
      } finally s3.stop()
    }

    // -------- part 2: north-rule scaling protocol (interleaved medians)
    val levels = (Seq(2, 8, 32).filter(_ <= cpus) :+ cpus).distinct.sorted

    // prebuild the probe filter once; probe passes are INTERLEAVED with
    // the build sweeps below so the probe median samples the same
    // minutes-long window as the build medians (round-2 recorded probe
    // numbers landed 2-of-5 runs inside a noisy-neighbor burst because
    // all probe reps ran back to back in one ~10 s window)
    val (probeFilterBytes, fpr, fnOk) = {
      val s2 = session(cpus)
      try {
        val keys = s2.range(0L, n, 1L, cpus * 2).select(col("id").as("k"))
        val f = BloomBuild.concurrent(keys, col("k"), n, 0.01)
        // broadcast probe: a capacity-n filter is tens of MB — shipping it
        // as a literal costs per-task deserialization (measured 14-30x
        // slower); the broadcast variant ships once per executor
        val bc = s2.sparkContext.broadcast(f.toBytes)
        val probes = 500000L
        val fp = s2.range(n, n + probes).select(col("id").as("k"))
          .filter(bloom_contains(bc, col("k"))).count()
        val fn = s2.range(0L, probes).select(col("id").as("k"))
          .filter(!bloom_contains(bc, col("k"))).count()
        (f.toBytes, fp.toDouble / probes, fn == 0L)
      } finally s2.stop()
    }

    /** One timed probe pass over all n member keys (all-8-word worst
      * case) at full parallelism, fresh session like buildOnce.
      */
    def probeOnce(): Double = {
      val s = session(cpus)
      try {
        val bc = s.sparkContext.broadcast(probeFilterBytes)
        val (cnt, sec) = time {
          s.range(0L, n, 1L, cpus * 2).select(col("id").as("k"))
            .filter(bloom_contains(bc, col("k"))).count()
        }
        require(cnt == n, "zero-FN violated in probe pass")
        sec
      } finally s.stop()
    }

    // CONTENTION-AWARE sweep: each attempt = interleaved build sweeps +
    // probe passes + the pure-CPU ceiling probe, all inside ONE window so
    // the ceiling reading diagnoses the same minutes the build medians
    // sampled. If the ceiling reads pathological (< 0.3 — even sha256
    // would not scale; BENCH_r04 recorded a 0.033 window that halved the
    // c32 build number), the whole sweep re-runs, bounded. The REPORTED
    // numbers come from the attempt with the healthiest ceiling; every
    // attempt's reading is recorded so the artifact shows its own
    // retries instead of silently laundering a bad window.
    final case class Sweep(
        tp: Map[Int, Double], probeTp: Double, cpuEff: Double)
    val probesPerSweep = math.max(1, (5 + reps - 1) / reps)
    def runSweep(): Sweep = {
      val samples = scala.collection.mutable.Map[Int, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      var probeSamples = Vector.empty[Double]
      (1 to reps).foreach { _ =>
        levels.foreach { c => samples(c) = samples(c) :+ buildOnce(c, n) }
        (1 to probesPerSweep).foreach(_ => probeSamples = probeSamples :+ probeOnce())
      }
      // hardware scaling ceiling (pure CPU), interleaved medians, read
      // INSIDE the attempt window
      val cpuTp = cpuProbeInterleaved(Seq(8, 32), reps)
      Sweep(
        levels.map(c => c -> n / median(samples(c))).toMap,
        n / median(probeSamples),
        cpuTp(32) / (4.0 * cpuTp(8)))
    }
    // one warmup sweep (JIT) before the first attempt only
    levels.foreach(c => buildOnce(c, math.min(n, 20000000L)))
    probeOnce() // warm the probe codegen path too
    val maxAttempts =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_SWEEP_RETRIES", "3").toInt)
    // plausibility BAND, not a one-sided floor: a healthy interleaved
    // 8->32 pure-CPU reading sits in ~[0.3, 1.2]. Below = the 32-core
    // window stalled under contention; above = the 8-CORE probe itself
    // stalled (a >1 reading is physically impossible for a 4x core
    // scale-up — BENCH_r05 recorded 5.977, which passed the old `< 0.3`
    // gate and then WON the maxBy, laundering an anomalous build sweep).
    // Retry while the reading is outside the band; report the attempt
    // CLOSEST to plausible (ties inside the band -> healthiest reading).
    val bandLo = 0.3
    val bandHi = 1.2
    def bandDistance(e: Double): Double =
      if (e < bandLo) bandLo - e else if (e > bandHi) e - bandHi else 0.0
    var attempts = Vector.empty[Sweep]
    while (attempts.isEmpty ||
        (bandDistance(attempts.last.cpuEff) > 0.0 && attempts.size < maxAttempts)) {
      attempts :+= runSweep()
    }
    val best = attempts.minBy(a => (bandDistance(a.cpuEff), -a.cpuEff))
    val tp = best.tp
    val probeTp = best.probeTp
    val cpuEff = best.cpuEff

    def eff(lo: Int, hi: Int): Double =
      if (tp.contains(lo) && tp.contains(hi)) tp(hi) / ((hi.toDouble / lo) * tp(lo)) else -1

    // single-core kernel numbers (BASELINE §1 comparison), best-of-3 —
    // cheap (~10 s), makes the recorded JSON self-contained, and is the
    // SAME measurement KernelBench prints (one definition per metric)
    val kernel = KernelBench.measure(3)
      .map { case (k, v) => f""""single_core_$k":$v%.1f""" }
      .mkString("{", ",", "}")

    val qs = names.filter(times.contains)
      .map(k => "\"" + k + "\":" + times(k)).mkString("{", ",", "}")
    val fails = failed.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + jsonEscape(v) + "\"" }
      .mkString("{", ",", "}")
    val total = times.values.sum
    val tpJson = levels.map(c => s""""c$c":${tp(c).toLong}""").mkString("{", ",", "}")
    val bloom =
      s"""{"keys":$n,"reps":$reps,"estimator":"median of interleaved sweeps",""" +
        s""""strategy":"shared-filter atomic OR (free-threading mode), merge fan-in O(executors)",""" +
        s""""keys_per_sec":$tpJson,""" +
        s""""scaling_efficiency_2_to_8":${"%.3f".format(eff(2, 8))},""" +
        s""""scaling_efficiency_8_to_32":${"%.3f".format(eff(8, 32))},""" +
        s""""cpu_probe_efficiency_8_to_32":${"%.3f".format(cpuEff)},""" +
        s""""sweep_attempts":${attempts.size},""" +
        s""""cpu_probe_attempt_readings":${
          attempts.map(a => "%.3f".format(a.cpuEff)).mkString("[", ",", "]")},""" +
        s""""probe_keys_per_sec":${probeTp.toLong},""" +
        s""""kernel":$kernel,""" +
        s""""empirical_fpr":$fpr,"fpr_target":0.01,"fpr_bound_ok":${fpr <= 0.0105},"zero_fn":$fnOk}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fails,""" +
        s""""query_passes":${passTotals.map(t => "%.3f".format(t)).mkString("[", ",", "]")},""" +
        s""""sf":"$sfDir","sketch_agg_highcard":$sketchAggJson,""" +
        s""""hll_highcard_sparse":$hllHighcardJson,"bloom_build":$bloom}""")
  }
}
