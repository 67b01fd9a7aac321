package graft

import org.apache.spark.sql.SparkSession

/** Round-7 optimization-side measurement main (guide §1). The official
  * harness `graft.Bench` is frozen for measurement; this main exists so
  * the optimization work can
  *   - time any SUBSET of SparkEntry.queries (env SPARK_GRAFT_ONLY,
  *     comma-separated; empty = all) with the same methodology as the
  *     frozen bench (same session config, same `.count()` action, two
  *     passes, min reported),
  *   - run extra passes (SPARK_GRAFT_EXTRA_PASSES, default 2) for tighter
  *     before/after comparisons on this ~1.8x-variance host,
  *   - dump `.explain("formatted")` for each query's returned DataFrame to
  *     SPARK_GRAFT_PLAN_DIR/<query>.txt when that env var is set (the
  *     judge-facing plans/r07/ evidence files).
  *
  * Numbers printed here are cited in OPTIMIZATION_r07.md as the
  * builder-side evidence; the driver's own BENCH_r07.json remains the
  * official record.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_EXTRA_PASSES", "2").toInt
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",")
      .map(_.trim).filter(_.nonEmpty).toSet
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    val s = session(cpus)
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    try {
      for (pass <- 1 to passes) {
        names.foreach { name =>
          s.sparkContext.setJobDescription(s"bx:$name pass $pass")
          val (df, sec) = time(SparkEntry.queries(name)(s, sfDir).count())
          times(name) = times(name) :+ sec
        }
      }
      planDir.foreach { pd =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
        names.foreach { name =>
          val df = SparkEntry.queries(name)(s, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(pd, s"$name.txt"),
            plan.getBytes("UTF-8"))
        }
      }
    } finally s.stop()
    val items = names.map { n =>
      val xs = times(n)
      f""""$n":{"min":${xs.min}%.3f,"samples":[${xs.map(x => f"$x%.3f").mkString(",")}]}"""
    }
    println(s"""{"sf":"$sfDir","total_min":${
      "%.3f".format(names.map(n => times(n).min).sum)},"queries":{${items.mkString(",")}}}""")
  }
}
