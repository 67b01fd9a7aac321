package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The harness rank checks must run ONE conditional-aggregation pass per
  * table, not one rescan per quantile (the "hardcoded shape saturates at
  * bigger sf" class — at sf10 a per-quantile rescan is 9 extra full
  * table scans).
  */
class HarnessJobCountSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def jobCount(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark)
    } finally spark.sparkContext.removeSparkListener(listener)
    jobs.get()
  }

  test("tdigest_quantiles and kll_rank_error run fused rank checks (bounded jobs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jobcount").toString
    (1 to 2000).map(i => i.toDouble * 3.7).toDF("l_extendedprice")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    ((1 to 2000).map(i => i.toDouble) ++ Seq(Double.NaN, Double.NaN)).toDF("value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    // warm the readers/codegen so the measured run is steady-state
    SparkEntry.queries("tdigest_quantiles")(spark, dir).collect()
    SparkEntry.queries("kll_rank_error")(spark, dir).collect()

    val td = jobCount {
      val rows = SparkEntry.queries("tdigest_quantiles")(spark, dir).collect()
      assert(rows.length == 3 && rows.forall(_.getBoolean(1)))
    }
    // sketch build + estimate extraction + ONE fused rank aggregation
    // (each an AQE query of 1-3 jobs incl. file listing); the old
    // per-quantile shape added a scan per quantile => well above this
    assert(td <= 9, s"tdigest_quantiles ran $td jobs — rank checks must be fused")

    val kll = jobCount {
      val rows = SparkEntry.queries("kll_rank_error")(spark, dir).collect()
      assert(rows.length == 9 && rows.forall(_.getBoolean(1)))
    }
    assert(kll <= 9, s"kll_rank_error ran $kll jobs — rank checks must be fused")
    // the load-bearing invariant: job count is FLAT in the number of
    // quantiles — 9 deciles must cost (about) the same as 3 quantiles;
    // the old per-quantile shape would put kll ~12 jobs above td
    assert(kll <= td + 2,
      s"kll_rank_error ($kll jobs, 9 quantiles) must not scale past " +
        s"tdigest_quantiles ($td jobs, 3 quantiles)")
  }
}
