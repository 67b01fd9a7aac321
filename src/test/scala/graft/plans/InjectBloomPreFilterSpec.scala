package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.expr.BloomMightContain

/** The automatic ABLM bloom join pre-filter rule: injection conditions,
  * join-type safety matrix, and end-to-end result equivalence.
  */
class InjectBloomPreFilterSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("injects a bloom pre-filter on the large side of a plain equi-join") {
    withConf(
      "spark.graft.runtimeFilter.applicationSideMinSize" -> "10000",
      "spark.graft.runtimeFilter.capacity" -> "10000") {
      val large = spark.range(0, 50000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val small = spark.range(0, 50000, 250).select(col("id").as("j"))
      val joined = large.join(small, col("k") === col("j"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_contains"), opt)
      // subquery aggregate builds the ABLM filter over the small side
      assert(opt.contains("bloom_agg"), opt)
      // exact join semantics preserved through execution
      assert(joined.count() === 200)
    }
  }

  test("no injection when disabled or below the size gates") {
    val large = spark.range(0, 10000).toDF("k")
    val small = spark.range(0, 10).toDF("j")
    withConf(
      "spark.graft.runtimeFilter.enabled" -> "false",
      "spark.graft.runtimeFilter.applicationSideMinSize" -> "0") {
      val opt = large.join(small, col("k") === col("j"))
        .queryExecution.optimizedPlan.toString
      assert(!opt.contains("bloom_contains"))
    }
    // default thresholds: tiny tables never qualify (filtering a small
    // scan is pure overhead)
    val opt2 = large.join(small, col("k") === col("j"))
      .queryExecution.optimizedPlan.toString
    assert(!opt2.contains("bloom_contains"))
  }

  test("join-type safety matrix: full outer never, left outer only right side") {
    val left = spark.range(0, 5000).toDF("k")
    val right = spark.range(0, 2000).toDF("j")
    withConf("spark.graft.runtimeFilter.applicationSideMinSize" -> "0") {
      val fo = left.join(right, col("k") === col("j"), "full_outer")
        .queryExecution.optimizedPlan.toString
      assert(!fo.contains("bloom_contains"), "full outer must not be pruned")

      val lo = left.join(right, col("k") === col("j"), "left_outer")
      val opt = lo.queryExecution.optimizedPlan
      val bloomFilters = opt.collect {
        case f: Filter if f.condition.exists(_.isInstanceOf[BloomMightContain]) => f
      }
      assert(bloomFilters.size === 1, s"exactly the right side pruned:\n$opt")
      val j = opt.collectFirst { case jn: Join => jn }.get
      assert(!j.left.exists {
        case f: Filter => f.condition.exists(_.isInstanceOf[BloomMightContain])
        case _ => false
      }, "left outer must keep unmatched left rows -> left side unpruned")
      // all 5000 left rows survive
      assert(lo.count() === 5000)
    }
  }

  test("rule is idempotent under the fixpoint batch (exactly one filter per side)") {
    withConf("spark.graft.runtimeFilter.applicationSideMinSize" -> "0") {
      val large = spark.range(0, 30000).toDF("k")
      val small = spark.range(0, 100).toDF("j")
      val opt = large.join(small, col("k") === col("j"), "left_semi")
        .queryExecution.optimizedPlan
      val n = opt.collect {
        case f: Filter if f.condition.exists(_.isInstanceOf[BloomMightContain]) => f
      }.size
      assert(n <= 2, s"one bloom filter per prunable side at most:\n$opt")
      assert(n >= 1)
    }
  }

  test("injected plan returns the identical result as the plain join") {
    val large = (0L until 20000L).map(i => (i % 997, i)).toDF("k", "v")
    val small = (0L until 30L).map(i => i * 13).toDF("j")
    val expected = withConf("spark.graft.runtimeFilter.enabled" -> "false") {
      large.join(small, col("k") === col("j")).collect().map(_.toSeq).toSet
    }
    val actual = withConf(
      "spark.graft.runtimeFilter.applicationSideMinSize" -> "1000",
      "spark.graft.runtimeFilter.capacity" -> "1000") {
      val df = large.join(small, col("k") === col("j"))
      assert(df.queryExecution.optimizedPlan.toString.contains("bloom_contains"))
      df.collect().map(_.toSeq).toSet
    }
    assert(actual === expected)
    assert(actual.nonEmpty)
  }
}
