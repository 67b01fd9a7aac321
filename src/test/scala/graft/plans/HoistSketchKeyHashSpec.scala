package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.expr.AbloomKeyHash
import graft.functions._

class HoistSketchKeyHashSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def hashInsideAgg(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    plan.collectFirst {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
        case _: AbloomKeyHash => true
        case _ => false
      }) => a
    }.nonEmpty

  private def hashInProjectBelowAgg(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    plan.collectFirst {
      case Aggregate(_, _, p: Project, _) if p.projectList.exists(_.exists {
        case _: AbloomKeyHash => true
        case _ => false
      }) => p
    }.nonEmpty

  test("bloom_agg key hash is hoisted into a projection below the aggregate") {
    val df = (0 until 1000).map(i => s"key$i").toDF("k")
      .agg(bloom_agg(col("k"), 1000, 0.01))
    val opt = df.queryExecution.optimizedPlan
    assert(!hashInsideAgg(opt), s"hash must leave the agg function:\n$opt")
    assert(hashInProjectBelowAgg(opt), s"hash must sit in the project:\n$opt")
    // and the result is unchanged: byte-identical to the manual hashed path
    val auto = df.head.getAs[Array[Byte]](0)
    val manual = (0 until 1000).map(i => s"key$i").toDF("k")
      .select(abloom_key_hash(col("k")).as("h"))
      .agg(bloom_agg_hashed(col("h"), 1000, 0.01)).head.getAs[Array[Byte]](0)
    assert(auto.toSeq === manual.toSeq)
  }

  test("grouped and multi-sketch aggregates hoist each distinct key once") {
    val df = (0 until 1000).map(i => (s"key$i", i % 3)).toDF("k", "g")
      .groupBy(col("g"))
      .agg(
        bloom_agg(col("k"), 500, 0.01).as("bf"),
        hll_agg(col("k")).as("hll"),
        cms_agg(col("k"), 0.001, 0.01).as("cms"))
    val opt = df.queryExecution.optimizedPlan
    assert(!hashInsideAgg(opt))
    val nHoisted = opt.collectFirst {
      case Aggregate(_, _, p: Project, _) =>
        p.projectList.count(_.exists(_.isInstanceOf[AbloomKeyHash]))
    }
    assert(nHoisted === Some(1), s"one shared hash column for the same key:\n$opt")
    assert(df.count() === 3)
  }

  test("SQL-path aggregates get the hoist too") {
    val s = spark
    (0 until 500).map(i => s"v$i").toDF("k").createOrReplaceTempView("hoist_in")
    val df = s.sql("SELECT bloom_agg(k, 500, 0.01) FROM hoist_in")
    assert(!hashInsideAgg(df.queryExecution.optimizedPlan))
    assert(df.head.getAs[Array[Byte]](0).length > 0)
  }

  test("cbf weighted build hoists the key, keeps the weight in place") {
    val df = (0L until 500L).map((_, 1)).toDF("k", "w")
      .agg(cbf_agg(col("k"), col("w"), 500, 0.01))
    val opt = df.queryExecution.optimizedPlan
    assert(!hashInsideAgg(opt), opt.toString)
    assert(df.head.getAs[Array[Byte]](0).length > 0)
  }
}
