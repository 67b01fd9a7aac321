package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr._

/** SQL-name registration for the sketch functions, so `spark.sql("SELECT
  * bloom_agg(key, 1000, 0.01) FROM t")` works.
  *
  * Two entry points:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.sql.GraftExtensions`
  *     (config-time injection, the spark-submit path);
  *   - [[Registry.register]] for an already-built session (tests, notebooks).
  */
object Registry {

  /** (name, builder) for every SQL-exposed function. Aggregates are
    * returned unwrapped — the analyzer wraps AggregateFunction in
    * AggregateExpression during resolution.
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "abloom_key_hash" -> { args => AbloomKeyHash(args.head) },
    "bloom_agg" -> { args =>
      require(args.size == 3, "bloom_agg(key, capacity, fp_rate)")
      BloomFilterAgg(AbloomKeyHash(args(0)), args(1), args(2))
    },
    "bloom_contains" -> { args =>
      require(args.size == 2, "bloom_contains(filter, key)")
      BloomMightContain(args(0), AbloomKeyHash(args(1)))
    },
    "bloom_union" -> { args =>
      require(args.size == 2, "bloom_union(a, b)")
      BloomUnion(args(0), args(1))
    },
    "bloom_union_agg" -> { args => BloomUnionAgg(args.head) },
    "bloom_describe" -> { args => BloomDescribe(args.head) })

  /** Register all sketch functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `--conf spark.sql.extensions=graft.sql.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
  }
}
