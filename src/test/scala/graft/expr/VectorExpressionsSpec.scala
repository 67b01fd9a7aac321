package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Dedup, Similarity}

/** The ANN vector kernels as native codegen expressions: must match the
  * driver-side Seq kernels bit-for-bit (driver-computed probe buckets
  * join against executor-computed signatures), keep ScalaUDF out of the
  * ANN plans, and survive nulls loudly.
  */
class VectorExpressionsSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def randVecs(n: Int, dim: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
  }

  test("lsh_signature matches the driver Seq kernel bit-for-bit") {
    val data = randVecs(200, 24)
    val rows = data.toDF("id", "v").repartition(3)
      .select(col("id"), graft.functions.lsh_signature(col("v"), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    data.foreach { case (id, v) =>
      assert(rows(id) === Similarity.signatureKernel(v, 12), s"id=$id")
    }
  }

  test("lsh_table_signatures matches tableSignature per table") {
    val data = randVecs(100, 16)
    val rows = data.toDF("id", "v").repartition(2)
      .select(col("id"),
        graft.functions.lsh_table_signatures(col("v"), 8, 10).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    data.foreach { case (id, v) =>
      (0 until 8).foreach { t =>
        assert(rows(id)(t) === Similarity.tableSignature(v, t, 10), s"id=$id t=$t")
      }
    }
  }

  test("vec_nearest_centroid matches the driver kernel, ties to lowest index") {
    val cents = Array(
      Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0), Array(-1.0, 0.5, 0.0))
    val data = randVecs(150, 3)
    val rows = data.toDF("id", "v").repartition(2)
      .select(col("id"),
        graft.functions.vec_nearest_centroid(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    data.foreach { case (id, v) =>
      assert(rows(id) === Similarity.nearestCentroid(v, cents)._1, s"id=$id")
    }
    // exact tie between centroid 0 and a duplicate of it -> lowest index
    val tieCents = Array(Array(1.0, 2.0), Array(1.0, 2.0))
    val tie = Seq((0L, Seq(5.0, 5.0))).toDF("id", "v")
      .select(graft.functions.vec_nearest_centroid(col("v"), tieCents)).head().getInt(0)
    assert(tie === 0)
  }

  test("mix64 expression matches Hashing.mix64, incl. SQL name") {
    val xs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val rows = xs.toDF("x").repartition(2)
      .select(col("x"), graft.functions.mix64(col("x")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(rows(x) === graft.core.Hashing.mix64(x)))
    xs.toDF("x").createOrReplaceTempView("mix64_t")
    val sqlRows = spark.sql("SELECT x, mix64(x) AS m FROM mix64_t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(sqlRows(x) === graft.core.Hashing.mix64(x)))
  }

  test("SQL names: lsh_signature / lsh_table_signatures") {
    randVecs(20, 8).toDF("id", "v").createOrReplaceTempView("vec_t")
    val r = spark.sql(
      """SELECT lsh_signature(v, 6) AS s, lsh_table_signatures(v, 4, 6) AS ts
        |FROM vec_t""".stripMargin).collect()
    assert(r.length === 20)
    r.foreach(row => assert(row.getSeq[Long](1).length === 4))
  }

  test("null array elements are rejected loudly, null vectors yield null") {
    val err = intercept[Exception] {
      Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("v")
        .repartition(1)
        .select(graft.functions.lsh_signature(col("v"), 8)).collect()
    }
    assert(err.getMessage.contains("NULL") || err.getCause != null)
    val r = Seq[Seq[Double]](null).toDF("v")
      .select(graft.functions.lsh_signature(col("v"), 8)).head()
    assert(r.isNullAt(0))
  }

  test("ANN plans contain no ScalaUDF and stay inside whole-stage codegen") {
    val df = randVecs(300, 16).toDF("vec_id", "embedding").repartition(2)
    val plans = Seq(
      "lshBuckets" -> Similarity.lshBuckets(df, "embedding", "vec_id", 10),
      "ivfIndex" -> Similarity.ivfIndex(df, "embedding", "vec_id",
        Array(Array.fill(16)(0.1), Array.fill(16)(-0.1))),
      "embeddingPairs" -> Dedup.embeddingPairs(df, "embedding", "vec_id", 0.9))
    plans.foreach { case (name, d) =>
      val optimized = d.queryExecution.optimizedPlan
      val hasUdf = optimized.exists(_.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
        case _ => false
      }))
      assert(!hasUdf, s"$name optimized plan contains a ScalaUDF")
    }
    // the signature projection sits in a codegen stage (materialize so
    // AQE finalizes; recurse into the query stages)
    val buckets = Similarity.lshBuckets(df, "embedding", "vec_id", 10)
    buckets.collect()
    def render(p: org.apache.spark.sql.execution.SparkPlan): String = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        render(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q.toString + "\n" + render(q.plan)
      case other => other.toString + other.children.map(render).mkString
    }
    val planStr = render(buckets.queryExecution.executedPlan)
    assert(planStr.contains("*(") && !planStr.contains("ScalaUDF"),
      s"expected codegen stage without UDF in:\n$planStr")
  }

  test("kmeans + IVF recall path still works end-to-end on clustered data") {
    // clustered vectors (3 centers) — the expression-based assignment must
    // reproduce the full IVF flow
    val rnd = new scala.util.Random(11)
    val data = (0 until 300).map { i =>
      val c = i % 3
      val center = Seq.tabulate(8)(d => (c * 37 + d).toDouble / 10.0)
      (i.toLong, center.map(_ + rnd.nextGaussian() * 0.05))
    }
    val df = data.toDF("vec_id", "embedding").repartition(3)
    val cents = Similarity.kmeansCentroids(df, "embedding", "vec_id", k = 3, iters = 3)
    assert(cents.length === 3)
    val index = Similarity.ivfIndex(df, "embedding", "vec_id", cents)
    val query = data(1)._2
    val ann = Similarity.ivfTopK(index, "embedding", query, cents, 10, nprobe = 1)
    val exact = Similarity.bruteForceTopK(df, "embedding", "vec_id", query, 10)
    assert(Similarity.recallAtK(ann, exact) >= 0.9)
  }
}
