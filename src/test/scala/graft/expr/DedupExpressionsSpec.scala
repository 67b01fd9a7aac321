package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Dedup

class DedupExpressionsSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  Mixed   CASE and\tweird   whitespace  ",
    "short one",
    "",
    "repeat repeat repeat repeat repeat")

  test("shingle_hashes / minhash_signature / simhash64 match the String kernels") {
    val rows = texts.toDF("t").repartition(2)
      .select(col("t"),
        graft.functions.shingle_hashes(col("t"), 3).as("hs"),
        graft.functions.minhash_signature(
          graft.functions.shingle_hashes(col("t"), 3), 16).as("sig"),
        graft.functions.simhash64(col("t")).as("sh"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getSeq[Long](1) === Dedup.shingleHashKernel(t, 3).toSeq)
      assert(r.getSeq[Long](2) ===
        Dedup.minhashKernel(Dedup.shingleHashKernel(t, 3), 16).toSeq)
      assert(r.getLong(3) === Dedup.simhashTextKernel(t))
    }
  }

  test("jaccard_sorted matches the kernel and the whole pipeline stays codegen") {
    val df = texts.filter(_.nonEmpty).toDF("t").repartition(2)
      .select(graft.functions.shingle_hashes(col("t"), 2).as("a"),
        graft.functions.shingle_hashes(concat(col("t"), lit(" extra token")), 2).as("b"))
      .withColumn("j", graft.functions.jaccard_sorted(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getDouble(2) ===
        Dedup.jaccardSortedKernel(r.getSeq[Long](0), r.getSeq[Long](1)))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && !plan.contains("ScalaUDF"), s"UDF leaked:\n$plan")
  }

  test("SQL names and null propagation") {
    texts.toDF("t").createOrReplaceTempView("dedup_expr_t")
    val rows = spark.sql(
      """SELECT simhash64(t) AS sh, size(shingle_hashes(t, 3)) AS ns,
        |size(minhash_signature(shingle_hashes(t, 3), 8)) AS k
        |FROM dedup_expr_t""".stripMargin).collect()
    assert(rows.length === texts.length)
    rows.foreach(r => assert(r.getInt(2) === 8))
    val n = Seq[String](null).toDF("t")
      .select(graft.functions.simhash64(col("t")),
        graft.functions.shingle_hashes(col("t"), 3)).head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("null ARRAY ELEMENTS are rejected loudly, not read as hash 0") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT minhash_signature(array(1L, CAST(NULL AS BIGINT)), 8)").collect()
    }
    assert(e.getMessage.contains("NULL") || e.getCause != null &&
      e.getCause.getMessage.contains("NULL"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT jaccard_sorted(array(CAST(NULL AS BIGINT)), array(0L))").collect()
    }
    assert(e2.getMessage.contains("NULL") || e2.getCause != null &&
      e2.getCause.getMessage.contains("NULL"), e2.getMessage)
  }

  test("intersect_count_sorted: kernel equality, SQL name, loud null elements") {
    // kernel equality over shingle sets
    val df = texts.filter(_.nonEmpty).toDF("t").repartition(2)
      .select(graft.functions.shingle_hashes(col("t"), 2).as("a"),
        graft.functions.shingle_hashes(concat(col("t"), lit(" extra token")), 2).as("b"))
      .withColumn("i", graft.functions.intersect_count_sorted(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getLong(2) ===
        Dedup.intersectCountKernel(r.getSeq[Long](0), r.getSeq[Long](1)))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // SQL name + exact value
    assert(spark.sql(
      "SELECT intersect_count_sorted(array(1L, 3L, 7L), array(3L, 5L, 7L, 9L))")
      .head().getLong(0) === 2L)
    // null array -> null result; null ELEMENT -> loud error
    assert(spark.sql(
      "SELECT intersect_count_sorted(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .head().isNullAt(0))
    val e = intercept[Exception] {
      spark.sql(
        "SELECT intersect_count_sorted(array(CAST(NULL AS BIGINT)), array(0L))").collect()
    }
    assert(e.getMessage.contains("NULL") || e.getCause != null &&
      e.getCause.getMessage.contains("NULL"), e.getMessage)
  }
}
