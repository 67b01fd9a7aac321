package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Cbf
import graft.functions._

class CbfSparkSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  test("distributed weighted build is byte-identical to sequential for any partitioning") {
    val inserts = (0L until 4000L).map((_, 1))
    val deletes = (0L until 4000L by 5).map((_, -1))
    val all = inserts ++ deletes
    val seqF = Cbf.empty(5000, 0.01)
    all.foreach { case (k, w) => seqF.add(k, w) }

    for (parts <- Seq(1, 3, 8)) {
      val df = all.toDF("k", "w").repartition(parts)
      val bytes = df.agg(cbf_agg(col("k"), col("w"), 5000, 0.01))
        .head.getAs[Array[Byte]](0)
      assert(bytes.toSeq === seqF.toBytes.toSeq, s"parts=$parts")
    }
  }

  test("delete semantics end-to-end: remaining keys pass, counts upper-bound") {
    val inserts = (0L until 3000L).map((_, 1))
    val deletes = (0L until 3000L by 4).map((_, -1))
    val bytes = (inserts ++ deletes).toDF("k", "w")
      .agg(cbf_agg(col("k"), col("w"), 3000, 0.01)).head.getAs[Array[Byte]](0)

    val probe = (0L until 3000L).toDF("k")
    val remaining = probe.filter(col("k") % 4 =!= 0)
    assert(remaining.filter(!cbf_contains(lit(bytes), col("k"))).count() === 0L)
    // counts never underestimate the net
    val under = probe
      .withColumn("net", when(col("k") % 4 === 0, 0L).otherwise(1L))
      .filter(cbf_count(lit(bytes), col("k")) < col("net")).count()
    assert(under === 0L)
  }

  test("broadcast probe variants agree with the literal path") {
    val inserts = (0L until 2000L).map((_, 1))
    val deletes = (0L until 2000L by 3).map((_, -1))
    val bytes = (inserts ++ deletes).toDF("k", "w")
      .agg(cbf_agg(col("k"), col("w"), 2000, 0.01)).head.getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(bytes)
    val probe = (0L until 3000L).toDF("k")
    val viaLit = probe.select(col("k"),
      cbf_contains(lit(bytes), col("k")).as("c"),
      cbf_count(lit(bytes), col("k")).as("n")).collect()
    val viaBc = probe.select(col("k"),
      cbf_contains(bc, col("k")).as("c"),
      cbf_count(bc, col("k")).as("n")).collect()
    viaLit.zip(viaBc).foreach { case (a, b) =>
      assert(a.getBoolean(1) === b.getBoolean(1) && a.getLong(2) === b.getLong(2))
    }
  }

  test("cbf_union_agg merges per-group filters into the global filter") {
    val df = (0L until 2000L).map(k => (k, (k % 4).toString)).toDF("k", "g")
    val global = df.agg(cbf_agg(col("k"), 2000, 0.01)).head.getAs[Array[Byte]](0)
    val merged = df.groupBy(col("g"))
      .agg(cbf_agg(col("k"), 2000, 0.01).as("f"))
      .agg(cbf_union_agg(col("f"))).head.getAs[Array[Byte]](0)
    assert(merged.toSeq === global.toSeq)
  }

  test("SQL surface: cbf_agg/cbf_contains/cbf_count with weights") {
    val s = spark
    (0L until 500L).map(k => (k, if (k % 3 == 0) -1 else 1))
      .toDF("k", "w").createOrReplaceTempView("cbf_in")
    // net: k%3==0 keys never inserted (only deleted) -> corrupting for
    // those keys, so use weight on inserted set: insert all, delete %3
    (0L until 500L).flatMap(k => Seq((k, 1)) ++ (if (k % 3 == 0) Seq((k, -1)) else Nil))
      .toDF("k", "w").createOrReplaceTempView("cbf_ops")
    val bytes = s.sql(
      "SELECT cbf_agg_weighted(k, w, 500, 0.01) FROM cbf_ops").head.getAs[Array[Byte]](0)
    // insert-only SQL form matches the Scala API's (key, capacity, fp) order
    val insertOnly = s.sql("SELECT cbf_agg(k, 500, 0.01) FROM cbf_in")
      .head.getAs[Array[Byte]](0)
    assert(insertOnly.length === bytes.length)
    s.createDataset(Seq(bytes)).toDF("f").createOrReplaceTempView("cbf_f")
    val fn = s.sql(
      """SELECT count(*) FROM range(0, 500) r, cbf_f
        |WHERE r.id % 3 <> 0 AND NOT cbf_contains(cbf_f.f, r.id)""".stripMargin)
      .head.getLong(0)
    assert(fn === 0L)
    val cnt = s.sql("SELECT cbf_count(f, 1) FROM cbf_f").head.getLong(0)
    assert(cnt >= 1L)
  }

  test("analysis errors: wrong weight type, wrong filter type") {
    val df = Seq((1L, "x")).toDF("k", "s")
    val e1 = intercept[Exception] {
      df.agg(cbf_agg(col("k"), col("s"), 10, 0.01)).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("cast") ||
      e1.getMessage.contains("weight") || e1.getMessage.contains("INT"))
    val e2 = intercept[Exception] {
      df.select(cbf_contains(col("k"), col("k"))).collect()
    }
    assert(e2.getMessage.contains("cbf_contains") || e2.getMessage.contains("binary"))
  }
}
