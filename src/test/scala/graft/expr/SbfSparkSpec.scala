package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Sbf
import graft.functions._

class SbfSparkSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  test("distributed unknown-cardinality build: zero FN under any partitioning") {
    for (parts <- Seq(1, 4, 8)) {
      val df = (0L until 20000L).toDF("k").repartition(parts)
      val bytes = df.agg(sbf_agg(col("k"), 1024, 0.001)).head.getAs[Array[Byte]](0)
      val f = Sbf.fromBytes(bytes)
      assert(f.insertedCount === 20000L, s"parts=$parts")
      assert(f.stageCount > 1, "growth must have happened")
      // zero FN through the expression path
      val fn = (0L until 20000L).toDF("k")
        .filter(!sbf_contains(lit(bytes), col("k"))).count()
      assert(fn === 0L, s"parts=$parts")
    }
  }

  test("serialized bytes are run-to-run deterministic through the Spark agg") {
    // end-to-end net for the canonical-bytes contract: the same input with
    // the same fixed partitioning must serialize to the same blob on every
    // run, whatever order Spark merges the partials in (the merge-tree
    // invariance itself is property-tested in CbfSbfPropertySpec)
    val df = spark.range(0L, 30000L, 1L, 8).toDF("k")
    val runs = (1 to 3).map { _ =>
      df.agg(sbf_agg(col("k"), 2048, 0.001)).head.getAs[Array[Byte]](0).toSeq
    }
    assert(runs.distinct.size === 1, "SBF blobs must be identical across runs")
    // equals/hashCode see through stage-list ordering too
    val a = Sbf.fromBytes(runs.head.toArray)
    val b = Sbf.fromBytes(runs.last.toArray)
    assert(a === b && a.hashCode === b.hashCode)
  }

  test("empirical FPR within the serialized compound bound") {
    val df = (0L until 30000L).toDF("k").repartition(6)
    val bytes = df.agg(sbf_agg(col("k"), 4096, 0.001)).head.getAs[Array[Byte]](0)
    val bound = Seq(bytes).toDF("f")
      .select(sbf_describe(col("f")).getField("compound_fp_bound")).head.getDouble(0)
    val probes = 200000L
    val fp = spark.range(1000000L, 1000000L + probes).toDF("k")
      .filter(sbf_contains(lit(bytes), col("k"))).count()
    assert(fp.toDouble / probes <= bound * 1.5, s"fp=$fp bound=$bound")
  }

  test("sbf_union_agg tree-merges stored partials; all keys still contained") {
    // build per-group partials, merge the stored blobs, probe everything
    val df = (0L until 12000L).map(k => (k, (k % 5).toString)).toDF("k", "g")
    val merged = df.groupBy(col("g"))
      .agg(sbf_agg(col("k"), 1024, 0.001).as("f"))
      .agg(sbf_union_agg(col("f"))).head.getAs[Array[Byte]](0)
    val f = Sbf.fromBytes(merged)
    assert(f.insertedCount === 12000L)
    val fn = (0L until 12000L).toDF("k")
      .filter(!sbf_contains(lit(merged), col("k"))).count()
    assert(fn === 0L)
  }

  test("SQL surface: sbf_agg/sbf_contains/sbf_describe") {
    val s = spark
    (0L until 9000L).toDF("k").createOrReplaceTempView("sbf_in")
    val bytes = s.sql("SELECT sbf_agg(k, 1024, 0.001) FROM sbf_in")
      .head.getAs[Array[Byte]](0)
    s.createDataset(Seq(bytes)).toDF("f").createOrReplaceTempView("sbf_f")
    val row = s.sql(
      """SELECT d.stage_count, d.inserted_count FROM
        |(SELECT sbf_describe(f) AS d FROM sbf_f)""".stripMargin).head
    assert(row.getInt(0) > 1 && row.getLong(1) === 9000L)
    val fn = s.sql(
      """SELECT count(*) FROM range(0, 9000) r, sbf_f
        |WHERE NOT sbf_contains(sbf_f.f, r.id)""".stripMargin).head.getLong(0)
    assert(fn === 0L)
    // default-arg SQL form
    assert(s.sql("SELECT sbf_agg(k) FROM sbf_in").head.getAs[Array[Byte]](0).length > 0)
  }
}
