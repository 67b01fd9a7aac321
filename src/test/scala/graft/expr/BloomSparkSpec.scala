package graft.expr

import org.apache.spark.sql.functions.{col, lit, count, sum}

import graft.SparkTestBase
import graft.core.{Hashing, Sbbf}
import graft.functions._

/** End-to-end Spark semantics of the Bloom sketch: the distributed build
  * must be byte-identical to a sequential driver-side build (and therefore
  * to the reference C implementation, which the core golden tests pin).
  */
class BloomSparkSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def driverFilter(keys: Seq[String], cap: Long, fp: Double): Array[Byte] = {
    val f = Sbbf.empty(cap, fp)
    keys.foreach(f.add)
    f.toBytes
  }

  test("bloom_agg over Dataset == sequential driver build (byte-identical)") {
    val keys = (0 until 5000).map(i => s"key$i")
    val agg = keys.toDF("k")
      .agg(bloom_agg(col("k"), 10000, 0.01))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(agg, driverFilter(keys, 10000, 0.01)))
  }

  test("partition-count invariance: 1, 4, 13 partitions, same bytes") {
    val keys = (0 until 3000).map(i => s"part$i")
    val builds = Seq(1, 4, 13).map { p =>
      keys.toDF("k").repartition(p)
        .agg(bloom_agg(col("k"), 5000, 0.01))
        .head.getAs[Array[Byte]](0)
    }
    assert(builds.forall(java.util.Arrays.equals(_, builds.head)))
  }

  test("bloom_agg long keys match driver hashing") {
    val keys = (-500L until 500L).toSeq
    val agg = keys.toDF("k").agg(bloom_agg(col("k"), 2000, 0.01))
      .head.getAs[Array[Byte]](0)
    val f = Sbbf.empty(2000, 0.01)
    keys.foreach(f.add)
    assert(java.util.Arrays.equals(agg, f.toBytes))
  }

  test("bloom_agg double and int keys hash like the reference type rules") {
    val agg = Seq(42.0, -0.0, 3.5).toDF("k")
      .agg(bloom_agg(col("k"), 100, 0.01)).head.getAs[Array[Byte]](0)
    val f = Sbbf.empty(100, 0.01)
    Seq(42.0, -0.0, 3.5).foreach(f.add)
    assert(java.util.Arrays.equals(agg, f.toBytes))
    // int 42 == double 42.0 equivalence survives the Spark path
    val fromInt = Seq(42L).toDF("k").agg(bloom_agg(col("k"), 100, 0.01))
      .head.getAs[Array[Byte]](0)
    assert(Sbbf.fromBytes(fromInt).contains(42.0))
  }

  test("bloom_agg binary keys") {
    val keys = Seq[Array[Byte]]("a".getBytes, Array[Byte](0, 1, 2), Array.emptyByteArray)
    val agg = keys.toDF("k").agg(bloom_agg(col("k"), 100, 0.01))
      .head.getAs[Array[Byte]](0)
    val f = Sbbf.empty(100, 0.01)
    keys.foreach(f.add)
    assert(java.util.Arrays.equals(agg, f.toBytes))
  }

  test("nulls are skipped, empty input yields empty filter") {
    val agg = Seq(Some("a"), None, Some("b"), None).toDF("k")
      .agg(bloom_agg(col("k"), 100, 0.01)).head.getAs[Array[Byte]](0)
    val f = Sbbf.empty(100, 0.01)
    f.add("a"); f.add("b")
    assert(java.util.Arrays.equals(agg, f.toBytes))

    val empty = Seq.empty[String].toDF("k")
      .agg(bloom_agg(col("k"), 100, 0.01)).head.getAs[Array[Byte]](0)
    assert(Sbbf.fromBytes(empty).isEmpty)
  }

  test("bloom_contains: zero false negatives, FPR within bound, codegen path") {
    val keys = (0 until 20000).map(i => s"member$i")
    val filter = keys.toDF("k").agg(bloom_agg(col("k"), 20000, 0.01))
      .head.getAs[Array[Byte]](0)

    val fn = keys.toDF("k")
      .filter(!bloom_contains(lit(filter), col("k"))).count()
    assert(fn === 0L, "false negatives")

    val probes = (0 until 100000).map(i => s"absent$i")
    val fp = probes.toDF("k")
      .filter(bloom_contains(lit(filter), col("k"))).count()
    assert(fp.toDouble / probes.size <= 0.01 * 1.05, s"fp=$fp")
  }

  test("bloom_contains null semantics") {
    val filter = Seq("x").toDF("k").agg(bloom_agg(col("k"), 10, 0.01))
      .head.getAs[Array[Byte]](0)
    val rows = Seq(Some("x"), None).toDF("k")
      .select(bloom_contains(lit(filter), col("k"))).collect()
    assert(rows(0).getBoolean(0) === true)
    assert(rows(1).isNullAt(0))
  }

  test("bloom_union_agg merges per-group filters == global filter") {
    val keys = (0 until 2000).map(i => s"g$i")
    val df = keys.zipWithIndex.map { case (k, i) => (k, i % 7) }.toDF("k", "g")
    val merged = df.groupBy(col("g"))
      .agg(bloom_agg(col("k"), 4000, 0.01).as("f"))
      .agg(bloom_union_agg(col("f")))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, driverFilter(keys, 4000, 0.01)))
  }

  test("bloom_union scalar ORs two stored filters") {
    val a = Seq("l1", "l2").toDF("k").agg(bloom_agg(col("k"), 100, 0.01))
      .head.getAs[Array[Byte]](0)
    val b = Seq("r1", "r2").toDF("k").agg(bloom_agg(col("k"), 100, 0.01))
      .head.getAs[Array[Byte]](0)
    val u = Seq((a, b)).toDF("a", "b")
      .select(bloom_union(col("a"), col("b"))).head.getAs[Array[Byte]](0)
    val f = Sbbf.fromBytes(u)
    assert(Seq("l1", "l2", "r1", "r2").forall(f.contains))
  }

  test("bloom_cardinality_estimate and bloom_intersect_estimate columns + SQL") {
    graft.sql.Registry.register(spark)
    val a = (0 until 6000).map(i => s"ka$i").toDF("k")
      .agg(bloom_agg(col("k"), 20000, 0.01)).head.getAs[Array[Byte]](0)
    val b = ((3000 until 6000).map(i => s"ka$i") ++ (0 until 3000).map(i => s"kb$i"))
      .toDF("k").agg(bloom_agg(col("k"), 20000, 0.01)).head.getAs[Array[Byte]](0)
    val row = Seq((a, b)).toDF("a", "b").select(
      bloom_cardinality_estimate(col("a")).as("ca"),
      bloom_intersect_estimate(col("a"), col("b")).as("i")).head
    assert(math.abs(row.getDouble(0) - 6000) <= 0.03 * 6000 + 5)
    assert(math.abs(row.getDouble(1) - 3000) <= 0.02 * 12000 + 5)
    Seq((a, b)).toDF("a", "b").createOrReplaceTempView("bi_est")
    val sqlRow = spark.sql(
      """SELECT bloom_cardinality_estimate(a) AS ca,
        |bloom_intersect_estimate(a, b) AS i FROM bi_est""".stripMargin).head
    assert(sqlRow.getDouble(0) === row.getDouble(0))
    assert(sqlRow.getDouble(1) === row.getDouble(1))
  }

  test("SQL surface: bloom_agg / bloom_contains / bloom_describe") {
    graft.sql.Registry.register(spark)
    (0 until 100).map(i => s"sql$i").toDF("k").createOrReplaceTempView("sql_keys")
    val filter = spark.sql(
      "SELECT bloom_agg(k, 1000, 0.01) AS f FROM sql_keys")
      .head.getAs[Array[Byte]](0)
    val f = Sbbf.empty(1000, 0.01)
    (0 until 100).foreach(i => f.add(s"sql$i"))
    assert(java.util.Arrays.equals(filter, f.toBytes))

    spark.sql("SELECT bloom_agg(k, 1000, 0.01) AS f FROM sql_keys")
      .createOrReplaceTempView("sql_filter")
    val hits = spark.sql(
      """SELECT count(*) AS n FROM sql_keys, sql_filter
        |WHERE bloom_contains(f, k)""".stripMargin).head.getLong(0)
    assert(hits === 100L)

    val d = spark.sql("SELECT bloom_describe(f) AS d FROM sql_filter")
      .selectExpr("d.capacity", "d.k", "d.is_empty").head
    assert(d.getLong(0) === 1000L && d.getInt(1) === 8 && !d.getBoolean(2))
  }

  test("describe matches core properties") {
    val bytes = Seq("x").toDF("k").agg(bloom_agg(col("k"), 12345, 0.025))
      .head.getAs[Array[Byte]](0)
    val row = Seq(bytes).toDF("f").select(bloom_describe(col("f")).as("d"))
      .selectExpr("d.capacity", "d.fp_rate", "d.block_count").head
    assert(row.getLong(0) === 12345L)
    assert(row.getDouble(1) === 0.025)
    assert(row.getLong(2) === Sbbf.blockCountFor(12345, 0.025))
  }

  test("abloom_key_hash column == core Hashing") {
    val rows = Seq("abc").toDF("k").select(abloom_key_hash(col("k"))).head
    assert(rows.getLong(0) === Hashing.hashString("abc"))
    val l = Seq(42L).toDF("k").select(abloom_key_hash(col("k"))).head
    assert(l.getLong(0) === Hashing.hashLong(42L))
  }

  test("synth source_files: sha2(content) invariant under partitioning") {
    import graft.data.Synth
    val a = Synth.sourceFiles(spark, 10, 20, partitions = 2)
      .selectExpr("sha2(content, 256) AS s").orderBy("s").collect().map(_.getString(0))
    val b = Synth.sourceFiles(spark, 10, 20, partitions = 7)
      .selectExpr("sha2(content, 256) AS s").orderBy("s").collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 200 && a.distinct.length === 200)
  }
}
