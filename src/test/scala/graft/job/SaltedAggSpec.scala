package graft.job

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{Hll, Sbbf}
import graft.functions._

class SaltedAggSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  // skewed: group "hot" has 20x the rows of the others
  private def skewed = {
    val hot = (0 until 4000).map(i => ("hot", s"k$i"))
    val cold = (0 until 10).flatMap(g => (0 until 200).map(i => (s"g$g", s"g${g}k$i")))
    (hot ++ cold).toDF("grp", "key")
  }

  test("salted bloom per group == unsalted per group (bit-identical)") {
    val salted = SaltedAgg.bloomByGroup(skewed, "grp", "key", 5000, 0.01, salts = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val plain = skewed.groupBy(col("grp"))
      .agg(bloom_agg(col("key"), 5000, 0.01).as("filter"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (g, bytes) =>
      assert(java.util.Arrays.equals(bytes, plain(g)), s"group $g")
    }
    // semantic check on the hot group
    val hot = Sbbf.fromBytes(salted("hot"))
    (0 until 4000).foreach(i => assert(hot.contains(s"k$i")))
  }

  test("salted HLL per group == unsalted (bit-identical), estimates sane") {
    val salted = SaltedAgg.hllByGroup(skewed, "grp", "key", salts = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val plain = skewed.groupBy(col("grp"))
      .agg(hll_agg(col("key")).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    salted.foreach { case (g, bytes) =>
      assert(java.util.Arrays.equals(bytes, plain(g)), s"group $g")
    }
    val est = Hll.fromBytes(salted("hot")).estimate
    assert(math.abs(est - 4000) <= 3 * 0.0082 * 4000 + 5)
  }

  test("broadcast-backed probe equals literal probe, zero FN") {
    val keys = (0 until 30000).map(i => s"bc$i")
    val bytes = keys.toDF("k").agg(bloom_agg(col("k"), 30000, 0.01))
      .head.getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(bytes)

    val fn = keys.toDF("k")
      .filter(!bloom_contains(bc, col("k"))).count()
    assert(fn === 0L)

    val viaLit = (0 until 50000).map(i => s"probe$i").toDF("k")
      .filter(bloom_contains(lit(bytes), col("k"))).count()
    val viaBc = (0 until 50000).map(i => s"probe$i").toDF("k")
      .filter(bloom_contains(bc, col("k"))).count()
    assert(viaBc === viaLit) // identical decisions on every probe
    bc.destroy()
  }

  test("salted CBF per group == unsalted (bit-identical), deletes included") {
    val ops = skewed.withColumn("w",
      when(col("key").endsWith("1"), lit(-1)).otherwise(lit(1)))
    // every delete needs a matching insert: union inserts for the -1 rows
    val df = ops.withColumn("w", lit(1))
      .unionByName(ops.filter(col("w") === -1))
    val salted = SaltedAgg.cbfByGroup(df, "grp", "key", col("w"), 5000, 0.01, salts = 8)
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    val plain = df.groupBy(col("grp"))
      .agg(cbf_agg(col("key"), col("w"), 5000, 0.01).as("filter"))
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(salted === plain)
  }

  test("generic sketchByGroup hosts any mergeable sketch (SBF example)") {
    val out = SaltedAgg.sketchByGroup(skewed, "grp", col("key"),
      sbf_agg(col("key"), 1024, 0.001), sbf_union_agg(_), salts = 4)
      .collect().map(r => (r.getString(0), graft.core.Sbf.fromBytes(r.getAs[Array[Byte]](1))))
    out.foreach { case (g, f) =>
      val expected = if (g == "hot") 4000L else 200L
      assert(f.insertedCount === expected, s"group $g")
    }
  }
}
