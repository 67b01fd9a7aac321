package graft.job

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Sbbf

class BloomShardsSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  test("sharded build + co-partitioned probe: zero FN, per-shard FPR, routing") {
    val n = 20000L
    val keys = (0L until n).toDF("k")
    val shardTable = BloomShards.build(keys, col("k"), n, 0.01, shards = 8).cache()
    assert(shardTable.count() === 8)
    assert(shardTable.agg(sum(col("rows"))).head.getLong(0) === n)

    // zero FN: every member passes
    val probedMembers = BloomShards.probe(keys, col("k"), shardTable, 8)
    assert(probedMembers.filter(!col("might_contain")).count() === 0L)

    // FPR on definite non-members stays at the configured rate
    val nonMembers = (1000000L until 1100000L).toDF("k")
    val fp = BloomShards.probe(nonMembers, col("k"), shardTable, 8)
      .filter(col("might_contain")).count()
    assert(fp.toDouble / 100000 <= 0.01 * 1.5, s"fp=$fp")

    // routing: a key must hit exactly the shard shardOf names — probing a
    // WRONG shard's filter for a member is (almost surely) negative
    val shardFilters = shardTable.collect()
      .map(r => r.getInt(0) -> Sbbf.fromBytes(r.getAs[Array[Byte]](1))).toMap
    (0L until 100L).foreach { k =>
      val h = graft.core.Hashing.hashLong(k)
      val s = BloomShards.shardOf(h, 8)
      assert(shardFilters(s).checkHash(h), s"k=$k own shard")
    }
    shardTable.unpersist()
  }

  test("probe is invariant to fact partitioning and keeps all fact columns") {
    val keys = (0L until 5000L).map(k => (k, s"v$k")).toDF("k", "v")
    val shardTable = BloomShards.build(keys, col("k"), 5000, 0.01, shards = 4)
    val expected = BloomShards.probe(keys.repartition(2), col("k"), shardTable, 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val other = BloomShards.probe(keys.repartition(13), col("k"), shardTable, 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(expected === other)
    assert(expected.size === 5000)
    assert(expected.forall(_._3)) // all members pass
  }

  test("null keys: dropped from the build, probe to false, never crash") {
    val keys = ((0L until 1000L).map(k => (java.lang.Long.valueOf(k), s"v$k")) ++
      Seq((null.asInstanceOf[java.lang.Long], "vnull1"),
        (null.asInstanceOf[java.lang.Long], "vnull2")))
      .toDF("k", "v")
    val shardTable = BloomShards.build(keys, col("k"), 1000, 0.01, shards = 4)
    // no shard=null row: exactly the 4 real shards, rows sum excludes nulls
    assert(shardTable.count() === 4)
    assert(shardTable.agg(sum(col("rows"))).head.getLong(0) === 1000L)
    val probed = BloomShards.probe(keys, col("k"), shardTable, 4)
    assert(probed.count() === 1002L)
    assert(probed.filter(col("v").startsWith("vnull") && col("might_contain")).count() === 0L)
    assert(probed.filter(!col("v").startsWith("vnull") && !col("might_contain")).count() === 0L)
  }

  test("shards > cores: 64 shards on local[4], tasks queue, result exact") {
    val n = 30000L
    val keys = (0L until n).toDF("k")
    val shardTable = BloomShards.build(keys, col("k"), n, 0.01, shards = 64).cache()
    assert(shardTable.count() === 64)
    val probed = BloomShards.probe(keys, col("k"), shardTable, 64)
    assert(probed.filter(col("might_contain")).count() === n) // zero FN
    val fp = BloomShards.probe((1000000L until 1100000L).toDF("k"), col("k"), shardTable, 64)
      .filter(col("might_contain")).count()
    assert(fp.toDouble / 100000 <= 0.01 * 1.5, s"fp=$fp")
    shardTable.unpersist()
  }

  test("each shard filter is an ordinary ABLM v2 filter sized per shard") {
    val n = 8000L
    val shardTable = BloomShards.build((0L until n).toDF("k"), col("k"), n, 0.02, 8)
    shardTable.collect().foreach { r =>
      val f = Sbbf.fromBytes(r.getAs[Array[Byte]](1)) // full wire validation
      assert(f.capacity === math.ceil(n * 1.2 / 8).toLong)
      assert(f.fpRate === 0.02)
      assert(r.getLong(2) <= f.capacity, "per-shard rows within sized capacity")
    }
  }
}
