package graft.job

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Hashing, Sbbf}
import graft.functions.{abloom_key_hash, bloom_agg_hashed, shard_of}

/** Sharded Bloom filter — membership at beyond-single-array scale.
  *
  * A single SBBF caps at one JVM long array (~17 GB, `Sbbf.empty` throws
  * above it); 10^12 keys at 1% need ~1.3 TB of filter. The shard layer
  * splits the KEY SPACE by a mix64 of the key hash into `shards`
  * independent filters, each sized for its expected share, stored as a
  * plain (shard, filter, rows) table. Nothing else changes: each shard
  * is a normal ABLM v2 filter, zero FN per shard, FPR per shard = the
  * configured rate, so the compound FPR equals the per-shard rate (each
  * key probes exactly ONE shard).
  *
  * Scale shape:
  *  - build = one hash projection + one groupBy(shard) aggregation —
  *    exchange volume O(partitions x shard-filter size), same as the
  *    unsharded build, but no single buffer exceeds (total / shards);
  *  - probe = CO-PARTITIONED zip of the shard table and the fact rows on
  *    the same HashPartitioner — filter bytes move once per shard (not
  *    per row, which a shuffle join on shard_id would do), fact rows move
  *    once; each task parses its few shard filters and probes locally.
  *
  * The shard function mixes the key hash again (mix64) so shard choice is
  * independent of both the block-select bits (upper 32) and the salt bits
  * (lower 32) of the SBBF probe.
  */
object BloomShards {

  /** Shard of a pre-computed abloom key hash. */
  def shardOf(hash: Long, shards: Int): Int =
    java.lang.Long.remainderUnsigned(Hashing.mix64(hash), shards.toLong).toInt

  val shardSchema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("filter", BinaryType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  /** Build the shard table: one filter per shard over `keyCol`.
    *
    * @param totalCapacity capacity across all shards; each shard filter
    *        is sized at `headroom * totalCapacity / shards` (mix64
    *        sharding is uniform, so 1.2x headroom covers the imbalance
    *        at any realistic scale).
    */
  def build(
      df: DataFrame,
      keyCol: Column,
      totalCapacity: Long,
      fpRate: Double,
      shards: Int,
      headroom: Double = 1.2): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val capPerShard = math.max(1L, math.ceil(totalCapacity.toDouble * headroom / shards).toLong)
    df.select(abloom_key_hash(keyCol).as("__h"))
      // null keys hash to null and are never inserted (the aggregate skips
      // them) — drop them here too, or groupBy would emit a shard=null row
      // that probe()'s getInt crashes on
      .filter(col("__h").isNotNull)
      .withColumn("shard", shard_of(col("__h"), shards))
      .groupBy(col("shard"))
      .agg(
        bloom_agg_hashed(col("__h"), capPerShard, fpRate).as("filter"),
        count(lit(1)).as("rows"))
  }

  /** Probe `fact` against a shard table from [[build]]: returns `fact`
    * plus a boolean `containsCol`. Both sides are partitioned by the SAME
    * HashPartitioner on shard id and zipped partition-wise, so each
    * shard's filter bytes ship exactly once and every fact row is probed
    * in the task that holds its shard — no per-row filter replication,
    * no driver collection, no size limit on the total filter bytes.
    */
  def probe(
      fact: DataFrame,
      keyCol: Column,
      shardTable: DataFrame,
      shards: Int,
      containsCol: String = "might_contain"): DataFrame = {
    val spark = fact.sparkSession
    val partitioner = new HashPartitioner(shards)

    val filtersRdd = shardTable.select(col("shard"), col("filter")).rdd
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))
      .partitionBy(partitioner)

    // collision-proof internal hash column (the fact may have any schema)
    val hCol = s"__graft_h_${java.util.UUID.randomUUID().toString.take(8)}"
    val withHash = fact.withColumn(hCol, abloom_key_hash(keyCol))
    val outputSchema = StructType(fact.schema.fields :+
      StructField(containsCol, BooleanType, nullable = false))
    val hIdx = withHash.schema.fieldIndex(hCol)

    val factRdd = withHash.rdd
      // null keys hash to null: route to shard 0, probe to false below —
      // a null key is never inserted (the build's aggregate skips nulls)
      .map(r => ((if (r.isNullAt(hIdx)) 0 else shardOf(r.getLong(hIdx), shards)), r))
      .partitionBy(partitioner)

    val probed = filtersRdd.zipPartitions(factRdd, preservesPartitioning = true) {
      (filterIt, rowIt) =>
        // a HashPartitioner task may own several shard ids; parse each once
        val filters = new java.util.HashMap[Int, Sbbf]()
        filterIt.foreach { case (s, bytes) => filters.put(s, Sbbf.fromBytes(bytes)) }
        rowIt.map { case (shard, row) =>
          val f = filters.get(shard)
          val hit = f != null && !row.isNullAt(hIdx) && f.checkHash(row.getLong(hIdx))
          Row.fromSeq(row.toSeq.dropRight(1) :+ hit) // drop the hash col, append flag
        }
    }
    spark.createDataFrame(probed, outputSchema)
  }
}
