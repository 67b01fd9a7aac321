package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic EPOCH SHUFFLE: a reproducible global training order.
  *
  * Every row gets `shuffle_pos` — its 0-based position in ascending
  * (sha256(key || salt) , key) order. With a fresh salt per epoch this
  * is a uniform random permutation that is a PURE FUNCTION of (keys,
  * salt): re-running on a reshuffled, differently-partitioned, or
  * resized cluster reproduces the identical order, and any engine with
  * sha256 can recompute it (the auditability `orderBy(rand(seed))`
  * loses the moment input splits change). Feed `shuffle_pos` to
  * `repartitionByRange` + `sortWithinPartitions` for reproducible
  * training shards, or compose with [[Packing.packSequences]] (key =
  * shuffle_pos) for shuffle-then-pack batch assembly.
  *
  * Scale shape — the [[Mixture]] machinery without domains: fixed
  * equal-width buckets on the hash's leading 16 bits (uniform by
  * construction, deterministic boundaries), one count pass (`buckets`
  * rows to the driver, plus the key preconditions), one within-bucket
  * window rank. No global sort ever lands in one task.
  */
object Shuffle {

  /** `df` plus `shuffle_pos` (0-based, dense, a permutation of
    * [0, count)).
    *
    * Preconditions (checked, riding the count pass): `keyCol` unique
    * and non-null (a duplicated key would make its rows' relative order
    * undefined).
    *
    * @param salt    the epoch: change it to re-shuffle, keep it to
    *                reproduce
    * @param buckets parallelism of the rank pass; never affects the order
    */
  def epochShuffle(
      df: DataFrame,
      keyCol: String,
      salt: String,
      buckets: Int = 64): DataFrame = {
    val key = col(keyCol)
    val spark = df.sparkSession
    import spark.implicits._

    val withHash = df
      .withColumn("__shf_h", HashOrder.hashCol(key, salt))
      .withColumn("__shf_bucket", HashOrder.bucketCol(col("__shf_h"), buckets))

    // duplicated keys share a hash and therefore a bucket, so per-bucket
    // distinct checks see every global duplicate
    val rawCells = withHash.groupBy(col("__shf_bucket"))
      .agg(
        count(lit(1)).as("n"),
        count(key).as("n_keys"),
        countDistinct(key).as("n_distinct"))
      .collect()
    // precondition checks BEFORE reading the bucket as an int: a null
    // key hashes to a null bucket, which must report as the null-key
    // violation, not crash the sort
    rawCells.foreach { r =>
      require(!r.isNullAt(0) && r.getLong(2) == r.getLong(1),
        s"epochShuffle: $keyCol must be non-null")
      require(r.getLong(3) == r.getLong(2),
        s"epochShuffle: $keyCol must be unique — bucket ${r.getInt(0)} has " +
          s"${r.getLong(2)} keys but ${r.getLong(3)} distinct")
    }
    val cells = rawCells.sortBy(_.getInt(0))
    val offsets = cells.scanLeft(0L) { (acc, r) =>
      Math.addExact(acc, r.getLong(1))
    }.init
    val offsetDf = cells.map(_.getInt(0)).zip(offsets).toSeq
      .toDF("__shf_bucket", "__bucket_offset")

    val w = Window.partitionBy(col("__shf_bucket"))
      .orderBy(col("__shf_h").asc, key.asc)
    withHash
      .join(broadcast(offsetDf), "__shf_bucket")
      .withColumn("shuffle_pos",
        col("__bucket_offset") + row_number().over(w) - 1L)
      .drop("__shf_h", "__shf_bucket", "__bucket_offset")
  }
}
