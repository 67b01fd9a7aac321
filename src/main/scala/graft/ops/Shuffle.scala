package graft.ops

import org.apache.spark.sql.DataFrame
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
    val (ranked, _) = HashOrder.rankByHash(
      df, keyCol, salt, buckets, groupCol = None,
      rankCol = "__shf_rank", opName = "epochShuffle")
    ranked
      .withColumn("shuffle_pos", col("__shf_rank") - 1L)
      .drop("__shf_rank")
  }
}
