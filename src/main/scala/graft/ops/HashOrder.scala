package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared sha256 rank-order plumbing for the deterministic selection /
  * shuffle family ([[Mixture]], [[Shuffle]]): the rank key is the
  * lowercase sha256 hex of `key || salt` (equal-length hex compares
  * lexicographically exactly as numerically, and every engine with
  * sha256 reproduces it), and the scale lever is a FIXED equal-width
  * bucket on the hash's leading 16 bits — sha256 is uniform, so buckets
  * balance by construction with deterministic boundaries (no sampling
  * pass, unlike range partitioning).
  */
private[ops] object HashOrder {

  /** Lowercase sha256 hex of key || salt. */
  def hashCol(key: Column, salt: String): Column =
    sha2(concat(key.cast("string"), lit(salt)), 256)

  /** Equal-width bucket in [0, buckets) from the hash's leading 16 bits. */
  def bucketCol(h: Column, buckets: Int): Column = {
    require(buckets >= 1 && buckets <= 65536,
      s"buckets must be in [1, 65536], got $buckets")
    (conv(substring(h, 1, 4), 16, 10).cast("long") * buckets / 65536L)
      .cast("int")
  }
}
