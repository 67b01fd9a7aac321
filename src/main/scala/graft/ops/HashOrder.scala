package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared sha256 rank-order machinery for the deterministic selection /
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

  /** `df` plus `rankCol` — the row's 1-based rank in ascending
    * (sha256(key || salt), key) order, within each `groupCol` value
    * when grouped (the caller guarantees a non-null group) — plus the
    * per-group row counts.
    *
    * The distributed shape every caller shares: bucket on the hash
    * prefix, ONE count pass (groups × buckets rows to the driver,
    * carrying the preconditions: `keyCol` non-null and unique per
    * group — a duplicated key shares its hash and therefore its cell,
    * so per-cell distinct checks see every global duplicate), scanLeft
    * the cells into exclusive offsets, broadcast-join them back, and
    * rank with a per-cell window. No group's rows are ever sorted in
    * one task.
    */
  def rankByHash(
      df: DataFrame,
      keyCol: String,
      salt: String,
      buckets: Int,
      groupCol: Option[String],
      rankCol: String,
      opName: String): (DataFrame, Map[String, Long]) = {
    val key = col(keyCol)
    val spark = df.sparkSession
    import spark.implicits._

    val withHash = df
      .withColumn("__ho_h", hashCol(key, salt))
      .withColumn("__ho_bucket", bucketCol(col("__ho_h"), buckets))

    val groupExprs = groupCol.map(col).toSeq :+ col("__ho_bucket")
    val bIdx = groupCol.size // bucket ordinal in the cell row
    val rawCells = withHash.groupBy(groupExprs: _*)
      .agg(
        count(lit(1)).as("n"),
        count(key).as("n_keys"),
        countDistinct(key).as("n_distinct"))
      .collect()
    // precondition checks BEFORE reading the bucket as an int: a null
    // key hashes to a null bucket, which must report as the null-key
    // violation, not crash the offset scan
    rawCells.foreach { r =>
      val scope = groupCol.fold("")(_ => s" (group ${r.get(0)})")
      require(!r.isNullAt(bIdx) && r.getLong(bIdx + 2) == r.getLong(bIdx + 1),
        s"$opName: $keyCol must be non-null$scope")
      require(r.getLong(bIdx + 3) == r.getLong(bIdx + 2),
        s"$opName: $keyCol must be unique$scope — " +
          s"${r.getLong(bIdx + 2)} keys but ${r.getLong(bIdx + 3)} distinct")
    }
    def groupOf(r: org.apache.spark.sql.Row): String =
      groupCol.fold("")(_ => r.getString(0))
    val counts: Map[String, Long] = rawCells.groupBy(groupOf).map {
      case (g, rs) =>
        g -> rs.map(_.getLong(bIdx + 1))
          .reduce((a: Long, b: Long) => Math.addExact(a, b))
    }
    // per-(group, bucket) exclusive offsets in ascending bucket order
    val offsetRows = rawCells.groupBy(groupOf).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_.getInt(bIdx))
      val offs = sorted.map(_.getLong(bIdx + 1)).scanLeft(0L)(Math.addExact).init
      sorted.zip(offs).map { case (r, o) => (g, r.getInt(bIdx), o) }
    }
    val offsetDf = offsetRows.toDF("__ho_g", "__ho_bucket2", "__ho_offset")

    val partCols = groupCol.map(col).toSeq :+ col("__ho_bucket")
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col("__ho_h").asc, key.asc)
    val joinCond = groupCol.fold(lit(true))(g => col(g) === col("__ho_g")) &&
      col("__ho_bucket") === col("__ho_bucket2")
    val ranked = withHash
      .join(broadcast(offsetDf), joinCond)
      .withColumn(rankCol, col("__ho_offset") + row_number().over(w))
      .drop("__ho_h", "__ho_bucket", "__ho_g", "__ho_bucket2", "__ho_offset")
    (ranked, counts)
  }
}
