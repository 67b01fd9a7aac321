package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash dataset splitting — the reproducible
  * train/validation/test assignment every training-data pipeline needs.
  *
  * A row's split is a pure function of its KEY (plus an optional salt),
  * not of row order, partitioning, or cluster size: re-running on a
  * reshuffled, rescaled, or incrementally-grown corpus assigns every
  * surviving key the same label, and changing the salt re-rolls the
  * assignment without touching the data. This is the property
  * `randomSplit` (seeded per-partition RNG) cannot give you at 100 TB,
  * where input splits change between runs.
  *
  * Mechanism: `u = sha2(key || salt)` (lowercase hex). Because equal-length
  * hex strings compare lexicographically exactly as their numeric values,
  * a cumulative fraction f maps to the 64-char threshold string
  * `hex15(floor(f * 16^15)) || "0"*49`, and the label is a CASE chain of
  * string comparisons — all built-in codegen expressions (sha2, concat,
  * CASE), no UDF, and byte-for-byte reproducible in ANY engine with
  * sha256 (the DuckDB oracle recomputes the identical assignment).
  *
  * Quantization error of a boundary is < 16^-15 = 2^-60 — at 10^12 rows,
  * the expected count next to a boundary is off by << 1 row.
  */
object DataSplit {

  /** 15 hex digits of floor(f * 16^15), zero-padded to 64 for
    * lexicographic-equals-numeric comparison against sha256 hex.
    */
  private[graft] def hexThreshold(cum: Double): String = {
    require(cum >= 0.0 && cum < 1.0, s"internal: cumulative fraction $cum")
    f"${(cum * math.pow(16, 15)).toLong}%015x" + "0" * 49
  }

  /** The split-label column for `key`: labels assigned in order by
    * cumulative fraction. Fractions must sum to 1 (within 1e-9). NULL
    * keys get a NULL split (they are in no split; `select` drops them).
    */
  def splitColumn(
      key: Column,
      fractions: Seq[(String, Double)],
      salt: String = ""): Column = {
    require(fractions.nonEmpty, "at least one split required")
    require(fractions.forall(_._2 > 0.0), "fractions must be positive")
    require(fractions.map(_._1).distinct.size == fractions.size, "duplicate split labels")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    // every interior boundary must be a real boundary: a tail fraction
    // below the 1e-9 sum tolerance would push a cumulative to 1.0 and
    // silently merge the last two splits
    require(cums.init.forall(_ < 1.0),
      s"interior cumulative fraction reached 1.0 — tail fraction too small: $fractions")
    val u = sha2(concat(key.cast("string"), lit(salt)), 256)
    // last label is the unconditioned otherwise — no 16^15 overflow at 1.0
    val cases = fractions.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), cum)) =>
        val cond = u < lit(hexThreshold(cum))
        Some(acc.fold(when(cond, lit(label)))(_.when(cond, lit(label))))
    }
    val labeled = cases.fold(lit(fractions.head._1))(_.otherwise(lit(fractions.last._1)))
    // NULL keys propagate to a NULL split (never silently land in the
    // last split via three-valued CASE fall-through)
    when(key.isNull, lit(null)).otherwise(labeled)
  }

  /** `df` plus a `split` column; deterministic in (key, salt) only. */
  def assign(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      salt: String = ""): DataFrame =
    df.withColumn("split", splitColumn(col(keyCol), fractions, salt))

  /** The named split only — the one-call train/test reader. */
  def select(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      label: String,
      salt: String = ""): DataFrame = {
    require(fractions.exists(_._1 == label), s"unknown split label $label")
    assign(df, keyCol, fractions, salt).filter(col("split") === label).drop("split")
  }

  /** The deterministic keep/drop decision for Bernoulli sampling at
    * `rate`: true iff `sha2(key || salt) < hexThreshold(rate)`. Pure
    * function of (key, salt, rate) — same properties as [[splitColumn]]:
    * partition/order/cluster-size invariant, reproducible in any engine
    * with sha256, and MONOTONE in rate (raising the rate only ADDS rows
    * to the sample; the rows kept at 1% are exactly the first ones kept
    * at 10%), so nested samples of the same keyspace are free. NULL keys
    * are never sampled.
    */
  def sampleColumn(key: Column, rate: Double, salt: String = ""): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0, 1], got $rate")
    if (rate == 0.0) lit(false)
    else if (rate == 1.0) key.isNotNull
    else sha2(concat(key.cast("string"), lit(salt)), 256) < lit(hexThreshold(rate))
  }

  /** Deterministic STRATIFIED sampling: each row keeps/drops by
    * [[sampleColumn]] at its stratum's rate — the downsample-the-spam,
    * keep-all-the-rare-class primitive of training-data curation, with
    * none of `sampleBy`'s seeded-RNG fragility (re-runs on reshuffled or
    * grown 100 TB inputs keep the same rows, and per-row work is one
    * codegen'd sha256: no shuffle, no per-stratum pass).
    *
    * @param rates stratum value -> rate in [0, 1]
    * @param defaultRate rate for stratum values not in `rates` (and for
    *        NULL strata); default 1.0 = keep unknown strata whole
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = ""): DataFrame = {
    require(rates.nonEmpty, "at least one stratum rate required")
    val keep = rates.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (stratum, rate)) =>
        val cond = col(strataCol) === lit(stratum)
        val take = sampleColumn(col(keyCol), rate, salt)
        Some(acc.fold(when(cond, take))(_.when(cond, take)))
    }.get.otherwise(sampleColumn(col(keyCol), defaultRate, salt))
    df.filter(keep)
  }
}
