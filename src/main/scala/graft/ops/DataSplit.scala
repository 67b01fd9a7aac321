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
}
