package graft.job

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Two-phase salted aggregation for skewed per-group sketches (north rule:
  * "explicit repartitioning and salted-key skew mitigation"; SURVEY.md
  * §7.5.3).
  *
  * A per-repo sketch over a source-code corpus is heavily skewed: a
  * monorepo contributes orders of magnitude more rows than the median
  * repo, so a plain `groupBy(repo)` sends one reducer that whole key. The
  * classic fix exploits the sketches' merge algebra: phase 1 aggregates on
  * `(group, salt)` — the hot key fans out over `salts` reducers — and
  * phase 2 merges the per-salt sketches per group. Because every sketch
  * merge here is exactly associative+commutative (OR / register max /
  * cell add), the result is bit-identical to the unsalted plan.
  */
object SaltedAgg {

  /** Salt column: deterministic per row, uniform over [0, salts). Derived
    * from the value hash so replays are stable (no rand()).
    */
  private def saltCol(value: Column, salts: Int): Column =
    pmod(abloom_key_hash(value), lit(salts.toLong)).cast("int")

  /** Per-group Bloom filter with salted skew mitigation:
    * phase 1 `groupBy(group, salt)` partial filters, phase 2 OR-merge per
    * group. Bit-identical to `df.groupBy(group).agg(bloom_agg(key))`.
    */
  def bloomByGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      capacity: Long,
      fpRate: Double,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(col(keyCol), salts))
      .groupBy(col(groupCol), col("__salt"))
      .agg(bloom_agg(col(keyCol), capacity, fpRate).as("partial"))
      .groupBy(col(groupCol))
      .agg(bloom_union_agg(col("partial")).as("filter"))

  /** Per-group HLL distinct sketch with salted skew mitigation. */
  def hllByGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      p: Int = graft.core.Hll.DefaultP,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(col(keyCol), salts))
      .groupBy(col(groupCol), col("__salt"))
      .agg(hll_agg(col(keyCol), p).as("partial"))
      .groupBy(col(groupCol))
      .agg(graft.functions.hll_union_agg(col("partial")).as("sketch"))
}
