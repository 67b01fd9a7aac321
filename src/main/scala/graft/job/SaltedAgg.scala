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

  /** Generic two-phase salted per-group sketch: phase 1 aggregates the
    * given partial on `(group, salt)`, phase 2 merges partials per group
    * with the given union aggregate. Works for ANY of the library's
    * mergeable sketches (their merges are exactly associative +
    * commutative), producing a result bit-identical to the unsalted
    * single-phase plan (for SBF: membership-identical — its stage layout
    * is merge-shape-dependent by design).
    */
  def sketchByGroup(
      df: DataFrame,
      groupCol: String,
      saltKey: Column,
      partialAgg: Column,
      mergeAgg: Column => Column,
      salts: Int = 16,
      outCol: String = "sketch"): DataFrame = {
    // collision-proof internal names (the input may have any schema)
    val sfx = java.util.UUID.randomUUID().toString.take(8)
    val saltName = s"__graft_salt_$sfx"
    val partialName = s"__graft_partial_$sfx"
    df.withColumn(saltName, saltCol(saltKey, salts))
      .groupBy(col(groupCol), col(saltName))
      .agg(partialAgg.as(partialName))
      .groupBy(col(groupCol))
      .agg(mergeAgg(col(partialName)).as(outCol))
  }

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
    sketchByGroup(df, groupCol, col(keyCol),
      bloom_agg(col(keyCol), capacity, fpRate),
      bloom_union_agg, salts, outCol = "filter")

  /** Per-group HLL distinct sketch with salted skew mitigation. */
  def hllByGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      p: Int = graft.core.Hll.DefaultP,
      salts: Int = 16): DataFrame =
    sketchByGroup(df, groupCol, col(keyCol),
      hll_agg(col(keyCol), p),
      graft.functions.hll_union_agg(_), salts)

  /** Per-group counting filter (delete-capable) with salted skew
    * mitigation — bit-identical to the unsalted plan (cell-add merge).
    */
  def cbfByGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weightCol: Column,
      capacity: Long,
      fpRate: Double,
      salts: Int = 16): DataFrame =
    sketchByGroup(df, groupCol, col(keyCol),
      cbf_agg(col(keyCol), weightCol, capacity, fpRate),
      cbf_union_agg, salts, outCol = "filter")
}
