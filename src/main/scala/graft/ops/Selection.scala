package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic token-budget corpus selection: "take the best documents
  * until the token budget is spent" — the final assembly step of a
  * training-data pipeline (quality-rank the corpus, then cut at N
  * tokens).
  *
  * Documents are ranked by (`priorityCol` DESC, `keyCol` ASC) — a TOTAL
  * order when keys are unique — and selected greedily in that order
  * while the running token total stays within `budgetTokens`
  * (take-while semantics: the first document that would overflow the
  * budget is cut, and so is everything ranked after it, even if a later
  * small document would still fit — skipping ahead would make the
  * selected set depend on pathological tail shapes instead of a clean
  * rank cut, and the deterministic alternative is expressible as a
  * smaller budget).
  *
  * The selection is a pure function of (priorities, keys, token counts,
  * budget): independent of partitioning, parallelism, and row order, so
  * a re-run on a reshuffled 100 TB corpus reproduces the byte-identical
  * training set.
  *
  * Scale shape — the same two-level distributed prefix sum as
  * [[Packing.packSequences]], never a global sort to one task:
  * t-digest range buckets on the NEGATED priority (monotone proxy for
  * the rank order; priority ties share a bucket so boundaries respect
  * the total order), per-bucket token sums scanned into exclusive
  * offsets on the driver (`buckets` rows), then a within-bucket window
  * running sum. The budget cut is a plain filter on the resulting
  * prefix column — no stage ever sees more than one bucket's rows in a
  * task.
  */
object Selection {

  /** `df` plus `cum_tokens` (INCLUSIVE running token total in
    * (`priorityCol` DESC, `keyCol` ASC) order) and `selected`
    * (= cum_tokens <= budgetTokens).
    *
    * Preconditions (checked, riding the aggregation pass):
    * (`priorityCol`, `keyCol`) pairs unique, both non-null (the rank
    * order must be total — a duplicated pair is genuinely
    * nondeterministic), `tokenCol` non-null and >= 0. Long-sum overflow
    * throws (Math.addExact / ANSI mode).
    *
    * @param tokenCol     per-document token count (integral)
    * @param priorityCol  quality/priority, HIGHER selected first
    *                     (numeric; use an integral or exactly-
    *                     representable score for cross-engine
    *                     reproducibility)
    * @param keyCol       unique, non-null tie-break key (numeric)
    * @param budgetTokens token budget (>= 0)
    * @param buckets      coarse ranges for the distributed prefix sum;
    *                     only affects parallelism, never the selection
    */
  def selectByBudget(
      df: DataFrame,
      tokenCol: String,
      priorityCol: String,
      keyCol: String,
      budgetTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(buckets >= 2 && buckets <= 10000,
      s"buckets must be in [2, 10000], got $buckets")
    val key = col(keyCol)
    val prio = col(priorityCol)
    val toks = col(tokenCol).cast("long")

    // Monotone proxy for (priority DESC): bucket boundaries respect the
    // rank order; priority ties (and double-rounding ties) share a
    // bucket, where the exact window order below resolves them.
    val proxy = negate(prio.cast("double"))
    val cuts = graft.job.SketchPartition.rangeCuts(df, proxy, buckets)
    val bucketed = graft.job.SketchPartition
      .withRangeBucket(df, proxy, cuts, "__sel_bucket")

    // Per-bucket totals + preconditions in ONE job. Buckets are disjoint
    // in the proxy but a key is globally unique iff every bucket's keys
    // are distinct AND no two buckets share a key — the latter is free
    // here because bucket membership is a function of the row's own
    // priority, so duplicate keys with equal priorities land in one
    // bucket (caught by the distinct check) and duplicate keys with
    // different priorities are still a valid total order. Only the
    // same-(priority, key) duplicate is genuinely nondeterministic, and
    // that pair shares a bucket by construction.
    val perBucket = bucketed.groupBy(col("__sel_bucket"))
      .agg(
        sum(toks).as("bucket_tokens"),
        count(lit(1)).as("n"),
        count(key).as("n_keys"),
        count(prio).as("n_prios"),
        countDistinct(prio, key).as("n_distinct"),
        sum(when(toks.isNull || toks < 0, 1L).otherwise(0L)).as("n_bad_tokens"),
        // NaN would bucket as WORST (Spark's NaN ordering) but
        // window-rank FIRST within its bucket — a rank matching no
        // total order, and one that changes with `buckets`
        sum(when(isnan(prio.cast("double")), 1L).otherwise(0L)).as("n_nan_prio"))
      .collect()
      .sortBy(_.getInt(0))
    perBucket.foreach { r =>
      // fields: 0 bucket, 1 bucket_tokens, 2 n, 3 n_keys, 4 n_prios,
      // 5 n_distinct, 6 n_bad_tokens, 7 n_nan_prio
      require(r.getLong(6) == 0L,
        s"selectByBudget: $tokenCol must be non-null and >= 0 " +
          s"(${r.getLong(6)} offending rows in bucket ${r.getInt(0)})")
      require(r.getLong(3) == r.getLong(2),
        s"selectByBudget: $keyCol must be non-null")
      require(r.getLong(4) == r.getLong(2),
        s"selectByBudget: $priorityCol must be non-null")
      require(r.getLong(7) == 0L,
        s"selectByBudget: $priorityCol must not be NaN " +
          s"(${r.getLong(7)} offending rows in bucket ${r.getInt(0)})")
      require(r.getLong(5) == r.getLong(2),
        s"selectByBudget: ($priorityCol, $keyCol) must be unique — bucket " +
          s"${r.getInt(0)} has ${r.getLong(2)} rows but ${r.getLong(5)} " +
          "distinct (priority, key) values (duplicates make the rank " +
          "order nondeterministic)")
    }
    val offsets = perBucket.scanLeft(0L) { (acc, r) =>
      Math.addExact(acc, r.getLong(1))
    }.init
    val offsetRows = perBucket.map(_.getInt(0)).zip(offsets).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsetRows.toDF("__sel_bucket", "__bucket_offset")

    val w = Window.partitionBy(col("__sel_bucket"))
      .orderBy(prio.desc, key.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsetDf), "__sel_bucket")
      .withColumn("cum_tokens", col("__bucket_offset") + sum(toks).over(w))
      .withColumn("selected", col("cum_tokens") <= budgetTokens)
      .drop("__sel_bucket", "__bucket_offset")
  }
}
