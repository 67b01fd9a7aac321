package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for training-data assembly.
  *
  * Documents are laid out on ONE global token stream in ascending `keyCol`
  * order; each document is assigned to the fixed-capacity training bin
  * where its FIRST token lands:
  *
  *   start(d) = sum of tokens of all documents with key < d.key
  *   bin(d)   = floor(start(d) / binTokens)
  *
  * The assignment is a pure function of (key order, token counts,
  * binTokens) — independent of partitioning, parallelism, or cluster
  * size, so a re-run on a reshuffled 100 TB corpus reproduces byte-equal
  * bins (the property sequential packers and seeded samplers lose the
  * moment input splits change).
  *
  * Scale shape — a two-level distributed prefix sum, never a global sort
  * to one task:
  *   1. one t-digest pass picks `buckets` order-compatible, BALANCED key
  *      ranges ([[graft.job.SketchPartition.rangeCuts]]; codegen bucket
  *      column);
  *   2. one aggregation pass computes per-bucket token sums (plus the
  *      key-uniqueness / non-null / non-negative preconditions, riding
  *      the same job) — `buckets` rows to the driver, scanned left into
  *      exclusive bucket offsets;
  *   3. one window pass computes the within-bucket running sum
  *      (partitionBy bucket = parallel across buckets, each bucket's
  *      sort bounded by the t-digest balance guarantee) and adds the
  *      broadcast bucket offset.
  * Three linear scans, one small shuffle per pass; no stage ever sees
  * more than one bucket's rows in one task.
  */
object Packing {

  /** `df` plus `start_offset` (exclusive global token prefix sum in
    * ascending `keyCol` order) and `bin` (= start_offset div binTokens).
    *
    * Preconditions (checked, riding the aggregation pass): `keyCol` is
    * unique and non-null (duplicate keys would make the within-key order
    * — and therefore neighbours' offsets — nondeterministic), `tokenCol`
    * is non-null and >= 0. Long-sum overflow throws (ANSI mode).
    *
    * @param tokenCol  per-document token count (integral)
    * @param keyCol    unique, non-null ordering key (numeric)
    * @param binTokens bin capacity in tokens (> 0)
    * @param buckets   coarse ranges for the distributed prefix sum; only
    *                  affects parallelism, never the assignment
    */
  def packSequences(
      df: DataFrame,
      tokenCol: String,
      keyCol: String,
      binTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive, got $binTokens")
    require(buckets >= 2 && buckets <= 10000,
      s"buckets must be in [2, 10000], got $buckets")
    val key = col(keyCol)
    val toks = col(tokenCol).cast("long")

    // 1. order-compatible balanced ranges (double cast is monotone, so
    // bucket boundaries respect the exact key order even when the cast
    // rounds; rows sharing a rounded value share a bucket)
    val cuts = graft.job.SketchPartition.rangeCuts(df, key.cast("double"), buckets)
    val bucketed = graft.job.SketchPartition
      .withRangeBucket(df, key.cast("double"), cuts, "__pack_bucket")

    // 2. per-bucket totals + preconditions, one job: bucket ranges are
    // disjoint in key, so per-bucket distinct counts check GLOBAL key
    // uniqueness
    val perBucket = bucketed.groupBy(col("__pack_bucket"))
      .agg(
        sum(toks).as("bucket_tokens"),
        count(lit(1)).as("n"),
        count(key).as("n_keys"),
        countDistinct(key).as("n_distinct"),
        sum(when(toks.isNull || toks < 0, 1L).otherwise(0L)).as("n_bad_tokens"))
      .collect()
      .sortBy(_.getInt(0))
    perBucket.foreach { r =>
      // fields: 0 bucket, 1 bucket_tokens, 2 n, 3 n_keys, 4 n_distinct,
      // 5 n_bad_tokens
      require(r.getLong(5) == 0L,
        s"packSequences: $tokenCol must be non-null and >= 0 " +
          s"(${r.getLong(5)} offending rows in bucket ${r.getInt(0)})")
      require(r.getLong(3) == r.getLong(2),
        s"packSequences: $keyCol must be non-null")
      require(r.getLong(4) == r.getLong(3),
        s"packSequences: $keyCol must be unique — bucket ${r.getInt(0)} has " +
          s"${r.getLong(3)} keys but ${r.getLong(4)} distinct values " +
          "(duplicate keys make the packing order nondeterministic)")
    }
    // exclusive bucket offsets (Math.addExact: a corpus whose token total
    // overflows Long must fail loudly, not wrap into negative bins)
    val offsets = perBucket.scanLeft(0L) { (acc, r) =>
      Math.addExact(acc, r.getLong(1))
    }.init
    val offsetRows = perBucket.map(_.getInt(0)).zip(offsets).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsetRows.toDF("__pack_bucket", "__bucket_offset")

    // 3. within-bucket running sum (parallel across buckets) + offset
    val w = Window.partitionBy(col("__pack_bucket")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsetDf), "__pack_bucket")
      .withColumn("start_offset",
        col("__bucket_offset") + sum(toks).over(w) - toks)
      .withColumn("bin", expr(s"start_offset div $binTokens"))
      .drop("__pack_bucket", "__bucket_offset")
  }
}
