package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading (optimization guide §2.5 "input skew"):
  * a small corpus read from one parquet file gives the scan ONE partition,
  * which serializes every downstream per-row kernel (window hashing,
  * shingle/minhash signatures, media codecs) on a single core until the
  * first exchange. Operators whose per-row work far exceeds a row's
  * shuffle cost call [[Parallelize.spread]] right after their source
  * projection: it round-robin repartitions to the cluster's default
  * parallelism ONLY when the input has fewer partitions than that — on a
  * production-scale table (thousands of splits) it is a no-op, so nothing
  * here is tuned to local mode.
  *
  * Only apply where the result is provably partition-invariant (exact
  * joins/distincts, per-row pure functions, canonical-merge sketches) —
  * never upstream of a float reduction whose value depends on merge order.
  */
private[graft] object Parallelize {

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
