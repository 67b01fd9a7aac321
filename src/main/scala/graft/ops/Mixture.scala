package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic domain-mixture sampling with EXACT per-domain counts —
  * the "mix web/books/code at 6:3:1" assembly step of a training-data
  * pipeline.
  *
  * Given integer target weights w_d, the operator selects the LARGEST
  * total the corpus can supply at that mixture and hits it exactly:
  *
  *   S   = min_d floor(n_d * W / w_d)      (W = sum of weights)
  *   s_d = floor(w_d * S / W)              (selected rows in domain d)
  *
  * and the selected rows of domain d are the s_d FIRST in
  * (sha256(key || salt) ASC, key ASC) order — a uniform sample without
  * replacement that is a pure function of (keys, counts, weights,
  * salt): invariant to row order, partitioning, and cluster size, and
  * reproducible in any engine with sha256 (all-integer rate
  * arithmetic; the hex rank order compares identically everywhere).
  * Unlike rate-based Bernoulli mixing ([[DataSplit.stratifiedSample]])
  * the realized counts are not merely expected — they are exact.
  *
  * Scale shape — no global or per-domain sort to one task:
  *  1. rows bucket by a FIXED equal-width slice of the hash's leading
  *     16 bits (sha256 is uniform, so buckets are balanced by
  *     construction — no sampling pass, deterministic boundaries);
  *  2. one aggregation pass counts (domain, bucket) cells (plus
  *     key-uniqueness/non-null preconditions) — D×B rows to the
  *     driver, scanned into per-domain exclusive offsets and the
  *     exact quotas;
  *  3. one window pass ranks within (domain, bucket) — each task sorts
  *     one cell, ~n/B rows.
  */
object Mixture {

  /** Rows of the LISTED domains plus `mix_rank` (1-based rank in the
    * domain's hash order) and `selected` (rank <= the domain's exact
    * quota). Rows whose domain is not listed are EXCLUDED from the
    * result (they are not part of the mixture).
    *
    * Preconditions (checked, riding the aggregation pass): `keyCol`
    * non-null and unique within each listed domain; every listed
    * domain non-empty (an absent target domain cannot be mixed —
    * fails loudly rather than returning an empty selection).
    *
    * @param weights  (domain value, positive integer target weight) —
    *                 e.g. Seq("web" -> 6L, "books" -> 3L, "code" -> 1L)
    * @param salt     re-rolls the per-domain sample without touching data
    * @param buckets  hash-range cells per domain (parallelism only,
    *                 never the selection)
    */
  def mixtureSample(
      df: DataFrame,
      domainCol: String,
      keyCol: String,
      weights: Seq[(String, Long)],
      salt: String = "",
      buckets: Int = 64): DataFrame = {
    require(weights.nonEmpty, "at least one domain weight required")
    require(weights.forall(_._2 > 0L), "weights must be positive")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate domain in weights")
    val bigW = weights.map(_._2).reduce((a: Long, b: Long) => Math.addExact(a, b))
    // string-compare the domain (weights are string-keyed); NULL
    // domains fail the isin filter and are excluded like unlisted ones
    val domain = col(domainCol).cast("string")
    val key = col(keyCol)

    val spark = df.sparkSession
    import spark.implicits._

    // hash rank + fixed equal-width bucket on the leading 16 bits
    val listed = df
      .filter(domain.isin(weights.map(_._1): _*))
      .withColumn("__mix_h", HashOrder.hashCol(key, salt))
      .withColumn("__mix_bucket", HashOrder.bucketCol(col("__mix_h"), buckets))

    // one pass: per-cell counts + preconditions. A duplicated
    // (domain, key) shares its hash and therefore its cell, so
    // per-cell distinct checks see every global duplicate.
    val cells = listed.groupBy(domain.as("__d"), col("__mix_bucket"))
      .agg(
        count(lit(1)).as("n"),
        count(key).as("n_keys"),
        countDistinct(key).as("n_distinct"))
      .collect()
    cells.foreach { r =>
      require(r.getLong(3) == r.getLong(2),
        s"mixtureSample: $keyCol must be non-null (domain ${r.get(0)})")
      require(r.getLong(4) == r.getLong(3),
        s"mixtureSample: $keyCol must be unique within domain ${r.get(0)} " +
          s"(${r.getLong(3)} keys, ${r.getLong(4)} distinct)")
    }
    val perDomain = cells.groupBy(_.getString(0))
    val counts: Map[String, Long] = perDomain.map { case (d, rs) =>
      d -> rs.map(_.getLong(2)).reduce((a: Long, b: Long) => Math.addExact(a, b))
    }
    weights.foreach { case (d, _) =>
      require(counts.getOrElse(d, 0L) > 0L,
        s"mixtureSample: listed domain '$d' has no rows — the target " +
          "mixture is unsatisfiable")
    }
    // largest total the corpus supplies at the target mixture, then the
    // exact per-domain quotas — all-integer arithmetic
    val total = weights.map { case (d, w) =>
      Math.multiplyExact(counts(d), bigW) / w
    }.min
    val quotas: Map[String, Long] = weights.map { case (d, w) =>
      d -> Math.multiplyExact(w, total) / bigW
    }.toMap

    // per-(domain, bucket) exclusive offsets in ascending bucket order
    val offsetRows = perDomain.toSeq.flatMap { case (d, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      val offs = sorted.map(_.getLong(2)).scanLeft(0L)(Math.addExact).init
      sorted.zip(offs).map { case (r, o) => (d, r.getInt(1), o, quotas(d)) }
    }
    val offsetDf = offsetRows
      .toDF("__d", "__mix_bucket", "__cell_offset", "__quota")

    val w = Window.partitionBy(domain, col("__mix_bucket"))
      .orderBy(col("__mix_h").asc, key.asc)
    listed
      .join(broadcast(offsetDf),
        domain === col("__d") && listed("__mix_bucket") === offsetDf("__mix_bucket"))
      .drop(offsetDf("__mix_bucket")).drop("__d")
      .withColumn("mix_rank", col("__cell_offset") + row_number().over(w))
      .withColumn("selected", col("mix_rank") <= col("__quota"))
      .drop("__mix_h", "__mix_bucket", "__cell_offset", "__quota")
  }
}
