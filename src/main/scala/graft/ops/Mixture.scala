package graft.ops

import org.apache.spark.sql.DataFrame
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
    * domain non-empty, and every computed quota positive (an absent or
    * starved target domain cannot be mixed — fails loudly rather than
    * returning a selection that is not at the target ratio).
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

    val spark = df.sparkSession
    import spark.implicits._

    // shared rank machinery ([[HashOrder.rankByHash]]): hash buckets,
    // one count pass with the key preconditions, per-cell window rank
    val listed = df
      .filter(domain.isin(weights.map(_._1): _*))
      .withColumn("__mix_d", domain)
    val (ranked, counts) = HashOrder.rankByHash(
      listed, keyCol, salt, buckets, groupCol = Some("__mix_d"),
      rankCol = "mix_rank", opName = "mixtureSample")
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
    // a zero quota means the output omits a listed domain entirely —
    // the mixture is degenerate, not merely small; fail loudly like the
    // absent-domain case rather than returning a selection that is not
    // at the target ratio
    quotas.find(_._2 == 0L).foreach { case (d, _) =>
      throw new IllegalArgumentException(
        s"mixtureSample: domain '$d' gets a zero quota — the rarest " +
          s"listed domain is too small to supply even one row per " +
          s"weight unit at this mixture (S=$total of W=$bigW); add data " +
          "or lower the large weights")
    }

    val quotaDf = quotas.toSeq.toDF("__mix_d2", "__quota")
    ranked
      .join(broadcast(quotaDf), col("__mix_d") === col("__mix_d2"))
      .withColumn("selected", col("mix_rank") <= col("__quota"))
      .drop("__mix_d", "__mix_d2", "__quota")
  }
}
