package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline;
  *    one scan, no shuffle beyond the final top-k (Spark's takeOrdered-
  *    style ORDER BY + LIMIT is partial-aggregated per partition).
  *  - [[hyperplaneLsh]]: random-hyperplane signatures (sign of dot with
  *    deterministic pseudo-random planes) bucket vectors so the scale
  *    path probes only matching buckets; exact re-rank on candidates.
  *    Multiprobe (flip one bit) keeps recall high at 100 TB without
  *    widening the shuffle.
  */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplanes: component (p, d)
    * derives from mix64 — reproducible across runs and cluster sizes.
    */
  private[ops] def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        // map a 64-bit hash to (-1, 1)
        val h = Hashing.mix64((p.toLong << 32) ^ d.toLong ^ 0x5afe5eedL)
        h.toDouble / Long.MaxValue.toDouble
      }
    }

  /** LSH signature of a vector: one bit per hyperplane (sign of dot). */
  def signatureKernel(vec: Seq[Double], planeArr: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < planeArr.length) {
      var dot = 0.0
      val plane = planeArr(p)
      var d = 0
      val n = math.min(vec.length, plane.length)
      while (d < n) { dot += vec(d) * plane(d); d += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  private def toDoubleArr(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /** Exact cosine top-k against a query vector. Deterministic ordering:
    * (cosine desc, id asc).
    */
  def bruteForceTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val qLit = typedLit(query)
    df.select(
        col(idCol).cast("long").as("id"),
        Dedup.cosine(toDoubleArr(col(vecCol)), qLit).as("cos"))
      .withColumn("cosine", round(col("cos"), 6))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
      .select(col("id"), col("cosine"))
  }

  /** Bucket table: (id, bucket) for `nPlanes`-bit hyperplane signatures.
    * `nPlanes` <= 24 keeps bucket count (2^n) manageable; at larger
    * corpora raise it and add multiprobe.
    */
  def lshBuckets(df: DataFrame, vecCol: String, idCol: String, nPlanes: Int): DataFrame = {
    val dim = df.select(size(col(vecCol))).head.getInt(0)
    val planeArr = planes(nPlanes, dim)
    val sigUdf = udf((v: Seq[Double]) => signatureKernel(v, planeArr))
    df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol),
      sigUdf(toDoubleArr(col(vecCol))).as("bucket"))
  }

  /** ANN top-k via hyperplane LSH with 1-bit multiprobe, exact re-rank on
    * the candidate set. Returns the same schema as [[bruteForceTopK]].
    */
  def lshTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Seq[Double],
      k: Int,
      nPlanes: Int = 12): DataFrame = {
    val dim = query.length
    val planeArr = planes(nPlanes, dim)
    val qSig = signatureKernel(query, planeArr)
    // multiprobe: the query bucket plus all one-bit flips
    val probes = qSig +: (0 until nPlanes).map(b => qSig ^ (1L << b))
    val buckets = lshBuckets(df, vecCol, idCol, nPlanes)
    val qLit = typedLit(query)
    buckets
      .filter(col("bucket").isin(probes: _*))
      .select(col("id"), Dedup.cosine(toDoubleArr(col(vecCol)), qLit).as("cos"))
      .withColumn("cosine", round(col("cos"), 6))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
      .select(col("id"), col("cosine"))
  }

  /** Recall of the ANN result against the exact top-k (evaluation helper). */
  def recallAtK(ann: DataFrame, exact: DataFrame): Double = {
    val a = ann.select("id").collect().map(_.getLong(0)).toSet
    val e = exact.select("id").collect().map(_.getLong(0)).toSet
    if (e.isEmpty) 1.0 else a.intersect(e).size.toDouble / e.size
  }
}
