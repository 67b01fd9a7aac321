package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.core.Hashing

/** Deduplication operators for training-data pipelines, each a standard
  * technique re-expressed Spark-first:
  *
  *  - [[exact]]: hash-groupBy on content digest (one shuffle, map-side
  *    partial aggregation).
  *  - [[minhashPairs]]: shingle -> MinHash signature -> LSH banding ->
  *    bucket join -> exact-Jaccard verification. Documents are reduced to
  *    SORTED DISTINCT 64-bit shingle hashes in one kernel pass — no string
  *    arrays ever materialize in Tungsten rows, and exact verification is
  *    an O(m+n) sorted-merge over longs. Candidate generation shuffles
  *    only (band, band_hash, doc_id) triples — never document content.
  *  - [[simhashPairs]]: 64-bit SimHash, near-dup via chunk banding
  *    (Hamming distance <= 3 guarantees one of four 16-bit chunks equal),
  *    Hamming verification on candidates.
  *  - [[embeddingPairs]]: cosine near-duplicates over an embedding column
  *    via multi-table hyperplane LSH + exact cosine re-rank (never
  *    all-pairs); [[embeddingPairsExact]] is the row-count-guarded exact
  *    baseline.
  *
  * Scale notes (100 TB): all-pairs never materializes — LSH/banding keeps
  * the join keyed on bucket hashes; pathological buckets (boilerplate
  * shingles, zero vectors) are capped with `maxBucket` to bound skew.
  * Pass a `droppedBuckets` accumulator to observe how many buckets the
  * cap discarded (at-least-once semantics, like all Spark accumulators
  * updated in transformations); without one the cap applies silently.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct text digest. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("digest"))
      .agg(
        min(col(idCol)).as("representative_id"),
        count(lit(1)).as("copies"))

  /** Word n-gram shingles (lowercased, whitespace-tokenized) as an array
    * column — built-in higher-order functions, no UDF. Kept for
    * composability; the dedup hot path uses [[shingleHashKernel]], which
    * hashes the same shingles without materializing them.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Regex-\s whitespace (Java/Spark `\s` class: space, tab, LF, VT, FF,
    * CR) — matches both [[shingles]]' `split(\\s+)` and the DuckDB oracle.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Sorted DISTINCT XXH64 hashes of the word n-gram shingle set of
    * `text` — the document's entire dedup footprint in 8 bytes/shingle.
    * Semantics identical to hashing [[shingles]] output: lowercase, trim,
    * split on `\s+`, n-token windows joined by one space; texts shorter
    * than n tokens collapse to a single whole-text shingle.
    */
  def shingleHashKernel(text: String, n: Int): Array[Long] = {
    val t = text.trim.toLowerCase
    // tokenize in place (no regex)
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = t.length
    while (i < len) {
      while (i < len && isWs(t.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(t.charAt(i))) i += 1
      if (i > start) toks += t.substring(start, i)
    }
    val m = toks.length
    val sb = new java.lang.StringBuilder(64)
    val out =
      if (m < n) {
        // split("\\s+") of an empty string yields [""] -> one "" shingle
        var j = 0
        while (j < m) { if (j > 0) sb.append(' '); sb.append(toks(j)); j += 1 }
        Array(Hashing.hashString(sb.toString))
      } else {
        val hs = new Array[Long](m - n + 1)
        var w = 0
        while (w <= m - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(w + j))
            j += 1
          }
          hs(w) = Hashing.hashString(sb.toString)
          w += 1
        }
        hs
      }
    java.util.Arrays.sort(out)
    // dedupe in place (sorted)
    var r = 0
    var wp = 0
    while (r < out.length) {
      if (wp == 0 || out(r) != out(wp - 1)) { out(wp) = out(r); wp += 1 }
      r += 1
    }
    if (wp == out.length) out else java.util.Arrays.copyOf(out, wp)
  }

  /** XXH64 of every sliding `w`-CODE-POINT character window, one hash
    * per start position (index i = window starting at code point i).
    * Windows are slices of the UTF-8 byte encoding between code-point
    * boundaries, so equal substrings hash equally regardless of where
    * they sit — the candidate generator for [[duplicateSpans]]. Code
    * points (not UTF-16 units) so positions line up with SQL `substring`
    * semantics in Spark AND DuckDB. Returns empty for docs shorter than
    * `w` code points.
    */
  def windowHashKernel(text: String, w: Int): Array[Long] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val nCp = text.codePointCount(0, text.length)
    if (nCp < w) return Array.emptyLongArray
    // byte offset of each code-point start (plus the end sentinel),
    // derived from the bytes directly (ASCII fast path: 1:1)
    val off = new Array[Int](nCp + 1)
    if (bytes.length == nCp) {
      var j = 0
      while (j <= nCp) { off(j) = j; j += 1 }
    } else {
      var b = 0
      var c = 0
      while (b < bytes.length) {
        // count only lead bytes (not 10xxxxxx continuations)
        if ((bytes(b) & 0xC0) != 0x80) { off(c) = b; c += 1 }
        b += 1
      }
      off(nCp) = bytes.length
    }
    val out = new Array[Long](nCp - w + 1)
    var p = 0
    while (p <= nCp - w) {
      out(p) = Hashing.xxh64(bytes, off(p), off(p + w) - off(p), 0L)
      p += 1
    }
    out
  }

  /** Remove every code point covered by the union of the `w`-code-point
    * windows starting at `positions` (0-based code-point indices, any
    * order, duplicates allowed). Out-of-range positions throw — a mask
    * position that cannot have come from [[windowHashKernel]] means
    * corrupted plumbing, never data to silently tolerate.
    */
  def maskSpansKernel(text: String, positions: Array[Int], w: Int): String = {
    if (positions.isEmpty) return text
    val cps = text.codePoints.toArray
    val n = cps.length
    val keep = Array.fill(n)(true)
    var pi = 0
    while (pi < positions.length) {
      val p = positions(pi)
      require(p >= 0 && p + w <= n,
        s"mask position $p out of range for $n code points (window $w)")
      var i = p
      while (i < p + w) { keep(i) = false; i += 1 }
      pi += 1
    }
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < n) { if (keep(i)) sb.appendCodePoint(cps(i)); i += 1 }
    sb.toString
  }

  /** MinHash signature from a document's shingle-hash set, using the
    * Kirsch-Mitzenmacher construction (h1 + j*h2) — O(|set| + k) hash work
    * per doc instead of O(|set| * k) independent hashes.
    */
  def minhashKernel(shingleHashes: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < shingleHashes.length) {
      val h1 = shingleHashes(s)
      val h2 = Hashing.mix64(h1) | 1L
      var j = 0
      var h = h1
      while (j < k) {
        if (h < sig(j)) sig(j) = h
        h += h2
        j += 1
      }
      s += 1
    }
    sig
  }

  /** Exact Jaccard of two sorted distinct long arrays: O(m+n) merge. */
  def jaccardSortedKernel(a: Seq[Long], b: Seq[Long]): Double = {
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Intersection size of two sorted distinct long arrays: O(m+n). */
  def intersectCountKernel(a: Seq[Long], b: Seq[Long]): Long = {
    var i = 0
    var j = 0
    var inter = 0L
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Bucket-size filter: keeps [2, maxBucket], counting capped buckets in
    * the optional accumulator so the skew cap is observable, not silent.
    */
  private def bucketFilter(
      sizeCol: Column,
      maxBucket: Int,
      dropped: Option[LongAccumulator]): Column =
    dropped match {
      case None => sizeCol.between(2, maxBucket)
      case Some(acc) =>
        val keep = udf((sz: Int) => {
          if (sz > maxBucket) acc.add(1L)
          sz >= 2 && sz <= maxBucket
        })
        keep(sizeCol)
    }

  /** Candidate near-duplicate pairs by MinHash + LSH banding, verified
    * with exact Jaccard over the (hashed) shingle sets. Returns
    * (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    * 64-bit shingle hashing makes the Jaccard exact up to a ~2^-64
    * per-pair collision probability.
    *
    * @param droppedBuckets optional accumulator incremented once per LSH
    *        bucket discarded for exceeding `maxBucket` (skew cap). Read it
    *        only after an action on the result.
    * @param verifyOnlyCandidates Some(true)/Some(false) force the verify
    *        mode; None (the default) picks it with a COST HEURISTIC.
    *        Pruned mode semi-joins the corpus to the candidate-id set
    *        first, so the verify shingle pass and hash-array shuffle
    *        cover ONLY candidate documents — the 100 TB-friendly shape
    *        at low duplicate rates, where the verify side shrinks from
    *        the corpus to the candidates; at high duplicate rates the
    *        semi-join is pure overhead. AUTO persists and counts the
    *        (small, bucket-capped) candidate-pair table, then prunes iff
    *        the candidate-id upper bound (2 x pairs) is under half the
    *        corpus row count — note auto therefore runs the LSH stage
    *        eagerly at call time. The persisted pair table is released
    *        by Spark's cache eviction; long-lived sessions processing
    *        many corpora can `spark.catalog.clearCache()`.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      k: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8,
      maxBucket: Int = 1000,
      droppedBuckets: Option[LongAccumulator] = None,
      verifyOnlyCandidates: Option[Boolean] = None): DataFrame =
    minhashPairsWithMode(df, textCol, idCol, shingleN, k, bands, threshold,
      maxBucket, droppedBuckets, verifyOnlyCandidates)._1

  /** [[minhashPairs]] plus the resolved verify mode (true = candidate-
    * pruned verify) — exposed for tests of the auto heuristic.
    */
  private[ops] def minhashPairsWithMode(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      k: Int,
      bands: Int,
      threshold: Double,
      maxBucket: Int,
      droppedBuckets: Option[LongAccumulator],
      verifyOnlyCandidates: Option[Boolean]): (DataFrame, Boolean) = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands

    val base = df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))

    // signature -> banding -> bucket -> pair extraction, parameterized on
    // the source so auto mode can run it over an OBSERVED base (corpus
    // row count rides the signature pass — no second corpus scan)
    def candidatePipeline(src: DataFrame): DataFrame = {
      val withSig = src.select(col("id"),
        graft.functions.minhash_signature(
          graft.functions.shingle_hashes(col("t"), shingleN), k).as("sig"))

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
        .filter(bucketFilter(size(col("ids")), maxBucket, droppedBuckets))

      buckets.select(explode(expr(
        """filter(
          |  flatten(transform(ids, (a, i) ->
          |    transform(slice(ids, i + 2, size(ids)), b ->
          |      struct(least(a, b) AS id_a, greatest(a, b) AS id_b)))),
          |  p -> p.id_a <> p.id_b)""".stripMargin)).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .dropDuplicates("id_a", "id_b")
    }
    // when the verify side is candidate-pruned, the pair table is
    // consumed twice (candidate-id set + verify join) — persist it
    // (small, bounded by the bucket cap; lineage kept so lost blocks
    // recompute safely) or the whole LSH pipeline would re-run
    def persisted(cands: DataFrame) =
      cands.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (candidates, pruneVerify) = verifyOnlyCandidates match {
      case Some(false) => (candidatePipeline(base), false)
      case Some(true) => (persisted(candidatePipeline(base)), true)
      case None =>
        // auto: candidate ids <= 2 x pairs; prune when that bound sits
        // under half the corpus — the regime where the pruned shingle
        // pass + shuffle beat a corpus-wide one. Counting the persisted
        // pair table runs the LSH stage once, eagerly; the corpus row
        // count rides that SAME job via observe/CollectMetrics (exactly-
        // once, codegen-preserving — not a ScalaUDF accumulator, and no
        // extra corpus scan). The observed node sits only on the
        // candidate side, so the verify query (which reads base through
        // an unobserved plan) never duplicates the metric name. When
        // pruning, both later consumers hit the cache. When NOT pruning
        // the result has a single consumer — release the cache
        // immediately (lazily; the one consumption recomputes through
        // the normal lineage) so repeated auto calls do not accumulate
        // session-lifetime cache entries.
        val obs = new org.apache.spark.sql.Observation()
        val cands = persisted(candidatePipeline(
          base.observe(obs, count(lit(1)).as("rows"))))
        val nPairs = cands.count()
        // GOTCHA: when the candidate set is EMPTY (e.g. every bucket hit
        // the maxBucket cap), AQE's runtime empty-relation propagation
        // can replace the executed subtree — CollectMetrics node
        // included — with an empty LocalTableScan, and Spark then
        // completes the observation with an EMPTY row (ObservationManager
        // .tryComplete reports Row.empty when the logical plan has the
        // node but the executed plan lost it). With zero pairs the prune
        // decision is moot (both verify modes return the empty result),
        // so take the pruned path (semi-join against an empty id set)
        // without touching the metric. For nPairs > 0 the observed stage
        // provably produced rows, so the metric is present; the
        // base.count() fallback is belt-and-braces, not a planned job.
        val prune =
          if (nPairs == 0L) true
          else {
            val corpusRows = obs.get.get("rows").map(_.asInstanceOf[Long])
              .getOrElse(base.count())
            2 * nPairs < corpusRows / 2
          }
        if (!prune) cands.unpersist(blocking = false)
        (cands, prune)
    }

    // exact Jaccard verification: join the candidate-pair set back to the
    // hashed-shingle table — document content never rides the LSH
    // shuffle, and the verify join ships 8 bytes per distinct shingle.
    // With a pruned verify the shingle pass and the hash-array shuffle
    // cover only candidate documents (semi-join first).
    val verifyBase =
      if (pruneVerify) {
        val candIds = candidates.select(col("id_a").as("id"))
          .union(candidates.select(col("id_b").as("id")))
          .distinct()
        base.join(candIds, Seq("id"), "left_semi")
      } else base
    val withHashes = verifyBase
      .select(col("id"), graft.functions.shingle_hashes(col("t"), shingleN).as("hs"))
    val shA = withHashes.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val shB = withHashes.select(col("id").as("id_b"), col("hs").as("hs_b"))
    (candidates.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard",
        graft.functions.jaccard_sorted(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard")),
      pruneVerify)
  }

  /** EXACT n-gram Jaccard similarity join via prefix filtering (the
    * AllPairs/PPJoin family: Bayardo, Ma, Srikant WWW'07; Xiao et al.
    * WWW'08) — returns EVERY pair with Jaccard(shingles(a), shingles(b))
    * >= threshold, with guaranteed 100% recall. This is the exact
    * counterpart of [[minhashPairs]] (whose LSH banding is probabilistic
    * and can miss borderline pairs): same shingle semantics, same output
    * shape, no false negatives.
    *
    * Algorithm: tokens (64-bit shingle hashes) are globally ordered by
    * (document frequency asc, hash asc). A pair with Jaccard >= t must
    * share at least `ceil(t * |x|)` tokens with each member x, so the
    * first `|x| - ceil(t * |x|) + 1` tokens of each document under the
    * global order (its PREFIX) must intersect the other's prefix —
    * candidates are found by an equi-join on prefix tokens only, then
    * verified with exact Jaccard over the full sorted hash arrays.
    *
    * Scale shape (100 TB): never all-pairs. The prefix join shuffles only
    * (token, id, size) triples for ~(1-t) of each document's tokens, and
    * rarest-first ordering makes prefix tokens the globally rarest —
    * join buckets stay tiny and skew-free even when the corpus shares
    * boilerplate shingles (the classic AllPairs ordering doubles as skew
    * mitigation). The df computation and the window rank are both linear
    * one-shuffle passes. Verification ships 8 bytes per distinct shingle
    * of candidate documents only.
    *
    * Floating-point hygiene: the prefix length and size filter use a
    * 1e-9-slack ceil/compare so IEEE rounding of `t * size` can only
    * LENGTHEN a prefix (extra candidates, never a missed pair).
    *
    * @param persistShingleTable cache the (id, size, hashes) projection
    *        (consumed by both the prefix pass and the two verify joins).
    *        Default true; pass false at corpus scales where caching a
    *        corpus-sized table is worse than recomputing shingles per
    *        consumer. CACHE LIFETIME: the persisted table lives until
    *        Spark's cache eviction (or `spark.catalog.clearCache()`) —
    *        long-lived sessions processing many corpora should use
    *        [[jaccardPairsReleasable]] and call the release handle after
    *        consuming the pairs ([[dedupJaccard]] does this internally).
    */
  def jaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      persistShingleTable: Boolean = true): DataFrame =
    jaccardPairsWithHandle(df, textCol, idCol, shingleN, threshold,
      persistShingleTable)._1

  /** [[jaccardPairs]] plus a release handle that unpersists the
    * corpus-sized shingle cache — call it after the LAST action on the
    * returned pairs (a no-op when `persistShingleTable` is false).
    */
  def jaccardPairsReleasable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      persistShingleTable: Boolean = true): (DataFrame, () => Unit) = {
    val (pairs, handle) = jaccardPairsWithHandle(
      df, textCol, idCol, shingleN, threshold, persistShingleTable)
    (pairs, () => handle.foreach(_.unpersist(blocking = false)))
  }

  /** (id, hs, sz) shingle projection — the shared input shape of every
    * prefix-filter join ([[jaccardPairs]], [[dedupAgainst]],
    * [[contamination]]).
    */
  private def shingleTable(
      df: DataFrame, textCol: String, idCol: String, shingleN: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      graft.functions.shingle_hashes(col(textCol), shingleN).as("hs"))
      .withColumn("sz", size(col("hs")))

  /** Prefix length `|x| - ceil(t*|x|) + 1` with 1e-9-slack ceil — IEEE
    * rounding can only LENGTHEN a prefix (extra candidates, never a
    * missed pair). Shared so the slack constant cannot drift between the
    * prefix-filter operators.
    */
  private def prefixLen(sz: Column, threshold: Double): Column =
    sz - ceil(sz * threshold - lit(1e-9)) + 1

  /** Keep each document's token prefix: rank tokens within
    * `partitionCols` by the global order (df asc, tok asc) and filter to
    * [[prefixLen]]. Input needs columns (partitionCols..., sz, tok, df).
    */
  private def prefixFilter(
      ranked: DataFrame, partitionCols: Seq[String], threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGlobalOrder = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("df"), col("tok"))
    ranked.withColumn("rn", row_number().over(byGlobalOrder))
      .filter(col("rn") <= prefixLen(col("sz"), threshold))
  }

  /** [[jaccardPairs]] plus the persisted shingle-table handle (None when
    * not persisted) so one-call compositions can release the
    * corpus-sized cache once the pairs are consumed.
    */
  private[ops] def jaccardPairsWithHandle(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      threshold: Double,
      persistShingleTable: Boolean): (DataFrame, Option[DataFrame]) = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")

    val docs0 = shingleTable(df, textCol, idCol, shingleN)
    val docs =
      if (persistShingleTable)
        docs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else docs0

    val toks = docs.select(col("id"), col("sz"), explode(col("hs")).as("tok"))
    // global token order: rarest first. Any total order is CORRECT for
    // prefix filtering; rarest-first minimizes candidate fan-out.
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = toks.join(dfreq, "tok")
    val prefix = prefixFilter(ranked, Seq("id"), threshold)
      .select(col("tok"), col("id"), col("sz"))

    // candidate pairs: prefixes sharing a token, pre-pruned by the size
    // bound min >= t * max (J >= t forces |A intersect B| >= t*max(|A|,|B|)).
    // Distinct column names on the two sides — a raw self-join on `tok`
    // resolves both legs to the SAME attribute (Spark's trivially-true-
    // predicate trap) and silently degenerates to a cross join that only
    // the verify step would rescue.
    val a = prefix.select(col("tok").as("tok_a"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("tok").as("tok_b"), col("id").as("id_b"), col("sz").as("sz_b"))
    val candidates = a.join(b,
        col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
          least(col("sz_a"), col("sz_b")).cast("double") >=
            greatest(col("sz_a"), col("sz_b")) * threshold - lit(1e-9))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // exact verification over full sorted hash arrays
    val shA = docs.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val shB = docs.select(col("id").as("id_b"), col("hs").as("hs_b"))
    (candidates.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard",
        graft.functions.jaccard_sorted(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard")),
      if (persistShingleTable) Some(docs) else None)
  }

  /** The (tok, df) token document-frequency table of a corpus — the
    * PIPELINE STATE consumed by [[dedupAgainst]]'s stored-df mode.
    * Persist this once per corpus (it is tiny next to the corpus: one
    * row per distinct shingle hash) and maintain it across appends with
    * [[updateTokenDf]] instead of re-scanning the corpus per batch.
    */
  def corpusTokenDf(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3): DataFrame =
    shingleTable(corpus, textCol, idCol, shingleN)
      .select(explode(col("hs")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))

  /** Update rule for the stored token-df state after a batch is APPENDED
    * to the corpus: `df'(tok) = df(tok) + count of tok in the batch`.
    * Equals [[corpusTokenDf]] over corpus ∪ batch exactly (union +
    * re-sum, one shuffle — no outer join needed).
    */
  def updateTokenDf(
      stored: DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3): DataFrame = {
    requireTokenDfSchema(stored, "updateTokenDf")
    stored.select(col("tok"), col("df"))
      .unionByName(corpusTokenDf(batch, textCol, idCol, shingleN))
      .groupBy("tok").agg(sum(col("df")).as("df"))
  }

  private def requireTokenDfSchema(stored: DataFrame, fn: String): Unit =
    require(stored.columns.contains("tok") && stored.columns.contains("df"),
      s"$fn: stored token-df state must have columns (tok, df), " +
        s"got ${stored.columns.mkString("(", ", ", ")")} — build it with " +
        "corpusTokenDf and maintain it with updateTokenDf")

  /** INCREMENTAL exact-Jaccard dedup: the rows of `newDf` that have NO
    * near-duplicate (n-gram Jaccard >= threshold) in `corpus` — the
    * daily-increment shape of a training-data pipeline, where each new
    * batch is deduplicated against the already-ingested corpus without
    * ever re-deduplicating the corpus against itself.
    *
    * Same prefix-filtering machinery as [[jaccardPairs]] with one
    * asymmetry: document frequencies come from the UNION of both sides
    * (any consistent global token order is correct; corpus statistics
    * dominate), but the candidate equi-join is new-prefix x
    * corpus-prefix ONLY — no corpus x corpus work, so each increment
    * costs O(|new| x avg-bucket) rather than re-touching the corpus
    * quadratically. Guaranteed recall: every new row with a qualifying
    * corpus match is dropped; within-batch duplicates are NOT collapsed
    * here (compose with [[dedupJaccard]] on the survivors for that).
    *
    * DF AS PIPELINE STATE: pass `tokenDfState = Some(stored)` (built by
    * [[corpusTokenDf]], maintained by [[updateTokenDf]]) and the global
    * token order comes from the stored (tok, df) table instead of a
    * fresh df aggregation over corpus ∪ batch — one fewer corpus-wide
    * shuffle per increment. Tokens absent from the state rank df = 0
    * (rarest-first), a consistent total order. STALENESS SEMANTICS:
    * prefix filtering is recall-correct under ANY consistent total token
    * order and survivors are decided by the EXACT Jaccard verify, so a
    * stale state can never change the result set — only the candidate
    * fan-out (a very stale state degrades toward more candidates, i.e.
    * slower, never wrong). Refresh cadence is therefore purely a
    * performance knob.
    *
    * PRECONDITION: `idCol` must be unique within each side — a
    * duplicated id merges two documents under one window partition and
    * breaks the prefix-length accounting (recall guarantee holds for
    * unique ids only).
    */
  def dedupAgainst(
      newDf: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      tokenDfState: Option[DataFrame] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    tokenDfState.foreach(requireTokenDfSchema(_, "dedupAgainst"))

    // no persist: each side's shingle pass runs twice (prefix + verify) —
    // recomputation is the right default at corpus scale, and the verify
    // side only touches candidate rows anyway
    val newDocs = shingleTable(newDf, textCol, idCol, shingleN)
    val corpusDocs = shingleTable(corpus, textCol, idCol, shingleN)

    def toks(docs: DataFrame) =
      docs.select(col("id"), col("sz"), explode(col("hs")).as("tok"))
    val allToks = toks(newDocs).withColumn("side", lit("n"))
      .unionByName(toks(corpusDocs).withColumn("side", lit("c")))
    val ranked = tokenDfState match {
      case Some(stored) =>
        // left join: state-absent tokens (new in this batch, or state
        // built before them) rank df = 0 — still one consistent order
        allToks.join(stored.select(col("tok"), col("df")), Seq("tok"), "left")
          .withColumn("df", coalesce(col("df"), lit(0L)))
      case None =>
        val dfreq = allToks.groupBy("tok").agg(count(lit(1)).as("df"))
        allToks.join(dfreq, "tok")
    }
    val prefix = prefixFilter(ranked, Seq("side", "id"), threshold)
      .select(col("side"), col("tok"), col("id"), col("sz"))

    val a = prefix.filter(col("side") === "n")
      .select(col("tok").as("tok_a"), col("id").as("id_n"), col("sz").as("sz_n"))
    val b = prefix.filter(col("side") === "c")
      .select(col("tok").as("tok_b"), col("id").as("id_c"), col("sz").as("sz_c"))
    val candidates = a.join(b,
        col("tok_a") === col("tok_b") &&
          least(col("sz_n"), col("sz_c")).cast("double") >=
            greatest(col("sz_n"), col("sz_c")) * threshold - lit(1e-9))
      .select(col("id_n"), col("id_c"))
      .dropDuplicates("id_n", "id_c")

    val dupNewIds = candidates
      .join(newDocs.select(col("id").as("id_n"), col("hs").as("hs_n")), "id_n")
      .join(corpusDocs.select(col("id").as("id_c"), col("hs").as("hs_c")), "id_c")
      .filter(graft.functions.jaccard_sorted(col("hs_n"), col("hs_c")) >= threshold)
      .select(col("id_n").as(idCol))
      .distinct()

    newDf.join(dupNewIds, Seq(idCol), "left_anti")
  }

  /** DECONTAMINATION screen: every (corpus doc, benchmark doc) pair where
    * the corpus document CONTAINS at least `threshold` of the benchmark
    * document's n-gram shingles — `|shingles(B) ∩ shingles(A)| /
    * |shingles(B)| >= t`, the asymmetric overlap used to detect
    * evaluation-benchmark leakage in training corpora. Guaranteed recall.
    *
    * Prefix filtering applies on the BENCHMARK side only (the contained
    * side): an overlap of `ceil(t*|B|)` forces any fixed
    * `|B| - ceil(t*|B|) + 1`-subset of B to intersect A, so only that
    * many benchmark tokens join — ordered by CORPUS document frequency
    * ascending, which makes the prefix the rarest (often corpus-absent,
    * hence self-pruning) tokens. The corpus side explodes all tokens
    * once (linear, 16 bytes per shingle — the unavoidable cost of
    * containment: the superset side cannot be pruned), plus one linear
    * df aggregation. Never all-pairs.
    *
    * Returns (corpus idCol, benchmark_id, overlap, bench_size) for
    * qualifying pairs — all-integer columns, so the result is exactly
    * reproducible by any engine.
    *
    * PRECONDITION: `idCol` must be unique within each side (it is the
    * document key). A duplicated benchmark id merges two documents'
    * token rankings under one window partition and can silently shorten
    * an effective prefix — recall is only guaranteed for unique ids.
    */
  def contamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")

    val corpusDocs = shingleTable(corpus, textCol, idCol, shingleN)
      .select(col("id").as("id_a"), col("hs").as("hs_a"))
    val benchDocs = shingleTable(benchmark, textCol, idCol, shingleN)
      .select(col("id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b"))

    val corpusToks = corpusDocs.select(col("id_a"), explode(col("hs_a")).as("tok"))
    val dfreq = corpusToks.groupBy("tok").agg(count(lit(1)).as("df"))
    // corpus-absent benchmark tokens get df 0 — the BEST prefix tokens
    // (they match nothing, pruning the benchmark doc outright). The
    // containment prefix length is the same |B| - ceil(t*|B|) + 1 as the
    // Jaccard join's (overlap >= ceil(t*|B|) on the contained side).
    val benchToks = benchDocs
      .select(col("id_b").as("id"), col("sz_b").as("sz"), explode(col("hs_b")).as("tok"))
      .join(dfreq, Seq("tok"), "left")
      .na.fill(0L, Seq("df"))
    val prefix = prefixFilter(benchToks, Seq("id"), threshold)
      .select(col("tok").as("tok_b"), col("id").as("id_b"))

    val candidates = prefix
      .join(corpusToks.select(col("tok").as("tok_b"), col("id_a")), "tok_b")
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates.join(corpusDocs, "id_a").join(benchDocs, "id_b")
      .withColumn("overlap",
        graft.functions.intersect_count_sorted(col("hs_a"), col("hs_b")))
      .filter(col("overlap").cast("double") >= col("sz_b") * threshold - lit(1e-9))
      .select(col("id_a").as(idCol), col("id_b").as("benchmark_id"),
        col("overlap"), col("sz_b").cast("long").as("bench_size"))
  }

  /** Carry-save bit-sliced SimHash accumulator: instead of a 64-iteration
    * per-token loop over per-bit counters, each token hash ripples through
    * 64-bit counter PLANES (plane i holds bit i of every position's
    * set-bit count) — ~2 word ops per token on average. The classic
    * identity makes this exact: the signed accumulator is
    * `acc[b] = setCount[b] - (n - setCount[b]) = 2*setCount[b] - n`, so
    * `acc[b] > 0  <=>  2*setCount[b] > n` — bit-identical output to the
    * per-bit loop, ties (acc == 0) folding to 0 in both. 32 planes count
    * up to 2^32-1 tokens (a JVM string cannot produce more).
    * Measured ~5x on the accumulate-dominated text kernel.
    */
  private final class SimhashAcc {
    private val planes = new Array[Long](32)
    private var n = 0L
    def add(h: Long): Unit = {
      n += 1
      var carry = h
      var i = 0
      while (carry != 0L) {
        val t = planes(i) & carry
        planes(i) ^= carry
        carry = t
        i += 1
      }
    }
    def fold(): Long = {
      var out = 0L
      var b = 0
      while (b < 64) {
        var cnt = 0L
        var i = 0
        while (i < 32) { cnt += ((planes(i) >>> b) & 1L) << i; i += 1 }
        if (2 * cnt > n) out |= (1L << b)
        b += 1
      }
      out
    }
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhashKernel(tokens: Seq[String]): Long = {
    val acc = new SimhashAcc
    tokens.foreach(t => acc.add(Hashing.hashString(t)))
    acc.fold()
  }

  /** SimHash straight from the text — tokenizes in one pass (no regex
    * split, no string-array materialization; measured 3.5s -> ~0.2s for
    * 5.5k docs). Token semantics identical to `split(lower(trim(text)),
    * "\\s+")`: an all-whitespace/empty text yields the single "" token,
    * exactly like Spark's split.
    */
  def simhashTextKernel(text: String): Long = {
    val t = text.trim.toLowerCase
    val acc = new SimhashAcc
    if (t.isEmpty) acc.add(Hashing.hashString(""))
    else {
      var i = 0
      val len = t.length
      while (i < len) {
        while (i < len && isWs(t.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(t.charAt(i))) i += 1
        if (i > start)
          acc.add(Hashing.hashString(t.substring(start, i)))
      }
    }
    acc.fold()
  }

  def simhash(text: Column): Column = graft.functions.simhash64(text)

  /** Near-duplicate pairs with Hamming(simhash) <= maxDist, found by
    * banding the 64-bit hash into (maxDist + 1) chunks — the pigeonhole
    * guarantee that any pair within maxDist shares at least one exact
    * chunk — then verifying Hamming distance on bucket candidates.
    *
    * @param droppedBuckets see [[minhashPairs]].
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 1000,
      droppedBuckets: Option[LongAccumulator] = None): DataFrame = {
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
      .filter(bucketFilter(size(col("members")), maxBucket, droppedBuckets))

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

  /** Cosine similarity of two float/double-array columns — ONE native
    * whole-stage-codegen kernel. Previously a zip_with/transform/
    * aggregate chain: higher-order functions are CodegenFallback, so
    * every re-rank and pair-verify site paid an interpreted per-element
    * closure AND a broken codegen span (round-4 lesson). The kernel
    * replicates the HOF semantics exactly — sequential summation order,
    * zero-norm -> 0.0, null elements / length mismatch -> null — see
    * [[graft.expr.VectorKernels.cosineBoxed]]; equivalence is
    * property-tested against the old formulation.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.vec_cosine(a, b)

  /** Probability a pair at the given cosine lands in the same bucket in at
    * least one of `tables` hyperplane-LSH tables of `bits` planes each —
    * use it to size [[embeddingPairs]] for a target recall.
    */
  def lshCatchProbability(cosine: Double, bits: Int, tables: Int): Double = {
    val theta = math.acos(math.max(-1.0, math.min(1.0, cosine)))
    val pPlane = 1.0 - theta / math.Pi
    1.0 - math.pow(1.0 - math.pow(pPlane, bits.toDouble), tables.toDouble)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, found by
    * multi-table hyperplane LSH (each table buckets on a `bits`-bit
    * signature from independent deterministic hyperplanes) with exact
    * cosine re-rank on candidates. Never materializes all-pairs: only
    * (table, signature, id) triples shuffle, candidates join back to the
    * vectors for exact verification.
    *
    * Recall is probabilistic: a true pair at cosine c is caught with
    * probability [[lshCatchProbability]](c, bits, tables) — the defaults
    * give > 1 - 1e-6 at c >= 0.99 (the near-duplicate regime this is
    * for) and examine ~1.6% of random pairs. Precision is exact (re-rank).
    *
    * @param droppedBuckets see [[minhashPairs]].
    */
  def embeddingPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      bits: Int = 10,
      tables: Int = 16,
      maxBucket: Int = 1000,
      droppedBuckets: Option[LongAccumulator] = None): DataFrame = {
    require(bits >= 1 && bits <= 24, "bits must be in [1, 24]")
    // raw vectors (float or double): vec_cosine widens floats exactly,
    // so skipping the cast-transform halves the verify-join bytes for
    // float embeddings and keeps the HOF out of the plan
    val base = df.select(
      col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    // one signature per table from independent deterministic hyperplanes;
    // plane components derive on the fly from mix64(table, plane, dim) so
    // no driver-side dimension probe or plane broadcast is needed. The
    // signature kernel is a native codegen expression — no Seq[Double]
    // encoder round-trip per row (see graft.expr.LshTableSignatures).
    val banded = df
      .select(col(idCol).cast("long").as("id"), posexplode(
        graft.functions.lsh_table_signatures(col(vecCol), tables, bits)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "sig")

    val buckets = banded.groupBy(col("tbl"), col("sig"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(bucketFilter(size(col("ids")), maxBucket, droppedBuckets))

    val candidates = buckets.select(explode(expr(
      """filter(
        |  flatten(transform(ids, (a, i) ->
        |    transform(slice(ids, i + 2, size(ids)), b ->
        |      struct(least(a, b) AS id_a, greatest(a, b) AS id_b)))),
        |  p -> p.id_a <> p.id_b)""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val va = base.select(col("id").as("id_a"), col("v").as("va"))
    val vb = base.select(col("id").as("id_b"), col("v").as("vb"))
    candidates.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }

  /** Exact all-pairs cosine baseline — O(n^2), for validation at small n
    * only. Guarded: refuses inputs above `maxRows` so the cartesian plan
    * cannot reach production data by accident; use [[embeddingPairs]] at
    * scale.
    */
  def embeddingPairsExact(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      maxRows: Long = 100000): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"embeddingPairsExact is an O(n^2) baseline: $n rows > maxRows=$maxRows; " +
        "use embeddingPairs (LSH) at scale")
    val a = df.select(col(idCol).cast("long").as("id_a"),
      transform(col(vecCol), x => x.cast("double")).as("va"))
    val b = df.select(col(idCol).cast("long").as("id_b"),
      transform(col(vecCol), x => x.cast("double")).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }

  /** SEMANTIC deduplication (the SemDeDup shape): embeddings are L2-
    * normalized, k-means-clustered, and near-duplicate detection runs
    * ONLY within each cluster — the coarse quantizer turns the O(n^2)
    * cosine problem into O(sum cluster_i^2), with `k` the knob trading
    * recall (cross-cluster pairs are invisible BY DESIGN) against cost.
    * Returns one row per input id: (id, cluster, kept).
    *
    * Drop rule, deterministic and engine-recomputable: an id is dropped
    * iff some SMALLER id in its cluster has cosine >= threshold to it
    * (regardless of that neighbor's own fate) — the same min-id-wins
    * convention as [[dedupExact]], but defined on the raw pair
    * predicate so an independent engine can replay it with no knowledge
    * of the clustering (when, as in the harness corpus, every
    * qualifying pair is within-cluster).
    *
    * Scale shape: normalization and assignment are one codegen pass; the
    * pair stage is a co-partitioned self-join on `cluster` (one shuffle
    * of (id, normalized vector) each side, never all-pairs across
    * clusters). Normalizing FIRST makes clustering scale-invariant —
    * and scaled copies normalize to bit-identical vectors (see
    * [[graft.expr.VectorKernels.normalize]]), so exact duplicates can
    * never straddle a cluster boundary. Skew observability: the largest
    * cluster is checked against `maxClusterSize` and the job fails
    * loudly (raise `k`) instead of silently running a quadratic task.
    */
  def dedupSemantic(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      threshold: Double,
      iters: Int = 3,
      maxClusterSize: Long = 100000L): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      graft.functions.vec_normalize(col(vecCol)).as("v"))
    // centroids train on the UNSPREAD input: spread would put a
    // round-robin repartition upstream of kmeansCentroids' avg() — an
    // order-dependent float reduction — making the centroids (and with
    // adversarial data, the clustering) nondeterministic run to run,
    // exactly the case Parallelize's contract forbids. The expensive
    // stages (assignment scan + within-cluster pair join) spread below,
    // AFTER the float reduction — review-pass fix.
    val centroids = Similarity.kmeansCentroids(base, "v", "id", k, iters)
    val spreadBase = Parallelize.spread(base)
    // NOT persisted: the assignment pass (normalize + nearest-centroid)
    // is one shuffle-free codegen scan and recomputes more cheaply than
    // a corpus-sized cache entry lives (the jaccardPairs cache-lifetime
    // footgun); callers looping over batches should persist `df` upstream
    val assigned = spreadBase.withColumn("cluster",
      graft.functions.vec_nearest_centroid(col("v"), centroids))
    val biggest = assigned.groupBy(col("cluster")).count()
      .agg(max(col("count"))).head().getLong(0)
    require(biggest <= maxClusterSize,
      s"dedupSemantic: largest cluster has $biggest members > " +
        s"maxClusterSize=$maxClusterSize — raise k (more, smaller clusters) " +
        "or the cap; a quadratic pair stage at this size is a scale bug")
    val a = assigned.select(col("cluster"),
      col("id").as("id_a"), col("v").as("va"))
    val b = assigned.select(col("cluster"),
      col("id").as("id_b"), col("v").as("vb"))
    val dropped = a.join(b, "cluster")
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as("did")).distinct()
    assigned.join(dropped, col("id") === col("did"), "left")
      .select(col("id"), col("cluster"), col("did").isNull.as("kept"))
  }

  // ------------------------------------------------ cluster representatives

  /** Connected components over a near-duplicate PAIR table: pairs alone do
    * not deduplicate a corpus — duplicates are transitive (a~b, b~c means
    * {a,b,c} is ONE group even if (a,c) never surfaced as a pair), so the
    * keep/drop decision needs the component, not the edge. Returns one row
    * per id in `ids` with its `representative` = the MINIMUM id reachable
    * through the pair graph (singletons map to themselves) — keep rows
    * where `id == representative`, drop the rest.
    *
    * Algorithm: iterative min-label propagation. Each round joins the
    * current labels across the symmetrized edge list and takes the min of
    * (own label, neighbors' labels); stops when a round changes nothing.
    * Rounds needed = graph diameter — for dedup clusters (near-cliques of
    * copies) that is 1-3, so the loop runs 2-4 cheap joins; `maxIters`
    * bounds pathological chains. Every round's `count` action also
    * truncates the growing lineage via localCheckpoint when spark has a
    * checkpoint-capable context (eager local checkpoint every round keeps
    * the plan O(1) deep — the classic iterative-algorithm requirement).
    *
    * 100 TB shape: labels and edges are both (long, long) tables; each
    * round is one shuffle join on id. Pair tables from [[minhashPairs]] /
    * [[simhashPairs]] / [[embeddingPairs]] are OUTPUT-sized (near-dup
    * pairs), orders of magnitude smaller than the corpus, so the loop's
    * joins run on the small side; the final join back to `ids` is the only
    * corpus-sized exchange.
    */
  def clusterRepresentatives(
      pairs: DataFrame,
      ids: DataFrame,
      idCol: String = "id",
      maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .distinct()
      .localCheckpoint(true)
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("rep"))
      .localCheckpoint(true)
    // the DataFrame whose localCheckpoint currently backs `labels` —
    // unpersist must target the checkpointed plan itself, not a
    // projection of it
    var labelsCkpt = labels
    var changed = 1L
    var iter = 0
    val spark = pairs.sparkSession
    while (changed > 0 && iter < maxIters) {
      // min over (own label, labels of every neighbor, label of own
      // label) — ONE plan, ONE eager checkpoint job per round. The
      // neighbor minimum is a left join against the per-node min rather
      // than a union (a union whose right side embeds `labels` carries
      // the same attribute ids on both children, which trips Catalyst's
      // Union constraint rewrite).
      //
      // POINTER JUMPING: rep := min(rep, rep(rep)) — following the label
      // indirection halves every label path each round, so chains
      // converge in O(log diameter) rounds instead of O(diameter). The
      // jump here reads the PREVIOUS round's checkpointed labels (the
      // classic synchronous formulation) rather than this round's
      // propagated table: that removes the second eager materialization
      // per round the old shape paid, and the fixpoint is unchanged — at
      // convergence rep(u) <= rep of every neighbor AND rep(rep(u)) ==
      // rep(u), which forces rep == component minimum; stale-read
      // jumping still halves paths per round (property-tested on long
      // chains), it can only trade at most one extra cheap round.
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u")).agg(min(col("rep")).as("__nrep"))
        .withColumnRenamed("u", "id")
      // Convergence detection is FOLDED INTO the checkpoint job via an
      // accumulator (a per-row flag UDF evaluated as the rows
      // materialize) instead of a separate count() job joining next
      // against labels — one fewer Spark job per round. Accumulators in
      // transformations are at-least-once: a replayed task can only
      // OVERCOUNT, i.e. force one extra (no-op) round, never terminate
      // early with partially-propagated labels.
      val acc = spark.sparkContext.longAccumulator("graft.cluster.changed")
      val bump = udf((c: Boolean) => { if (c) acc.add(1L); c })
      val next3 = labels
        .join(nbrMin, Seq("id"), "left")
        .join(labels.select(col("id").as("__rid"), col("rep").as("__rrep")),
          col("rep") === col("__rid"), "left")
        .select(col("id"), col("rep").as("prev"),
          least(col("rep"),
            coalesce(col("__nrep"), col("rep")),
            coalesce(col("__rrep"), col("rep"))).as("rep"))
        .select(col("id"), col("rep"),
          bump(col("rep") =!= col("prev")).as("__chg"))
        .localCheckpoint(true)
      changed = acc.value
      // superseded checkpoint: only next3 stays live into the next round
      labelsCkpt.unpersist()
      labelsCkpt = next3
      labels = next3.select(col("id"), col("rep"))
      iter += 1
    }
    // partially-propagated labels would silently split a duplicate group
    // into several "representatives" — fail loud instead
    if (changed > 0)
      throw new IllegalStateException(
        s"clusterRepresentatives did not converge in $maxIters rounds " +
          s"(a component's diameter exceeds maxIters — raise maxIters)")
    edges.unpersist()
    labels.select(col("id").as(idCol), col("rep").as("representative"))
  }

  /** One-call corpus deduplication: MinHash-LSH near-dup pairs ->
    * connected components -> keep one representative (the component-min
    * id) per duplicate group. Returns the deduplicated rows of `df` with
    * all original columns. The composition every training-data pipeline
    * runs; each stage is the scale-audited operator above.
    */
  def dedupMinhash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double): DataFrame = {
    val pairs = minhashPairs(df.select(col(idCol), col(textCol)), textCol, idCol,
      threshold = threshold).select(col("id_a"), col("id_b"))
    val reps = clusterRepresentatives(pairs, df.select(col(idCol)), idCol)
    df.join(reps.filter(col(idCol) === col("representative")).select(col(idCol)), Seq(idCol))
  }

  /** One-call SimHash dedup, symmetric with [[dedupMinhash]]: keep one
    * representative (the min id) per connected component of
    * Hamming-within-`maxDist` pairs. Same scale shape: banded candidate
    * generation, pointer-jumping components, one semi-join back.
    */
  def dedupSimhash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3): DataFrame = {
    val pairs = simhashPairs(df.select(col(idCol), col(textCol)), textCol, idCol,
      maxDist = maxDist).select(col("id_a"), col("id_b"))
    val reps = clusterRepresentatives(pairs, df.select(col(idCol)), idCol)
    df.join(reps.filter(col(idCol) === col("representative")).select(col(idCol)), Seq(idCol))
  }

  /** One-call EXACT n-gram Jaccard dedup, symmetric with [[dedupMinhash]]
    * but with guaranteed recall: [[jaccardPairs]] (prefix-filter exact
    * similarity join) -> connected components -> one representative per
    * group.
    */
  def dedupJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      shingleN: Int = 3): DataFrame = {
    val (pairsFull, shingleHandle) = jaccardPairsWithHandle(
      df.select(col(idCol), col(textCol)), textCol, idCol,
      shingleN = shingleN, threshold = threshold, persistShingleTable = true)
    val pairs = pairsFull.select(col("id_a"), col("id_b"))
    // clusterRepresentatives materializes (per-round localCheckpoint), so
    // the corpus-sized shingle cache can be released as soon as it returns
    val reps = clusterRepresentatives(pairs, df.select(col(idCol)), idCol)
    shingleHandle.foreach(_.unpersist(blocking = false))
    df.join(reps.filter(col(idCol) === col("representative")).select(col(idCol)), Seq(idCol))
  }

  /** EXACT duplicate-substring coverage (the ExactSubstr family of Lee
    * et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better" — suffix-array semantics re-expressed relationally): for
    * every document, how many of its characters sit inside a
    * `window`-code-point substring that occurs MORE THAN ONCE anywhere in
    * the corpus (any document, any position — including self-overlap
    * inside one document).
    *
    * Exactness without a suffix array: window hashes form candidates
    * (equal substrings always hash equally -> full recall), then the
    * candidate positions are verified by grouping on the ACTUAL
    * substring, which removes any hash-collision false positives. A
    * substring occurring >= 2 times has hash count >= 2, so every one of
    * its positions survives the candidate filter — the verified counts
    * are exact by construction, never probabilistic.
    *
    * Scale shape: the hash pass shuffles (id, pos, hash) — O(corpus code
    * points) longs, the same asymptotics a distributed suffix array
    * pays, with NO document text on the wire. Only candidate positions
    * (bounded by the corpus duplication rate) are joined back to their
    * documents for the `window`-char verify slices, and the final
    * interval-union window sort is per-document (bounded by max doc
    * length, never corpus-sized). For very large corpora,
    * `sampleMod > 1` keeps only content-keyed sample windows
    * (hash % sampleMod == 0): counts become lower bounds with recall on
    * spans that contain a sampled window, and the shuffle shrinks by
    * ~sampleMod; the sampling key is the content hash, so a duplicated
    * substring is sampled identically at every occurrence (sampling
    * never creates false positives).
    *
    * Returns one row per input document: id, n_chars (code points),
    * n_windows, n_dup_windows, dup_chars (exact interval union of the
    * duplicated windows' spans).
    *
    * Precondition: `idCol` values are unique and non-null.
    */
  def duplicateSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 40,
      sampleMod: Int = 1): DataFrame =
    duplicateSpansImpl(df, textCol, idCol, window, sampleMod, hashSquash = 0L)

  /** `hashSquash > 0` reduces candidate hashes mod that value — a test
    * hook that forces collisions to prove the substring verify restores
    * exactness. Never use in production paths.
    */
  private[graft] def duplicateSpansImpl(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int,
      sampleMod: Int,
      hashSquash: Long): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
    val dupPos = verifiedDupPositions(base, window, sampleMod, hashSquash)
      .select(col("__id"), col("__pos"))
    spanCoverage(base, dupPos, window, idCol)
  }

  /** Per-document coverage statistics from verified duplicate window
    * positions: exact interval union of equal-length spans
    * [pos, pos+window) — each position covers min(window, nextPos - pos)
    * new characters. The same per-document sort also yields
    * gaps-and-islands: an island breaks when the gap to the previous
    * position exceeds the window (spans no longer touch), and the
    * longest island (max pos - island start + window) is the document's
    * longest contiguous duplicated run — one window pass, one shuffle.
    */
  private def spanCoverage(
      base: DataFrame,
      dupPos: DataFrame,
      window: Int,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val covered = dupPos
      .withColumn("__next", lead(col("__pos"), 1).over(byDoc))
      .withColumn("__lag", lag(col("__pos"), 1).over(byDoc))
      .withColumn("__cov",
        when(col("__next").isNull, lit(window.toLong))
          .otherwise(least(lit(window.toLong),
            (col("__next") - col("__pos")).cast("long"))))
      .withColumn("__brk",
        when(col("__lag").isNull || col("__pos") - col("__lag") > window, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(byDoc))
      .withColumn("__start",
        min(col("__pos")).over(Window.partitionBy(col("__id"), col("__isl"))))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_dup_windows"), sum(col("__cov")).as("dup_chars"),
        max(col("__pos") - col("__start") + window).cast("long")
          .as("max_dup_run"))
    base
      .withColumn("n_chars", length(col("__text")).cast("long"))
      .withColumn("n_windows",
        greatest(col("n_chars") - lit(window - 1L), lit(0L)))
      .join(covered, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_chars"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
  }

  /** Shared candidate/verify pipeline for the duplicate-substring
    * operators: (__id, __pos, __sub) for every position whose
    * `window`-code-point substring occurs more than once corpus-wide.
    * Hash candidates give full recall; grouping on the actual substring
    * removes collision false positives — exact by construction.
    */
  private def verifiedDupPositions(
      base: DataFrame,
      window: Int,
      sampleMod: Int,
      hashSquash: Long): DataFrame = {
    require(window >= 2 && window <= 1024,
      s"window must be in [2, 1024], got $window")
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    import org.apache.spark.sql.expressions.Window
    val sampled = windowHashTable(base, window, sampleMod)
    val keyed =
      if (hashSquash > 0)
        sampled.withColumn("__h", pmod(col("__h"), lit(hashSquash)))
      else sampled
    // corpus-wide hash counts via a whole-partition window, NOT a
    // groupBy + self-join: the O(corpus code points) hash table is
    // scanned and shuffled ONCE (a groupBy side would re-execute the
    // whole window-hash scan — partial aggregation below its exchange
    // makes the two exchanges non-reusable)
    val cand = keyed
      .withColumn("__hc", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("__hc") > 1)
      .select(col("__id"), col("__pos"))
    // verify: slice the actual substring for candidate positions only and
    // re-count on the string itself (kills collision false positives) —
    // same single-pass window trick on the candidate-sized table
    cand
      .join(base, Seq("__id"))
      .select(col("__id"), col("__pos"),
        expr(s"substring(__text, __pos + 1, $window)").as("__sub"))
      .withColumn("__sc", count(lit(1)).over(Window.partitionBy(col("__sub"))))
      .filter(col("__sc") > 1)
      .select(col("__sub"), col("__id"), col("__pos"))
  }

  /** Exploded (id, pos, hash) window-hash table over `base`
    * (__id, __text), content-keyed sampled: `pmod(hash, sampleMod) == 0`
    * keeps the SAME windows on every side that uses the same modulus, so
    * sampled screens stay lower bounds with no false positives.
    */
  private def windowHashTable(
      base: DataFrame, window: Int, sampleMod: Int): DataFrame = {
    val wh = base
      .select(col("__id"),
        graft.functions.window_hashes(col("__text"), window).as("__wh"))
      .select(col("__id"), posexplode(col("__wh")).as(Seq("__pos", "__h")))
    if (sampleMod > 1) wh.filter(pmod(col("__h"), lit(sampleMod.toLong)) === 0)
    else wh
  }

  /** PIPELINE STATE for incremental duplicate-substring screening
    * ([[duplicateSpansAgainst]]): one row per DISTINCT (window hash,
    * window substring) in the corpus, carrying the canonical min-(id,
    * pos) witness occurrence. Persist this table (parquet) and screen
    * every subsequent ingest batch against it instead of rescanning the
    * corpus.
    *
    * Why distinct-substring witnesses (not all positions, not one row
    * per hash): a substring occurring a million times in the corpus
    * costs ONE state row — the screen join cannot explode on heavy true
    * duplicates; and keeping a witness per distinct SUBSTRING (not per
    * hash) preserves exactness under 64-bit hash collisions inside the
    * corpus, which a one-witness-per-hash state would turn into false
    * negatives (at 10^12 windows, dozens of expected collisions).
    *
    * UPDATE RULE: window hashes are per-document independent, so
    * `state(c1 UNION c2) ⊆ state(c1) UNION state(c2)` differs only in
    * witness redundancy (the same substring may keep one witness per
    * batch); screening results are IDENTICAL against either (verified
    * positions are distinct-ed) — append the new batch's state and keep
    * ingesting. Property-tested.
    *
    * Cost shape: one corpus scan; the groupBy shuffle carries window
    * substrings (~window bytes x corpus windows) ONCE at state-build
    * time, amortized over every later screen. `sampleMod > 1` divides
    * both state size and shuffle by the modulus (lower-bound screens).
    */
  def substringState(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 40,
      sampleMod: Int = 1): DataFrame =
    substringStateImpl(df, textCol, idCol, window, sampleMod, hashSquash = 0L)

  /** `hashSquash` test hook like [[duplicateSpansImpl]]'s: forces hash
    * collisions to prove witness verification keeps the screen exact.
    */
  private[graft] def substringStateImpl(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int,
      sampleMod: Int,
      hashSquash: Long): DataFrame = {
    require(window >= 2 && window <= 1024,
      s"window must be in [2, 1024], got $window")
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val base = Parallelize.spread(
      df.select(col(idCol).as("__id"), col(textCol).as("__text")))
    // slice the substring INLINE off the Generate's requiredChildOutput
    // (__text rides the explode and is dropped by the projection before
    // anything is materialized — whole-stage codegen fuses the two).
    // The previous shape re-joined the exploded table to `base` for the
    // slice, and Spark broadcast the 1.3M-row EXPLODED side (driver
    // collect + HashedRelation build, ~2 s warm at sf0.1) — a join that
    // buys nothing the generator did not already have in scope.
    val wh0 = base
      .select(col("__id"), col("__text"),
        posexplode(graft.functions.window_hashes(col("__text"), window))
          .as(Seq("__pos", "__h")))
    val sampled =
      if (sampleMod > 1)
        wh0.filter(pmod(col("__h"), lit(sampleMod.toLong)) === 0)
      else wh0
    val wh =
      if (hashSquash > 0)
        sampled.withColumn("__h", pmod(col("__h"), lit(hashSquash)))
      else sampled
    wh.select(col("__h"), col("__id"), col("__pos"),
        expr(s"substring(__text, __pos + 1, $window)").as("__sub"))
      .groupBy(col("__h"), col("__sub"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
      .select(col("__h").as("hash"),
        col("__w.__id").as("corpus_id"),
        col("__w.__pos").as("corpus_pos"))
  }

  /** Incremental duplicate-substring screen: coverage statistics (the
    * [[duplicateSpans]] schema) for a NEW batch against an existing
    * corpus via its persisted [[substringState]] — the corpus text is
    * NOT re-hashed; it is only consulted to slice the witness substrings
    * that candidate hash hits point at (exact verification, collision-
    * proof like the batch operator).
    *
    * Within-batch duplicates are intentionally NOT counted (mirror of
    * [[dedupAgainst]]): the screen answers "which spans of the new docs
    * already exist in the corpus".
    *
    * Plan shape: new-batch window hashes equi-join the state on hash
    * (state has one row per distinct corpus substring — no explosion on
    * heavy duplicates); ONE corpus fetch join slices each candidate's
    * witness substring in the same pass (the candidate table is consumed
    * exactly once); verified positions distinct-ed, then the
    * single-window coverage pass. `sampleMod` must match the state's.
    *
    * Preconditions: unique non-null ids in the new batch; `corpus`
    * must be the table the state was built from (same ids).
    */
  def duplicateSpansAgainst(
      newDf: DataFrame,
      state: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 40,
      sampleMod: Int = 1): DataFrame =
    duplicateSpansAgainstImpl(
      newDf, state, corpus, textCol, idCol, window, sampleMod, hashSquash = 0L)

  private[graft] def duplicateSpansAgainstImpl(
      newDf: DataFrame,
      state: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      window: Int,
      sampleMod: Int,
      hashSquash: Long): DataFrame = {
    require(window >= 2 && window <= 1024,
      s"window must be in [2, 1024], got $window")
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val base = newDf.select(col(idCol).as("__id"), col(textCol).as("__text"))
    val wh0 = windowHashTable(base, window, sampleMod)
    val wh =
      if (hashSquash > 0) wh0.withColumn("__h", pmod(col("__h"), lit(hashSquash)))
      else wh0
    val cand = wh
      .join(state, col("__h") === state("hash"))
      .select(col("__id"), col("__pos"), col("corpus_id"), col("corpus_pos"))
    // slice the new-side substrings for candidate positions only
    val withNew = cand.join(base, Seq("__id"))
      .select(col("__id"), col("__pos"), col("corpus_id"), col("corpus_pos"),
        expr(s"substring(__text, __pos + 1, $window)").as("__nsub"))
    // verify against the corpus witness IN ONE PASS: withNew is consumed
    // exactly once (a distinct-witness pre-slice would consume it twice
    // — the round-5 "groupBy-filter + re-join re-executes the upstream"
    // plan smell). Corpus text ships once per matched doc into the join;
    // only the verified (id, pos) pairs survive the projection.
    val cbase = corpus
      .select(col(idCol).as("corpus_id"), col(textCol).as("__ctext"))
    val dupPos = withNew
      .join(cbase, Seq("corpus_id"))
      .filter(expr(s"substring(__ctext, corpus_pos + 1, $window)")
        === col("__nsub"))
      .select(col("__id"), col("__pos"))
      .distinct()
    spanCoverage(base, dupPos, window, idCol)
  }

  /** The ACTIONABLE half of [[duplicateSpans]] (Lee et al. 2021 remove
    * all-but-one occurrence): every duplicated `window`-substring keeps
    * its CANONICAL occurrence — the lexicographically minimal (id, pos)
    * — and every other occurrence's span is REMOVED from its document
    * (characters in the interval union of the non-canonical duplicated
    * windows). Deterministic: a pure function of the corpus content and
    * ids, independent of partitioning or order, so a re-run reproduces
    * byte-identical masked text (sha-auditable cross-engine).
    *
    * Returns (id, masked, n_chars, n_masked_chars). NOT idempotent by
    * design: masking can juxtapose previously-separated text and create
    * new windows; re-run to a fixpoint if required.
    *
    * Scale shape: identical to [[duplicateSpans]] plus one k-row
    * canonical-min aggregate over the duplicated positions and a
    * per-document mask kernel (positions ride a sorted array column —
    * no per-character rows ever materialize in Spark).
    *
    * Preconditions: unique non-null ids, non-null text.
    */
  def maskDuplicateSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 40,
      sampleMod: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
    val dup = verifiedDupPositions(base, window, sampleMod, hashSquash = 0L)
    // canonical occurrence per substring value: min (id, pos) — struct
    // ordering is lexicographic, matching a (id, pos) ORDER BY. A
    // whole-partition window min, not a groupBy + re-join, so the dup
    // pipeline executes once
    val nonCanon = dup
      .withColumn("__c", min(struct(col("__id"), col("__pos")))
        .over(Window.partitionBy(col("__sub"))))
      .filter(!(col("__id") === col("__c.__id") && col("__pos") === col("__c.__pos")))
      .select(col("__id"), col("__pos"))
    val spans = nonCanon.groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__ps"))
    base
      .join(spans, Seq("__id"), "left")
      .withColumn("masked",
        when(col("__ps").isNull, col("__text"))
          .otherwise(graft.functions.mask_spans(col("__text"), col("__ps"), window)))
      .select(col("__id").as(idCol), col("masked"),
        length(col("__text")).cast("long").as("n_chars"),
        (length(col("__text")) - length(col("masked"))).cast("long")
          .as("n_masked_chars"))
  }

  /** [[maskDuplicateSpans]] to a FIXPOINT: masking can juxtapose
    * previously-separated text into brand-new duplicated windows, so one
    * pass is not always enough. Iterates (each round localCheckpoints —
    * truncated lineage, one job per round like clusterRepresentatives)
    * until a round masks nothing; throws loudly past `maxRounds` rather
    * than returning a silently-unfinished corpus. Deterministic: every
    * round is a pure function of the previous round's content.
    *
    * Returns (id, masked, n_chars, n_masked_chars, where the counts are
    * CUMULATIVE vs the original text).
    */
  def maskDuplicateSpansFixpoint(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 40,
      sampleMod: Int = 1,
      maxRounds: Int = 8): DataFrame =
    // NOTE: the returned DataFrame depends on the final round's
    // localCheckpoint, which stays persisted for the session lifetime —
    // looping pipelines should use [[maskDuplicateSpansFixpointReleasable]]
    // and call the release handle once the result is consumed
    maskDuplicateSpansFixpointReleasable(
      df, textCol, idCol, window, sampleMod, maxRounds)._1

  /** [[maskDuplicateSpansFixpoint]] plus an explicit cache-release handle
    * for the final round's localCheckpoint (the returned DataFrame reads
    * from it — call the handle only AFTER fully consuming the result).
    * Mirrors [[jaccardPairsReleasable]]'s cache-lifetime contract.
    */
  def maskDuplicateSpansFixpointReleasable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 40,
      sampleMod: Int = 1,
      maxRounds: Int = 8): (DataFrame, () => Unit) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val orig = df
      .select(col(idCol), length(col(textCol)).cast("long").as("n_chars"))
    var cur = df.select(col(idCol), col(textCol))
    var prev: Option[DataFrame] = None
    var rounds = 0
    var done = false
    while (!done) {
      val masked = maskDuplicateSpans(cur, textCol, idCol, window, sampleMod)
        .select(col(idCol), col("masked").as(textCol), col("n_masked_chars"))
        .localCheckpoint()
      // coalesce: max over an EMPTY corpus is null (empty in, empty out)
      val changed = masked
        .agg(coalesce(max(col("n_masked_chars")), lit(0L))).head().getLong(0)
      prev.foreach(_.unpersist(blocking = false)) // only `masked` stays live
      prev = Some(masked)
      cur = masked.drop("n_masked_chars")
      if (changed == 0L) done = true
      else {
        rounds += 1
        // maxRounds PRODUCTIVE rounds are allowed; fail only when a round
        // beyond that still changes something — releasing the final
        // checkpoint first (the throw path must not leak what the
        // release handle exists to free)
        if (rounds > maxRounds) {
          prev.foreach(_.unpersist(blocking = false))
          throw new IllegalStateException(
            s"maskDuplicateSpansFixpoint did not converge in $maxRounds rounds")
        }
      }
    }
    val result = cur.join(orig, Seq(idCol))
      .select(col(idCol), col(textCol).as("masked"), col("n_chars"),
        (col("n_chars") - length(col(textCol)).cast("long")).as("n_masked_chars"))
    val live = prev
    (result, () => live.foreach(_.unpersist(blocking = false)))
  }
}
