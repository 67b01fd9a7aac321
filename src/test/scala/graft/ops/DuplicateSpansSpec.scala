package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DuplicateSpansSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  /** Brute force on actual substrings: every w-code-point window of the
    * corpus, global occurrence counts, per-doc duplicated positions,
    * interval union by direct coverage marking (a different algorithm
    * than the lead()-based union in the operator).
    */
  private def ref(corpus: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    def cps(s: String): Array[Int] = s.codePoints.toArray
    val subs = corpus.flatMap { case (id, t) =>
      val c = cps(t)
      (0 to c.length - w).map(p => (id, p, new String(c, p, w)))
    }
    val counts = subs.groupBy(_._3).view.mapValues(_.size).toMap
    corpus.map { case (id, t) =>
      val c = cps(t)
      val nW = math.max(0, c.length - w + 1).toLong
      val dupPos = subs.filter(s => s._1 == id && counts(s._3) > 1).map(_._2)
      val marked = new Array[Boolean](c.length)
      dupPos.foreach(p => (p until p + w).foreach(marked(_) = true))
      // longest contiguous duplicated run, straight off the marks
      var maxRun = 0L
      var run = 0L
      marked.foreach { m =>
        if (m) { run += 1; if (run > maxRun) maxRun = run } else run = 0
      }
      (id, (c.length.toLong, nW, dupPos.size.toLong,
        marked.count(identity).toLong, maxRun))
    }.toMap
  }

  private val boiler = "SHARED BOILERPLATE LICENSE SEGMENT"
  private val corpus: Seq[(Long, String)] = Seq(
    (1L, s"unique alpha text one $boiler tail a"),
    (2L, s"unique beta body two ... $boiler tail b"),
    (3L, "abcabcabcabcabcabcabc"),            // self-overlapping repeats
    (4L, "wholly distinct content with nothing repeated anywhere at all"),
    (5L, "short"),                            // below the window size
    (6L, ""),                                 // empty
    (7L, "𝕏é𝕏é𝕏é𝕏é𝕏é𝕏é𝕏é𝕏é tail seven"),  // multibyte self-repeat
    (8L, "𝕏é𝕏é𝕏é𝕏é𝕏é𝕏é𝕏é𝕏é tail eight"), // shares the multibyte prefix
    (9L, "wholly distinct content with nothing repeated anywhere at all"))
    // 9 duplicates 4 exactly: every window of both is duplicated

  private def collect(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Long, Long)] =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap

  test("duplicateSpans matches the brute-force substring reference") {
    for (w <- Seq(5, 8, 12)) {
      val got = collect(Dedup.duplicateSpans(
        corpus.toDF("doc_id", "text"), "text", "doc_id", window = w))
      assert(got === ref(corpus, w), s"window=$w")
    }
  }

  test("forced hash collisions: substring verify keeps results exact") {
    // hashSquash=4 maps every window hash into {0,1,2,3} — nearly all
    // candidates are collision false positives; output must not change
    val exact = collect(Dedup.duplicateSpans(
      corpus.toDF("doc_id", "text"), "text", "doc_id", window = 8))
    val squashed = collect(Dedup.duplicateSpansImpl(
      corpus.toDF("doc_id", "text"), "text", "doc_id",
      window = 8, sampleMod = 1, hashSquash = 4L))
    assert(squashed === exact)
  }

  test("content-keyed sampling yields lower bounds, never false positives") {
    val exact = collect(Dedup.duplicateSpans(
      corpus.toDF("doc_id", "text"), "text", "doc_id", window = 5))
    for (m <- Seq(2, 8)) {
      val sampled = collect(Dedup.duplicateSpans(
        corpus.toDF("doc_id", "text"), "text", "doc_id",
        window = 5, sampleMod = m))
      sampled.foreach { case (id, (nc, nw, ndup, cov, run)) =>
        val (enc, enw, edup, ecov, erun) = exact(id)
        assert(nc === enc && nw === enw, s"totals must not change (id=$id)")
        assert(ndup <= edup && cov <= ecov && run <= erun,
          s"sampled exceeds exact (id=$id)")
        if (edup === 0L) assert(ndup === 0L, s"false positive (id=$id)")
      }
    }
  }

  test("window_hashes kernel: positions align with SQL substring, SQL name registered") {
    val t = "abcdefgh abcdefgh 𝕏é tail"
    val hs = Dedup.windowHashKernel(t, 6)
    val cps = t.codePoints.toArray
    assert(hs.length === cps.length - 5)
    // position p hashes exactly the UTF-8 bytes of substring(p, 6)
    (0 until hs.length).foreach { p =>
      val sub = new String(cps, p, 6)
      assert(hs(p) === graft.core.Hashing.hashBytes(
        sub.getBytes(java.nio.charset.StandardCharsets.UTF_8)), s"pos=$p")
    }
    // short and empty inputs
    assert(Dedup.windowHashKernel("abc", 6).isEmpty)
    assert(Dedup.windowHashKernel("", 6).isEmpty)
    // SQL registration + expression agrees with the kernel
    Seq(t).toDF("t").createOrReplaceTempView("wh_t")
    val viaSql = spark.sql("SELECT window_hashes(t, 6) AS h FROM wh_t")
      .head().getSeq[Long](0)
    assert(viaSql === hs.toSeq)
  }

  /** Independent masking reference: recompute duplicated positions with
    * the brute-force substring counts, rank occurrences by (id, pos),
    * mark non-canonical spans, rebuild the string code point by code
    * point.
    */
  private def refMask(corpus: Seq[(Long, String)], w: Int)
      : Map[Long, (String, Long, Long)] = {
    def cps(s: String): Array[Int] = s.codePoints.toArray
    val subs = corpus.flatMap { case (id, t) =>
      val c = cps(t)
      (0 to c.length - w).map(p => (id, p, new String(c, p, w)))
    }
    val byValue = subs.groupBy(_._3)
    val nonCanon = byValue.values.filter(_.size > 1).flatMap { occ =>
      occ.sortBy(o => (o._1, o._2)).tail // all but the minimal (id, pos)
    }.toSeq
    val nonCanonByDoc = nonCanon.groupBy(_._1)
    corpus.map { case (id, t) =>
      val c = cps(t)
      val keep = Array.fill(c.length)(true)
      nonCanonByDoc.getOrElse(id, Seq.empty).foreach { o =>
        (o._2 until o._2 + w).foreach(keep(_) = false)
      }
      val sb = new java.lang.StringBuilder
      c.indices.foreach(i => if (keep(i)) sb.appendCodePoint(c(i)))
      (id, (sb.toString, c.length.toLong, keep.count(k => !k).toLong))
    }.toMap
  }

  test("maskDuplicateSpans matches the brute-force reference; canonical survives") {
    for (w <- Seq(5, 8)) {
      val got = Dedup.maskDuplicateSpans(
        corpus.toDF("doc_id", "text"), "text", "doc_id", window = w)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      assert(got === refMask(corpus, w), s"window=$w")
    }
    // doc 4 and 9 are byte-identical: the smaller id keeps its full text,
    // the larger id is fully masked (every window is duplicated)
    val m = Dedup.maskDuplicateSpans(
      corpus.toDF("doc_id", "text"), "text", "doc_id", window = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(4L) === corpus.find(_._1 == 4L).get._2)
    assert(m(9L) === "")
    // untouched docs come back verbatim with zero masked chars
    assert(m(5L) === "short" && m(6L) === "")
  }

  test("mask_spans kernel: overlap union, multibyte, bounds") {
    assert(Dedup.maskSpansKernel("abcdefgh", Array(0, 2), 3) === "fgh")
    assert(Dedup.maskSpansKernel("abcdefgh", Array(5), 3) === "abcde")
    assert(Dedup.maskSpansKernel("abcdefgh", Array.emptyIntArray, 3) === "abcdefgh")
    // code-point positions: astral chars count once; cps are
    // [𝕏, a, 𝕏, b, 𝕏, c] — masking {1,2} at w=2 removes cps 1..3
    assert(Dedup.maskSpansKernel("𝕏a𝕏b𝕏c", Array(1, 2), 2) === "𝕏𝕏c")
    assert(Dedup.maskSpansKernel("𝕏a𝕏b𝕏c", Array(0), 2) === "𝕏b𝕏c")
    intercept[IllegalArgumentException](
      Dedup.maskSpansKernel("abc", Array(2), 3))
    intercept[IllegalArgumentException](
      Dedup.maskSpansKernel("abc", Array(-1), 2))
  }

  test("fixpoint masking: juxtaposition-created duplicates need a second round") {
    // w=3. Round 1: doc2's "abc" (canonical in doc1) is masked, leaving
    // "pqrs" — whose windows pqr/qrs did NOT exist in the original doc2.
    // Round 2: doc3 shares pqr/qrs with the NEW doc2 (doc2 canonical) and
    // masks [1,5) -> "00x". Round 3 masks nothing.
    val corpus2 = Seq(
      (1L, "abcxyz0"),
      (2L, "pqabcrs"),
      (3L, "0pqrs0x")).toDF("doc_id", "text")
    val got = Dedup.maskDuplicateSpansFixpoint(
      corpus2, "text", "doc_id", window = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(got(1L) === ("abcxyz0", 0L), "canonical doc untouched")
    assert(got(2L) === ("pqrs", 3L))
    assert(got(3L) === ("00x", 4L), "second-round juxtaposition dup masked")
    // the output is a true fixpoint: re-masking changes nothing
    val again = Dedup.maskDuplicateSpans(
      Seq((1L, got(1L)._1), (2L, got(2L)._1), (3L, got(3L)._1))
        .toDF("doc_id", "text"), "text", "doc_id", window = 3)
      .agg(sum(col("n_masked_chars"))).head().getLong(0)
    assert(again === 0L)
    // non-convergence is loud, not silent
    intercept[IllegalStateException] {
      Dedup.maskDuplicateSpansFixpoint(corpus2, "text", "doc_id",
        window = 3, maxRounds = 1)
    }
    // releasable variant: same result, and the cache-release handle frees
    // the final round's checkpoint AFTER the result is consumed
    val (rel, release) = Dedup.maskDuplicateSpansFixpointReleasable(
      corpus2, "text", "doc_id", window = 3)
    val relMap = rel.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(relMap === got)
    release() // must not throw; subsequent use of other frames unaffected
  }

  test("incremental screen matches a brute-force new-vs-corpus reference, exact under collisions") {
    def cps(s: String): Array[Int] = s.codePoints.toArray
    val newb: Seq[(Long, String)] = Seq(
      (101L, s"fresh preface then $boiler and novel tail xyz"), // shares boiler
      (102L, "abcabcabcabcabc plus new"), // shares doc3's repeats
      (103L, "entirely novel content never seen before anywhere"),
      (104L, corpus(3)._2), // exact re-ingest of doc 4
      (105L, "short"), (106L, ""))
    for (w <- Seq(5, 8)) {
      val corpusSubs = corpus.flatMap { case (_, t) =>
        val c = cps(t); (0 to c.length - w).map(p => new String(c, p, w))
      }.toSet
      val expect = newb.map { case (id, t) =>
        val c = cps(t)
        val nW = math.max(0, c.length - w + 1).toLong
        val dupPos = (0 to c.length - w)
          .filter(p => corpusSubs(new String(c, p, w)))
        val marked = new Array[Boolean](c.length)
        dupPos.foreach(p => (p until p + w).foreach(marked(_) = true))
        var maxRun = 0L
        var run = 0L
        marked.foreach { m =>
          if (m) { run += 1; if (run > maxRun) maxRun = run } else run = 0
        }
        id -> ((c.length.toLong, nW, dupPos.size.toLong,
          marked.count(identity).toLong, maxRun))
      }.toMap
      val cdf = corpus.toDF("doc_id", "text")
      val state = Dedup.substringState(cdf, "text", "doc_id", window = w)
      val got = collect(Dedup.duplicateSpansAgainst(
        newb.toDF("doc_id", "text"), state, cdf, "text", "doc_id", window = w))
      assert(got === expect, s"window=$w")
      // forced collisions on BOTH sides: the distinct-substring witness
      // verification must keep the screen exact
      val sq = collect(Dedup.duplicateSpansAgainstImpl(
        newb.toDF("doc_id", "text"),
        Dedup.substringStateImpl(cdf, "text", "doc_id", w, 1, hashSquash = 4L),
        cdf, "text", "doc_id", w, 1, hashSquash = 4L))
      assert(sq === got, s"squashed window=$w")
    }
  }

  test("incremental state update rule: appended state screens identically to from-scratch") {
    val c1 = corpus.filter(_._1 <= 5).toDF("doc_id", "text")
    val c2 = corpus.filter(_._1 > 5).toDF("doc_id", "text")
    val whole = corpus.toDF("doc_id", "text")
    val newb = Seq(
      (201L, s"x $boiler y"),
      (202L, "wholly distinct content with nothing else"))
      .toDF("doc_id", "text")
    // window hashes are per-document independent: appending per-batch
    // states only adds redundant witnesses, never changes the screen
    val appended = Dedup.substringState(c1, "text", "doc_id", window = 8)
      .unionByName(Dedup.substringState(c2, "text", "doc_id", window = 8))
    val scratch = Dedup.substringState(whole, "text", "doc_id", window = 8)
    val a = collect(Dedup.duplicateSpansAgainst(
      newb, appended, whole, "text", "doc_id", window = 8))
    val b = collect(Dedup.duplicateSpansAgainst(
      newb, scratch, whole, "text", "doc_id", window = 8))
    assert(a === b)
    // heavy-duplicate compaction: doc 4 == doc 9 verbatim, so their
    // windows share state rows — exactly ONE witness per distinct
    // substring in the from-scratch state (the no-join-explosion claim)
    def cps(s: String): Array[Int] = s.codePoints.toArray
    val nDistinctSubs = corpus.flatMap { case (_, t) =>
      val c = cps(t); (0 to c.length - 8).map(p => new String(c, p, 8))
    }.distinct.size
    assert(scratch.count() === nDistinctSubs.toLong)
  }

  test("plan shape: codegen kernel, no ScalaUDF, no cartesian") {
    val df = Dedup.duplicateSpans(
      corpus.toDF("doc_id", "text").repartition(3), "text", "doc_id", window = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
