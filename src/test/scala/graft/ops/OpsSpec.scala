package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class OpsSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def docs = {
    // base corpus + planted near-duplicates (id + 1000 = id's text with a
    // small suffix edit) + one exact duplicate pair (2000/2001)
    val base = (0 until 50).map { i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i " +
        s"with some ${"padding " * 10}tail marker$i")
    }
    val nearDups = (0 until 50 by 10).map { i =>
      (i.toLong + 1000, base(i)._2 + " extra")
    }
    val exactDup = Seq((2000L, "identical text body"), (2001L, "identical text body"))
    (base ++ nearDups ++ exactDup).toDF("doc_id", "text")
  }

  test("exact dedup: one representative per distinct text") {
    val d = Dedup.exact(docs, "text", "doc_id")
    assert(d.count() === 56) // 50 base + 5 near (distinct) + 1 shared exact
    val dupRow = d.filter(col("copies") === 2).collect()
    assert(dupRow.length === 1 && dupRow(0).getLong(1) === 2000L)
  }

  test("minhash LSH finds all planted near-duplicates with correct jaccard") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = (0 until 50 by 10).map(i => (i.toLong, i + 1000L)).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(found), s"missing: ${planted -- found}")
    // exact duplicate pair found at jaccard 1.0
    assert(found.contains((2000L, 2001L)))
    pairs.filter(p => (p._1, p._2) == ((2000L, 2001L)))
      .foreach(p => assert(p._3 === 1.0))
    // jaccard values verified against a manual computation
    pairs.filter(p => planted((p._1, p._2))).foreach { case (a, b, j) =>
      val ta = docs.filter(col("doc_id") === a).head.getString(1)
      val tb = docs.filter(col("doc_id") === b).head.getString(1)
      def sh(t: String) = t.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
      val exact = sh(ta).intersect(sh(tb)).size.toDouble / sh(ta).union(sh(tb)).size
      assert(math.abs(j - exact) < 1e-6, s"pair ($a,$b)")
    }
    // the candidate-pruned verify path (the large-corpus plan) returns
    // the identical pair set
    val pruned = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.7,
      verifyOnlyCandidates = Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === pairs.toSet)
  }

  test("clusterRepresentatives: convergence is accumulator-folded, no extra count job per round") {
    // a 2-round convergence case: one edge + singletons (round 1 changes
    // a label, round 2 observes no change and stops). The convergence
    // decision must ride the round's own checkpoint jobs — the old
    // implementation ran a separate join+count() action per round, which
    // adds a clearly visible extra job block per round.
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val ids = (0L to 5L).toDF("id")
    val callSites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        callSites.add(Option(j.properties)
          .map(_.getProperty("callSite.short", "")).getOrElse(""))
    }
    spark.sparkContext.addSparkListener(listener)
    val reps = try {
      val r = Dedup.clusterRepresentatives(pairs, ids, "id")
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(reps === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    // every in-loop action is a localCheckpoint materialization; the old
    // implementation's separate convergence action showed up here as
    // "count at Dedup.scala:NNN" once per round
    import scala.jdk.CollectionConverters._
    val countJobs = callSites.asScala.filter(_.startsWith("count at Dedup"))
    assert(countJobs.isEmpty,
      s"convergence detection regressed to separate count() jobs: $countJobs")
  }

  test("minhashPairs auto verify mode: prunes at low dup rates, not at high") {
    def run(df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Boolean) = {
      val (pairsDf, pruned) = Dedup.minhashPairsWithMode(
        df, "text", "doc_id", 3, 128, 32, 0.7, 1000, None, None)
      (pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, pruned)
    }
    // low duplicate rate: 200 pairwise-dissimilar docs (every token is
    // doc-specific, so LSH surfaces only the planted candidates), 4
    // planted dups -> prune engages
    def words(i: Int): String =
      (0 until 12).map(j => "w" + graft.core.Hashing.mix64(i * 131L + j).toHexString).mkString(" ")
    val distinct = (0 until 200).map(i => (i.toLong, s"doc $i ${words(i)}"))
    val planted = (0 until 4).map(i => (1000L + i, s"doc $i ${words(i)} extra"))
    val low = (distinct ++ planted).toDF("doc_id", "text").repartition(3)
    val (lowPairs, lowPruned) = run(low)
    assert(lowPruned, "auto should prune at a low duplicate rate")
    assert(lowPairs === (0 until 4).map(i => (i.toLong, 1000L + i)).toSet)
    // high duplicate rate: every doc has 3 copies -> prune stays off
    val high = (0 until 60).flatMap(i => (0 until 3).map(c =>
      (i.toLong * 10 + c, s"shared content block $i lorem ipsum dolor sit amet consectetur")))
      .toDF("doc_id", "text").repartition(3)
    val (highPairs, highPruned) = run(high)
    assert(!highPruned, "auto should not prune at a high duplicate rate")
    assert(highPairs.size === 60 * 3) // 3 pairs per triple
    // forcing either mode returns the identical pair sets
    assert(Dedup.minhashPairs(high, "text", "doc_id", threshold = 0.7,
      verifyOnlyCandidates = Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === highPairs)
    assert(Dedup.minhashPairs(low, "text", "doc_id", threshold = 0.7,
      verifyOnlyCandidates = Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === lowPairs)

    // the auto decision costs exactly ONE eager execution (the candidate
    // count; the corpus row count rides it via observe) — a regression
    // to a separate base.count() would plan a second execution
    val execs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.incrementAndGet()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Dedup.minhashPairsWithMode(low, "text", "doc_id", 3, 128, 32, 0.7, 1000, None, None)
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(execs.get() === 1,
      s"auto verify-mode decision planned ${execs.get()} executions — " +
        "the corpus count must ride the candidate-count job via observe")
  }

  test("DataSplit: deterministic, partition-invariant, fraction-accurate, salt-sensitive") {
    val n = 10000
    val ids = (0 until n).map(_.toLong).toDF("id")
    val fracs = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = DataSplit.assign(ids, "id", fracs, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // partition-invariant and order-invariant: same labels after reshuffle
    val b = DataSplit.assign(ids.repartition(17).orderBy(col("id").desc), "id", fracs, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // exhaustive + sized within 4-sigma binomial bounds
    assert(a.size === n)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    for ((label, f) <- fracs) {
      val dev = 4 * math.sqrt(n * f * (1 - f))
      assert(math.abs(counts(label) - n * f) <= dev, s"$label: ${counts(label)}")
    }
    // salt re-rolls assignments
    val c = DataSplit.assign(ids, "id", fracs, "s2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.exists { case (k, v) => c(k) != v })
    // select == assign-then-filter, original columns only
    val train = DataSplit.select(ids, "id", fracs, "train", "s1")
    assert(train.columns.toSeq === Seq("id"))
    assert(train.collect().map(_.getLong(0)).toSet === a.collect { case (k, "train") => k }.toSet)
  }

  test("redactPii: sequential patterns, exact counts, java-regex reference agreement") {
    val rows = Seq(
      (1L, "write to jane.doe+spam@mail-host.co.uk or 10.0.0.255 now"),
      (2L, "card 4111111111111111 and ssn 123456789 but short 12345678"),
      (3L, "email inside digits 123456789a@b.io 999999999"),
      (4L, "no pii here at all"),
      (5L, "1.2.3.4 5.6.7.8 two ips, and 300.300.300.300 is still redacted by pattern"))
      .toDF("id", "text")
    val got = TextAnalysis.redactPii(rows, "text")
      .select("id", "redacted", "n_email", "n_ipv4", "n_longnum")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent reference: java.util.regex applied the same way
    def ref(t: String): (String, Long, Long, Long) = {
      var s = t
      val counts = TextAnalysis.piiPatterns.map { case (_, p, repl) =>
        val m = java.util.regex.Pattern.compile(p).matcher(s)
        var c = 0L
        while (m.find()) c += 1
        s = s.replaceAll(p, repl)
        c
      }
      (s, counts(0), counts(1), counts(2))
    }
    rows.collect().foreach { r =>
      assert(got(r.getLong(0)) === ref(r.getString(1)), s"id=${r.getLong(0)}")
    }
    // spot-check semantics: email swallowed its digits (not double-counted)
    assert(got(3L) === (("email inside digits <EMAIL> <NUM>", 1L, 0L, 1L)))
    assert(got(2L)._4 === 2L) // both long digit runs, not the 8-digit one
    assert(got(5L)._3 === 3L) // syntactic ipv4, including out-of-range octets
    // NULL text propagates
    val n = TextAnalysis.redactPii(Seq((1L, null: String)).toDF("id", "text"), "text")
      .select("redacted", "n_email").collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("surprisalScore: matches brute-force integer surprisal; empty and null docs") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "the the the"),
      (4L, "unique tokens here"),
      (5L, ""),
      (6L, null: String)).toDF("doc_id", "text")
    val got = TextAnalysis.surprisalScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // brute-force reference
    def ilog2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val corpus = Seq(
      1L -> "the cat sat", 2L -> "the dog sat", 3L -> "the the the",
      4L -> "unique tokens here", 5L -> "")
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val df = toks.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = 6L
    toks.foreach { case (id, ts) =>
      val total = ts.map(t => (ilog2(n) - ilog2(df(t))).toLong).sum
      assert(got(id) === ((ts.size.toLong, total, total * 1000 / ts.size)),
        s"doc $id")
    }
    // null text contributes no tokens but survives with zeros
    assert(got(6L) === ((0L, 0L, 0L)))
    // boilerplate scores lower than rare vocabulary (the filtering signal)
    assert(got(3L)._3 < got(4L)._3)
  }

  test("surprisal state: stored-df scoring == batch scoring; OOV rule; update == recompute") {
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the dog sat"), (3L, "rare words appear"))
      .toDF("doc_id", "text")
    val state = TextAnalysis.wordDf(corpus, "text", "doc_id")
    // in-vocabulary batch == the one-shot scorer restricted to it
    val whole = TextAnalysis.surprisalScore(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaState = TextAnalysis
      .surprisalScoreAgainst(corpus, "text", "doc_id", state, 3L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    whole.foreach { case (id, (nt, surp)) =>
      assert(viaState(id) === ((nt, 0L, surp)), s"doc $id")
    }
    // OOV tokens score as df = 1 and are counted
    val oovBatch = Seq((9L, "the zzznovel")).toDF("doc_id", "text")
    val r = TextAnalysis
      .surprisalScoreAgainst(oovBatch, "text", "doc_id", state, 3L)
      .head
    def ilog2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    assert(r.getLong(1) === 2L && r.getLong(2) === 1L)
    assert(r.getLong(3) ===
      (ilog2(3) - ilog2(2)) + (ilog2(3) - ilog2(1)).toLong)
    // update rule: fold an appended batch == recompute from scratch
    val batch = Seq((4L, "the cat returns")).toDF("doc_id", "text")
    val updated = TextAnalysis.updateWordDf(state, batch, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = TextAnalysis
      .wordDf(corpus.unionByName(batch), "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(updated === full)
  }

  test("stratifiedSample: deterministic, monotone in rate, rate-accurate, default + null strata") {
    val n = 10000
    val rows = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet
    val s1 = ids(DataSplit.stratifiedSample(rows, "id", "stratum",
      Map("a" -> 0.1, "b" -> 0.5), salt = "z"))
    // partition/order invariance
    val s2 = ids(DataSplit.stratifiedSample(
      rows.repartition(13).orderBy(col("id").desc), "id", "stratum",
      Map("a" -> 0.1, "b" -> 0.5), salt = "z"))
    assert(s1 === s2)
    // per-stratum sizes within 4-sigma binomial bounds
    val aKept = s1.count(_ % 2 == 0)
    val bKept = s1.count(_ % 2 == 1)
    assert(math.abs(aKept - n / 2 * 0.1) <= 4 * math.sqrt(n / 2 * 0.1 * 0.9), s"a: $aKept")
    assert(math.abs(bKept - n / 2 * 0.5) <= 4 * math.sqrt(n / 2 * 0.25), s"b: $bKept")
    // monotone: the 10% sample of stratum a is a SUBSET of the 40% sample
    val s3 = ids(DataSplit.stratifiedSample(rows, "id", "stratum",
      Map("a" -> 0.4, "b" -> 0.5), salt = "z"))
    assert(s1.filter(_ % 2 == 0).subsetOf(s3))
    // the scala-side sha256 recompute agrees exactly (engine-independence)
    val thr = DataSplit.hexThreshold(0.1)
    val expectA = (0 until n by 2).filter { i =>
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"${i}z".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString < thr
    }.map(_.toLong).toSet
    assert(s1.filter(_ % 2 == 0) === expectA)
    // unknown stratum -> defaultRate (1.0 keeps whole, 0.0 drops all)
    val mixed = (0 until 100).map(i => (i.toLong, if (i < 50) "a" else "zzz"))
      .toDF("id", "stratum")
    assert(ids(DataSplit.stratifiedSample(mixed, "id", "stratum", Map("a" -> 0.0)))
      === (50L until 100L).toSet)
    assert(ids(DataSplit.stratifiedSample(mixed, "id", "stratum",
      Map("a" -> 1.0), defaultRate = 0.0)) === (0L until 50L).toSet)
    // NULL stratum takes defaultRate; NULL key never sampled
    val withNulls = Seq((Some(1L), Some("a")), (Some(2L), None), (None, Some("a")))
      .toDF("id", "stratum")
    val kept = DataSplit.stratifiedSample(withNulls, "id", "stratum",
      Map("a" -> 1.0), defaultRate = 1.0)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(kept === Set(Some(1L), Some(2L)))
    // rate 1.0 keeps every non-null key even at the hex boundary
    assert(ids(DataSplit.stratifiedSample(rows, "id", "stratum",
      Map("a" -> 1.0, "b" -> 1.0))).size === n)
    intercept[IllegalArgumentException](
      DataSplit.stratifiedSample(rows, "id", "stratum", Map("a" -> 1.5)))
    intercept[IllegalArgumentException](
      DataSplit.stratifiedSample(rows, "id", "stratum", Map.empty[String, Double]))
  }

  test("DataSplit: hex thresholds and validation") {
    assert(DataSplit.hexThreshold(0.5) === "8" * 1 + "0" * 63)
    assert(DataSplit.hexThreshold(0.25) === "4" + "0" * 63)
    assert(DataSplit.hexThreshold(0.0) === "0" * 64)
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4))))
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq(("a", 0.5), ("a", 0.5))))
    intercept[IllegalArgumentException](
      DataSplit.select(docs, "doc_id", Seq(("a", 0.5), ("b", 0.5)), "zzz"))
    // single split: everything labeled
    val one = DataSplit.assign(docs, "doc_id", Seq(("all", 1.0)))
    assert(one.filter(col("split") === "all").count() === docs.count())
    // a sub-1e-9 tail fraction would silently merge the last two splits
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq(("a", 1.0), ("b", 1e-10))))
  }

  test("DataSplit: null keys get a null split, and select drops them") {
    val withNull = Seq(Some(1L), Some(2L), None).toDF("id")
    val fracs = Seq(("train", 0.5), ("test", 0.5))
    val labels = DataSplit.assign(withNull, "id", fracs)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        Option(r.getString(1))).toMap
    assert(labels(None) === None)
    assert(labels(Some(1L)).isDefined && labels(Some(2L)).isDefined)
    val selected = fracs.flatMap { case (l, _) =>
      DataSplit.select(withNull, "id", fracs, l).collect().map(_.isNullAt(0))
    }
    assert(selected.length === 2 && selected.forall(_ == false))
  }

  test("jaccardPairs: EXACTLY the brute-force all-pairs result (recall AND precision)") {
    // driver-side ground truth from the same kernels
    for (threshold <- Seq(0.5, 0.8); n <- Seq(2, 3)) {
      val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      val hs = rows.map { case (id, t) => id -> Dedup.shingleHashKernel(t, n) }.toMap
      val truth = (for {
        i <- rows.indices; j <- (i + 1) until rows.length
        a = math.min(rows(i)._1, rows(j)._1); b = math.max(rows(i)._1, rows(j)._1)
        jac = Dedup.jaccardSortedKernel(hs(a).toSeq, hs(b).toSeq)
        if jac >= threshold
        // Spark round() = HALF_UP decimal rounding, not rint
        rounded = BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      } yield (a, b, rounded)).toSet
      val got = Dedup.jaccardPairs(docs, "text", "doc_id", shingleN = n,
          threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === truth,
        s"n=$n t=$threshold missing=${truth -- got} extra=${got -- truth}")
      assert(truth.nonEmpty, s"vacuous test at n=$n t=$threshold")
    }
  }

  test("jaccardPairs: candidate generation is an equi-join on prefix tokens, never cartesian") {
    val plan = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix self-join degenerated to a cross join:\n$plan")
  }

  test("jaccardPairs: threshold 1.0 finds exactly the identical-shingle-set pairs") {
    val got = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2000L, 2001L)))
  }

  test("jaccardPairs: short/empty texts collapse to whole-text shingles, no crash") {
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, ""), (4L, "   "), (5L, "solo"))
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(tiny, "text", "doc_id", threshold = 0.9,
        persistShingleTable = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "" and "   " both shingle to [""] — jaccard 1.0; "a b" pair identical
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("contamination: exactly the brute-force containment pairs (fragments detected)") {
    val corpus = docs
    // benchmark: fragments of corpus docs (contained), plus novel text
    val corpusRows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val bench = (
      corpusRows.take(8).map { case (id, t) => (9000L + id, t.substring(0, t.length * 2 / 3)) } ++
      Seq((9900L, "completely unrelated benchmark question about topology"))
    ).toSeq.toDF("doc_id", "text")
    for (threshold <- Seq(0.6, 0.9)) {
      val benchRows = bench.collect().map(r => (r.getLong(0), r.getString(1)))
      val truth = (for {
        (ia, ta) <- corpusRows
        (ib, tb) <- benchRows
        ha = Dedup.shingleHashKernel(ta, 3)
        hb = Dedup.shingleHashKernel(tb, 3)
        inter = Dedup.intersectCountKernel(ha.toSeq, hb.toSeq)
        if inter.toDouble >= hb.length * threshold - 1e-9
      } yield (ia, ib, inter, hb.length.toLong)).toSet
      val got = Dedup.contamination(corpus, bench, "text", "doc_id", threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === truth, s"t=$threshold missing=${truth -- got} extra=${got -- truth}")
      assert(truth.nonEmpty, s"vacuous at t=$threshold")
      // the novel benchmark doc contaminates nothing
      assert(!got.exists(_._2 == 9900L))
    }
  }

  test("dedupAgainst: exactly the brute-force new-vs-corpus survivors") {
    val corpus = docs
    val collected = corpus.collect()
    // near-dups of corpus rows, one exact copy, and genuinely new texts
    val newBatch = (
      (0 until 50 by 7).map(i => (5000L + i, collected(i).getString(1) + " tail")) ++
      Seq((6000L, "identical text body")) ++ // exact corpus dup
      Seq((7000L, "a wholly new document about nothing else"),
          (7001L, "a wholly new document about nothing else")) // within-batch dup pair
    ).toDF("doc_id", "text")
    val corpusRows = collected.map(r => Dedup.shingleHashKernel(r.getString(1), 3))
    val newRows = newBatch.collect()
    for (threshold <- Seq(0.5, 0.8)) {
      val expected = newRows.filter { r =>
        val hs = Dedup.shingleHashKernel(r.getString(1), 3)
        !corpusRows.exists(c => Dedup.jaccardSortedKernel(hs.toSeq, c.toSeq) >= threshold)
      }.map(_.getLong(0)).toSet
      val got = Dedup.dedupAgainst(newBatch, corpus, "text", "doc_id", threshold = threshold)
        .select("doc_id").as[Long].collect().toSet
      assert(got === expected, s"t=$threshold")
      // within-batch duplicates are NOT collapsed by dedupAgainst
      assert(got.contains(7000L) && got.contains(7001L))
      assert(!got.contains(6000L)) // exact corpus dup dropped at any threshold
    }
  }

  test("dedupAgainst stored token-df state: identical survivors, exact update rule") {
    val corpus = docs
    val collected = corpus.collect()
    val newBatch = (
      (0 until 50 by 7).map(i => (5000L + i, collected(i).getString(1) + " tail")) ++
      Seq((6000L, "identical text body"),
          (7000L, "a wholly new document about nothing else"))
    ).toDF("doc_id", "text")

    // pipeline state from a corpus pass
    val state = Dedup.corpusTokenDf(corpus, "text", "doc_id")
    for (threshold <- Seq(0.5, 0.8)) {
      val recompute = Dedup.dedupAgainst(newBatch, corpus, "text", "doc_id",
        threshold = threshold).select("doc_id").as[Long].collect().toSet
      val stored = Dedup.dedupAgainst(newBatch, corpus, "text", "doc_id",
        threshold = threshold, tokenDfState = Some(state))
        .select("doc_id").as[Long].collect().toSet
      assert(stored === recompute, s"t=$threshold stored-df survivors diverged")

      // STALENESS: a state missing half the corpus (and all batch tokens)
      // must still yield identical survivors — order only shapes the
      // candidate set; the exact verify decides membership
      val staleState = Dedup.corpusTokenDf(corpus.filter(col("doc_id") < 25),
        "text", "doc_id")
      val stale = Dedup.dedupAgainst(newBatch, corpus, "text", "doc_id",
        threshold = threshold, tokenDfState = Some(staleState))
        .select("doc_id").as[Long].collect().toSet
      assert(stale === recompute, s"t=$threshold stale-state survivors diverged")
    }

    // update rule == full recompute over the appended corpus, token by token
    val updated = Dedup.updateTokenDf(state, newBatch, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Dedup.corpusTokenDf(corpus.unionByName(newBatch), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(updated === full)

    // wrong-shape state trips the loud precondition
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainst(newBatch, corpus, "text", "doc_id",
        tokenDfState = Some(corpus))
    }
    assert(e.getMessage.contains("corpusTokenDf"))
  }

  test("dedupJaccard one-call: exact recall keeps only component representatives") {
    val out = Dedup.dedupJaccard(docs, "text", "doc_id", threshold = 0.7)
    val kept = out.select("doc_id").as[Long].collect().toSet
    // every planted near-dup (threshold-0.7 jaccard with its base) and the
    // exact dup must be gone; their base representatives stay
    val plantedPairs = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plantedPairs.nonEmpty)
    plantedPairs.foreach { case (a, b) =>
      assert(kept.contains(a) ^ kept.contains(b) || (!kept.contains(a) && !kept.contains(b)),
        s"pair ($a,$b) not deduplicated")
    }
    assert(!kept.contains(2001L) && kept.contains(2000L))
  }

  test("bit-sliced simhash accumulator equals the per-bit reference, incl. ties") {
    // reference implementation: the straightforward signed per-bit
    // counters (the pre-optimization kernel) — the carry-save planes
    // must match BIT-IDENTICALLY, ties (acc == 0) folding to 0
    def reference(hashes: Seq[Long]): Long = {
      val acc = new Array[Int](64)
      hashes.foreach { h =>
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { trial =>
      val n = rnd.nextInt(200)
      val toks = (0 until n).map(_ => "t" + rnd.nextInt(40))
      val ref = reference(toks.map(graft.core.Hashing.hashString))
      assert(Dedup.simhashKernel(toks) === ref, s"trial $trial n=$n")
    }
    // even-count duplicate pairs force acc == 0 on every bit (tie case)
    assert(Dedup.simhashKernel(Seq("x", "y")) ===
      reference(Seq("x", "y").map(graft.core.Hashing.hashString)))
    assert(Dedup.simhashTextKernel("") === reference(Seq(graft.core.Hashing.hashString(""))))
  }

  test("dedupMinhash one-call: keeps component-min representatives only") {
    // base corpus with planted near-dups (suffix edits) and an exact pair
    val corpus = docs
    val deduped = Dedup.dedupMinhash(corpus, "text", "doc_id", threshold = 0.7)
    val keptIds = deduped.select("doc_id").as[Long].collect().toSet
    // every planted near-dup (id+1000) and the exact dup 2001 are dropped,
    // their originals kept
    (0 until 50 by 10).foreach { i =>
      assert(keptIds.contains(i.toLong), s"original $i kept")
      assert(!keptIds.contains(i.toLong + 1000), s"near-dup ${i + 1000} dropped")
    }
    assert(keptIds.contains(2000L) && !keptIds.contains(2001L))
    // non-duplicated docs all survive with their columns intact
    assert(deduped.columns.toSeq === corpus.columns.toSeq)
    assert(deduped.count() === corpus.count() - 5 - 1)
  }

  test("dedupSimhash one-call: exact duplicates collapse to the min-id representative") {
    val deduped = Dedup.dedupSimhash(docs, "text", "doc_id", maxDist = 0)
    val keptIds = deduped.select("doc_id").as[Long].collect().toSet
    // the exact pair (2000, 2001) has identical simhash: 2001 dropped
    assert(keptIds.contains(2000L) && !keptIds.contains(2001L))
    assert(deduped.columns.toSeq === docs.columns.toSeq)
    // at maxDist=0 only hash-identical docs collapse
    assert(deduped.count() < docs.count())
  }

  test("cluster representatives: transitive groups, singletons, convergence") {
    // chain 1-2, 2-3 (transitive), separate pair 10-11, singletons 20, 21
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    val reps = Dedup.clusterRepresentatives(pairs, ids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L, 20L -> 20L, 21L -> 21L))

    // a LONG chain: diameter 200 >> default maxIters 20, so plain
    // one-hop propagation would throw — pointer jumping must converge
    // in O(log 200) ~ 8 rounds
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainIds = (0L until 201L).toDF("id")
    val chainReps = Dedup.clusterRepresentatives(chain, chainIds)
      .collect().map(r => r.getLong(1)).distinct
    assert(chainReps === Array(0L), "whole chain is one component rooted at 0")

    // random graphs: equivalent to a driver-side union-find (3 seeds)
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val es = (0 until 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Dedup.clusterRepresentatives(
        es.toDF("id_a", "id_b"), (0L until n.toLong).toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed")
    }

    // empty pair table: everyone is their own representative
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val solo = Dedup.clusterRepresentatives(none, Seq(5L, 6L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(solo === Map(5L -> 5L, 6L -> 6L))
  }

  test("simhash near-dup pairs within hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(found.contains((2000L, 2001L))) // identical text -> distance 0
    pairs.foreach { case (_, _, d) => assert(d <= 3) }
    // planted near-dups differ by one token over ~80 -> simhash close
    val planted = (0 until 50 by 10).map(i => (i.toLong, i + 1000L)).toSet
    assert(planted.intersect(found).nonEmpty)
  }

  test("simhash banding covers all 64 bits for any maxDist (pigeonhole)") {
    // construct two ids whose simhashes differ ONLY in high bits; with
    // maxDist=2 (3 chunks of 21 bits + 22-bit top chunk) the top chunk
    // must still bucket them together when the low 42 bits agree
    for (maxDist <- Seq(1, 2, 3, 4, 5)) {
      val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // the exact-duplicate pair (hamming 0) must be found at EVERY maxDist
      assert(pairs.exists(p => p._1 == 2000L && p._2 == 2001L), s"maxDist=$maxDist")
      pairs.foreach { case (_, _, d) => assert(d <= maxDist) }
    }
  }

  test("shingle hash kernel matches the declarative shingles column") {
    // the long-array kernel must hash EXACTLY the string shingles the
    // `shingles` column produces (lowercase, trim, \s+ split, n-windows)
    val texts = Seq(
      "The quick  brown\tfox jumps.",
      "  leading and trailing  ",
      "one two",
      "one",
      "",
      "a\nb\r\nc d e  f")
    val df = texts.toDF("text")
    val viaColumn = df.select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).map(graft.core.Hashing.hashString).distinct.sorted)
    val viaKernel = texts.map(t => Dedup.shingleHashKernel(t, 3).toSeq)
    viaColumn.zip(viaKernel).zip(texts).foreach { case ((c, k), t) =>
      assert(c.toSeq === k, s"text=<$t>")
    }
  }

  test("sorted-long jaccard kernel matches set arithmetic") {
    val r = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val a = Seq.fill(r.nextInt(30) + 1)(r.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(r.nextInt(30) + 1)(r.nextInt(40).toLong).distinct.sorted
      val expected = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
      assert(Dedup.jaccardSortedKernel(a, b) === expected)
    }
  }

  test("maxBucket skew cap is reported via the droppedBuckets accumulator") {
    // 30 identical docs -> every band bucket has 30 members > maxBucket=10
    val many = (0 until 30).map(i => (i.toLong, "same text for every doc here"))
      .toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("dropped")
    val pairs = Dedup.minhashPairs(many, "text", "doc_id",
      maxBucket = 10, droppedBuckets = Some(acc))
    assert(pairs.count() === 0) // all buckets capped away
    assert(acc.value > 0, "drop count must surface")

    val acc2 = spark.sparkContext.longAccumulator("dropped2")
    val pairs2 = Dedup.simhashPairs(many, "text", "doc_id",
      maxBucket = 10, droppedBuckets = Some(acc2))
    assert(pairs2.count() === 0)
    assert(acc2.value > 0)
  }

  test("embeddingPairsExact refuses inputs above the row guard") {
    val df = (0 until 20).map(i => (i.toLong, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingPairsExact(df, "embedding", "vec_id", 0.9, maxRows = 10)
    }
    assert(e.getMessage.contains("O(n^2)"))
    // under the guard it works
    assert(Dedup.embeddingPairsExact(df, "embedding", "vec_id", 0.9, maxRows = 100)
      .count() > 0)
  }

  test("lshCatchProbability: monotone in cosine, bits lower it, tables raise it") {
    val p1 = Dedup.lshCatchProbability(0.99, 10, 16)
    val p2 = Dedup.lshCatchProbability(0.90, 10, 16)
    assert(p1 > p2)
    assert(Dedup.lshCatchProbability(0.99, 16, 16) < p1)
    assert(Dedup.lshCatchProbability(0.99, 10, 32) > p1)
    assert(p1 > 0.999999, s"defaults must catch near-dups: $p1")
  }

  test("IVF ANN: recall >= 0.8 on clustered data, deterministic centroids") {
    val r = new scala.util.Random(5)
    val centers = Array.tabulate(5)(_ => Array.fill(16)(r.nextGaussian()))
    val vecs = (0 until 500).map { i =>
      (i.toLong, centers(i % 5).map(x => x + r.nextGaussian() * 0.1).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val query = vecs(0)._2
    val centroids = Similarity.kmeansCentroids(df, "embedding", "vec_id", 5, iters = 4)
    assert(centroids.length === 5)
    val index = Similarity.ivfIndex(df, "embedding", "vec_id", centroids)
    val ann = Similarity.ivfTopK(index, "embedding", query, centroids, 10, nprobe = 2)
    val exact = Similarity.bruteForceTopK(df, "embedding", "vec_id", query, 10)
    val recall = Similarity.recallAtK(ann, exact)
    assert(recall >= 0.8, s"recall=$recall")
    // centroid init is deterministic: same input under another
    // partitioning picks the same seeds
    val centroids2 = Similarity.kmeansCentroids(
      df.repartition(7), "embedding", "vec_id", 5, iters = 0)
    val init1 = Similarity.kmeansCentroids(df, "embedding", "vec_id", 5, iters = 0)
    assert(centroids2.map(_.toSeq).toSeq === init1.map(_.toSeq).toSeq)
    df.unpersist()
  }

  test("persisted LSH index returns the identical top-k as the direct path") {
    val r = new scala.util.Random(11)
    val centers = Array.tabulate(5)(_ => Array.fill(16)(r.nextGaussian()))
    val vecs = (0 until 400).map { i =>
      (i.toLong, centers(i % 5).map(x => x + r.nextGaussian() * 0.1).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val query = vecs(0)._2
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString + "/idx"
    Similarity.writeIndex(df, "embedding", "vec_id", 10, dir)
    val direct = Similarity.lshTopK(df, "embedding", "vec_id", query, 10, nPlanes = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val indexed = Similarity.lshTopKIndexed(
      Similarity.readIndex(spark, dir), "embedding", query, 10, nPlanes = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(indexed === direct)
    // the index query's bucket probes PUSH DOWN to the parquet scan —
    // the write-once/serve-many shape only pays off if each query reads
    // only its matching row groups instead of rescanning the corpus
    val probedScan = Similarity.readIndex(spark, dir)
      .filter(col("bucket").isin(Similarity.probeBuckets(query, 10): _*))
    val formatted = probedScan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") && formatted.contains("In(bucket"),
      s"bucket probes not pushed to the parquet scan:\n$formatted")
  }

  test("persisted IVF index: identical top-k to the in-session path, centroids round-trip") {
    val r = new scala.util.Random(23)
    val centers = Array.tabulate(4)(_ => Array.fill(12)(r.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      (i.toLong, centers(i % 4).map(x => x + r.nextGaussian() * 0.1).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val query = vecs(1)._2
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    val built = Similarity.writeIvfIndex(df, "embedding", "vec_id", k = 4, dir)
    val (index, loaded) = Similarity.readIvfIndex(spark, dir)
    assert(loaded.length === built.length)
    built.zip(loaded).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    val direct = Similarity.ivfTopK(
      Similarity.ivfIndex(df, "embedding", "vec_id", built),
      "embedding", query, built, k = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val persisted = Similarity.ivfTopK(index, "embedding", query, loaded, k = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(persisted === direct)
    // the probe predicate reaches the parquet scan of the lists table
    val probePlan = index.filter(col("list").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PushedFilters") && probePlan.contains("list"),
      s"probe filter not pushed:\n$probePlan")
  }

  test("quantized IVF index: ~4x smaller lists table, recall >= 0.7 vs brute force") {
    val r = new scala.util.Random(29)
    val centers = Array.tabulate(4)(_ => Array.fill(16)(r.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      (i.toLong, centers(i % 4).map(x => x + r.nextGaussian() * 0.08).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("graft-qivf").toString
    val built = Similarity.writeIvfIndexQuantized(df, "embedding", "vec_id", k = 4, s"$base/q")
    Similarity.writeIvfIndex(df, "embedding", "vec_id", k = 4, s"$base/f")
    def bytesUnder(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val qBytes = bytesUnder(s"$base/q/lists")
    val fBytes = bytesUnder(s"$base/f/lists")
    assert(qBytes < fBytes / 2, s"quantized lists $qBytes vs float $fBytes")
    val (index, loaded) = Similarity.readIvfIndex(spark, s"$base/q")
    assert(index.columns.contains("vec8") && !index.columns.contains("embedding"))
    // recall vs the float brute-force dot-product top-k
    (0 until 3).foreach { qi =>
      val query = vecs(qi)._2
      val got = Similarity.ivfTopKQuantized(index, query, loaded, k = 10, nprobe = 2)
        .collect().map(_.getLong(0)).toSet
      val truth = vecs
        .map { case (id, v) => id -> v.zip(query).map { case (a, b) => a * b }.sum }
        .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet
      val overlap = got.intersect(truth).size / 10.0
      assert(overlap >= 0.7, s"query $qi recall $overlap")
    }
  }

  test("simhash text kernel matches the token-sequence kernel exactly") {
    val texts = Seq(
      "The quick  brown\tfox",
      "  leading and trailing  ",
      "one",
      "",
      "   ",
      "a\nb\r\nc d")
    texts.foreach { t =>
      val viaTokens = Dedup.simhashKernel(
        t.trim.toLowerCase.split("\\s+").toSeq)
      assert(Dedup.simhashTextKernel(t) === viaTokens, s"text=<$t>")
    }
  }

  test("simhash kernel: hamming grows with edit size") {
    val a = Dedup.simhashKernel("a b c d e f g h i j".split(" ").toSeq)
    val b = Dedup.simhashKernel("a b c d e f g h i k".split(" ").toSeq)
    val c = Dedup.simhashKernel("z y x w v u t s r q".split(" ").toSeq)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) < ham(a, c))
  }

  test("embedding cosine pairs match a driver-side exact computation") {
    val vecs = (0 until 30).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i * 0.37 + d).toFloat)
      (i.toLong, base.toSeq)
    }
    // plant: 100+i = same direction as i (scaled) -> cosine 1.0
    val planted = (0 until 30 by 7).map { i =>
      (100L + i, vecs(i)._2.map(x => x * 2.0f))
    }
    val df = (vecs ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "embedding", "vec_id", 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 30 by 7).foreach(i => assert(pairs.contains((i.toLong, 100L + i)), s"i=$i"))
  }

  test("brute-force cosine top-k deterministic and correct") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(i * 0.13 + d * 0.7)).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val query = vecs(5)._2
    val top = Similarity.bruteForceTopK(df, "embedding", "vec_id", query, 5).collect()
    assert(top.head.getLong(0) === 5L) // self is most similar
    assert(top.head.getDouble(1) === 1.0)
    // scores non-increasing
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("LSH ANN recall >= 0.6 vs brute force on clustered data") {
    val r = new scala.util.Random(3)
    val centers = Array.tabulate(5)(_ => Array.fill(16)(r.nextGaussian()))
    val vecs = (0 until 500).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + r.nextGaussian() * 0.1).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val query = vecs(0)._2
    val exact = Similarity.bruteForceTopK(df, "embedding", "vec_id", query, 10)
    val ann = Similarity.lshTopK(df, "embedding", "vec_id", query, 10, nPlanes = 10)
    val recall = Similarity.recallAtK(ann, exact)
    assert(recall >= 0.6, s"recall=$recall")
    df.unpersist()
  }

  test("text analysis: token counts and quality stats") {
    val df = Seq(
      ("hello world foo", 3),
      ("  spaced   out  ", 2),
      ("", 0),
      ("one", 1)).toDF("text", "expected")
    val rows = df.select(TextAnalysis.token_count(col("text")).as("n"), col("expected")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))

    val q = Seq("A clean English sentence with normal words.")
      .toDF("text").select(TextAnalysis.quality_score(col("text"))).head.getDouble(0)
    val junk = Seq("!!! ### $$$ %%% ^^^ &&& *** ((( )))")
      .toDF("text").select(TextAnalysis.quality_score(col("text"))).head.getDouble(0)
    assert(q > junk)

    val stats = Seq("abc 123 !?").toDF("text")
      .select(TextAnalysis.quality_stats(col("text")).as("s"))
      .selectExpr("s.n_chars", "s.n_tokens", "s.alpha_ratio", "s.digit_ratio").head
    assert(stats.getLong(0) === 10L && stats.getLong(1) === 3L)
    assert(stats.getDouble(2) === 0.3 && stats.getDouble(3) === 0.3)
  }

  test("topTokens: exact MG head when vocabulary fits k, bounds otherwise") {
    val corpus = (0 until 300).map { i =>
      // "alpha" in every doc, "beta" in half, "gamma" in a tenth, noise id
      val parts = Seq("alpha") ++ (if (i % 2 == 0) Seq("beta") else Nil) ++
        (if (i % 10 == 0) Seq("gamma") else Nil) ++ Seq(s"noise$i")
      parts.mkString(" ")
    }.toDF("text")
    // k larger than the vocabulary: exact counts
    val exact = TextAnalysis.topTokens(corpus, "text", k = 1024, m = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact(0) === (("alpha", 300L, 300L)))
    assert(exact(1) === (("beta", 150L, 150L)))
    assert(exact(2) === (("gamma", 30L, 30L)))
    // k smaller than the vocabulary: the heavy head still surfaces with
    // truth inside the interval (alpha freq 300 >> n/(k+1))
    val bounded = TextAnalysis.topTokens(corpus, "text", k = 16, m = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bounded(0)._1 === "alpha")
    assert(bounded(0)._2 <= 300L && 300L <= bounded(0)._3)
  }

  test("language id picks the right language on clear samples") {
    assert(TextAnalysis.detectLanguage(
      "the cat and the dog sat on the mat with a hat for the fun of it")._1 === "en")
    assert(TextAnalysis.detectLanguage(
      "der Hund und die Katze sind mit dem Ball von einem Haus nicht weit")._1 === "de")
    assert(TextAnalysis.detectLanguage(
      "le chat et le chien sont dans la maison pour une bonne raison")._1 === "fr")
    assert(TextAnalysis.detectLanguage("")._1 === "und")
    // Spark column form
    val langs = Seq("the quick brown fox and the lazy dog with the hat")
      .toDF("text").select(TextAnalysis.lang_id(col("text")).getField("lang")).head.getString(0)
    assert(langs === "en")
  }

  test("document fingerprint: deterministic, text-sensitive") {
    val a = TextAnalysis.fingerprintKernel("some reasonably long document text body here")
    val b = TextAnalysis.fingerprintKernel("some reasonably long document text body here")
    val c = TextAnalysis.fingerprintKernel("a completely different document body")
    assert(a === b); assert(a !== c)
    val viaSpark = Seq("some reasonably long document text body here").toDF("t")
      .select(TextAnalysis.doc_fingerprint(col("t"))).head.getLong(0)
    assert(viaSpark === a)
  }

  test("media_frame_stats through Catalyst: per-frame rows match the synthesis formula") {
    graft.sql.Registry.register(spark)
    val media = Multimodal.attachRealMedia(docs.limit(30), "doc_id")
    media.createOrReplaceTempView("mfs_media")
    // SQL surface (codegen path): explode the per-frame stats
    val rows = spark.sql(
      """SELECT media_id, pos AS frame_idx, st.n, st.sum
        |FROM mfs_media
        |LATERAL VIEW posexplode(media_frame_stats(payload)) AS pos, st
        |WHERE kind = 'video'""".stripMargin)
      .collect()
    assert(rows.nonEmpty && rows.length % 4 === 0)
    rows.foreach { r =>
      val id = r.getLong(0)
      val f = r.getInt(1)
      val w = 32 + (id * 7919 % 128)
      val h = 32 + (id * 4241 % 96)
      assert(r.getLong(2) === w * h, s"n id=$id f=$f")
      val expSum = w * (0L until h).map(y => (id + f + y / 8) % 256).sum
      assert(r.getLong(3) === expSum, s"sum id=$id f=$f")
    }
    // non-video payloads: NULL through the expression
    val nulls = spark.sql(
      "SELECT count(*) FROM mfs_media WHERE kind <> 'video' AND media_frame_stats(payload) IS NOT NULL")
      .head.getLong(0)
    assert(nulls === 0L)
  }

  test("multimodal REAL decode: attachRealMedia payloads parse back to the id-derived meta") {
    val media = Multimodal.attachRealMedia(docs, "doc_id")
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "kind", "payload", "source"))
    val rows = media
      .withColumn("meta", graft.functions.media_meta(col("payload")))
      .selectExpr("media_id", "kind", "meta.format", "meta.width", "meta.height",
        "meta.channels", "meta.duration_ms", "meta IS NULL AS unparsed")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      r.getString(1) match {
        case "image" =>
          assert(!r.getBoolean(7))
          assert(r.getString(2) === (if (id % 2 == 0) "png" else "jpeg"))
          assert(r.getInt(3) === 32 + (id * 7919 % 608).toInt, s"width id=$id")
          assert(r.getInt(4) === 32 + (id * 4241 % 448).toInt, s"height id=$id")
          assert(r.getLong(6) === 0L)
        case "audio" =>
          assert(!r.getBoolean(7))
          assert(r.getString(2) === "wav" && r.getInt(5) === 1)
          assert(r.getLong(6) === 1000 + id * 31 % 60000, s"duration id=$id")
        case "video" =>
          assert(!r.getBoolean(7))
          assert(r.getString(2) === "mp4")
          assert(r.getInt(3) === 32 + (id * 7919 % 608).toInt, s"mp4 width id=$id")
          assert(r.getInt(4) === 32 + (id * 4241 % 448).toInt, s"mp4 height id=$id")
          assert(r.getLong(6) === 1000 + id * 31 % 60000, s"mp4 duration id=$id")
      }
    }
    // SQL names round-trip too
    media.createOrReplaceTempView("mm_real")
    val viaSql = spark.sql(
      "SELECT count(*) FROM mm_real WHERE media_meta(payload) IS NULL")
      .head().getLong(0)
    assert(viaSql === 0L)
  }

  test("multimodal: fake decode plumbing, batch features, frame sampling") {
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "source"))
    // decode meta consistent with the documented fake (length-derived)
    val m = media.withColumn("meta",
      Multimodal.decode_meta(col("payload"), col("kind")))
      .selectExpr("media_id", "octet_length(payload) AS len",
        "meta.width", "meta.height").collect()
    m.foreach { r =>
      assert(r.getInt(2) === 32 + (r.getInt(1) % 608))
      assert(r.getInt(3) === 32 + ((r.getInt(1) * 7) % 448))
    }
    // resize preserves aspect bound
    val resized = media.withColumn("meta",
        Multimodal.resize_meta(Multimodal.decode_meta(col("payload"), col("kind")), 224, 224))
      .selectExpr("meta.width", "meta.height").collect()
    resized.foreach(r => assert(r.getInt(0) <= 224 && r.getInt(1) <= 224))

    // feature extraction: fixed width, deterministic
    val ds = Multimodal.mediaDataset(spark, docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(ds, batchSize = 16).collect()
    assert(feats.length === docs.count())
    assert(feats.forall(_.feature.length === 8))
    val feats2 = Multimodal.extractFeatures(ds, batchSize = 7).collect()
    assert(feats.sortBy(_.media_id).zip(feats2.sortBy(_.media_id))
      .forall { case (x, y) => x.feature.toSeq == y.feature.toSeq })

    // frame sampling only for video rows, deterministic count
    val frames = Multimodal.sampleFrames(media.toDF(), everyMs = 5000)
    val videoIds = media.filter(col("kind") === "video").count()
    assert(frames.select("media_id").distinct().count() === videoIds)
  }

  test("multimodal REAL features: decoded-sample statistics for ALL FOUR container formats") {
    val media = Multimodal.attachRealMedia(docs, "doc_id").as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media, batchSize = 16)
      .collect().map(f => f.media_id -> f.feature).toMap
    val payloads = media.collect().map(r => r.media_id -> (r.kind, r.payload)).toMap
    assert(feats.keySet === payloads.keySet)
    payloads.foreach { case (id, (kind, payload)) =>
      val f = feats(id)
      // EVERY attachRealMedia payload decodes now (PNG, baseline JPEG,
      // WAV PCM, MP4 'twos' PCM sound track): exact stats, tag 1
      val s = MediaCodecs.decodeContent(payload)
        .getOrElse(fail(s"payload id=$id kind=$kind did not decode"))
      val mean = s.sum.toDouble / s.n
      assert(f(0) === mean.toFloat, s"mean id=$id")
      assert(f(1) === math.sqrt(s.sumsq.toDouble / s.n).toFloat, s"rms id=$id")
      assert(f(2) === (s.sumsq.toDouble / s.n - mean * mean).toFloat, s"var id=$id")
      assert(f(3) === math.log1p(s.n.toDouble).toFloat && f(7) === 1f)
      // MP4 stats combine the PCM sound track (same formula as WAV:
      // sample(j) = (id % 64) + (j % 16) over duration_ms * 8) with the
      // Motion-JPEG track's 4 block-constant frames
      // (pixel(x, y, f) = (id + f + y/8) % 256 — lossy codec exact)
      if (kind == "video") {
        // CODED frame size (smaller than the tkhd presentation size)
        val w = 32 + (id * 7919 % 128)
        val h = 32 + (id * 4241 % 96)
        val pcmN = (1000 + id * 31 % 60000) * 8
        val base = id % 64
        val per = pcmN / 16
        val rem = pcmN % 16
        val pcmSum = (0 until 16).map(r =>
          (per + (if (r < rem) 1L else 0L)) * (base + r)).sum
        val frameSum = w * (for {
          f <- 0L until 4L; y <- 0L until h
        } yield (id + f + y / 8) % 256).sum
        assert(s.n === pcmN + 4 * w * h, s"mp4 n id=$id")
        assert(s.sum === pcmSum + frameSum, s"mp4 sum id=$id")
      }
      // JPEG (odd-id images): the lossy codec is EXACT on the
      // block-constant synth — decoded sum equals the closed form
      // pixel(x, y) = (id + y/8) % 256 over the w x h crop
      if (kind == "image" && id % 2 == 1) {
        val w = 32 + (id * 7919 % 608)
        val h = 32 + (id * 4241 % 448)
        assert(s.n === w * h, s"jpeg n id=$id")
        val expSum = w * (0L until h).map(y => (id + y / 8) % 256).sum
        val expSq = w * (0L until h).map { y =>
          val v = (id + y / 8) % 256; v * v
        }.sum
        assert(s.sum === expSum && s.sumsq === expSq, s"jpeg stats id=$id")
      }
    }
    // the tag-0 (fake) path still exists for payloads that are NOT real
    // containers — an opaque blob must keep the honesty tag honest
    val opaque = Multimodal.MediaRow(999L, "image",
      "not a container".getBytes("UTF-8"), "synthetic")
    val fOpaque = Multimodal.extractFeatures(
      spark.createDataset(Seq(opaque))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .collect().head.feature
    assert(fOpaque(7) === 0f)
  }

  // -------------------------------------------------------- semantic dedup

  test("vec_normalize: unit norm, zeros stay zeros, scaled copies bit-identical") {
    import graft.expr.VectorKernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(9)
    (0 until 30).foreach { _ =>
      val v = Array.fill(16)(rnd.nextFloat() * 4 - 2)
      val n = VectorKernels.normalize(
        new GenericArrayData(v.map(_.toDouble)), isFloat = false)
      val mag = math.sqrt((0 until 16).map(i => n.getDouble(i) * n.getDouble(i)).sum)
      assert(math.abs(mag - 1.0) < 1e-12)
      // x and 2x normalize to the SAME doubles (exact IEEE argument in
      // the kernel scaladoc) — the planted-duplicate co-clustering pin
      val n2 = VectorKernels.normalize(
        new GenericArrayData(v.map(x => (x * 2.0f).toDouble)), isFloat = false)
      assert((0 until 16).forall(i => n.getDouble(i) == n2.getDouble(i)))
    }
    val z = VectorKernels.normalize(
      new GenericArrayData(Array.fill(4)(0.0)), isFloat = false)
    assert((0 until 4).forall(i => z.getDouble(i) == 0.0))
  }

  test("dedupSemantic drops planted scaled copies, keeps the rest, caps cluster size") {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(5)(Array.fill(12)(rnd.nextDouble() * 4 - 2))
    val corpus = (0 until 150).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(_ + rnd.nextDouble() * 0.45).toSeq)
    }
    // planted: x3-scaled copies of every 10th vector (cosine exactly 1)
    val planted = corpus.filter(_._1 % 10 == 0)
      .map { case (id, v) => (id + 1000, v.map(_ * 3.0)) }
    val df = (corpus ++ planted).toDF("vec_id", "embedding").repartition(6)
    val res = Dedup.dedupSemantic(df, "embedding", "vec_id", k = 5,
      threshold = 0.999, iters = 3)
    val rows = res.collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.length == corpus.length + planted.length)
    val dropped = rows.filterNot(_._3).map(_._1).toSet
    // every planted copy is dropped (its source has the smaller id);
    // natural near-ties above 0.999 may add more drops but never remove
    assert(planted.map(_._1).toSet.subsetOf(dropped))
    assert(!dropped.exists(_ < 1000) || {
      // any natural drop must genuinely have a smaller-id 0.999-neighbor
      val vecs = corpus.toMap
      dropped.filter(_ < 1000).forall { id =>
        corpus.exists { case (oid, ov) =>
          oid < id && {
            val v = vecs(id)
            val dot = v.zip(ov).map { case (a, b) => a * b }.sum
            val na = math.sqrt(v.map(x => x * x).sum)
            val nb = math.sqrt(ov.map(x => x * x).sum)
            dot / (na * nb) >= 0.9985 // generous slack for engine rounding
          }
        }
      }
    })
    // a copy lands in the SAME cluster as its source (bit-identical after
    // normalization)
    val byId = rows.map(r => r._1 -> r._2).toMap
    planted.foreach { case (cid, _) => assert(byId(cid) == byId(cid - 1000)) }
    // the size guard is loud
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupSemantic(df, "embedding", "vec_id", k = 2,
        threshold = 0.9, maxClusterSize = 10)
    }
    assert(e.getMessage.contains("raise k"))
  }
}
