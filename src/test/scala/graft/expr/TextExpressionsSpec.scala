package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.TextAnalysis

class TextExpressionsSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog and the cat",
    "der hund und die katze sind nicht in der stadt",
    "short",
    "",
    "a longer document body with enough characters for sixteen-gram windows")

  test("doc_fingerprint expression matches the String kernel") {
    val rows = texts.toDF("t")
      .select(col("t"), TextAnalysis.doc_fingerprint(col("t")).as("fp"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === TextAnalysis.fingerprintKernel(r.getString(0)))
    }
  }

  test("lang_id expression matches detectLanguage and stays in codegen") {
    // repartition first: otherwise ConvertToLocalRelation folds the whole
    // projection into a LocalTableScan and there is no stage to inspect
    val df = texts.toDF("t").repartition(2).select(
      col("t"),
      TextAnalysis.lang_id(col("t")).as("li"),
      TextAnalysis.doc_fingerprint(col("t")).as("fp"))
    df.collect().foreach { r =>
      val (lang, conf) = TextAnalysis.detectLanguage(r.getString(0))
      assert(r.getStruct(1).getString(0) === lang)
      assert(math.abs(r.getStruct(1).getDouble(1) - conf) < 1e-12)
    }
    // both expressions sit inside a WholeStageCodegen span (no UDF break)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage in:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"))
  }

  test("short multibyte text: character-count guard matches the String kernel") {
    // 10 chars but 30 UTF-8 bytes: must hash whole, never window bytes
    val cjk = Seq("文書の指紋計算テスト",
      "café naïve résumé", "ü" * 15, "ü" * 16)
    val rows = cjk.toDF("t").repartition(2)
      .select(col("t"), TextAnalysis.doc_fingerprint(col("t")).as("fp")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === TextAnalysis.fingerprintKernel(r.getString(0)),
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("astral (supplementary-plane) text: both kernels guard on code points") {
    // U+1D54F is one code point, TWO UTF-16 units, FOUR UTF-8 bytes: a
    // UTF-16-length guard would window these while numChars hashes whole
    val astral = Seq(
      "𝕏" * 10, // 10 code points, 20 UTF-16 units, 40 bytes
      "𝕏" * 15, // 15 code points — still under the window size
      "𝕏" * 16, // exactly at the window size: must window
      "𝕏" * 20,
      ("𝕏" * 8) + "plain tail text here")
    val rows = astral.toDF("t").repartition(2)
      .select(col("t"), TextAnalysis.doc_fingerprint(col("t")).as("fp")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === TextAnalysis.fingerprintKernel(r.getString(0)),
        s"kernel divergence for ${r.getString(0).codePointCount(0, r.getString(0).length)} code points")
    }
    // the <16-code-point cases hash the WHOLE text (no windowing): equal
    // to the direct whole-string hash
    assert(TextAnalysis.fingerprintKernel("𝕏" * 10) ===
      graft.core.Hashing.hashString("𝕏" * 10))
  }

  test("NULL text yields NULL (SQL semantics)") {
    val r = Seq[String](null).toDF("t")
      .select(TextAnalysis.doc_fingerprint(col("t")), TextAnalysis.lang_id(col("t")))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL-registered names") {
    texts.toDF("t").createOrReplaceTempView("text_expr_t")
    val rows = spark.sql(
      """SELECT doc_fingerprint(t) AS fp, lang_id(t).lang AS lang
        |FROM text_expr_t WHERE t <> ''""".stripMargin).collect()
    assert(rows.length === 4)
    assert(rows.forall(!_.isNullAt(0)))
  }

  test("type check rejects non-string input") {
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(TextAnalysis.doc_fingerprint(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("text_repetition matches a brute-force n-gram reference") {
    def ref(t: String): (Long, Long, Long, Long, Long, Long) = {
      val ws = t.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty).toSeq
      val bi = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tri = ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val biCounts = bi.groupBy(identity).view.mapValues(_.size).toMap
      val triCounts = tri.groupBy(identity).view.mapValues(_.size).toMap
      (ws.size.toLong, ws.distinct.size.toLong,
        if (biCounts.isEmpty) 0L else biCounts.values.max.toLong, bi.size.toLong,
        triCounts.values.filter(_ > 1).sum.toLong, tri.size.toLong)
    }
    val cases = Seq(
      "a b a b a b a b",                       // heavy bigram repetition
      "x y z x y z x y z",                     // repeated trigram
      "all distinct words in this one here",   // no repetition
      "solo",                                  // 1 word: no n-grams
      "two words",                             // bigram but no trigram
      "",                                      // blank
      "  padded   with   runs  of spaces  ",   // whitespace runs
      "\ttab\nand newline\r\nseparated x\ttab",// pinned separator class
      "a a a a a a a a a a")                   // single repeated word
    val got = cases.toDF("t").repartition(2)
      .select(col("t"), TextAnalysis.text_repetition(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    cases.foreach { t =>
      val e = ref(t)
      val g = got(t)
      assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3),
        g.getLong(4), g.getLong(5)) === e, s"text='$t'")
    }
    // NULL propagates; SQL name registered; codegen stage survives
    val r = Seq[String](null).toDF("t")
      .select(TextAnalysis.text_repetition(col("t"))).head()
    assert(r.isNullAt(0))
    cases.toDF("t").createOrReplaceTempView("text_rep_t")
    val viaSql = spark.sql(
      "SELECT text_repetition(t).n_words AS n FROM text_rep_t").collect()
    assert(viaSql.map(_.getLong(0)).sum === cases.map(c => ref(c)._1).sum)
    // collect() first: AQE finalizes stages lazily, and the pre-execution
    // executedPlan string carries no WholeStageCodegen markers
    val planDf = cases.toDF("t").repartition(2)
      .select(TextAnalysis.text_repetition(col("t")))
    planDf.collect()
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage in:\n$plan")
    assert(!plan.contains("ScalaUDF"))
  }

  test("gopher_signals matches a brute-force reference") {
    // independent recomputation in collection-idiom Scala (the kernel is
    // imperative single-pass): every field cross-checked per case
    def ref(t: String): Seq[Long] = {
      val ws = t.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty).toSeq
      val nWords = ws.size.toLong
      val sumWordChars = ws.map(w => w.codePointCount(0, w.length).toLong).sum
      val nAlpha = ws.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val stops = TextKernels.GopherStopwords.toSet
      val asciiLower = (w: String) =>
        w.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      val nStop = ws.map(asciiLower).toSet.count(stops.contains).toLong
      val nHash = t.count(_ == '#').toLong
      // non-overlapping left-greedy scan for '...' plus '…' occurrences
      var nEll = t.count(_ == '…').toLong
      var i = 0
      while (i <= t.length - 3) {
        if (t.charAt(i) == '.' && t.charAt(i + 1) == '.' && t.charAt(i + 2) == '.') {
          nEll += 1; i += 3
        } else i += 1
      }
      val lines = t.split("\n", -1).toSeq
      val nLines = lines.size.toLong
      val strip = (s: String, fromEnd: Boolean) =>
        if (fromEnd) s.reverse.dropWhile(c => c == ' ' || c == '\t').reverse
        else s.dropWhile(c => c == ' ' || c == '\t')
      val nBullet = lines.count { l =>
        val s = strip(l, false)
        s.nonEmpty && "-*•".contains(s.head)
      }.toLong
      val nEllLines = lines.count { l =>
        val s = strip(l, true)
        s.endsWith("…") || s.endsWith("...")
      }.toLong
      val lineChars = lines.map(l => l.codePointCount(0, l.length).toLong)
      val sumLineChars = lineChars.sum
      val counts = lines.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nDup = counts.values.filter(_ > 1).sum
      val dupChars = counts.collect { case (l, c) if c > 1 =>
        c * l.codePointCount(0, l.length).toLong }.sum
      Seq(nWords, sumWordChars, nAlpha, nStop, nHash, nEll,
        nLines, nBullet, nEllLines, nDup, dupChars, sumLineChars)
    }
    val cases = Seq(
      "the data have to be analyzed with care and that is all",
      "no stopword here just plain tokens",
      "- bullet one\n- bullet one\n* bullet two\nplain line",
      "trailing dots...\nand unicode ellipsis…\nand a … mid word",
      "# one ## two ### three",
      "....",                               // one '...' then a lone dot
      "…...",                               // '…' then '...'
      "..…..",                              // no '...' across the '…'
      "dup line\ndup line\ndup line\nunique",
      "  \t  ",                             // whitespace only
      "",                                   // empty: 1 line, 0 words
      "ends with newline\n",                // trailing empty line segment
      "THE With HAVE of",                   // case-folded stopwords
      "the WİTH and",                       // U+0130: NOT a stop word under
                                            // ASCII folding (DuckDB lower()
                                            // would wrongly map it to 'with')
      "café • naïve…\n𝕏 astral 𝕏 astral")  // multibyte + astral chars
    val got = cases.toDF("t").repartition(2)
      .select(col("t"), TextAnalysis.gopher_signals(col("t")).as("g"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    cases.foreach { t =>
      val g = got(t)
      val actual = (0 until 12).map(g.getLong)
      assert(actual === ref(t), s"text='$t'")
    }
    // NULL propagates; SQL name registered; codegen stage survives
    val r0 = Seq[String](null).toDF("t")
      .select(TextAnalysis.gopher_signals(col("t"))).head()
    assert(r0.isNullAt(0))
    cases.toDF("t").createOrReplaceTempView("text_gopher_t")
    val viaSql = spark.sql(
      "SELECT gopher_signals(t).n_words AS n FROM text_gopher_t").collect()
    assert(viaSql.map(_.getLong(0)).sum === cases.map(c => ref(c).head).sum)
    val planDf = cases.toDF("t").repartition(2)
      .select(TextAnalysis.gopher_signals(col("t")))
    planDf.collect()
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage in:\n$plan")
    assert(!plan.contains("ScalaUDF"))
  }

  test("gopherRejectReasons: integer-exact thresholds fire per rule") {
    // 60 words, mean length in range, 2 distinct stopwords (the, and),
    // no symbols/bullets: a document that passes every rule
    val clean = "the and " + (1 to 58).map(i => "tok" + i).mkString(" ")
    // boundary doc: exactly 50 words with exactly 2 stopwords -> keep;
    // 49 words -> reject on word count
    val fortyNine = "the data " + (1 to 47).map(i => "tok" + i).mkString(" ")
    val fifty = fortyNine + " tok48"
    // symbol-heavy doc: 50 words plus 6 '#' -> (6)*10 > 50 -> reject
    val symbols = fifty + " " + ("#" * 6)
    val df = Seq(clean, fortyNine, fifty, symbols).toDF("t")
      .select(col("t"), TextAnalysis.gopherRejectReasons(
        TextAnalysis.gopher_signals(col("t"))).as("rr"))
    val byText = df.collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    def field(t: String, name: String): Boolean = {
      val s = byText(t)
      s.getBoolean(s.schema.fieldIndex(name))
    }
    assert(!field(clean, "reject"), "clean doc must pass all rules")
    assert(field(fortyNine, "r_word_count") && field(fortyNine, "reject"))
    assert(!field(fifty, "r_word_count"))
    assert(field(symbols, "r_symbol_ratio") && field(symbols, "reject"))
    // stopword rule: 1 distinct stopword -> reject
    val oneStop = "the " + (1 to 60).map(i => "tok" + i).mkString(" ")
    val rr = Seq(oneStop).toDF("t").select(TextAnalysis.gopherRejectReasons(
      TextAnalysis.gopher_signals(col("t"))).as("rr")).head().getStruct(0)
    assert(rr.getBoolean(rr.schema.fieldIndex("r_stopwords")))
  }
}
