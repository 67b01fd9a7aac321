package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  *
  * Wherever the semantics are expressible with built-in functions they are
  * composed from `org.apache.spark.sql.functions` (whole-stage codegen,
  * pushdown-friendly); only language-ID and fingerprinting need custom
  * kernels (registered through the same expression machinery as the
  * sketches).
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text counts 0. */
  def token_count(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword proxy: word pieces and single punctuation marks
    * (`\w+` runs or single non-word-non-space chars).
    */
  def regex_token_count(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]"), lit(0)))

  /** PII redaction patterns, applied IN ORDER: (name, regex, replacement).
    * The regexes are deliberately in the Java-regex ∩ RE2 common subset
    * (character classes, bounded/unbounded repetition, `\b`, `\d` — no
    * backreferences, no lookaround, no ordered alternation), and for each
    * of them leftmost-greedy (Java) and leftmost-longest (RE2) matching
    * coincide — so ANY engine reproduces the identical redaction
    * byte-for-byte, which is what makes redaction auditable: the oracle
    * recomputes the redacted text, not just the counts.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("longnum", "\\b\\d{9,}\\b", "<NUM>"))

  /** `df` plus a `redacted` text column and one `n_<pattern>` count per
    * [[piiPatterns]] entry. Patterns apply sequentially; each count is
    * taken on the text state BEFORE that pattern's replacement (so digits
    * inside an already-redacted email are not double-counted). Pure
    * per-row codegen built-ins (`regexp_extract_all` + `regexp_replace`)
    * — no UDF, no shuffle, embarrassingly parallel at any scale. NULL
    * text propagates to NULL redacted/counts.
    */
  def redactPii(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      patterns: Seq[(String, String, String)] = piiPatterns)
      : org.apache.spark.sql.DataFrame = {
    require(patterns.nonEmpty, "at least one pattern required")
    val out = patterns.foldLeft(df.withColumn("redacted", col(textCol))) {
      case (acc, (name, pat, repl)) =>
        acc
          .withColumn(s"n_$name",
            size(regexp_extract_all(col("redacted"), lit(pat), lit(0))).cast("long"))
          .withColumn("redacted", regexp_replace(col("redacted"), pat, repl))
    }
    out
  }

  /** Quality-score components, all deterministic arithmetic over counts so
    * an exact SQL oracle exists: alpha ratio, digit ratio, punctuation
    * ratio, whitespace ratio, mean token length.
    */
  def quality_stats(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val digit = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val space = (n - length(regexp_replace(text, "\\s", ""))).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double")
    val toks = token_count(text).cast("double")
    struct(
      n.cast("long").as("n_chars"),
      toks.cast("long").as("n_tokens"),
      when(n > 0, round(alpha / n, 6)).otherwise(0.0).as("alpha_ratio"),
      when(n > 0, round(digit / n, 6)).otherwise(0.0).as("digit_ratio"),
      when(n > 0, round(punct / n, 6)).otherwise(0.0).as("punct_ratio"),
      when(n > 0, round(space / n, 6)).otherwise(0.0).as("space_ratio"),
      when(toks > 0, round((n - space) / toks, 6)).otherwise(0.0).as("mean_token_len"))
  }

  /** Composite quality score in [0, 1]: favors alphabetic text with sane
    * token lengths and moderate punctuation (cheap heuristic in the
    * Gopher/C4-filter family, deterministic and oracle-expressible).
    */
  def quality_score(text: Column): Column = {
    val s = quality_stats(text)
    val alphaTerm = s.getField("alpha_ratio")
    val punctPenalty = least(s.getField("punct_ratio") * 5.0, lit(1.0))
    val lenTerm = when(
      s.getField("mean_token_len").between(3.0, 12.0), 1.0).otherwise(0.5)
    round(greatest(lit(0.0), least(lit(1.0),
      alphaTerm * 0.6 + lenTerm * 0.3 + (lit(1.0) - punctPenalty) * 0.1)), 6)
  }

  // ---------------------------------------------------------- language ID

  /** Tiny trigram/stopword profiles for a handful of languages. Real
    * pipelines plug in fastText/CLD3; the operator contract (string ->
    * (lang, confidence)) and the Spark plumbing are what matter here.
    */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set(" the ", " and ", " of ", " to ", " in ", " is ", " that ",
      " it ", " for ", " with ", " was ", " on "),
    "de" -> Set(" der ", " die ", " und ", " das ", " ist ", " von ", " mit ",
      " den ", " nicht ", " ein ", " zu "),
    "fr" -> Set(" le ", " la ", " les ", " de ", " des ", " et ", " est ",
      " un ", " une ", " que ", " pour "),
    "es" -> Set(" el ", " la ", " los ", " de ", " y ", " que ", " es ",
      " un ", " una ", " en ", " por "),
    "it" -> Set(" il ", " la ", " di ", " che ", " e ", " un ", " per ",
      " del ", " con ", " una "))

  /** Driver/executor kernel: stopword-hit voting. Returns (lang, score). */
  def detectLanguage(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val padded = " " + text.toLowerCase.replaceAll("[^\\p{L} ]", " ")
      .replaceAll("\\s+", " ") + " "
    var bestLang = "und"
    var bestHits = 0
    profiles.foreach { case (lang, words) =>
      var hits = 0
      words.foreach { w =>
        var idx = padded.indexOf(w)
        while (idx >= 0) { hits += 1; idx = padded.indexOf(w, idx + 1) }
      }
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
    }
    val toks = padded.split(" ").count(_.nonEmpty).max(1)
    (if (bestHits == 0) "und" else bestLang, math.min(1.0, bestHits.toDouble / toks))
  }

  /** `lang_id(text) -> struct<lang, confidence>` — a native codegen
    * expression ([[graft.expr.LangId]]); NULL text yields NULL (SQL
    * semantics; the old UDF returned ("und", 0.0)).
    */
  def lang_id(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.LangId(org.apache.spark.sql.GraftBridge.expression(text)))

  // -------------------------------------------------------- fingerprinting

  /** 64-bit document fingerprint: minimum XXH64 over sliding character
    * 16-grams (Karp-Rabin-style winnowing representative) — stable under
    * small appends/prepends elsewhere in the document, deterministic.
    */
  def fingerprintKernel(text: String): Long = {
    // short-text guard counts CODE POINTS, matching TextKernels.fingerprint's
    // UTF8String.numChars — a String.length (UTF-16 unit) guard diverges on
    // supplementary-plane text (>= 16 UTF-16 units but < 16 code points)
    if (text == null || text.codePointCount(0, text.length) < 16) {
      return if (text == null) 0L else Hashing.hashString(text)
    }
    val bytes = text.getBytes("UTF-8")
    if (bytes.length < 16) return Hashing.hashBytes(bytes)
    var min = Long.MaxValue
    var i = 0
    val end = bytes.length - 16
    while (i <= end) {
      val h = Hashing.xxh64(bytes, i, 16, 0L)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** `doc_fingerprint(text) -> long` — winnowing-style min-hash over
    * character 16-grams, as a native codegen expression
    * ([[graft.expr.DocFingerprint]]); NULL text yields NULL (the old
    * UDF returned 0).
    */
  def doc_fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.DocFingerprint(org.apache.spark.sql.GraftBridge.expression(text)))

  /** Intra-document repetition signals (Gopher repetition-filter family):
    * exact integer counts — see [[graft.expr.TextKernels.repetitionStats]].
    */
  def text_repetition(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.TextRepetition(org.apache.spark.sql.GraftBridge.expression(text)))

  /** Exact integer Gopher document-quality signals — see
    * [[graft.expr.TextKernels.gopherSignals]] for the pinned semantics.
    */
  def gopher_signals(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.GopherSignals(org.apache.spark.sql.GraftBridge.expression(text)))

  /** The Gopher quality-filter rule set (Rae et al. 2021, appendix A1.1)
    * over a [[gopher_signals]] struct, every threshold expressed as
    * INTEGER cross-multiplication (no float ratios → bit-identical across
    * engines). Returns a struct of per-rule booleans plus the overall
    * `reject` OR. Thresholds: word count in [50, 100k]; mean word length
    * in [3, 10] chars; symbol-to-word ratio (# + ellipses) <= 0.1; <= 90%
    * bullet lines; <= 30% ellipsis-ending lines; >= 80% words with an
    * alphabetic char; >= 2 of the 8 stop words; duplicate-line fraction
    * <= 0.30; duplicate-line character fraction <= 0.20.
    */
  def gopherRejectReasons(signals: Column): Column = {
    val r = signals
    val wordCount = r.getField("n_words") < 50 || r.getField("n_words") > 100000L
    val meanWordLen = r.getField("sum_word_chars") < r.getField("n_words") * 3 ||
      r.getField("sum_word_chars") > r.getField("n_words") * 10
    val symbolRatio =
      (r.getField("n_hash") + r.getField("n_ellipsis")) * 10 > r.getField("n_words")
    val bullet = r.getField("n_bullet_lines") * 10 > r.getField("n_lines") * 9
    val ellipsis = r.getField("n_ellipsis_lines") * 10 > r.getField("n_lines") * 3
    val alpha = r.getField("n_alpha_words") * 5 < r.getField("n_words") * 4
    val stop = r.getField("n_stopwords_present") < 2
    val dupLines = r.getField("n_dup_lines") * 10 > r.getField("n_lines") * 3
    val dupChars = r.getField("dup_line_chars") * 5 > r.getField("sum_line_chars")
    struct(
      wordCount.as("r_word_count"),
      meanWordLen.as("r_mean_word_len"),
      symbolRatio.as("r_symbol_ratio"),
      bullet.as("r_bullet_lines"),
      ellipsis.as("r_ellipsis_lines"),
      alpha.as("r_alpha_words"),
      stop.as("r_stopwords"),
      dupLines.as("r_dup_lines"),
      dupChars.as("r_dup_line_chars"),
      (wordCount || meanWordLen || symbolRatio || bullet || ellipsis ||
        alpha || stop || dupLines || dupChars).as("reject"))
  }

  /** CORPUS-STATISTICAL quality scoring: per-document unigram
    * surprisal against the corpus's own token document-frequencies —
    * the integer-exact stand-in for LM-perplexity filtering (template /
    * boilerplate text scores LOW total surprisal per token because its
    * tokens appear in many documents; rare-vocabulary text scores
    * high).
    *
    * Per token occurrence t in a doc:
    *   surprisal(t) = ilog2(N) - ilog2(df(t))
    * where N = corpus document count, df(t) = number of distinct
    * documents containing t, and ilog2(x) = floor(log2(x)) computed as
    * `length(binary-string(x)) - 1` — EXACT integer arithmetic (never
    * a floating log whose last bit could differ across engines), so an
    * independent engine reproduces every score bit-for-bit.
    *
    * Scale shape: the canonical TF-IDF plan — one explode, a token
    * groupBy for the df table, a token-keyed join back (the dim side
    * is 1 row per token, so fact-side skew on hot tokens stays a plain
    * shuffle join), a doc groupBy. Empty documents survive with
    * n_tokens = 0 / surprisal 0 via the final left join (the
    * unnest-drops-empty-docs oracle gotcha, both sides).
    *
    * Output: `idCol`, `n_tokens`, `total_surprisal`, plus
    * `mean_surprisal_x1000` (integer-scaled mean so the oracle stays
    * float-free).
    *
    * PRECONDITION (like the [[Dedup]] asymmetric joins): `idCol` must
    * be unique — a duplicated id would merge both docs' tokens into one
    * score and then emit it once per input row.
    */
  def surprisalScore(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val n = df.count()
    require(n > 0, "surprisalScore: empty corpus")
    val tok = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
    val scored = tok.join(wordDf(df, textCol, idCol), "tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum((ilog2(lit(n)) - ilog2(col("df"))).cast("long"))
          .as("total_surprisal"))
    withMeanSurprisal(df, idCol, scored, oov = false)
  }

  /** floor(log2(x)) for a positive integral column, computed as
    * binary-string length - 1 — exact integer arithmetic that any
    * engine reproduces (a floating log's last bit could differ).
    */
  private def ilog2(c: Column): Column =
    length(conv(c.cast("string"), 10, 2)) - 1

  private def withMeanSurprisal(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      scored: org.apache.spark.sql.DataFrame,
      oov: Boolean): org.apache.spark.sql.DataFrame = {
    val oovCols =
      if (oov) Seq(coalesce(col("n_oov"), lit(0L)).as("n_oov")) else Nil
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select((Seq(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens")) ++ oovCols ++ Seq(
        coalesce(col("total_surprisal"), lit(0L)).as("total_surprisal"))): _*)
      .withColumn("mean_surprisal_x1000",
        when(col("n_tokens") === 0L, 0L)
          // integer div — `/` on longs would return a double
          .otherwise(expr("total_surprisal * 1000L div n_tokens")))
  }

  /** Word-token document-frequency PIPELINE STATE for incremental
    * surprisal scoring: one (tok, df) row per distinct whitespace
    * token, df = number of distinct documents containing it. Persist
    * it (plus the corpus document count) once; score every incoming
    * batch with [[surprisalScoreAgainst]] without re-scanning the
    * corpus, and fold an APPENDED batch in with [[updateWordDf]].
    */
  def wordDf(
      corpus: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame =
    corpus
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))

  /** Update rule after a batch is APPENDED to the corpus: dfs add
    * because the batch's doc ids are disjoint from the corpus's
    * (caller precondition, as in [[Dedup.updateTokenDf]]). Union +
    * re-sum — one shuffle, no outer join.
    */
  def updateWordDf(
      stored: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame =
    stored.select(col("tok"), col("df"))
      .unionByName(wordDf(batch, textCol, idCol))
      .groupBy("tok").agg(sum(col("df")).as("df"))

  /** Score a NEW batch against the STORED corpus statistics — the
    * incremental form of [[surprisalScore]]: the corpus is never
    * re-scanned, only the (tok, df) state is joined. Out-of-vocabulary
    * tokens (df = 0 in the state) score as df = 1 — the maximum
    * surprisal any singleton could earn — and are counted in `n_oov`
    * so a drifted batch is observable. Same unique-`idCol` precondition
    * as [[surprisalScore]].
    */
  def surprisalScoreAgainst(
      newDocs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      dfState: org.apache.spark.sql.DataFrame,
      corpusDocs: Long): org.apache.spark.sql.DataFrame = {
    require(corpusDocs > 0, "surprisalScoreAgainst: empty corpus")
    require(Seq("tok", "df").forall(dfState.columns.contains),
      s"surprisalScoreAgainst: dfState needs (tok, df) columns, got " +
        dfState.columns.mkString(", "))
    val tok = newDocs.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
    val scored = tok
      .join(dfState.select(col("tok"), col("df")), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("df").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum((ilog2(lit(corpusDocs)) -
          ilog2(greatest(coalesce(col("df"), lit(1L)), lit(1L)))).cast("long"))
          .as("total_surprisal"))
    withMeanSurprisal(newDocs, idCol, scored, oov = true)
  }

  /** Top-m most frequent whitespace tokens across a corpus, via the
    * Misra-Gries heavy-hitters aggregate over the exploded token stream —
    * the canonical "vocabulary head" question a training-data pipeline
    * asks of a 100 TB corpus. One shuffle (the aggregate's partials are
    * k-entry summaries, independent of row count); returns
    * (token, count_lb, count_ub) with the deterministic MG interval —
    * exact whenever the corpus has at most k distinct tokens, and always
    * containing the truth with width <= total_tokens/(k+1).
    */
  def topTokens(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int, m: Int): org.apache.spark.sql.DataFrame = {
    import graft.functions.{mg_agg, mg_topk}
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .agg(mg_agg(col("__tok"), k).as("__sk"))
      .select(explode(mg_topk(col("__sk"), m)).as("e"))
      .select(col("e.item").as("token"),
        col("e.count_lb").as("count_lb"),
        col("e.count_ub").as("count_ub"))
  }
}
