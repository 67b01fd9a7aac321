package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Hashing

/** Executor-side static kernels for the text expressions, referenced by
  * generated Java code (stable static-forwarder paths).
  */
object TextKernels {

  /** Winnowing fingerprint over UTF-8 bytes — same semantics as
    * [[graft.ops.TextAnalysis.fingerprintKernel]] but fed the
    * UTF8String's bytes directly (no java.lang.String round-trip).
    * The short-text guard is on CHARACTER count, exactly like the
    * String kernel — a 10-char CJK document must hash whole, not
    * window over its 30 bytes.
    */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    if (s.numChars() < 16 || bytes.length < 16) return Hashing.hashBytes(bytes)
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

  /** Language-ID kernel returning the struct row directly. */
  def langId(s: UTF8String): InternalRow = {
    val (lang, conf) = graft.ops.TextAnalysis.detectLanguage(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(lang), conf))
  }

  /** Intra-document repetition signals (the Gopher repetition-filter
    * family: Rae et al. 2021, appendix A1.1, adapted to single-line word
    * streams): exact integer counts so a SQL oracle can recompute every
    * field. One pass, three hash maps over EXACT string keys (no hashing
    * shortcut — the counts must be collision-free exact). Words are
    * whitespace runs of the trimmed text; n-gram keys join words with a
    * single space (injective: words contain no whitespace).
    *
    * Fields: n_words, n_distinct_words, top_bigram_count (occurrences of
    * the most frequent word 2-gram; 0 when < 2 words), n_bigrams,
    * dup_trigram_occurrences (occurrences belonging to 3-grams seen more
    * than once), n_trigrams. Filters derive ratios downstream, e.g.
    * Gopher drops docs with top_bigram_count/n_bigrams > 0.18.
    *
    * The separator class is PINNED to the explicit `[ \t\n\f\r]+` (not
    * `\s`, whose membership differs between Java regex — which adds
    * U+000B — and RE2/other engines), so any sha-exact oracle can
    * reproduce the tokenization; empty edge tokens are filtered rather
    * than trimmed away (trim() semantics also differ across engines).
    */
  def repetitionStats(s: UTF8String): InternalRow = {
    val words = s.toString.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty)
    val nWords = words.length.toLong
    val wc = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < words.length) {
      wc.merge(words(i), Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      i += 1
    }
    var topBigram = 0L
    var nBigrams = 0L
    if (words.length >= 2) {
      val bc = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < words.length - 1) {
        bc.merge(words(i) + " " + words(i + 1), Integer.valueOf(1),
          (a, b) => Integer.valueOf(a + b))
        i += 1
      }
      nBigrams = words.length - 1L
      val it = bc.values().iterator()
      while (it.hasNext) { val c = it.next().toLong; if (c > topBigram) topBigram = c }
    }
    var dupTri = 0L
    var nTri = 0L
    if (words.length >= 3) {
      val tc = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < words.length - 2) {
        tc.merge(words(i) + " " + words(i + 1) + " " + words(i + 2),
          Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        i += 1
      }
      nTri = words.length - 2L
      val it = tc.values().iterator()
      while (it.hasNext) { val c = it.next().toLong; if (c > 1L) dupTri += c }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, wc.size().toLong, topBigram, nBigrams, dupTri, nTri))
  }

  /** The Gopher stop-word list (Rae et al. 2021, appendix A1.1): a doc
    * must contain at least two of these as whole whitespace words.
    */
  val GopherStopwords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality signals (Rae et al. 2021, appendix A1.1):
    * ONE pass each over words, raw characters, and lines, emitting only
    * exact integer counts so a SQL oracle can recompute every field and
    * every downstream threshold compares as pure integer arithmetic
    * (cross-multiplication — no float ratios anywhere).
    *
    * Pinned semantics (cross-engine exactness beats configurability):
    *  - words: runs of the explicit separator class `[ \t\n\f\r]+`
    *    (same class [[repetitionStats]] pins; never `\s`), empty edge
    *    tokens filtered;
    *  - word length: Unicode CODE POINTS (DuckDB `length()` semantics,
    *    not UTF-16 units);
    *  - "alphabetic" is pinned to ASCII `[A-Za-z]`;
    *  - stop-word match: ASCII-only lowercase equality against
    *    [[GopherStopwords]]. NOTE: an oracle must fold with an explicit
    *    A-Z -> a-z translate, NOT a Unicode lower() — DuckDB's lower()
    *    maps some non-ASCII chars INTO ASCII ('İ' U+0130 -> 'i',
    *    'K' U+212A -> 'k'), so lower('WİTH') = 'with' would count a
    *    stop word this kernel correctly does not;
    *  - symbols: `#` occurrences plus non-overlapping left-greedy `...`
    *    matches plus `…` occurrences (replace()-compatible
    *    counting);
    *  - lines: split on `\n` keeping ALL segments (n_lines = newline
    *    count + 1, even for trailing newlines / empty text);
    *  - bullet line: first char after stripping leading spaces/tabs is
    *    `-`, `*`, or `•`;
    *  - ellipsis line: after stripping trailing spaces/tabs, ends with
    *    `...` or `…`;
    *  - duplicate lines: occurrences belonging to line values seen more
    *    than once (mirrors dup_trigram_occurrences), plus their code
    *    points vs total line code points (the Gopher "duplicate line
    *    fraction" / "duplicate line character fraction" numerators).
    *
    * Fields (all BIGINT): n_words, sum_word_chars, n_alpha_words,
    * n_stopwords_present, n_hash, n_ellipsis, n_lines, n_bullet_lines,
    * n_ellipsis_lines, n_dup_lines, dup_line_chars, sum_line_chars.
    */
  def gopherSignals(s: UTF8String): InternalRow = {
    val text = s.toString
    // ---- word-level signals
    val words = text.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty)
    val nWords = words.length.toLong
    var sumWordChars = 0L
    var nAlphaWords = 0L
    val stopHit = new Array[Boolean](GopherStopwords.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      sumWordChars += w.codePointCount(0, w.length).toLong
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < w.length) {
        val c = w.charAt(j)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) nAlphaWords += 1
      var k = 0
      while (k < GopherStopwords.length) {
        if (!stopHit(k)) {
          val sw = GopherStopwords(k)
          if (w.length == sw.length) {
            var m = 0
            var eq = true
            while (eq && m < w.length) {
              var c = w.charAt(m)
              if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
              if (c != sw.charAt(m)) eq = false
              m += 1
            }
            if (eq) stopHit(k) = true
          }
        }
        k += 1
      }
      i += 1
    }
    var nStop = 0L
    i = 0
    while (i < stopHit.length) { if (stopHit(i)) nStop += 1; i += 1 }
    // ---- symbol counts over the raw text
    var nHash = 0L
    var nEllipsis = 0L
    var p = 0
    while (p < text.length) {
      val c = text.charAt(p)
      if (c == '#') { nHash += 1; p += 1 }
      else if (c == '…') { nEllipsis += 1; p += 1 }
      else if (c == '.' && p + 2 < text.length &&
          text.charAt(p + 1) == '.' && text.charAt(p + 2) == '.') {
        nEllipsis += 1; p += 3
      } else p += 1
    }
    // ---- line-level signals
    val lines = text.split("\n", -1)
    val nLines = lines.length.toLong
    var nBullet = 0L
    var nEllLines = 0L
    var sumLineChars = 0L
    val lineLen = new java.util.HashMap[String, Long]()
    val lineCnt = new java.util.HashMap[String, Integer]()
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      val chars = l.codePointCount(0, l.length).toLong
      sumLineChars += chars
      lineLen.put(l, chars)
      lineCnt.merge(l, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      // bullet: first char after leading spaces/tabs
      var a = 0
      while (a < l.length && (l.charAt(a) == ' ' || l.charAt(a) == '\t')) a += 1
      if (a < l.length) {
        val c0 = l.charAt(a)
        if (c0 == '-' || c0 == '*' || c0 == '•') nBullet += 1
      }
      // ellipsis end: last char(s) after trailing spaces/tabs
      var z = l.length
      while (z > 0 && (l.charAt(z - 1) == ' ' || l.charAt(z - 1) == '\t')) z -= 1
      if ((z >= 1 && l.charAt(z - 1) == '…') ||
          (z >= 3 && l.charAt(z - 1) == '.' && l.charAt(z - 2) == '.' &&
            l.charAt(z - 3) == '.')) nEllLines += 1
      i += 1
    }
    var nDupLines = 0L
    var dupLineChars = 0L
    val it = lineCnt.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      if (c > 1L) {
        nDupLines += c
        dupLineChars += c * lineLen.get(e.getKey)
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, sumWordChars, nAlphaWords, nStop, nHash, nEllipsis,
        nLines, nBullet, nEllLines, nDupLines, dupLineChars, sumLineChars))
  }
}

/** `doc_fingerprint(text) -> long`: min XXH64 over sliding character
  * 16-grams (winnowing representative). A native expression rather than
  * a Scala UDF so the hot path stays inside whole-stage codegen — no
  * encoder round-trip, no String materialization.
  */
case class DocFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
  override def prettyName: String = "doc_fingerprint"
}

/** `lang_id(text) -> struct<lang:string, confidence:double>`: stopword-
  * profile language identification (see
  * [[graft.ops.TextAnalysis.detectLanguage]]). Native expression for the
  * same codegen reasons as [[DocFingerprint]].
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

/** `text_repetition(text) -> struct<n_words, n_distinct_words,
  * top_bigram_count, n_bigrams, dup_trigram_occurrences, n_trigrams>`:
  * exact intra-document repetition counts (see
  * [[TextKernels.repetitionStats]]). Native expression: the whole
  * Gopher-repetition filter stays inside whole-stage codegen, one kernel
  * call per row, embarrassingly parallel at any corpus size.
  */
case class TextRepetition(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextRepetition.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_repetition expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextRepetition =
    copy(child = newChild)
  override def prettyName: String = "text_repetition"
}

object TextRepetition {
  val schema: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_trigram_occurrences", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false)))
}

/** `gopher_signals(text) -> struct<12 x bigint>`: exact integer
  * document-quality signals for the Gopher filter family (see
  * [[TextKernels.gopherSignals]] for the pinned semantics of every
  * field). Native expression: the whole quality pass is one kernel call
  * per row inside whole-stage codegen — no UDF, no intermediate arrays,
  * embarrassingly parallel at any corpus size.
  */
case class GopherSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherSignals.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_signals expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.gopherSignals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.gopherSignals($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherSignals =
    copy(child = newChild)
  override def prettyName: String = "gopher_signals"
}

object GopherSignals {
  val schema: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_chars", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_stopwords_present", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet_lines", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("sum_line_chars", LongType, nullable = false)))
}
