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
