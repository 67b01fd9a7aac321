package graft.data

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Hashing

/** A source-code file row — the north-rule input shape (BASELINE.json
  * `input_hint`): Iceberg-shaped table `source_files(repo, path, commit,
  * lang, content)` at 10^12-file scale in production; synthesized
  * deterministically here (FIXTURES.md §1).
  */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Deterministic `source_files` generator. Content is a pure function of
  * `(repo, path, commit)` — the per-row invariant `sha2(content, 256)` is
  * therefore reproducible across runs, partition counts, and cluster
  * sizes, which is what the correctness harness checks.
  *
  * Generation is a `spark.range(n)` map: embarrassingly parallel, no
  * shuffle, and each row derives only from its id, so any partitioning of
  * the range yields identical rows.
  */
object Synth {

  private val Langs = Array("scala", "java", "py", "c", "go", "rs", "md")
  private val Exts = Array("scala", "java", "py", "c", "go", "rs", "md")

  private val Tokens: Array[String] = Array(
    "def", "val", "var", "class", "object", "trait", "import", "return",
    "if", "else", "while", "for", "match", "case", "new", "extends",
    "private", "public", "static", "final", "override", "lazy", "impl",
    "struct", "enum", "fn", "let", "mut", "async", "await", "yield",
    "buffer", "index", "offset", "partition", "shuffle", "merge", "hash",
    "filter", "sketch", "block", "word", "probe", "salt", "seed", "digest")

  /** Deterministic content for one file id: a pseudo-source text whose
    * bytes depend only on the id (and therefore only on (repo, path,
    * commit), which are themselves functions of the id).
    */
  private[graft] def contentFor(id: Long): String = {
    // splitmix-style stream seeded by the file id
    var state = Hashing.mix64(id ^ 0x5eed5eed5eedL)
    def next(): Long = { state = Hashing.mix64(state + 0x9e3779b97f4a7c15L); state }
    val nLines = 5 + (java.lang.Long.remainderUnsigned(next(), 40L)).toInt
    val sb = new StringBuilder(nLines * 40)
    var line = 0
    while (line < nLines) {
      val nTok = 2 + (java.lang.Long.remainderUnsigned(next(), 8L)).toInt
      var t = 0
      while (t < nTok) {
        sb.append(Tokens((java.lang.Long.remainderUnsigned(next(), Tokens.length.toLong)).toInt))
        sb.append(if (t == nTok - 1) "" else " ")
        t += 1
      }
      sb.append("_").append(java.lang.Long.toHexString(next()))
      sb.append('\n')
      line += 1
    }
    sb.toString
  }

  private[graft] def rowFor(id: Long, filesPerRepo: Int): SourceFile = {
    val repoIdx = id / filesPerRepo
    val fileIdx = id % filesPerRepo
    val repo = s"org${repoIdx % 97}/repo$repoIdx"
    val langIdx = (Hashing.mix64(id) & 0x7fffffff) % Langs.length
    val path = s"src/pkg${fileIdx % 13}/File$fileIdx.${Exts(langIdx.toInt)}"
    val h1 = Hashing.xxh64(s"$repo/$path".getBytes("UTF-8"), 1L)
    val h2 = Hashing.xxh64(s"$repo/$path".getBytes("UTF-8"), 2L)
    val h3 = Hashing.mix64(h1 ^ h2)
    val commit = f"$h1%016x$h2%016x${h3 & 0xffffffffL}%08x"
    SourceFile(repo, path, commit, Langs(langIdx.toInt), contentFor(id))
  }

  /** `nRepos * filesPerRepo` deterministic rows, `partitions`-way parallel. */
  def sourceFiles(
      spark: SparkSession,
      nRepos: Int,
      filesPerRepo: Int,
      partitions: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    val n = nRepos.toLong * filesPerRepo
    spark.range(0L, n, 1L, partitions).map(id => rowFor(id, filesPerRepo))
  }
}
