package graft.job

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.{ColumnDescriptor, Dictionary, Encoding}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.{BlockMetaData, ColumnChunkMetaData}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.{Hashing, Sbbf}

/** Dictionary-aware SBBF build over a parquet table: a Bloom filter only
  * needs each DISTINCT key once (insert is idempotent — re-inserting a
  * key sets the same bits), and a fully dictionary-encoded parquet column
  * chunk stores exactly its distinct values in the dictionary page. So
  * for such chunks this build reads ONLY the dictionary pages and never
  * touches a data page: on a 100 TB string-keyed table with per-chunk
  * cardinality << row count, the build's IO and hashing drop from
  * O(rows) to O(distinct-per-chunk), typically 10-1000x less.
  *
  * Output is BYTE-IDENTICAL to the row-scan build (same hash rules as
  * `abloom_key_hash` per physical type; OR-idempotence makes duplicate
  * suppression free), verified by test and by the harness oracle query.
  *
  * Detection: a chunk qualifies when parquet `EncodingStats` says it has
  * dictionary pages and zero non-dictionary-encoded data pages (both
  * parquet-java and parquet-cpp/pyarrow write these stats). Without
  * stats, a conservative encoding-set heuristic is used; any chunk that
  * cannot be PROVEN fully dictionary-encoded sends its whole file down
  * the fallback row-scan path — correctness never depends on the
  * heuristic.
  *
  * Scale shape: files are processed in parallel tasks, one partial
  * filter per partition (same merge fan-in as the normal aggregate
  * build); fallback files go through the ordinary codegen'd scan build;
  * the two partial sets OR together (commutative/associative).
  */
object DictBloomBuild {

  /** Build accounting: how much of the table the dictionary path covered. */
  final case class Stats(
      dictFiles: Long, // files built from dictionary pages only
      dictChunks: Long, // column chunks whose dictionaries were read
      dictEntries: Long, // total dictionary entries inserted
      fallbackFiles: Long) // files routed through the row-scan build

  /** True iff the column's (physical, logical-annotation) pair decodes to
    * the SAME value Spark's reader hands `abloom_key_hash` — the
    * dictionary path must be byte-identical to the row scan, and e.g. a
    * UINT_32 annotation makes Spark widen to signed long while
    * `decodeToInt(..).toLong` sign-extends the raw bits: different hash,
    * silent false negatives. Anything not provably plain-signed /
    * string / raw-binary / plain-float routes to the row-scan fallback
    * (which then either hashes correctly or fails analysis with the
    * same type error the scan build would give).
    */
  private[job] def hashCompatible(desc: ColumnDescriptor): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val t = desc.getPrimitiveType
    val ann = t.getLogicalTypeAnnotation
    t.getPrimitiveTypeName match {
      case PrimitiveTypeName.BINARY =>
        ann == null || ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
        ann == null // decimals/UUID/float16 annotations diverge from raw bytes
      case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
        ann match {
          case null => true
          case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
          case _ => false // DATE/TIME/TIMESTAMP/DECIMAL read as non-integral Spark types
        }
      case PrimitiveTypeName.DOUBLE | PrimitiveTypeName.FLOAT => ann == null
      case _ => false
    }
  }

  /** True iff every data page of the chunk is provably dictionary-encoded. */
  private[job] def fullyDictEncoded(chunk: ColumnChunkMetaData): Boolean = {
    val es = chunk.getEncodingStats
    if (es != null) es.hasDictionaryPages && !es.hasNonDictionaryEncodedPages
    else {
      // no stats (old writers): the encodings SET must contain a dict
      // data encoding and nothing that could be a non-dict DATA page.
      // PLAIN is ambiguous (it is also the v2 dictionary-page encoding),
      // so its presence disqualifies — conservative by design.
      val enc = chunk.getEncodings.asScala
      (enc.contains(Encoding.RLE_DICTIONARY) || enc.contains(Encoding.PLAIN_DICTIONARY)) &&
        enc.forall(e => e == Encoding.RLE_DICTIONARY || e == Encoding.PLAIN_DICTIONARY ||
          e == Encoding.RLE || e == Encoding.BIT_PACKED)
    }
  }

  /** Hash one dictionary entry with the `abloom_key_hash` rules for the
    * column's physical type (string/binary -> XXH64 bytes; int32/int64 ->
    * CPython numeric hash; float/double -> numeric-equality hash).
    */
  private def insertDictionary(f: Sbbf, dict: Dictionary, desc: ColumnDescriptor): Long = {
    val n = dict.getMaxId + 1
    val tpe = desc.getPrimitiveType.getPrimitiveTypeName
    var i = 0
    tpe match {
      case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
        while (i < n) { f.insertHash(Hashing.hashBytes(dict.decodeToBinary(i).getBytes)); i += 1 }
      case PrimitiveTypeName.INT64 =>
        while (i < n) { f.insertHash(Hashing.hashLong(dict.decodeToLong(i))); i += 1 }
      case PrimitiveTypeName.INT32 =>
        while (i < n) { f.insertHash(Hashing.hashLong(dict.decodeToInt(i).toLong)); i += 1 }
      case PrimitiveTypeName.DOUBLE =>
        while (i < n) { f.insertHash(Hashing.hashDouble(dict.decodeToDouble(i))); i += 1 }
      case PrimitiveTypeName.FLOAT =>
        while (i < n) { f.insertHash(Hashing.hashDouble(dict.decodeToFloat(i).toDouble)); i += 1 }
      case other =>
        throw new IllegalArgumentException(
          s"dict_bloom_build: unsupported parquet physical type $other")
    }
    n.toLong
  }

  /** Build a global SBBF over top-level column `column` of the parquet
    * table at `path`. Returns the ABLM v2 filter bytes plus [[Stats]].
    */
  def build(
      spark: SparkSession,
      path: String,
      column: String,
      capacity: Long,
      fpRate: Double): (Array[Byte], Stats) = {
    val files = spark.read.parquet(path).inputFiles.toSeq.sorted
    require(files.nonEmpty, s"no parquet files under $path")
    val confBc = spark.sparkContext.broadcast(
      org.apache.spark.sql.GraftBridge.serializableConf(
        spark.sessionState.newHadoopConf()))
    val parallelism = math.min(files.size, spark.sparkContext.defaultParallelism).max(1)

    // phase 1: per-partition — dictionary-only partial filter + the list
    // of files that need the row-scan fallback
    val partials = spark.sparkContext.parallelize(files, parallelism)
      .mapPartitions { fileIt =>
        val conf = confBc.value.value
        val f = Sbbf.empty(capacity, fpRate)
        var dictFiles = 0L
        var dictChunks = 0L
        var dictEntries = 0L
        val fallback = Seq.newBuilder[String]
        fileIt.foreach { file =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
          try {
            val footer = reader.getFooter
            val desc = footer.getFileMetaData.getSchema.getColumns.asScala
              .find(d => d.getPath.length == 1 && d.getPath()(0) == column)
              .getOrElse(throw new IllegalArgumentException(
                s"dict_bloom_build: no top-level column '$column' in $file"))
            val blocks: Seq[BlockMetaData] = footer.getBlocks.asScala.toSeq
            def chunkOf(b: BlockMetaData): ColumnChunkMetaData =
              b.getColumns.asScala.find(_.getPath.toDotString == column).get
            if (hashCompatible(desc) &&
                blocks.forall(b => fullyDictEncoded(chunkOf(b)))) {
              blocks.foreach { b =>
                // upcast: the concrete reader class is package-private
                val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                  reader.getDictionaryReader(b)
                val page = store.readDictionaryPage(desc)
                val dict = page.getEncoding.initDictionary(desc, page)
                dictEntries += insertDictionary(f, dict, desc)
                dictChunks += 1
              }
              dictFiles += 1
            } else fallback += file
          } finally reader.close()
        }
        Iterator.single((f.toBytes, dictFiles, dictChunks, dictEntries, fallback.result()))
      }.collect()

    val filter = Sbbf.empty(capacity, fpRate)
    partials.foreach { case (bytes, _, _, _, _) => filter.orInPlace(Sbbf.fromBytes(bytes)) }
    val fallbackFiles = partials.flatMap(_._5).toSeq

    // phase 2: row-scan build over the files the dictionary path could
    // not prove — the ordinary codegen'd hash + aggregate plan
    if (fallbackFiles.nonEmpty) {
      val scanned = spark.read.parquet(fallbackFiles: _*)
        .select(graft.functions.abloom_key_hash(col(column)).as("__h"))
        .agg(graft.functions.bloom_agg_hashed(col("__h"), capacity, fpRate))
        .head().getAs[Array[Byte]](0)
      filter.orInPlace(Sbbf.fromBytes(scanned))
    }
    val stats = Stats(
      partials.map(_._2).sum, partials.map(_._3).sum, partials.map(_._4).sum,
      fallbackFiles.size.toLong)
    (filter.toBytes, stats)
  }
}
