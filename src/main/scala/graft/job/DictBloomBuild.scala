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
  * stats, a conservative encoding-set heuristic is used; correctness
  * never depends on the heuristic.
  *
  * Fallback granularity is PER ROW GROUP: a chunk that cannot be proven
  * fully dictionary-encoded is page-scanned in place (the parquet
  * column reader decodes its data pages; dict-encoded pages still
  * resolve through the dictionary), while the file's other chunks keep
  * the dictionary-only path. A file only routes to the separate Spark
  * row-scan when its column's logical type is not [[hashCompatible]] —
  * there Spark's own reader must define the value (e.g. unsigned-int
  * widening).
  *
  * Scale shape: files are processed in parallel tasks, one partial
  * filter per partition (same merge fan-in as the normal aggregate
  * build); hash-incompatible files go through the ordinary codegen'd
  * scan build; all partials OR together (commutative/associative).
  */
object DictBloomBuild {

  /** Build accounting: how much of the table the dictionary path covered. */
  final case class Stats(
      dictFiles: Long, // files built from dictionary pages only
      dictChunks: Long, // column chunks whose dictionaries were read
      dictEntries: Long, // total dictionary entries inserted
      pageScanChunks: Long, // non-dict row groups page-scanned in place
      pageScanRows: Long, // values hashed by the page-scan path
      fallbackFiles: Long) // files routed through the Spark row-scan build

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

  /** Page-scan one row group's column chunk in place: decode every value
    * of `column` from the (possibly mixed dict/plain) data pages and
    * insert its hash. This is the PER-ROW-GROUP fallback — a file whose
    * chunk 0 is fully dictionary-encoded but whose chunk 1 overflowed
    * the 1 MB dictionary-page cap reads chunk 0's dictionary only and
    * page-scans chunk 1, instead of routing the whole file to a second
    * Spark scan.
    */
  private def pageScanRowGroup(
      reader: ParquetFileReader,
      blockIndex: Int,
      projSchema: org.apache.parquet.schema.MessageType,
      createdBy: String,
      f: Sbbf): Long = {
    val desc = projSchema.getColumns.get(0)
    val pages = reader.readRowGroup(blockIndex)
    val dummy = new org.apache.parquet.io.api.GroupConverter {
      override def getConverter(i: Int) =
        new org.apache.parquet.io.api.PrimitiveConverter {}
      override def start(): Unit = ()
      override def end(): Unit = ()
    }
    val cr = new org.apache.parquet.column.impl.ColumnReadStoreImpl(
      pages, dummy, projSchema, createdBy).getColumnReader(desc)
    val total = cr.getTotalValueCount
    val maxDef = desc.getMaxDefinitionLevel
    val tpe = desc.getPrimitiveType.getPrimitiveTypeName
    var n = 0L
    var i = 0L
    while (i < total) {
      if (cr.getCurrentDefinitionLevel == maxDef) {
        tpe match {
          case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
            f.insertHash(Hashing.hashBytes(cr.getBinary.getBytes))
          case PrimitiveTypeName.INT64 => f.insertHash(Hashing.hashLong(cr.getLong))
          case PrimitiveTypeName.INT32 => f.insertHash(Hashing.hashLong(cr.getInteger.toLong))
          case PrimitiveTypeName.DOUBLE => f.insertHash(Hashing.hashDouble(cr.getDouble))
          case PrimitiveTypeName.FLOAT => f.insertHash(Hashing.hashDouble(cr.getFloat.toDouble))
          case other => throw new IllegalArgumentException(
            s"dict_bloom_build: unsupported parquet physical type $other")
        }
        n += 1
      }
      cr.consume(); i += 1
    }
    n
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
        var pageScanChunks = 0L
        var pageScanRows = 0L
        val fallback = Seq.newBuilder[String]
        fileIt.foreach { file =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
          try {
            val footer = reader.getFooter
            val fileSchema = footer.getFileMetaData.getSchema
            val desc = fileSchema.getColumns.asScala
              .find(d => d.getPath.length == 1 && d.getPath()(0) == column)
              .getOrElse(throw new IllegalArgumentException(
                s"dict_bloom_build: no top-level column '$column' in $file"))
            val blocks: Seq[BlockMetaData] = footer.getBlocks.asScala.toSeq
            def chunkOf(b: BlockMetaData): ColumnChunkMetaData =
              b.getColumns.asScala.find(_.getPath.toDotString == column).get
            if (hashCompatible(desc)) {
              // per-ROW-GROUP granularity: dictionary page for provably
              // fully-dict chunks, in-place page scan for the rest
              val (dictBlocks, scanBlocks) =
                blocks.zipWithIndex.partition { case (b, _) => fullyDictEncoded(chunkOf(b)) }
              dictBlocks.foreach { case (b, _) =>
                // upcast: the concrete reader class is package-private
                val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                  reader.getDictionaryReader(b)
                val page = store.readDictionaryPage(desc)
                val dict = page.getEncoding.initDictionary(desc, page)
                dictEntries += insertDictionary(f, dict, desc)
                dictChunks += 1
              }
              if (scanBlocks.nonEmpty) {
                val projSchema = new org.apache.parquet.schema.MessageType(
                  fileSchema.getName,
                  fileSchema.getType(Seq(column): _*))
                reader.setRequestedSchema(projSchema)
                scanBlocks.foreach { case (_, idx) =>
                  pageScanRows += pageScanRowGroup(
                    reader, idx, projSchema, footer.getFileMetaData.getCreatedBy, f)
                  pageScanChunks += 1
                }
              } else dictFiles += 1
            } else fallback += file
          } finally reader.close()
        }
        Iterator.single((f.toBytes, dictFiles, dictChunks, dictEntries,
          pageScanChunks, pageScanRows, fallback.result()))
      }.collect()

    val filter = Sbbf.empty(capacity, fpRate)
    partials.foreach { case (bytes, _, _, _, _, _, _) => filter.orInPlace(Sbbf.fromBytes(bytes)) }
    val fallbackFiles = partials.flatMap(_._7).toSeq

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
      partials.map(_._5).sum, partials.map(_._6).sum,
      fallbackFiles.size.toLong)
    (filter.toBytes, stats)
  }
}
