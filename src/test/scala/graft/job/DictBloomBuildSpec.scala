package graft.job

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Sbbf
import graft.functions._

class DictBloomBuildSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def scanBuild(path: String, column: String, cap: Long, fp: Double): Array[Byte] =
    spark.read.parquet(path)
      .select(abloom_key_hash(col(column)).as("__h"))
      .agg(bloom_agg_hashed(col("__h"), cap, fp))
      .head().getAs[Array[Byte]](0)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("dictionary-only build is byte-identical to the row-scan build (string keys)") {
    val dir = tmpDir("graft-dict-s")
    // 50 distinct strings over 20k rows -> fully dictionary-encoded
    (0 until 20000).map(i => s"key_${i % 50}").toDF("k")
      .repartition(3).write.parquet(dir)
    val (bytes, stats) = DictBloomBuild.build(spark, dir, "k", 1000, 0.01)
    assert(bytes.toSeq === scanBuild(dir, "k", 1000, 0.01).toSeq)
    assert(stats.fallbackFiles === 0L, "all files must take the dictionary path")
    assert(stats.dictFiles === 3L && stats.dictChunks === 3L)
    assert(stats.dictEntries === 3L * 50L, "each chunk's dictionary holds its distincts")
    val f = Sbbf.fromBytes(bytes)
    (0 until 50).foreach(i => assert(f.contains(s"key_$i")))
  }

  test("dictionary-only build is byte-identical for long and double keys") {
    val dirL = tmpDir("graft-dict-l")
    (0 until 10000).map(i => (i % 200).toLong).toDF("k").repartition(2).write.parquet(dirL)
    val (bytesL, statsL) = DictBloomBuild.build(spark, dirL, "k", 500, 0.01)
    assert(bytesL.toSeq === scanBuild(dirL, "k", 500, 0.01).toSeq)
    assert(statsL.fallbackFiles === 0L)

    val dirD = tmpDir("graft-dict-d")
    (0 until 10000).map(i => (i % 100) * 1.5).toDF("k").repartition(2).write.parquet(dirD)
    val (bytesD, statsD) = DictBloomBuild.build(spark, dirD, "k", 500, 0.01)
    assert(bytesD.toSeq === scanBuild(dirD, "k", 500, 0.01).toSeq)
    assert(statsD.fallbackFiles === 0L)
  }

  test("non-dictionary files are page-scanned in place, still byte-identical") {
    val dir = tmpDir("graft-dict-fb")
    (0 until 5000).map(i => s"v_${i % 40}").toDF("k")
      .repartition(2).write
      .option("parquet.enable.dictionary", "false")
      .parquet(dir)
    val (bytes, stats) = DictBloomBuild.build(spark, dir, "k", 500, 0.01)
    assert(stats.dictFiles === 0L)
    assert(stats.fallbackFiles === 0L, "hash-compatible plain chunks page-scan, no Spark rescan")
    assert(stats.pageScanChunks === 2L)
    assert(stats.pageScanRows === 5000L)
    assert(bytes.toSeq === scanBuild(dir, "k", 500, 0.01).toSeq)
  }

  test("mixed directory: dict files use dictionaries, plain files page-scan") {
    val dir = tmpDir("graft-dict-mix")
    (0 until 4000).map(i => s"a_${i % 30}").toDF("k").coalesce(1).write.parquet(dir)
    (0 until 4000).map(i => s"b_${i % 30}").toDF("k").coalesce(1).write
      .option("parquet.enable.dictionary", "false").mode("append").parquet(dir)
    val (bytes, stats) = DictBloomBuild.build(spark, dir, "k", 500, 0.01)
    assert(stats.dictFiles === 1L && stats.fallbackFiles === 0L)
    assert(stats.pageScanChunks === 1L && stats.pageScanRows === 4000L)
    assert(bytes.toSeq === scanBuild(dir, "k", 500, 0.01).toSeq)
    val f = Sbbf.fromBytes(bytes)
    (0 until 30).foreach(i => assert(f.contains(s"a_$i") && f.contains(s"b_$i")))
  }

  test("mixed row groups inside ONE file: dict chunks read dictionaries, others page-scan") {
    val dir = tmpDir("graft-dict-rg")
    // small row groups; low-cardinality rows first, then high-cardinality
    // rows whose dictionary overflows -> later chunks are not fully dict
    val low = (0 until 40000).map(i => (i, s"rep_${i % 20}"))
    val high = (40000 until 80000).map(i => (i, s"unique_value_padpadpadpadpadpadpad_$i"))
    (low ++ high).toDF("ord", "k").coalesce(1)
      .sortWithinPartitions("ord")
      .write.option("parquet.block.size", "262144").parquet(dir)
    val (bytes, stats) = DictBloomBuild.build(spark, dir, "k", 80000, 0.01)
    assert(stats.fallbackFiles === 0L)
    assert(stats.dictChunks >= 1L, "low-cardinality row groups keep the dictionary path")
    assert(stats.pageScanChunks >= 1L, "overflowed row groups page-scan in place")
    assert(bytes.toSeq === scanBuild(dir, "k", 80000, 0.01).toSeq)
  }

  test("page scan of an optional column skips nulls, byte-identical") {
    val dir = tmpDir("graft-dict-null")
    (0 until 6000).map(i => if (i % 5 == 0) null else s"u_${i}_pad")
      .toDF("k").coalesce(1).write
      .option("parquet.enable.dictionary", "false").parquet(dir)
    val (bytes, stats) = DictBloomBuild.build(spark, dir, "k", 6000, 0.01)
    assert(stats.pageScanRows === 4800L, "nulls are not hashed")
    assert(bytes.toSeq === scanBuild(dir, "k", 6000, 0.01).toSeq)
  }

  test("logical-type guard: only annotations that hash like Spark's reader qualify") {
    import org.apache.parquet.schema._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    def descOf(t: Types.PrimitiveBuilder[PrimitiveType]): org.apache.parquet.column.ColumnDescriptor =
      new MessageType("r", t.named("k")).getColumns.get(0)
    // plain signed ints, strings, raw binary, plain floats: compatible
    assert(DictBloomBuild.hashCompatible(descOf(Types.required(INT64))))
    assert(DictBloomBuild.hashCompatible(descOf(Types.required(INT32))))
    assert(DictBloomBuild.hashCompatible(
      descOf(Types.required(INT32).as(LogicalTypeAnnotation.intType(16, true)))))
    assert(DictBloomBuild.hashCompatible(
      descOf(Types.required(BINARY).as(LogicalTypeAnnotation.stringType()))))
    assert(DictBloomBuild.hashCompatible(descOf(Types.required(BINARY))))
    assert(DictBloomBuild.hashCompatible(descOf(Types.required(DOUBLE))))
    // unsigned ints: Spark widens, decodeToInt sign-extends -> divergent hash
    assert(!DictBloomBuild.hashCompatible(
      descOf(Types.required(INT32).as(LogicalTypeAnnotation.intType(32, false)))))
    assert(!DictBloomBuild.hashCompatible(
      descOf(Types.required(INT64).as(LogicalTypeAnnotation.intType(64, false)))))
    // temporal/decimal annotations read as non-integral Spark types
    assert(!DictBloomBuild.hashCompatible(
      descOf(Types.required(INT32).as(LogicalTypeAnnotation.dateType()))))
    assert(!DictBloomBuild.hashCompatible(
      descOf(Types.required(INT64).as(LogicalTypeAnnotation.timestampType(
        true, LogicalTypeAnnotation.TimeUnit.MICROS)))))
    assert(!DictBloomBuild.hashCompatible(
      descOf(Types.required(BINARY).as(LogicalTypeAnnotation.decimalType(2, 20)))))
    assert(!DictBloomBuild.hashCompatible(
      descOf(Types.required(FIXED_LEN_BYTE_ARRAY).length(16)
        .as(LogicalTypeAnnotation.uuidType()))))
  }

  test("high-cardinality column: dictionary write falls back mid-chunk, detected") {
    val dir = tmpDir("graft-dict-hc")
    // unique long strings blow the 1 MB dictionary-page cap -> the writer
    // switches to plain data pages; EncodingStats must keep the chunk off
    // the dictionary-only path (its dictionary is incomplete) and the
    // page scan must decode BOTH its dict-encoded and plain pages
    (0 until 60000).map(i => s"unique_value_padpadpadpadpad_$i").toDF("k")
      .coalesce(1).write.parquet(dir)
    val (bytes, stats) = DictBloomBuild.build(spark, dir, "k", 60000, 0.01)
    assert(stats.dictChunks === 0L, "partial-dict chunk must not take the dictionary path")
    assert(stats.pageScanChunks >= 1L && stats.pageScanRows === 60000L)
    assert(stats.fallbackFiles === 0L)
    assert(bytes.toSeq === scanBuild(dir, "k", 60000, 0.01).toSeq)
  }
}
