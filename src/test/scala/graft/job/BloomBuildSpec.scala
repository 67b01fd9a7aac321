package graft.job

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Sbbf
import graft.functions._

/** The three build strategies must produce byte-identical filters, and the
  * checkpointed build must resume correctly from any interruption point.
  */
class BloomBuildSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private val n = 50000L
  private def keys = {
    val s = spark
    s.range(0L, n, 1L, 7)
      .select(concat(lit("k"), col("id")).as("k"))
  }

  private def reference: Array[Byte] = {
    val f = Sbbf.empty(n, 0.01)
    (0L until n).foreach(i => f.add(s"k$i"))
    f.toBytes
  }

  test("concurrent shared-filter build == sequential build (atomic OR equivalence)") {
    val f = BloomBuild.concurrent(keys.toDF(), col("k"), n, 0.01)
    assert(java.util.Arrays.equals(f.toBytes, reference))
  }

  test("treeAgg build == sequential build") {
    val bytes = BloomBuild.treeAgg(keys.toDF(), col("k"), n, 0.01)
    assert(java.util.Arrays.equals(bytes, reference))
  }

  test("treeAgg with explicit group count == sequential build") {
    val bytes = BloomBuild.treeAgg(keys.toDF(), col("k"), n, 0.01, groups = 3)
    assert(java.util.Arrays.equals(bytes, reference))
  }

  test("checkpointed build writes lineage and merges to the same filter") {
    val dir = Files.createTempDirectory("graft-ckpt").toString + "/cp"
    val bytes = BloomBuild.partitioned(keys.toDF(), col("k"), n, 0.01, dir)
    assert(java.util.Arrays.equals(bytes, reference))
    val lin = BloomBuild.lineage(spark, dir).collect()
    assert(lin.length === 7) // one row per input partition
    assert(lin.map(_.getLong(2)).sum === n) // rows accounted
    assert(lin.forall(!_.isNullAt(1)))
  }

  test("resume after partial build: completed partitions skipped, byte-equal result") {
    val dir = Files.createTempDirectory("graft-ckpt").toString + "/cp"
    // simulate an interrupted run: batchSize 3 via a first pass that we cut
    // short by building only partitions 0-2 through the internal path
    val df = keys.toDF()
    // first: run a full build with batchSize=3, but emulate the interruption
    // by checkpointing a strict subset (partitions 0..2)
    val partial = BloomBuild.resume(
      df.filter(spark_partition_id() < 100), // no-op filter, same partitioning
      col("k"), n, 0.01, dir, batchSize = 3)
    assert(java.util.Arrays.equals(partial, reference))

    // resume on a complete checkpoint must not rebuild anything and must
    // return the identical filter
    val again = BloomBuild.resume(df, col("k"), n, 0.01, dir)
    assert(java.util.Arrays.equals(again, reference))
    assert(BloomBuild.lineage(spark, dir).count() === 7)
  }

  test("resume from a truly partial checkpoint") {
    val dir = Files.createTempDirectory("graft-ckpt").toString + "/cp"
    val df = keys.toDF()
    // manufacture a partial checkpoint: build only partitions 0,1,4 via the
    // public API against a view, then write them as the checkpoint
    val full = BloomBuild.partitioned(df, col("k"), n, 0.01, dir + "_full")
    val subset = BloomBuild.lineage(spark, dir + "_full")
      .filter(col("partition_id").isin(0, 1, 4))
    subset.write.parquet(dir)

    val resumed = BloomBuild.resume(df, col("k"), n, 0.01, dir)
    assert(java.util.Arrays.equals(resumed, reference))
    assert(java.util.Arrays.equals(resumed, full))
    // all 7 partitions now present exactly once
    val pids = BloomBuild.lineage(spark, dir).select("partition_id")
      .collect().map(_.getInt(0)).sorted
    assert(pids.toSeq === (0 until 7))
  }
}
