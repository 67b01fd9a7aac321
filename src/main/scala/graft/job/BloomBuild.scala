package graft.job

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Sbbf
import graft.functions.{abloom_key_hash, bloom_agg_hashed, bloom_union_agg}

/** Distributed SBBF build strategies (SURVEY.md §7.5).
  *
  * Three interchangeable physical plans for one logical operator
  * ("global Bloom filter over a key column"), all bit-identical outputs:
  *
  *  1. [[treeAgg]] — declarative two-level aggregation for multi-executor
  *     clusters: per-partition partial filters, an intermediate
  *     `groupBy(partition_id % G)` union level so the final union sees G
  *     filters instead of P (the flat plan's single final task ORing
  *     O(partitions) capacity-sized buffers is the scaling bottleneck),
  *     then one final union. Shuffle volume O(P x filter), critical-path
  *     merge O(P/G + G).
  *
  *  2. [[concurrent]] — per-executor shared filter with lock-free atomic
  *     bit-OR inserts: the reference's `free_threading=True` mode
  *     (`/root/reference/abloom/_abloom.c:137-144`) mapped to Spark's
  *     within-executor parallelism. Insert working set is ONE filter per
  *     node (cache-resident) instead of one per task, and merge fan-in is
  *     O(executors). In this sandbox (single-JVM local[N] = one executor)
  *     that means zero merge; on a real cluster each executor contributes
  *     one filter and [[treeAgg]]-style union combines them.
  *
  *  3. [[partitioned]] / [[resume]] — checkpointed build with
  *     per-partition lineage + metrics, resumable: completed partitions
  *     are skipped on re-run and replays are safe because OR-merge is
  *     idempotent.
  */
object BloomBuild {

  // ------------------------------------------------------- shared registry

  /** Executor-side registry of in-flight shared filters (single JVM). */
  private val shared = new ConcurrentHashMap[String, Sbbf]()

  /** Strategy 2: concurrent shared-filter build. Requires executors to
    * share the driver JVM (local[N] master); throws otherwise — on a real
    * cluster use [[treeAgg]] (or per-executor sharing + union, which this
    * models at one-node scale).
    */
  def concurrent(df: DataFrame, keyCol: Column, capacity: Long, fpRate: Double): Sbbf = {
    val spark = df.sparkSession
    require(spark.sparkContext.isLocal,
      "concurrent shared-filter build requires a single-JVM (local) master; use treeAgg on a cluster")
    val id = java.util.UUID.randomUUID().toString
    shared.put(id, Sbbf.empty(capacity, fpRate))
    try {
      val hashed = df.select(abloom_key_hash(keyCol).as("h"))
      hashed.queryExecution.toRdd.foreachPartition { it =>
        val f = shared.get(id)
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0)) f.insertHashAtomic(row.getLong(0))
        }
      }
      shared.get(id)
    } finally shared.remove(id)
  }

  /** Strategy 1: declarative two-level tree aggregation (cluster-safe).
    *
    * @param groups intermediate union fan-in; default ~sqrt(input
    *               partitions), the depth-2 optimum.
    */
  def treeAgg(
      df: DataFrame,
      keyCol: Column,
      capacity: Long,
      fpRate: Double,
      groups: Int = 0): Array[Byte] = {
    val p = df.rdd.getNumPartitions.max(1)
    val g = if (groups > 0) groups else math.max(1, math.sqrt(p.toDouble).round.toInt)
    df.select(abloom_key_hash(keyCol).as("h"))
      .withColumn("g", spark_partition_id() % g)
      .groupBy(col("g"))
      .agg(bloom_agg_hashed(col("h"), capacity, fpRate).as("f"))
      .agg(bloom_union_agg(col("f")))
      .head().getAs[Array[Byte]](0)
  }

  // --------------------------------------------- checkpointed / resumable

  val checkpointSchema: StructType = StructType(Seq(
    StructField("partition_id", IntegerType, nullable = false),
    StructField("filter", BinaryType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("build_ms", LongType, nullable = false),
    StructField("keys_per_sec", DoubleType, nullable = false)))

  /** Build per-partition filters for the given partition ids only,
    * returning lineage rows (partition_id, filter, rows, build_ms,
    * keys_per_sec). Uses `runJob` on an explicit partition subset so a
    * resume never recomputes completed input partitions.
    */
  private def buildPartitions(
      df: DataFrame,
      keyCol: Column,
      capacity: Long,
      fpRate: Double,
      partitionIds: Seq[Int]): Seq[Row] = {
    val spark = df.sparkSession
    val hashedRdd = df.select(abloom_key_hash(keyCol).as("h")).queryExecution.toRdd
    val results = spark.sparkContext.runJob(
      hashedRdd,
      (ctx: org.apache.spark.TaskContext, it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        val t0 = System.nanoTime()
        val f = Sbbf.empty(capacity, fpRate)
        var n = 0L
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0)) { f.insertHash(row.getLong(0)); n += 1 }
        }
        val ms = (System.nanoTime() - t0) / 1000000L
        (ctx.partitionId(), f.toBytes, n, ms)
      },
      partitionIds)
    results.toSeq.map { case (pid, bytes, n, ms) =>
      Row(pid, bytes, n, ms, if (ms > 0) n * 1000.0 / ms else 0.0)
    }
  }

  /** Checkpointed partitioned build: writes one lineage row per input
    * partition to `checkpointDir` (parquet, appended as each batch of
    * partitions completes), then OR-merges all partition filters into the
    * global filter. `batchSize` bounds how much work is lost on failure.
    */
  def partitioned(
      df: DataFrame,
      keyCol: Column,
      capacity: Long,
      fpRate: Double,
      checkpointDir: String,
      batchSize: Int = 64): Array[Byte] =
    resume(df, keyCol, capacity, fpRate, checkpointDir, batchSize)

  /** Resume (or start) a checkpointed build: read completed partition ids
    * from the checkpoint, build only the missing ones, then merge all.
    * Byte-identical to a single-pass build for any interruption point
    * (OR idempotence + partition determinism).
    */
  def resume(
      df: DataFrame,
      keyCol: Column,
      capacity: Long,
      fpRate: Double,
      checkpointDir: String,
      batchSize: Int = 64): Array[Byte] = {
    val spark = df.sparkSession
    val nParts = df.rdd.getNumPartitions
    val done: Set[Int] =
      if (checkpointExists(spark, checkpointDir))
        spark.read.schema(checkpointSchema).parquet(checkpointDir)
          .select("partition_id").collect().map(_.getInt(0)).toSet
      else Set.empty
    val todo = (0 until nParts).filterNot(done)

    todo.grouped(batchSize).foreach { batch =>
      val rows = buildPartitions(df, keyCol, capacity, fpRate, batch)
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), checkpointSchema)
        .write.mode(SaveMode.Append).parquet(checkpointDir)
    }

    // parallel union of all checkpointed partition filters
    spark.read.schema(checkpointSchema).parquet(checkpointDir)
      .dropDuplicates("partition_id") // replayed partitions are harmless but dedup anyway
      .agg(bloom_union_agg(col("filter")))
      .head().getAs[Array[Byte]](0)
  }

  /** Per-partition lineage + metrics of a checkpointed build. */
  def lineage(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.schema(checkpointSchema).parquet(checkpointDir)

  private def checkpointExists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).nonEmpty
  }
}
