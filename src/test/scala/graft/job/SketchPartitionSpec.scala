package graft.job

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchPartitionSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  test("range cuts produce balanced buckets on skewed data") {
    // log-skewed values — the case hash partitioning handles but range
    // partitioning must get right via quantiles
    val df = (0 until 40000).map(i => math.exp((i % 9973).toDouble / 1200.0)).toDF("v")
      .repartition(8)
    val buckets = 16
    val cuts = SketchPartition.rangeCuts(df, col("v"), buckets)
    assert(cuts.length === buckets - 1)
    assert(cuts.sorted.toSeq === cuts.toSeq, "cuts ascend")
    val counts = SketchPartition.withRangeBucket(df, col("v"), cuts)
      .groupBy(col("bucket")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until buckets).toSet, "every bucket populated")
    val ideal = 40000.0 / buckets
    counts.values.foreach { c =>
      assert(math.abs(c - ideal) <= 0.25 * ideal, s"bucket count $c vs ideal $ideal")
    }
  }

  test("bucket assignment is a monotone function of the value") {
    val df = (0 until 5000).map(_.toDouble).toDF("v")
    val cuts = SketchPartition.rangeCuts(df, col("v"), 8)
    val rows = SketchPartition.withRangeBucket(df, col("v"), cuts)
      .orderBy(col("v")).collect().map(r => (r.getDouble(0), r.getInt(1)))
    rows.sliding(2).foreach {
      case Array((_, b1), (_, b2)) => assert(b1 <= b2)
      case _ =>
    }
    assert(rows.head._2 === 0 && rows.last._2 === 7)
  }

  test("writeRangePartitioned: range predicate prunes partitions and matches plain filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rp").toString + "/t"
    val df = (0 until 30000).map(i => ((i * 2654435761L) % 90000).toDouble).toDF("v")
      .repartition(6)
    val buckets = 8
    val cuts = SketchPartition.writeRangePartitioned(df, col("v"), buckets, dir)
    val table = spark.read.parquet(dir)
    assert(table.count() === 30000)

    // a narrow range inside one bucket's span
    val (lo, hi) = (cuts(2) + 1.0, (cuts(3) - 1.0).max(cuts(2) + 2.0))
    val pruned = table.filter(SketchPartition.rangePredicate(cuts, col("v"), lo, hi))
    val expected = df.filter(col("v").between(lo, hi)).count()
    assert(pruned.count() === expected)

    // partition pruning is real: the pruned plan reads fewer distinct
    // files than the full table has buckets
    val filesRead = pruned.select(input_file_name()).distinct().count()
    val bucketSpan = SketchPartition.bucketOf(cuts, hi) - SketchPartition.bucketOf(cuts, lo) + 1
    assert(filesRead <= bucketSpan.toLong,
      s"read $filesRead files for a $bucketSpan-bucket range")
    // and the optimized plan carries the bucket conjunct as a partition filter
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("bucket"),
      s"no partition filter in:\n$planStr")
  }

  test("bucketOf mirrors the codegen'd bucket column, including NaN ordering") {
    val df = (0 until 5000).map(i => (i * 13 % 997).toDouble).toDF("v")
    val cuts = SketchPartition.rangeCuts(df, col("v"), 8)
    SketchPartition.withRangeBucket(df, col("v"), cuts).collect().foreach { r =>
      assert(r.getInt(1) === SketchPartition.bucketOf(cuts, r.getDouble(0)))
    }
    // Spark SQL orders NaN above every value; the driver mirror must agree
    val nanRow = Seq(Double.NaN).toDF("v").repartition(1)
    val sqlBucket = SketchPartition.withRangeBucket(nanRow, col("v"), cuts)
      .head().getInt(1)
    assert(SketchPartition.bucketOf(cuts, Double.NaN) === sqlBucket,
      s"driver ${SketchPartition.bucketOf(cuts, Double.NaN)} vs SQL $sqlBucket")
  }

  test("repartitionBalanced yields buckets-many partitions with ranges intact") {
    val df = (0 until 20000).map(i => ((i * 2654435761L) % 100000).toDouble).toDF("v")
    val parts = SketchPartition.repartitionBalanced(df, col("v"), 8)
    assert(parts.rdd.getNumPartitions === 8)
    // each bucket's max must not exceed the next bucket's min
    val ranges = parts.groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"$hi1 > $lo2")
      case _ =>
    }
  }

  test("repartitionBalanced: partition i IS bucket i, and PARTITION sizes are balanced") {
    // the feature's stated purpose: hash-on-bucket (murmur3) collides
    // bucket ids into shared partitions and leaves others empty — the
    // identity partitioner must place every bucket in its own partition
    val buckets = 16
    val df = (0 until 48000).map(i => math.exp((i % 9973).toDouble / 1200.0)).toDF("v")
      .repartition(8)
    val parts = SketchPartition.repartitionBalanced(df, col("v"), buckets)
    assert(parts.rdd.getNumPartitions === buckets)
    val perPartition = parts.rdd
      .mapPartitionsWithIndex { (p, it) =>
        var n = 0L
        val bucketIds = scala.collection.mutable.Set[Int]()
        it.foreach { r => n += 1; bucketIds += r.getInt(1) }
        Iterator.single((p, n, bucketIds.toSet))
      }
      .collect().sortBy(_._1)
    // identity: partition p contains only bucket p (empty partitions allowed
    // in principle, but balance forbids them below)
    perPartition.foreach { case (p, _, ids) =>
      assert(ids.subsetOf(Set(p)), s"partition $p holds buckets $ids")
    }
    // PARTITION-size balance (not just bucket-size balance upstream)
    val ideal = 48000.0 / buckets
    perPartition.foreach { case (p, n, _) =>
      assert(math.abs(n - ideal) <= 0.25 * ideal,
        s"partition $p has $n rows vs ideal $ideal")
    }
  }

  test("writeRangePartitioned write tasks inherit the identity partitioning (one bucket per task)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rpb").toString + "/t"
    val buckets = 8
    val df = (0 until 16000).map(i => ((i * 40503L) % 65536).toDouble).toDF("v")
      .repartition(4)
    SketchPartition.writeRangePartitioned(df, col("v"), buckets, dir)
    val table = spark.read.parquet(dir)
    assert(table.count() === 16000)
    // identity partitioning means each bucket directory was written by
    // exactly one task -> one file per bucket directory
    val byBucket = table.withColumn("f", input_file_name())
      .groupBy(col("bucket"))
      .agg(countDistinct(col("f")).as("files"), count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString.toInt, r.getLong(1), r.getLong(2)))
    assert(byBucket.length === buckets)
    byBucket.foreach { case (b, files, _) =>
      assert(files === 1L, s"bucket $b written by $files tasks")
    }
    val ideal = 16000.0 / buckets
    byBucket.foreach { case (b, _, n) =>
      assert(math.abs(n - ideal) <= 0.25 * ideal, s"bucket $b has $n rows")
    }
  }

  test("partitionByBucket validates its preconditions loudly") {
    val df = Seq((1.0, 0), (2.0, 9)).toDF("v", "bucket")
    // out-of-range bucket value -> clear precondition error, not a crash
    // deep in the shuffle writer
    val err = intercept[org.apache.spark.SparkException] {
      SketchPartition.partitionByBucket(df, buckets = 4).rdd.count()
    }
    assert(err.getMessage.contains("bucket value") ||
      Option(err.getCause).exists(_.getMessage.contains("bucket value")))
    // non-INT bucket column rejected at construction
    val typed = Seq((1.0, 3L)).toDF("v", "bucket")
    val e2 = intercept[IllegalArgumentException] {
      SketchPartition.partitionByBucket(typed, buckets = 4)
    }
    assert(e2.getMessage.contains("INT"))
  }
}
