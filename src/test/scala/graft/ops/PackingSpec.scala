package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def reference(
      rows: Seq[(Long, Long)], binTokens: Long): Map[Long, (Long, Long)] = {
    // sequential single-threaded packer: exclusive prefix sum in key order
    val sorted = rows.sortBy(_._1)
    val starts = sorted.map(_._2).scanLeft(0L)(_ + _).init
    sorted.zip(starts).map { case ((k, _), s) => k -> (s, s / binTokens) }.toMap
  }

  test("packSequences matches the sequential packer, any partitioning, any bucket count") {
    val r = new scala.util.Random(11)
    val rows = (0 until 2000).map(i => (i.toLong * 3 + (i % 7), r.nextInt(900).toLong))
      .distinctBy(_._1)
    val expected = reference(rows, 512)
    for (parts <- Seq(1, 7); buckets <- Seq(2, 16)) {
      val df = rows.toDF("id", "tokens").repartition(parts)
      val got = Packing.packSequences(df, "tokens", "id", 512, buckets)
        .select("id", "start_offset", "bin")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === expected, s"parts=$parts buckets=$buckets")
    }
  }

  test("packSequences: input row order is irrelevant (shuffled input, same bins)") {
    val rows = (0 until 500).map(i => (i.toLong, (i % 37 + 1).toLong))
    val shuffled = new scala.util.Random(3).shuffle(rows)
    val a = Packing.packSequences(rows.toDF("id", "tokens"), "tokens", "id", 128)
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Packing.packSequences(shuffled.toDF("id", "tokens").repartition(5),
        "tokens", "id", 128)
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("packSequences preconditions: duplicate keys, null keys, negative tokens") {
    val dup = Seq((1L, 5L), (1L, 5L), (2L, 5L)).toDF("id", "tokens")
    val e1 = intercept[IllegalArgumentException] {
      Packing.packSequences(dup, "tokens", "id", 100)
    }
    assert(e1.getMessage.contains("unique"))

    val nullKey = Seq((Some(1L), 5L), (None, 5L)).toDF("id", "tokens")
    val e2 = intercept[IllegalArgumentException] {
      Packing.packSequences(nullKey, "tokens", "id", 100)
    }
    assert(e2.getMessage.contains("non-null"))

    val neg = Seq((1L, 5L), (2L, -1L)).toDF("id", "tokens")
    val e3 = intercept[IllegalArgumentException] {
      Packing.packSequences(neg, "tokens", "id", 100)
    }
    assert(e3.getMessage.contains(">= 0"))
  }

  test("packSequences: empty input yields empty output with the packing columns") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "tokens")
    val out = Packing.packSequences(empty, "tokens", "id", 100)
    assert(out.columns.toSet === Set("id", "tokens", "start_offset", "bin"))
    assert(out.count() === 0)
  }

  test("packSequences: zero-token documents share their successor's start, bins are contiguous") {
    val rows = Seq((1L, 0L), (2L, 10L), (3L, 0L), (4L, 10L), (5L, 1L))
    val got = Packing.packSequences(rows.toDF("id", "tokens"), "tokens", "id", 10)
      .select("id", "start_offset", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 10L, 1L), (4L, 10L, 1L), (5L, 20L, 2L)))
    // bin ids cover 0..max with no gaps for positive-token corpora
    val bins = got.map(_._3)
    assert(bins.distinct.sorted === (0L to bins.max))
  }
}
