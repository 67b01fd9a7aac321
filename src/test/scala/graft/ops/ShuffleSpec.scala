package graft.ops

import java.security.MessageDigest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShuffleSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("epochShuffle: dense permutation matching the sequential order, any partitioning") {
    val keys = (0 until 2500).map(_.toLong)
    val expected = keys
      .sortBy(k => (sha(k.toString + "e1"), k))
      .zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
    for (parts <- Seq(1, 7); buckets <- Seq(1, 16)) {
      val got = Shuffle
        .epochShuffle(keys.toDF("id").repartition(parts), "id", "e1", buckets)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
      assert(got === expected, s"parts=$parts buckets=$buckets")
    }
  }

  test("epochShuffle: new salt = different order, same position set") {
    val df = (0 until 800).map(_.toLong).toDF("id")
    val a = Shuffle.epochShuffle(df, "id", "epoch1")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    val b = Shuffle.epochShuffle(df.repartition(5), "id", "epoch2")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    assert(a !== b)
    assert(a.values.toSeq.sorted === (0L until 800L))
    assert(b.values.toSeq.sorted === (0L until 800L))
  }

  test("epochShuffle preconditions: duplicate and null keys") {
    val dup = Seq(1L, 1L, 2L).toDF("id")
    val e1 = intercept[IllegalArgumentException] {
      Shuffle.epochShuffle(dup, "id", "s")
    }
    assert(e1.getMessage.contains("unique"))
    val nk = Seq(Some(1L), None).toDF("id")
    val e2 = intercept[IllegalArgumentException] {
      Shuffle.epochShuffle(nk, "id", "s")
    }
    assert(e2.getMessage.contains("non-null"))
  }
}
