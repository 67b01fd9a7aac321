package graft.ops

import java.security.MessageDigest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  // sequential reference selector
  private def reference(
      rows: Seq[(String, Long)], weights: Seq[(String, Long)], salt: String)
    : (Map[String, Long], Set[Long]) = {
    val bigW = weights.map(_._2).sum
    val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val total = weights.map { case (d, w) => counts(d) * bigW / w }.min
    val quotas = weights.map { case (d, w) => d -> w * total / bigW }.toMap
    val selected = weights.flatMap { case (d, _) =>
      rows.filter(_._1 == d)
        .sortBy { case (_, k) => (sha(k.toString + salt), k) }
        .take(quotas(d).toInt).map(_._2)
    }.toSet
    (quotas, selected)
  }

  test("mixtureSample: exact quotas, matches sequential selector, any partitioning") {
    val r = new scala.util.Random(13)
    val domains = Seq("web", "books", "code", "junk")
    val rows = (0 until 3000).map(i => (domains(r.nextInt(4)), i.toLong))
    val weights = Seq("web" -> 6L, "books" -> 3L, "code" -> 1L)
    val (quotas, expected) = reference(rows, weights, "s1")
    for (parts <- Seq(1, 7); buckets <- Seq(1, 16)) {
      val out = Mixture.mixtureSample(
        rows.toDF("domain", "id").repartition(parts),
        "domain", "id", weights, salt = "s1", buckets = buckets)
      // unlisted domain excluded entirely
      assert(out.filter(col("domain") === "junk").count() === 0L)
      val sel = out.filter(col("selected"))
      val got = sel.select("id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"parts=$parts buckets=$buckets")
      // realized counts are EXACTLY the quotas
      val byDomain = sel.groupBy("domain").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byDomain === quotas.filter(_._2 > 0))
    }
  }

  test("mixtureSample: rank is dense per domain and selection is a rank prefix") {
    val rows = (0 until 500).map(i => (s"d${i % 3}", i.toLong))
    val weights = Seq("d0" -> 2L, "d1" -> 1L, "d2" -> 1L)
    val out = Mixture.mixtureSample(
      rows.toDF("domain", "id").repartition(5), "domain", "id", weights)
      .collect()
    val byDomain = out.groupBy(_.getString(0))
    byDomain.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("mix_rank")).sorted
      assert(ranks.toSeq === (1L to rs.length))
      val cut = rs.filter(_.getAs[Boolean]("selected"))
        .map(_.getAs[Long]("mix_rank")).maxOption.getOrElse(0L)
      rs.foreach { r =>
        assert(r.getAs[Boolean]("selected") === (r.getAs[Long]("mix_rank") <= cut))
      }
    }
  }

  test("mixtureSample: salt re-rolls, preconditions loud") {
    // imbalanced corpus (200 vs 100) at a 1:1 target: quotas are 100
    // each, so d0 genuinely cuts and the salt changes WHICH 100 survive
    val rows = (0 until 300).map(i => (if (i < 200) "d0" else "d1", i.toLong))
    val weights = Seq("d0" -> 1L, "d1" -> 1L)
    def sel(salt: String) = Mixture
      .mixtureSample(rows.toDF("domain", "id"), "domain", "id", weights, salt)
      .filter(col("selected")).select("id").collect().map(_.getLong(0)).toSet
    val a = sel("a")
    val b = sel("b")
    assert(a !== b)
    assert(a.size === b.size) // quotas independent of salt

    val dup = Seq(("d0", 1L), ("d0", 1L), ("d1", 2L)).toDF("domain", "id")
    val e1 = intercept[IllegalArgumentException] {
      Mixture.mixtureSample(dup, "domain", "id", weights).collect()
    }
    assert(e1.getMessage.contains("unique"))

    val absent = Seq(("d0", 1L)).toDF("domain", "id")
    val e2 = intercept[IllegalArgumentException] {
      Mixture.mixtureSample(absent, "domain", "id", weights).collect()
    }
    assert(e2.getMessage.contains("no rows"))

    val nullKey = Seq(("d0", Some(1L)), ("d0", None), ("d1", Some(2L)))
      .toDF("domain", "id")
    val e3 = intercept[IllegalArgumentException] {
      Mixture.mixtureSample(nullKey, "domain", "id", weights).collect()
    }
    assert(e3.getMessage.contains("non-null"))

    // degenerate quotas: one tiny domain starves the whole mixture —
    // must be loud, never an all-false selection
    val starved = (Seq(("big", 0L)) ++ (1L to 100L).map(("small", _)))
      .toDF("domain", "id")
    val e4 = intercept[IllegalArgumentException] {
      Mixture.mixtureSample(starved, "domain", "id",
        Seq("big" -> 6L, "small" -> 1L))
    }
    assert(e4.getMessage.contains("zero quota"))
  }
}
