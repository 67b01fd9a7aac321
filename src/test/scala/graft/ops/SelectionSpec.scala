package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  // sequential reference: greedy take-while in (priority DESC, key ASC)
  private def reference(
      rows: Seq[(Long, Long, Long)], budget: Long): Map[Long, (Long, Boolean)] = {
    val ranked = rows.sortBy { case (id, _, prio) => (-prio, id) }
    val cums = ranked.map(_._2).scanLeft(0L)(_ + _).tail
    ranked.zip(cums).map { case ((id, _, _), c) => id -> (c, c <= budget) }.toMap
  }

  test("selectByBudget matches the sequential selector, any partitioning/buckets") {
    val r = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      (i.toLong, r.nextInt(300).toLong, r.nextInt(50).toLong) // heavy priority ties
    }
    val budget = rows.map(_._2).sum / 3
    val expected = reference(rows, budget)
    for (parts <- Seq(1, 7); buckets <- Seq(2, 16)) {
      val df = rows.toDF("id", "tokens", "prio").repartition(parts)
      val got = Selection
        .selectByBudget(df, "tokens", "prio", "id", budget, buckets)
        .select("id", "cum_tokens", "selected")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(got === expected, s"parts=$parts buckets=$buckets")
    }
  }

  test("selectByBudget: row order irrelevant; selected set is a rank prefix") {
    val rows = (0 until 600).map(i => (i.toLong, (i % 23 + 1).toLong, (i % 9).toLong))
    val budget = 1500L
    val shuffled = new scala.util.Random(5).shuffle(rows)
    val a = Selection.selectByBudget(
        rows.toDF("id", "tokens", "prio"), "tokens", "prio", "id", budget)
      .filter(col("selected")).select("id").collect().map(_.getLong(0)).toSet
    val b = Selection.selectByBudget(
        shuffled.toDF("id", "tokens", "prio").repartition(5),
        "tokens", "prio", "id", budget)
      .filter(col("selected")).select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // rank-prefix property: every selected row ranks before every unselected
    val ranked = rows.sortBy { case (id, _, p) => (-p, id) }.map(_._1)
    val cut = ranked.indexWhere(!a.contains(_))
    if (cut >= 0) assert(ranked.drop(cut).forall(!a.contains(_)))
  }

  test("selectByBudget edge budgets: zero and everything") {
    val rows = Seq((1L, 10L, 5L), (2L, 10L, 4L), (3L, 10L, 3L))
    val df = rows.toDF("id", "tokens", "prio")
    val none = Selection.selectByBudget(df, "tokens", "prio", "id", 0L)
      .filter(col("selected")).count()
    assert(none === 0L)
    val all = Selection.selectByBudget(df, "tokens", "prio", "id", 30L)
      .filter(col("selected")).count()
    assert(all === 3L)
    // boundary: first doc exactly fits, second overflows by 1
    val cut = Selection.selectByBudget(df, "tokens", "prio", "id", 19L)
      .filter(col("selected")).select("id").collect().map(_.getLong(0)).toSet
    assert(cut === Set(1L))
  }

  test("selectByBudget preconditions: dup (prio,key), nulls, negative tokens") {
    val dup = Seq((1L, 5L, 2L), (1L, 5L, 2L), (2L, 5L, 1L)).toDF("id", "tokens", "prio")
    val e1 = intercept[IllegalArgumentException] {
      Selection.selectByBudget(dup, "tokens", "prio", "id", 100L)
    }
    assert(e1.getMessage.contains("unique"))

    // duplicate key with DIFFERENT priorities is a valid total order
    val dupKey = Seq((1L, 5L, 2L), (1L, 5L, 3L), (2L, 5L, 1L)).toDF("id", "tokens", "prio")
    val ok = Selection.selectByBudget(dupKey, "tokens", "prio", "id", 10L)
      .filter(col("selected")).count()
    assert(ok === 2L)

    val nullPrio = Seq((Some(1L), 5L, Some(2L)), (Some(2L), 5L, None))
      .toDF("id", "tokens", "prio")
    val e2 = intercept[IllegalArgumentException] {
      Selection.selectByBudget(nullPrio, "tokens", "prio", "id", 100L)
    }
    assert(e2.getMessage.contains("non-null"))

    val neg = Seq((1L, 5L, 1L), (2L, -1L, 2L)).toDF("id", "tokens", "prio")
    val e3 = intercept[IllegalArgumentException] {
      Selection.selectByBudget(neg, "tokens", "prio", "id", 100L)
    }
    assert(e3.getMessage.contains(">= 0"))

    // NaN priority would bucket as worst but window-rank first — loud
    val nanPrio = Seq((1L, 5L, 1.0), (2L, 5L, Double.NaN))
      .toDF("id", "tokens", "prio")
    intercept[IllegalArgumentException] {
      Selection.selectByBudget(nanPrio, "tokens", "prio", "id", 100L)
    }
  }
}
