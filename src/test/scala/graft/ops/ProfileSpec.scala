package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def df = Seq(
    (1L, "alpha", Some(2.5)),
    (2L, "beta", Some(1.0)),
    (3L, "alpha", None),
    (4L, "alpha", Some(4.0)),
    (5L, null.asInstanceOf[String], Some(3.0))
  ).toDF("id", "name", "score")

  test("exact fields match direct computation; one aggregation job") {
    val rows = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("id", "name", "score"))
    val id = rows("id")
    assert(id.getLong(1) === 5L && id.getLong(2) === 0L)     // n_rows, n_nulls
    assert(id.getLong(3) === 5L && id.getBoolean(4))          // exact distinct
    assert(id.getString(5) === "1" && id.getString(6) === "5")
    val name = rows("name")
    assert(name.getLong(2) === 1L)                            // one null
    assert(name.getLong(3) === 2L && name.getBoolean(4))      // alpha, beta
    assert(name.getString(7) === "alpha")                     // top value
    assert(name.getLong(8) === 3L && name.getLong(9) === 3L)  // exact interval
    val score = rows("score")
    assert(score.getLong(2) === 1L && score.getLong(3) === 4L)
    // quartiles (p25 @10, p50 @11, p75 @12) from one digest, ordered
    assert(!score.isNullAt(11) && math.abs(score.getDouble(11) - 2.5) < 1.5)
    assert(score.getDouble(10) <= score.getDouble(11) &&
      score.getDouble(11) <= score.getDouble(12))
    assert(rows("name").isNullAt(10) && rows("name").isNullAt(11) &&
      rows("name").isNullAt(12)) // quartiles numeric-only
    // exact regime: the distinct-sample is ALL distinct values, sorted
    assert(name.getSeq[String](13) === Seq("alpha", "beta"))
    assert(id.getSeq[String](13) === Seq("1", "2", "3", "4", "5"))
  }

  test("saturated distinct flags itself; estimate within RSE; sample is k values") {
    val wide = (0 until 5000).map(i => s"v$i").toDF("v")
    val r = Profile.profile(wide, distinctK = 64).head()
    assert(!r.getBoolean(4), "must flag saturation")
    assert(math.abs(r.getLong(3) - 5000L) <= 4.0 / math.sqrt(62.0) * 5000)
    // saturated: the sample is exactly k real values from the column
    val sample = r.getSeq[String](13)
    assert(sample.size === 64 && sample.forall(_.startsWith("v")))
    assert(sample === sample.sorted)
    // sample payloads are PREVIEWS: long documents must not blow up the
    // aggregation buffer (hashing still uses the full value — the two
    // long texts below differ only past the preview cut and must count
    // as 2 distinct)
    val docs = Seq("A" * 500 + "x", "A" * 500 + "y").toDF("t")
    val p = Profile.profile(docs, samplePreviewChars = 8).head()
    assert(p.getLong(3) === 2L)
    assert(p.getSeq[String](13).forall(_.length <= 8))
  }

  test("non-hashable column types profile their string form") {
    val ts = Seq("2026-01-01 10:00:00", "2026-01-02 11:00:00", "2026-01-01 10:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val r = Profile.profile(ts).head()
    assert(r.getLong(3) === 2L && r.getBoolean(4))
    assert(r.getLong(1) === 3L)
  }

  test("unknown column rejected loudly") {
    val e = intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
    assert(e.getMessage.contains("nope"))
  }
}
