package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.functions._

/** One row per profiled column. Exactness annotations:
  * `n_rows`/`n_nulls`/`min_value`/`max_value` are exact;
  * `n_distinct` is exact iff `distinct_is_exact` (the KMV stayed
  * unsaturated); `top_value` counts are the deterministic Misra-Gries
  * interval (exact iff lb == ub, guaranteed when the column's distinct
  * count fits the summary); `p25`/`p50`/`p75` are t-digest quantiles
  * (numeric columns only, ~1-2% interior rank error, NaN-free — all
  * three ride one digest).
  */
case class ColumnProfile(
    column: String,
    n_rows: Long,
    n_nulls: Long,
    n_distinct: Long,
    distinct_is_exact: Boolean,
    min_value: String,
    max_value: String,
    top_value: String,
    top_count_lb: Long,
    top_count_ub: Long,
    p25: Option[Double],
    p50: Option[Double],
    p75: Option[Double],
    sample_values: Seq[String])

/** One-pass table profiling — the "describe this 100 TB table"
  * primitive, composing the library's sketch families into a single
  * aggregation job:
  *
  *  - null counts and min/max: exact conditional aggregates;
  *  - distinct counts AND a uniform distinct-sample: ONE KMV
  *    distinct-sample-with-payload sketch per column — EXACT below k
  *    (flagged; the sample is then ALL distinct values), a bounded
  *    estimate plus a uniform k-sample above. `sample_values` holds
  *    PREVIEWS (first `samplePreviewChars` chars — buffers stay
  *    k x preview bytes even over huge documents; hashing uses the
  *    full value, so counts are unaffected), sorted lexicographically
  *    for determinism;
  *  - heavy value: Misra-Gries with deterministic count interval;
  *  - median: t-digest (numeric columns).
  *
  * Every column's aggregates ride ONE scan (conditional aggregation, no
  * per-column rescans — the round-4 harness-hygiene rule applied as an
  * operator); the result is ncols rows assembled driver-side from the
  * single aggregate row. min/max are computed on the NATIVE type and
  * cast to string afterward (a lexicographic min over stringified
  * numerics would be wrong).
  */
object Profile {

  def profile(
      df: DataFrame,
      columns: Seq[String] = Nil,
      distinctK: Int = graft.core.Kmv.DefaultK,
      heavyK: Int = 4096,
      samplePreviewChars: Int = 256): DataFrame = {
    require(samplePreviewChars >= 1,
      s"samplePreviewChars must be >= 1, got $samplePreviewChars")
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "no columns to profile")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val numeric: Map[String, Boolean] =
      cols.map(c => c -> df.schema(c).dataType.isInstanceOf[NumericType]).toMap

    val aggs = scala.collection.mutable.ArrayBuffer[Column](
      count(lit(1)).as("__n"))
    // abloom_key_hash takes string/binary/integral/floating keys; other
    // types (timestamp, date, decimal, ...) profile their string form
    val hashable = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.BinaryType,
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.DoubleType, org.apache.spark.sql.types.FloatType)
    cols.foreach { c =>
      val cc = col(c)
      val key = if (hashable(df.schema(c).dataType)) cc else cc.cast("string")
      aggs += sum(when(cc.isNull, 1L).otherwise(0L)).as(s"__nulls_$c")
      // one sketch carries BOTH the distinct estimate and the sample.
      // The payload is a PREVIEW (first samplePreviewChars chars): a
      // profiler sample of a long-text column must not multiply the
      // aggregation buffer by the document length (k x 64 KiB/column
      // otherwise) — hashing still uses the FULL value, so distinct
      // counts are unaffected
      aggs += kmv_sample_agg(key,
        substring(cc.cast("string"), 1, samplePreviewChars),
        distinctK).as(s"__kmv_$c")
      aggs += min(cc).cast("string").as(s"__min_$c")
      aggs += max(cc).cast("string").as(s"__max_$c")
      aggs += mg_agg(cc.cast("string"), heavyK).as(s"__mg_$c")
      if (numeric(c)) aggs += tdigest_agg(cc.cast("double")).as(s"__td_$c")
    }
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).head()

    val nRows = row.getAs[Long]("__n")
    val out = cols.map { c =>
      val kmv = graft.core.KmvSample.fromBytes(row.getAs[Array[Byte]](s"__kmv_$c"))
      val mg = graft.core.MisraGries.fromBytes(row.getAs[Array[Byte]](s"__mg_$c"))
      val top = mg.topK(1).headOption
      // quartiles come from the SAME digest — no extra scan
      val quartiles =
        if (!numeric(c)) None
        else {
          val td = graft.core.TDigest.fromBytes(row.getAs[Array[Byte]](s"__td_$c"))
          if (td.count == 0) None
          else Some((td.quantile(0.25), td.quantile(0.5), td.quantile(0.75)))
        }
      ColumnProfile(
        column = c,
        n_rows = nRows,
        n_nulls = row.getAs[Long](s"__nulls_$c"),
        n_distinct = math.round(kmv.estimate),
        distinct_is_exact = !kmv.isSaturated,
        min_value = row.getAs[String](s"__min_$c"),
        max_value = row.getAs[String](s"__max_$c"),
        top_value = top.map(_._1).orNull,
        top_count_lb = top.map(_._2).getOrElse(0L),
        top_count_ub = top.map(_._3).getOrElse(0L),
        p25 = quartiles.map(_._1),
        p50 = quartiles.map(_._2),
        p75 = quartiles.map(_._3),
        sample_values = kmv.payloads
          .map(p => new String(p, java.nio.charset.StandardCharsets.UTF_8))
          .toSeq.sorted)
    }
    val spark = df.sparkSession
    import spark.implicits._
    spark.createDataset(out).toDF()
  }
}
