package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.{Hll, Sbbf}
import graft.functions._

/** Structured Streaming surface of the sketch library.
  *
  * The mergeable-aggregate design carries over unchanged: the same
  * TypedImperativeAggregate expressions work inside streaming windowed
  * aggregations (partial buffers per micro-batch, OR/max merges into
  * state), and `mapGroupsWithState` hosts explicitly-managed sketch state
  * where custom eviction/emission is needed.
  *
  * At 100 TB/day ingest: per-window sketch state is O(sketch size) per
  * key — constant, not proportional to events — which is the whole point
  * of sketch-based streaming aggregation. Watermarks bound state count.
  */
object StreamingSketches {

  /** Windowed Bloom filter build over a stream: one ABLM filter per
    * (window, group) via the same bloom_agg used in batch. Append-mode
    * friendly (watermark closes windows).
    */
  def windowedBloom(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String,
      capacity: Long,
      fpRate: Double): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(bloom_agg(col(keyCol), capacity, fpRate).as("filter"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("filter"))

  /** Windowed approximate distinct count via HLL. */
  def windowedDistinct(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String,
      p: Int = Hll.DefaultP): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(hll_estimate(hll_agg(col(keyCol), p)).as("approx_distinct"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("approx_distinct"))

  /** Windowed distinct counts via KMV bottom-k: EXACT whenever a
    * window's distinct keys stay under k (`is_exact` says so per
    * window), bounded estimate above — per-window state is at most
    * `9 + 8k` bytes. The serialized sketch column rolls up in batch
    * (`kmv_union_agg`) into day/week counts AND supports cross-window
    * overlap questions via `kmv_intersect_estimate` — neither of which
    * an exact count column can do.
    */
  def windowedDistinctKmv(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = graft.core.Kmv.DefaultK): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(kmv_agg(col(keyCol), k).as("sketch"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        kmv_estimate(col("sketch")).as("n_distinct"),
        (!graft.functions.kmv_describe(col("sketch")).getField("saturated"))
          .as("is_exact"),
        col("sketch"))

  /** Windowed distinct-SAMPLE via the KMV payload sketch: per window, a
    * uniform sample of up to k distinct keys (their string payloads)
    * plus the distinct estimate — "what are the new user ids this hour,
    * roughly how many" in one bounded-state aggregate. State per window
    * is at most k * (12 + payload preview) bytes; the sketch column
    * rolls up in batch (`kmv_sample_union_agg`) into day/week samples.
    * The sample is EXACT (all distinct keys) while the window stays
    * under k — `is_exact` says so per window.
    */
  def windowedDistinctSample(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = graft.core.Kmv.DefaultK): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(kmv_sample_agg(
        col(keyCol), col(keyCol).cast("string"), k).as("sketch"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        kmv_sample_estimate(col("sketch")).as("n_distinct"),
        (!graft.functions.kmv_sample_describe(col("sketch"))
          .getField("saturated")).as("is_exact"),
        kmv_sample_values(col("sketch")).as("sample_keys"),
        col("sketch"))

  /** Windowed WEIGHTED distinct-sample via the A-RES sketch
    * ([[graft.core.WeightedSample]]): per window, up to k distinct keys
    * sampled proportional to their weight (re-observation keeps the MAX
    * weight) — "which users moved the most value this hour, with a
    * principled sample when there are too many to list". State per
    * window is at most k * (20 + payload preview) bytes; the sketch
    * column rolls up in batch (`weighted_sample_union_agg`). EXACT (all
    * distinct keys + max weights) while the window stays under k —
    * `is_exact` says so per window.
    */
  def windowedWeightedSample(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      weightCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = graft.core.Kmv.DefaultK): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(weighted_sample_agg(
        col(keyCol), col(weightCol), col(keyCol).cast("string"), k)
        .as("sketch"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        graft.functions.weighted_sample_describe(col("sketch"))
          .getField("n").as("n_sampled"),
        (!graft.functions.weighted_sample_describe(col("sketch"))
          .getField("saturated")).as("is_exact"),
        weighted_sample_entries(col("sketch")).as("sample"),
        col("sketch"))

  /** Maintain the incremental duplicate-substring PIPELINE STATE
    * ([[graft.ops.Dedup.substringState]]) from a document stream: each
    * micro-batch's state rows are APPENDED to the persisted parquet
    * directory, which [[graft.ops.Dedup.duplicateSpansAgainst]] screens
    * later batches against.
    *
    * Replay-sound BY CONSTRUCTION, not by transactional dedup: the
    * state's append-only update rule is property-tested to screen
    * identically under duplicate witnesses, so an at-least-once
    * foreachBatch retry only adds redundant rows — never a wrong screen.
    * (Contrast with counters/filters, where replay safety needs the
    * partition-id dedup of [[graft.job.SketchBuild]].)
    *
    * The caller supplies the checkpoint location for restartable
    * streams; the returned query runs until stopped.
    */
  def maintainSubstringState(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      statePath: String,
      window: Int = 40,
      sampleMod: Int = 1,
      checkpoint: Option[String] = None,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var w = docs.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.Dedup
          .substringState(batch.toDF(), textCol, idCol, window, sampleMod)
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(statePath)
        ()
    }
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    trigger.foreach(t => w = w.trigger(t))
    w.start()
  }

  /** Windowed quantiles via t-digest: per window, the serialized digest
    * plus the requested quantile estimates. State per window is ONE
    * digest (O(compression) centroids) — latency-percentile monitoring
    * over any event rate at constant memory. The digest column lets a
    * downstream batch job union windows (`tdigest_union_agg`) into
    * daily/weekly rollups without touching raw events.
    */
  def windowedQuantiles(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      quantiles: Seq[Double] = Seq(0.5, 0.95, 0.99),
      compression: Double = 200.0): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0, 1]")
    // decimal-exact labels: q50, q99, q99_5 — (q*100).round would
    // collapse 0.995 and 0.999 into one ambiguous "q100" column
    def label(q: Double): String = "q" + java.math.BigDecimal.valueOf(q)
      .multiply(new java.math.BigDecimal(100))
      .stripTrailingZeros().toPlainString.replace('.', '_')
    val labels = quantiles.map(label)
    require(labels.distinct.size == labels.size,
      s"duplicate quantile labels: ${labels.mkString(", ")}")
    val agg = events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(tdigest_agg(col(valueCol), compression).as("digest"))
    val qCols = quantiles.zip(labels).map { case (q, l) =>
      tdigest_quantile(col("digest"), q).as(l) }
    agg.select(
      col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        col("digest") +: qCols: _*)
  }

  /** Windowed heavy hitters via Misra-Gries: per window, the serialized
    * MG summary (for downstream `mg_union_agg` rollups, like
    * [[windowedQuantiles]]' digest column) plus the top-`topM` entries
    * as `array<struct<item, count_lb>>`. State per window is O(k)
    * regardless of event rate or key cardinality; count lower bounds
    * carry MG's deterministic guarantee (true count within
    * `decremented_weight`), and are EXACT whenever a window's distinct
    * keys fit in k.
    */
  def windowedHeavyHitters(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = 64,
      topM: Int = 10): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(mg_agg(col(keyCol), k).as("mg"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("mg"),
        mg_topk(col("mg"), topM).as("top"))

  /** EXACT streaming deduplication by content digest: keeps the first
    * arrival of each distinct `textCol` value, drops later duplicates.
    * Built on `dropDuplicatesWithinWatermark` over a sha-256 digest, so
    * state per distinct document is one digest row (bounded by the
    * watermark horizon, NOT by total stream history — the state store
    * evicts digests older than the watermark).
    *
    * Scale shape: exact dedup state is O(distinct docs inside the
    * watermark window). For unbounded horizons use [[firstSeen]] — the
    * Bloom-backed variant whose state is CONSTANT per entity at the cost
    * of a fp-rate chance of dropping a genuinely-new document.
    */
  def dedupExact(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      watermarkDelay: String): DataFrame =
    docs
      .withColumn("__graft_digest", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_digest")
      .drop("__graft_digest")

  /** Event for the stateful per-entity dedup/membership operator. */
  final case class KeyedEvent(entity: String, key: String)

  /** Output: was the key new for this entity, plus the running number of
    * events this entity has EVER emitted (persisted in state, so it keeps
    * counting across micro-batches and checkpoint restarts).
    */
  final case class SeenResult(entity: String, key: String, isNew: Boolean, seenCount: Long)

  /** Per-entity sketch state: (serialized filter, running event count). */
  final case class SeenState(filter: Array[Byte], seen: Long)

  /** Explicit sketch state per entity: first-seen detection backed by an
    * SBBF (constant memory per entity regardless of key cardinality; a
    * false positive means a rare missed "new" flag, never a duplicate
    * "new"). The `mapGroupsWithState` shape is the template for any
    * custom sketch-state streaming operator.
    */
  def firstSeen(
      events: Dataset[KeyedEvent],
      capacity: Long = 1000000,
      fpRate: Double = 0.01): Dataset[SeenResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.entity)
      .flatMapGroupsWithState[SeenState, SeenResult](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (entity: String, batch: Iterator[KeyedEvent], state: GroupState[SeenState]) =>
          val (filter, seen0) =
            if (state.exists) (Sbbf.fromBytes(state.get.filter), state.get.seen)
            else (Sbbf.empty(capacity, fpRate), 0L)
          var seen = seen0
          val out = batch.map { e =>
            val isNew = !filter.contains(e.key)
            if (isNew) filter.add(e.key)
            seen += 1
            SeenResult(entity, e.key, isNew, seen)
          }.toList
          state.update(SeenState(filter.toBytes, seen))
          out.iterator
      }
  }
}
