package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{Hll, Sbbf}

class StreamingSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed bloom over a stream equals batch-built filters per window") {
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "key")

    val q = StreamingSketches.windowedBloom(
      events, "ts", "key", "10 minutes", "0 seconds", 1000, 0.01)
      .writeStream.format("memory").queryName("wb").outputMode("append").start()

    // two windows of data
    input.addData((0 until 50).map(i => (ts(i % 10), s"w1k$i")): _*)
    input.addData((0 until 30).map(i => (ts(10 + i % 10), s"w2k$i")): _*)
    q.processAllAvailable()
    // advance watermark far so both windows close and emit (append mode)
    input.addData((ts(59), "latewm"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wb").collect()
    assert(rows.length >= 2)
    val byStart = rows.map(r => r.getTimestamp(0) -> r.getAs[Array[Byte]](2)).toMap
    val w1 = Sbbf.fromBytes(byStart(Timestamp.valueOf("2026-01-01 10:00:00")))
    (0 until 50).foreach(i => assert(w1.contains(s"w1k$i")))
    val batch1 = Sbbf.empty(1000, 0.01)
    (0 until 50).foreach(i => batch1.add(s"w1k$i"))
    assert(java.util.Arrays.equals(w1.toBytes, batch1.toBytes))

    val w2 = Sbbf.fromBytes(byStart(Timestamp.valueOf("2026-01-01 10:10:00")))
    (0 until 30).foreach(i => assert(w2.contains(s"w2k$i")))
  }

  test("dedupExact keeps the first arrival of each distinct text, across batches") {
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "id", "text")
    val name = "sdd_spec"
    val q = StreamingSketches.dedupExact(docs, "ts", "text", "1 hour")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // batch 1: 20 distinct texts, each duplicated once inside the batch
    input.addData((0 until 40).map(i => (ts(i % 10), i.toLong, s"doc_${i % 20}")): _*)
    q.processAllAvailable()
    // batch 2: 10 repeats of batch-1 texts (cross-batch dups) + 5 new
    input.addData((0 until 15).map(i =>
      (ts(10 + i % 5), (100 + i).toLong, if (i < 10) s"doc_$i" else s"new_$i")): _*)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table(name).collect()
    assert(kept.length === 25, s"20 + 5 distinct texts, got ${kept.length}")
    assert(kept.map(_.getString(2)).distinct.length === 25)
    // the digest helper column must not leak into the output schema
    assert(!spark.table(name).columns.contains("__graft_digest"))
  }

  test("windowed KMV distinct: exact below k, sketches roll up and intersect") {
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingSketches.windowedDistinctKmv(
      input.toDF().toDF("ts", "key"), "ts", "key", "10 minutes", "0 seconds",
      k = 1024)
      .writeStream.format("memory").queryName("wk").outputMode("append").start()

    // window 1: 700 distinct (fed twice); window 2: 300 distinct, 200
    // of them shared with window 1
    input.addData((0 until 2000).map(i => (ts(i % 10), s"u${i % 700}")): _*)
    input.addData((0 until 300).map(i => (ts(10 + i % 10), s"u${i + 500}")): _*)
    q.processAllAvailable()
    input.addData((ts(59), "latewm"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wk")
      .filter(col("window_start").isin(
        Timestamp.valueOf("2026-01-01 10:00:00"),
        Timestamp.valueOf("2026-01-01 10:10:00")))
      .orderBy(col("window_start")).collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(2) === 700L && rows(0).getBoolean(3))
    assert(rows(1).getLong(2) === 300L && rows(1).getBoolean(3))
    // the sketch column rolls up exactly (union) and intersects exactly
    val s1 = graft.core.Kmv.fromBytes(rows(0).getAs[Array[Byte]](4))
    val s2 = graft.core.Kmv.fromBytes(rows(1).getAs[Array[Byte]](4))
    assert(graft.core.Kmv.intersectEstimate(s1, s2) === 200.0)
    assert(s1.mergeIn(s2).estimate === 800.0)
  }

  test("windowed distinct-SAMPLE: exact sample below k, rolls up in batch") {
    val input = MemoryStream[(Timestamp, String)]
    // k = 128 so even the cross-window UNION (70 distinct) stays in the
    // exact regime — the rollup assertion below is a set equality
    val q = StreamingSketches.windowedDistinctSample(
      input.toDF().toDF("ts", "key"), "ts", "key", "10 minutes", "0 seconds",
      k = 128)
      .writeStream.format("memory").queryName("wds").outputMode("append").start()
    // window 1: 40 distinct keys fed 3x; window 2: 30 distinct
    input.addData((0 until 120).map(i => (ts(i % 10), s"a${i % 40}")): _*)
    input.addData((0 until 30).map(i => (ts(10 + i % 10), s"b$i")): _*)
    q.processAllAvailable()
    input.addData((ts(59), "latewm"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wds")
      .filter(col("window_start").isin(
        Timestamp.valueOf("2026-01-01 10:00:00"),
        Timestamp.valueOf("2026-01-01 10:10:00")))
      .orderBy(col("window_start")).collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(2) === 40L && rows(0).getBoolean(3))
    assert(rows(0).getSeq[String](4).toSet === (0 until 40).map(i => s"a$i").toSet)
    assert(rows(1).getLong(2) === 30L && rows(1).getBoolean(3))
    // the sketch column rolls up in batch: union == all distinct keys
    val merged = graft.core.KmvSample.fromBytes(rows(0).getAs[Array[Byte]](5))
      .mergeIn(graft.core.KmvSample.fromBytes(rows(1).getAs[Array[Byte]](5)))
    assert(merged.estimate === 70.0)
    assert(merged.payloads.map(p => new String(p, "UTF-8")).toSet ===
      ((0 until 40).map(i => s"a$i") ++ (0 until 30).map(i => s"b$i")).toSet)
  }

  test("windowed WEIGHTED sample: exact below k, max-weight rule, rolls up in batch") {
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StreamingSketches.windowedWeightedSample(
      input.toDF().toDF("ts", "key", "w"), "ts", "key", "w",
      "10 minutes", "0 seconds", k = 128)
      .writeStream.format("memory").queryName("wws").outputMode("append").start()
    // window 1: 40 distinct keys, each seen with weights i+1 and 2(i+1)
    // — the retained weight must be the MAX; window 2: 30 distinct
    input.addData((0 until 80).map { i =>
      (ts(i % 10), s"a${i % 40}", (i % 40 + 1).toDouble * (1 + i / 40))
    }: _*)
    input.addData((0 until 30).map(i => (ts(10 + i % 10), s"b$i", 5.0)): _*)
    q.processAllAvailable()
    input.addData((ts(59), "latewm", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wws")
      .filter(col("window_start").isin(
        Timestamp.valueOf("2026-01-01 10:00:00"),
        Timestamp.valueOf("2026-01-01 10:10:00")))
      .orderBy(col("window_start")).collect()
    assert(rows.length === 2)
    assert(rows(0).getInt(2) === 40 && rows(0).getBoolean(3))
    val w1 = rows(0).getSeq[org.apache.spark.sql.Row](4)
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w1 === (0 until 40).map(i => s"a$i" -> (i + 1) * 2.0).toMap)
    assert(rows(1).getInt(2) === 30 && rows(1).getBoolean(3))
    // the sketch column rolls up in batch: union == all keys, max weights
    val merged = graft.core.WeightedSample
      .fromBytes(rows(0).getAs[Array[Byte]](5))
      .mergeIn(graft.core.WeightedSample.fromBytes(rows(1).getAs[Array[Byte]](5)))
    assert(merged.size === 70)
    assert(merged.entries.map { case (_, w, p) => new String(p, "UTF-8") -> w }.toMap ===
      ((0 until 40).map(i => s"a$i" -> (i + 1) * 2.0) ++
        (0 until 30).map(i => s"b$i" -> 5.0)).toMap)
  }

  test("maintainSubstringState: streamed state screens like from-scratch; replay-tolerant") {
    import graft.ops.Dedup
    val input = MemoryStream[(Long, String)]
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-msss").toString + "/state"
    val q = StreamingSketches.maintainSubstringState(
      input.toDF().toDF("doc_id", "text"), "text", "doc_id", statePath,
      window = 8)
    val b1 = Seq(
      (1L, "unique alpha text one SHARED BOILERPLATE tail a"),
      (2L, "wholly distinct content nothing repeated"))
    val b2 = Seq(
      (3L, "second ingest with SHARED BOILERPLATE again"),
      (4L, "abcabcabcabcabcabc"))
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val corpus = (b1 ++ b2).toDF("doc_id", "text")
    val newb = Seq(
      (101L, "x SHARED BOILERPLATE y"),
      (102L, "abcabc plus fresh"),
      (103L, "entirely novel never seen")).toDF("doc_id", "text")
    def screen(state: org.apache.spark.sql.DataFrame) =
      Dedup.duplicateSpansAgainst(newb, state, corpus, "text", "doc_id",
        window = 8).collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val streamed = screen(spark.read.parquet(statePath))
    val scratch = screen(
      Dedup.substringState(corpus, "text", "doc_id", window = 8))
    assert(streamed === scratch)
    assert(streamed(101L)._2 > 0L && streamed(103L)._2 === 0L)
    // at-least-once REPLAY: re-append batch 1's state (a retried
    // micro-batch) — redundant witnesses must not change the screen
    Dedup.substringState(b1.toDF("doc_id", "text"), "text", "doc_id",
        window = 8)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(statePath)
    assert(screen(spark.read.parquet(statePath)) === streamed)
  }

  test("windowed HLL distinct over a stream within bound") {
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingSketches.windowedDistinct(
      input.toDF().toDF("ts", "key"), "ts", "key", "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("wd").outputMode("append").start()

    input.addData((0 until 2000).map(i => (ts(i % 10), s"u${i % 700}")): _*)
    q.processAllAvailable()
    input.addData((ts(59), "latewm"))
    q.processAllAvailable()
    q.stop()

    val est = spark.table("wd")
      .filter(col("window_start") === Timestamp.valueOf("2026-01-01 10:00:00"))
      .head.getLong(2)
    assert(math.abs(est - 700) <= 3 * 0.0082 * 700 + 5)
  }

  test("windowed t-digest quantiles over a stream within rank error") {
    val input = MemoryStream[(Timestamp, Double)]
    val q = StreamingSketches.windowedQuantiles(
      input.toDF().toDF("ts", "v"), "ts", "v", "10 minutes", "0 seconds",
      quantiles = Seq(0.5, 0.99))
      .writeStream.format("memory").queryName("wq").outputMode("append").start()

    // one window, values 0..3999 in scrambled order across two batches
    input.addData((0 until 2000).map(i => (ts(i % 10), ((i * 2654435761L) % 4000).toDouble)): _*)
    q.processAllAvailable()
    input.addData((2000 until 4000).map(i => (ts(i % 10), ((i * 2654435761L) % 4000).toDouble)): _*)
    q.processAllAvailable()
    input.addData((ts(59), 0.0)) // advance watermark, close the window
    q.processAllAvailable()
    q.stop()

    val row = spark.table("wq")
      .filter(col("window_start") === Timestamp.valueOf("2026-01-01 10:00:00"))
      .head
    val med = row.getDouble(row.fieldIndex("q50"))
    val p99 = row.getDouble(row.fieldIndex("q99"))
    assert(math.abs(med - 2000.0) <= 100.0, s"median $med")
    assert(math.abs(p99 - 3960.0) <= 100.0, s"p99 $p99")
    // the serialized digest is union-able downstream
    val dg = graft.core.TDigest.fromBytes(row.getAs[Array[Byte]](row.fieldIndex("digest")))
    assert(dg.count > 0)
  }

  test("windowed heavy hitters: exact per-window counts when distinct <= k, mg blob unions") {
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "key")
    val q = StreamingSketches.windowedHeavyHitters(
      events, "ts", "key", "10 minutes", "0 seconds", k = 8, topM = 5)
      .writeStream.format("memory").queryName("whh").outputMode("complete").start()
    // window 1: a x30, b x12, c x5; window 2: a x7, d x9
    input.addData(
      (0 until 30).map(i => (ts(i % 10), "a")) ++
      (0 until 12).map(i => (ts(i % 10), "b")) ++
      (0 until 5).map(i => (ts(i % 10), "c")) ++
      (0 until 7).map(i => (ts(10 + i % 10), "a")) ++
      (0 until 9).map(i => (ts(10 + i % 10), "d")): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("whh").collect()
    val byStart = rows.map(r => r.getTimestamp(0) ->
      r.getSeq[org.apache.spark.sql.Row](3).map(e => e.getString(0) -> e.getLong(1)).toMap).toMap
    assert(byStart(Timestamp.valueOf("2026-01-01 10:00:00")) ===
      Map("a" -> 30L, "b" -> 12L, "c" -> 5L))
    assert(byStart(Timestamp.valueOf("2026-01-01 10:10:00")) ===
      Map("a" -> 7L, "d" -> 9L))
    // the mg column rolls windows up via mg_union_agg with exact totals
    val total = spark.table("whh").agg(
        graft.functions.mg_topk(graft.functions.mg_union_agg(col("mg")), 5).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item"), col("e.count_lb")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(total === Map("a" -> 37L, "b" -> 12L, "c" -> 5L, "d" -> 9L))
  }

  test("firstSeen state survives query restart from checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val input = MemoryStream[StreamingSketches.KeyedEvent]
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(String, Boolean)]()
    def start() = StreamingSketches.firstSeen(input.toDS(), 10000, 0.001)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingSketches.SeenResult], _: Long) =>
        batch.collect().foreach(r => collected.add((r.key, r.isNew)))
      }
      .option("checkpointLocation", dir)
      .outputMode("update").start()

    val q1 = start()
    input.addData(
      StreamingSketches.KeyedEvent("e1", "a"),
      StreamingSketches.KeyedEvent("e1", "b"))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint: the SBBF state must be restored, so the
    // repeat of "a" is NOT new while "z" is
    val q2 = start()
    input.addData(
      StreamingSketches.KeyedEvent("e1", "a"),
      StreamingSketches.KeyedEvent("e1", "z"))
    q2.processAllAvailable()
    q2.stop()

    val rows = collected.toArray.toList
    assert(rows.contains(("a", false)), s"repeat after restart must not be new: $rows")
    assert(rows.contains(("z", true)))
  }

  test("firstSeen stateful operator: sketch state across micro-batches") {
    val input = MemoryStream[StreamingSketches.KeyedEvent]
    val q = StreamingSketches.firstSeen(input.toDS(), 10000, 0.001)
      .writeStream.format("memory").queryName("fs").outputMode("update").start()

    input.addData(
      StreamingSketches.KeyedEvent("e1", "a"),
      StreamingSketches.KeyedEvent("e1", "b"),
      StreamingSketches.KeyedEvent("e2", "a"))
    q.processAllAvailable()
    // second batch: repeats must NOT be new; state persisted across batches
    input.addData(
      StreamingSketches.KeyedEvent("e1", "a"),
      StreamingSketches.KeyedEvent("e1", "c"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(rows.count(_._3) === 4) // a,b (e1), a (e2), c (e1) are new
    assert(rows.contains(("e1", "a", true)))
    assert(rows.contains(("e1", "a", false))) // the batch-2 repeat
    assert(rows.contains(("e1", "c", true)))
    // seenCount is a RUNNING per-entity count persisted in state: e1 saw
    // a,b in batch 1 then a,c in batch 2, so "c" is its 4th event ever
    val e1c = spark.table("fs")
      .filter(col("entity") === "e1" && col("key") === "c").head
    assert(e1c.getLong(3) === 4L, s"seenCount must run across batches: $e1c")
  }
}
