package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * Decode status by modality:
  *  - image: REAL — [[attachRealMedia]] synthesizes spec-valid PNGs
  *    (even ids) and FULL baseline JPEGs (odd ids — real FDCT +
  *    Huffman entropy coding, [[MediaCodecs.encodeJpegGray]]), and
  *    `graft.functions.media_meta` parses their actual headers (PNG
  *    IHDR / JPEG SOF walk, [[MediaCodecs]]); no codec library needed.
  *  - audio: REAL — valid 16-bit PCM WAV synthesis + RIFF chunk parse
  *    (channels, duration from data size / byte rate).
  *  - video: REAL — [[attachRealMedia]]'s MP4s are complete ISO BMFF
  *    files with TWO decodable tracks: a Motion-JPEG video track (4
  *    baseline-JPEG frames — real FDCT + Huffman per frame — demuxed
  *    and pixel-decoded by [[MediaCodecs.decodeMp4Jpeg]] through the
  *    real stts/stsc/stsz/stco sample tables) and an uncompressed
  *    'twos' PCM sound track ([[MediaCodecs.decodeMp4Pcm]]); the
  *    header parse (ftyp, moov -> mvhd duration, tkhd presentation
  *    size) rides the same box walk. For unknown payloads `media_meta`
  *    returns NULL so any fallback is explicit, never silent.
  * Feature extraction ([[extractFeatures]]) is REAL for payloads whose
  * sample content is readable — grayscale PNG (Inflater + scanline
  * unfilter), baseline grayscale JPEG (Huffman decode + dequant +
  * IDCT), 16-bit PCM WAV (LE sample reads), and MP4 Motion-JPEG +
  * PCM tracks — via `MediaCodecs.decodeContent`, emitting exact
  * statistics of the decoded samples. NOTHING in the media surface is
  * fake any more: the one omitted capability is third-party
  * inter-frame video codecs (H.264/VP9 — vendored codec code is out
  * of scope offline; Motion-JPEG is a real intra-only compressed
  * format). The legacy length-derived [[decode_meta]] stays as the
  * schema template / fallback for payloads that are not real
  * containers, with the honesty tag marking its outputs. The rest of
  * the surface is
  * the Spark-side contract a production decoder plugs into: the schema,
  * binary column handling, batch-shaped mapPartitions execution (the
  * Scala equivalent of a Pandas UDF over mapInPandas: one kernel
  * invocation per batch), and partitioning.
  */
object Multimodal {

  /** Typed media row: kind in {image, audio, video}, payload opaque. */
  final case class MediaRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      source: String)

  final case class DecodedMeta(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      channels: Int,
      duration_ms: Long)

  final case class MediaFeature(
      media_id: Long,
      feature: Array[Float])

  /** Attach a synthetic media payload to a documents-like table —
    * deterministic bytes from the text (stands in for reading blob
    * storage; the column type and sizes are what matter).
    */
  def attachMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("synthetic").as("source"))

  /** Deterministic per-id media dimensions (pure arithmetic — the DuckDB
    * oracle mirrors these formulas exactly): image and video get a
    * width/height, audio and video a duration.
    */
  private def dims(id: Column, kind: Column): (Column, Column, Column) = (
    when(kind =!= "audio", (lit(32) + pmod(id * 7919L, lit(608))).cast("int"))
      .otherwise(lit(0)),
    when(kind =!= "audio", (lit(32) + pmod(id * 4241L, lit(448))).cast("int"))
      .otherwise(lit(0)),
    when(kind =!= "image", (lit(1000) + pmod(id * 31L, lit(60000))).cast("long"))
      .otherwise(lit(0L)))

  /** Attach REAL media payloads to a documents-like table: per row a
    * spec-valid PNG (even ids) or full baseline JPEG (odd ids) with
    * id-derived dimensions for `image` rows, a valid PCM WAV with an
    * id-derived duration for `audio` rows, and a COMPLETE MP4 (Motion-
    * JPEG video track + 'twos' PCM sound track, real sample tables)
    * for `video` rows. `media_meta` must recover the id-derived
    * numbers by PARSING the bytes — the cross-engine oracle recomputes
    * the same numbers from the id formulas.
    */
  def attachRealMedia(df: DataFrame, idCol: String): DataFrame = {
    // spread BEFORE the per-row encoder: a one-file corpus read arrives
    // as a single scan partition and would serialize every JPEG/WAV/MP4
    // encode on one core (guide §2.5); only the 8-byte id crosses the
    // spread shuffle, never payload bytes. No-op at production split
    // counts.
    val spreadIds = Parallelize.spread(
      df.select(col(idCol).cast("long").as("media_id")))
    val id = col("media_id")
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(id, lit(3)) + 1).cast("int"))
    val (w, h, d) = dims(id, kind)
    spreadIds.select(
      id.as("media_id"),
      kind.as("kind"),
      graft.functions.media_encode(kind, id, w, h, d).as("payload"),
      lit("synthetic").as("source"))
  }

  /** FAKE DECODE (deterministic, SQL-expressible so the oracle can verify
    * the plumbing exactly): "header parse" derives dimensions from payload
    * length. Kept as the schema template and the fallback for payloads
    * that are NOT real containers (e.g. [[attachMedia]]'s text blobs);
    * real containers use `graft.functions.media_meta`.
    */
  def decode_meta(payload: Column, kind: Column): Column = {
    val len = octet_length(payload)
    struct(
      (lit(32) + pmod(len, lit(608))).as("width"),
      (lit(32) + pmod(len * 7, lit(448))).as("height"),
      when(kind === "audio", 1).otherwise(3).as("channels"),
      when(kind === "image", 0L)
        .otherwise((pmod(len * 31, lit(60000)) + 1000).cast("long")).as("duration_ms"))
  }

  /** FAKE RESIZE: recompute metadata for a target box, preserving aspect
    * ratio — pure arithmetic, exercised as a column op.
    */
  def resize_meta(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    struct(
      round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height"),
      meta.getField("channels").as("channels"),
      meta.getField("duration_ms").as("duration_ms"))
  }

  /** Batch-shaped feature extraction — the mapPartitions contract a real
    * model-inference kernel (ONNX/JNI) plugs into: the kernel sees a
    * buffered BATCH of payloads (here 64) per invocation, amortizing model
    * dispatch, and emits fixed-width 8-float vectors.
    *
    * REAL where the payload's samples are readable (grayscale PNG and
    * baseline JPEG pixels, WAV and MP4-PCM samples —
    * `MediaCodecs.decodeContent`): features are exact
    * statistics of the DECODED samples
    * `[mean, rms, variance, log1p(n), 0, 0, 0, 1]` (tag 1 = real).
    * FAKE (declared) elsewhere — header-only payloads and opaque
    * blobs get the deterministic XXH64-derived vector with tag 0, so
    * tests can assert exact plumbing behavior for every input and
    * consumers can filter on the honesty tag.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch (the real kernel would run inference
        // on the whole batch here)
        batch.iterator.map { row =>
          val feat = MediaCodecs.decodeContent(row.payload) match {
            case Some(s) if s.n > 0 =>
              val mean = s.sum.toDouble / s.n
              val rms = math.sqrt(s.sumsq.toDouble / s.n)
              val variance = s.sumsq.toDouble / s.n - mean * mean
              Array(mean.toFloat, rms.toFloat, variance.toFloat,
                math.log1p(s.n.toDouble).toFloat, 0f, 0f, 0f, 1f)
            case _ =>
              val base = Hashing.hashBytes(row.payload)
              Array.tabulate(8) { i =>
                if (i == 7) 0f
                else (Hashing.mix64(base + i).toDouble / Long.MaxValue.toDouble).toFloat
              }
          }
          MediaFeature(row.media_id, feat)
        }
      }
    }
  }

  /** Frame sampler for video rows: one row per sampled frame at a fixed
    * stride over the clip duration — the explode-shaped operator a real
    * ffmpeg-backed sampler would implement. Duration comes from the REAL
    * container parse (`media_meta`, MP4 mvhd) when the payload is a
    * known container, falling back to the declared length-derived fake
    * for opaque blobs.
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame = {
    val real = graft.functions.media_meta(col("payload")).getField("duration_ms")
    val fake = decode_meta(col("payload"), col("kind")).getField("duration_ms")
    df.filter(col("kind") === "video")
      .withColumn("duration_ms", coalesce(real, fake))
      .select(
        col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ts_ms"))
  }

  /** Assemble the typed media dataset from a documents-like table. */
  def mediaDataset(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    attachMedia(docs, idCol, textCol).as[MediaRow]
  }
}
