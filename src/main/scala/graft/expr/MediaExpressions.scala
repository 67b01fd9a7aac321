package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.MediaCodecs

/** Executor-side kernels for the media expressions. */
object MediaKernels {

  /** Null (not an exception) for unknown/corrupt containers: a 100 TB
    * scan must survive bad blobs; count the nulls to observe them. */
  def decodeMeta(payload: Array[Byte]): InternalRow =
    MediaCodecs.decodeMeta(payload) match {
      case Some(m) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(m.format), m.width, m.height,
            m.channels, m.durationMs))
      case None => null
    }

  /** Deterministic synthesis of a REAL container payload per row:
    * image -> spec-valid PNG (even variant) or full baseline JPEG (odd —
    * real FDCT + Huffman entropy coding, [[MediaCodecs.encodeJpegGray]]),
    * audio -> spec-valid 16-bit PCM WAV at 8 kHz whose duration is
    * exactly `durationMs`, video -> COMPLETE ISO BMFF (MP4) file (header
    * boxes + mdat + full sample tables) with a Motion-JPEG video track
    * AND a real 'twos' PCM sound track, anything else -> an opaque
    * tagged blob that [[decodeMeta]] reports as unparseable.
    *
    * ALL four containers carry REAL id-derived content (not silence):
    * PNG pixel(x, y) = (variant + y) mod 256 (scanline-constant, encoded
    * through the Up filter so decoding is an actual unfilter pass);
    * JPEG pixel(x, y) = (variant + floor(y/8)) mod 256 (block-constant,
    * so the lossy codec is EXACT on these: DC-only blocks); WAV
    * and MP4 sample(j) = (variant mod 64) + (j mod 16) over
    * n = durationMs * 8; MP4 video frame f pixel(x, y) =
    * (variant + f + floor(y/8)) mod 256 over 4 frames (block-constant
    * per frame — the Motion-JPEG round trip is exact like the image
    * synth). All formulas are integer-exact and
    * SQL-expressible, so a cross-engine oracle can recompute the content
    * statistics [[decodeContentStats]] reads back from the bytes.
    */
  def encode(kind: UTF8String, variant: Long, width: Int, height: Int,
      durationMs: Long): Array[Byte] =
    kind.toString match {
      case "image" =>
        if ((variant & 1L) == 0L)
          MediaCodecs.encodePng(width, height, (_, y) => ((variant + y) & 0xffL).toInt)
        else
          // BLOCK-ROW-constant pixels (one value per 8-scanline band):
          // every 8x8 block is flat, so the baseline JPEG round trip is
          // EXACT (DC-only blocks, DC quant step divides 8*(v-128)) and
          // the oracle can recompute the decoded stats from this formula
          MediaCodecs.encodeJpegGray(width, height,
            (_, y) => ((variant + (y >> 3)) & 0xffL).toInt)
      case "audio" =>
        // 8 samples per ms at 8 kHz -> duration reproduces exactly;
        // reject durations whose sample count would wrap Int (a wrapped
        // value silently encodes a valid-but-wrong WAV)
        require(durationMs >= 0 && durationMs <= Int.MaxValue / 8L,
          s"audio duration_ms out of range: $durationMs")
        MediaCodecs.encodeWav(1, 8000, (durationMs * 8L).toInt,
          j => ((variant & 63L) + (j % 16L)).toShort)
      case "video" =>
        // complete MP4: a REAL Motion-JPEG video track (4 baseline-JPEG
        // frames; pixel(x, y, f) = (variant + f + y/8) mod 256 —
        // block-constant per frame, so the lossy codec round-trips
        // EXACTLY like the image synth) + a REAL 'twos' PCM sound track
        // whose samples follow the SAME formula as the WAV synth (8 kHz
        // media timescale, so n = durationMs * 8 reproduces exactly).
        // The CODED frame size is intentionally smaller than the tkhd
        // presentation size (legal and common — players scale): every
        // codec path stays real while the per-row work stays benchable;
        // the raw Mpixels/s numbers live in KernelBench.
        require(durationMs >= 0 && durationMs <= Int.MaxValue / 16L,
          s"video duration_ms out of range: $durationMs")
        // floorMod: a negative variant must not produce non-positive
        // coded dims (every other variant use is sign-safe: & 63L etc.)
        val fw = 32 + Math.floorMod(variant * 7919L, 128L).toInt
        val fh = 32 + Math.floorMod(variant * 4241L, 96L).toInt
        val frames = (0 until 4).map { f =>
          MediaCodecs.encodeJpegGray(fw, fh,
            (_, y) => ((variant + f + (y >> 3)) & 0xffL).toInt)
        }
        MediaCodecs.encodeMp4(width, height, durationMs,
          j => ((variant & 63L) + (j % 16L)).toShort, frames = frames,
          frameWidth = fw, frameHeight = fh)
      case _ =>
        val tag = s"GRAFTRAW:$variant:$width:$height:$durationMs"
        tag.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }

  /** Null for payloads without readable sample content (JPEG/MP4 headers,
    * unknown blobs) — content stats exist only where the decode is real.
    */
  def decodeContentStats(payload: Array[Byte]): InternalRow =
    MediaCodecs.decodeContent(payload) match {
      case Some(s) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(s.format), s.n, s.sum, s.sumsq))
      case None => null
    }

  /** Per-frame Motion-JPEG pixel stats in sample order; null when the
    * payload has no decodable jpeg-coded video track.
    */
  def decodeFrameStats(payload: Array[Byte])
    : org.apache.spark.sql.catalyst.util.ArrayData =
    MediaCodecs.decodeMp4Frames(payload) match {
      case Some(fs) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          fs.map(s =>
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](s.n, s.sum, s.sumsq)): Any))
      case None => null
    }
}

/** `media_meta(payload) -> struct<format, width, height, channels,
  * duration_ms>`: REAL container-header parse (PNG IHDR, JPEG SOF marker
  * walk, WAV RIFF chunks); NULL for unknown/corrupt payloads.
  */
case class MediaMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaMetaExpr.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"media_meta expects BINARY, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.decodeMeta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("mediaMeta")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow $row =
        graft.expr.MediaKernels.decodeMeta($c);
      if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaMetaExpr =
    copy(child = newChild)
  override def prettyName: String = "media_meta"
}

object MediaMetaExpr {
  val schema: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
}

/** `media_content_stats(payload) -> struct<format, n, sum, sumsq>`: REAL
  * content decode — inflate+unfilter grayscale PNG pixels / read PCM WAV
  * samples — aggregated to exact integer statistics (count, sum, sum of
  * squares). NULL where no sample content is readable (JPEG/MP4 header
  * payloads, unknown blobs): feature extraction is only claimed where
  * the decode is real.
  */
case class MediaContentStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaContentStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"media_content_stats expects BINARY, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.decodeContentStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("contentStats")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow $row =
        graft.expr.MediaKernels.decodeContentStats($c);
      if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaContentStats =
    copy(child = newChild)
  override def prettyName: String = "media_content_stats"
}

object MediaContentStats {
  val schema: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sum", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false)))
}

/** `media_frame_stats(payload) -> array<struct<n, sum, sumsq>>`: the
  * Motion-JPEG track's frames demuxed + JPEG-decoded to PER-FRAME exact
  * pixel statistics, in sample order (posexplode for the frame index) —
  * the exploded shape frame-level feature extraction works on. NULL for
  * payloads without a decodable jpeg-coded video track.
  */
case class MediaFrameStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaFrameStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"media_frame_stats expects BINARY, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.decodeFrameStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("frameStats")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $arr =
        graft.expr.MediaKernels.decodeFrameStats($c);
      if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaFrameStats =
    copy(child = newChild)
  override def prettyName: String = "media_frame_stats"
}

object MediaFrameStats {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false))), containsNull = false)
}

/** `media_encode(kind, variant, width, height, duration_ms) -> binary`:
  * deterministic synthesis of REAL container payloads (see
  * [[MediaKernels.encode]]). Synthesis-side only (test/fixture data —
  * production payloads come from blob storage), so interpreted eval
  * (CodegenFallback) is fine; it is still a native expression, not a
  * ScalaUDF encoder round-trip.
  */
case class MediaEncode(
    kind: Expression,
    variant: Expression,
    widthExpr: Expression,
    heightExpr: Expression,
    durationMs: Expression)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(kind, variant, widthExpr, heightExpr, durationMs)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(StringType, LongType, IntegerType, IntegerType, LongType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"media_encode expects (STRING, BIGINT, INT, INT, BIGINT), got " +
        actual.map(_.sql).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val k = kind.eval(input)
    val v = variant.eval(input)
    val w = widthExpr.eval(input)
    val h = heightExpr.eval(input)
    val d = durationMs.eval(input)
    if (k == null || v == null || w == null || h == null || d == null) null
    else MediaKernels.encode(k.asInstanceOf[UTF8String], v.asInstanceOf[Long],
      w.asInstanceOf[Int], h.asInstanceOf[Int], d.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MediaEncode =
    MediaEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4))
  override def prettyName: String = "media_encode"
}
