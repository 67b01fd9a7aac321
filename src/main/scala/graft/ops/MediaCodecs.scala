package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater}

/** REAL pure-JVM media codecs for the multimodal pipeline — container
  * parsing/synthesis AND sample decode for every format that does not
  * require a motion-video entropy decoder:
  *
  *  - PNG: full encoder (signature + IHDR + zlib IDAT + IEND, correct
  *    CRCs — the output is a spec-valid decodable image, verified
  *    against the JDK's ImageIO in tests) and IHDR parser.
  *  - JPEG: full BASELINE codec (ITU-T.81): [[encodeJpegGray]] writes a
  *    spec-valid single-component 8-bit baseline JPEG — forward DCT,
  *    quantization, zigzag, Annex-K Huffman entropy coding with byte
  *    stuffing — verified decodable against the JDK's ImageIO in tests;
  *    [[decodeJpegGray]] Huffman-decodes the scan, dequantizes and runs
  *    the inverse DCT to recover the pixels. The quant table keeps flat
  *    (DC-only) blocks bit-exact through the round trip, so id-derived
  *    block-constant synth images yield integer-exact content stats a
  *    cross-engine oracle can recompute. [[encodeJpegHeader]] (legacy
  *    marker-stream synthesis, no scan) and the marker-walking SOF
  *    parser remain for header-only payloads.
  *  - WAV: full PCM encoder (RIFF/WAVE fmt + data, silence payload —
  *    spec-valid, verified against javax.sound in tests) and a
  *    chunk-walking parser computing duration from data size / byte
  *    rate.
  *
  *  - MP4 (ISO BMFF): header synthesis/parse (mvhd duration, tkhd
  *    16.16 presentation size) PLUS a complete file form
  *    ([[encodeMp4]]) carrying a REAL uncompressed 'twos' PCM sound
  *    track — mdat samples addressed by full stts/stsc/stsz/stco
  *    sample tables that [[decodeMp4Pcm]] walks like a real demuxer —
  *    and, when frames are supplied, a REAL Motion-JPEG video track
  *    whose samples [[decodeMp4Jpeg]] demuxes and runs through the
  *    full baseline-JPEG decoder. Nothing in the media surface is
  *    fake any more; the one omitted capability is third-party
  *    inter-frame codecs (H.264/VP9 — vendored codec code is out of
  *    scope offline; M-JPEG is a real intra-only compressed format).
  *
  * [[decodeMeta]] returns None for unknown/corrupt payloads so callers
  * can fall back loudly or by policy — never an exception.
  */
object MediaCodecs {

  /** Parsed container metadata. Width/height are 0 where the format has
    * none (audio); durationMs is 0 for stills.
    */
  final case class MediaMeta(
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      durationMs: Long)

  // ------------------------------------------------------------------ PNG

  private val PngSignature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length))
    val typBytes = typ.getBytes(StandardCharsets.US_ASCII)
    out.write(typBytes)
    out.write(data)
    val crc = new CRC32
    crc.update(typBytes)
    crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  /** A spec-valid 8-bit GRAYSCALE PNG of the given dimensions (all-zero
    * pixels, deflate-compressed filtered scanlines). Decodable by any
    * conforming reader.
    */
  def encodePng(width: Int, height: Int): Array[Byte] =
    encodePng(width, height, (_, _) => 0)

  /** A spec-valid 8-bit grayscale PNG with REAL pixel content:
    * `pixel(x, y) & 0xff` per sample. The first scanline uses filter 0
    * (None) and every later scanline filter 2 (Up) — a round-trip through
    * [[decodePngGray]] therefore exercises an actual unfilter path, not
    * just a raw copy. Verified decodable (and pixel-identical) against
    * the JDK's ImageIO in tests.
    */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dimensions must be positive")
    val out = new ByteArrayOutputStream(256)
    out.write(PngSignature)
    // IHDR: w, h, bit depth 8, color type 0 (grayscale), deflate, no
    // filter method variance, no interlace
    val ihdr = new ByteArrayOutputStream(13)
    ihdr.write(be32(width)); ihdr.write(be32(height))
    ihdr.write(8); ihdr.write(0); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    pngChunk(out, "IHDR", ihdr.toByteArray)
    // each scanline = 1 filter byte + width filtered samples
    val raw = new Array[Byte]((width + 1) * height)
    val prev = new Array[Int](width)
    var y = 0
    var o = 0
    while (y < height) {
      raw(o) = if (y == 0) 0 else 2 // None / Up
      o += 1
      var x = 0
      while (x < width) {
        val v = pixel(x, y) & 0xff
        raw(o) = (if (y == 0) v else v - prev(x)).toByte // Up: delta mod 256
        prev(x) = v
        o += 1; x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new ByteArrayOutputStream(256)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    pngChunk(out, "IDAT", idat.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSignature(i))

  /** IHDR parse: dimensions + channel count from the color type. */
  private def parsePng(b: Array[Byte]): Option[MediaMeta] = {
    // signature(8) + IHDR length(4) + "IHDR"(4) + 13 payload
    if (b.length < 8 + 4 + 4 + 13) return None
    if (readBe32(b, 8) != 13) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val width = readBe32(b, 16)
    val height = readBe32(b, 20)
    if (width <= 0 || height <= 0) return None
    val colorType = b(25) & 0xff
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette (1 index channel)
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some(MediaMeta("png", width, height, channels, 0L))
  }

  /** Integer content statistics of a decoded payload: `n` samples (pixels
    * for images, PCM samples for audio) with exact integer `sum` and
    * `sumsq` — integer so cross-engine oracles are bit-exact (no float
    * aggregation).
    */
  final case class ContentStats(format: String, n: Long, sum: Long, sumsq: Long)

  /** REAL pixel decode of an 8-bit grayscale non-interlaced PNG: inflate
    * the IDAT stream (chunks concatenated per spec) and unfilter every
    * scanline — all five standard filter types (None/Sub/Up/Average/
    * Paeth) at bpp 1 — then aggregate the reconstructed samples. None
    * for anything that is not an 8-bit grayscale PNG or whose pixel data
    * is truncated/corrupt (same loud-fallback policy as [[decodeMeta]]).
    */
  def decodePngGray(b: Array[Byte]): Option[ContentStats] = {
    if (!isPng(b)) return None
    val meta = parsePng(b) match {
      case Some(m) if m.channels == 1 => m
      case _ => return None
    }
    if ((b(24) & 0xff) != 8 || (b(25) & 0xff) != 0 || (b(28) & 0xff) != 0)
      return None // bit depth / color type / interlace
    // concatenate IDAT chunk payloads (one zlib stream split across chunks)
    val idat = new ByteArrayOutputStream(256)
    var i = 8
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = readBe32(b, i)
      if (len < 0 || i + 12L + len > b.length) return None
      val typ = new String(b, i + 4, 4, StandardCharsets.US_ASCII)
      if (typ == "IDAT") idat.write(b, i + 8, len)
      if (typ == "IEND") sawEnd = true
      i += 12 + len
    }
    val w = meta.width
    val h = meta.height
    val rawLen = (w.toLong + 1) * h
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val got = inflater.inflate(raw, off, raw.length - off)
        // bail on truncated input AND on a preset-dictionary request
        // (FDICT zlib streams): inflate then returns 0 with
        // needsInput()==false forever — without the needsDictionary
        // check a crafted IDAT would wedge the task in this loop
        if (got == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None
        off += got
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off < raw.length) return None
    // unfilter (bpp = 1) + aggregate
    var sum = 0L
    var sumsq = 0L
    val prior = new Array[Int](w)
    var y = 0
    var o = 0
    while (y < h) {
      val filter = raw(o) & 0xff
      o += 1
      var left = 0
      var upLeftVal = 0 // the PREVIOUS row's x-1 sample — prior(x-1) is
      // already overwritten with this row's recon by the time we need it
      var x = 0
      while (x < w) {
        val f = raw(o) & 0xff
        val up = prior(x)
        val upLeft = if (x == 0) 0 else upLeftVal
        val recon = (filter match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) >> 1)
          case 4 =>
            // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            f + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }) & 0xff
        sum += recon
        sumsq += recon.toLong * recon
        upLeftVal = up
        prior(x) = recon
        left = recon
        o += 1; x += 1
      }
      y += 1
    }
    Some(ContentStats("png", w.toLong * h, sum, sumsq))
  }

  // ----------------------------------------------------------------- JPEG

  /** SOI + JFIF APP0 + SOF0 + EOI: the marker structure every JPEG
    * carries, with the given frame dimensions and 3 components (YCbCr).
    * Header-only — there is no entropy-coded scan, so this is a valid
    * MARKER STREAM for header parsing, not a displayable image (honest
    * label; pixel synthesis needs an entropy coder, out of scope).
    */
  def encodeJpegHeader(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535,
      "JPEG dimensions must be in [1, 65535]")
    val out = new ByteArrayOutputStream(64)
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 "JFIF\0" v1.02, no density, no thumbnail (segment length 16)
    out.write(0xff); out.write(0xe0)
    out.write(0); out.write(16)
    out.write("JFIF".getBytes(StandardCharsets.US_ASCII)); out.write(0)
    out.write(1); out.write(2) // version
    out.write(0) // density units
    out.write(0); out.write(1); out.write(0); out.write(1) // 1x1 density
    out.write(0); out.write(0) // no thumbnail
    // SOF0: baseline DCT, precision 8, 3 components, len = 8 + 3*3
    out.write(0xff); out.write(0xc0)
    out.write(0); out.write(17)
    out.write(8)
    out.write((height >>> 8) & 0xff); out.write(height & 0xff)
    out.write((width >>> 8) & 0xff); out.write(width & 0xff)
    out.write(3)
    var c = 1
    while (c <= 3) {
      out.write(c) // component id
      out.write(0x11) // 1x1 sampling
      out.write(if (c == 1) 0 else 1) // quant table id
      c += 1
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** Marker walk to the first SOFn (C0-C3, C5-C7, C9-CB, CD-CF): skips
    * APPn/COM/DQT/DHT segments by their lengths and tolerates FF fill
    * bytes, the way a conforming decoder does.
    */
  private def parseJpeg(b: Array[Byte]): Option[MediaMeta] = {
    var i = 2
    while (i + 3 < b.length) {
      // fill bytes before a marker are legal
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0x00) return None // FF 00 is only legal inside a scan
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS before SOF
      if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 &&
          marker != 0xc8 && marker != 0xcc) {
        // SOFn: len(2) precision(1) height(2) width(2) components(1)
        if (j + 8 >= b.length) return None
        val height = readBe16(b, j + 4)
        val width = readBe16(b, j + 6)
        val components = b(j + 8) & 0xff
        if (width <= 0 || height <= 0 || components <= 0) return None
        return Some(MediaMeta("jpeg", width, height, components, 0L))
      }
      // standalone markers without a length segment
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i = j + 1
      } else {
        if (j + 2 >= b.length) return None
        val len = readBe16(b, j + 1)
        if (len < 2) return None
        i = j + 1 + len
      }
    }
    None
  }

  // ------------------------------------------- JPEG baseline codec (T.81)

  /** Zigzag scan order: position i in the entropy stream -> natural
    * (row-major) coefficient index (ITU-T.81 Figure 5 / Figure A.6).
    */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Quantization table (natural order). DC step 8 makes a flat block's
    * DC coefficient (8 * (v - 128)) quantize EXACTLY for every 8-bit v —
    * the invariant the integer-exact content oracle rides on; AC step 16
    * is an ordinary mid-quality choice (flat blocks have zero AC anyway).
    */
  private val JpegQuant: Array[Int] =
    Array.tabulate(64)(i => if (i == 0) 8 else 16)

  /** Annex K.3: typical Huffman table for luminance DC (BITS, HUFFVAL). */
  private val JpegDcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.5: typical Huffman table for luminance AC (BITS, HUFFVAL). */
  private val JpegAcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val JpegAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Separable DCT basis: A(x)(u) = C(u)/2 * cos((2x+1) u pi / 16) with
    * C(0) = 1/sqrt(2). FDCT: S = A^T s A; IDCT: s = A S A^T (T.81 A.3.3).
    */
  private val JpegDctA: Array[Array[Double]] = Array.tabulate(8, 8) {
    (x, u) =>
      (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) / 2.0 *
        math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman ENCODER tables from (BITS, HUFFVAL) per T.81
    * C.2: arrays indexed by symbol -> (code, size).
    */
  private def buildHuffEncoder(
      bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k)) = code
        sizes(vals(k)) = l
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    (codes, sizes)
  }
  private lazy val (jpegDcCodes, jpegDcSizes) =
    buildHuffEncoder(JpegDcBits, JpegDcVals)
  private lazy val (jpegAcCodes, jpegAcSizes) =
    buildHuffEncoder(JpegAcBits, JpegAcVals)

  /** Magnitude category of a DCT value (T.81 F.1.2.1.1): number of bits
    * in |v|; 0 for v == 0.
    */
  private def jpegCategory(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Entropy-coded-segment bit sink with 0xFF byte stuffing (F.1.2.3). */
  private final class JpegBitWriter(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      if (len > 0) {
        acc = (acc << len) | (code.toLong & ((1L << len) - 1))
        n += len
        while (n >= 8) {
          val b = ((acc >>> (n - 8)) & 0xffL).toInt
          out.write(b)
          if (b == 0xff) out.write(0x00) // stuffed zero
          n -= 8
        }
      }
    }
    /** Pad the final partial byte with 1-bits (F.1.2.3). */
    def finish(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private def jpegSegment(
      out: ByteArrayOutputStream, marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    out.write(payload)
  }

  /** A COMPLETE spec-valid baseline JPEG (ITU-T.81): 8-bit grayscale,
    * single component, [[JpegQuant]] quantization, Annex-K Huffman
    * tables, one interleaved-trivial scan (MCU = one block, row-major),
    * edge blocks padded by sample replication. `pixel(x, y)` must return
    * values in [0, 255].
    *
    * Lossy in general (quantization); EXACT for images that are constant
    * on each 8x8 block (all AC coefficients vanish and the DC step
    * divides 8 * (v - 128)) — the property the multimodal content oracle
    * uses. Verified decodable (and pixel-faithful) against the JDK's
    * ImageIO in tests.
    */
  def encodeJpegGray(
      width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535,
      "JPEG dimensions must be in [1, 65535]")
    val out = new ByteArrayOutputStream(1024)
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 "JFIF\0" v1.02, 1x1 aspect, no thumbnail
    jpegSegment(out, 0xe0,
      "JFIF".getBytes(StandardCharsets.US_ASCII) ++
        Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    // DQT: Pq=0 (8-bit) Tq=0, 64 entries in ZIGZAG order
    jpegSegment(out, 0xdb,
      0.toByte +: Array.tabulate(64)(i => JpegQuant(JpegZigzag(i)).toByte))
    // SOF0: precision 8, 1 component (id 1, 1x1 sampling, quant table 0)
    jpegSegment(out, 0xc0, Array[Byte](8,
      ((height >>> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >>> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))
    // DHT: DC table 0 then AC table 0 (Annex K luminance)
    jpegSegment(out, 0xc4,
      0x00.toByte +: (JpegDcBits.map(_.toByte) ++ JpegDcVals.map(_.toByte)))
    jpegSegment(out, 0xc4,
      0x10.toByte +: (JpegAcBits.map(_.toByte) ++ JpegAcVals.map(_.toByte)))
    // SOS: 1 component, DC/AC table 0, full spectral range
    jpegSegment(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))

    val bw = new JpegBitWriter(out)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val s = new Array[Double](64) // level-shifted samples
    val t = new Array[Double](64) // row-pass intermediate
    val coef = new Array[Double](64)
    val zz = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        // gather with edge replication, level shift by 128
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, width - 1)
            s(y * 8 + x) = (pixel(sx, sy) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        // FDCT, separable: t = s * A (rows), coef = A^T * t (columns)
        var r = 0
        while (r < 8) {
          var u = 0
          while (u < 8) {
            var acc = 0.0
            var x = 0
            while (x < 8) { acc += s(r * 8 + x) * JpegDctA(x)(u); x += 1 }
            t(r * 8 + u) = acc
            u += 1
          }
          r += 1
        }
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var acc = 0.0
            var yy = 0
            while (yy < 8) { acc += JpegDctA(yy)(v) * t(yy * 8 + u); yy += 1 }
            coef(v * 8 + u) = acc
            u += 1
          }
          v += 1
        }
        // quantize in zigzag order
        var i = 0
        while (i < 64) {
          val nat = JpegZigzag(i)
          zz(i) = Math.round(coef(nat) / JpegQuant(nat)).toInt
          i += 1
        }
        // DC: category + offset bits of the diff (F.1.2.1)
        val diff = zz(0) - prevDc
        prevDc = zz(0)
        val dcCat = jpegCategory(diff)
        bw.put(jpegDcCodes(dcCat), jpegDcSizes(dcCat))
        if (dcCat > 0)
          bw.put(if (diff < 0) diff + (1 << dcCat) - 1 else diff, dcCat)
        // AC: run-length of zeros + category (F.1.2.2)
        var run = 0
        var k = 1
        while (k < 64) {
          val ac = zz(k)
          if (ac == 0) run += 1
          else {
            while (run > 15) {
              bw.put(jpegAcCodes(0xf0), jpegAcSizes(0xf0)) // ZRL
              run -= 16
            }
            val cat = jpegCategory(ac)
            val sym = (run << 4) | cat
            bw.put(jpegAcCodes(sym), jpegAcSizes(sym))
            bw.put(if (ac < 0) ac + (1 << cat) - 1 else ac, cat)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(jpegAcCodes(0x00), jpegAcSizes(0x00)) // EOB
        bx += 1
      }
      by += 1
    }
    bw.finish()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman DECODER tables (T.81 F.2.2.3): mincode/maxcode/
    * valptr per code length, plus the value list.
    */
  private final class JpegHuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    (1 to 16).foreach { l =>
      if (bits(l - 1) == 0) maxCode(l) = -1
      else {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
      }
      code <<= 1
    }
    def decode(br: JpegBitReader): Int = {
      var c = br.nextBit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || c > maxCode(l))) {
        c = (c << 1) | br.nextBit()
        l += 1
      }
      if (l > 16 || br.bad) { br.bad = true; 0 }
      else vals(valPtr(l) + c - minCode(l))
    }
  }

  /** Entropy-coded-segment bit source: un-stuffs FF 00; any other marker
    * mid-scan (we emit no restarts) sets `bad`.
    */
  private final class JpegBitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var bad = false
    def nextBit(): Int = {
      if (bad) return 0
      if (n == 0) {
        if (pos >= b.length) { bad = true; return 0 }
        var byt = b(pos) & 0xff
        pos += 1
        if (byt == 0xff) {
          if (pos >= b.length || (b(pos) & 0xff) != 0x00) { bad = true; return 0 }
          pos += 1 // stuffed zero after FF
        }
        acc = byt; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(t: Int): Int = {
      var v = 0
      var i = 0
      while (i < t) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
  }

  /** EXTEND (T.81 F.2.2.1): map a t-bit magnitude code to its signed
    * value. */
  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode a baseline single-component (grayscale) JPEG produced by any
    * conforming encoder within this scope: SOF0, 8-bit, Nf=1, 1x1
    * sampling, no restart intervals. Huffman-decodes the scan,
    * dequantizes, inverse-DCTs each block (flat DC-only blocks take the
    * exact closed form) and returns the integer pixel statistics over
    * the w x h crop. None — never an exception — for anything outside
    * that scope or corrupt (multi-component, progressive, truncated
    * scan, invalid code): the loud-fallback policy of [[decodeMeta]].
    */
  def decodeJpegGray(b: Array[Byte]): Option[ContentStats] = {
    if (!isJpeg(b)) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[JpegHuffDecoder](4)
    val acTabs = new Array[JpegHuffDecoder](4)
    var w = 0
    var h = 0
    var compQuant = -1
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      marker match {
        case 0x00 | 0xd9 => return None // stray stuffing / EOI before SOS
        case m if m >= 0xd0 && m <= 0xd7 => i = j + 1 // RSTn (stray)
        case 0x01 => i = j + 1 // TEM
        case 0xc0 => // SOF0 baseline
          if (j + 2 >= b.length) return None
          val len = readBe16(b, j + 1)
          if (len < 11 || j + 1 + len > b.length) return None
          if ((b(j + 3) & 0xff) != 8) return None // precision
          h = readBe16(b, j + 4)
          w = readBe16(b, j + 6)
          val nf = b(j + 8) & 0xff
          if (nf != 1) return None // grayscale scope
          if ((b(j + 10) & 0xff) != 0x11) return None // 1x1 sampling
          compQuant = b(j + 11) & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          i = j + 1 + len
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
            m != 0xcc =>
          return None // non-baseline frame: out of scope
        case 0xdb => // DQT (possibly several tables in one segment)
          if (j + 2 >= b.length) return None
          val len = readBe16(b, j + 1)
          if (len < 2 || j + 1 + len > b.length) return None
          var p = j + 3
          val end = j + 1 + len
          while (p < end) {
            val pqTq = b(p) & 0xff
            if ((pqTq >>> 4) != 0) return None // 16-bit tables out of scope
            val tq = pqTq & 0x0f
            if (tq > 3 || p + 65 > end) return None
            val tab = new Array[Int](64)
            var z = 0
            while (z < 64) {
              tab(JpegZigzag(z)) = b(p + 1 + z) & 0xff
              z += 1
            }
            quant(tq) = tab
            p += 65
          }
          i = j + 1 + len
        case 0xc4 => // DHT (possibly several tables in one segment)
          if (j + 2 >= b.length) return None
          val len = readBe16(b, j + 1)
          if (len < 2 || j + 1 + len > b.length) return None
          var p = j + 3
          val end = j + 1 + len
          while (p < end) {
            val tcTh = b(p) & 0xff
            val tc = tcTh >>> 4
            val th = tcTh & 0x0f
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val bits = Array.tabulate(16)(l => b(p + 1 + l) & 0xff)
            val nVals = bits.sum
            if (nVals > 256 || p + 17 + nVals > end) return None
            val vals = Array.tabulate(nVals)(k => b(p + 17 + k) & 0xff)
            val dec = new JpegHuffDecoder(bits, vals)
            if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
            p += 17 + nVals
          }
          i = j + 1 + len
        case 0xda => // SOS: decode the scan and finish
          if (j + 2 >= b.length) return None
          val len = readBe16(b, j + 1)
          if (len < 8 || j + 1 + len > b.length) return None
          if ((b(j + 3) & 0xff) != 1) return None // Ns = 1
          val tdTa = b(j + 5) & 0xff
          val dc = dcTabs(tdTa >>> 4)
          val ac = acTabs(tdTa & 0x0f)
          if (w <= 0 || h <= 0 || compQuant < 0 || compQuant > 3) return None
          val q = quant(compQuant)
          if (dc == null || ac == null || q == null) return None
          return decodeJpegScan(b, j + 1 + len, w, h, q, dc, ac)
        case _ => // APPn / COM / other length-coded segments: skip
          if (j + 2 >= b.length) return None
          val len = readBe16(b, j + 1)
          if (len < 2) return None
          i = j + 1 + len
      }
    }
    None
  }

  /** Entropy-decode all MCUs of the single-component scan starting at
    * `pos`, IDCT each block and accumulate pixel stats over the crop;
    * requires a clean EOI after the last MCU.
    */
  private def decodeJpegScan(
      b: Array[Byte], pos: Int, w: Int, h: Int, q: Array[Int],
      dc: JpegHuffDecoder, ac: JpegHuffDecoder): Option[ContentStats] = {
    val br = new JpegBitReader(b, pos)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    var sum = 0L
    var sumsq = 0L
    var prevDc = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        java.util.Arrays.fill(coef, 0.0)
        // DC
        val dcCat = dc.decode(br)
        if (br.bad || dcCat > 11) return None
        val diff = jpegExtend(br.receive(dcCat), dcCat)
        prevDc += diff
        coef(0) = prevDc.toDouble * q(0)
        // AC
        var nonZeroAc = false
        var k = 1
        while (k < 64) {
          val rs = ac.decode(br)
          if (br.bad) return None
          val r = rs >>> 4
          val size = rs & 0x0f
          if (size == 0) {
            if (r == 15) k += 16 // ZRL
            else k = 64 // EOB
          } else {
            k += r
            if (k > 63) return None
            val nat = JpegZigzag(k)
            coef(nat) = jpegExtend(br.receive(size), size).toDouble * q(nat)
            nonZeroAc = true
            k += 1
          }
        }
        if (br.bad) return None
        // pixel accumulation over the crop region of this block
        val x0 = bx * 8
        val y0 = by * 8
        val xMax = math.min(8, w - x0)
        val yMax = math.min(8, h - y0)
        if (!nonZeroAc) {
          // flat block: IDCT of a lone DC is the constant DC/8
          val v = math.max(0, math.min(255,
            Math.round(coef(0) / 8.0).toInt + 128))
          val cnt = xMax.toLong * yMax
          sum += cnt * v
          sumsq += cnt * v.toLong * v
        } else {
          // IDCT, separable: tmp = A * coef (columns), out = tmp * A^T
          var y = 0
          while (y < 8) {
            var u = 0
            while (u < 8) {
              var acc = 0.0
              var v = 0
              while (v < 8) { acc += JpegDctA(y)(v) * coef(v * 8 + u); v += 1 }
              tmp(y * 8 + u) = acc
              u += 1
            }
            y += 1
          }
          y = 0
          while (y < yMax) {
            var x = 0
            while (x < xMax) {
              var acc = 0.0
              var u = 0
              while (u < 8) { acc += tmp(y * 8 + u) * JpegDctA(x)(u); u += 1 }
              val p = math.max(0, math.min(255, Math.round(acc).toInt + 128))
              sum += p
              sumsq += p.toLong * p
              x += 1
            }
            y += 1
          }
        }
        bx += 1
      }
      by += 1
    }
    // after the last MCU: padded bits, then EOI (FF fill legal)
    var p = br.pos
    while (p < b.length && (b(p) & 0xff) == 0xff &&
        p + 1 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1
    if (p + 1 >= b.length || (b(p) & 0xff) != 0xff ||
        (b(p + 1) & 0xff) != 0xd9) return None
    Some(ContentStats("jpeg", w.toLong * h, sum, sumsq))
  }

  // ------------------------------------------------------------------ WAV

  /** A spec-valid 16-bit PCM RIFF/WAVE file of silence. Duration =
    * nSamples / sampleRate (per channel frame count).
    */
  def encodeWav(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] =
    encodeWav(channels, sampleRate, nSamples, _ => 0.toShort)

  /** A spec-valid 16-bit PCM RIFF/WAVE file with REAL sample content:
    * `sample(j)` for flat sample index j in [0, nSamples * channels)
    * (channel-interleaved), little-endian per spec. Verified decodable
    * (and sample-identical) against javax.sound in tests.
    */
  def encodeWav(
      channels: Int, sampleRate: Int, nSamples: Int, sample: Long => Short): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "channels must be in [1, 8]")
    require(sampleRate > 0 && nSamples >= 0, "sampleRate > 0, nSamples >= 0")
    val blockAlign = channels * 2
    val byteRate = sampleRate * blockAlign
    // size arithmetic in Long: nSamples * blockAlign can exceed Int for
    // any channel count, and a wrapped small-positive value would silently
    // encode a spec-valid WAV with the wrong duration
    val dataSizeL = nSamples.toLong * blockAlign
    require(dataSizeL <= Int.MaxValue - 44L,
      s"WAV data size $dataSizeL bytes exceeds the RIFF 32-bit limit " +
        s"($nSamples samples x $channels channels)")
    val dataSize = dataSizeL.toInt
    val out = new ByteArrayOutputStream(44 + dataSize)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    le32(36 + dataSize)
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII))
    le32(16); le16(1) // PCM
    le16(channels); le32(sampleRate); le32(byteRate); le16(blockAlign); le16(16)
    out.write("data".getBytes(StandardCharsets.US_ASCII))
    le32(dataSize)
    val data = new Array[Byte](dataSize)
    val total = nSamples.toLong * channels
    var j = 0L
    var o = 0
    while (j < total) {
      val s = sample(j)
      data(o) = (s & 0xff).toByte
      data(o + 1) = ((s >> 8) & 0xff).toByte
      j += 1; o += 2
    }
    out.write(data)
    out.toByteArray
  }

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** RIFF chunk walk: fmt -> channels/byte rate, data -> duration.
    * Cursor arithmetic in Long: a crafted chunk size near 2^31 must make
    * the walk stop (None), never wrap the cursor negative and crash.
    */
  private def parseWav(b: Array[Byte]): Option[MediaMeta] = {
    var channels = 0
    var byteRate = 0
    var dataSize = -1L
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val id = new String(b, at, 4, StandardCharsets.US_ASCII)
      val size = readLe32(b, at + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        channels = readLe16(b, at + 10)
        byteRate = readLe32(b, at + 16)
      } else if (id == "data") {
        dataSize = math.min(size, b.length.toLong - i - 8)
      }
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (channels <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some(MediaMeta("wav", 0, 0, channels, dataSize * 1000L / byteRate))
  }

  /** REAL PCM decode of a 16-bit RIFF/WAVE payload: walk the chunks to
    * the `data` chunk and read every little-endian int16 sample,
    * aggregating exact integer statistics. None for non-PCM / non-16-bit
    * / truncated payloads.
    */
  def decodeWavSamples(b: Array[Byte]): Option[ContentStats] = {
    if (!isWav(b)) return None
    var audioFormat = 0
    var bitsPerSample = 0
    var channels = 0
    var dataOff = -1L
    var dataSize = -1L
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val id = new String(b, at, 4, StandardCharsets.US_ASCII)
      val size = readLe32(b, at + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        audioFormat = readLe16(b, at + 8)
        channels = readLe16(b, at + 10)
        bitsPerSample = readLe16(b, at + 22)
      } else if (id == "data") {
        dataOff = i + 8
        dataSize = math.min(size, b.length.toLong - i - 8)
      }
      i += 8L + size + (size & 1L)
    }
    if (audioFormat != 1 || bitsPerSample != 16 || channels <= 0 ||
        dataOff < 0 || dataSize < 0) return None
    val n = dataSize / 2
    var sum = 0L
    var sumsq = 0L
    var j = 0L
    while (j < n) {
      val off = (dataOff + j * 2).toInt
      val s = (readLe16(b, off) << 16) >> 16 // sign-extend int16
      sum += s
      sumsq += s.toLong * s
      j += 1
    }
    Some(ContentStats("wav", n, sum, sumsq))
  }

  // ------------------------------------------------------------------ MP4

  /** ISO BMFF (MP4) header: `ftyp` + `moov(mvhd + trak(tkhd))` with the
    * given presentation size and duration (movie timescale 1000, so
    * mvhd duration IS milliseconds; tkhd width/height are 16.16 fixed
    * point). Header-only like [[encodeJpegHeader]] — no `mdat`, so this
    * is a valid BOX STRUCTURE for header parsing, not playable media
    * (honest label; sample tables + codec payloads are out of scope).
    */
  def encodeMp4Header(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535,
      "MP4 dimensions must be in [1, 65535]")
    require(durationMs >= 0 && durationMs <= Int.MaxValue, "duration out of range")
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val size = 8 + payload.map(_.length).sum
      val out = new ByteArrayOutputStream(size)
      out.write(be32(size))
      out.write(typ.getBytes(StandardCharsets.US_ASCII))
      payload.foreach(out.write)
      out.toByteArray
    }
    val unityMatrix: Array[Byte] = {
      val m = new ByteArrayOutputStream(36)
      // 0x00010000, 0, 0 / 0, 0x00010000, 0 / 0, 0, 0x40000000
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(v => m.write(be32(v)))
      m.toByteArray
    }
    val ftyp = box("ftyp",
      "isom".getBytes(StandardCharsets.US_ASCII), be32(0x200),
      "isom".getBytes(StandardCharsets.US_ASCII),
      "mp41".getBytes(StandardCharsets.US_ASCII))
    val mvhd = {
      val b = new ByteArrayOutputStream(100)
      b.write(be32(0)) // version 0 + flags
      b.write(be32(0)); b.write(be32(0)) // creation, modification
      b.write(be32(1000)) // timescale: 1 unit = 1 ms
      b.write(be32(durationMs.toInt))
      b.write(be32(0x00010000)) // rate 1.0
      b.write(0x01); b.write(0x00) // volume 1.0
      b.write(new Array[Byte](10)) // reserved
      b.write(unityMatrix)
      b.write(new Array[Byte](24)) // pre_defined
      b.write(be32(2)) // next_track_ID
      box("mvhd", b.toByteArray)
    }
    val tkhd = {
      val b = new ByteArrayOutputStream(84)
      b.write(be32(0x000007)) // version 0, flags: enabled|in_movie|in_preview
      b.write(be32(0)); b.write(be32(0)) // creation, modification
      b.write(be32(1)) // track_ID
      b.write(be32(0)) // reserved
      b.write(be32(durationMs.toInt))
      b.write(new Array[Byte](8)) // reserved
      b.write(0); b.write(0) // layer
      b.write(0); b.write(0) // alternate_group
      b.write(0); b.write(0) // volume (video track: 0)
      b.write(0); b.write(0) // reserved
      b.write(unityMatrix)
      b.write(be32(width << 16)) // 16.16 fixed point
      b.write(be32(height << 16))
      box("tkhd", b.toByteArray)
    }
    val moov = box("moov", mvhd, box("trak", tkhd))
    val out = new ByteArrayOutputStream(ftyp.length + moov.length)
    out.write(ftyp); out.write(moov)
    out.toByteArray
  }

  /** COMPLETE ISO BMFF (MP4) file with a REAL audio sample table:
    * `ftyp` + `mdat` (16-bit big-endian PCM at 8 kHz, preceded by the
    * Motion-JPEG video samples when `frames` is non-empty) + `moov(mvhd
    * + video trak + audio trak(tkhd + mdia(mdhd + hdlr('soun') +
    * minf(smhd + dinf(dref url) + stbl(stsd 'twos' + stts + stsc +
    * stsz + stco)))))` per ISO/IEC 14496-12 box layouts. The sound
    * track is fully decodable without any codec ('twos' = uncompressed
    * big-endian PCM): [[decodeMp4Pcm]] walks the REAL sample tables
    * (stsd format/width, stts sample count, stsc chunk mapping, stsz
    * sizes, stco offsets) to read the samples back.
    *
    * `frames`: pre-encoded baseline-JPEG frame payloads
    * ([[encodeJpegGray]]). When non-empty the video trak is a COMPLETE
    * Motion-JPEG track — mdia(mdhd + hdlr('vide') + minf(vmhd + dinf +
    * stbl(stsd VisualSampleEntry 'jpeg' + stts + stsc + per-sample
    * stsz + stco))) — whose samples [[decodeMp4Jpeg]] demuxes and
    * JPEG-decodes like a real player: every byte of the video path is
    * real container structure and a real ITU-T.81 codec (intra-only;
    * third-party inter-frame codecs like H.264 are the one omitted
    * capability). When empty, the video trak stays tkhd-only as before.
    */
  def encodeMp4(width: Int, height: Int, durationMs: Long,
      sample: Int => Short, variableStsz: Boolean = false,
      frames: Seq[Array[Byte]] = Nil,
      frameWidth: Int = 0, frameHeight: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535,
      "MP4 dimensions must be in [1, 65535]")
    // movie timescale 1000 (mvhd duration is ms); media timescale 8000
    // (8 samples per ms, like the WAV synth) -> n reproduces durationMs
    require(durationMs >= 0 && durationMs <= Int.MaxValue / 16L,
      s"MP4 duration_ms out of range: $durationMs")
    val n = (durationMs * 8L).toInt
    val header = encodeMp4Header(width, height, durationMs)
    // split the header into its ftyp and moov(mvhd + video trak) parts
    val ftypLen = readBe32(header, 0)
    val ftyp = java.util.Arrays.copyOfRange(header, 0, ftypLen)
    val videoMoovPayload =
      java.util.Arrays.copyOfRange(header, ftypLen + 8, header.length)

    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val size = 8 + payload.map(_.length).sum
      val out = new ByteArrayOutputStream(size)
      out.write(be32(size))
      out.write(typ.getBytes(StandardCharsets.US_ASCII))
      payload.foreach(out.write)
      out.toByteArray
    }
    def fullBox0(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(12 + payload.length)
      out.write(be32(12 + payload.length))
      out.write(typ.getBytes(StandardCharsets.US_ASCII))
      out.write(be32(0)) // version 0, flags 0
      out.write(payload)
      out.toByteArray
    }

    // mdat carries the video frames (if any) then the PCM; the payload
    // offset is fixed by ftyp's length
    val mdatPayloadOff = ftyp.length + 8
    val framesBytes = frames.map(_.length.toLong).sum
    // Long-space sizing of the COMBINED mdat (frames + PCM + box header):
    // a frames-only guard would let the box size wrap Int when the PCM
    // alone already sits near the limit
    require(framesBytes + 2L * n + 8L <= Int.MaxValue,
      s"MP4 mdat too large: $framesBytes frame bytes + ${2L * n} PCM bytes")
    val pcmOff = mdatPayloadOff + framesBytes.toInt
    val pcm = new Array[Byte](2 * n)
    var j = 0
    while (j < n) {
      val s = sample(j)
      pcm(2 * j) = (s >> 8).toByte // 'twos': big-endian int16
      pcm(2 * j + 1) = s.toByte
      j += 1
    }
    val mdat = box("mdat", (frames :+ pcm): _*)

    val audioTkhd = {
      val b = new ByteArrayOutputStream(84)
      b.write(be32(0x000007)) // version 0, enabled|in_movie|in_preview
      b.write(be32(0)); b.write(be32(0)) // creation, modification
      b.write(be32(2)) // track_ID (video header uses 1)
      b.write(be32(0)) // reserved
      b.write(be32(durationMs.toInt)) // movie-timescale duration
      b.write(new Array[Byte](8)) // reserved
      b.write(0); b.write(0) // layer
      b.write(0); b.write(0) // alternate_group
      b.write(0x01); b.write(0x00) // volume 1.0 (audio track)
      b.write(0); b.write(0) // reserved
      // identity matrix
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(v => b.write(be32(v)))
      b.write(be32(0)); b.write(be32(0)) // width/height 0 for audio
      box("tkhd", b.toByteArray)
    }
    val mdhd = {
      val b = new ByteArrayOutputStream(20)
      b.write(be32(0)); b.write(be32(0)) // creation, modification
      b.write(be32(8000)) // media timescale = sample rate
      b.write(be32(n)) // media duration in samples
      b.write(0x55); b.write(0xc4) // language 'und'
      b.write(0); b.write(0) // pre_defined
      fullBox0("mdhd", b.toByteArray)
    }
    val hdlr = {
      val name = "SoundHandler".getBytes(StandardCharsets.US_ASCII)
      val b = new ByteArrayOutputStream(21 + name.length)
      b.write(be32(0)) // pre_defined
      b.write("soun".getBytes(StandardCharsets.US_ASCII))
      b.write(new Array[Byte](12)) // reserved
      b.write(name)
      b.write(0) // null-terminated handler name
      fullBox0("hdlr", b.toByteArray)
    }
    val smhd = fullBox0("smhd", Array[Byte](0, 0, 0, 0)) // balance + reserved
    val dinf = {
      // one self-contained 'url ' entry (flags bit 0 set)
      val url = {
        val out = new ByteArrayOutputStream(12)
        out.write(be32(12))
        out.write("url ".getBytes(StandardCharsets.US_ASCII))
        out.write(be32(1))
        out.toByteArray
      }
      val dref = fullBox0("dref", be32(1) ++ url)
      box("dinf", dref)
    }
    val stsd = {
      // AudioSampleEntry 'twos' (uncompressed big-endian PCM)
      val entry = {
        val b = new ByteArrayOutputStream(36)
        b.write(be32(36))
        b.write("twos".getBytes(StandardCharsets.US_ASCII))
        b.write(new Array[Byte](6)) // reserved
        b.write(0); b.write(1) // data_reference_index = 1
        b.write(new Array[Byte](8)) // version/revision/vendor
        b.write(0); b.write(1) // channelcount = 1
        b.write(0); b.write(16) // samplesize = 16
        b.write(new Array[Byte](4)) // compression_id + packet_size
        b.write(be32(8000 << 16)) // samplerate 16.16
        b.toByteArray
      }
      fullBox0("stsd", be32(1) ++ entry)
    }
    val stts = fullBox0("stts", be32(1) ++ be32(n) ++ be32(1))
    val stsc = fullBox0("stsc", be32(1) ++ be32(1) ++ be32(n) ++ be32(1))
    // uniform 2-byte samples; variableStsz emits the equivalent
    // PER-SAMPLE table (sample_size=0 + n entries of 2) — same media,
    // exercising the table-verification path in [[decodeMp4Pcm]]
    val stsz =
      if (variableStsz)
        fullBox0("stsz",
          be32(0) ++ be32(n) ++ Array.fill(n)(be32(2)).flatten)
      else fullBox0("stsz", be32(2) ++ be32(n))
    val stco = fullBox0("stco", be32(1) ++ be32(pcmOff))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", smhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val audioTrak = box("trak", audioTkhd, mdia)

    val moov =
      if (frames.isEmpty) box("moov", videoMoovPayload, audioTrak)
      else {
        // split the header moov payload into mvhd and the tkhd-only
        // video trak, then rebuild the video trak with a full
        // Motion-JPEG mdia
        val mvhdLen = readBe32(videoMoovPayload, 0)
        val mvhd = java.util.Arrays.copyOfRange(videoMoovPayload, 0, mvhdLen)
        val videoTkhd = java.util.Arrays.copyOfRange(
          videoMoovPayload, mvhdLen + 8, videoMoovPayload.length)
        val nf = frames.size
        val vMdhd = {
          val b = new ByteArrayOutputStream(20)
          b.write(be32(0)); b.write(be32(0)) // creation, modification
          b.write(be32(1000)) // media timescale = ms
          b.write(be32(durationMs.toInt)) // media duration
          b.write(0x55); b.write(0xc4) // language 'und'
          b.write(0); b.write(0) // pre_defined
          fullBox0("mdhd", b.toByteArray)
        }
        val vHdlr = {
          val name = "VideoHandler".getBytes(StandardCharsets.US_ASCII)
          val b = new ByteArrayOutputStream(21 + name.length)
          b.write(be32(0)) // pre_defined
          b.write("vide".getBytes(StandardCharsets.US_ASCII))
          b.write(new Array[Byte](12)) // reserved
          b.write(name)
          b.write(0)
          fullBox0("hdlr", b.toByteArray)
        }
        val vmhd = {
          // version 0, flags 1 (per spec), graphicsmode + opcolor = 0
          val out = new ByteArrayOutputStream(20)
          out.write(be32(20))
          out.write("vmhd".getBytes(StandardCharsets.US_ASCII))
          out.write(be32(1))
          out.write(new Array[Byte](8))
          out.toByteArray
        }
        // stsd carries the CODED size (may differ from the tkhd
        // presentation size — players scale); default to the
        // presentation size when unspecified
        val cw = if (frameWidth > 0) frameWidth else width
        val ch = if (frameHeight > 0) frameHeight else height
        val vStsd = {
          // VisualSampleEntry 'jpeg' (86 bytes, ISO/IEC 14496-12 §12.1.3)
          val e = new ByteArrayOutputStream(86)
          e.write(be32(86))
          e.write("jpeg".getBytes(StandardCharsets.US_ASCII))
          e.write(new Array[Byte](6)) // reserved
          e.write(0); e.write(1) // data_reference_index = 1
          e.write(new Array[Byte](16)) // pre_defined/reserved
          e.write((cw >> 8) & 0xff); e.write(cw & 0xff)
          e.write((ch >> 8) & 0xff); e.write(ch & 0xff)
          e.write(be32(0x00480000)) // horizresolution 72 dpi
          e.write(be32(0x00480000)) // vertresolution 72 dpi
          e.write(be32(0)) // reserved
          e.write(0); e.write(1) // frame_count = 1
          e.write(new Array[Byte](32)) // compressorname (empty pascal)
          e.write(0); e.write(0x18) // depth = 24
          e.write(0xff); e.write(0xff) // pre_defined = -1
          fullBox0("stsd", be32(1) ++ e.toByteArray)
        }
        // stts in media-timescale ms: uniform delta with a remainder
        // entry when durationMs does not divide evenly
        val delta = (durationMs / nf).toInt
        val rem = (durationMs - delta.toLong * (nf - 1)).toInt
        val vStts =
          if (nf == 1 || rem == delta)
            fullBox0("stts", be32(1) ++ be32(nf) ++ be32(delta))
          else
            fullBox0("stts", be32(2) ++ be32(nf - 1) ++ be32(delta) ++
              be32(1) ++ be32(rem))
        val vStsc = fullBox0("stsc", be32(1) ++ be32(1) ++ be32(nf) ++ be32(1))
        val vStsz = fullBox0("stsz",
          be32(0) ++ be32(nf) ++ frames.toArray.flatMap(f => be32(f.length)))
        val vStco = fullBox0("stco", be32(1) ++ be32(mdatPayloadOff))
        val vStbl = box("stbl", vStsd, vStts, vStsc, vStsz, vStco)
        val vMinf = box("minf", vmhd, dinf, vStbl)
        val vMdia = box("mdia", vMdhd, vHdlr, vMinf)
        box("moov", mvhd, box("trak", videoTkhd, vMdia), audioTrak)
      }

    val out = new ByteArrayOutputStream(ftyp.length + mdat.length + moov.length)
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Walk boxes in [from, to) calling f(type, payloadFrom, payloadTo);
    * returns false on a malformed size. 64-bit largesize and
    * size==0 (to end of enclosing box) are handled.
    */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val size32 = readBe32(b, i).toLong & 0xffffffffL
      val typ = new String(b, i + 4, 4, StandardCharsets.US_ASCII)
      var payloadStart = i + 8
      val boxEnd: Long =
        if (size32 == 0) to.toLong
        else if (size32 == 1) {
          if (i + 16 > to) return false
          val large = (readBe32(b, i + 8).toLong << 32) |
            (readBe32(b, i + 12).toLong & 0xffffffffL)
          payloadStart = i + 16
          i + large
        } else i + size32
      if (boxEnd < payloadStart || boxEnd > to) return false
      if (!f(typ, payloadStart, boxEnd.toInt)) return false
      i = boxEnd.toInt
    }
    true
  }

  /** mvhd -> duration (duration/timescale), tkhd -> presentation size. */
  private def parseMp4(b: Array[Byte]): Option[MediaMeta] = {
    var durationMs = -1L
    var width = 0
    var height = 0
    val ok = walkBoxes(b, 0, b.length) { (typ, from, to) =>
      if (typ == "moov") {
        walkBoxes(b, from, to) { (t2, f2, t2end) =>
          if (t2 == "mvhd") {
            if (t2end - f2 < 20) return None
            val version = b(f2) & 0xff
            if (version == 0) {
              val timescale = readBe32(b, f2 + 12)
              val duration = readBe32(b, f2 + 16).toLong & 0xffffffffL
              if (timescale > 0) durationMs = duration * 1000L / timescale
            } else if (version == 1) {
              // v1 layout: 4 ver/flags + 8 + 8 times + 4 timescale +
              // 8 duration = 32 payload bytes minimum
              if (t2end - f2 < 32) return None
              val timescale = readBe32(b, f2 + 20)
              val duration = (readBe32(b, f2 + 24).toLong << 32) |
                (readBe32(b, f2 + 28).toLong & 0xffffffffL)
              if (timescale > 0) durationMs = duration * 1000L / timescale
            }
          } else if (t2 == "trak") {
            walkBoxes(b, f2, t2end) { (t3, f3, t3end) =>
              if (t3 == "tkhd" && width == 0) {
                val version = b(f3) & 0xff
                // width/height are the LAST 8 payload bytes (16.16 fixed)
                if (t3end - f3 >= (if (version == 0) 84 else 96)) {
                  val w = readBe32(b, t3end - 8) >>> 16
                  val h = readBe32(b, t3end - 4) >>> 16
                  if (w > 0 && h > 0) { width = w; height = h }
                }
              }
              true
            }
          }
          true
        }
      }
      true
    }
    if (!ok || durationMs < 0) None
    else Some(MediaMeta("mp4", width, height, 0, durationMs))
  }

  /** REAL MP4 audio decode through the full ISO BMFF sample tables: find
    * the first sound track (hdlr 'soun'), require an uncompressed PCM
    * sample entry ('twos' big-endian or 'sowt' little-endian, 16-bit),
    * then read every sample by walking stts (count), stsc (chunk
    * mapping), stsz (sizes) and stco (chunk offsets) — the same walk a
    * real demuxer does. None for files without a decodable sound track
    * (compressed audio, header-only structures) or with malformed/
    * truncated tables — the loud-fallback policy of [[decodeMeta]].
    */
  /** Raw sample-table fields of one trak (interpretation of the stsd
    * sample entry is the caller's).
    */
  private final case class SampleTables(
      totalSamples: Long, // from stts (-1 when absent/malformed)
      uniformSize: Int, // stsz sample_size (0 = per-sample table)
      stszCount: Long,
      stszEntriesOff: Int, // start of the per-sample size table
      stszEnd: Long,
      stscRuns: Array[(Long, Long)], // (first_chunk, samples_per_chunk)
      chunkOffsets: Array[Long])

  /** Walk moov/trak/mdia for the first trak whose hdlr matches `handler`
    * AND whose stsd entry `acceptStsd(entryOff, boxEnd)` accepts,
    * collecting its stbl's raw tables — the shared demux scaffolding of
    * [[decodeMp4Pcm]] and [[decodeMp4Frames]]. Per-trak state resets so
    * a rejected trak's tables can never leak into an accepted one.
    */
  private def parseSampleTables(b: Array[Byte], handler: String)(
      acceptStsd: (Int, Int) => Boolean): Option[SampleTables] = {
    var result: Option[SampleTables] = None
    walkBoxes(b, 0, b.length) { (typ, from, to) =>
      if (typ == "moov") {
        walkBoxes(b, from, to) { (t2, f2, t2end) =>
          if (t2 == "trak" && result.isEmpty) {
            // locate mdia -> (hdlr, minf -> stbl)
            walkBoxes(b, f2, t2end) { (t3, f3, t3end) =>
              if (t3 == "mdia") {
                var handlerMatches = false
                var accepted = false
                var totalSamples = -1L
                var uniformSize = -1
                var stszCount = -1L
                var stszEntriesOff = -1
                var stszEnd = -1L
                var stscRuns: Array[(Long, Long)] = null
                var chunkOffsets: Array[Long] = null
                walkBoxes(b, f3, t3end) { (t4, f4, t4end) =>
                  if (t4 == "hdlr" && t4end - f4 >= 12) {
                    val h = new String(b, f4 + 8, 4, StandardCharsets.US_ASCII)
                    handlerMatches = h == handler
                  } else if (t4 == "minf" && handlerMatches) {
                    walkBoxes(b, f4, t4end) { (t5, f5, t5end) =>
                      if (t5 == "stbl") {
                        walkBoxes(b, f5, t5end) { (t6, f6, t6end) =>
                          t6 match {
                            case "stsd" if t6end - f6 >= 8 =>
                              val nEntries = readBe32(b, f6 + 4)
                              if (nEntries >= 1)
                                accepted = acceptStsd(f6 + 8, t6end)
                            case "stts" if t6end - f6 >= 8 =>
                              val n = readBe32(b, f6 + 4)
                              if (t6end - f6 >= 8 + 8L * n) {
                                var tot = 0L
                                var k = 0
                                while (k < n) {
                                  tot += readBe32(b, f6 + 8 + 8 * k).toLong & 0xffffffffL
                                  k += 1
                                }
                                totalSamples = tot
                              }
                            case "stsc" if t6end - f6 >= 8 =>
                              val n = readBe32(b, f6 + 4)
                              if (n >= 0 && t6end - f6 >= 8 + 12L * n) {
                                stscRuns = Array.tabulate(n) { k =>
                                  (readBe32(b, f6 + 8 + 12 * k).toLong & 0xffffffffL,
                                    readBe32(b, f6 + 12 + 12 * k).toLong & 0xffffffffL)
                                }
                              }
                            case "stsz" if t6end - f6 >= 12 =>
                              uniformSize = readBe32(b, f6 + 4)
                              stszCount = readBe32(b, f6 + 8).toLong & 0xffffffffL
                              stszEntriesOff = f6 + 12
                              stszEnd = t6end
                            case "stco" if t6end - f6 >= 8 =>
                              val n = readBe32(b, f6 + 4)
                              if (n >= 0 && t6end - f6 >= 8 + 4L * n) {
                                chunkOffsets = Array.tabulate(n)(k =>
                                  readBe32(b, f6 + 8 + 4 * k).toLong & 0xffffffffL)
                              }
                            case _ =>
                          }
                          true
                        }
                        if (accepted)
                          result = Some(SampleTables(totalSamples,
                            uniformSize, stszCount, stszEntriesOff,
                            stszEnd, stscRuns, chunkOffsets))
                      }
                      true
                    }
                  }
                  true
                }
              }
              true
            }
          }
          true
        }
      }
      true
    }
    result
  }

  def decodeMp4Pcm(b: Array[Byte]): Option[ContentStats] = {
    if (!isMp4(b)) return None
    var bigEndian = true
    var channels = 0
    var sampleBits = 0
    val tables = parseSampleTables(b, "soun") { (e, end) =>
      if (end - e >= 36) {
        val fmt = new String(b, e + 4, 4, StandardCharsets.US_ASCII)
        if (fmt == "twos" || fmt == "sowt") {
          bigEndian = fmt == "twos"
          channels = readBe16(b, e + 16 + 8)
          sampleBits = readBe16(b, e + 16 + 10)
        }
      }
      channels > 0
    }.getOrElse(return None)
    import tables.{totalSamples, uniformSize, stszCount, stszEntriesOff,
      stszEnd, stscRuns, chunkOffsets}
    // decodable = 16-bit mono/stereo PCM with complete, consistent tables
    if (sampleBits != 16 || channels < 1 || channels > 2 ||
        totalSamples < 0 || stscRuns == null || stscRuns.isEmpty ||
        chunkOffsets == null || chunkOffsets.isEmpty ||
        uniformSize < 0) return None
    val bytesPerSample = 2L * channels
    if (uniformSize != 0 && uniformSize != bytesPerSample) return None
    if (stszCount != totalSamples) return None
    if (uniformSize == 0) {
      // per-sample size table present: the fixed-stride chunk walk below is
      // only valid when EVERY entry equals bytesPerSample — verify, else
      // fall back loudly (None) per the documented policy
      if (stszEntriesOff < 0 || stszEnd - stszEntriesOff < 4L * stszCount)
        return None
      var k = 0L
      while (k < stszCount) {
        val sz = readBe32(b, (stszEntriesOff + 4 * k).toInt).toLong & 0xffffffffL
        if (sz != bytesPerSample) return None
        k += 1
      }
    }
    var sum = 0L
    var sumsq = 0L
    var read = 0L
    var run = 0
    var chunk = 1L // 1-based chunk index
    while (read < totalSamples && chunk <= chunkOffsets.length) {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk) run += 1
      val inChunk = math.min(stscRuns(run)._2, totalSamples - read)
      val base = chunkOffsets(chunk.toInt - 1)
      if (base < 0 || base + inChunk * bytesPerSample > b.length) return None
      var k = 0L
      while (k < inChunk) {
        var c = 0
        while (c < channels) {
          val off = (base + k * bytesPerSample + 2 * c).toInt
          val s =
            if (bigEndian) (((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)).toShort.toInt
            else (((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)).toShort.toInt
          sum += s
          sumsq += s.toLong * s
          c += 1
        }
        k += 1
      }
      read += inChunk
      chunk += 1
    }
    if (read != totalSamples) return None
    Some(ContentStats("mp4", totalSamples * channels, sum, sumsq))
  }

  /** Demux and DECODE a Motion-JPEG video track: locate the 'vide'
    * handler trak, require an stsd 'jpeg' VisualSampleEntry, then walk
    * the REAL sample tables (stts count, stsc chunk mapping, stsz
    * per-sample sizes, stco offsets) exactly like [[decodeMp4Pcm]],
    * slicing each sample and running the full baseline-JPEG decoder
    * ([[decodeJpegGray]] — Huffman + dequant + IDCT) over it. Pixel
    * stats aggregate across all frames. None for files without a
    * jpeg-coded video track, malformed/truncated tables, or any frame
    * the JPEG decoder rejects — the loud-fallback policy throughout.
    */
  def decodeMp4Jpeg(b: Array[Byte]): Option[ContentStats] =
    decodeMp4Frames(b).map { fs =>
      var n = 0L; var sum = 0L; var sumsq = 0L
      fs.foreach { s => n += s.n; sum += s.sum; sumsq += s.sumsq }
      ContentStats("mjpeg", n, sum, sumsq)
    }

  /** Per-FRAME pixel statistics of the Motion-JPEG track, in sample
    * order — the exploded shape frame-level feature extraction wants.
    * Same demux + decode as [[decodeMp4Jpeg]]; None under the same
    * loud-fallback conditions.
    */
  def decodeMp4Frames(b: Array[Byte]): Option[Array[ContentStats]] = {
    if (!isMp4(b)) return None
    val tables = parseSampleTables(b, "vide") { (e, end) =>
      end - e >= 8 &&
        new String(b, e + 4, 4, StandardCharsets.US_ASCII) == "jpeg"
    }.getOrElse(return None)
    import tables.{totalSamples, uniformSize, stszCount, stszEntriesOff,
      stszEnd, stscRuns, chunkOffsets}
    if (totalSamples <= 0 || totalSamples > 100000 ||
      stscRuns == null || stscRuns.isEmpty ||
      chunkOffsets == null || chunkOffsets.isEmpty ||
      uniformSize < 0 || stszCount != totalSamples) return None
    // per-sample sizes (uniform allowed: every frame the same length)
    val sizes = new Array[Long](totalSamples.toInt)
    if (uniformSize == 0) {
      if (stszEntriesOff < 0 || stszEnd - stszEntriesOff < 4L * stszCount)
        return None
      var k = 0
      while (k < sizes.length) {
        sizes(k) = readBe32(b, stszEntriesOff + 4 * k).toLong & 0xffffffffL
        k += 1
      }
    } else java.util.Arrays.fill(sizes, uniformSize.toLong)

    val out = new Array[ContentStats](sizes.length)
    var read = 0
    var run = 0
    var chunk = 1L
    while (read < sizes.length && chunk <= chunkOffsets.length) {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk) run += 1
      val inChunk = math.min(stscRuns(run)._2, (sizes.length - read).toLong)
      var off = chunkOffsets(chunk.toInt - 1)
      var k = 0L
      while (k < inChunk) {
        val sz = sizes(read)
        if (off < 0 || sz <= 0 || off + sz > b.length) return None
        val frame = java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt)
        decodeJpegGray(frame) match {
          case Some(s) => out(read) = s
          case None => return None // a frame the codec rejects = loud
        }
        off += sz
        read += 1
        k += 1
      }
      chunk += 1
    }
    if (read != sizes.length) return None
    Some(out)
  }

  // ------------------------------------------------------------- dispatch

  /** Parse any supported container's header; None for unknown/corrupt
    * payloads (callers choose the fallback policy — returning None
    * instead of throwing keeps a 100 TB scan alive on a few bad blobs
    * while staying observable via the null count).
    */
  def decodeMeta(payload: Array[Byte]): Option[MediaMeta] =
    if (payload == null || payload.length < 12) None
    else if (isPng(payload)) parsePng(payload)
    else if (isJpeg(payload)) parseJpeg(payload)
    else if (isWav(payload)) parseWav(payload)
    else if (isMp4(payload)) parseMp4(payload)
    else None

  /** REAL content decode where the container carries samples we can read
    * without an external codec: grayscale PNG pixels ([[decodePngGray]]),
    * baseline grayscale JPEG pixels ([[decodeJpegGray]] — full Huffman +
    * IDCT), 16-bit PCM WAV samples ([[decodeWavSamples]]) and MP4 'twos'
    * PCM sound tracks ([[decodeMp4Pcm]]). None for header-only payloads
    * (legacy JPEG marker streams, MP4 ftyp+moov) and unknown blobs —
    * those remain metadata-only.
    */
  def decodeContent(payload: Array[Byte]): Option[ContentStats] =
    if (payload == null || payload.length < 12) None
    else if (isPng(payload)) decodePngGray(payload)
    else if (isJpeg(payload)) decodeJpegGray(payload)
    else if (isWav(payload)) decodeWavSamples(payload)
    else if (isMp4(payload)) {
      // every decodable sample in the container: Motion-JPEG video
      // frame pixels (when a jpeg-coded track exists) + PCM sound
      // samples. Either track alone still decodes; both absent = None.
      val audio = decodeMp4Pcm(payload)
      val video = decodeMp4Jpeg(payload)
      (audio, video) match {
        case (Some(a), Some(v)) =>
          Some(ContentStats("mp4", a.n + v.n, a.sum + v.sum, a.sumsq + v.sumsq))
        case (Some(a), None) => Some(a)
        // keep ONE format label per container kind — a video-only MP4
        // must group with the audio-only and combined cases
        case (None, Some(v)) => Some(v.copy(format = "mp4"))
        case (None, None) => None
      }
    }
    else None
}
