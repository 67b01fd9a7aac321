package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MediaCodecs.MediaMeta

/** The real media header codecs: synthesis must produce SPEC-VALID
  * containers (verified against independent JDK decoders — ImageIO for
  * PNG, javax.sound for WAV), parsing must recover the exact metadata,
  * and corrupt/unknown payloads must yield None, never throw.
  */
class MediaCodecsSpec extends AnyFunSuite {

  test("PNG: encoder output is a real decodable image (ImageIO agrees on dims)") {
    for ((w, h) <- Seq((1, 1), (17, 3), (640, 480), (608 + 31, 448 + 31))) {
      val bytes = MediaCodecs.encodePng(w, h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not decode our ${w}x$h PNG")
      assert(img.getWidth === w && img.getHeight === h, "independent decoder dims")
      assert(MediaCodecs.decodeMeta(bytes) ===
        Some(MediaMeta("png", w, h, 1, 0L)), "our parser dims")
    }
  }

  test("PNG parser reads channel counts from the color type") {
    // hand-build IHDRs for the other color types (parser-only check)
    def ihdrOnly(colorType: Int): Array[Byte] = {
      val png = MediaCodecs.encodePng(5, 7)
      png(25) = colorType.toByte // inside IHDR payload; CRC not re-checked by our parser
      png
    }
    assert(MediaCodecs.decodeMeta(ihdrOnly(2)).get.channels === 3)
    assert(MediaCodecs.decodeMeta(ihdrOnly(4)).get.channels === 2)
    assert(MediaCodecs.decodeMeta(ihdrOnly(6)).get.channels === 4)
    assert(MediaCodecs.decodeMeta(ihdrOnly(3)).get.channels === 1)
    assert(MediaCodecs.decodeMeta(ihdrOnly(5)) === None, "invalid color type rejected")
  }

  test("JPEG: marker walk recovers SOF dimensions, skipping APP/COM segments") {
    for ((w, h) <- Seq((1, 1), (320, 240), (65535, 65535))) {
      val bytes = MediaCodecs.encodeJpegHeader(w, h)
      assert(MediaCodecs.decodeMeta(bytes) === Some(MediaMeta("jpeg", w, h, 3, 0L)))
    }
    // insert an extra COM segment and FF fill bytes between SOI and APP0:
    // a conforming parser must walk past both
    val base = MediaCodecs.encodeJpegHeader(99, 55)
    val comment = "graft test comment".getBytes("US-ASCII")
    val injected = base.take(2) ++
      Array[Byte](0xff.toByte, 0xff.toByte) ++ // fill bytes
      Array[Byte](0xff.toByte, 0xfe.toByte,
        ((comment.length + 2) >> 8).toByte, ((comment.length + 2) & 0xff).toByte) ++
      comment ++ base.drop(2)
    assert(MediaCodecs.decodeMeta(injected) === Some(MediaMeta("jpeg", 99, 55, 3, 0L)))
  }

  test("JPEG baseline codec: ImageIO-decodable, block-constant EXACT, lossy bounded, corrupt -> None") {
    import javax.imageio.ImageIO
    // block-constant image (the synth formula): EXACT round trip
    val id = 123L
    val (w, h) = (141, 99) // deliberately not multiples of 8
    val flatPix = (x: Int, y: Int) => ((id + (y >> 3)) % 256).toInt
    val jpg = MediaCodecs.encodeJpegGray(w, h, flatPix)
    // meta parse: full JPEG still walks to SOF0 (1 component now)
    assert(MediaCodecs.decodeMeta(jpg) === Some(MediaMeta("jpeg", w, h, 1, 0L)))
    val st = MediaCodecs.decodeJpegGray(jpg).get
    val expSum = w.toLong * (0 until h).map(y => (id + y / 8) % 256).sum
    val expSq = w.toLong * (0 until h).map { y =>
      val v = (id + y / 8) % 256; v * v
    }.sum
    assert(st === MediaCodecs.ContentStats("jpeg", w.toLong * h, expSum, expSq))
    assert(MediaCodecs.decodeContent(jpg) === Some(st), "dispatch covers JPEG")
    // independent decoder: the JDK's ImageIO reads the same pixels
    val img = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === flatPix(x, y), s"($x,$y)")

    // general (non-flat) image: lossy but REAL — our decoder agrees with
    // ImageIO within the per-sample IDCT tolerance (T.81 allows +-1),
    // and both sit near the source within the quantization error
    val genPix = (x: Int, y: Int) => ((x * 31 + y * 17 + (x * y) % 7) % 256)
    val jpg2 = MediaCodecs.encodeJpegGray(60, 45, genPix)
    val img2 = ImageIO.read(new java.io.ByteArrayInputStream(jpg2))
    assert(img2 != null && img2.getWidth === 60 && img2.getHeight === 45)
    // recover our decoder's pixel values via per-pixel stats: decode a
    // 1-pixel crop is not exposed, so compare aggregate moments instead
    val st2 = MediaCodecs.decodeJpegGray(jpg2).get
    var ioSum = 0L
    var ioSq = 0L
    var srcSum = 0L
    for (y <- 0 until 45; x <- 0 until 60) {
      val v = img2.getRaster.getSample(x, y, 0)
      ioSum += v; ioSq += v.toLong * v; srcSum += genPix(x, y)
    }
    val n2 = 60 * 45
    assert(math.abs(st2.sum - ioSum) <= n2,
      s"ours=${st2.sum} imageio=$ioSum (>1/pixel apart)")
    assert(math.abs(st2.sum - srcSum).toDouble / n2 <= 8.0,
      s"mean drift vs source too large: ours=${st2.sum} src=$srcSum")

    // corruption is loud (None), never wrong stats or an exception
    assert(MediaCodecs.decodeJpegGray(jpg.dropRight(30)) === None, "truncated scan")
    val noDht = {
      // remove the first DHT segment (FF C4): splice it out
      val i = jpg.indexOfSlice(Array(0xff.toByte, 0xc4.toByte))
      val len = ((jpg(i + 2) & 0xff) << 8) | (jpg(i + 3) & 0xff)
      jpg.take(i) ++ jpg.drop(i + 2 + len)
    }
    assert(MediaCodecs.decodeJpegGray(noDht) === None, "missing DHT")
    val progressive = jpg.clone()
    val sofAt = progressive.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    progressive(sofAt + 1) = 0xc2.toByte // SOF2: out of baseline scope
    assert(MediaCodecs.decodeJpegGray(progressive) === None, "non-baseline SOF")
  }

  test("JPEG property: random dims round-trip exactly on block-constant images") {
    val rnd = new scala.util.Random(77)
    (1 to 25).foreach { case _ =>
      // include sub-block dims (1..7) and non-multiples of 8
      val w = 1 + rnd.nextInt(200)
      val h = 1 + rnd.nextInt(150)
      val id = rnd.nextInt(100000).toLong
      val pix = (x: Int, y: Int) => ((id + (y >> 3)) % 256).toInt
      val jpg = MediaCodecs.encodeJpegGray(w, h, pix)
      val st = MediaCodecs.decodeJpegGray(jpg)
        .getOrElse(fail(s"decode failed at ${w}x$h id=$id"))
      val expSum = w.toLong * (0 until h).map(y => (id + y / 8) % 256).sum
      val expSq = w.toLong * (0 until h).map { y =>
        val v = (id + y / 8) % 256; v * v
      }.sum
      assert(st === MediaCodecs.ContentStats("jpeg", w.toLong * h, expSum, expSq),
        s"${w}x$h id=$id")
      // and the independent decoder agrees on the pixels
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img.getWidth === w && img.getHeight === h)
      var ioSum = 0L
      for (y <- 0 until h; x <- 0 until w)
        ioSum += img.getRaster.getSample(x, y, 0)
      assert(ioSum === expSum, s"imageio ${w}x$h id=$id")
    }
  }

  test("WAV: encoder output is spec-valid (javax.sound agrees), duration exact") {
    for ((ch, rate, samples) <- Seq((1, 8000, 8000), (2, 44100, 44100), (1, 8000, 12345))) {
      val bytes = MediaCodecs.encodeWav(ch, rate, samples)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getChannels === ch && fmt.getSampleRate === rate.toFloat,
        "independent decoder format")
      assert(ais.getFrameLength === samples.toLong, "independent frame count")
      val expectMs = samples.toLong * 1000L / rate
      assert(MediaCodecs.decodeMeta(bytes) ===
        Some(MediaMeta("wav", 0, 0, ch, expectMs)))
    }
  }

  test("MP4: box walk recovers mvhd duration and tkhd dimensions") {
    for ((w, h, ms) <- Seq((1, 1, 0L), (1920, 1080, 90000L), (640, 360, 59999L))) {
      val bytes = MediaCodecs.encodeMp4Header(w, h, ms)
      assert(MediaCodecs.decodeMeta(bytes) === Some(MediaMeta("mp4", w, h, 0, ms)))
    }
    // an extra top-level `free` box before moov must be skipped
    val base = MediaCodecs.encodeMp4Header(320, 240, 12345L)
    val ftypLen = ((base(0) & 0xff) << 24) | ((base(1) & 0xff) << 16) |
      ((base(2) & 0xff) << 8) | (base(3) & 0xff)
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    val injected = base.take(ftypLen) ++ free ++ base.drop(ftypLen)
    assert(MediaCodecs.decodeMeta(injected) === Some(MediaMeta("mp4", 320, 240, 0, 12345L)))
    // a version-1 mvhd (64-bit times) parses too: patch version byte and
    // rebuild payload is overkill — instead assert a truncated moov fails
    assert(MediaCodecs.decodeMeta(base.take(base.length - 6)) === None)
  }

  test("corrupt/truncated/unknown payloads yield None, never throw") {
    val png = MediaCodecs.encodePng(10, 10)
    val jpg = MediaCodecs.encodeJpegHeader(10, 10)
    val wav = MediaCodecs.encodeWav(1, 8000, 100)
    val mp4 = MediaCodecs.encodeMp4Header(10, 10, 1000L)
    val cases = Seq(
      null,
      Array.emptyByteArray,
      "plain text payload".getBytes("UTF-8"),
      png.take(7), png.take(20), jpg.take(3), jpg.take(6), wav.take(11), wav.take(30),
      mp4.take(13), mp4.take(30),
      jpg.updated(3, 0x00.toByte), // broken APP0 marker
      png.updated(12, 'X'.toByte)) // broken IHDR tag
    cases.foreach(c => assert(MediaCodecs.decodeMeta(c) === None))
    // a JPEG whose scan starts before any SOF: None (not a crash)
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte, 0, 4, 0, 0)
    assert(MediaCodecs.decodeMeta(noSof) === None)
    // crafted WAV chunk size near 2^31: the chunk walk must stop cleanly,
    // never wrap its cursor negative (was a StringIndexOutOfBounds crash)
    val overflowWav = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("RIFF".getBytes("US-ASCII")); b.write(Array[Byte](36, 0, 0, 0))
      b.write("WAVE".getBytes("US-ASCII"))
      b.write("junk".getBytes("US-ASCII"))
      val sz = 2147483628 // <= Int.MaxValue - 16, wraps 8 + size.toInt
      b.write(Array[Byte]((sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
        ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte))
      b.write(new Array[Byte](16))
      b.toByteArray
    }
    assert(MediaCodecs.decodeMeta(overflowWav) === None)
  }

  test("PNG content: FDICT zlib stream bails out None instead of spinning forever") {
    // regression: Inflater.inflate returns 0 with needsInput()==false and
    // finished()==false when the stream requests a preset dictionary —
    // without the needsDictionary() bail-out the decode loop never exits.
    val png = MediaCodecs.encodePng(10, 10)
    // find the IDAT chunk and rewrite the zlib FLG byte: CMF=0x78 stays,
    // FLG=0x20 sets FDICT with a valid header check ((0x7820 % 31) == 0)
    val idat = {
      var i = 8
      var pos = -1
      while (pos < 0 && i + 8 <= png.length) {
        val len = ((png(i) & 0xff) << 24) | ((png(i + 1) & 0xff) << 16) |
          ((png(i + 2) & 0xff) << 8) | (png(i + 3) & 0xff)
        if (new String(png, i + 4, 4, "US-ASCII") == "IDAT") pos = i
        else i += 12 + len
      }
      pos
    }
    assert(idat > 0, "IDAT chunk not found")
    assert(png(idat + 8) === 0x78.toByte) // zlib CMF as expected
    val dict = png.clone()
    dict(idat + 9) = 0x20.toByte
    val done = new java.util.concurrent.CompletableFuture[Option[_]]()
    val t = new Thread(() => done.complete(MediaCodecs.decodeContent(dict)))
    t.setDaemon(true)
    t.start()
    val res = done.get(30, java.util.concurrent.TimeUnit.SECONDS) // was: infinite loop
    assert(res === None)
  }

  test("MP4 with sample tables: meta parse unchanged, PCM decode walks stts/stsc/stsz/stco") {
    val mp4 = MediaCodecs.encodeMp4(320, 240, 1500L, j => ((j % 16) + 7).toShort)
    // header metadata still parses (video tkhd first, audio tkhd w/h=0)
    val meta = MediaCodecs.decodeMeta(mp4).get
    assert(meta.format == "mp4" && meta.width == 320 && meta.height == 240 &&
      meta.durationMs == 1500L)
    // content decode reads the REAL samples back through the tables
    val n = 1500L * 8
    val st = MediaCodecs.decodeMp4Pcm(mp4).get
    assert(st.format == "mp4" && st.n == n)
    val expSum = (0L until n).map(j => (j % 16) + 7).sum
    val expSq = (0L until n).map(j => { val s = (j % 16) + 7; s * s }).sum
    assert(st.sum == expSum && st.sumsq == expSq)
    // dispatch goes through decodeContent too
    assert(MediaCodecs.decodeContent(mp4) === Some(st))
  }

  test("MP4 Motion-JPEG track: demux + full JPEG decode is exact; ImageIO agrees on a demuxed frame") {
    val (w, h, id) = (88, 56, 47L)
    val frames = (0 until 4).map { f =>
      MediaCodecs.encodeJpegGray(w, h, (_, y) => ((id + f + (y >> 3)) & 0xffL).toInt)
    }
    val mp4 = MediaCodecs.encodeMp4(w, h, 1234L,
      j => ((id & 63L) + (j % 16L)).toShort, frames = frames)
    // header metadata unchanged by the full video trak
    val meta = MediaCodecs.decodeMeta(mp4).get
    assert(meta.width == w && meta.height == h && meta.durationMs == 1234L)
    // closed-form expected frame stats (block-constant frames round-trip
    // bit-exactly through the lossy codec)
    var en = 0L; var es = 0L; var esq = 0L
    for (f <- 0 until 4; y <- 0 until h) {
      val v = (id + f + (y >> 3)) & 0xffL
      en += w; es += w * v; esq += w * v * v
    }
    val vid = MediaCodecs.decodeMp4Jpeg(mp4).get
    assert(vid.format == "mjpeg" && vid.n == en && vid.sum == es && vid.sumsq == esq)
    // decodeContent = video pixels + PCM samples
    val aud = MediaCodecs.decodeMp4Pcm(mp4).get
    val comb = MediaCodecs.decodeContent(mp4).get
    assert(comb.n == vid.n + aud.n && comb.sum == vid.sum + aud.sum &&
      comb.sumsq == vid.sumsq + aud.sumsq)
    // the demuxed sample bytes are a real JPEG: ImageIO decodes frame 2
    // and agrees pixel-by-pixel with the synthesis formula
    val off = frames.take(2).map(_.length).sum
    val ftypLen = ((mp4(0) & 0xff) << 24) | ((mp4(1) & 0xff) << 16) |
      ((mp4(2) & 0xff) << 8) | (mp4(3) & 0xff)
    val frame2 = java.util.Arrays.copyOfRange(
      mp4, ftypLen + 8 + off, ftypLen + 8 + off + frames(2).length)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame2))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = ((id + 2 + (y >> 3)) & 0xffL).toInt
      assert((img.getRaster.getSample(x, y, 0) & 0xff) == expect,
        s"pixel ($x,$y)")
    }
    // frameless MP4s keep returning None from the video decoder
    val plain = MediaCodecs.encodeMp4(w, h, 100L, _ => 0.toShort)
    assert(MediaCodecs.decodeMp4Jpeg(plain).isEmpty)
    // a truncated frame (stsz size past mdat) bails loudly: patch the
    // VIDEO stsz's first entry (the first "stsz" after the mdat — the
    // video trak precedes the audio trak in moov)
    val bad = mp4.clone()
    val mdatSize = ((bad(ftypLen) & 0xff) << 24) | ((bad(ftypLen + 1) & 0xff) << 16) |
      ((bad(ftypLen + 2) & 0xff) << 8) | (bad(ftypLen + 3) & 0xff)
    val moovStart = ftypLen + mdatSize
    val pat = "stsz".getBytes("US-ASCII")
    val p = (moovStart to bad.length - 4)
      .find(i => pat.indices.forall(k => bad(i + k) == pat(k))).get
    // box layout from the type field: +4 verflags, +8 sample_size(=0),
    // +12 count, +16 first per-sample entry
    bad(p + 16) = 0x7f // absurd first-frame size
    assert(MediaCodecs.decodeMp4Jpeg(bad).isEmpty)
  }

  test("decodeMp4Frames: per-frame stats in sample order; aggregate equals decodeMp4Jpeg") {
    val (w, h, id) = (40, 24, 9L)
    val frames = (0 until 3).map { f =>
      MediaCodecs.encodeJpegGray(w, h, (_, y) => ((id + f + (y >> 3)) & 0xffL).toInt)
    }
    val mp4 = MediaCodecs.encodeMp4(w, h, 900L, _ => 0.toShort, frames = frames)
    val fs = MediaCodecs.decodeMp4Frames(mp4).get
    assert(fs.length === 3)
    fs.zipWithIndex.foreach { case (s, f) =>
      var es = 0L; var esq = 0L
      for (y <- 0 until h) {
        val v = (id + f + (y >> 3)) & 0xffL
        es += w * v; esq += w * v * v
      }
      assert(s.n == w.toLong * h && s.sum == es && s.sumsq == esq, s"frame $f")
    }
    val agg = MediaCodecs.decodeMp4Jpeg(mp4).get
    assert(agg.n === fs.map(_.n).sum && agg.sum === fs.map(_.sum).sum)
    // non-video payloads: null through the expression kernel
    assert(graft.expr.MediaKernels.decodeFrameStats(
      MediaCodecs.encodeWav(1, 8000, 16)) == null)
  }

  test("MP4 PCM decode: sowt little-endian variant and malformed-table bail-outs") {
    val mp4 = MediaCodecs.encodeMp4(64, 48, 100L, j => (j * 37 % 1000 - 500).toShort)
    val st = MediaCodecs.decodeMp4Pcm(mp4).get

    // patch 'twos' -> 'sowt' and byte-swap the mdat samples: stats equal
    def findAscii(b: Array[Byte], s: String, from: Int = 0): Int = {
      val pat = s.getBytes("US-ASCII")
      (from to b.length - pat.length).find(i => pat.indices.forall(k => b(i + k) == pat(k))).getOrElse(-1)
    }
    val sowt = mp4.clone()
    val fmtAt = findAscii(sowt, "twos")
    assert(fmtAt > 0)
    "sowt".getBytes("US-ASCII").zipWithIndex.foreach { case (c, k) => sowt(fmtAt + k) = c }
    val ftypLen = ((sowt(0) & 0xff) << 24) | ((sowt(1) & 0xff) << 16) |
      ((sowt(2) & 0xff) << 8) | (sowt(3) & 0xff)
    val mdatPayload = ftypLen + 8
    val nBytes = 100 * 8 * 2
    (0 until nBytes by 2).foreach { k =>
      val t = sowt(mdatPayload + k)
      sowt(mdatPayload + k) = sowt(mdatPayload + k + 1)
      sowt(mdatPayload + k + 1) = t
    }
    assert(MediaCodecs.decodeMp4Pcm(sowt) === Some(st))

    // non-PCM sample entry -> None (no codec, honestly not decodable)
    val mp4a = mp4.clone()
    "mp4a".getBytes("US-ASCII").zipWithIndex.foreach { case (c, k) => mp4a(fmtAt + k) = c }
    assert(MediaCodecs.decodeMp4Pcm(mp4a) === None)

    // chunk offset past EOF -> None (truncated), never an exception
    val bad = mp4.clone()
    val stcoAt = findAscii(bad, "stco")
    assert(stcoAt > 0)
    // stco payload: ver/flags(4) + count(4) + offset(4)
    val offAt = stcoAt + 4 + 8
    bad(offAt) = 0x7f.toByte
    assert(MediaCodecs.decodeMp4Pcm(bad) === None)

    // header-only MP4 (no sample tables) stays metadata-only
    val headerOnly = MediaCodecs.encodeMp4Header(64, 48, 100L)
    assert(MediaCodecs.decodeMp4Pcm(headerOnly) === None)
    assert(MediaCodecs.decodeMeta(headerOnly).isDefined)

    // PER-SAMPLE stsz table (sample_size == 0): entries all equal to the
    // PCM stride decode identically to the uniform encoding
    val varTable = MediaCodecs.encodeMp4(64, 48, 100L,
      j => (j * 37 % 1000 - 500).toShort, variableStsz = true)
    assert(MediaCodecs.decodeMp4Pcm(varTable) === Some(st))
    // a variable-size entry breaks the fixed-stride walk -> None, never
    // silently wrong stats (entry k: payload = ver/flags(4) + size(4) +
    // count(4) + 4 bytes each)
    val varBad = varTable.clone()
    val stszAt = findAscii(varBad, "stsz")
    assert(stszAt > 0)
    varBad(stszAt + 4 + 12 + 4 * 10 + 3) = 4.toByte // 10th entry: 2 -> 4
    assert(MediaCodecs.decodeMp4Pcm(varBad) === None)
    // sample_size patched to 0 WITHOUT an entry table -> None (the old
    // code assumed the uniform stride and decoded anyway)
    val noTable = mp4.clone()
    val uStszAt = findAscii(noTable, "stsz")
    assert(uStszAt > 0)
    noTable(uStszAt + 4 + 4 + 3) = 0.toByte // uniform size 2 -> 0
    assert(MediaCodecs.decodeMp4Pcm(noTable) === None)
  }

  test("media_encode rejects audio durations whose sample count would wrap") {
    import org.apache.spark.unsafe.types.UTF8String
    val err = intercept[IllegalArgumentException] {
      graft.expr.MediaKernels.encode(
        UTF8String.fromString("audio"), 1L, 0, 0, (Int.MaxValue / 8L) + 1L)
    }
    assert(err.getMessage.contains("duration_ms"))
    // the boundary value still encodes and round-trips
    val ok = graft.expr.MediaKernels.encode(
      UTF8String.fromString("audio"), 1L, 0, 0, 1000L)
    assert(MediaCodecs.decodeMeta(ok).get.durationMs === 1000L)
  }

  test("PNG content: decoded pixel stats are exact and ImageIO agrees pixel-by-pixel") {
    for ((w, h, seed) <- Seq((1, 1, 0L), (17, 3, 5L), (200, 150, 1234L), (640, 480, 99L))) {
      val pixel = (x: Int, y: Int) => ((seed + x * 3 + y * 7) & 0xff).toInt
      val bytes = MediaCodecs.encodePng(w, h, pixel)
      // brute-force expectation straight from the formula
      var n = 0L; var sum = 0L; var sumsq = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = pixel(x, y); n += 1; sum += v; sumsq += v.toLong * v
      }
      assert(MediaCodecs.decodePngGray(bytes) ===
        Some(MediaCodecs.ContentStats("png", n, sum, sumsq)), s"$w x $h seed=$seed")
      // independent decoder: every reconstructed sample matches — this
      // pins BOTH our Up-filter encoding and our unfilter against ImageIO
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) === pixel(x, y), s"pixel ($x,$y)")
    }
  }

  test("PNG content: all five standard filter types unfilter correctly") {
    // hand-build the raw stream with one scanline per filter type and
    // deflate it into a valid PNG, so Sub/Average/Paeth paths (which our
    // encoder never emits) are exercised against ImageIO's reference
    val w = 13
    val h = 5
    val pix = Array.tabulate(h, w)((y, x) => (x * 11 + y * 29 + 3) & 0xff)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val filter = y % 5
      raw.write(filter)
      for (x <- 0 until w) {
        val v = pix(y)(x)
        val left = if (x == 0) 0 else pix(y)(x - 1)
        val up = if (y == 0) 0 else pix(y - 1)(x)
        val upLeft = if (x == 0 || y == 0) 0 else pix(y - 1)(x - 1)
        val predicted = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
        }
        raw.write((v - predicted) & 0xff)
      }
    }
    // reuse the encoder's container by splicing our IDAT: rebuild chunks
    val out = new java.io.ByteArrayOutputStream()
    val ref = MediaCodecs.encodePng(w, h) // signature + IHDR template
    out.write(ref, 0, 8 + 25) // signature + full IHDR chunk (4+4+13+4)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      val c = crc.getValue.toInt
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    writeChunk("IDAT", idat.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    val bytes = out.toByteArray
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the multi-filter PNG")
    var sum = 0L; var sumsq = 0L
    for (y <- 0 until h; x <- 0 until w) {
      assert(img.getRaster.getSample(x, y, 0) === pix(y)(x), s"ImageIO pixel ($x,$y)")
      sum += pix(y)(x); sumsq += pix(y)(x).toLong * pix(y)(x)
    }
    assert(MediaCodecs.decodePngGray(bytes) ===
      Some(MediaCodecs.ContentStats("png", w.toLong * h, sum, sumsq)))
  }

  test("WAV content: decoded sample stats are exact and javax.sound agrees") {
    for ((ch, rate, samples, seed) <- Seq((1, 8000, 8000, 7L), (2, 44100, 1000, 42L))) {
      val sample = (j: Long) => (((seed + j) % 201) - 100).toShort
      val bytes = MediaCodecs.encodeWav(ch, rate, samples, sample)
      val total = samples.toLong * ch
      var sum = 0L; var sumsq = 0L
      (0L until total).foreach { j =>
        val s = sample(j); sum += s; sumsq += s.toLong * s
      }
      assert(MediaCodecs.decodeWavSamples(bytes) ===
        Some(MediaCodecs.ContentStats("wav", total, sum, sumsq)))
      // independent decoder reads the identical PCM bytes
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = ais.readAllBytes()
      assert(pcm.length === total * 2)
      (0L until total).foreach { j =>
        val off = (j * 2).toInt
        val v = ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort
        assert(v === sample(j), s"sample $j")
      }
    }
  }

  test("content decode: None for header-only containers, corrupt pixels, wrong formats") {
    assert(MediaCodecs.decodeContent(MediaCodecs.encodeJpegHeader(10, 10)) === None)
    assert(MediaCodecs.decodeContent(MediaCodecs.encodeMp4Header(10, 10, 1000L)) === None)
    assert(MediaCodecs.decodeContent("not media".getBytes("UTF-8")) === None)
    assert(MediaCodecs.decodeContent(null) === None)
    val png = MediaCodecs.encodePng(20, 20, (x, y) => x + y)
    // truncated IDAT: drop the tail (inflate cannot complete)
    assert(MediaCodecs.decodePngGray(png.take(png.length - 20)) === None)
    // non-grayscale color type rejected for content decode
    assert(MediaCodecs.decodePngGray(png.updated(25, 2.toByte)) === None)
    // a non-PCM (format 3 = float) WAV is rejected
    val wav = MediaCodecs.encodeWav(1, 8000, 100, j => j.toShort)
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(MediaCodecs.decodeWavSamples(nonPcm) === None)
    assert(MediaCodecs.decodeWavSamples(wav.take(50)).get.n < 100,
      "truncated data chunk clamps to available bytes")
  }

  test("media_encode content formulas: stats reproducible from (id, dims) alone") {
    import org.apache.spark.unsafe.types.UTF8String
    // the cross-engine contract: PNG pixel(x,y) = (id + y) mod 256,
    // WAV sample(j) = (id mod 64) + (j mod 16) — recompute both ways
    for (id <- Seq(0L, 6L, 123456L)) {
      val w = 32 + ((id * 7919) % 608).toInt
      val h = 32 + ((id * 4241) % 448).toInt
      val png = graft.expr.MediaKernels.encode(UTF8String.fromString("image"),
        id * 2, w, h, 0L) // even variant -> PNG
      val expSum = w.toLong * (0 until h).map(y => (id * 2 + y) % 256).sum
      val expSq = w.toLong * (0 until h).map { y =>
        val v = (id * 2 + y) % 256; v * v
      }.sum
      assert(MediaCodecs.decodePngGray(png) ===
        Some(MediaCodecs.ContentStats("png", w.toLong * h, expSum, expSq)), s"png id=$id")

      // odd variant -> full baseline JPEG, pixel(x,y) = (v + y/8) % 256
      val v = id * 2 + 1
      val jpg = graft.expr.MediaKernels.encode(UTF8String.fromString("image"),
        v, w, h, 0L)
      val expJSum = w.toLong * (0 until h).map(y => (v + y / 8) % 256).sum
      val expJSq = w.toLong * (0 until h).map { y =>
        val p = (v + y / 8) % 256; p * p
      }.sum
      assert(MediaCodecs.decodeJpegGray(jpg) ===
        Some(MediaCodecs.ContentStats("jpeg", w.toLong * h, expJSum, expJSq)),
        s"jpeg id=$id")

      val ms = 1000L + (id * 31) % 60000L
      val n = ms * 8
      val wav = graft.expr.MediaKernels.encode(UTF8String.fromString("audio"),
        id, 0, 0, ms)
      val base = id % 64
      val expWSum = (0 until 16).map { r =>
        val cnt = n / 16 + (if (r < n % 16) 1 else 0)
        cnt * (base + r)
      }.sum
      val expWSq = (0 until 16).map { r =>
        val cnt = n / 16 + (if (r < n % 16) 1 else 0)
        cnt * (base + r) * (base + r)
      }.sum
      assert(MediaCodecs.decodeWavSamples(wav) ===
        Some(MediaCodecs.ContentStats("wav", n, expWSum, expWSq)), s"wav id=$id")
    }
  }

  test("property: random dimensions/durations round-trip exactly for all four formats") {
    val rnd = new scala.util.Random(2026)
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(4096)
      val h = 1 + rnd.nextInt(4096)
      val ms = rnd.nextLong().abs % 360000L
      assert(MediaCodecs.decodeMeta(MediaCodecs.encodePng(w, h)) ===
        Some(MediaMeta("png", w, h, 1, 0L)), s"png $w x $h")
      assert(MediaCodecs.decodeMeta(MediaCodecs.encodeJpegHeader(w, h)) ===
        Some(MediaMeta("jpeg", w, h, 3, 0L)), s"jpeg $w x $h")
      assert(MediaCodecs.decodeMeta(MediaCodecs.encodeMp4Header(w, h, ms)) ===
        Some(MediaMeta("mp4", w, h, 0, ms)), s"mp4 $w x $h $ms")
      // WAV at 8 kHz: ms -> samples -> ms is exact for whole-ms inputs
      val wav = MediaCodecs.encodeWav(1, 8000, (ms * 8L).toInt)
      assert(MediaCodecs.decodeMeta(wav) === Some(MediaMeta("wav", 0, 0, 1, ms)), s"wav $ms")
    }
  }
}
