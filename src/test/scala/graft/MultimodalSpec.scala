package graft

import graft.ops.Multimodal

/** Real zero-dependency codecs: the WAV decoder must WALK RIFF chunks (not
  * assume a 44-byte layout) and the BMP decoder must honour bottom-up rows
  * and row padding; features pinned against hand-computed values. */
class MultimodalSpec extends SparkSpec {

  test("WAV decoder walks chunks: an inserted LIST chunk before data is skipped") {
    val base = Multimodal.syntheticWavBytes(7L)
    // splice a 12-byte LIST chunk between fmt and data
    val extra = new Array[Byte](12)
    "LIST".getBytes("US-ASCII").copyToArray(extra, 0)
    extra(4) = 4 // chunk length 4
    "INFO".getBytes("US-ASCII").copyToArray(extra, 8)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // fix the RIFF size field (offset 4, little endian)
    val riffLen = spliced.length - 8
    spliced(4) = riffLen.toByte; spliced(5) = (riffLen >> 8).toByte
    spliced(6) = (riffLen >> 16).toByte; spliced(7) = (riffLen >> 24).toByte
    val f = Multimodal.decodeWav(7L, spliced)
    // id=7: amp = 1000 + 7*500 = 4500, n = 400 + 7*16 = 512
    assert(f.sample_rate == 8000 && f.channels == 1 && f.bits == 16)
    assert(f.n_samples == 512 && f.duration_ms == 64)
    assert(f.peak == 4500 && math.abs(f.rms - 4500.0) < 1e-9)
  }

  test("WAV square wave features are exact for a plain file") {
    val f = Multimodal.decodeWav(23L, Multimodal.syntheticWavBytes(23L))
    // id=23: amp = 1000 + 3*500 = 2500, n = 400 + 23*16 = 768
    assert(f.peak == 2500 && f.rms == 2500.0 && f.n_samples == 768 && f.duration_ms == 96)
  }

  test("BMP decoder: gradient image means and average-hash match hand computation") {
    val id = 5L
    val f = Multimodal.decodeBmp(id, Multimodal.syntheticBmpBytes(id))
    assert(f.width == 8 && f.height == 8)
    // grayscale: every channel mean equals mean of (id + x*y) % 256
    val vals = for (y <- 0 until 8; x <- 0 until 8) yield (id + x * y) % 256
    val mean = vals.sum.toDouble / 64
    assert(math.abs(f.mean_r - mean) < 1e-9 && f.mean_r == f.mean_g && f.mean_g == f.mean_b)
    var expectHash = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (((id + x * y) % 256).toDouble >= mean) expectHash |= (1L << (y * 8 + x))
    assert(f.ahash == expectHash)
  }

  test("PNG round trip is pixel-exact for all 256 base values (lossless codec)") {
    for (id <- 0L until 256L) {
      val f = Multimodal.decodeImage(id, Multimodal.syntheticPngBytes(id))
      val vals = for (y <- 0 until 8; x <- 0 until 8) yield (id + x * y) % 256
      val mean = vals.sum.toDouble / 64
      assert(f.format == "png" && f.width == 8 && f.height == 8)
      assert(math.abs(f.mean_r - mean) < 1e-9 && f.mean_r == f.mean_g && f.mean_g == f.mean_b,
        s"id=$id mean_r=${f.mean_r} expect=$mean")
      var expectHash = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (((id + x * y) % 256).toDouble >= mean) expectHash |= (1L << (y * 8 + x))
      assert(f.ahash == expectHash)
    }
  }

  test("flat-block quality-1.0 JPEG round trip is exact for all 256 gray values") {
    // lossy codec, but a constant 8x8 block has only a DC coefficient and the
    // quality-1.0 quantization step is 1 — must reconstruct exactly
    for (id <- 0L until 256L) {
      val f = Multimodal.decodeImage(id, Multimodal.syntheticJpegBytes(id))
      val v = (id % 256).toDouble
      assert(f.format == "jpeg" && f.width == 8 && f.height == 8, s"id=$id")
      assert(f.mean_r == v && f.mean_g == v && f.mean_b == v, s"id=$id got ${f.mean_r} expect $v")
      assert(f.ahash == -1L, s"flat image: every lum >= mean, all 64 bits set (id=$id)")
    }
  }

  test("1-bit and 16-bit grayscale PNGs normalise to the 0..255 contract") {
    import java.awt.image.BufferedImage
    def pngBytes(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // pure-white bilevel image: raw samples are 0/1, contract mean is 255
    val bilevel = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 8; x <- 0 until 8) bilevel.setRGB(x, y, 0xFFFFFF)
    val fb = Multimodal.decodeImage(1L, pngBytes(bilevel))
    assert(fb.mean_r == 255.0 && fb.mean_g == 255.0 && fb.mean_b == 255.0)
    // half-intensity 16-bit gray: raw samples 0x8000ish, contract mean ~128
    val gray16 = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    gray16.getRaster.setPixels(0, 0, 8, 8, Array.fill(64)(0x8080))
    val f16 = Multimodal.decodeImage(2L, pngBytes(gray16))
    assert(math.abs(f16.mean_r - 128.0) <= 1.0, s"16-bit gray mean ${f16.mean_r}")
  }

  test("image decoder rejects hostile input: truncated PNG, garbage bytes") {
    val png = Multimodal.syntheticPngBytes(3L)
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(3L, png.take(20)) // header only, no IDAT
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(3L, Array.fill[Byte](64)(0x41))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(3L, Array[Byte](1, 2, 3))
    }
  }

  test("AIFF square wave features are exact (big-endian framing, 80-bit rate)") {
    for (id <- Seq(0L, 7L, 19L, 49L, 255L)) {
      val f = Multimodal.decodeAiff(id, Multimodal.syntheticAiffBytes(id))
      val n = 400 + (id % 50) * 16
      val amp = 1000 + (id % 20) * 500
      assert(f.sample_rate == 8000 && f.channels == 1 && f.bits == 16, s"id=$id")
      assert(f.n_samples == n && f.duration_ms == n * 1000 / 8000, s"id=$id")
      assert(f.peak == amp && math.abs(f.rms - amp) < 1e-9,
        s"id=$id peak=${f.peak} rms=${f.rms} expect $amp")
    }
  }

  test("AIFF decoder walks chunks and rejects hostile input") {
    val base = Multimodal.syntheticAiffBytes(5L)
    // splice an ANNO chunk (odd length → pad byte) between COMM and SSND
    val extra = new Array[Byte](8 + 3 + 1)
    "ANNO".getBytes("US-ASCII").copyToArray(extra, 0)
    extra(7) = 3
    val spliced = base.take(38) ++ extra ++ base.drop(38)
    val formLen = spliced.length - 8
    spliced(4) = (formLen >> 24).toByte; spliced(5) = (formLen >> 16).toByte
    spliced(6) = (formLen >> 8).toByte; spliced(7) = formLen.toByte
    val f = Multimodal.decodeAiff(5L, spliced)
    assert(f.peak == 1000 + (5 % 20) * 500 && f.n_samples == 400 + (5 % 50) * 16)
    intercept[IllegalArgumentException] {
      Multimodal.decodeAiff(1L, Array.fill[Byte](64)(0x41))
    }
    // hostile SSND length pointing past the buffer must not read out of bounds
    val evil = Multimodal.syntheticAiffBytes(1L)
    evil(42) = 0x7F.toByte // SSND size → huge
    intercept[IllegalArgumentException] { Multimodal.decodeAiff(1L, evil) }
  }

  test("AU µ-law square wave features are exact (encoded-domain synthesis)") {
    for (id <- Seq(0L, 3L, 13L, 27L, 49L, 255L)) {
      val f = Multimodal.decodeAu(id, Multimodal.syntheticAuBytes(id))
      val n = 400 + (id % 50) * 16
      val amp = ((1 + id % 14) * 8 + 132) * (1L << (id % 4)) - 132
      assert(f.sample_rate == 8000 && f.channels == 1 && f.bits == 8, s"id=$id")
      assert(f.n_samples == n && f.duration_ms == n * 1000 / 8000, s"id=$id")
      assert(f.peak == amp && math.abs(f.rms - amp) < 1e-9,
        s"id=$id peak=${f.peak} rms=${f.rms} expect $amp")
    }
  }

  test("AU µ-law expansion matches the G.711 reference table at the extremes") {
    // CCITT ulaw2linear: encoded 0xFF = u 0x00 → 0 (zero level); encoded
    // 0xFE = u 0x01 → +8; encoded 0x7E = u 0x81 → −8 (peak 8);
    // encoded 0x80 = u 0x7F → +32124 (max magnitude)
    def decodeOne(enc: Int): Long = {
      val b = Multimodal.syntheticAuBytes(0L).take(24) ++ Array(enc.toByte)
      b(8) = 0; b(9) = 0; b(10) = 0; b(11) = 1 // data size 1
      Multimodal.decodeAu(0L, b).peak
    }
    assert(decodeOne(0xFF) == 0L)
    assert(decodeOne(0xFE) == 8L)
    assert(decodeOne(0x7E) == 8L)
    assert(decodeOne(0x80) == 32124L)
  }

  test("AU A-law square wave features are exact; G.711 A-law extremes match the reference") {
    for (id <- Seq(0L, 3L, 13L, 27L, 49L, 255L)) {
      val f = Multimodal.decodeAu(id, Multimodal.syntheticAuAlawBytes(id))
      val man = id % 16; val seg = id % 4
      val amp = if (seg == 0) man * 16 + 8 else ((man * 16) + 264) << (seg - 1).toInt
      assert(f.sample_rate == 8000 && f.bits == 8 && f.n_samples == 400 + (id % 50) * 16)
      assert(f.peak == amp && math.abs(f.rms - amp) < 1e-9,
        s"id=$id peak=${f.peak} rms=${f.rms} expect $amp")
    }
    // reference extremes: stored 0xD5 → x 0x80 (seg 0, man 0, +) → 8;
    // stored 0xAA → x 0xFF (seg 7, man 15, +) → 32256
    def one(stored: Int): Long = {
      val b = Multimodal.syntheticAuAlawBytes(0L).take(24) ++ Array(stored.toByte)
      b(8) = 0; b(9) = 0; b(10) = 0; b(11) = 1
      Multimodal.decodeAu(0L, b).peak
    }
    assert(one(0xD5) == 8L)
    assert(one(0xAA) == 32256L)
  }

  test("AU decoder honours the data offset, rest-of-file size, and 16-bit PCM; rejects hostile input") {
    // annotation region: offset 32 (8 junk bytes after the 24-byte header)
    val base = Multimodal.syntheticAuBytes(5L)
    val withAnno = base.take(24) ++ Array.fill[Byte](8)(0x55) ++ base.drop(24)
    withAnno(7) = 32 // data offset
    val f = Multimodal.decodeAu(5L, withAnno)
    assert(f.n_samples == 400 + (5 % 50) * 16)
    // 0xFFFFFFFF data size = rest of file
    val unknown = base.clone()
    unknown(8) = 0xFF.toByte; unknown(9) = 0xFF.toByte
    unknown(10) = 0xFF.toByte; unknown(11) = 0xFF.toByte
    assert(Multimodal.decodeAu(5L, unknown).n_samples == f.n_samples)
    // encoding 3: one 16-bit BE sample of -3000
    val pcm = base.take(24) ++ Array(((-3000 >> 8) & 0xFF).toByte, (-3000 & 0xFF).toByte)
    pcm(8) = 0; pcm(9) = 0; pcm(10) = 0; pcm(11) = 2 // data size 2
    pcm(15) = 3 // encoding: 16-bit linear PCM
    val g = Multimodal.decodeAu(5L, pcm)
    assert(g.bits == 16 && g.n_samples == 1 && g.peak == 3000L)
    // hostile: bad magic, offset past buffer, size past buffer
    intercept[IllegalArgumentException] {
      Multimodal.decodeAu(1L, Array.fill[Byte](64)(0x41))
    }
    val evilOff = base.clone(); evilOff(4) = 0x7F.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeAu(1L, evilOff) }
    val evilSize = base.clone(); evilSize(8) = 0x7F.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeAu(1L, evilSize) }
  }

  test("animated GIF round trip is exact for all 256 gray values and frame counts") {
    for (id <- 0L until 256L) {
      val frames = Multimodal.decodeGifFrames(id, Multimodal.syntheticGifBytes(id))
      val expectN = 2 + (id % 3)
      assert(frames.length == expectN, s"id=$id got ${frames.length} frames")
      frames.zipWithIndex.foreach { case (f, i) =>
        val v = ((7 * id + 13 * i) % 256).toDouble
        assert(f.frame_index == i && f.n_frames == expectN && f.width == 8 && f.height == 8)
        assert(math.abs(f.mean_lum - v) < 1e-9,
          s"id=$id frame=$i mean=${f.mean_lum} expect $v")
      }
    }
  }

  test("GIF decoder rejects hostile input: garbage, truncation") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeGifFrames(1L, Array.fill[Byte](64)(0x41))
    }
    val gif = Multimodal.syntheticGifBytes(9L)
    intercept[Exception] { Multimodal.decodeGifFrames(9L, gif.take(16)) }
  }

  // IMA spec constants, duplicated here on purpose (published tables — the
  // spec re-states them rather than importing the implementation's copy)
  private val imaSteps = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767)
  private val imaIndexDelta = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  test("IMA ADPCM decode matches a reference state machine on random multi-block streams") {
    val rnd = new scala.util.Random(421L)
    for (trial <- 0 until 20) {
      val nBlocks = 1 + rnd.nextInt(3)
      val nibbleBytes = 2 + 2 * rnd.nextInt(40) // even so blockAlign is even
      val blockAlign = 4 + nibbleBytes
      // extreme predictors/indices exercise the ±32767 clamp and index caps
      val blocks = Seq.fill(nBlocks)((
        rnd.nextInt(65536) - 32768,
        rnd.nextInt(89),
        Array.fill[Byte](nibbleBytes)(rnd.nextInt(256).toByte)))
      val dataLen = nBlocks * blockAlign
      val out = new Array[Byte](12 + 28 + 8 + dataLen)
      def putAscii(o: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, o)
      def put32(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte
        out(o+2) = (v>>16).toByte; out(o+3) = (v>>24).toByte }
      def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte }
      putAscii(0, "RIFF"); put32(4, out.length - 8); putAscii(8, "WAVE")
      putAscii(12, "fmt "); put32(16, 20); put16(20, 0x11); put16(22, 1)
      put32(24, 8000); put32(28, 4000); put16(32, blockAlign); put16(34, 4)
      put16(36, 2); put16(38, 1 + 2 * nibbleBytes)
      putAscii(40, "data"); put32(44, dataLen)
      blocks.zipWithIndex.foreach { case ((p0, i0, nibs), bi) =>
        val base = 48 + bi * blockAlign
        put16(base, p0); out(base + 2) = i0.toByte; out(base + 3) = 0
        nibs.copyToArray(out, base + 4)
      }
      // reference decode: flat per-nibble state machine per block
      var peak = 0L; var sumSq = 0.0; var n = 0L
      blocks.foreach { case (p0, i0, nibs) =>
        var p = p0; var ix = i0
        def stat(): Unit = { peak = math.max(peak, math.abs(p.toLong))
          sumSq += p.toDouble * p; n += 1 }
        stat()
        nibs.foreach { byte =>
          Seq(byte & 0xF, (byte >> 4) & 0xF).foreach { nib =>
            val st = imaSteps(ix)
            var d = st >> 3
            if ((nib & 1) != 0) d += st >> 2
            if ((nib & 2) != 0) d += st >> 1
            if ((nib & 4) != 0) d += st
            p = if ((nib & 8) != 0) p - d else p + d
            p = math.max(-32768, math.min(32767, p))
            ix = math.max(0, math.min(88, ix + imaIndexDelta(nib & 7)))
            stat()
          }
        }
      }
      val f = Multimodal.decodeWav(trial.toLong, out)
      assert(f.bits == 4 && f.sample_rate == 8000 && f.n_samples == n, s"trial=$trial")
      assert(f.peak == peak, s"trial=$trial peak=${f.peak} expect $peak")
      assert(math.abs(f.rms - math.sqrt(sumSq / n)) < 1e-9, s"trial=$trial")
    }
  }

  test("synthetic ADPCM gate stream is the closed-form cumsum and never clamps") {
    for (id <- Seq(0L, 7L, 49L, 63L, 255L, 799L)) {
      val f = Multimodal.decodeWav(id, Multimodal.syntheticAdpcmWavBytes(id))
      val m = (2 * (100 + (id % 50) * 4)).toInt
      val p0 = (id % 800).toInt; val i0 = (id % 64).toInt
      var run = p0.toLong; var peak = math.abs(p0).toLong
      var sumSq = p0.toDouble * p0
      for (j <- 0 until m) {
        val s = imaSteps(math.max(i0 - j, 0)) >> 3
        run += (if ((id + j) % 3 == 0) -s else s)
        assert(run.abs <= 32767, s"id=$id clamped at j=$j") // oracle precondition
        peak = math.max(peak, math.abs(run)); sumSq += run.toDouble * run
      }
      assert(f.bits == 4 && f.n_samples == m + 1 && f.duration_ms == (m + 1) * 1000L / 8000)
      assert(f.peak == peak, s"id=$id peak=${f.peak} expect $peak")
      assert(math.abs(f.rms - math.sqrt(sumSq / (m + 1))) < 1e-9, s"id=$id")
    }
  }

  test("ADPCM decoder rejects hostile input: partial block, bad index, stereo") {
    val base = Multimodal.syntheticAdpcmWavBytes(5L)
    val partial = base.clone()
    // shrink the data chunk length by one byte: no longer whole blocks
    val dl = (partial(44) & 0xFF) | ((partial(45) & 0xFF) << 8)
    partial(44) = (dl - 1).toByte; partial(45) = ((dl - 1) >> 8).toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWav(5L, partial) }
    val badIdx = base.clone(); badIdx(50) = 90.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWav(5L, badIdx) }
    val stereo = base.clone(); stereo(22) = 2
    intercept[IllegalArgumentException] { Multimodal.decodeWav(5L, stereo) }
  }

  test("uncompressed AVI round trip is exact for all 256 values and frame counts") {
    for (id <- 0L until 256L) {
      val frames = Multimodal.decodeAviFrames(id, Multimodal.syntheticAviBytes(id))
      val expectN = 2 + (id % 3)
      assert(frames.length == expectN, s"id=$id got ${frames.length} frames")
      frames.zipWithIndex.foreach { case (f, i) =>
        val v = ((11 * id + 17 * i) % 256).toDouble
        assert(f.frame_index == i && f.n_frames == expectN && f.width == 8 && f.height == 8)
        assert(math.abs(f.mean_lum - v) < 1e-9,
          s"id=$id frame=$i mean=${f.mean_lum} expect $v")
      }
    }
  }

  test("AVI decoder rejects hostile input: garbage, truncation, tampered headers") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeAviFrames(1L, Array.fill[Byte](64)(0x41))
    }
    val avi = Multimodal.syntheticAviBytes(9L)
    intercept[Exception] { Multimodal.decodeAviFrames(9L, avi.take(40)) }
    // 32-bit DIB claimed: not the supported 24-bit BI_RGB layout
    val bitTamper = avi.clone(); bitTamper(186) = 32
    intercept[IllegalArgumentException] { Multimodal.decodeAviFrames(9L, bitTamper) }
    // avih says 16 wide, strf says 8: cross-check must fire
    val dimTamper = avi.clone(); dimTamper(64) = 16
    intercept[IllegalArgumentException] { Multimodal.decodeAviFrames(9L, dimTamper) }
    // frame chunk length beyond its LIST: Long-space bound check must fire
    val lenTamper = avi.clone(); lenTamper(229) = 0x7F.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeAviFrames(9L, lenTamper) }
  }

  test("MP4 metadata probe reads ftyp/mvhd/tkhd/hdlr closed-form for many ids") {
    for (id <- Seq(0L, 1L, 23L, 31L, 99L, 100L, 767L)) {
      val m = Multimodal.decodeMp4Meta(id, Multimodal.syntheticMp4Bytes(id))
      val dur = 3000 + (id % 100) * 150
      assert(m.major_brand == "isom" && m.timescale == 600, s"id=$id")
      assert(m.duration_ms == dur * 1000 / 600, s"id=$id")
      assert(m.n_tracks == 2 && m.video_tracks == 1 && m.audio_tracks == 1, s"id=$id")
      assert(m.width == 64 + (id % 32) * 16 && m.height == 48 + (id % 24) * 16, s"id=$id")
    }
  }

  test("MP4 probe handles v1 mvhd, 64-bit largesize, and rejects hostile input") {
    val base = Multimodal.syntheticMp4Bytes(5L)
    // rebuild the mvhd box as version 1 (8-byte times/duration, box 120)
    val v0 = base.slice(28, 136) // mvhd box at offset 20+8
    assert(new String(v0, 4, 4, "US-ASCII") == "mvhd")
    val v1 = new Array[Byte](120)
    def p32(o: Int, v: Int): Unit = { v1(o) = (v >> 24).toByte; v1(o+1) = (v >> 16).toByte
      v1(o+2) = (v >> 8).toByte; v1(o+3) = v.toByte }
    p32(0, 120); "mvhd".getBytes.copyToArray(v1, 4)
    v1(8) = 1 // version 1
    p32(28, 600)       // timescale after two 64-bit times
    p32(32, 0); p32(36, 3750) // 64-bit duration = 3750
    val rebuilt = base.take(20) ++ base.slice(20, 28) ++ v1 ++ base.drop(136)
    // fix the moov size (+12)
    val moovSz = 8 + 120 + 2 * 173
    rebuilt(20) = (moovSz >> 24).toByte; rebuilt(21) = (moovSz >> 16).toByte
    rebuilt(22) = (moovSz >> 8).toByte; rebuilt(23) = moovSz.toByte
    val m = Multimodal.decodeMp4Meta(5L, rebuilt)
    assert(m.timescale == 600 && m.duration_ms == 3750L * 1000 / 600)
    assert(m.video_tracks == 1 && m.width == 64 + 5 * 16)
    // largesize: wrap the ftyp box with size==1 + 64-bit size (20 → 28)
    val big = new Array[Byte](base.length + 8)
    big(0) = 0; big(1) = 0; big(2) = 0; big(3) = 1
    "ftyp".getBytes.copyToArray(big, 4)
    big(8) = 0; big(9) = 0; big(10) = 0; big(11) = 0
    big(12) = 0; big(13) = 0; big(14) = 0; big(15) = 28
    System.arraycopy(base, 8, big, 16, 12)    // ftyp payload
    System.arraycopy(base, 20, big, 28, base.length - 20)
    val m2 = Multimodal.decodeMp4Meta(5L, big)
    assert(m2.major_brand == "isom" && m2.n_tracks == 2)
    // hostile: garbage, truncation, box size past the buffer
    intercept[IllegalArgumentException] {
      Multimodal.decodeMp4Meta(1L, Array.fill[Byte](64)(0x41))
    }
    intercept[Exception] { Multimodal.decodeMp4Meta(5L, base.take(30)) }
    val evil = base.clone(); evil(20) = 0x7F.toByte // moov size beyond EOF
    intercept[IllegalArgumentException] { Multimodal.decodeMp4Meta(5L, evil) }
  }

  test("Ogg page CRC matches independently computed RFC 3533 vectors") {
    // poly 0x04c11db7, MSB-first, init 0, no final XOR — vectors computed
    // with a separate bitwise Python implementation
    assert(Multimodal.oggCrc("123456789".getBytes("US-ASCII"), 0, 9) == 0x89A1897F)
    assert(Multimodal.oggCrc("OggS".getBytes("US-ASCII"), 0, 4) == 0x5FB0A94F)
  }

  test("Ogg Vorbis probe reads rate/channels/granule closed-form; CRC is enforced") {
    for (id <- Seq(0L, 7L, 29L, 30L, 123L)) {
      val m = Multimodal.decodeOggMeta(id, Multimodal.syntheticOggBytes(id))
      val granule = 8000L * (1 + id % 30) + (id % 8) * 1000L
      assert(m.sample_rate == 8000 && m.channels == 1 && m.n_pages == 3, s"id=$id")
      assert(m.granule == granule && m.duration_ms == granule / 8, s"id=$id")
    }
    // flip one payload byte on the middle page: its CRC must now mismatch
    val ogg = Multimodal.syntheticOggBytes(3L)
    val firstLen = 27 + 1 + 30
    val corrupt = ogg.clone(); corrupt(firstLen + 30) = (corrupt(firstLen + 30) ^ 1).toByte
    val e = intercept[IllegalArgumentException] { Multimodal.decodeOggMeta(3L, corrupt) }
    assert(e.getMessage.contains("CRC"))
    // hostile: garbage, truncation, non-Vorbis BOS payload
    intercept[IllegalArgumentException] {
      Multimodal.decodeOggMeta(1L, Array.fill[Byte](64)(0x41))
    }
    intercept[Exception] { Multimodal.decodeOggMeta(3L, ogg.take(40)) }
    val notVorbis = ogg.clone(); notVorbis(29) = 'x'
    intercept[IllegalArgumentException] { Multimodal.decodeOggMeta(3L, notVorbis) }
  }

  test("MP3 frame walk reads rate/channels/bitrate/frames closed-form") {
    for (id <- 0L until 200L) {
      val m = Multimodal.decodeMp3Meta(id, Multimodal.syntheticMp3Bytes(id))
      val kbps = Array(64, 96, 128, 160)((id % 4).toInt)
      assert(m.sample_rate == 32000 && m.channels == 1 + id % 2, s"id=$id")
      assert(m.bitrate_kbps == kbps && !m.vbr, s"id=$id")
      assert(m.n_frames == 8 + id % 40 && m.duration_ms == (8 + id % 40) * 36, s"id=$id")
    }
  }

  test("MP3 probe handles VBR, padding, and hostile inputs") {
    def frame(kbps: Int, padding: Int): Array[Byte] = {
      val bri = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
        .indexOf(kbps)
      val flen = 144 * kbps * 1000 / 32000 + padding
      val f = Array.tabulate[Byte](flen)(i => (0x80 | (i % 100)).toByte)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte
      f(2) = ((bri << 4) | (2 << 2) | (padding << 1)).toByte; f(3) = 0xC0.toByte
      f
    }
    // two frames at different bitrates, one padded: a VBR stream
    val vbr = frame(64, 0) ++ frame(96, 1)
    val m = Multimodal.decodeMp3Meta(9L, vbr)
    assert(m.vbr && m.bitrate_kbps == 0 && m.n_frames == 2 && m.duration_ms == 72)
    // hostile: lost sync, MPEG-2 version bits, truncated frame, bad ID3 size
    intercept[IllegalArgumentException] {
      Multimodal.decodeMp3Meta(1L, Array.fill[Byte](64)(0x41))
    }
    val mpeg2 = frame(64, 0); mpeg2(1) = 0xF3.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeMp3Meta(1L, mpeg2) }
    intercept[Exception] { Multimodal.decodeMp3Meta(1L, frame(64, 0).take(100)) }
    val badId3 = Multimodal.syntheticMp3Bytes(5L); badId3(6) = 0x80.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeMp3Meta(5L, badId3) }
  }

  test("RBSP writer/reader round-trip enforces emulation prevention") {
    val w = new Multimodal.RbspWriter
    w.u(24, 0)        // three zero bytes: must be escaped on the wire
    w.ue(0); w.ue(7); w.ue(255); w.u(8, 0); w.u1(1); w.ue(2)
    val bytes = w.escaped()
    // the escape byte must appear (00 00 -> 00 00 03)
    assert(bytes.sliding(3).exists(s => s(0) == 0 && s(1) == 0 && s(2) == 3))
    // and no unescaped start-code-like run may survive (00 00 03 is the legal escape)
    assert(!bytes.sliding(3).exists(s => s(0) == 0 && s(1) == 0 && (s(2) & 0xFF) < 3))
    val r = new Multimodal.RbspReader(bytes, 0, bytes.length)
    assert(r.u(24) == 0 && r.ue() == 0 && r.ue() == 7 && r.ue() == 255)
    assert(r.u(8) == 0 && r.u1() == 1 && r.ue() == 2)
  }

  test("H.264 SPS parse yields exact cropped dimensions closed-form") {
    for (id <- 0L until 200L) {
      val m = Multimodal.decodeH264Meta(id, Multimodal.syntheticH264Bytes(id))
      val w = 16 * (4 + id % 32) - (if (id % 3 == 0) 2 * (1 + id % 4) else 0)
      val h = 16 * (3 + id % 24) - (if (id % 3 == 0) 2 * (id % 2) else 0)
      assert(m.profile_idc == 66 && m.level_idc == 30, s"id=$id")
      assert(m.width == w && m.height == h, s"id=$id")
      assert(m.n_nals == 3 + id % 20 && m.n_idr == 1 && m.n_frames == 1 + id % 20, s"id=$id")
    }
  }

  test("H.264 probe rejects hostile streams") {
    val good = Multimodal.syntheticH264Bytes(7L)
    // no leading start code
    intercept[IllegalArgumentException] {
      Multimodal.decodeH264Meta(1L, Array.fill[Byte](64)(0x41))
    }
    // forbidden_zero_bit set on the SPS header byte
    val forbidden = good.clone(); forbidden(4) = (forbidden(4) | 0x80).toByte
    intercept[IllegalArgumentException] { Multimodal.decodeH264Meta(7L, forbidden) }
    // slices but no SPS: drop everything before the IDR's start code
    val idrStart = (0 until good.length - 3).find(i =>
      good(i) == 0 && good(i + 1) == 0 && good(i + 2) == 1 && good(i + 3) == 0x65).get
    intercept[IllegalArgumentException] { Multimodal.decodeH264Meta(7L, good.drop(idrStart)) }
  }

  test("distributed extract over a corpus matches per-row decode") {
    import spark.implicits._
    val ids = Seq(1L, 19L, 42L, 63L).toDF("doc_id")
    val got = Multimodal.extractWavFeatures(Multimodal.syntheticWav(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(6), r.getDouble(7))).toSet
    val expect = Seq(1L, 19L, 42L, 63L).map { id =>
      val f = Multimodal.decodeWav(id, Multimodal.syntheticWavBytes(id))
      (id, f.peak, f.rms)
    }.toSet
    assert(got == expect)
  }
}
