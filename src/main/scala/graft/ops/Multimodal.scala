package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, decode/feature-extract as partition-local batch
 * transforms.
 *
 * Image, audio, and video containers decode for REAL with zero dependencies:
 * [[decodeWav]] walks RIFF chunks and decodes 16-bit PCM AND compressed IMA
 * ADPCM (format tag 0x11 — the table-driven 4-bit predictor state machine);
 * [[decodeBmp]] parses the BITMAPINFOHEADER and pixel array (bottom-up rows,
 * 4-byte row padding) into channel means and a 64-bit average-hash;
 * [[decodeImage]] decodes COMPRESSED images (PNG inflate, JPEG IDCT) through
 * the JDK's built-in `javax.imageio` readers; [[decodeAviFrames]] walks an
 * AVI RIFF LIST tree into per-frame features. Only PERCEPTUAL codecs
 * (mp3/h264…) remain stubbed (`fakeDecode` — no codec libraries in this
 * container, and none in the JDK); the distributed shape — partition-local
 * batch map, no shuffle — is identical either way.
 */
object Multimodal {

  // ImageIO's default stream cache backs every ImageInputStream /
  // ImageOutputStream with a TEMP FILE — one disk round-trip per encoded or
  // decoded ROW through the javax.imageio paths below (measured: the GIF
  // gate spent ~4× its decode time in FileCacheImageInputStream churn).
  // Media rows are byte arrays already in memory; memory-cached streams are
  // strictly better. JVM-global, set once per executor at class load (the
  // decode lambdas reference this object, so executors initialise it before
  // first use).
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("duration_ms", LongType))), nullable = true)))

  final case class MediaFeature(media_id: Long, n_bytes: Long, byte_mean: Double,
                                byte_entropy: Double, phash: Long)

  /** ======= STUB ======= deterministic stand-in for a real image decode:
    * byte statistics + a hash-based "perceptual hash". Replace with a codec
    * call; the signature (bytes in → fixed-width features out) is the
    * contract a real decoder fills. */
  private[ops] def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeature = {
    if (bytes == null || bytes.isEmpty) return MediaFeature(id, 0L, 0.0, 0.0, 0L)
    val counts = new Array[Long](256)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xFF; counts(u) += 1; sum += u }
    val n = bytes.length.toDouble
    val entropy = counts.filter(_ > 0).map { c =>
      val p = c / n; -p * math.log(p) / math.log(2)
    }.sum
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    bytes.foreach(b => h = h * 31 + (b & 0xFF))
    MediaFeature(id, bytes.length.toLong, sum / n, entropy, h)
  }

  /**
   * Feature extraction over the media column: partition-local, batched —
   * the distributed shape of an `mapInPandas` decode stage. Narrow
   * transformation: no shuffle, parallelism = input partitions.
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.product[MediaFeature]
    media.select(col("media_id"), col("media"))
      .map { row =>
        fakeDecode(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]])
      }(enc)
      .toDF()
  }

  /**
   * Frame sampling fan-out for video-like media: emit `n` evenly spaced
   * (frame_index, byte_offset) rows per media item — the generate step a
   * real frame extractor parallelises over. Pure column expressions.
   */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"), length(col("media")).as("sz"),
        coalesce(col("meta.duration_ms"), lit(0L)).as("dur"))
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => (col("sz") * i / n).cast(LongType))))
      .select(col("media_id"), col("pos").as("frame_index"), col("col").as("byte_offset"))

  // ------------------------------------------------------- real codecs (WAV)

  final case class WavFeature(media_id: Long, sample_rate: Long, channels: Long,
                              bits: Long, n_samples: Long, duration_ms: Long,
                              peak: Long, rms: Double)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  // IMA ADPCM spec constants (IMA "Recommended Practices for Enhancing
  // Digital Audio Compatibility", rev 3.00 — the step-size and index tables
  // every interoperable decoder ships verbatim).
  private val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767)
  private val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** REAL RIFF/WAVE decoder (chunk walk): 16-bit little-endian PCM (format
    * tag 1) and COMPRESSED IMA ADPCM (format tag 0x11 — 4-bit nibbles, the
    * table-driven IMA predictor state machine, per-block header reset).
    * Sample statistics straight from the byte payload. Throws on non-WAV
    * input — callers dispatch on magic. */
  private[graft] def decodeWav(id: Long, b: Array[Byte]): WavFeature = {
    require(b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not a RIFF/WAVE file")
    var o = 12
    var tag = 0; var rate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (o + 8 <= b.length) {
      val cid = new String(b, o, 4, "US-ASCII")
      val len = le32(b, o + 4)
      // negative lengths would loop forever (step 0/backwards) and large
      // ones overflow Int — validate in Long space before touching payload
      require(len >= 0 && o.toLong + 8 + len <= b.length, "truncated/invalid RIFF chunk")
      cid match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          tag = le16(b, o + 8)
          require(tag == 1 || tag == 0x11, "only PCM / IMA ADPCM wav supported")
          channels = le16(b, o + 10); rate = le32(b, o + 12)
          blockAlign = le16(b, o + 20); bits = le16(b, o + 22)
        case "data" => dataOff = o + 8; dataLen = len
        case _ =>
      }
      o += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(dataOff >= 0 && rate > 0, "missing fmt/data chunk")
    require(channels > 0 && dataLen >= 0 && dataOff + dataLen <= b.length,
      "truncated WAV data chunk")
    var peak = 0L; var sumSq = 0.0; var n = 0L
    def stat(s: Int): Unit = {
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumSq += s.toDouble * s.toDouble
      n += 1
    }
    if (tag == 1) {
      require(bits == 16, "only 16-bit PCM supported")
      var i = 0
      val total = (dataLen / 2) / channels * channels
      while (i < total) { stat(le16(b, dataOff + 2 * i).toShort.toInt); i += 1 }
      n = total / channels // frames, matching the original contract
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / total)
      return WavFeature(id, rate.toLong, channels.toLong, 16L, n,
        n * 1000L / rate, peak, rms)
    }
    // IMA ADPCM: data is whole blocks; each block restarts the predictor
    // state from a 4-byte header (int16 predictor, uint8 step index, pad)
    // whose predictor IS the block's first output sample, followed by 4-bit
    // codes packed low-nibble-first.
    require(channels == 1, "only mono IMA ADPCM supported")
    require(bits == 4, "IMA ADPCM must be 4 bits per sample")
    require(blockAlign > 4 && dataLen % blockAlign == 0,
      "IMA ADPCM data must be whole blocks")
    var blk = 0
    while (blk.toLong * blockAlign < dataLen) {
      val base = dataOff + blk * blockAlign
      var pred = le16(b, base).toShort.toInt
      var idx = b(base + 2) & 0xFF
      require(idx <= 88, "bad ADPCM step index")
      stat(pred)
      var k = 0
      while (k < blockAlign - 4) {
        val byte = b(base + 4 + k) & 0xFF
        var half = 0
        while (half < 2) {
          val nib = if (half == 0) byte & 0xF else (byte >> 4) & 0xF
          val step = imaStepTable(idx)
          // diff uses the PRE-update index; magnitude bits add step>>2,
          // step>>1, step on top of the always-present step>>3
          var diff = step >> 3
          if ((nib & 1) != 0) diff += step >> 2
          if ((nib & 2) != 0) diff += step >> 1
          if ((nib & 4) != 0) diff += step
          pred = if ((nib & 8) != 0) pred - diff else pred + diff
          if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
          idx += imaIndexTable(nib & 7)
          if (idx < 0) idx = 0 else if (idx > 88) idx = 88
          stat(pred)
          half += 1
        }
        k += 1
      }
      blk += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    WavFeature(id, rate.toLong, 1L, 4L, n, n * 1000L / rate, peak, rms)
  }

  /** Decode a WAV media column (partition-local, no shuffle). */
  def extractWavFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.product[WavFeature]
    media.select(col("media_id"), col("media"))
      .map(row => decodeWav(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID 16-bit PCM WAV per id: mono 8 kHz square wave,
    * amplitude 1000 + (id mod 20)·500, 400 + (id mod 50)·16 samples, period
    * 16. A square wave's RMS equals its amplitude exactly, so every decoded
    * feature is a closed-form function of the id — DuckDB-oracle-able
    * without re-parsing bytes. */
  private[graft] def syntheticWavBytes(id: Long): Array[Byte] = {
    val rate = 8000; val n = (400 + (id % 50) * 16).toInt
    val amp = (1000 + (id % 20) * 500).toInt
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(o: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, o)
    def put32(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte
      out(o+2) = (v>>16).toByte; out(o+3) = (v>>24).toByte }
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte }
    putAscii(0, "RIFF"); put32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, rate); put32(28, rate * 2); put16(32, 2); put16(34, 16)
    putAscii(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < n) {
      val s = if ((i / 8) % 2 == 0) amp else -amp
      put16(44 + 2 * i, s)
      i += 1
    }
    out
  }

  def syntheticWav(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticWavBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  /** Deterministic VALID single-block IMA-ADPCM WAV per id, synthesized in
    * the ENCODED domain so the decode is SQL-reproducible: header predictor
    * `id mod 800`, step index `id mod 64`, and every 4-bit code is 0 or 8
    * (sign bit only — both step the index by −1). The decoded stream is then
    * `p0 + Σ_j ±(stepTable[max(i0−j,0)] >> 3)` — a window cumsum over the
    * published IMA step table that a DuckDB oracle recomputes independently.
    * With i0 ≤ 63 the cumulative gain is ≤ 4120 and |p0| < 800, so the
    * ±32767 clamp never engages and the closed form is exact. */
  private[graft] def syntheticAdpcmWavBytes(id: Long): Array[Byte] = {
    val rate = 8000
    val nibbleBytes = (100 + (id % 50) * 4).toInt
    val blockAlign = 4 + nibbleBytes
    val p0 = (id % 800).toInt
    val i0 = (id % 64).toInt
    // RIFF(12) + fmt(8+20, cbSize=2 extension carries samples/block) +
    // data(8 + one block)
    val out = new Array[Byte](12 + 28 + 8 + blockAlign)
    def putAscii(o: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, o)
    def put32(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte
      out(o+2) = (v>>16).toByte; out(o+3) = (v>>24).toByte }
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte }
    putAscii(0, "RIFF"); put32(4, out.length - 8); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 20); put16(20, 0x11); put16(22, 1)
    put32(24, rate); put32(28, rate * blockAlign / (1 + 2 * nibbleBytes))
    put16(32, blockAlign); put16(34, 4)
    put16(36, 2); put16(38, 1 + 2 * nibbleBytes) // cbSize, wSamplesPerBlock
    putAscii(40, "data"); put32(44, blockAlign)
    put16(48, p0); out(50) = i0.toByte; out(51) = 0
    var j = 0
    while (j < 2 * nibbleBytes) {
      val nib = if ((id + j) % 3 == 0) 8 else 0 // 8 = subtract, 0 = add
      val o = 52 + j / 2
      out(o) = (if (j % 2 == 0) (out(o) | nib) else (out(o) | (nib << 4))).toByte
      j += 1
    }
    out
  }

  def syntheticAdpcmWav(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticAdpcmWavBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // ------------------------------------------------------- real codecs (BMP)

  final case class BmpFeature(media_id: Long, width: Long, height: Long,
                              mean_r: Double, mean_g: Double, mean_b: Double,
                              ahash: Long)

  /** REAL uncompressed 24-bit BMP decoder: BITMAPFILEHEADER offset,
    * BITMAPINFOHEADER dims, bottom-up pixel rows padded to 4 bytes; channel
    * means plus a 64-bit average-hash over the luminance of the (up to) 8×8
    * top-left block. */
  private[graft] def decodeBmp(id: Long, b: Array[Byte]): BmpFeature = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP file")
    val off = le32(b, 10); val w = le32(b, 18); val h = le32(b, 22)
    require(le16(b, 28) == 24 && le32(b, 30) == 0, "only uncompressed 24-bit BMP")
    require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14), "unsupported BMP dimensions")
    val rowLen = ((w * 3 + 3) / 4) * 4
    require(off >= 54 && off.toLong + rowLen.toLong * h <= b.length, "truncated BMP pixel array")
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    val lum = Array.ofDim[Double](math.min(h, 8), math.min(w, 8))
    for (y <- 0 until h; x <- 0 until w) {
      val o = off + (h - 1 - y) * rowLen + x * 3 // bottom-up rows
      val (bb, gg, rr) = (b(o) & 0xFF, b(o + 1) & 0xFF, b(o + 2) & 0xFF)
      sr += rr; sg += gg; sb += bb
      if (y < 8 && x < 8) lum(y)(x) = 0.299 * rr + 0.587 * gg + 0.114 * bb
    }
    val n = (w * h).toDouble
    val flat = lum.flatten
    val mean = if (flat.nonEmpty) flat.sum / flat.length else 0.0
    var hash = 0L
    var i = 0
    while (i < flat.length) { if (flat(i) >= mean) hash |= (1L << i); i += 1 }
    BmpFeature(id, w.toLong, h.toLong, sr / n, sg / n, sb / n, hash)
  }

  def extractBmpFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.product[BmpFeature]
    media.select(col("media_id"), col("media"))
      .map(row => decodeBmp(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID 8×8 24-bit grayscale BMP per id: pixel (x,y) value
    * (id + x·y) mod 256 on all three channels — channel means are a
    * closed-form double sum over an 8×8 grid, DuckDB-oracle-able. */
  private[graft] def syntheticBmpBytes(id: Long): Array[Byte] = {
    val w = 8; val h = 8; val rowLen = w * 3 // already 4-byte aligned
    val out = new Array[Byte](54 + rowLen * h)
    def put32(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte
      out(o+2) = (v>>16).toByte; out(o+3) = (v>>24).toByte }
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte }
    out(0) = 'B'; out(1) = 'M'; put32(2, out.length); put32(10, 54)
    put32(14, 40); put32(18, w); put32(22, h); put16(26, 1); put16(28, 24)
    put32(30, 0); put32(34, rowLen * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((id + x * y) % 256).toInt
      val o = 54 + (h - 1 - y) * rowLen + x * 3
      out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
    }
    out
  }

  def syntheticBmp(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticBmpBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // ------------------------------------- real codecs (PNG / JPEG via ImageIO)

  final case class ImageFeature(media_id: Long, format: String, width: Long, height: Long,
                                mean_r: Double, mean_g: Double, mean_b: Double,
                                ahash: Long)

  /** REAL compressed-image decode via the JDK's built-in `javax.imageio`
    * readers (PNG = DEFLATE inflate + filter reversal, JPEG = Huffman + IDCT
    * — zero new dependencies). Same feature contract as [[decodeBmp]]:
    * channel means over all pixels plus a 64-bit average-hash over the
    * luminance of the top-left (up to) 8×8 block.
    *
    * Single-band (grayscale) images are read from the raster directly:
    * `getRGB` on `TYPE_BYTE_GRAY` applies a linear-gray→sRGB color-space
    * conversion that would silently distort the values. */
  private[graft] def decodeImage(id: Long, b: Array[Byte]): ImageFeature = {
    require(b != null && b.length >= 8, "not an image")
    val fmt =
      if (b(0) == 'B' && b(1) == 'M') "bmp"
      else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
      else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "jpeg"
      else "unknown"
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case e: java.io.IOException =>
        throw new IllegalArgumentException(s"undecodable image (format=$fmt): ${e.getMessage}")
      }
    require(img != null, s"undecodable image (format=$fmt)")
    val w = img.getWidth; val h = img.getHeight
    require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14), "unsupported image dimensions")
    val gray = img.getRaster.getNumBands == 1
    // raster samples are raw at the source bit depth (1-bit bilevel: 0..1,
    // 16-bit gray: 0..65535) — normalise to the 0..255 contract getRGB gives
    val grayMax = if (gray) (1L << img.getRaster.getSampleModel.getSampleSize(0)) - 1 else 255L
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    val lum = Array.ofDim[Double](math.min(h, 8), math.min(w, 8))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (rr, gg, bb) = if (gray) {
          val v = ((img.getRaster.getSample(x, y, 0).toLong * 255L + grayMax / 2) / grayMax).toInt
          (v, v, v)
        } else {
          val rgb = img.getRGB(x, y)
          ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
        }
        sr += rr; sg += gg; sb += bb
        if (y < 8 && x < 8) lum(y)(x) = 0.299 * rr + 0.587 * gg + 0.114 * bb
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val flat = lum.flatten
    val mean = if (flat.nonEmpty) flat.sum / flat.length else 0.0
    var hash = 0L
    var i = 0
    while (i < flat.length) { if (flat(i) >= mean) hash |= (1L << i); i += 1 }
    ImageFeature(id, fmt, w.toLong, h.toLong, sr / n, sg / n, sb / n, hash)
  }

  /** Decode a PNG/JPEG/BMP media column (partition-local, no shuffle). */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.product[ImageFeature]
    media.select(col("media_id"), col("media"))
      .map(row => decodeImage(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID 8×8 RGB PNG per id, pixel (x,y) = (id + x·y) mod 256
    * on all channels — PNG is lossless, so the decode oracle is the same
    * closed-form grid sum as the BMP gate. */
  private[graft] def syntheticPngBytes(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = ((id + x * y) % 256).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  def syntheticPng(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticPngBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  /** Deterministic VALID baseline JPEG per id: 8×8 single-component
    * (grayscale) image of CONSTANT value id mod 256, written at compression
    * quality 1.0. A flat 8×8 block has only a DC coefficient and the
    * quality-1.0 quantization step is 1, so the lossy round trip is exact
    * (verified exhaustively over all 256 values in MultimodalSpec) and the
    * oracle stays closed-form in the id. */
  private[graft] def syntheticJpegBytes(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val v = (id % 256).toInt
    val raster = img.getRaster
    for (y <- 0 until 8; x <- 0 until 8) raster.setSample(x, y, 0, v)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  def syntheticJpeg(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticJpegBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // --------------------------------------- real codecs (animated GIF frames)

  final case class GifFrame(media_id: Long, frame_index: Long, n_frames: Long,
                            width: Long, height: Long, mean_lum: Double)

  /** REAL multi-frame container decode: animated GIF through the JDK's
    * `javax.imageio` GIF reader (LZW decompress + palette lookup). This is
    * the frame-extraction path for video-like media made real: one output
    * row per frame, partition-local, fan-out = frame count. Frame count and
    * dimensions are validated before decode (DoS posture as [[decodeWav]]). */
  private[graft] def decodeGifFrames(id: Long, b: Array[Byte]): Seq[GifFrame] = {
    require(b != null && b.length >= 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F', "not a GIF")
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      require(n >= 1 && n <= 4096, s"unsupported frame count $n")
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14),
          "unsupported image dimensions")
        var s = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        GifFrame(id, i.toLong, n.toLong, w.toLong, h.toLong, s / (w.toLong * h))
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Decode an animated-GIF media column into per-frame feature rows
    * (partition-local flatMap, no shuffle). */
  def extractGifFrames(media: DataFrame): DataFrame = {
    val enc = Encoders.product[GifFrame]
    media.select(col("media_id"), col("media"))
      .flatMap(row => decodeGifFrames(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID animated GIF per id: 2 + (id mod 3) frames of 8×8
    * constant gray value (7·id + 13·f) mod 256 for frame f. Frames are
    * written TYPE_BYTE_INDEXED over an explicit 256-gray identity palette,
    * so the GIF round trip is byte-exact by construction (no quantization,
    * no gray→sRGB conversion) and every decoded frame mean is closed-form
    * in (id, f) — verified exhaustively over all 256 values in
    * MultimodalSpec. */
  private[graft] def syntheticGifBytes(id: Long): Array[Byte] = {
    val frames = (2 + (id % 3)).toInt
    val ramp = Array.tabulate(256)(_.toByte)
    val palette = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val v = ((7 * id + 13 * f) % 256).toInt
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
        val raster = img.getRaster
        for (y <- 0 until 8; x <- 0 until 8) raster.setSample(x, y, 0, v)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  def syntheticGif(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticGifBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // --------------------------------------- real codecs (AVI video container)

  /** REAL VIDEO container decode: uncompressed AVI — a RIFF('AVI ') LIST
    * tree walked recursively: 'hdrl' carries the `avih` main header and the
    * video stream's `strh`/`strf` (BITMAPINFOHEADER, must be BI_RGB 24-bit),
    * 'movi' carries one 'NNdb'/'NNdc' DIB chunk per frame (bottom-up BGR
    * rows padded to 4 bytes — the same raster as [[decodeBmp]]). One output
    * row per frame, shared [[GifFrame]] feature contract. DoS posture as the
    * audio chunk walks: unsigned-Long length validation, dimension / frame /
    * nesting-depth caps, exact per-frame payload size. */
  private[graft] def decodeAviFrames(id: Long, b: Array[Byte]): Seq[GifFrame] = {
    require(b != null && b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ',
      "not a RIFF/AVI file")
    var aw = -1; var ah = -1            // avih dims (cross-checked when present)
    var w = -1; var h = -1; var bitCount = -1; var compression = -1
    var lastStrh = ""                   // fccType of the preceding strh chunk
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(start: Long, end: Long, inHdrl: Boolean, inMovi: Boolean, depth: Int): Unit = {
      require(depth <= 8, "AVI LIST nesting too deep")
      var o = start
      while (o + 8 <= end) {
        val cid = new String(b, o.toInt, 4, "US-ASCII")
        val len = le32(b, o.toInt + 4).toLong & 0xFFFFFFFFL
        require(o + 8 + len <= end, "truncated/invalid AVI chunk")
        if (cid == "LIST" || cid == "RIFF") {
          require(len >= 4, "LIST chunk too short")
          val ltype = new String(b, o.toInt + 8, 4, "US-ASCII")
          walk(o + 12, o + 8 + len, inHdrl || ltype == "hdrl",
            inMovi || ltype == "movi", depth + 1)
        } else if (inHdrl && cid == "avih") {
          require(len >= 40, "avih header too short")
          aw = le32(b, o.toInt + 8 + 32); ah = le32(b, o.toInt + 8 + 36)
        } else if (inHdrl && cid == "strh") {
          require(len >= 4, "strh too short")
          lastStrh = new String(b, o.toInt + 8, 4, "US-ASCII")
        } else if (inHdrl && cid == "strf" && lastStrh == "vids") {
          require(len >= 20, "video strf too short")
          w = le32(b, o.toInt + 8 + 4); h = le32(b, o.toInt + 8 + 8)
          bitCount = le16(b, o.toInt + 8 + 14); compression = le32(b, o.toInt + 8 + 16)
        } else if (inMovi && cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
          (cid.substring(2) == "db" || cid.substring(2) == "dc")) {
          frames += ((o.toInt + 8, len.toInt))
        }
        o += 8 + len + (len & 1L) // chunks are word-aligned
      }
    }
    walk(12L, b.length.toLong, inHdrl = false, inMovi = false, depth = 0)
    require(bitCount == 24 && compression == 0, "only uncompressed 24-bit AVI supported")
    require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14), "unsupported AVI dimensions")
    require(aw == -1 || (aw == w && ah == h), "avih/strf dimension mismatch")
    require(frames.nonEmpty && frames.size <= 4096, s"unsupported frame count ${frames.size}")
    val rowLen = ((w * 3 + 3) / 4) * 4
    require(frames.forall { case (off, len) =>
      len == rowLen * h && off.toLong + len <= b.length }, "bad AVI frame payload size")
    val n = frames.size
    frames.toSeq.zipWithIndex.map { case ((off, _), f) =>
      var s = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = off + (h - 1 - y) * rowLen + x * 3 // bottom-up rows
          s += 0.299 * (b(p + 2) & 0xFF) + 0.587 * (b(p + 1) & 0xFF) +
            0.114 * (b(p) & 0xFF)
          x += 1
        }
        y += 1
      }
      GifFrame(id, f.toLong, n.toLong, w.toLong, h.toLong, s / (w.toLong * h))
    }
  }

  /** Decode an uncompressed-AVI media column into per-frame feature rows
    * (partition-local flatMap, no shuffle — fan-out = frame count). */
  def extractAviFrames(media: DataFrame): DataFrame = {
    val enc = Encoders.product[GifFrame]
    media.select(col("media_id"), col("media"))
      .flatMap(row => decodeAviFrames(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID uncompressed AVI per id: 2 + (id mod 3) frames of
    * 8×8 constant gray (11·id + 17·f) mod 256 for frame f, 24-bit BGR DIB
    * payloads ('00db') under a real hdrl/strl/movi LIST tree. Raw DIB frames
    * are lossless, so every frame mean is closed-form in (id, f). */
  private[graft] def syntheticAviBytes(id: Long): Array[Byte] = {
    val nFrames = (2 + id % 3).toInt
    val w = 8; val h = 8; val rowLen = w * 3 // already 4-byte aligned
    val frameLen = rowLen * h
    val hdrlLen = 192                        // 'hdrl' + avih(8+56) + LIST strl(8+116)
    val moviLen = 4 + nFrames * (8 + frameLen)
    val out = new Array[Byte](12 + 8 + hdrlLen + 8 + moviLen)
    def putAscii(o: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, o)
    def put32(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte
      out(o+2) = (v>>16).toByte; out(o+3) = (v>>24).toByte }
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o+1) = (v>>8).toByte }
    putAscii(0, "RIFF"); put32(4, out.length - 8); putAscii(8, "AVI ")
    putAscii(12, "LIST"); put32(16, hdrlLen); putAscii(20, "hdrl")
    putAscii(24, "avih"); put32(28, 56)
    val avih = 32
    put32(avih, 40000)                       // µs per frame (25 fps)
    put32(avih + 16, nFrames); put32(avih + 24, 1) // dwTotalFrames, dwStreams
    put32(avih + 32, w); put32(avih + 36, h)
    val strl = avih + 56
    putAscii(strl, "LIST"); put32(strl + 4, 116); putAscii(strl + 8, "strl")
    putAscii(strl + 12, "strh"); put32(strl + 16, 56)
    val strh = strl + 20
    putAscii(strh, "vids"); putAscii(strh + 4, "DIB ")
    put32(strh + 20, 1); put32(strh + 24, 25) // dwScale, dwRate (25 fps)
    put32(strh + 32, nFrames)                 // dwLength
    val strf = strh + 56
    putAscii(strf, "strf"); put32(strf + 4, 40)
    val bih = strf + 8
    put32(bih, 40); put32(bih + 4, w); put32(bih + 8, h)
    put16(bih + 12, 1); put16(bih + 14, 24)   // planes, 24-bit
    put32(bih + 16, 0); put32(bih + 20, frameLen) // BI_RGB, image size
    val movi = bih + 40
    putAscii(movi, "LIST"); put32(movi + 4, moviLen); putAscii(movi + 8, "movi")
    var fo = movi + 12
    var f = 0
    while (f < nFrames) {
      putAscii(fo, "00db"); put32(fo + 4, frameLen)
      val v = ((11 * id + 17 * f) % 256).toByte
      java.util.Arrays.fill(out, fo + 8, fo + 8 + frameLen, v)
      fo += 8 + frameLen
      f += 1
    }
    out
  }

  def syntheticAvi(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticAviBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // ------------------------------------------------------ real codecs (AIFF)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) | ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  /** REAL AIFF decoder (big-endian IFF chunk walk, COMM + SSND, 16-bit PCM,
    * 80-bit extended-precision sample rate) — the Apple-lineage sibling of
    * [[decodeWav]], same feature contract and the same Long-space length
    * hardening against hostile headers. */
  private[graft] def decodeAiff(id: Long, b: Array[Byte]): WavFeature = {
    require(b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F', "not a FORM/AIFF file")
    var o = 12L
    var rate = 0L; var channels = 0; var bits = 0; var nFrames = 0L
    var dataOff = -1L; var dataLen = 0L
    while (o + 8 <= b.length) {
      val id4 = new String(b, o.toInt, 4, "US-ASCII")
      val len = be32(b, o.toInt + 4).toLong & 0xFFFFFFFFL
      val body = o + 8
      if (id4 == "COMM" && len >= 18 && body + 18 <= b.length) {
        channels = be16(b, body.toInt)
        nFrames = be32(b, body.toInt + 2).toLong & 0xFFFFFFFFL
        bits = be16(b, body.toInt + 6)
        // 80-bit extended: 1+15-bit sign/exponent, 64-bit mantissa with
        // explicit integer bit; integral rates decode exactly
        val e = be16(b, body.toInt + 8) & 0x7FFF
        var m = 0L
        var i = 0
        while (i < 8) { m = (m << 8) | (b(body.toInt + 10 + i) & 0xFF); i += 1 }
        val shift = 16383 + 63 - e
        require(shift >= 0 && shift < 64, "unsupported sample rate encoding")
        rate = m >>> shift
      } else if (id4 == "SSND" && body + 8 <= b.length) {
        val off = be32(b, body.toInt).toLong & 0xFFFFFFFFL
        dataOff = body + 8 + off
        dataLen = len - 8 - off
      }
      // chunks are word-aligned: odd lengths carry a pad byte
      o = body + len + (len & 1L)
    }
    require(rate > 0 && channels == 1 && bits == 16, "unsupported AIFF layout")
    require(dataOff >= 0 && dataLen >= 0 && dataOff + dataLen <= b.length,
      "SSND chunk out of bounds")
    val n = math.min(nFrames, dataLen / 2).toInt
    var peak = 0L; var sumSq = 0.0
    var i = 0
    while (i < n) {
      // big-endian 16-bit signed sample
      val s = (be16(b, (dataOff + 2L * i).toInt) << 16) >> 16
      peak = math.max(peak, math.abs(s.toLong)); sumSq += s.toDouble * s
      i += 1
    }
    WavFeature(id, rate, channels.toLong, bits.toLong, n.toLong,
      if (rate > 0) n * 1000L / rate else 0L, peak,
      if (n > 0) math.sqrt(sumSq / n) else 0.0)
  }

  def extractAiffFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.product[WavFeature]
    media.select(col("media_id"), col("media"))
      .map(row => decodeAiff(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID 16-bit PCM AIFF per id: same square wave as
    * [[syntheticWavBytes]] (RMS = amplitude exactly), in big-endian AIFF
    * framing with an 80-bit extended sample rate. */
  private[graft] def syntheticAiffBytes(id: Long): Array[Byte] = {
    val rate = 8000L; val n = (400 + (id % 50) * 16).toInt
    val amp = (1000 + (id % 20) * 500).toInt
    val dataLen = n * 2
    // FORM(12) + COMM(8+18) + SSND(8+8+data)
    val out = new Array[Byte](12 + 26 + 16 + dataLen)
    def putAscii(o: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, o)
    def put32(o: Int, v: Int): Unit = { out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte }
    def put16(o: Int, v: Int): Unit = { out(o) = (v >> 8).toByte; out(o + 1) = v.toByte }
    putAscii(0, "FORM"); put32(4, out.length - 8); putAscii(8, "AIFF")
    putAscii(12, "COMM"); put32(16, 18)
    put16(20, 1) // channels
    put32(22, n) // sample frames
    put16(26, 16) // bits
    // 80-bit extended for `rate`: normalize mantissa to the top bit
    var m = rate; var e = 16383 + 63
    while ((m & Long.MinValue) == 0) { m <<= 1; e -= 1 }
    put16(28, e)
    var i = 0
    while (i < 8) { out(30 + i) = (m >>> (56 - 8 * i)).toByte; i += 1 }
    putAscii(38, "SSND"); put32(42, 8 + dataLen); put32(46, 0); put32(50, 0)
    i = 0
    while (i < n) {
      val s = if ((i / 8) % 2 == 0) amp else -amp
      put16(54 + 2 * i, s)
      i += 1
    }
    out
  }

  def syntheticAiff(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticAiffBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // -------------------------------------------------------- real codecs (AU)

  /** REAL Sun AU decoder (big-endian header, `.snd` magic): the data offset
    * may exceed 24 (annotation region skipped), data size 0xFFFFFFFF means
    * "rest of file". Payloads: G.711 µ-law (encoding 1) expanded per the
    * CCITT reference — complement, then sign/exponent/mantissa with
    * magnitude ((man·8+132)·2^exp)−132; 16-bit linear big-endian PCM
    * (encoding 3); G.711 A-law (encoding 27) — XOR 0x55, then segment 0
    * gives (man·16)+8 and segment s≥1 gives ((man·16)+264)·2^(s−1). Same
    * feature contract and Long-space length hardening as [[decodeWav]]. */
  private[graft] def decodeAu(id: Long, b: Array[Byte]): WavFeature = {
    require(b.length >= 24 && b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd',
      "not a Sun AU file")
    val off = be32(b, 4); val dSize = be32(b, 8); val enc = be32(b, 12)
    val rate = be32(b, 16); val channels = be32(b, 20)
    require(off >= 24 && off <= b.length, "bad AU data offset")
    val len = if (dSize == -1) b.length - off else dSize
    require(len >= 0 && off.toLong + len <= b.length, "truncated AU data")
    require(rate > 0 && channels == 1, "unsupported AU layout")
    var peak = 0L; var sumSq = 0.0
    val (n, bits) = enc match {
      case 1 => // 8-bit µ-law
        var i = 0
        while (i < len) {
          val u = (~b(off + i)) & 0xFF
          val mag = ((((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
          val s = if ((u & 0x80) != 0) -mag.toLong else mag.toLong
          if (math.abs(s) > peak) peak = math.abs(s)
          sumSq += s.toDouble * s.toDouble
          i += 1
        }
        (len, 8L)
      case 3 => // 16-bit linear PCM, big-endian
        val frames = len / 2
        var i = 0
        while (i < frames) {
          val s = be16(b, off + 2 * i).toShort.toLong
          if (math.abs(s) > peak) peak = math.abs(s)
          sumSq += s.toDouble * s.toDouble
          i += 1
        }
        (frames, 16L)
      case 27 => // 8-bit A-law
        var i = 0
        while (i < len) {
          val x = (b(off + i) ^ 0x55) & 0xFF
          val seg = (x & 0x70) >> 4
          val man = x & 0xF
          val mag = if (seg == 0) (man << 4) + 8 else ((man << 4) + 0x108) << (seg - 1)
          val s = if ((x & 0x80) != 0) mag.toLong else -mag.toLong
          if (math.abs(s) > peak) peak = math.abs(s)
          sumSq += s.toDouble * s.toDouble
          i += 1
        }
        (len, 8L)
      case _ => throw new IllegalArgumentException(s"unsupported AU encoding $enc")
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    WavFeature(id, rate.toLong, 1L, bits, n.toLong, n.toLong * 1000L / rate, peak, rms)
  }

  /** Decode an AU media column (partition-local, no shuffle). */
  def extractAuFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.product[WavFeature]
    media.select(col("media_id"), col("media"))
      .map(row => decodeAu(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID µ-law AU per id: the square wave is synthesized in
    * the ENCODED domain — mantissa 1+(id mod 14), exponent id mod 4, sign
    * flipping every 8 samples — so the decoded amplitude is the closed form
    * ((man·8+132)·2^exp)−132 and RMS = peak = amplitude exactly. */
  private[graft] def syntheticAuBytes(id: Long): Array[Byte] = {
    val rate = 8000; val n = (400 + (id % 50) * 16).toInt
    val man = (1 + id % 14).toInt; val exp = (id % 4).toInt
    val out = new Array[Byte](24 + n)
    def put32(o: Int, v: Int): Unit = { out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte }
    out(0) = '.'; out(1) = 's'; out(2) = 'n'; out(3) = 'd'
    put32(4, 24); put32(8, n); put32(12, 1); put32(16, rate); put32(20, 1)
    var i = 0
    while (i < n) {
      val sign = if ((i / 8) % 2 == 0) 0 else 0x80
      out(24 + i) = (~(sign | (exp << 4) | man) & 0xFF).toByte
      i += 1
    }
    out
  }

  def syntheticAu(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticAuBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  /** Deterministic VALID A-law AU per id (encoding 27): mantissa id mod 16,
    * segment id mod 4, sign flipping every 8 samples — decoded amplitude is
    * the closed form (man·16)+8 for segment 0, ((man·16)+264)·2^(seg−1)
    * otherwise; RMS = peak = amplitude exactly. */
  private[graft] def syntheticAuAlawBytes(id: Long): Array[Byte] = {
    val rate = 8000; val n = (400 + (id % 50) * 16).toInt
    val man = (id % 16).toInt; val seg = (id % 4).toInt
    val out = new Array[Byte](24 + n)
    def put32(o: Int, v: Int): Unit = { out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte }
    out(0) = '.'; out(1) = 's'; out(2) = 'n'; out(3) = 'd'
    put32(4, 24); put32(8, n); put32(12, 27); put32(16, rate); put32(20, 1)
    var i = 0
    while (i < n) {
      val x = (if ((i / 8) % 2 == 0) 0x80 else 0x00) | (seg << 4) | man
      out(24 + i) = ((x ^ 0x55) & 0xFF).toByte
      i += 1
    }
    out
  }

  def syntheticAuAlaw(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticAuAlawBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // ------------------------------- real containers (MP4 / ISO-BMFF metadata)

  final case class Mp4Meta(media_id: Long, major_brand: String, timescale: Long,
                           duration_ms: Long, n_tracks: Long, video_tracks: Long,
                           audio_tracks: Long, width: Long, height: Long)

  private def be64(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (b(o + i) & 0xFF); i += 1 }
    v
  }

  /** REAL ISO-BMFF (MP4/MOV) container metadata probe: a big-endian box walk
    * — `ftyp` major brand, `moov/mvhd` (v0 and v1) movie timescale +
    * duration, per-`trak` `tkhd` 16.16 fixed-point dimensions and
    * `mdia/hdlr` handler types (`vide`/`soun`). This is the metadata-
    * inventory pass a media curation pipeline runs over compressed video at
    * scale — everything EXCEPT the perceptual bitstream decode, which stays
    * stubbed. DoS posture as the RIFF walks: 64-bit `largesize` handled in
    * Long space, nesting-depth and track caps, truncation rejected. */
  private[graft] def decodeMp4Meta(id: Long, b: Array[Byte]): Mp4Meta = {
    require(b != null && b.length >= 16, "not an ISO-BMFF file")
    var brand: String = null
    var timescale = 0L; var duration = -1L
    var nTracks = 0L; var vTracks = 0L; var aTracks = 0L
    var width = 0L; var height = 0L
    // per-trak carry: tkhd dims seen before hdlr tells us the handler type
    var trakW = 0L; var trakH = 0L; var trakHandler: String = null
    def closeTrak(): Unit = if (trakHandler != null || trakW > 0) {
      nTracks += 1
      if (trakHandler == "vide") {
        vTracks += 1
        if (width == 0) { width = trakW; height = trakH }
      } else if (trakHandler == "soun") aTracks += 1
      trakW = 0; trakH = 0; trakHandler = null
    }
    def walk(start: Long, end: Long, depth: Int): Unit = {
      require(depth <= 8, "box nesting too deep")
      var o = start
      while (o + 8 <= end) {
        val size32 = be32(b, o.toInt).toLong & 0xFFFFFFFFL
        val typ = new String(b, o.toInt + 4, 4, "US-ASCII")
        var hdr = 8L
        val size =
          if (size32 == 1L) { // 64-bit largesize
            require(o + 16 <= end, "truncated largesize box")
            hdr = 16L; be64(b, o.toInt + 8)
          } else if (size32 == 0L) end - o // box extends to end of enclosure
          else size32
        require(size >= hdr && o + size <= end, "truncated/invalid box")
        val body = o + hdr
        typ match {
          case "ftyp" =>
            require(size - hdr >= 8, "ftyp too short")
            brand = new String(b, body.toInt, 4, "US-ASCII")
          case "moov" | "mdia" | "minf" | "stbl" =>
            walk(body, o + size, depth + 1)
          case "trak" =>
            walk(body, o + size, depth + 1)
            closeTrak()
          case "mvhd" =>
            val v = b(body.toInt) & 0xFF
            if (v == 1) {
              require(size - hdr >= 32, "mvhd v1 too short")
              timescale = be32(b, body.toInt + 20).toLong & 0xFFFFFFFFL
              duration = be64(b, body.toInt + 24)
            } else {
              require(size - hdr >= 24, "mvhd v0 too short")
              timescale = be32(b, body.toInt + 12).toLong & 0xFFFFFFFFL
              duration = be32(b, body.toInt + 16).toLong & 0xFFFFFFFFL
            }
          case "tkhd" =>
            val v = b(body.toInt) & 0xFF
            val dimOff = if (v == 1) 88 else 76 // v1 has three 64-bit times
            require(size - hdr >= dimOff + 8, "tkhd too short")
            trakW = (be32(b, body.toInt + dimOff).toLong & 0xFFFFFFFFL) >> 16
            trakH = (be32(b, body.toInt + dimOff + 4).toLong & 0xFFFFFFFFL) >> 16
          case "hdlr" =>
            require(size - hdr >= 12, "hdlr too short")
            trakHandler = new String(b, body.toInt + 8, 4, "US-ASCII")
          case _ => // skip leaf boxes we don't interpret (mdat, free, …)
        }
        o += size
      }
    }
    walk(0L, b.length.toLong, 0)
    require(brand != null, "missing ftyp box")
    require(timescale > 0 && duration >= 0, "missing/invalid mvhd")
    require(nTracks <= 64, "unsupported track count")
    Mp4Meta(id, brand, timescale, duration * 1000L / timescale,
      nTracks, vTracks, aTracks, width, height)
  }

  /** Probe an MP4 media column for container metadata (partition-local). */
  def extractMp4Meta(media: DataFrame): DataFrame = {
    val enc = Encoders.product[Mp4Meta]
    media.select(col("media_id"), col("media"))
      .map(row => decodeMp4Meta(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID minimal MP4 per id: `ftyp(isom)` + `moov` holding a
    * v0 `mvhd` (timescale 600, duration 3000 + (id mod 100)·150 — divisible
    * by 3, so duration_ms = duration·5/3 is exact in Long math) and two
    * `trak`s: a video track whose `tkhd` carries 16.16 fixed dims
    * (64 + (id mod 32)·16) × (48 + (id mod 24)·16) and `hdlr` 'vide', and an
    * audio track with `hdlr` 'soun'. Every probed field is closed-form. */
  private[graft] def syntheticMp4Bytes(id: Long): Array[Byte] = {
    val timescale = 600
    val duration = (3000 + (id % 100) * 150).toInt
    val w = (64 + (id % 32) * 16).toInt
    val h = (48 + (id % 24) * 16).toInt
    val out = new Array[Byte](20 + 8 + 108 + 2 * 173)
    var o = 0
    def put32(v: Int): Unit = { out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte; o += 4 }
    def putAscii(s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, o); o += s.length }
    def skip(n: Int): Unit = o += n
    put32(20); putAscii("ftyp"); putAscii("isom"); put32(0); putAscii("isom")
    put32(8 + 108 + 2 * 173); putAscii("moov")
    put32(108); putAscii("mvhd"); put32(0)            // version 0 + flags
    put32(0); put32(0)                                // ctime, mtime
    put32(timescale); put32(duration)
    put32(0x00010000); skip(2 + 10)                   // rate, volume+reserved
    skip(36 + 24)                                     // matrix, predefined
    put32(3)                                          // next track id
    def trak(handler: String, tw: Int, th: Int, trackId: Int): Unit = {
      put32(173); putAscii("trak")
      put32(92); putAscii("tkhd"); put32(7)           // v0, enabled flags
      put32(0); put32(0); put32(trackId); put32(0)    // ctime mtime id rsvd
      put32(duration); skip(8)                        // duration, reserved
      skip(2 + 2 + 2 + 2 + 36)                        // layer/group/vol/rsvd/matrix
      put32(tw << 16); put32(th << 16)                // 16.16 fixed dims
      put32(73); putAscii("mdia")
      put32(32); putAscii("mdhd"); put32(0)
      put32(0); put32(0); put32(timescale); put32(duration)
      skip(2 + 2)                                     // language, predefined
      put32(33); putAscii("hdlr"); put32(0)
      put32(0); putAscii(handler); skip(12); skip(1)  // predefined, type, rsvd, ""
    }
    trak("vide", w, h, 1)
    trak("soun", 0, 0, 2)
    require(o == out.length, s"mp4 layout bug: wrote $o of ${out.length}")
    out
  }

  def syntheticMp4(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticMp4Bytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // ------------------------------ real containers (Ogg Vorbis metadata)

  final case class OggMeta(media_id: Long, sample_rate: Long, channels: Long,
                           n_pages: Long, granule: Long, duration_ms: Long)

  // Ogg page CRC: polynomial 0x04c11db7, MSB-first (non-reflected), init 0,
  // no final XOR — computed over the whole page with the CRC field zeroed
  // (RFC 3533 §6). Table built once per JVM.
  private lazy val oggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) { r = (r << 1) ^ (if ((r & 0x80000000) != 0) 0x04c11db7 else 0); k += 1 }
      t(i) = r
      i += 1
    }
    t
  }
  private[graft] def oggCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var r = 0
    var i = 0
    while (i < len) { r = (r << 8) ^ oggCrcTable(((r >>> 24) ^ (b(off + i) & 0xFF)) & 0xFF); i += 1 }
    r
  }

  /** Page CRC with the 4 CRC-field bytes (page offsets 22-25) read as zero —
    * no mutation of the caller's buffer (the earlier zero-restore dance was
    * unsafe against concurrent readers of a shared byte array). */
  private def oggPageCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var r = 0
    var i = 0
    while (i < len) {
      val byte = if (i >= 22 && i <= 25) 0 else b(off + i) & 0xFF
      r = (r << 8) ^ oggCrcTable(((r >>> 24) ^ byte) & 0xFF)
      i += 1
    }
    r
  }

  /** REAL Ogg container probe (RFC 3533 page walk with MANDATORY per-page
    * CRC verification) + Vorbis identification-header parse: sample rate and
    * channel count from the BOS page's `vorbis` packet, duration from
    * the final page's granule position (PCM sample count for Vorbis). The
    * compressed-audio inventory pass — everything except the MDCT bitstream
    * decode. Caps: page count ≤ 65536, Long-space payload bounds. */
  private[graft] def decodeOggMeta(id: Long, b: Array[Byte]): OggMeta = {
    require(b != null && b.length >= 58, "not an Ogg file")
    var o = 0
    var rate = 0L; var channels = 0L; var granule = 0L; var pages = 0L
    var sawBos = false; var sawEos = false
    while (o + 27 <= b.length) {
      require(b(o) == 'O' && b(o + 1) == 'g' && b(o + 2) == 'g' && b(o + 3) == 'S',
        "bad Ogg capture pattern")
      require(b(o + 4) == 0, "unsupported Ogg version")
      require(!sawEos, "data after EOS page")
      val hdrType = b(o + 5) & 0xFF
      val nsegs = b(o + 26) & 0xFF
      require(o.toLong + 27 + nsegs <= b.length, "truncated segment table")
      var payload = 0
      var s = 0
      while (s < nsegs) { payload += b(o + 27 + s) & 0xFF; s += 1 }
      val pageLen = 27 + nsegs + payload
      require(o.toLong + pageLen <= b.length, "truncated Ogg page")
      // verify the page CRC: stored little-endian at offset 22, computed
      // with that field read as zero (no buffer mutation)
      val stored = le32(b, o + 22)
      require(oggPageCrc(b, o, pageLen) == stored, "Ogg page CRC mismatch")
      var g = 0L
      var i = 7
      while (i >= 0) { g = (g << 8) | (b(o + 6 + i) & 0xFF); i -= 1 } // LE granule
      if (g != -1L) granule = g // -1 marks pages with no finished packet
      if ((hdrType & 2) != 0) { // BOS: expect the Vorbis identification header
        require(!sawBos, "multiple BOS pages in a single-stream probe")
        sawBos = true
        val p = o + 27 + nsegs
        require(payload >= 30 && b(p) == 1 && new String(b, p + 1, 6, "US-ASCII") == "vorbis",
          "BOS page is not a Vorbis identification header")
        require(le32(b, p + 7) == 0, "unsupported Vorbis version")
        channels = b(p + 11) & 0xFF
        rate = le32(b, p + 12).toLong & 0xFFFFFFFFL
        require(channels > 0 && rate > 0, "invalid Vorbis channels/rate")
      }
      if ((hdrType & 4) != 0) sawEos = true
      pages += 1
      require(pages <= 65536, "unsupported page count")
      o += pageLen
    }
    require(o == b.length, "trailing garbage after the last Ogg page")
    require(sawBos && sawEos, "missing BOS/EOS page")
    OggMeta(id, rate, channels, pages, granule, granule * 1000L / rate)
  }

  /** Probe an Ogg media column for container metadata (partition-local). */
  def extractOggMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.product[OggMeta]
    media.select(col("media_id"), col("media"))
      .map(row => decodeOggMeta(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID 3-page Ogg Vorbis stream per id: a BOS page with a
    * real identification header (mono, rate 8000), a middle audio page with
    * a partial granule, and an EOS page whose granule is the closed form
    * 8000·(1 + id mod 30) + (id mod 8)·1000 — so duration_ms = granule/8
    * exactly. Every page carries a correct RFC 3533 CRC. */
  private[graft] def syntheticOggBytes(id: Long): Array[Byte] = {
    val rate = 8000
    val granule = 8000L * (1 + id % 30) + (id % 8) * 1000L
    def page(hdrType: Int, gran: Long, seq: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length <= 255, "single-segment synthetic pages only")
      val out = new Array[Byte](27 + 1 + payload.length)
      "OggS".getBytes("US-ASCII").copyToArray(out, 0)
      out(4) = 0; out(5) = hdrType.toByte
      var i = 0
      while (i < 8) { out(6 + i) = ((gran >> (8 * i)) & 0xFF).toByte; i += 1 }
      val serial = 0x6772_6674 // arbitrary but fixed stream serial
      out(14) = serial.toByte; out(15) = (serial >> 8).toByte
      out(16) = (serial >> 16).toByte; out(17) = (serial >> 24).toByte
      out(18) = seq.toByte; out(19) = (seq >> 8).toByte
      out(20) = (seq >> 16).toByte; out(21) = (seq >> 24).toByte
      out(26) = 1; out(27) = payload.length.toByte
      payload.copyToArray(out, 28)
      val crc = oggCrc(out, 0, out.length)
      out(22) = crc.toByte; out(23) = (crc >> 8).toByte
      out(24) = (crc >> 16).toByte; out(25) = (crc >> 24).toByte
      out
    }
    val ident = new Array[Byte](30)
    ident(0) = 1; "vorbis".getBytes("US-ASCII").copyToArray(ident, 1)
    // version 0 (bytes 7-10), channels 1, rate LE, bitrates 0, blocksizes,
    // framing bit
    ident(11) = 1
    ident(12) = rate.toByte; ident(13) = (rate >> 8).toByte
    ident(14) = (rate >> 16).toByte; ident(15) = (rate >> 24).toByte
    ident(28) = 0xB8.toByte // blocksizes 256/2048
    ident(29) = 1           // framing flag
    val audio = Array.tabulate[Byte](40 + (id % 16).toInt)(i => ((id + i * 7) % 256).toByte)
    page(2, -1L, 0, ident) ++
      page(0, granule / 2, 1, audio) ++
      page(4, granule, 2, audio.map(x => (x ^ 0x2A).toByte))
  }

  def syntheticOgg(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticOggBytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // ------------------------------------------------- MP3 frame-header walk

  final case class Mp3Meta(media_id: Long, sample_rate: Long, channels: Long,
                           bitrate_kbps: Long, n_frames: Long, duration_ms: Long,
                           vbr: Boolean)

  // MPEG-1 Layer III bitrate table (index 1–14, kbps) and sample-rate table
  // (index 0–2), per ISO/IEC 11172-3 §2.4.2.3.
  private val mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val mp3Rates = Array(44100, 48000, 32000)

  /** REAL MPEG audio frame walk (ISO/IEC 11172-3): skips a leading ID3v2 tag
    * (syncsafe size, optional footer) and a trailing ID3v1 block, then parses
    * every frame header — sync, version, layer, bitrate/sample-rate indices,
    * padding — and advances by the computed frame length, so VBR streams
    * census correctly (duration depends only on the frame count). The
    * compressed-audio inventory pass: everything except the polyphase/IMDCT
    * sample decode. Scope: MPEG-1 Layer III; caps: frame count ≤ 1 << 20,
    * Long-space length validation throughout. */
  private[graft] def decodeMp3Meta(id: Long, b: Array[Byte]): Mp3Meta = {
    require(b != null && b.length >= 4, "not an MPEG audio file")
    var o = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4); footer flag doubles the
    // 10-byte envelope (id3.org v2.4 §3.1)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      var sz = 0L
      var i = 0
      while (i < 4) {
        require((b(6 + i) & 0x80) == 0, "non-syncsafe ID3v2 size")
        sz = (sz << 7) | (b(6 + i) & 0x7F); i += 1
      }
      val envelope = if ((b(5) & 0x10) != 0) 20L else 10L
      require(envelope + sz <= b.length, "truncated ID3v2 tag")
      o = (envelope + sz).toInt
    }
    val end = b.length
    var frames = 0L; var rate = 0; var chans = 0L
    var brMin = Int.MaxValue; var brMax = 0
    // ID3v1 is recognised only when a frame boundary lands exactly 128
    // bytes before EOF with 'TAG' there — 'TAG' bytes INSIDE a frame of a
    // valid CBR stream (any payload can contain them) must not truncate
    // the walk (eager end-128 trimming broke such streams).
    while (o < end &&
        !(end - o == 128 && b(o) == 'T' && b(o + 1) == 'A' && b(o + 2) == 'G')) {
      require(o + 4 <= end, "truncated MPEG frame header")
      require((b(o) & 0xFF) == 0xFF && (b(o + 1) & 0xE0) == 0xE0, "lost MPEG sync")
      require(((b(o + 1) >> 3) & 3) == 3, "unsupported MPEG version (MPEG-1 only)")
      require(((b(o + 1) >> 1) & 3) == 1, "unsupported layer (Layer III only)")
      val bri = (b(o + 2) >> 4) & 0xF
      val sri = (b(o + 2) >> 2) & 3
      require(bri >= 1 && bri <= 14, "free-form/bad bitrate index")
      require(sri <= 2, "reserved sample-rate index")
      val kbps = mp3Bitrates(bri)
      val sr = mp3Rates(sri)
      val padding = (b(o + 2) >> 1) & 1
      val mode = (b(o + 3) >> 6) & 3
      val ch = if (mode == 3) 1L else 2L
      if (frames == 0L) { rate = sr; chans = ch }
      else require(sr == rate && ch == chans, "sample-rate/channel change mid-stream")
      brMin = math.min(brMin, kbps); brMax = math.max(brMax, kbps)
      // Layer III frame length: 144 * bitrate / samplerate + padding
      val flen = 144L * kbps * 1000L / sr + padding
      require(o + flen <= end, "truncated MPEG frame")
      o += flen.toInt
      frames += 1
      require(frames <= (1L << 20), "unsupported frame count")
    }
    require(frames > 0, "no MPEG frames")
    val durationMs = frames * 1152L * 1000L / rate // 1152 samples/frame, Layer III
    Mp3Meta(id, rate.toLong, chans, if (brMin == brMax) brMin.toLong else 0L,
      frames, durationMs, brMin != brMax)
  }

  /** Probe an MP3 media column for stream metadata (partition-local). */
  def extractMp3Meta(media: DataFrame): DataFrame = {
    val enc = Encoders.product[Mp3Meta]
    media.select(col("media_id"), col("media"))
      .map(row => decodeMp3Meta(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** Deterministic VALID MPEG-1 Layer III stream per id: an ID3v2 tag of
    * varying syncsafe size, 8 + id%40 CBR frames at 32 kHz (frame length
    * 4.5·kbps bytes — exact, no padding), bitrate 64/96/128/160 by id%4,
    * mono/stereo by id%2, and an ID3v1 trailer when id%3 == 0. Closed forms:
    * n_frames = 8 + id%40, duration_ms = n_frames·36. */
  private[graft] def syntheticMp3Bytes(id: Long): Array[Byte] = {
    val kbps = Array(64, 96, 128, 160)((id % 4).toInt)
    val bri = mp3Bitrates.indexOf(kbps)
    val nFrames = (8 + id % 40).toInt
    val flen = (144L * kbps * 1000L / 32000L).toInt
    val mono = id % 2 == 0
    val tagPayload = ((id % 11) * 7).toInt
    val id3v1 = id % 3 == 0
    val total = 10 + tagPayload + nFrames * flen + (if (id3v1) 128 else 0)
    val out = new Array[Byte](total)
    "ID3".getBytes("US-ASCII").copyToArray(out, 0)
    out(3) = 4 // v2.4.0, no flags
    out(6) = ((tagPayload >> 21) & 0x7F).toByte; out(7) = ((tagPayload >> 14) & 0x7F).toByte
    out(8) = ((tagPayload >> 7) & 0x7F).toByte; out(9) = (tagPayload & 0x7F).toByte
    var i = 0
    while (i < tagPayload) { out(10 + i) = ((id + i) % 128).toByte; i += 1 }
    var o = 10 + tagPayload
    var f = 0
    while (f < nFrames) {
      out(o) = 0xFF.toByte
      out(o + 1) = 0xFB.toByte                             // MPEG-1, Layer III, no CRC
      out(o + 2) = ((bri << 4) | (2 << 2)).toByte          // 32 kHz, no padding
      out(o + 3) = (if (mono) 0xC0 else 0x00).toByte       // mode
      i = 4
      while (i < flen) { out(o + i) = (0x80 | ((id + f + i) % 128)).toByte; i += 1 }
      o += flen
      f += 1
    }
    if (id3v1) { "TAG".getBytes("US-ASCII").copyToArray(out, o) }
    out
  }

  def syntheticMp3(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticMp3Bytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  // ------------------------------------- H.264 Annex-B NAL walk + SPS parse

  final case class H264Meta(media_id: Long, profile_idc: Long, level_idc: Long,
                            width: Long, height: Long, n_nals: Long,
                            n_idr: Long, n_frames: Long)

  /** RBSP bit reader with inline emulation-prevention removal (the 0x03
    * escape after two zero bytes — ITU-T H.264 §7.4.1.1). */
  private[graft] final class RbspReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    private var zeros = 0
    private def curByte: Int = {
      if (bit == 0 && zeros >= 2 && pos < end && b(pos) == 3) { pos += 1; zeros = 0 }
      require(pos < end, "RBSP overrun")
      b(pos) & 0xFF
    }
    def u1(): Int = {
      val v = (curByte >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { zeros = if ((b(pos) & 0xFF) == 0) zeros + 1 else 0; pos += 1; bit = 0 }
      v
    }
    def u(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | u1(); i += 1 }; v }
    /** Exp-Golomb ue(v) (§9.1). */
    def ue(): Int = {
      var lead = 0
      while (u1() == 0) { lead += 1; require(lead <= 31, "ue(v) overflow") }
      (1 << lead) - 1 + u(lead)
    }
    /** Signed Exp-Golomb se(v) (§9.1.1). */
    def se(): Int = { val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
  }

  /** REAL H.264 Annex-B probe (ITU-T H.264 §B.1, §7.3.2.1): start-code scan
    * (both 3- and 4-byte forms), per-NAL census, and a full Exp-Golomb
    * seq_parameter_set parse — profile/level, the high-profile chroma branch,
    * all three pic_order_cnt_type shapes, frame cropping with the correct
    * 4:2:0/4:2:2/4:4:4 crop units — yielding exact coded width/height.
    * Everything except the CABAC/CAVLC macroblock decode. */
  private[graft] def decodeH264Meta(id: Long, b: Array[Byte]): H264Meta = {
    require(b != null && b.length >= 5, "not an Annex-B H.264 stream")
    var profile = -1L; var level = -1L; var width = -1L; var height = -1L
    var nals = 0L; var idr = 0L; var slices = 0L
    var o = 0
    // locate the first start code; nothing may precede it
    require(b(0) == 0 && b(1) == 0 && (b(2) == 1 || (b(2) == 0 && b(3) == 1)),
      "missing leading start code")
    o = if (b(2) == 1) 3 else 4
    while (o < b.length) {
      // find the next start code (or end of stream) to bound this NAL
      var e = o
      var found = -1
      while (found < 0 && e + 2 < b.length) {
        if (b(e) == 0 && b(e + 1) == 0 && (b(e + 2) == 1 ||
            (b(e + 2) == 0 && e + 3 < b.length && b(e + 3) == 1))) found = e
        else e += 1
      }
      val nalEnd = if (found >= 0) found else b.length
      require(nalEnd > o, "empty NAL unit")
      val hdr = b(o) & 0xFF
      require((hdr & 0x80) == 0, "forbidden_zero_bit set")
      val nalType = hdr & 0x1F
      nals += 1
      require(nals <= 65536, "unsupported NAL count")
      nalType match {
        case 7 => // SPS
          val r = new RbspReader(b, o + 1, nalEnd)
          profile = r.u(8).toLong
          r.u(8) // constraint_set flags + reserved_zero_2bits
          level = r.u(8).toLong
          r.ue() // seq_parameter_set_id
          var chromaIdc = 1 // 4:2:0 default when the branch is absent
          if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
                .contains(profile.toInt)) {
            chromaIdc = r.ue()
            if (chromaIdc == 3) r.u1() // separate_colour_plane_flag
            r.ue(); r.ue()             // bit_depth_luma/chroma_minus8
            r.u1()                     // qpprime_y_zero_transform_bypass_flag
            if (r.u1() == 1) {         // seq_scaling_matrix_present_flag
              require(false, "scaling matrices unsupported in the probe")
            }
          }
          r.ue() // log2_max_frame_num_minus4
          r.ue() match {
            case 0 => r.ue() // log2_max_pic_order_cnt_lsb_minus4
            case 1 =>
              r.u1(); r.se(); r.se()
              val n = r.ue()
              var i = 0
              while (i < n) { r.se(); i += 1 }
            case _ => ()
          }
          r.ue() // max_num_ref_frames
          r.u1() // gaps_in_frame_num_value_allowed_flag
          val wMbs = r.ue() + 1
          val hUnits = r.ue() + 1
          val frameMbsOnly = r.u1()
          if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field_flag
          r.u1() // direct_8x8_inference_flag
          var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
          if (r.u1() == 1) { cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue() }
          val subW = if (chromaIdc == 3) 1 else 2
          val subH = if (chromaIdc == 1) 2 else 1
          val cropUnitX = if (chromaIdc == 0) 1 else subW
          val cropUnitY = (if (chromaIdc == 0) 1 else subH) * (2 - frameMbsOnly)
          width = 16L * wMbs - cropUnitX.toLong * (cropL + cropR)
          height = 16L * hUnits * (2 - frameMbsOnly) - cropUnitY.toLong * (cropT + cropB)
          require(width > 0 && height > 0, "cropping exceeds the coded size")
        case 5 => idr += 1; slices += 1
        case 1 => slices += 1
        case _ => () // PPS/SEI/AUD/filler: counted in the census only
      }
      o = if (found >= 0) (if (b(found + 2) == 1) found + 3 else found + 4) else b.length
    }
    require(profile >= 0, "no SPS in stream")
    require(slices > 0, "no coded slices")
    H264Meta(id, profile, level, width, height, nals, idr, slices)
  }

  /** Probe an H.264 media column for stream metadata (partition-local). */
  def extractH264Meta(media: DataFrame): DataFrame = {
    val enc = Encoders.product[H264Meta]
    media.select(col("media_id"), col("media"))
      .map(row => decodeH264Meta(row.getLong(0), row.get(1).asInstanceOf[Array[Byte]]))(enc)
      .toDF()
  }

  /** RBSP bit writer with ue(v) and the §7.4.1.1 emulation-prevention escape
    * (insert 0x03 after any 00 00 pair followed by a byte ≤ 3). */
  private[graft] final class RbspWriter {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u1(v: Int): Unit = bits += (v & 1)
    def u(n: Int, v: Int): Unit = { var i = n - 1; while (i >= 0) { u1(v >> i); i -= 1 } }
    def ue(v: Int): Unit = {
      val k = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(k)
      var i = 0
      while (i < n - 1) { u1(0); i += 1 }
      u(n, k)
    }
    def escaped(): Array[Byte] = {
      u1(1) // rbsp_stop_one_bit
      while (bits.length % 8 != 0) u1(0)
      val raw = bits.grouped(8).map(g => g.foldLeft(0)((a, x) => (a << 1) | x).toByte).toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var zeros = 0
      raw.foreach { byte =>
        if (zeros >= 2 && (byte & 0xFF) <= 3) { out += 3; zeros = 0 }
        out += byte
        zeros = if (byte == 0) zeros + 1 else 0
      }
      out.toArray
    }
  }

  /** Deterministic VALID Annex-B H.264 stream per id: a baseline-profile SPS
    * (4-byte start code) with closed-form dimensions — 4 + id%32 × 3 + id%24
    * macroblocks, frame-cropped when id%3 == 0 (right 1 + id%4, bottom id%2,
    * crop units 2 for 4:2:0) — a PPS, one IDR slice, and id%20 non-IDR
    * slices (3-byte start codes), payload bytes high-bit-set so no byte
    * sequence fakes a start code. */
  private[graft] def syntheticH264Bytes(id: Long): Array[Byte] = {
    val wMbs = (4 + id % 32).toInt
    val hMbs = (3 + id % 24).toInt
    val crop = id % 3 == 0
    val cropR = (1 + id % 4).toInt
    val cropB = (id % 2).toInt
    val w = new RbspWriter
    w.u(8, 66); w.u(8, 0); w.u(8, 30) // profile baseline, constraints 0, level 3.0
    w.ue(0)                            // seq_parameter_set_id
    w.ue(0)                            // log2_max_frame_num_minus4
    w.ue(2)                            // pic_order_cnt_type
    w.ue(1)                            // max_num_ref_frames
    w.u1(0)                            // gaps_in_frame_num_value_allowed_flag
    w.ue(wMbs - 1); w.ue(hMbs - 1)
    w.u1(1)                            // frame_mbs_only_flag
    w.u1(1)                            // direct_8x8_inference_flag
    if (crop) { w.u1(1); w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB) } else w.u1(0)
    w.u1(0)                            // vui_parameters_present_flag
    val sps = w.escaped()
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def nal(startLen: Int, hdr: Int, payload: Array[Byte]): Unit = {
      var i = 0
      while (i < startLen - 1) { out += 0; i += 1 }
      out += 1
      out += hdr.toByte // forbidden 0 | nal_ref_idc | nal_unit_type
      out ++= payload
    }
    def slicePayload(seed: Long): Array[Byte] =
      Array.tabulate[Byte](12 + (seed % 9).toInt)(i => (0x80 | ((seed + i * 11) % 128)).toByte)
    nal(4, 0x67, sps)
    nal(4, 0x68, Array(0xC8.toByte, 0x42.toByte)) // PPS payload (census only)
    nal(3, 0x65, slicePayload(id * 3 + 1))
    var f = 0
    while (f < (id % 20).toInt) { nal(3, 0x41, slicePayload(id * 7 + f)); f += 1 }
    out.toArray
  }

  def syntheticH264(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast(LongType))
      .map(r => (r.getLong(0), syntheticH264Bytes(r.getLong(0))))(enc)
      .toDF("media_id", "media")
  }

  /** Build a small synthetic media table from any table's rows (for tests
    * and benches — deterministic bytes derived from an id column). */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"),
        // deterministic pseudo-bytes: repeated sha2 of the id
        to_binary(repeat(sha2(col(idCol).cast(StringType), 256), 4), lit("hex")).as("media"),
        struct(lit("fake").as("format"), lit(8).as("width"), lit(8).as("height"),
          (col(idCol).cast(LongType) % 10000L).as("duration_ms")).as("meta"))
}
