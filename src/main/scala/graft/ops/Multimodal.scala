package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, decode/feature-extract as partition-local batch
 * transforms.
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * container): `fakeDecode` derives deterministic pseudo-features from the
 * bytes. Everything around it — schema, batching, partition-local execution,
 * frame sampling fan-out — is the real Spark plumbing a production decode
 * (swap `fakeDecode` for an opencv/ffmpeg call) would use unchanged.
 */
object Multimodal {

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

  /** Build a small synthetic media table from any table's rows (for tests
    * and benches — deterministic bytes derived from an id column). */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"),
        // deterministic pseudo-bytes: repeated sha2 of the id
        to_binary(repeat(sha2(col(idCol).cast(StringType), 256), 4), lit("hex")).as("media"),
        struct(lit("fake").as("format"), lit(8).as("width"), lit(8).as("height"),
          (col(idCol).cast(LongType) % 10000L).as("duration_ms")).as("meta"))
}
