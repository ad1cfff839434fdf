package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque BINARY
 * columns with typed metadata, processed in partition-local batches.
 *
 * The Spark-side mechanics — schema, batch iteration via mapPartitions,
 * deterministic partitioning by asset id, feature-array output shape — are
 * real and tested. The actual media decoding is STUBBED (this container
 * ships no image/audio codecs): `decodeStub` derives deterministic fake
 * features from the payload bytes. A production deployment replaces ONLY
 * the marked function body with a real decoder (e.g. javacv / a JNI
 * codec); every plan around it is unchanged.
 */
object Multimodal {

  /** Canonical asset schema: one row per media object. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Derive a deterministic fake asset table from any (id, text) table —
    * test/bench scaffolding standing in for a real object-store read. */
  def syntheticAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast(LongType), lit(3)) + 1).cast(IntegerType)).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      map(lit("source"), lit("synthetic"),
        lit("bytes"), length(encode(col(textCol), "UTF-8")).cast(StringType)).as("meta"))

  final case class AssetFeatures(
      asset_id: Long, modality: String,
      width: Int, height: Int, channels: Int,
      feature: Array[Float])

  /**
   * ======================= STUB — replace in production ===================
   * Deterministic fake "decode": width/height from unsigned-byte sums
   * (plain and position-weighted — simple integer math any engine can
   * replay for verification); feature vector = 8 moments of the byte
   * stream. A real implementation decodes the codec here and emits real
   * dimensions and an embedding. Everything outside this function is
   * production code.
   * ========================================================================
   */
  private def decodeStub(assetId: Long, modality: String, payload: Array[Byte]): AssetFeatures = {
    val n = if (payload == null) 0 else payload.length
    var bsum = 0L // Σ byte_i
    var wsum = 0L // Σ (i+1)·byte_i, 1-based positions
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xFF
      bsum += b
      wsum += (i + 1).toLong * b
      i += 1
    }
    val feat = new Array[Float](8)
    i = 0
    while (i < n) { feat(i % 8) += (payload(i) & 0xFF) / 255.0f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { feat(j) = feat(j) / n * 8; j += 1 } }
    AssetFeatures(assetId, modality,
      width = (bsum % 1024).toInt + 1,
      height = (wsum % 768).toInt + 1,
      channels = if (modality == "audio") 1 else 3,
      feature = feat)
  }

  /**
   * Batched feature extraction: partition-local iteration (the Scala
   * analogue of `mapInPandas` — each partition's rows stream through the
   * decoder without collecting to the driver). Input must have
   * [[assetSchema]] columns; output is (asset_id, modality, width, height,
   * channels, feature ARRAY<FLOAT>).
   */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[AssetFeatures] = assets
      .select(col("asset_id"), col("modality"), col("payload"))
      .repartition(col("asset_id")) // co-locate by id: retries stay deterministic
      .mapPartitions { rows: Iterator[Row] =>
        // batch shape: grouped(64) mirrors arrow-batch processing — a real
        // decoder would reuse codec state across a batch.
        rows.grouped(64).flatMap { batch =>
          batch.iterator.map { r =>
            decodeStub(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
          }
        }
      }
    out.toDF()
  }

  /** Video frame sampling stub: split the payload into fixed-size BINARY
    * chunks ("frames") and keep every `stride`-th — the plumbing (binary
    * slices, exploded frame rows) is the real shape a decoder would fill. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast(IntegerType)
    assets.where(col("modality") === "video")
      .select(col("asset_id"),
        posexplode(filter(
          transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
            i => when(pmod(i, lit(stride)) === 0,
              col("payload").substr(lit(1) + i * frameBytes, lit(frameBytes)))
              .otherwise(lit(null))),
          x => x.isNotNull)))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
  }
}
