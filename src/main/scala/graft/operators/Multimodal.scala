package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + content-type discriminator +
  * string metadata, mirroring the engine's record-batch model (payload BINARY
  * by design, properties as the typed-metadata side channel). */
final case class MediaRecord(
    media_id: Long,
    content_type: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Extracted (stub-decoded) features for one media payload. */
final case class MediaFeatures(
    media_id: Long,
    content_type: String,
    n_bytes: Long,
    width: Long,       // images/video: fake-decoded dimensions
    height: Long,
    duration_ms: Long, // audio/video
    checksum: Long)

/** Multimodal-column operators: images/audio/video as opaque BINARY columns
  * with typed metadata, decoded/feature-extracted in distributed batches.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this build): it derives fake dimensions from the byte length.
  * Everything around it — the schema, the typed Dataset plumbing, the
  * mapPartitions batch shape (one decoder instance per partition, streaming
  * iterator, no per-row setup), partition sizing — is the real 100 TB design:
  * swap `stubDecode` for a JNI/FFmpeg call and nothing else changes.
  */
object Multimodal {

  /** STUB decoder: deterministic fake feature extraction from payload bytes.
    * A real deployment decodes here (libjpeg/ffmpeg/...); the arithmetic is
    * fixed so results are reproducible and oracle-checkable. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val n = if (r.payload == null) 0L else r.payload.length.toLong
    val isVisual = r.content_type.startsWith("image/") || r.content_type.startsWith("video/")
    val isTimed = r.content_type.startsWith("audio/") || r.content_type.startsWith("video/")
    MediaFeatures(
      media_id = r.media_id,
      content_type = r.content_type,
      n_bytes = n,
      width = if (isVisual) n % 640 + 16 else 0L,
      height = if (isVisual) (n * 7) % 480 + 16 else 0L,
      duration_ms = if (isTimed) n % 10000 else 0L,
      checksum = if (n == 0) 0L
        else (r.payload.head & 0xffL) * 256 + (r.payload.last & 0xffL))
  }

  /** Distributed decode: one decoder per partition, streaming through the
    * iterator (the Scala analogue of a Pandas-UDF `mapInPandas` batch). */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup would go here (real codecs are stateful)
      it.map(stubDecode)
    }
  }

  /** Frame sampling for video payloads: every `step`-th frame index of a
    * fake-decoded frame count (n_bytes mod 30 frames), exploded to one row
    * per sampled frame — the batch shape a real frame extractor produces. */
  def sampleFrames(features: Dataset[MediaFeatures], step: Int = 5): DataFrame = {
    import features.sparkSession.implicits._
    features.toDF()
      .where(col("content_type").startsWith("video/"))
      .withColumn("n_frames", col("n_bytes") % 30)
      .where(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong))).as("frame_idx"))
  }

  /** Wrap a text/metadata DataFrame as media records (content-type routed by
    * id — the shape of a crawl table where payloads arrive as raw bytes). */
  def fromDocuments(spark: SparkSession, docs: DataFrame,
                    idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col(idCol) % 3 + 1).cast("int")).as("content_type"),
      col(textCol).cast("binary").as("payload"),
      map(lit("origin"), lit("documents")).as("meta"))
      .as[MediaRecord]
  }
}
