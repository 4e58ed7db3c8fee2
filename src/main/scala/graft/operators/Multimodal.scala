package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, feature extraction as per-partition batch processing.
  *
  * The Spark-side shape is real — schema, partitioning, batch iteration —
  * while the actual media decode is STUBBED (`decodeStub`): this container
  * has no image/audio codecs, so the decoder is a deterministic fake with
  * the same signature a real one (JNI/FFmpeg/ImageIO) would have. Swap
  * `decodeStub` for a real decoder and nothing else changes.
  *
  * mapPartitions is the deliberate choice here (the one sanctioned use):
  * decoders are imperative, per-record native calls that want batch reuse of
  * a codec context — not expressible as catalyst expressions.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int, checksum: Long,
                           features: Array[Double])

  /** Attach a binary payload + typed metadata to each document. In
    * production the payload column comes straight from parquet; here it is
    * derived from text so the pipeline is runnable.
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_chars") % 1920).cast("int").as("width"),
        (col("n_chars") % 1080).cast("int").as("height")).as("meta"))

  /** Deterministic fake decode: a real implementation would decode the
    * payload (image/audio/video) and emit a fixed-length feature vector.
    * The fake folds bytes into a 16-bin histogram — stable, cheap, testable.
    */
  private def decodeStub(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) % 16) += 1.0
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    bins.map(_ / n)
  }

  /** Per-partition feature extraction over binary payloads. Partition count
    * governs decoder parallelism; each partition amortizes decoder setup
    * across its batch, exactly as a real codec context would.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Real pipeline: initialize the codec context once per partition here.
      it.map { r =>
        var crc = 17L
        var i = 0
        while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, r.kind, r.payload.length, crc, decodeStub(r.payload))
      }
    }
  }

  /** End-to-end: documents → binary media records → features. */
  def featurize(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val records = docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 1920).cast("int").as("width"),
      (col("n_chars") % 1080).cast("int").as("height")).as[MediaRecord]
    extractFeatures(records)
  }
}
