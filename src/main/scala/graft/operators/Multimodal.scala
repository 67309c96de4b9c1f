package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload with typed metadata — the multimodal column model:
  * binary payloads travel as parquet `binary` columns; decode/feature-extract
  * runs per-partition so decoder setup cost amortizes across a partition's
  * rows (the cluster-scale shape for image/audio/video feature extraction).
  */
final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int, feature_mean: Double)

object Multimodal {

  /** STUB — image/audio decode libraries are not available in this
    * environment, so the decode itself is a deterministic fake derived from
    * the payload bytes. The surrounding Spark plumbing (typed Dataset, binary
    * column, mapPartitions batch shape, schema) is real and tested; swap this
    * body for a real decoder (e.g. javax.imageio / ffmpeg bindings) on a
    * cluster that has them.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val n = payload.length
    (16 + n % 64, 16 + (n * 7) % 64, 1 + n % 8, (n % 1000) / 997.0)
  }

  /** Per-partition decode → typed features. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one decoder per partition, not per row
      it.map { r =>
        val (w, h, f, m) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, f, m)
      }
    }
  }

  /** documents.text re-encoded as an opaque binary payload — the stand-in for
    * an image/audio bytes column in the driver's testdata.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id"), lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload")).as[MediaRecord]
  }
}
