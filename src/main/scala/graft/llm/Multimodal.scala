package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed per-partition in bounded batches.
  *
  * The decode step is STUBBED — no media libraries ship in this container —
  * with a deterministic fake decoder, but everything Spark-side is real:
  * the schema (binary + struct metadata), the partition-batched execution
  * shape (`mapPartitions` over a typed Dataset, one "decoder" per
  * partition, mirroring a Pandas-UDF batch), and the downstream columnar
  * metadata table.
  *
  * At 100 TB: payloads stay in their source files; only the columns a
  * stage needs are projected (parquet column pruning keeps the binary
  * column unread for metadata-only queries), and decode parallelism is
  * partition-level with no driver involvement.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMeta(media_id: Long, kind: String, byte_len: Long,
                         width: Int, height: Int, content_hash: String)

  /** Wrap a text table as a binary media table (test stand-in: the
    * documents fixture has no real media, so UTF-8 bytes play the blob). */
  def asMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image/fake").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** STUB decoder: a real implementation would hand `payload` to an image
    * codec here (???-equivalent); the fake derives width/height/hash
    * deterministically from the bytes so tests have stable oracles. The
    * mapPartitions shape — batch iterator in, batch iterator out, decoder
    * state per partition — is exactly what a codec-backed version needs. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "decoder" init would go here (one codec instance)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val hash = digest.digest(r.payload).map("%02x".format(_)).mkString
        DecodedMeta(
          media_id = r.media_id,
          kind = r.kind,
          byte_len = r.payload.length.toLong,
          width = (r.payload.length % 640) + 1,
          height = (r.payload.length % 480) + 1,
          content_hash = hash)
      }
    }
  }

  /** Frame-sample stub: emit every k-th byte offset as a "frame" marker —
    * the plumbing for video frame extraction (one row per sampled frame,
    * ordinal + offset), minus the codec. */
  def sampleFrames(media: Dataset[MediaRow], everyNBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      (0 until r.payload.length by everyNBytes).zipWithIndex.map {
        case (offset, ordinal) => (r.media_id, ordinal, offset.toLong)
      }
    }.toDF("media_id", "frame_ordinal", "byte_offset")
  }
}
