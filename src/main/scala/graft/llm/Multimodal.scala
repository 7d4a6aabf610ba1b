package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed per-partition in bounded batches.
  *
  * Metadata decode is REAL: container headers carry their dimensions in
  * fixed-layout fields — PNG's IHDR chunk (width/height as big-endian
  * u32 at offsets 16/20, per the PNG spec §11.2.2), JPEG's SOF frame
  * segments (height/width as big-endian u16 behind a marker walk, per
  * ITU T.81 §B.2.2), GIF's logical screen descriptor (little-endian u16
  * at 6/8) — so [[parseDims]] reads them from the raw bytes with no
  * codec dependency. Full pixel decode (which WOULD need an image
  * library this container doesn't ship) is out of scope: everything a
  * metadata/filter/partition stage needs comes from the header.
  *
  * At 100 TB: payloads stay in their source files; only the columns a
  * stage needs are projected (parquet column pruning keeps the binary
  * column unread for metadata-only queries), and decode parallelism is
  * partition-level with no driver involvement — the `mapPartitions`
  * shape below (batch iterator in, batch iterator out, decoder state
  * per partition) is exactly the Pandas-UDF batch contract.
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
      lit("application/octet-stream").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Parse (width, height, mime) from an image container header, or None
    * for anything unrecognized/truncated. Pure JVM byte arithmetic:
    *  - PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    *    (length at 8, type "IHDR" at 12), width/height big-endian u32 at
    *    16/20.
    *  - JPEG: SOI (FF D8), then a marker walk — each non-standalone
    *    segment is FF <marker> <u16 len incl. itself>; dimensions live in
    *    the first SOFn segment (C0–CF minus C4/C8/CC): precision u8,
    *    height u16, width u16 at data offsets 0/1/3. The walk is needed
    *    because APPn/COM/DQT segments of arbitrary length precede SOF.
    *  - GIF: "GIF87a"/"GIF89a", then LITTLE-endian u16 width/height at
    *    6/8.
    *  - WEBP (extended/VP8X only): RIFF container fourccs, then the
    *    canvas size as (value−1) little-endian u24 fields — a third
    *    byte-order/width combination, all pinned by the golden-fixture
    *    spec.
    */
  def parseDims(b: Array[Byte]): Option[(Int, Int, String)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)

    if (b.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a) {
      if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some((be32(16), be32(20), "image/png"))
      else None
    } else if (b.length >= 10 &&
        (u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
          (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')) {
      Some((le16(6), le16(8), "image/gif"))
    } else if (b.length >= 30 &&
        u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'E' && u8(10) == 'B' && u8(11) == 'P' &&
        u8(12) == 'V' && u8(13) == 'P' && u8(14) == '8' && u8(15) == 'X') {
      // WEBP extended header: canvas (width-1, height-1) as LE u24 at
      // chunk-data offsets 4/7 (RIFF 12 + chunk header 8 + flags/reserved 4)
      def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      Some((1 + le24(24), 1 + le24(27), "image/webp"))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out: Option[(Int, Int, String)] = None
      var bad = false
      while (out.isEmpty && !bad && i + 3 < b.length) {
        if (u8(i) != 0xff) bad = true
        else {
          val m = u8(i + 1)
          // standalone markers (no length field): TEM, RSTn, another SOI
          if (m == 0x01 || (m >= 0xd0 && m <= 0xd7) || m == 0xd8) i += 2
          else if (m == 0xd9) bad = true // EOI before any SOF
          else {
            val len = be16(i + 2)
            if (len < 2) bad = true
            else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              // SOFn data: [precision u8][height u16][width u16]...
              if (i + 8 < b.length) out = Some((be16(i + 7), be16(i + 5), "image/jpeg"))
              else bad = true
            } else i += 2 + len
          }
        }
      }
      out
    } else None
  }

  /** Build a minimal-but-valid PNG header (signature + IHDR with a real
    * CRC32) followed by `body`. 33 header bytes; [[parseDims]] and any
    * standards-conforming reader agree on the dimensions. */
  def pngPayload(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(33 + body.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val chunk = java.nio.ByteBuffer.allocate(17)
    chunk.put("IHDR".getBytes("US-ASCII"))
    chunk.putInt(width).putInt(height)
    // bit depth 8, truecolor, deflate, adaptive filter, no interlace
    chunk.put(Array[Byte](8, 2, 0, 0, 0))
    val crc = new java.util.zip.CRC32
    crc.update(chunk.array())
    out.write(java.nio.ByteBuffer.allocate(4).putInt(13).array(), 0, 4)
    out.write(chunk.array(), 0, 17)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Build a minimal JPEG header — SOI, a JFIF APP0 (so the parser's
    * marker walk is actually exercised), and a grayscale baseline SOF0 —
    * followed by `body`. 33 header bytes, same as [[pngPayload]], which
    * keeps byte-length oracles uniform across kinds. */
  def jpegPayload(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33 + body.length)
    buf.put(Array[Byte](0xff.toByte, 0xd8.toByte))            // SOI
    buf.put(Array[Byte](0xff.toByte, 0xe0.toByte))            // APP0
    buf.putShort(16)                                          // len incl. itself
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)        // identifier
    buf.put(Array[Byte](1, 1, 0))                             // v1.1, no units
    buf.putShort(1).putShort(1)                               // density 1x1
    buf.put(Array[Byte](0, 0))                                // no thumbnail
    buf.put(Array[Byte](0xff.toByte, 0xc0.toByte))            // SOF0
    buf.putShort((8 + 3 * 1).toShort)                         // len: 1 component
    buf.put(8.toByte)                                         // precision
    buf.putShort(height.toShort).putShort(width.toShort)      // dims, BE
    buf.put(Array[Byte](1, 1, 0x11, 0))                       // 1 comp, 1:1, q0
    buf.put(body)
    buf.array()
  }

  /** Decode per-partition: real header parse ([[parseDims]]) for
    * dimensions and detected mime, md5 over the full payload for the
    * content hash. Unrecognized payloads keep their declared kind and
    * report -1 x -1 — absence is explicit, never synthesized. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // one decoder instance per partition (the Pandas-UDF batch shape)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val hash = digest.digest(r.payload).map("%02x".format(_)).mkString
        val (w, h, kind) = parseDims(r.payload).getOrElse((-1, -1, r.kind))
        DecodedMeta(
          media_id = r.media_id,
          kind = kind,
          byte_len = r.payload.length.toLong,
          width = w,
          height = h,
          content_hash = hash)
      }
    }
  }

  /** Frame-sample stub: emit every k-th byte offset as a "frame" marker —
    * the plumbing for video frame extraction (one row per sampled frame,
    * ordinal + offset), minus the codec (video containers don't expose
    * frames at fixed offsets the way PNG/JPEG expose dimensions). */
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
