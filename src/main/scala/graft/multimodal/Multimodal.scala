package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media metadata extracted from an opaque binary payload. The decode step
  * is a clearly-marked deterministic STUB (no image/audio codecs in this
  * container); everything Spark-side — schema, batched per-partition
  * processing, column pruning, typed output — is real and is what matters
  * at 100 TB: the codec is a per-row pure function swapped in behind
  * [[MediaDecoder.decode]]. */
final case class MediaMeta(
    doc_id: Long,
    media_kind: String, // image | audio | video
    n_bytes: Long,
    width: Long, // image/video: pixels; audio: 0
    height: Long,
    frames: Long, // video frame-sample count; image: 1; audio: 0
    sample_rate: Long, // audio only
    checksum: String)

/** Decoder front: payloads [[RealMedia]] can parse (uncompressed BMP, PCM
  * WAV, PNG, GIF, baseline grayscale JPEG, the MP4 box tree, MP3 frame
  * headers) decode FOR REAL; everything else falls back to the
  * deterministic stub below, which now stands in only for DSP payload
  * decode and non-baseline image modes (no codec libraries in this
  * container). A production deployment extends the same seam with real
  * codecs (javax.imageio / ffmpeg bindings); the call shape (batch
  * iterator in, metadata out, per-partition decoder state) is unchanged —
  * [[RealMedia]] is the proof the seam carries real decoders. */
object MediaDecoder {
  def decode(kind: String, payload: Array[Byte]): (Long, Long, Long, Long) =
    RealMedia.decode(payload) match {
      case Some(d) if d.container == "wav" || d.container == "mp3" =>
        (0L, 0L, 0L, d.sampleRate)
      case Some(d) if d.container == "mp4" => (d.width, d.height, d.nSamples, 0L)
      case Some(d)                         => (d.width, d.height, 1L, 0L) // bmp | png | gif | jpeg
      case None =>
        val n = payload.length.toLong
        kind match {
          case "image" => (64 + n % 512, 64 + (n * 7) % 512, 1L, 0L)
          case "video" => (64 + n % 512, 64 + (n * 7) % 512, 1 + n % 24, 0L)
          case _       => (0L, 0L, 0L, 8000 + (n % 5) * 8000) // audio
        }
    }
}

/** One sampled video frame: deterministic fingerprint standing in for the
  * decoded frame bytes, plus aspect-preserving resize dimensions. */
final case class FrameRow(doc_id: Long, frame_idx: Long, frame_fp: String,
    out_w: Long, out_h: Long)

object Multimodal {

  /** Shared per-partition fingerprint idiom: one MessageDigest reused across
    * the batch, hex-encoded — both oracle-checked fingerprints (media
    * checksum, frame fp) go through this single definition so the encoding
    * can never drift between them. */
  private def hexMd5(digest: java.security.MessageDigest, parts: Array[Byte]*): String = {
    digest.reset()
    parts.foreach(digest.update)
    digest.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  def kindFor(docId: Long): String = (docId % 3) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }

  /** Batched metadata extraction over (doc_id, payload BINARY) rows. One
    * decoder per partition (mapPartitions), checksum via codegen'd md5. */
  def extractMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder state would be initialized here (reused
        // across the batch, like the PDF WorkBuffers)
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, kind, payload) =>
          val (w, h, f, sr) = MediaDecoder.decode(kind, payload)
          MediaMeta(id, kind, payload.length.toLong, w, h, f, sr, hexMd5(digest, payload))
        }
      }
  }

  /** Frame sampling + resize metadata over video payloads: every `everyNth`
    * frame index from the (stub) decoder, a deterministic frame fingerprint
    * standing in for decoded frame bytes, and aspect-preserving integer
    * resize arithmetic toward `targetW`. One flatMap explode — the real
    * 100 TB shape: a video row fans out to its sampled-frame rows inside
    * the scan's map (per-partition decoder state), and every downstream op
    * is a per-frame row, never a driver-side loop. A production deployment
    * swaps the fingerprint for actual decoded/resized frame bytes behind
    * the same row shape. */
  def sampleFrames(media: DataFrame, everyNth: Int = 4, targetW: Long = 224): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, kind, payload) =>
          if (kind != "video") Iterator.empty
          else {
            val (w, h, frames, _) = MediaDecoder.decode(kind, payload)
            val outW = math.min(w, targetW)
            val outH = h * outW / w
            (0L until frames by everyNth).iterator.map { i =>
              val fp = hexMd5(digest, payload,
                s":$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
              FrameRow(id, i, fp, outW, outH)
            }
          }
        }
      }
  }

  /** The documents table viewed as a multimodal corpus: text bytes standing
    * in for the media payload (deterministic fake), kind by doc_id. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, kindFor(id), text.getBytes(java.nio.charset.StandardCharsets.UTF_8)) }
      .toDF("doc_id", "kind", "payload")
  }
}
