package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

/** One media object: opaque binary payload + kind + typed metadata. */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
case class MediaDecoded(media_id: Long, kind: String, payload_len: Int,
    format: String, width: Int, height: Int, n_frames: Int)

/** Multimodal column plumbing for a training-data lake: image/audio/video
  * as opaque `binary` columns with typed metadata, decoded via a
  * per-partition batch decoder.
  *
  * The real decoder (libjpeg/ffmpeg-style) is not available in this
  * environment, so [[FakeDecoder]] derives deterministic dimensions from
  * the payload's MD5 — the Spark-side plumbing (binary schema, typed
  * Dataset boundary, mapPartitions batching, partition-parallel decode)
  * is real and tested, and the decode call is the single swap point.
  *
  * Scale notes: decode is a narrow mapPartitions (no shuffle); payload
  * bytes never cross an exchange — metadata extraction projects them
  * away before any aggregation. At 100 TB the decode stage is pure
  * map-side CPU, parallelized by input split.
  */
object MediaOps {

  /** Pluggable decoder; batch-oriented (whole partition iterator) so real
    * implementations can amortize native context setup per partition.
    */
  trait MediaDecoder extends Serializable {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaDecoded]
  }

  /** Deterministic stand-in for the real codec: dims from payload MD5. */
  object FakeDecoder extends MediaDecoder {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaDecoded] = {
      // one digest instance per partition, like a real codec context
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        def d(i: Int): Int = Integer.parseInt(hex.substring(i, i + 1), 16)
        MediaDecoded(
          r.media_id, r.kind, r.payload.length,
          format = r.kind match {
            case "image" => if (r.media_id % 3 == 0) "png" else "jpeg"
            case "video" => "mp4"
            case _ => "wav"
          },
          width = 16 + (d(0) * 16 + d(1)) * 4,
          height = 16 + (d(2) * 16 + d(3)) * 4,
          n_frames = if (r.kind == "video") 1 + d(4) % 8 else 1)
      }
    }
  }

  /** Derive an opaque media corpus from `documents`: payload = UTF-8
    * bytes (stand-in blobs), kind assigned deterministically.
    */
  def mediaCorpus(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 5 === 0, "video")
          .when(col("doc_id") % 5 === 1, "audio")
          .otherwise("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Decode stage: binary in, typed metadata out (payload projected away). */
  def decodeMeta(media: Dataset[MediaRow],
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decoder.decode(_))
  }

  /** Frame sampling: one row per sampled frame of each video, with a
    * deterministic frame fingerprint (generator over the frame count).
    */
  def sampleFrames(decoded: DataFrame): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
      .withColumn("frame_hash",
        md5(concat(col("media_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))))

  /** Aspect-preserving resize plan to a `target` bounding box (integer
    * letterbox math — the metadata half of a resize stage; the pixel
    * half lives behind the same decoder seam as [[FakeDecoder]]). Pure
    * per-row projection: no shuffle, stays in codegen.
    */
  def resizePlan(decoded: DataFrame, target: Int = 224): DataFrame =
    decoded
      .withColumn("rs_w",
        when(col("width") >= col("height"), lit(target))
          .otherwise(greatest(lit(1),
            expr(s"CAST(width AS BIGINT) * $target DIV height").cast("int"))))
      .withColumn("rs_h",
        when(col("width") >= col("height"),
          greatest(lit(1),
            expr(s"CAST(height AS BIGINT) * $target DIV width").cast("int")))
          .otherwise(lit(target)))

  /** Feature extraction: a deterministic 8-dim integer feature vector
    * per media object (exploded to rows — engine-portable shape). The
    * hash-derived values stand in for a real embedding model behind the
    * decoder seam; the plumbing (per-row derivation, no shuffle, narrow
    * output schema) is the production shape.
    */
  def extractFeatures(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("fh", md5(concat(col("media_id").cast("string"),
        lit(":"), col("format"))))
      .select(col("media_id"),
        explode(expr("sequence(0, 7)")).as("feat_idx"), col("fh"))
      .withColumn("feat_val",
        expr("locate(substr(fh, feat_idx + 1, 1), '0123456789abcdef') - 1"))
      .select("media_id", "feat_idx", "feat_val")
}
