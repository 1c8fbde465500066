package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs as partition-local batch functions so the
  * (expensive, native-library) decode step amortizes per batch and
  * never shuffles raw bytes more than once.
  *
  * The decode itself is STUBBED here (no media libraries in this
  * environment): `stubDecodeFeatures` produces a deterministic
  * fake feature vector from the payload bytes. The Spark-side shape —
  * schema, partition-local batching, feature column type — is real and
  * is what a production decoder (e.g. a JNI/ONNX batch scorer) would
  * plug into.
  */
object Multimodal {

  /** Typed media metadata carried beside the payload. */
  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, n_bytes: Int, features: Array[Float])

  /** Attach a metadata struct + payload (binary) to any id/bytes frame. */
  def asMediaTable(df: DataFrame, id: String, payload: String, mime: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      col(payload).cast("binary").as("payload"),
      struct(lit(mime).as("mime"), lit(0).as("width"), lit(0).as("height"),
        lit(0L).as("durationMs")).as("meta"))

  /** STUB decode: deterministic 8-dim "feature vector" from byte
    * statistics (sum/length per stride). A real implementation decodes
    * the payload with a native library here — per partition, batched —
    * and emits true embeddings; everything downstream (ANN, dedup,
    * joins over `features`) is unchanged.
    */
  def stubDecodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // partition-local "decoder session" would be initialized here once
      rows.map { r =>
        val bytes = r.payload
        val dims = 8
        val feats = Array.tabulate(dims) { d =>
          var s = 0L
          var i = d
          while (i < bytes.length) { s += (bytes(i) & 0xff); i += dims }
          (s % 1000).toFloat / 1000f
        }
        MediaFeatures(r.media_id, bytes.length, feats)
      }
    }
  }

  /** STUB resize: keep every `factor`-th byte of the payload — the
    * deterministic stand-in for an image/audio downsample. A real
    * implementation decodes, rescales, and re-encodes per partition;
    * the engine-side contract is identical: binary in, smaller binary
    * out, metadata preserved, no shuffle.
    */
  def stubResize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor > 0, s"resize factor must be positive: $factor")
    media.map { r =>
      val n = (r.payload.length + factor - 1) / factor
      r.copy(payload = Array.tabulate(n)(i => r.payload(i * factor)))
    }
  }

  /** Frame/segment sampling plumbing: split a payload into fixed-size
    * segments (stand-in for video frame extraction) — generator, no
    * shuffle; each segment row carries (media_id, seg_idx, seg_bytes).
    */
  def segmentPayload(media: DataFrame, segBytes: Int): DataFrame =
    media
      .withColumn("n_segs",
        ceil(octet_length(col("payload")).cast("double") / segBytes).cast("int"))
      .select(col("media_id"), col("meta"),
        // sequence(0, -1) would generate a DESCENDING range, so empty
        // payloads must short-circuit to an empty segment list
        posexplode(when(col("n_segs") > 0,
          transform(sequence(lit(0), col("n_segs") - 1),
            i => col("payload").substr(i * segBytes + 1, lit(segBytes))))
          .otherwise(array().cast("array<binary>")))
          .as(Seq("seg_idx", "seg_bytes")))
}
