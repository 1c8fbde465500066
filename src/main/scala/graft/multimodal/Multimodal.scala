package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs as partition-local batch functions so the
  * (expensive) decode step amortizes per batch and never shuffles raw
  * bytes more than once.
  *
  * IMAGE decode is REAL: `javax.imageio` (pure JDK — PNG/JPEG/GIF/BMP)
  * via [[decodeImageFeatures]] / [[resizeImage]], operating on raw
  * raster samples. Audio/video codecs don't exist in the JDK, so the
  * byte-level stand-ins (`stubDecodeFeatures`, `stubResize`) remain
  * for those modalities — same partition-local batched shape a
  * JNI/ONNX batch scorer would plug into.
  */
object Multimodal {

  // ImageIO's default stream cache backs every read/write with a TEMP
  // FILE — create+delete syscalls per image dwarf the actual decode at
  // thumbnail sizes (measured: the sf0.1 media gate spends most of its
  // ~9 s there). Memory-backed streams are strictly better for the
  // byte-array payloads this module handles.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Decoded-image feature row: true raster dimensions plus the
    * grid-pooled luminance features.
    */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           features: Array[Float])

  /** Encode an 8-bit grayscale image from a pixel function — the
    * deterministic generator for specs and gates. PNG is lossless, so
    * a decode returns exactly these samples and an oracle can
    * recompute everything downstream from the formula.
    */
  def synthGrayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ImageIO decode to a row-major band-mean sample grid. Raw RASTER
    * samples, not `getRGB` — getRGB routes gray images through a
    * linear→sRGB color-space conversion that gamma-shifts every value,
    * which would make decoded pixels differ from the encoded ones.
    * Multi-band (RGB) images collapse to floor((r+g+b)/bands).
    * Returns (width, height, samples).
    */
  def decodeSamples(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img0 != null, "payload is not a decodable image")
    // palette images (indexed GIF/PNG/BMP) store color-TABLE INDICES
    // in the raster — sampling those directly would return garbage, so
    // expand through the color model first
    val img =
      if (img0.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
        val rgb = new java.awt.image.BufferedImage(img0.getWidth,
          img0.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = rgb.createGraphics()
        try g.drawImage(img0, 0, 0, null) finally g.dispose()
        rgb
      } else img0
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    // color components only: an ARGB raster's alpha band is opacity,
    // not luminance, and averaging it in would skew every sample
    val bands = math.min(raster.getNumBands,
      img.getColorModel.getNumColorComponents)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0
        var b = 0
        while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
        out(y * w + x) = s / bands
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** REAL image decode + grid pooling: decode each payload with
    * ImageIO (partition-local — the codec instance and temp buffers
    * amortize per batch) and pool the luminance samples over a
    * gridH×gridW cell grid (cell mean, row-major). The float features
    * feed the same downstream ANN/dedup operators as text embeddings.
    */
  def decodeImageFeatures(media: Dataset[MediaRow], gridW: Int,
                          gridH: Int): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decodeSamples(r.payload)
        val feats = Array.tabulate(gridH * gridW) { k =>
          val (cy, cx) = (k / gridW, k % gridW)
          val (y0, y1) = (cy * h / gridH, (cy + 1) * h / gridH)
          val (x0, x1) = (cx * w / gridW, (cx + 1) * w / gridW)
          var s = 0L
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += px(y * w + x); n += 1; x += 1 }
            y += 1
          }
          if (n == 0) 0f else s.toFloat / n
        }
        ImageFeatures(r.media_id, w, h, feats)
      }
    }
  }

  /** REAL box-filter resize: decode, average each target pixel's
    * source block (floor of the integer mean — deterministic, no
    * rounding-mode ambiguity), re-encode as grayscale PNG with the
    * metadata dimensions updated. Partition-local; binary in, smaller
    * binary out, no shuffle — the same contract as the byte-level
    * stand-in, now with true pixels.
    */
  def resizeImage(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(outW > 0 && outH > 0, s"resize dims must be positive: ${outW}x$outH")
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decodeSamples(r.payload)
        val png = synthGrayPng(outW, outH, (tx, ty) => {
          val (y0, y1) = (ty * h / outH, math.max((ty + 1) * h / outH, ty * h / outH + 1))
          val (x0, x1) = (tx * w / outW, math.max((tx + 1) * w / outW, tx * w / outW + 1))
          var s = 0L
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += px(y * w + x); n += 1; x += 1 }
            y += 1
          }
          (s / n).toInt
        })
        r.copy(payload = png,
          meta = r.meta.copy(mime = "image/png", width = outW, height = outH))
      }
    }
  }

  /** Decoded pixel rendition for verification: the band-mean samples
    * as a "-"-joined row-major string (digesting PNG BYTES would pin
    * the encoder's compression choices, not the image).
    */
  def pixelStrings(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decodeSamples(r.payload)
        (r.media_id, w, h, px.mkString("-"))
      }
    }.toDF("media_id", "width", "height", "pixels")
  }

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
