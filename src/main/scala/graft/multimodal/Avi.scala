package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Minimal AVI container codec, written from the public RIFF/AVI
  * format (Microsoft's `AVIMAINHEADER`/`BITMAPINFOHEADER` layouts):
  * `RIFF 'AVI '` → `LIST 'hdrl'` (`avih` main header + `strl` stream
  * list) → `LIST 'movi'` with one chunk per frame. Two frame codecs:
  *
  *  - `00db` — uncompressed 8-bit DIB frames (bottom-up rows padded
  *    to 4 bytes, grayscale palette): fully deterministic, so gates
  *    can verify decoded pixels against a closed-form oracle;
  *  - `00dc` — compressed frames, routed through
  *    [[Multimodal.decodeSamples]] (ImageIO: MJPEG/PNG payloads).
  *
  * The reference side of this comparison ingests media through
  * ffmpeg-style native libs; none exist in the sandbox, so the
  * container walk and DIB raster decode are implemented directly —
  * same executor-side batched shape, real bytes end to end.
  */
object Avi {

  private val Fps = 25 // microSecPerFrame default when synthesizing

  private def u32(b: ArrayBuffer[Byte], v: Long): Unit =
    (0 until 4).foreach(i => b += ((v >>> (8 * i)) & 0xff).toByte)
  private def u16(b: ArrayBuffer[Byte], v: Int): Unit =
    (0 until 2).foreach(i => b += ((v >>> (8 * i)) & 0xff).toByte)
  private def tag(b: ArrayBuffer[Byte], s: String): Unit =
    s.foreach(c => b += c.toByte)

  private def rowStride(w: Int): Int = (w + 3) / 4 * 4

  /** Encode top-down row-major 8-bit gray frames as an uncompressed
    * (`00db`) AVI — the deterministic generator for specs and gates.
    */
  def synthAviGray(w: Int, h: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.forall(_.length == w * h),
      s"avi: every frame must carry ${w * h} samples")
    val stride = rowStride(w)
    val frameBytes = stride * h

    val strf = ArrayBuffer.empty[Byte] // BITMAPINFOHEADER + gray palette
    u32(strf, 40); u32(strf, w); u32(strf, h)
    u16(strf, 1); u16(strf, 8) // planes, bits
    u32(strf, 0) // BI_RGB
    u32(strf, frameBytes); u32(strf, 0); u32(strf, 0)
    u32(strf, 256); u32(strf, 0)
    (0 until 256).foreach { g => strf += g.toByte += g.toByte += g.toByte += 0.toByte }

    val strh = ArrayBuffer.empty[Byte]
    tag(strh, "vids"); tag(strh, "DIB ")
    u32(strh, 0); u16(strh, 0); u16(strh, 0) // flags, priority, language
    u32(strh, 0) // initial frames
    u32(strh, 1); u32(strh, Fps) // scale, rate → Fps frames/sec
    u32(strh, 0); u32(strh, frames.length.toLong)
    u32(strh, frameBytes); u32(strh, 0xffffffffL) // buffer size, quality
    u32(strh, 0) // sample size
    u16(strh, 0); u16(strh, 0); u16(strh, w); u16(strh, h) // rcFrame

    val avih = ArrayBuffer.empty[Byte]
    u32(avih, 1000000L / Fps); u32(avih, frameBytes.toLong * Fps)
    // flags 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10) must
    // be OFF — advertising an index that doesn't exist breaks external
    // consumers that seek through it
    u32(avih, 0); u32(avih, 0)
    u32(avih, frames.length.toLong); u32(avih, 0)
    u32(avih, 1); u32(avih, frameBytes)
    u32(avih, w); u32(avih, h)
    (0 until 4).foreach(_ => u32(avih, 0))

    def chunk(id: String, body: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
      val b = ArrayBuffer.empty[Byte]
      tag(b, id); u32(b, body.length.toLong); b ++= body
      if (body.length % 2 == 1) b += 0.toByte
      b
    }
    def list(kind: String, body: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
      val inner = ArrayBuffer.empty[Byte]
      tag(inner, kind); inner ++= body
      chunk("LIST", inner)
    }

    val movi = ArrayBuffer.empty[Byte]
    frames.foreach { f =>
      val dib = ArrayBuffer.empty[Byte] // bottom-up padded rows
      var y = h - 1
      while (y >= 0) {
        var x = 0
        while (x < w) { dib += (f(y * w + x) & 0xff).toByte; x += 1 }
        while (x < stride) { dib += 0.toByte; x += 1 }
        y -= 1
      }
      movi ++= chunk("00db", dib)
    }

    val hdrl = chunk("avih", avih) ++ list("strl",
      chunk("strh", strh) ++ chunk("strf", strf))
    val riffBody = ArrayBuffer.empty[Byte]
    tag(riffBody, "AVI ")
    riffBody ++= list("hdrl", hdrl) ++= list("movi", movi)
    val out = ArrayBuffer.empty[Byte]
    tag(out, "RIFF"); u32(out, riffBody.length.toLong); out ++= riffBody
    out.toArray
  }

  /** Decoded video: dimensions from the main header plus top-down
    * row-major gray samples per frame.
    */
  final case class Video(width: Int, height: Int, microSecPerFrame: Long,
                         frames: Seq[Array[Int]])

  /** Walk the RIFF tree: `avih` for geometry, `movi` for frames —
    * `??db` decoded as bottom-up 8-bit DIB rasters, `??dc` through
    * ImageIO; `JUNK`/index/other chunks skipped.
    */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12 && new String(bytes, 0, 4, "ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "ASCII") == "AVI ",
      "payload is not a RIFF/AVI file")
    def le32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    var width = 0; var height = 0; var uspf = 0L
    // video-stream format (from the 'vids' stream's strf
    // BITMAPINFOHEADER): the raw-DIB branch below is only valid for
    // 8-bit uncompressed rasters — a 24-bpp file passes the size
    // check (3w·h > w·h) and would silently decode garbage pixels
    var vidsBits = -1
    var vidsCompression = -1L
    var lastStrhType = ""
    val frames = ArrayBuffer.empty[Array[Int]]

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = new String(bytes, pos, 4, "ASCII")
        val size32 = le32(pos + 4) // unsigned
        // Long arithmetic: a corrupt chunk declaring a size near 2³¹
        // must fail this check, not overflow past it
        require(pos + 8 + size32 <= to,
          s"avi: chunk $id overruns its parent")
        val size = size32.toInt
        if (id == "LIST") {
          require(size >= 4, s"avi: LIST chunk too short ($size bytes)")
          val kind = new String(bytes, pos + 8, 4, "ASCII")
          walk(pos + 12, pos + 8 + size, inMovi || kind == "movi")
        } else if (id == "avih") {
          require(size >= 40, s"avi: avih chunk too short ($size bytes)")
          uspf = le32(pos + 8)
          width = le32(pos + 8 + 32).toInt
          height = le32(pos + 8 + 36).toInt
        } else if (id == "strh") {
          require(size >= 4, s"avi: strh chunk too short ($size bytes)")
          lastStrhType = new String(bytes, pos + 8, 4, "ASCII")
        } else if (id == "strf" && lastStrhType == "vids") {
          require(size >= 20, s"avi: video strf too short ($size bytes)")
          vidsBits = ((bytes(pos + 8 + 14) & 0xff) |
            ((bytes(pos + 8 + 15) & 0xff) << 8))
          vidsCompression = le32(pos + 8 + 16)
        } else if (inMovi && id.length == 4 && id.endsWith("db")) {
          require(width > 0 && height > 0, "avi: frame before avih header")
          require(vidsBits == 8 && vidsCompression == 0L,
            s"avi: raw '??db' frames require an 8-bit BI_RGB video " +
              s"stream (strf says bits=$vidsBits compression=" +
              s"$vidsCompression) — decoding another depth as 8-bit " +
              "would produce silently wrong pixels")
          // same overflow class as the chunk walk: corrupt avih
          // dimensions make stride*height (and width*height) wrap Int,
          // so the raster-allocation product must be checked in Long
          // and the short-frame guard must run in Long. No arbitrary
          // size cap beyond that: a legitimate giant frame passes iff
          // the chunk really carries its bytes (bounded by the parent
          // walk, hence by the file length), while corrupt geometry
          // fails one of these two checks
          // 2^28 px ≈ 1 GiB of Int raster — far above any real frame,
          // low enough that a crafted giant-frame file is rejected
          // with a catchable error instead of an executor OOM
          require(width.toLong * height <= (1L << 28),
            s"avi: frame geometry ${width}x$height overflows the subset cap")
          val stride = rowStride(width)
          require(size >= stride.toLong * height, s"avi: short DIB frame ($size bytes)")
          val f = new Array[Int](width * height)
          var y = 0
          while (y < height) {
            val row = pos + 8 + (height - 1 - y) * stride // bottom-up
            var x = 0
            while (x < width) { f(y * width + x) = bytes(row + x) & 0xff; x += 1 }
            y += 1
          }
          frames += f
        } else if (inMovi && id.endsWith("dc") && size > 0) {
          require(width > 0 && height > 0, "avi: frame before avih header")
          val payload = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
          val (fw, fh, px) = Multimodal.decodeSamples(payload)
          require(fw == width && fh == height,
            s"avi: frame ${fw}x$fh disagrees with header ${width}x$height")
          frames += px
        }
        pos += 8 + size + (size & 1) // chunks pad to even boundaries
      }
    }
    walk(12, bytes.length, inMovi = false)
    require(frames.nonEmpty, "avi: no frames in movi list")
    Video(width, height, uspf, frames.toSeq)
  }
}
