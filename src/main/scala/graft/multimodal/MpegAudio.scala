package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** MPEG audio (MP3/MP2/MP1) FRAME walker, from the public ISO/IEC
  * 11172-3 / 13818-3 header layout: 32-bit frame headers carry
  * version, layer, bitrate, sample rate, channel mode and padding,
  * from which every frame's exact byte length follows — so a stream
  * splits into true frames (duration, bitrate profile, frame
  * sampling) with no decoder. Decoding a frame's audio to PCM needs
  * the subband/MDCT synthesis the JVM lacks; that remains the
  * documented stub boundary, same contract as [[Mp4]] vs H.264.
  *
  * Walk is resync-capable: bytes that aren't a valid header advance
  * one byte (ID3v2 tags are skipped structurally by their declared
  * size), matching how real decoders find frame boundaries in
  * dirty streams.
  */
object MpegAudio {

  /** One frame: exact byte range + everything its header declares. */
  final case class Frame(offset: Int, size: Int, version: String, layer: Int,
                        bitrateKbps: Int, sampleRate: Int, channels: Int,
                        samplesPerFrame: Int) {
    def durationSec: Double = samplesPerFrame.toDouble / sampleRate
  }

  // bitrate table [kbps]: row = (versionIdx: 0 = MPEG1, 1 = MPEG2/2.5)
  // x (layer 1..3), column = 4-bit bitrate index 1..14
  private val bitrates: Map[(Int, Int), Array[Int]] = Map(
    (0, 1) -> Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2) -> Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3) -> Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1) -> Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2) -> Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3) -> Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))

  private val sampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  /** Parse one header at `p`; None when the 4 bytes aren't a valid,
    * fully-specified frame header.
    */
  private def headerAt(b: Array[Byte], p: Int): Option[Frame] = {
    if (p + 4 > b.length) return None
    val h = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None // 11-bit sync
    val verBits = (h >>> 19) & 0x3      // 0 = 2.5, 2 = 2, 3 = 1 (1 reserved)
    val layerBits = (h >>> 17) & 0x3    // 01 = III, 10 = II, 11 = I
    val brIdx = (h >>> 12) & 0xf
    val srIdx = (h >>> 10) & 0x3
    val padding = (h >>> 9) & 0x1
    val mode = (h >>> 6) & 0x3          // 3 = mono
    if (verBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 ||
      srIdx == 3) return None           // reserved / free-format / bad
    val layer = 4 - layerBits           // 1, 2, 3
    val mpeg1 = verBits == 3
    val bitrate = bitrates((if (mpeg1) 0 else 1, layer))(brIdx - 1)
    val rate = sampleRates(verBits)(srIdx)
    val (samples, size) = layer match {
      case 1 => (384, (12 * bitrate * 1000 / rate + padding) * 4)
      case 2 => (1152, 144 * bitrate * 1000 / rate + padding)
      case _ => // Layer III halves samples+size under MPEG2/2.5 (LSF)
        if (mpeg1) (1152, 144 * bitrate * 1000 / rate + padding)
        else (576, 72 * bitrate * 1000 / rate + padding)
    }
    val version = verBits match {
      case 3 => "1"; case 2 => "2"; case _ => "2.5"
    }
    Some(Frame(p, size, version, layer, bitrate, rate,
      if (mode == 3) 1 else 2, samples))
  }

  /** All frames of a stream: skips a leading ID3v2 tag by its declared
    * syncsafe size, then walks header-to-header, resyncing byte by
    * byte over garbage.
    */
  def frames(bytes: Array[Byte]): Vector[Frame] = {
    val out = ArrayBuffer.empty[Frame]
    var p = 0
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      p = 10 + size
      // footer flag (ID3v2.4 §3.1, tag byte 5 bit 4): the tag carries
      // a trailing 10-byte footer NOT counted in the syncsafe size.
      // v2.4-only — in v2.2/v2.3 that bit is undefined and must be
      // ignored (skipping 10 bytes there would land mid-frame and
      // silently drop the first frame on resync)
      if (bytes(3) >= 4 && (bytes(5) & 0x10) != 0) p += 10
    }
    while (p + 4 <= bytes.length) {
      headerAt(bytes, p) match {
        case Some(f) if f.size >= 4 && p + f.size <= bytes.length =>
          out += f; p += f.size
        case _ => p += 1 // resync
      }
    }
    out.toVector
  }

  /** Synthesize a valid MPEG1 Layer III frame sequence at the given
    * bitrates (44100 Hz, fill bytes = bitrate & 0xff) — the write half
    * for gate synthesis; the read side is additionally pinned against
    * the independent python-built fixtures.
    */
  def synthFrames(kbpsSeq: Seq[Int], mono: Boolean = true): Array[Byte] = {
    val brTable = bitrates((0, 3))
    kbpsSeq.flatMap { kbps =>
      val idx = brTable.indexOf(kbps)
      require(idx >= 0, s"not an MPEG1 Layer III bitrate: $kbps")
      val h = (0x7ffL << 21) | (3L << 19) | (1L << 17) | (1L << 16) |
        ((idx + 1).toLong << 12) | (0L << 10) |
        ((if (mono) 3L else 0L) << 6)
      val size = 144 * kbps * 1000 / 44100
      Array[Byte]((h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte,
        h.toByte) ++ Array.fill(size - 4)((kbps & 0xff).toByte)
    }.toArray
  }

  /** (seconds, meanBitrateKbps, sampleRate, channels, frameCount) of a
    * stream — the curation columns, computed from headers alone.
    */
  def meta(bytes: Array[Byte]): Option[(Double, Double, Int, Int, Int)] = {
    val fs = frames(bytes)
    if (fs.isEmpty) None
    else Some((fs.map(_.durationSec).sum,
      fs.map(_.bitrateKbps.toDouble).sum / fs.length,
      fs.head.sampleRate, fs.head.channels, fs.length))
  }
}
