package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq((1L, "hello world payload"), (2L, "tiny"), (3L, ""))
      .toDF("id", "body")
  }

  test("asMediaTable produces binary payload + typed metadata") {
    val m = Multimodal.asMediaTable(media, "id", "body", "text/plain")
    val r = m.where(col("media_id") === 1L).collect()(0)
    assert(r.getAs[Array[Byte]]("payload").length === 19)
    assert(r.getStruct(r.fieldIndex("meta")).getAs[String]("mime") === "text/plain")
  }

  test("stubDecodeFeatures emits deterministic fixed-dim features") {
    import spark.implicits._
    val ds = Multimodal.asMediaTable(media, "id", "body", "text/plain")
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.stubDecodeFeatures(ds).collect().sortBy(_.media_id)
    val f2 = Multimodal.stubDecodeFeatures(ds).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 8))
    assert(f1(0).n_bytes === 19)
    assert(f1(2).n_bytes === 0)
  }

  test("stubResize keeps every k-th byte and preserves metadata") {
    import spark.implicits._
    val ds = Multimodal.asMediaTable(media, "id", "body", "text/plain")
      .as[Multimodal.MediaRow]
    val r = Multimodal.stubResize(ds, factor = 4).collect()
      .map(m => m.media_id -> m).toMap
    // "hello world payload" → indices 0,4,8,12,16 → "horpo"
    assert(new String(r(1L).payload, "UTF-8") === "horpo")
    assert(new String(r(2L).payload, "UTF-8") === "t")
    assert(r(3L).payload.length === 0)
    assert(r(1L).meta.mime === "text/plain")
  }

  test("PNG round-trip: decodeSamples returns the exact encoded pixels " +
    "(raw raster, no getRGB gamma shift)") {
    val png = Multimodal.synthGrayPng(8, 8, (x, y) => (y * 8 + x) * 3 % 256)
    val (w, h, px) = Multimodal.decodeSamples(png)
    assert(w === 8 && h === 8)
    assert(px.toSeq === (0 until 64).map(i => i * 3 % 256))
    // the gamma pitfall this guards: getRGB on a gray image would map
    // 100 to a different sRGB value; raw samples must be identity
    assert(px(0) === 0 && px(33) === 33 * 3 % 256)
  }

  test("decodeImageFeatures pools REAL decoded pixels into grid-cell means") {
    import spark.implicits._
    val ids = Seq(7L, 42L)
    val ds = ids.toDF("id").as[Long].map { id =>
      Multimodal.MediaRow(id,
        Multimodal.synthGrayPng(8, 8, (x, y) => ((id * 31 + y * 8 + x) % 256).toInt),
        Multimodal.MediaMeta("image/png", 8, 8, 0L))
    }
    val feats = Multimodal.decodeImageFeatures(ds, gridW = 4, gridH = 2)
      .collect().map(f => f.media_id -> f).toMap
    for (id <- ids) {
      assert(feats(id).width === 8 && feats(id).height === 8)
      val expected = Array.tabulate(8) { k =>
        val (cy, cx) = (k / 4, k % 4)
        val vals = for (y <- cy * 4 until cy * 4 + 4; x <- cx * 2 until cx * 2 + 2)
          yield ((id * 31 + y * 8 + x) % 256).toInt
        vals.sum.toFloat / 8
      }
      assert(feats(id).features.toSeq === expected.toSeq)
    }
  }

  test("resizeImage box-filters decoded pixels (floor mean per 2x2 block)") {
    import spark.implicits._
    val ds = Seq(5L).toDF("id").as[Long].map { id =>
      Multimodal.MediaRow(id,
        Multimodal.synthGrayPng(8, 8, (x, y) => ((id * 31 + y * 8 + x) % 256).toInt),
        Multimodal.MediaMeta("image/png", 8, 8, 0L))
    }
    val out = Multimodal.resizeImage(ds, 4, 4).collect()(0)
    assert(out.meta.width === 4 && out.meta.height === 4)
    val (w, h, px) = Multimodal.decodeSamples(out.payload)
    assert(w === 4 && h === 4)
    def v(x: Int, y: Int) = ((5L * 31 + y * 8 + x) % 256).toInt
    val expected = for (ty <- 0 until 4; tx <- 0 until 4) yield
      (v(tx * 2, ty * 2) + v(tx * 2 + 1, ty * 2) +
        v(tx * 2, ty * 2 + 1) + v(tx * 2 + 1, ty * 2 + 1)) / 4
    assert(px.toSeq === expected)
  }

  test("JPEG decode works through the same path (lossy: dims exact, " +
    "values plausible)") {
    // a flat mid-gray RGB JPEG: encode via ImageIO, decode via
    // decodeSamples — bands collapse by mean; JPEG is lossy so assert
    // proximity, not equality
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(120, 120, 120))
    g.fillRect(0, 0, 16, 8)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val (w, h, px) = Multimodal.decodeSamples(bos.toByteArray)
    assert(w === 16 && h === 8)
    assert(px.forall(p => math.abs(p - 120) <= 4), s"lossy drift too big: ${px.max}/${px.min}")
  }

  test("palette and alpha images decode as colors, not indices/opacity") {
    // indexed PNG (kept as IndexColorModel by the JDK reader): raster
    // samples are color-TABLE indices — white is palette slot 215 in
    // the default palette — and decode must expand them to 255.
    // (PNG, not GIF: the JDK GIF codec itself corrupts the last row of
    // tiny images, verified against a pre-write all-white raster.)
    val idx = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val g1 = idx.createGraphics()
    g1.setColor(java.awt.Color.WHITE); g1.fillRect(0, 0, 4, 4); g1.dispose()
    assert(idx.getRaster.getSample(0, 0, 0) !== 255) // raw index ≠ color
    val b1 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(idx, "png", b1))
    val (_, _, px1) = Multimodal.decodeSamples(b1.toByteArray)
    assert(px1.forall(_ === 255), px1.toSeq.toString)
    // ARGB PNG: the alpha band is opacity, not luminance — a flat
    // (120,120,120,opaque) image must sample 120, not (3*120+255)/4
    val argb = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g2 = argb.createGraphics()
    g2.setColor(new java.awt.Color(120, 120, 120, 255))
    g2.fillRect(0, 0, 4, 4); g2.dispose()
    val b2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(argb, "png", b2))
    val (_, _, px2) = Multimodal.decodeSamples(b2.toByteArray)
    assert(px2.forall(_ === 120), px2.toSeq.toString)
  }

  test("segmentPayload splits payloads into fixed-size segments") {
    val segs = Multimodal.segmentPayload(
      Multimodal.asMediaTable(media, "id", "body", "text/plain"), segBytes = 8)
    val byId = segs.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === 3L) // 19 bytes → 8+8+3
    assert(byId(2L) === 1L)
    assert(byId.getOrElse(3L, 0L) === 0L) // empty payload → no segments
    val seg2 = segs.where(col("media_id") === 1L && col("seg_idx") === 2)
      .select(octet_length(col("seg_bytes"))).collect()(0).getInt(0)
    assert(seg2 === 3)
  }

  test("WAV round-trip: decodeWavSamples returns the exact encoded PCM, " +
    "skipping foreign RIFF chunks") {
    val samples = Array.tabulate(96)(i => (math.sin(i * 0.3) * 12000).toShort)
    val wav = Multimodal.synthWavPcm16(44100, 2, samples)
    val (rate, ch, back) = Multimodal.decodeWavSamples(wav)
    assert(rate === 44100 && ch === 2)
    assert(back.toSeq === samples.toSeq)
    // a LIST metadata chunk (odd size → pad byte) before data must be
    // skipped; rebuild the container with one inserted
    val b = java.nio.ByteBuffer.allocate(wav.length + 8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(wav, 0, 36) // RIFF..fmt chunk end
    b.put("LIST".getBytes("ASCII")).putInt(5).put("INFOx".getBytes("ASCII")).put(0.toByte)
    b.put(wav, 36, wav.length - 36)
    val (r2, c2, back2) = Multimodal.decodeWavSamples(b.array())
    assert(r2 === 44100 && c2 === 2 && back2.toSeq === samples.toSeq)
  }

  test("audio features are windowed RMS of the mono mix") {
    import spark.implicits._
    // constant amplitude A in window 0, silence in window 1 → RMS A, 0
    val samples = Array.tabulate(128)(i => if (i < 64) 500.toShort else 0.toShort)
    val ds = Seq(Multimodal.MediaRow(7L, Multimodal.synthWavPcm16(8000, 1, samples),
      Multimodal.MediaMeta("audio/wav", 0, 0, 16L))).toDS()
    val f = Multimodal.decodeAudioFeatures(ds, bins = 2).collect()(0)
    assert(f.sample_rate === 8000 && f.n_samples === 128)
    assert(f.features(0) === 500.0 && f.features(1) === 0.0)
    // stereo mono-mix: channels (100, -301) → floorDiv(-201, 2) = -101
    val st = Seq(Multimodal.MediaRow(8L,
      Multimodal.synthWavPcm16(8000, 2,
        Array.fill(32)(Seq(100.toShort, (-301).toShort)).flatten.toArray),
      Multimodal.MediaMeta("audio/wav", 0, 0, 4L))).toDS()
    val g = Multimodal.decodeAudioFeatures(st, bins = 1).collect()(0)
    assert(g.n_samples === 32 && g.features(0) === 101.0)
  }

  test("resampleAudio floor-means each block per channel and halves the rate") {
    import spark.implicits._
    val samples = Array[Short](10, 20, 31, -5, 7, -8)
    val ds = Seq(Multimodal.MediaRow(9L, Multimodal.synthWavPcm16(6000, 1, samples),
      Multimodal.MediaMeta("audio/wav", 0, 0, 1L))).toDS()
    val out = Multimodal.resampleAudio(ds, factor = 2).collect()(0)
    val (rate, ch, back) = Multimodal.decodeWavSamples(out.payload)
    assert(rate === 3000 && ch === 1)
    // floorDiv: (10+20)/2=15, (31-5)/2=13, (7-8)/2 = floor(-0.5) = -1
    assert(back.toSeq === Seq[Short](15, 13, -1))
    val ss = Multimodal.sampleStrings(Multimodal.resampleAudio(ds, 2)).collect()(0)
    assert(ss.getString(3) === "15-13--1")
  }

  test("AVI round-trip: decode returns the exact DIB frames (bottom-up " +
    "rows, 4-byte stride padding) and the header geometry") {
    // width 6 → stride 8 exercises row padding
    val frames = (0 until 3).map(f => Array.tabulate(6 * 5)(p => (f * 50 + p) % 256))
    val avi = Avi.synthAviGray(6, 5, frames)
    val v = Avi.decode(avi)
    assert(v.width === 6 && v.height === 5 && v.frames.length === 3)
    assert(v.microSecPerFrame === 40000L) // 25 fps
    v.frames.zip(frames).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("AVI raw frames at a non-8-bit depth refuse loudly") {
    // patch the written file's strf biBitCount to 24: a 24-bpp raw
    // stream must not be decoded as 8-bit gray (silently wrong pixels)
    val avi = Avi.synthAviGray(6, 5,
      Seq(Array.tabulate(30)(identity))).clone()
    val strfAt = {
      var i = -1
      (0 until avi.length - 4).find(p =>
        avi(p) == 's' && avi(p + 1) == 't' && avi(p + 2) == 'r' &&
          avi(p + 3) == 'f').foreach(i = _)
      i
    }
    assert(strfAt > 0)
    avi(strfAt + 8 + 14) = 24.toByte // biBitCount low byte
    val e = intercept[IllegalArgumentException](Avi.decode(avi))
    assert(e.getMessage.contains("8-bit"))
  }

  test("AVI with corrupt avih geometry fails cleanly, and the header " +
    "does not advertise an index it never writes") {
    val base = Avi.synthAviGray(4, 4, Seq(Array.fill(16)(0)))
    def fixLe32(arr: Array[Byte], pos: Int, v: Int): Unit = {
      val b = java.nio.ByteBuffer.wrap(arr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(pos, v)
    }
    val avih = base.indexOfSlice("avih".getBytes("ASCII"))
    assert(avih > 0)
    // flags word (avih body offset 12): no idx1 chunk exists, so
    // AVIF_HASINDEX (0x10) must be off
    val flags = java.nio.ByteBuffer.wrap(base)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(avih + 8 + 12)
    assert((flags & 0x10) === 0, f"AVIF_HASINDEX set in flags 0x$flags%x")
    // width/height chosen so stride*height wraps Int (2^33): the
    // short-frame guard must reject it, not overflow past it into an
    // array blow-up
    val corrupt = base.clone()
    fixLe32(corrupt, avih + 8 + 32, 0x20000) // width
    fixLe32(corrupt, avih + 8 + 36, 0x10000) // height
    val e = intercept[IllegalArgumentException](Avi.decode(corrupt))
    assert(e.getMessage.contains("overflows") || e.getMessage.contains("short DIB"))
  }

  test("AVI with MJPEG-style compressed frames decodes through ImageIO") {
    // hand-assemble a movi list whose frames are 00dc PNG payloads
    val px = Array.tabulate(16)(p => p * 16)
    val png = Multimodal.synthGrayPng(4, 4, (x, y) => px(y * 4 + x))
    val base = Avi.synthAviGray(4, 4, Seq(Array.fill(16)(0)))
    // replace the single 00db frame with a 00dc chunk holding the PNG
    val s = base.indexOfSlice("00db".getBytes("ASCII"))
    assert(s > 0)
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + png.length + (png.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("00dc".getBytes("ASCII")).putInt(png.length).put(png)
    if (png.length % 2 == 1) bb.put(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, s)
    out.write(bb.array())
    val patched = out.toByteArray
    // fix the RIFF and movi LIST sizes for the swapped chunk length
    val delta = bb.array().length - (8 + 4 * 4 /* 00db frame: 16 px stride 4 */)
    def fixLe32(arr: Array[Byte], pos: Int, d: Int): Unit = {
      val b = java.nio.ByteBuffer.wrap(arr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(pos, b.getInt(pos) + d)
    }
    fixLe32(patched, 4, delta)
    val moviList = patched.indexOfSlice("movi".getBytes("ASCII"))
    fixLe32(patched, moviList - 4, delta)
    val v = Avi.decode(patched)
    assert(v.frames.length === 1)
    assert(v.frames(0).toSeq === px.toSeq)
  }

  test("video features pool per-frame means and inter-frame motion") {
    import spark.implicits._
    // frame 0 all 10, frame 1 all 30, frame 2 all 10 → means 10/30/10,
    // motion = (20 + 20) / 2 = 20
    val frames = Seq(Array.fill(12)(10), Array.fill(12)(30), Array.fill(12)(10))
    val ds = Seq(Multimodal.MediaRow(5L, Avi.synthAviGray(4, 3, frames),
      Multimodal.MediaMeta("video/avi", 4, 3, 120L))).toDS()
    val f = Multimodal.decodeVideoFeatures(ds, sampleEvery = 1).collect()(0)
    assert(f.width === 4 && f.height === 3 && f.n_frames === 3)
    assert(f.frame_means.toSeq === Seq(10.0, 30.0, 10.0))
    assert(f.motion === 20.0)
    // sampling every 2nd frame drops the middle one → zero motion
    val g = Multimodal.decodeVideoFeatures(ds, sampleEvery = 2).collect()(0)
    assert(g.frame_means.toSeq === Seq(10.0, 10.0))
    assert(g.motion === 0.0)
    val sampled = Multimodal.frameStrings(Multimodal.sampleFrames(ds, every = 2))
      .collect()(0)
    assert(sampled.getInt(3) === 2)
    assert(sampled.getString(4) ===
      Array.fill(12)(10).mkString("-") + "|" + Array.fill(12)(10).mkString("-"))
  }

  test("MP4 container parses: brand, track metadata, exact sample ranges") {
    // tools/make_mp4_fixture.py: 6 samples (sizes 3..8, bytes 0xA0+i
    // repeated), 2 chunks of 3, timescale 1000, delta 100, 64x48 avc1
    val in = getClass.getResourceAsStream("/media/hand_min.mp4")
    assert(in != null, "missing mp4 fixture")
    val bytes = try in.readAllBytes() finally in.close()
    val f = Mp4.parse(bytes)
    assert(f.brand === "isom")
    assert(math.abs(f.durationSec - 0.6) < 1e-9)
    val t = f.videoTracks.head
    assert(t.codec === "avc1" && t.width === 64 && t.height === 48)
    assert(t.samples.length === 6)
    assert(t.samples.map(_.size) === Vector(3L, 4L, 5L, 6L, 7L, 8L))
    assert(t.samples.map(_.dts) === Vector(0L, 100L, 200L, 300L, 400L, 500L))
    // the byte ranges are REAL: every sample's payload reads back as
    // its known fill byte
    t.samples.foreach { s =>
      val payload = bytes.slice(s.offset.toInt, (s.offset + s.size).toInt)
      assert(payload.forall(_ == (0xA0 + s.index).toByte),
        s"sample ${s.index} bytes wrong")
    }
  }

  test("mp4Samples extracts every k-th access unit distributed; mp4Meta " +
    "serves curation columns") {
    import spark.implicits._
    val in = getClass.getResourceAsStream("/media/hand_min.mp4")
    val bytes = try in.readAllBytes() finally in.close()
    val rows = Seq(Multimodal.MediaRow(7L, bytes,
      Multimodal.MediaMeta("video/mp4", 64, 48, 600))).toDS()
    val every2 = Multimodal.mp4Samples(rows, every = 2).collect()
    assert(every2.map(_.getAs[Int]("sample_idx")).sorted.toSeq === Seq(0, 2, 4))
    val s2 = every2.find(_.getAs[Int]("sample_idx") == 2).get
    assert(s2.getAs[Double]("dts_sec") === 0.2)
    assert(s2.getAs[Array[Byte]]("bytes").toSeq ===
      Seq.fill(5)(0xA2.toByte))
    val meta = Multimodal.mp4Meta(rows).collect()
    assert(meta.length === 1)
    val m = meta.head
    assert(m.getAs[String]("codec") === "avc1" &&
      m.getAs[String]("handler") === "vide" &&
      m.getAs[Int]("n_samples") === 6 &&
      math.abs(m.getAs[Double]("track_sec") - 0.6) < 1e-9)
  }

  test("MP4 with corrupt box sizes fails cleanly") {
    val in = getClass.getResourceAsStream("/media/hand_min.mp4")
    val bytes = try in.readAllBytes() finally in.close()
    // inflate the moov box size past EOF
    val broken = bytes.clone()
    val moovAt = {
      var p = 0; var found = -1
      while (p + 8 <= broken.length && found < 0) {
        val sz = java.nio.ByteBuffer.wrap(broken, p, 4).getInt
        val t = new String(broken, p + 4, 4, "ISO-8859-1")
        if (t == "moov") found = p else p += sz
      }
      found
    }
    assert(moovAt > 0)
    java.nio.ByteBuffer.wrap(broken, moovAt, 4).putInt(1 << 30)
    val e = intercept[Exception](Mp4.parse(broken))
    assert(e.getMessage.contains("overruns"))
  }

  test("MPEG audio frame walk: ID3 skip, exact frame grid, header meta") {
    // tools/make_mp3_fixture.py hand_cbr: ID3v2(20B payload) + 5 MPEG1
    // Layer III 128kbps 44100Hz stereo frames of exactly 417 B
    val in = getClass.getResourceAsStream("/media/hand_cbr.mp3")
    assert(in != null)
    val bytes = try in.readAllBytes() finally in.close()
    val fs = MpegAudio.frames(bytes)
    assert(fs.length === 5)
    assert(fs.forall(f => f.size === 417 && f.bitrateKbps === 128 &&
      f.sampleRate === 44100 && f.channels === 2 && f.layer === 3 &&
      f.version === "1" && f.samplesPerFrame === 1152))
    // frames tile the region after the 30-byte ID3 tag exactly
    assert(fs.map(_.offset) === Vector(30, 447, 864, 1281, 1698))
    val Some((sec, meanKbps, rate, ch, n)) = MpegAudio.meta(bytes)
    assert(math.abs(sec - 5 * 1152.0 / 44100) < 1e-9)
    assert(meanKbps === 128.0 && rate === 44100 && ch === 2 && n === 5)
  }

  test("ID3v2.4 footer (flag bit 4) is skipped structurally") {
    // rebuild hand_cbr's stream behind an ID3v2.4 tag that sets the
    // footer flag: tag = 10B header + 16B payload + 10B footer ("3DI")
    // — the syncsafe size counts ONLY the payload (ID3v2.4 §3.1)
    val in = getClass.getResourceAsStream("/media/hand_cbr.mp3")
    val orig = try in.readAllBytes() finally in.close()
    val stream = orig.drop(30) // the 5 CBR frames
    val header = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 16)
    val footer = Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 0, 16)
    val tagged = header ++ Array.fill[Byte](16)(0) ++ footer ++ stream
    val fs = MpegAudio.frames(tagged)
    assert(fs.length === 5)
    assert(fs.head.offset === 36) // 10 + 16 + 10, not 26
    // v2.3: bit 4 of the flags byte is UNDEFINED (no footer exists) —
    // skipping 10 bytes there would land mid-frame and drop frame 1
    val v23 = Array[Byte]('I', 'D', '3', 3, 0, 0x10, 0, 0, 0, 16) ++
      Array.fill[Byte](16)(0) ++ stream
    val fs23 = MpegAudio.frames(v23)
    assert(fs23.length === 5)
    assert(fs23.head.offset === 26)
  }

  test("MPEG audio walk resyncs over garbage and averages VBR bitrates") {
    val in = getClass.getResourceAsStream("/media/hand_vbr.mp3")
    val bytes = try in.readAllBytes() finally in.close()
    val fs = MpegAudio.frames(bytes)
    assert(fs.map(_.bitrateKbps) === Vector(128, 192, 256))
    assert(fs.head.offset === 2) // skipped the garbage prefix
    assert(fs.forall(_.channels == 1))
    val Some((_, meanKbps, _, _, _)) = MpegAudio.meta(bytes)
    assert(meanKbps === 192.0)
  }

  test("MP4 and MPEG walkers survive single-bit corruption cleanly") {
    // same contract as H5CorruptionSpec: decode or plain Exception,
    // never a hang (both walks provably advance) or runaway allocation
    def bytesOf(path: String) = {
      val in = getClass.getResourceAsStream(path)
      try in.readAllBytes() finally in.close()
    }
    val rnd = new scala.util.Random(777L)
    for ((path, parse) <- Seq[(String, Array[Byte] => Any)](
      ("/media/hand_min.mp4", Mp4.parse(_)),
      ("/media/hand_elst.mp4", Mp4.parse(_)),
      ("/media/hand_legacy2traf.mp4", Mp4.parse(_)),
      ("/media/hand_cbr.mp3", MpegAudio.frames(_)),
      ("/media/hand_vbr.mp3", MpegAudio.frames(_)));
        _ <- 1 to 200) {
      val b = bytesOf(path)
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      try parse(b)
      catch { case _: Exception => () }
    }
  }

  test("MP4 bounds: truncated mdat fails loudly; corrupt counts never allocate") {
    import spark.implicits._
    val samples = (0 until 6).map(k => Array.fill(4 + k)((0xA0 + k).toByte))
    val full = Mp4.synth(samples, delta = 40, 64, 48)
    // single-sample synth emits a one-chunk table that parses clean
    val one = Mp4.parse(Mp4.synth(Seq(Array[Byte](1, 2, 3)), 40, 8, 8))
    assert(one.videoTracks.head.samples.map(_.size) === Vector(3L))
    // keep the container parseable but make the sample ranges overrun
    // the payload: point the second chunk offset 2 bytes before EOF,
    // so its 3 samples (6+7+8 bytes) extend past the file — the shape
    // a truncated-mdat/mismatched-moov download produces
    val overrun = full.clone()
    val stcoAt = indexOfBox(overrun, "stco")
    // stco payload: ver+flags(4) count(4) off1(4) off2(4)
    java.nio.ByteBuffer.wrap(overrun, stcoAt + 8 + 8 + 4, 4)
      .putInt(overrun.length - 2)
    val rows = Seq(Multimodal.MediaRow(9L, overrun,
      Multimodal.MediaMeta("video/mp4", 64, 48, 240))).toDS()
    val e = intercept[Exception] {
      Multimodal.mp4Samples(rows).collect()
    }
    assert(e.getMessage.contains("truncated mdat") ||
      e.getCause != null && e.getCause.getMessage.contains("truncated mdat"),
      s"got: ${e.getMessage}")
    // corrupt stts run count to 0x80000006: must throw, not expand
    val broken = full.clone()
    val sttsAt = indexOfBox(broken, "stts")
    broken(sttsAt + 12) = 0x80.toByte // sample_count high byte
    val e2 = intercept[Exception](Mp4.parse(broken))
    assert(e2.getMessage.contains("entries"), e2.getMessage)
    // corrupt uniform stsz with a huge count likewise
    val b3 = full.clone()
    val stszAt = indexOfBox(b3, "stsz")
    b3(stszAt + 8 + 4 + 3) = 0x01 // uniform = 1
    b3(stszAt + 8 + 4 + 4 + 0) = 0x7f.toByte // count = 0x7f...
    val e3 = intercept[Exception](Mp4.parse(b3))
    assert(e3.getMessage.contains("entries"), e3.getMessage)
  }

  test("ctts composition offsets produce pts = dts + offset") {
    // tools/make_mp4_fixture.py build_with_ctts: first 2 samples carry
    // a +200-tick composition delay, the rest 0 — B-frame-style
    // reordering metadata; dts stays the stts grid
    val in = getClass.getResourceAsStream("/media/hand_ctts.mp4")
    assert(in != null)
    val bytes = try in.readAllBytes() finally in.close()
    val t = Mp4.parse(bytes).videoTracks.head
    assert(t.samples.map(_.dts) === Vector(0L, 100L, 200L, 300L, 400L, 500L))
    assert(t.samples.map(_.pts) === Vector(200L, 300L, 200L, 300L, 400L, 500L))
    // without ctts, pts == dts everywhere
    val plainIn = getClass.getResourceAsStream("/media/hand_min.mp4")
    val plain = try plainIn.readAllBytes() finally plainIn.close()
    val pt = Mp4.parse(plain).videoTracks.head
    assert(pt.samples.forall(s => s.pts == s.dts))
  }

  test("fragmented MP4 (moof/trun) resolves samples across fragments") {
    // tools/make_mp4_fixture.py build_fragmented: empty moov tables +
    // two fragments of 3 samples (sizes 5,6,7 then 4,5,6; fills
    // 0xB0.. / 0xC0..), default-base-is-moof, tfdt bases 0 and 300.
    // Fragment 2 additionally exercises the LARGESIZE moof header and
    // an offset-less continuation trun whose sample is fully defaulted
    // from tfhd (duration AND size)
    val in = getClass.getResourceAsStream("/media/hand_frag.mp4")
    assert(in != null)
    val bytes = try in.readAllBytes() finally in.close()
    val f = Mp4.parse(bytes)
    val t = f.videoTracks.head
    assert(t.samples.length === 6)
    assert(t.samples.map(_.size) === Vector(5L, 6L, 7L, 4L, 5L, 6L))
    assert(t.samples.map(_.dts) === Vector(0L, 100L, 200L, 300L, 400L, 500L))
    val fills = Vector(0xB0, 0xB1, 0xB2, 0xC0, 0xC1, 0xC2)
    t.samples.zip(fills).foreach { case (s, fill) =>
      val payload = bytes.slice(s.offset.toInt, (s.offset + s.size).toInt)
      assert(payload.forall(_ == fill.toByte),
        s"fragment sample ${s.index} bytes wrong")
    }
    // and the distributed operator sees them identically
    import spark.implicits._
    val rows = Seq(Multimodal.MediaRow(3L, bytes,
      Multimodal.MediaMeta("video/mp4", 64, 48, 600))).toDS()
    val got = Multimodal.mp4Samples(rows, every = 3).collect()
    assert(got.map(_.getAs[Int]("sample_idx")).sorted.toSeq === Seq(0, 3))
    assert(got.find(_.getAs[Int]("sample_idx") == 3).get
      .getAs[Array[Byte]]("bytes").toSeq === Seq.fill(4)(0xC0.toByte))
  }

  test("mp4DecodeFrames decodes REAL pixels from intra-coded MP4 tracks") {
    import spark.implicits._
    // three 8x6 PNG frames with known constant-ish pixels: frame k has
    // value 40k+10 everywhere except a 4x3 bright quadrant of 40k+50
    def frame(k: Int): Array[Byte] = Multimodal.synthGrayPng(8, 6,
      (x, y) => if (x < 4 && y < 3) 40 * k + 50 else 40 * k + 10)
    val mp4 = Mp4.synth(Seq(frame(0), frame(1), frame(2)),
      delta = 100, 8, 6, codec = "png ")
    val rows = Seq(Multimodal.MediaRow(5L, mp4,
      Multimodal.MediaMeta("video/mp4", 8, 6, 300))).toDS()
    val got = Multimodal.mp4DecodeFrames(rows, gridW = 2, gridH = 2)
      .orderBy("frame_idx").collect()
    assert(got.length === 3)
    // 2x2 pooling of the 8x6 image: top-left cell = the bright
    // quadrant exactly (4x3), the other three cells = the dim value
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Int]("width") === 8 && r.getAs[Int]("height") === 6)
      assert(math.abs(r.getAs[Double]("pts_sec") - k * 0.1) < 1e-9)
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      assert(f.toSeq === Seq(40f * k + 50, 40f * k + 10,
        40f * k + 10, 40f * k + 10), s"frame $k")
    }
    // Motion-JPEG: lossy, so pin dims and approximate brightness only
    val jpgBytes = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 6).foreach(y => (0 until 8).foreach(x =>
        img.getRaster.setSample(x, y, 0, 128)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mjpg = Mp4.synth(Seq(jpgBytes), 100, 8, 6, codec = "jpeg")
    val jrows = Seq(Multimodal.MediaRow(6L, mjpg,
      Multimodal.MediaMeta("video/mp4", 8, 6, 100))).toDS()
    val j = Multimodal.mp4DecodeFrames(jrows, 1, 1).collect()
    assert(j.length === 1)
    assert(j.head.getAs[Int]("width") === 8)
    assert(math.abs(j.head.getAs[scala.collection.Seq[Float]]("features")
      .head - 128f) < 4f)
    // an inter-coded (avc1) track yields NO rows — the stub boundary
    // stays honest, scoped to codecs the JVM lacks
    val avc = Mp4.synth(Seq(Array[Byte](1, 2, 3)), 100, 8, 6)
    val arows = Seq(Multimodal.MediaRow(7L, avc,
      Multimodal.MediaMeta("video/mp4", 8, 6, 100))).toDS()
    assert(Multimodal.mp4DecodeFrames(arows, 2, 2).count() === 0)
  }

  test("edit list (edts/elst) shifts every presentation timestamp") {
    // tools/make_mp4_fixture.py build_with_elst: the ctts fixture plus
    // an edit list — empty edit of 500 movie ticks (presentation
    // delay) then a media edit with media_time 100 (head trim). Both
    // timescales are 1000, so pts' = pts + 500 - 100; dts untouched.
    val in = getClass.getResourceAsStream("/media/hand_elst.mp4")
    assert(in != null)
    val bytes = try in.readAllBytes() finally in.close()
    val t = Mp4.parse(bytes).videoTracks.head
    assert(t.samples.map(_.dts) === Vector(0L, 100L, 200L, 300L, 400L, 500L))
    assert(t.samples.map(_.pts) === Vector(600L, 700L, 600L, 700L, 800L, 900L))
    // byte ranges are untouched by editing
    assert(t.samples.map(_.size) === Vector(3L, 4L, 5L, 6L, 7L, 8L))
    // a multi-segment edit list (two media edits) fails loudly: patch
    // the second entry's media_time from -1-style empty to a media edit
    val broken = bytes.clone()
    val elstAt = indexOfBox(broken, "elst")
    // entry 1 media_time at payload+4+4+4 -> turn the EMPTY edit (-1)
    // into a second media edit (0): two media edits = multi-segment
    java.nio.ByteBuffer.wrap(broken, elstAt + 8 + 4 + 4 + 4, 4).putInt(0)
    val e = intercept[Exception](Mp4.parse(broken))
    assert(e.getMessage.contains("multi-segment"), e.getMessage)
    // a dwell edit (media_rate 0) freezes a frame; treating it as a
    // head trim would shift every pts silently wrong — loud failure.
    // entry 1 (the media edit) rate-integer sits at payload + entry0
    // (12) + segDur(4) + mediaTime(4)
    val dwell = bytes.clone()
    java.nio.ByteBuffer.wrap(dwell, elstAt + 8 + 4 + 4 + 12 + 8, 2)
      .putShort(0)
    val e2 = intercept[Exception](Mp4.parse(dwell))
    assert(e2.getMessage.contains("rate"), e2.getMessage)
  }

  test("legacy two-traf moof: 2nd traf defaults to previous traf's data end") {
    // tools/make_mp4_fixture.py build_legacy_two_traf: NEITHER
    // base-data-offset nor default-base-is-moof in either tfhd — the
    // ISO 14496-12 §8.8.7 legacy default. traf1 (track 1, sizes 5,6)
    // addresses its run explicitly; traf2 (track 2, one 7-byte sample)
    // has an OFFSET-LESS trun that must start exactly where traf1's
    // data ended, not at moof start.
    val in = getClass.getResourceAsStream("/media/hand_legacy2traf.mp4")
    assert(in != null)
    val bytes = try in.readAllBytes() finally in.close()
    val f = Mp4.parse(bytes)
    val t1 = f.videoTracks.find(_.id == 1L).get
    val t2 = f.videoTracks.find(_.id == 2L).get
    assert(t1.samples.map(_.size) === Vector(5L, 6L))
    assert(t2.samples.map(_.size) === Vector(7L))
    val s2 = t2.samples.head
    // traf1's data is the first 11 mdat bytes; traf2 starts right after
    assert(s2.offset === t1.samples.last.offset + t1.samples.last.size)
    val payload = bytes.slice(s2.offset.toInt, (s2.offset + s2.size).toInt)
    assert(payload.forall(_ == 0xE0.toByte), "2nd traf read wrong bytes")
  }

  private def indexOfBox(b: Array[Byte], tpe: String): Int = {
    // scan the whole byte stream for the fourcc and return the box
    // start (fourcc sits 4 bytes after the size field)
    val pat = tpe.getBytes("ISO-8859-1")
    var p = 4
    while (p + 4 <= b.length) {
      if (b(p) == pat(0) && b(p + 1) == pat(1) && b(p + 2) == pat(2) &&
        b(p + 3) == pat(3)) return p - 4
      p += 1
    }
    fail(s"box $tpe not found")
  }
}
