package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

/** ISO Base Media File Format (MP4) CONTAINER parser, from the public
  * ISO/IEC 14496-12 layout: the box tree, track metadata (handler,
  * codec fourcc, timescale, duration, pixel dimensions), and — the
  * part a data pipeline actually needs — the full sample tables
  * (`stts` decode timestamps, `stsz` sizes, `stsc`+`stco`/`co64`
  * chunk mapping) resolved to exact per-sample file byte ranges.
  *
  * That makes frame/sample SELECTION real: `Multimodal.mp4Samples`
  * extracts true codec access units (H.264/AAC/... payload bytes) at
  * true timestamps with no decoder. Decoding those payloads to pixels
  * or PCM still requires a codec the JVM lacks; that step remains the
  * documented stub boundary (`Multimodal.scala` stub contract) —
  * reference role: the media ingestion path of a multimodal training
  * pipeline, where sampling and deduplication run on container
  * metadata and access-unit bytes long before any decode.
  *
  * Big-endian throughout (the format's rule, unlike RIFF/AVI).
  */
object Mp4 {

  /** One addressable sample (access unit): exact byte range in the
    * file plus its decode and presentation timestamps in
    * track-timescale ticks (pts = dts + ctts composition offset;
    * equal when the file has no reordering).
    */
  final case class Sample(index: Int, offset: Long, size: Long, dts: Long,
                          pts: Long)

  final case class Track(id: Long, handler: String, codec: String,
                         timescale: Long, duration: Long,
                         width: Int, height: Int,
                         samples: Vector[Sample]) {
    def durationSec: Double =
      if (timescale > 0) duration.toDouble / timescale else 0.0
  }

  final case class Mp4File(brand: String, timescale: Long, duration: Long,
                           tracks: Vector[Track]) {
    def durationSec: Double =
      if (timescale > 0) duration.toDouble / timescale else 0.0
    def videoTracks: Vector[Track] = tracks.filter(_.handler == "vide")
    def audioTracks: Vector[Track] = tracks.filter(_.handler == "soun")
  }

  private final class B(val bytes: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def at(p: Long): Unit = buf.position(p.toInt)
    def pos: Long = buf.position().toLong
    def u8(): Int = buf.get() & 0xff
    def u16(): Int = buf.getShort() & 0xffff
    def u32(): Long = buf.getInt() & 0xffffffffL
    def u64(): Long = buf.getLong()
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "ISO-8859-1")
    }
    def skip(n: Long): Unit = buf.position((pos + n).toInt)
  }

  // ------------------------------------------------------------ write

  /** Synthesize a minimal valid MP4: one video track whose samples are
    * the given byte arrays in two stco chunks, timescale-1000 `delta`
    * ticks apart — the write half of the codec pair (the read side is
    * additionally pinned against the independent python-built fixture,
    * so conformance never rests on this round-trip alone). Used by the
    * media gates to synthesize per-row containers in executors.
    */
  def synth(samples: Seq[Array[Byte]], delta: Int,
            width: Int, height: Int,
            codec: String = "avc1"): Array[Byte] = {
    require(samples.nonEmpty && delta > 0)
    require(codec.length == 4, s"mp4: codec fourcc must be 4 chars: '$codec'")
    def u32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def u16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    def cat(bs: Array[Byte]*): Array[Byte] = bs.flatten.toArray
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      cat(u32(8L + payload.length), tpe.getBytes("ISO-8859-1"), payload)
    def fullBox(tpe: String, ver: Int, flags: Int, payload: Array[Byte]): Array[Byte] =
      box(tpe, cat(Array(ver.toByte, (flags >>> 16).toByte,
        (flags >>> 8).toByte, flags.toByte), payload))

    val timescale = 1000L
    val dur = delta.toLong * samples.length
    val ftyp = box("ftyp", cat(
      "isom".getBytes("ISO-8859-1"), u32(0x200), "isomavc1".getBytes("ISO-8859-1")))
    val mdat = box("mdat", samples.flatten.toArray)
    val chunk1 = ftyp.length + 8L
    val split = (samples.length + 1) / 2
    val chunk2 = chunk1 + samples.take(split).map(_.length.toLong).sum

    val ident = cat(u32(0x00010000L), u32(0), u32(0), u32(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x40000000L))
    val mvhd = fullBox("mvhd", 0, 0, cat(u32(0), u32(0), u32(timescale),
      u32(dur), u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0),
      ident, Array.fill(24)(0.toByte), u32(2)))
    val tkhd = fullBox("tkhd", 0, 7, cat(u32(0), u32(0), u32(1), u32(0),
      u32(dur), u32(0), u32(0), u16(0), u16(0), u16(0), u16(0),
      ident, u32(width.toLong << 16), u32(height.toLong << 16)))
    val mdhd = fullBox("mdhd", 0, 0, cat(u32(0), u32(0), u32(timescale),
      u32(dur), u16(0x55C4), u16(0)))
    val hdlr = fullBox("hdlr", 0, 0, cat(u32(0),
      "vide".getBytes("ISO-8859-1"), Array.fill(12)(0.toByte),
      "VideoHandler\u0000".getBytes("ISO-8859-1")))
    val avc1 = box(codec, cat(Array.fill(6)(0.toByte), u16(1),
      u16(0), u16(0), u32(0), u32(0), u32(0),
      u16(width), u16(height), u32(0x00480000L), u32(0x00480000L),
      u32(0), u16(1), Array.fill(32)(0.toByte), u16(0x18), u16(0xffff)))
    val stsd = fullBox("stsd", 0, 0, cat(u32(1), avc1))
    val stts = fullBox("stts", 0, 0, cat(u32(1), u32(samples.length.toLong),
      u32(delta.toLong)))
    // one chunk when the split leaves nothing for a second — a 2-chunk
    // table for a single sample would point chunk 2 past the mdat
    val twoChunks = split < samples.length
    val stsc = fullBox("stsc", 0, 0,
      if (twoChunks) cat(u32(2),
        u32(1), u32(split.toLong), u32(1),
        u32(2), u32((samples.length - split).toLong), u32(1))
      else cat(u32(1), u32(1), u32(samples.length.toLong), u32(1)))
    val stsz = fullBox("stsz", 0, 0, cat(u32(0), u32(samples.length.toLong),
      samples.flatMap(s => u32(s.length.toLong)).toArray))
    val stco = fullBox("stco", 0, 0,
      if (twoChunks) cat(u32(2), u32(chunk1), u32(chunk2))
      else cat(u32(1), u32(chunk1)))
    val stbl = box("stbl", cat(stsd, stts, stsc, stsz, stco))
    val vmhd = fullBox("vmhd", 0, 1, cat(u16(0), u16(0), u16(0), u16(0)))
    val dinf = box("dinf", fullBox("dref", 0, 0, cat(u32(1),
      fullBox("url ", 0, 1, Array.emptyByteArray))))
    val minf = box("minf", cat(vmhd, dinf, stbl))
    val mdia = box("mdia", cat(mdhd, hdlr, minf))
    val trak = box("trak", cat(tkhd, mdia))
    val moov = box("moov", cat(mvhd, trak))
    cat(ftyp, mdat, moov)
  }

  /** (type, boxStart, payloadStart, payloadEnd) for each box in
    * [from, to) — the start is kept because default-base-is-moof
    * addressing anchors at the BOX, which sits 8 or 16 bytes before
    * the payload depending on the largesize header form.
    */
  private def boxes(r: B, from: Long, to: Long): Seq[(String, Long, Long, Long)] = {
    val out = ArrayBuffer.empty[(String, Long, Long, Long)]
    var p = from
    while (p + 8 <= to) {
      r.at(p)
      val size0 = r.u32()
      val tpe = r.fourcc()
      val (payload, end) =
        if (size0 == 1) { val big = r.u64(); (p + 16, p + big) }
        else if (size0 == 0) (p + 8, to)
        else (p + 8, p + size0)
      require(end >= payload && end <= to,
        s"mp4: box '$tpe' at $p overruns its container ($end > $to)")
      out += ((tpe, p, payload, end))
      p = end
    }
    out.toSeq
  }

  private def find(bs: Seq[(String, Long, Long, Long)], t: String): Option[(Long, Long)] =
    bs.find(_._1 == t).map(b => (b._3, b._4))

  def parse(bytes: Array[Byte]): Mp4File = {
    val r = new B(bytes)
    val top = boxes(r, 0, bytes.length.toLong)
    val brand = find(top, "ftyp").map { case (s, _) =>
      r.at(s); r.fourcc()
    }.getOrElse("")
    val (moovS, moovE) = find(top, "moov").getOrElse(
      sys.error("mp4: no moov box"))
    val moov = boxes(r, moovS, moovE)
    val (mvTs, mvDur) = find(moov, "mvhd").map { case (s, _) =>
      r.at(s)
      val ver = r.u8(); r.skip(3)
      if (ver == 1) { r.skip(16); (r.u32(), r.u64()) }
      else { r.skip(8); (r.u32(), r.u32()) }
    }.getOrElse((0L, 0L))
    val parsedTraks = moov.filter(_._1 == "trak").map { case (_, _, ts, te) =>
      parseTrak(r, ts, te, mvTs)
    }.toVector
    val tracks = parsedTraks.map(_._1)
    val shiftOf = parsedTraks.map { case (t, sh) => t.id -> sh }.toMap
    // fragmented files (CMAF/DASH archives): moov sample tables are
    // empty and samples live in moof+mdat fragments — append each
    // fragment's runs to its track, then extend durations
    val frags = top.filter(_._1 == "moof")
    val withFrags =
      if (frags.isEmpty) tracks
      else {
        val parsed = frags.flatMap { case (_, start, ms, me) =>
          parseMoof(r, start, ms, me)
        }
        val byTrack = parsed.groupBy(_._1)
        tracks.map { t =>
          val runs = byTrack.getOrElse(t.id, Nil)
          // the trak's edit list shifts fragment pts identically
          val shift = shiftOf.getOrElse(t.id, 0L)
          val extra = runs.flatMap(_._2)
          if (extra.isEmpty) t
          else {
            val all = t.samples ++ extra.zipWithIndex.map { case (s, i) =>
              s.copy(index = t.samples.length + i, pts = s.pts + shift)
            }
            // run end-times include the LAST sample's duration
            val dur = (t.duration +: runs.map(_._3)).max
            t.copy(samples = all, duration = dur)
          }
        }
      }
    Mp4File(brand, mvTs, mvDur, withFrags)
  }

  /** One movie fragment → (trackId, samples) per track run. Subset:
    * explicit tfhd base-data-offset, the default-base-is-moof flag
    * (0x20000: base = moof start), or — when NEITHER signal is present
    * — the ISO 14496-12 §8.8.7 legacy default: moof start for the
    * first traf, the end of the preceding traf's data for the 2nd+.
    * Per-sample or tfhd-default sizes/durations, tfdt decode-time
    * base. Count fields are bounded by the trun payload before any
    * allocation, same rule as the stbl tables.
    */
  private def parseMoof(r: B, moofStart: Long, from: Long,
                        to: Long): Seq[(Long, Seq[Sample], Long)] = {
    // end of the data defined by the preceding track fragment — the
    // §8.8.7 default base for a 2nd+ traf that sets neither
    // base-data-offset nor default-base-is-moof
    var prevEnd: Option[Long] = None
    boxes(r, from, to).filter(_._1 == "traf").zipWithIndex.map {
      case ((_, _, ts, te), trafIdx) =>
      val traf = boxes(r, ts, te)
      val (trackId, baseOff, startsDefined, defDur, defSize) =
        find(traf, "tfhd").map { case (s, _) =>
          r.at(s); r.u8()
          val flags = (r.u8() << 16) | (r.u8() << 8) | r.u8()
          val tid = r.u32()
          val explicit = (flags & 0x01) != 0
          val defaultBaseIsMoof = (flags & 0x20000) != 0
          // Known ambiguity, decided for the spec: some legacy muxers
          // wrote moof-anchored offsets in 2nd+ trafs WITHOUT setting
          // 0x20000 (the flag was introduced to formalize exactly that
          // habit). Those files and spec-compliant §8.8.7 files are
          // byte-indistinguishable here — both shapes resolve
          // in-bounds — so the compliant reading (prev traf's data
          // end) wins; a loud failure would reject every compliant
          // legacy file to protect the non-compliant ones.
          val base =
            if (explicit) r.u64()
            else if (defaultBaseIsMoof || trafIdx == 0) moofStart
            else prevEnd.getOrElse(sys.error(
              "mp4: 2nd+ traf with neither base-data-offset nor " +
                "default-base-is-moof and no preceding traf data — " +
                "no defined base"))
          if ((flags & 0x02) != 0) r.u32() // sample description index
          val dd = if ((flags & 0x08) != 0) r.u32() else 0L
          val ds = if ((flags & 0x10) != 0) r.u32() else 0L
          // an offset-less FIRST trun starts AT the base only when the
          // base points at actual sample data: an explicit offset, or
          // the contiguous legacy prev-traf-end default. A moof-start
          // base (either flag shape) would emit container bytes as
          // samples, so that stays a loud failure below.
          val defined = explicit || (!defaultBaseIsMoof && trafIdx > 0)
          (tid, base, defined, dd, ds)
        }.getOrElse(sys.error("mp4: traf without tfhd"))
      val baseDts = find(traf, "tfdt").map { case (s, _) =>
        r.at(s)
        val ver = r.u8(); r.skip(3)
        if (ver == 1) r.u64() else r.u32()
      }.getOrElse(0L)
      var dts = baseDts
      // the byte position where the NEXT offset-less trun continues
      // (spec default: a trun without 0x01 starts where the previous
      // run's data ended; the FIRST offset-less run starts AT the
      // tfhd base when that base points at data — ISO 14496-12
      // §8.8.8). With a moof-start base and no offset anywhere, there
      // is no defined data start and guessing would emit container
      // bytes as samples, so that shape fails loudly below.
      var nextOff: Option[Long] = if (startsDefined) Some(baseOff) else None
      val samples = traf.filter(_._1 == "trun").flatMap { case (_, _, rs, re) =>
        r.at(rs); r.u8()
        val flags = (r.u8() << 16) | (r.u8() << 8) | r.u8()
        val rawCount = r.u32()
        val perSample = Seq(0x100, 0x200, 0x400, 0x800)
          .count(b => (flags & b) != 0) * 4L
        val fixed = (if ((flags & 0x01) != 0) 4 else 0) +
          (if ((flags & 0x04) != 0) 4 else 0)
        // bound the count BEFORE any allocation: by the trun payload
        // when per-sample fields exist, else by how many tfhd-default-
        // sized samples the file can physically hold; all-defaulted
        // zero-size runs are refused (no honest bound exists)
        val have =
          if (perSample > 0) (re - rs - 8 - fixed) / perSample
          else if (defSize > 0) r.bytes.length / defSize
          else if (rawCount == 0) 0L
          else sys.error("mp4: trun with zero-size defaulted samples")
        require(rawCount >= 0 && rawCount <= have,
          s"mp4: trun declares $rawCount entries but only $have fit")
        // the physical bound above degenerates at tfhd
        // default_sample_size=1 (bound = file length), which would let
        // a crafted fragment allocate file-length Sample objects —
        // ~56 bytes each, a 100x blowup. 2^20 samples per trun is 30x
        // any real fragment (a 10-minute 60fps fragment is 36k); a
        // file beyond it refuses loudly, the subset-cap convention
        require(rawCount <= (1L << 20),
          s"mp4: trun declares $rawCount samples — beyond the 2^20 " +
            "per-fragment subset cap")
        // trun data-offset is SIGNED per spec
        val off0 =
          if ((flags & 0x01) != 0) baseOff + r.u32().toInt.toLong
          else nextOff.getOrElse(sys.error(
            "mp4: offset-less trun with default-base-is-moof and no " +
              "prior run — no defined data start"))
        if ((flags & 0x04) != 0) r.u32() // first-sample-flags
        var off = off0
        val run = (0 until rawCount.toInt).map { _ =>
          val dur = if ((flags & 0x100) != 0) r.u32() else defDur
          val size = if ((flags & 0x200) != 0) r.u32() else defSize
          if ((flags & 0x400) != 0) r.u32() // sample flags
          val ctsOff =
            if ((flags & 0x800) != 0) r.u32().toInt.toLong else 0L
          val s = Sample(0, off, size, dts, dts + ctsOff)
          off += size
          dts += dur
          s
        }
        nextOff = Some(off)
        run
      }
      prevEnd = nextOff.orElse(prevEnd)
      (trackId, samples, dts)
    }
  }

  /** Returns the track plus its edit-list pts shift (media-timescale
    * ticks), already applied to the stbl samples; `parse` applies the
    * same shift to fragment samples merged in later.
    */
  private def parseTrak(r: B, from: Long, to: Long, mvTs: Long): (Track, Long) = {
    val trak = boxes(r, from, to)
    val (tid, w, h) = find(trak, "tkhd").map { case (s, e) =>
      r.at(s)
      val ver = r.u8(); r.skip(3)
      r.skip(if (ver == 1) 16 else 8) // times
      val id = r.u32()
      // width/height: last two 16.16 fixed-point fields of the box
      r.at(e - 8)
      (id, (r.u32() >> 16).toInt, (r.u32() >> 16).toInt)
    }.getOrElse((0L, 0, 0))
    val (mdiaS, mdiaE) = find(trak, "mdia").getOrElse(
      sys.error("mp4: trak without mdia"))
    val mdia = boxes(r, mdiaS, mdiaE)
    val (ts, dur) = find(mdia, "mdhd").map { case (s, _) =>
      r.at(s)
      val ver = r.u8(); r.skip(3)
      if (ver == 1) { r.skip(16); (r.u32(), r.u64()) }
      else { r.skip(8); (r.u32(), r.u32()) }
    }.getOrElse((0L, 0L))
    val handler = find(mdia, "hdlr").map { case (s, _) =>
      r.at(s + 8); r.fourcc()
    }.getOrElse("")
    val stblOpt = for {
      (minfS, minfE) <- find(mdia, "minf")
      (stblS, stblE) <- find(boxes(r, minfS, minfE), "stbl")
    } yield boxes(r, stblS, stblE)
    val stbl = stblOpt.getOrElse(Nil)
    val codec = find(stbl, "stsd").map { case (s, e) =>
      r.at(s); r.skip(4) // version+flags
      val n = r.u32()
      if (n > 0 && r.pos + 8 <= e) { r.u32(); r.fourcc() } else ""
    }.getOrElse("")
    // edts/elst (ISO 14496-12 §8.6.6): the single shape real archives
    // use — optional leading EMPTY edits (media_time -1, duration in
    // MOVIE timescale: presentation delay) followed by at most one
    // media edit whose media_time trims the head of the media timeline.
    // Net effect on every presentation timestamp:
    //   pts' = pts + delay(in media ticks) - media_time.
    // Samples are never dropped (a pipeline wants every access unit);
    // multi-segment editing cannot be expressed as one shift and fails
    // loudly per the module convention.
    val ptsShift: Long = (for {
      (edtsS, edtsE) <- find(trak, "edts")
      (elstS, elstE) <- find(boxes(r, edtsS, edtsE), "elst")
    } yield {
      r.at(elstS)
      val ver = r.u8(); r.skip(3)
      val entrySize = if (ver == 1) 20L else 12L
      val n = r.u32()
      require(n >= 0 && n <= (elstE - r.pos) / entrySize,
        s"mp4: elst declares $n entries but only " +
          s"${(elstE - r.pos) / entrySize} fit")
      var delayMovie = 0L
      var mediaTime = 0L
      var seenMedia = false
      (0 until n.toInt).foreach { _ =>
        val (segDur, mt) =
          if (ver == 1) (r.u64(), r.u64())
          else (r.u32(), r.u32().toInt.toLong)
        val rateInt = r.u16(); val rateFrac = r.u16() // media_rate 16.16
        if (mt == -1L) {
          require(!seenMedia,
            "mp4: empty edit after a media edit is multi-segment " +
              "editing — not expressible as a pts shift")
          delayMovie += segDur
        } else {
          require(!seenMedia,
            "mp4: multi-segment edit list — not expressible as a " +
              "single pts shift")
          // only media_time >= 0 is a head trim; other negatives are
          // invalid per spec (-1 alone means empty edit) — loud
          require(mt >= 0,
            s"mp4: media edit with invalid media_time $mt")
          // a dwell edit (rate 0) freezes a frame and a scaled rate
          // (e.g. 1.5) stretches the timeline — neither is a pts
          // shift, so anything but exactly 1.0 fails loudly
          require(rateInt == 1 && rateFrac == 0,
            s"mp4: media edit with rate $rateInt.$rateFrac — only " +
              "rate 1.0 is a pts shift")
          seenMedia = true
          mediaTime = mt
        }
      }
      val delayMedia =
        if (delayMovie == 0) 0L
        else {
          require(mvTs > 0 && ts > 0,
            "mp4: empty edit needs valid movie AND media timescales")
          // both factors are file-controlled: bound the product before
          // multiplying (the module's loud-failure rule for counts)
          require(delayMovie > 0 && delayMovie <= Long.MaxValue / ts,
            s"mp4: elst delay $delayMovie x timescale $ts overflows")
          // movie-timescale ticks -> media-timescale ticks
          delayMovie * ts / mvTs
        }
      delayMedia - mediaTime
    }).getOrElse(0L)
    val samples0 = sampleTable(r, stbl)
    val samples =
      if (ptsShift == 0) samples0
      else samples0.map(s => s.copy(pts = s.pts + ptsShift))
    (Track(tid, handler, codec, ts, dur, w, h, samples), ptsShift)
  }

  /** Resolve stts + stsz + stsc + stco/co64 to concrete samples.
    * Every count field is validated against what its box payload (or
    * the file itself) can physically hold BEFORE any allocation — a
    * corrupt header must fail loudly, never hang on a 2^31-element
    * expansion or die on a runaway Vector (counts are file-controlled
    * input).
    */
  private def sampleTable(r: B, stbl: Seq[(String, Long, Long, Long)]): Vector[Sample] = {
    def bounded(count: Long, have: Long, what: String): Int = {
      require(count >= 0 && count <= have,
        s"mp4: $what declares $count entries but only $have fit")
      count.toInt
    }
    val sizes: Vector[Long] = find(stbl, "stsz").map { case (s, e) =>
      r.at(s); r.skip(4)
      val uniform = r.u32()
      val raw = r.u32()
      if (uniform != 0) {
        // every sample occupies file bytes, so their total bounds count
        val count = bounded(raw, r.bytes.length / uniform, "uniform stsz")
        Vector.fill(count)(uniform)
      } else {
        val count = bounded(raw, (e - r.pos) / 4, "stsz")
        Vector.fill(count)(r.u32())
      }
    }.getOrElse(Vector.empty)
    if (sizes.isEmpty) return Vector.empty

    val dts: Vector[Long] = find(stbl, "stts").map { case (s, e) =>
      r.at(s); r.skip(4)
      val n = bounded(r.u32(), (e - r.pos) / 8, "stts")
      val runs = Vector.fill(n)((r.u32(), r.u32()))
      val out = Vector.newBuilder[Long]
      var t = 0L
      var emitted = 0
      // never expand past the sample count — timestamps beyond it are
      // meaningless and a corrupt run count must not drive a 2^32 loop
      runs.foreach { case (cnt, delta) =>
        var i = 0L
        while (i < cnt && emitted < sizes.length) {
          out += t; t += delta; i += 1; emitted += 1
        }
      }
      out.result()
    }.getOrElse(Vector.fill(sizes.length)(0L))

    // ctts: per-sample composition (pts-dts) offsets — v1 is signed.
    // Runs bounded by payload AND expansion bounded by sample count,
    // same rules as stts.
    val ptsOff: Vector[Long] = find(stbl, "ctts").map { case (s, e) =>
      r.at(s)
      val ver = r.u8(); r.skip(3)
      val n = bounded(r.u32(), (e - r.pos) / 8, "ctts")
      val out = Vector.newBuilder[Long]
      var emitted = 0
      (0 until n).foreach { _ =>
        val cnt = r.u32()
        val off = if (ver == 0) r.u32() else r.u32().toInt.toLong
        var i = 0L
        while (i < cnt && emitted < sizes.length) {
          out += off; i += 1; emitted += 1
        }
      }
      val v = out.result()
      v ++ Vector.fill(sizes.length - v.length)(0L)
    }.getOrElse(Vector.fill(sizes.length)(0L))

    val chunkOffsets: Vector[Long] =
      find(stbl, "stco").map { case (s, e) =>
        r.at(s); r.skip(4)
        Vector.fill(bounded(r.u32(), (e - r.pos) / 4, "stco"))(r.u32())
      }.orElse(find(stbl, "co64").map { case (s, e) =>
        r.at(s); r.skip(4)
        Vector.fill(bounded(r.u32(), (e - r.pos) / 8, "co64"))(r.u64())
      }).getOrElse(Vector.empty)

    // stsc runs: (firstChunk 1-based, samplesPerChunk) until next run
    val stscRuns: Vector[(Long, Long)] = find(stbl, "stsc").map { case (s, e) =>
      r.at(s); r.skip(4)
      Vector.fill(bounded(r.u32(), (e - r.pos) / 12, "stsc")) {
        val first = r.u32(); val spc = r.u32(); r.u32() // desc index unused
        (first, spc)
      }
    }.getOrElse(Vector.empty)

    val out = Vector.newBuilder[Sample]
    var sample = 0
    var runIdx = 0
    var chunk = 1L
    while (sample < sizes.length && chunk <= chunkOffsets.length) {
      // samples-per-chunk of the run covering this chunk
      while (runIdx + 1 < stscRuns.length && stscRuns(runIdx + 1)._1 <= chunk)
        runIdx += 1
      val spc =
        if (stscRuns.isEmpty) sizes.length.toLong else stscRuns(runIdx)._2
      var within = 0L
      var off = chunkOffsets((chunk - 1).toInt)
      while (within < spc && sample < sizes.length) {
        val d = if (sample < dts.length) dts(sample) else 0L
        out += Sample(sample, off, sizes(sample), d, d + ptsOff(sample))
        off += sizes(sample)
        sample += 1
        within += 1
      }
      chunk += 1
    }
    out.result()
  }
}
