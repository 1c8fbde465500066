package graft.sources

/** Pure-JVM szip codec for the HDF5 filter pipeline (filter id 4) —
  * the extended-Rice entropy coder of the public CCSDS 121.0-B-2
  * "Lossless Data Compression" standard
  * (https://public.ccsds.org/Pubs/121x0b2ec1.pdf), which is the
  * algorithm the szip library implements. Some NASA granules the
  * reference ingests through libnetcdf/libhdf5
  * (`data-access/.../tilereadingprocessor.py:130-190`) carry
  * szip-filtered chunks; the sandbox has no szip library, so the codec
  * is implemented directly from the standard.
  *
  * HDF5 filter contract (public `H5Zszip.c` behavior): the stored
  * client values are `[options_mask, bits_per_pixel, pixels_per_block,
  * pixels_per_scanline]`; each compressed chunk is the uncompressed
  * byte count as a 4-byte little-endian prefix followed by the raw
  * Rice bitstream (the filter sets the RAW option bit, so the stream
  * carries no szip self-describing header).
  *
  * Coded-stream layout (CCSDS 121.0-B-2 §4–§5), scoped per scanline of
  * `pixelsPerScanline` samples so a decoder can seek nothing:
  *  - NN preprocessing (§4.2): the scanline's first sample is a
  *    reference; every later sample is predicted by its predecessor
  *    and the residual is mapped to an unsigned delta by the standard
  *    mapper (θ-clamped zig-zag, §4.2.2). Per the standard's
  *    reference-sample insertion (the layout szip-filtered HDF5 files
  *    actually carry), the reference occupies sample slot 0 of the
  *    scanline's FIRST block: it is written raw (n bits) immediately
  *    after that block's option-ID bits, and the block entropy-codes
  *    only its remaining J−1 samples. With the EC option the samples
  *    are coded directly — no predictor, no reference.
  *  - Sample slots are split into blocks of J = `pixelsPerBlock`
  *    (the scanline's last block zero-padded), and blocks into
  *    segments of 64 blocks (§5.3.2) that scope zero-run codewords.
  *  - Per block one option wins by coded length (§5.3): ID width is
  *    3 bits for n ≤ 8, 4 for n ≤ 16, 5 for n ≤ 32. [ref] marks the
  *    raw reference sample, present only in a scanline's first block.
  *     * zero-run      ID 0…0 then '0', [ref], then an FS codeword
  *                     counting the zero blocks: values 0–3 = runs of
  *                     1–4, 4 = remainder-of-segment, v ≥ 5 = run of v
  *     * 2nd extension ID 0…0 then '1', [ref], then J/2 FS codewords
  *                     of the pair transform γ = (δ₀+δ₁)(δ₀+δ₁+1)/2 +
  *                     δ₁ (the pair overlapping the reference slot
  *                     contributes δ₀ = 0, discarded on decode)
  *     * k-split       ID k+1, [ref]: FS codewords of δ≫k for each
  *                     non-reference slot, then their k-bit low parts
  *                     (k = 0 is the fundamental sequence)
  *     * no-compression ID 1…1, [ref]: raw n-bit samples for each
  *                     non-reference slot
  *    An FS codeword for value v is v '0' bits then a '1'.
  *
  * Subset: n ∈ {8, 16, 32} (the widths HDF5 derives from its fixed
  * datatypes; szip itself tops out at 32 bits, so 64-bit data is never
  * szip-filtered), byte order per the LSB/MSB option bits. Encoder and
  * decoder are both implemented so fixtures are self-synthesized and
  * fuzz round-trips prove the pair; SzipSpec additionally pins
  * hand-computed bitstreams straight from the standard's codeword
  * definitions so conformance does not rest on round-trip alone.
  */
object Szip {

  // public H5Zpublic.h / szlib option-mask bits
  val AllowK13 = 1
  val Chip = 2
  val EC = 4
  val LSB = 8
  val MSB = 16
  val NN = 32
  val Raw = 128

  /** The four client values the HDF5 szip filter stores. */
  final case class Params(optionMask: Int, bitsPerPixel: Int,
                          pixelsPerBlock: Int, pixelsPerScanline: Int) {
    require(Set(8, 16, 32)(bitsPerPixel),
      s"szip: bits_per_pixel $bitsPerPixel out of subset {8,16,32}")
    require(pixelsPerBlock >= 2 && pixelsPerBlock <= 32 && pixelsPerBlock % 2 == 0,
      s"szip: pixels_per_block $pixelsPerBlock must be even, in [2,32]")
    require(pixelsPerScanline >= 1,
      s"szip: pixels_per_scanline $pixelsPerScanline must be positive")
    def sampleBytes: Int = bitsPerPixel / 8
    def littleEndian: Boolean = (optionMask & LSB) != 0
    def predictive: Boolean = (optionMask & NN) != 0
    def idBits: Int =
      if (bitsPerPixel <= 8) 3 else if (bitsPerPixel <= 16) 4 else 5
  }

  private val SegBlocks = 64 // zero-run segment size, CCSDS §5.3.2

  // ------------------------------------------------------------- bit I/O

  private final class BitW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var used = 0
    /** MSB-first append of the low `w` bits of `v`. */
    def put(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        used += 1
        if (used == 8) { out.write(cur); cur = 0; used = 0 }
        i -= 1
      }
    }
    def putFs(v: Long): Unit = { put(0L, v.toInt); put(1L, 1) }
    def bytes: Array[Byte] = {
      if (used > 0) { out.write(cur << (8 - used)); cur = 0; used = 0 }
      out.toByteArray
    }
  }

  private final class BitR(bytes: Array[Byte]) {
    private var bit = 0L
    def take(w: Int): Long = {
      var v = 0L
      var i = 0
      while (i < w) {
        val b = bit + i
        val idx = (b >> 3).toInt
        require(idx < bytes.length, "szip: truncated stream")
        v = (v << 1) | ((bytes(idx) >> (7 - (b & 7)).toInt) & 1)
        i += 1
      }
      bit += w
      v
    }
    def takeFs(): Long = {
      var v = 0L
      while (take(1) == 0L) v += 1
      v
    }
  }

  // ------------------------------------------------- residual mapping

  /** CCSDS §4.2.2 mapper: residual Δ = x − pred onto unsigned δ, with
    * θ = min(pred − xmin, xmax − pred) clamping the zig-zag.
    */
  private def mapDelta(x: Long, pred: Long, xmax: Long): Long = {
    val theta = math.min(pred, xmax - pred)
    val d = x - pred
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) -2 * d - 1
    else theta + math.abs(d)
  }

  private def unmapDelta(delta: Long, pred: Long, xmax: Long): Long = {
    val theta = math.min(pred, xmax - pred)
    val d =
      if (delta > 2 * theta) {
        val abs = delta - theta
        if (pred <= xmax - pred) abs else -abs
      } else if ((delta & 1L) == 0L) delta / 2
      else -(delta + 1) / 2
    pred + d
  }

  // ---------------------------------------------------------- compress

  /** Compress one chunk's raw bytes into the HDF5-framed szip form. */
  def compress(raw: Array[Byte], p: Params): Array[Byte] = {
    require(raw.length % p.sampleBytes == 0,
      s"szip: ${raw.length} bytes not a multiple of sample size ${p.sampleBytes}")
    val samples = toSamples(raw, p)
    val w = new BitW
    var i = 0
    while (i < samples.length) {
      val len = math.min(p.pixelsPerScanline, samples.length - i)
      encodeScanline(samples, i, len, w, p)
      i += len
    }
    val body = w.bytes
    val out = java.nio.ByteBuffer.allocate(4 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putInt(raw.length).put(body)
    out.array()
  }

  private def encodeScanline(samples: Array[Long], start: Int, len: Int,
                             w: BitW, p: Params): Unit = {
    val n = p.bitsPerPixel
    val xmax = (1L << n) - 1
    // slot layout: NN → slot 0 is the (raw) reference, slots 1..len-1
    // the mapped deltas; EC → all slots are the samples themselves.
    // The delta array keeps slot 0 as 0 so zero-run detection over the
    // first block sees only real deltas.
    val ref: Long = if (p.predictive) samples(start) else 0L
    val deltas: Array[Long] =
      if (p.predictive) Array.tabulate(len)(t =>
        if (t == 0) 0L
        else mapDelta(samples(start + t), samples(start + t - 1), xmax))
      else Array.tabulate(len)(t => samples(start + t))
    val j = p.pixelsPerBlock
    val nBlocks = (deltas.length + j - 1) / j
    val padded =
      if (deltas.length == nBlocks * j) deltas
      else deltas ++ Array.fill(nBlocks * j - deltas.length)(0L)
    var segStart = 0
    while (segStart < nBlocks) {
      val segLen = math.min(SegBlocks, nBlocks - segStart)
      var b = 0
      while (b < segLen) {
        val globalBlock = segStart + b
        val off = globalBlock * j
        val hasRef = p.predictive && globalBlock == 0
        if (padded.view.slice(off, off + j).forall(_ == 0L)) {
          var run = 1
          while (b + run < segLen &&
            padded.view.slice(off + run * j, off + (run + 1) * j)
              .forall(_ == 0L)) run += 1
          w.put(0L, p.idBits + 1) // zero-run ID: all-zeros ID then '0'
          if (hasRef) w.put(ref, n)
          if (b + run == segLen) w.putFs(4L) // remainder of segment
          else if (run <= 4) w.putFs(run - 1L)
          else w.putFs(run.toLong)
          b += run
        } else {
          encodeBlock(padded, off, j, w, p, n, xmax,
            if (hasRef) Some(ref) else None)
          b += 1
        }
      }
      segStart += segLen
    }
  }

  private def encodeBlock(d: Array[Long], off: Int, j: Int, w: BitW,
                          p: Params, n: Int, xmax: Long,
                          ref: Option[Long]): Unit = {
    val idBits = p.idBits
    val maxId = (1 << idBits) - 1
    val kMax = math.min(maxId - 2, n - 1)
    val t0 = if (ref.isDefined) 1 else 0 // slot 0 is the raw reference
    val coded = j - t0
    // best k-split (k = 0 is the fundamental sequence)
    var bestK = 0
    var bestCost = Long.MaxValue
    var k = 0
    while (k <= kMax) {
      var c = idBits.toLong + (k.toLong + 1) * coded
      var t = t0
      while (t < j) { c += d(off + t) >>> k; t += 1 }
      if (c < bestCost) { bestCost = c; bestK = k }
      k += 1
    }
    // second extension: worthwhile only for near-zero blocks, so cap
    // γ; the pair overlapping a reference slot contributes δ₀ = 0
    var ext2Cost = idBits.toLong + 1
    var pair = 0
    var ext2Ok = true
    val gammas = new Array[Long](j / 2)
    while (ext2Ok && pair < j / 2) {
      val a = if (2 * pair < t0) 0L else d(off + 2 * pair)
      val b = d(off + 2 * pair + 1)
      if (a + b > 4096) ext2Ok = false
      else {
        val g = (a + b) * (a + b + 1) / 2 + b
        gammas(pair) = g
        ext2Cost += g + 1
        pair += 1
      }
    }
    val rawCost = idBits.toLong + n.toLong * coded
    if (ext2Ok && ext2Cost < bestCost && ext2Cost < rawCost) {
      w.put(0L, idBits); w.put(1L, 1)
      ref.foreach(w.put(_, n))
      gammas.foreach(w.putFs)
    } else if (rawCost <= bestCost) {
      w.put(maxId.toLong, idBits)
      ref.foreach(w.put(_, n))
      var t = t0
      while (t < j) { w.put(d(off + t), n); t += 1 }
    } else {
      w.put(bestK + 1L, idBits)
      ref.foreach(w.put(_, n))
      var t = t0
      while (t < j) { w.putFs(d(off + t) >>> bestK); t += 1 }
      if (bestK > 0) {
        t = t0
        while (t < j) {
          w.put(d(off + t) & ((1L << bestK) - 1), bestK); t += 1
        }
      }
    }
  }

  // -------------------------------------------------------- decompress

  /** Inverse of [[compress]]: HDF5-framed szip chunk back to raw bytes. */
  def decompress(framed: Array[Byte], p: Params): Array[Byte] = {
    require(framed.length >= 4, "szip: chunk shorter than its length prefix")
    val origBytes = java.nio.ByteBuffer.wrap(framed, 0, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    require(origBytes >= 0 && origBytes % p.sampleBytes == 0,
      s"szip: bad uncompressed size $origBytes")
    val ns = origBytes / p.sampleBytes
    val r = new BitR(java.util.Arrays.copyOfRange(framed, 4, framed.length))
    val samples = new Array[Long](ns)
    var i = 0
    while (i < ns) {
      val len = math.min(p.pixelsPerScanline, ns - i)
      decodeScanline(samples, i, len, r, p)
      i += len
    }
    fromSamples(samples, p)
  }

  private def decodeScanline(out: Array[Long], start: Int, len: Int,
                             r: BitR, p: Params): Unit = {
    val n = p.bitsPerPixel
    val xmax = (1L << n) - 1
    val j = p.pixelsPerBlock
    // slot layout mirrors the encoder: NN → slot 0 of block 0 is the
    // raw reference, read right after that block's option ID
    val nBlocks = (len + j - 1) / j
    val deltas = new Array[Long](nBlocks * j)
    val idBits = p.idBits
    val maxId = (1 << idBits) - 1
    var ref = 0L
    var block = 0
    var segEnd = math.min(SegBlocks, nBlocks)
    while (block < nBlocks) {
      if (block == segEnd) segEnd = math.min(segEnd + SegBlocks, nBlocks)
      val hasRef = p.predictive && block == 0
      val t0 = if (hasRef) 1 else 0
      val id = r.take(idBits).toInt
      if (id == 0) {
        if (r.take(1) == 0L) { // zero run
          if (hasRef) ref = r.take(n)
          val f = r.takeFs()
          val run =
            if (f == 4L) segEnd - block
            else if (f <= 3L) f.toInt + 1
            else f.toInt
          require(block + run <= segEnd,
            s"szip: zero run $run overruns segment")
          block += run // deltas[] already zero
        } else { // second extension
          if (hasRef) ref = r.take(n)
          var pair = 0
          while (pair < j / 2) {
            val g = r.takeFs()
            // invert γ: the largest m with m(m+1)/2 ≤ γ
            var m = 0L
            while ((m + 1) * (m + 2) / 2 <= g) m += 1
            val b = g - m * (m + 1) / 2
            // a pair overlapping the reference slot only carries δ₁
            if (2 * pair >= t0) deltas(block * j + 2 * pair) = m - b
            deltas(block * j + 2 * pair + 1) = b
            pair += 1
          }
          block += 1
        }
      } else if (id == maxId) { // no compression
        if (hasRef) ref = r.take(n)
        var t = t0
        while (t < j) { deltas(block * j + t) = r.take(n); t += 1 }
        block += 1
      } else { // k-split
        val k = id - 1
        if (hasRef) ref = r.take(n)
        var t = t0
        while (t < j) { deltas(block * j + t) = r.takeFs() << k; t += 1 }
        if (k > 0) {
          t = t0
          while (t < j) { deltas(block * j + t) |= r.take(k); t += 1 }
        }
        block += 1
      }
    }
    if (p.predictive) {
      out(start) = ref
      var t = 1
      while (t < len) {
        out(start + t) = unmapDelta(deltas(t), out(start + t - 1), xmax)
        t += 1
      }
    } else {
      var t = 0
      while (t < len) { out(start + t) = deltas(t); t += 1 }
    }
  }

  // ------------------------------------------------------ byte packing

  private def toSamples(raw: Array[Byte], p: Params): Array[Long] = {
    val sb = p.sampleBytes
    val le = p.littleEndian
    val out = new Array[Long](raw.length / sb)
    var i = 0
    while (i < out.length) {
      var v = 0L
      var b = 0
      while (b < sb) {
        val byte = raw(i * sb + b) & 0xffL
        v |= (if (le) byte << (8 * b) else byte << (8 * (sb - 1 - b)))
        b += 1
      }
      out(i) = v
      i += 1
    }
    out
  }

  private def fromSamples(samples: Array[Long], p: Params): Array[Byte] = {
    val sb = p.sampleBytes
    val le = p.littleEndian
    val out = new Array[Byte](samples.length * sb)
    var i = 0
    while (i < samples.length) {
      var b = 0
      while (b < sb) {
        val sh = if (le) 8 * b else 8 * (sb - 1 - b)
        out(i * sb + b) = ((samples(i) >>> sh) & 0xffL).toByte
        b += 1
      }
      i += 1
    }
    out
  }
}
