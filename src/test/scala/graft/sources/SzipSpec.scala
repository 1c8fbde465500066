package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import NetcdfClassic.{NcDim, NcFile, NcVar}
import NetcdfClassic.{NC_FLOAT, NC_SHORT}

/** Szip (CCSDS 121.0 extended-Rice) codec: every coding option is
  * pinned to a hand-computed bitstream derived straight from the
  * standard's codeword definitions (so conformance does not rest on
  * encode/decode symmetry alone), then fuzz round-trips sweep the
  * parameter space, and the filter is proven inside the HDF5 chunk
  * pipeline end-to-end.
  */
class SzipSpec extends AnyFunSuite {

  private val ecLsb = Szip.Params(Szip.Raw | Szip.EC | Szip.LSB, 8, 8, 16)

  private def framed(orig: Int, bits: Int*) =
    Array[Byte](orig.toByte, 0, 0, 0) ++ bits.map(_.toByte)

  test("zero-run option: all-zero chunk pins to ID 0…0,'0' + FS(ROS)") {
    // 16 zero samples, one scanline, 2 blocks of 8 → a run reaching
    // the segment end: 3-bit zero ID, extension '0', FS(4) = 00001.
    // Bits 0000 00001 → bytes 0x00 0x80.
    val out = Szip.compress(new Array[Byte](16), ecLsb)
    assert(out.toSeq === framed(16, 0x00, 0x80).toSeq)
    assert(Szip.decompress(out, ecLsb).toSeq === Seq.fill(16)(0.toByte))
  }

  test("NN reference sample: constant scanline pins to zero-run ID + in-block ref") {
    // 9 samples of 5 → slots [ref, 8 zero deltas] = 2 blocks, all
    // deltas zero: zero-run ID 0000, then the raw reference 00000101
    // INSIDE the first block (the szip reference-sample insertion),
    // then FS(4) = remainder of segment.
    val p = Szip.Params(Szip.Raw | Szip.NN | Szip.LSB, 8, 8, 9)
    val out = Szip.compress(Array.fill(9)(5.toByte), p)
    assert(out.toSeq === framed(9, 0x00, 0x50, 0x80).toSeq)
    assert(Szip.decompress(out, p).toSeq === Seq.fill(9)(5.toByte))
  }

  test("k-split option: constant-4 block pins to ID k+1 + FS + LSB fields") {
    // 8 samples of 4 (EC): k=1 wins (cost 35); ID=010, eight FS(2)=001
    // codewords, then eight 1-bit low parts (0).
    val p = ecLsb.copy(pixelsPerScanline = 8)
    val out = Szip.compress(Array.fill(8)(4.toByte), p)
    assert(out.toSeq === framed(8, 0x44, 0x92, 0x49, 0x20, 0x00).toSeq)
    assert(Szip.decompress(out, p).toSeq === Seq.fill(8)(4.toByte))
  }

  test("second-extension option: near-zero pairs pin to ID 0…0,'1' + γ FS") {
    // δ = [0,1,0,0,0,0,0,0]: pairs → γ = 2,0,0,0; cost 10 beats FS 12.
    // Bits 000 1 001 1 1 1 → bytes 0x13 0xC0.
    val p = ecLsb.copy(pixelsPerScanline = 8)
    val data = Array[Byte](0, 1, 0, 0, 0, 0, 0, 0)
    val out = Szip.compress(data, p)
    assert(out.toSeq === framed(8, 0x13, 0xC0).toSeq)
    assert(Szip.decompress(out, p).toSeq === data.toSeq)
  }

  test("no-compression option: alternating extremes pin to all-ones ID") {
    // δ alternating 255/0: raw (3+64 bits) beats every split; stream is
    // 67 bits = 9 bytes, starting with ID 111.
    val p = ecLsb.copy(pixelsPerScanline = 8)
    val data = Array.tabulate(8)(i => if (i % 2 == 0) 0xff.toByte else 0.toByte)
    val out = Szip.compress(data, p)
    assert(out.length === 4 + 9)
    assert((out(4) & 0xe0) === 0xe0, "block must open with the all-ones ID")
    assert(Szip.decompress(out, p).toSeq === data.toSeq)
  }

  test("round-trips across widths, modes, byte orders, block and scanline sizes") {
    val rnd = new scala.util.Random(42)
    val masks = Seq(Szip.Raw | Szip.NN | Szip.LSB, Szip.Raw | Szip.EC | Szip.LSB,
      Szip.Raw | Szip.NN | Szip.MSB)
    for {
      bpp <- Seq(8, 16, 32)
      mask <- masks
      j <- Seq(2, 8, 16, 32)
      ppsl <- Seq(1, 7, 16, 129)
      ns <- Seq(0, 1, 5, 127, 500)
    } {
      val p = Szip.Params(mask, bpp, j, ppsl)
      val sb = bpp / 8
      val profile = rnd.nextInt(4)
      val raw = Array.tabulate(ns * sb) { i =>
        profile match {
          case 0 => 0.toByte // zeros
          case 1 => 37.toByte // constant
          case 2 => // smooth ramp in sample space
            val s = i / sb
            (((s * 3) >> (8 * (i % sb))) & 0xff).toByte
          case _ => rnd.nextInt(256).toByte // full-entropy
        }
      }
      val back = Szip.decompress(Szip.compress(raw, p), p)
      assert(back.toSeq === raw.toSeq,
        s"mismatch at bpp=$bpp mask=$mask j=$j ppsl=$ppsl ns=$ns profile=$profile")
    }
  }

  test("NN prediction compresses a smooth 16-bit field well") {
    val ns = 4096
    val raw = new Array[Byte](ns * 2)
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until ns).foreach(i =>
      bb.putShort((20000 + 40 * math.sin(i * 0.01)).toShort))
    val p = Szip.Params(Szip.Raw | Szip.NN | Szip.LSB, 16, 16, 128)
    val out = Szip.compress(raw, p)
    assert(out.length < raw.length / 3,
      s"smooth field compressed ${out.length} of ${raw.length}")
    assert(Szip.decompress(out, p).toSeq === raw.toSeq)
  }

  test("szip-filtered HDF5 chunks round-trip, including edge chunks") {
    val (ny, nx) = (7, 13) // 4×5 chunks clip at both edges
    val data = Array.tabulate(ny * nx)(i => (i % 251).toDouble)
    val f0 = NcFile(Seq(NcDim("y", ny), NcDim("x", nx)), Nil, Seq(
      NcVar("s", Seq("y", "x"), NC_SHORT, Nil, data),
      NcVar("f", Seq("y", "x"), NC_FLOAT, Nil, data)))
    val bytes = H5Lite.write(f0, chunking = Map(
      "s" -> H5Lite.Chunking(Seq(4, 5), deflateLevel = 0, shuffle = false, szip = true),
      "f" -> H5Lite.Chunking(Seq(4, 5), deflateLevel = 0, shuffle = false, szip = true,
        szipPixelsPerBlock = 4)))
    val f = H5Lite.read(bytes)
    assert(f.variable("s").get.data.toSeq === data.toSeq)
    assert(f.variable("f").get.data.toSeq === data.toSeq)
    // the filter actually engaged: a smooth int grid undercuts the
    // unfiltered chunked encoding
    val big = NcFile(Seq(NcDim("y", 40), NcDim("x", 50)), Nil,
      Seq(NcVar("v", Seq("y", "x"), NC_SHORT, Nil,
        Array.tabulate(2000)(i => (i % 7).toDouble))))
    val szipped = H5Lite.write(big, chunking = Map(
      "v" -> H5Lite.Chunking(Seq(8, 50), deflateLevel = 0, shuffle = false, szip = true))).length
    val plain = H5Lite.write(big, chunking = Map(
      "v" -> H5Lite.Chunking(Seq(8, 50), deflateLevel = 0, shuffle = false))).length
    assert(szipped < plain, s"szip $szipped not below unfiltered $plain")
  }

  test("szip excludes deflate/shuffle and 64-bit samples") {
    assertThrows[IllegalArgumentException] {
      H5Lite.Chunking(Seq(2), szip = true) // default deflate+shuffle on
    }
    val f0 = NcFile(Seq(NcDim("n", 4)), Nil, Seq(
      NcVar("d", Seq("n"), NetcdfClassic.NC_DOUBLE, Nil, Array(1.0, 2.0, 3.0, 4.0))))
    assertThrows[IllegalArgumentException] {
      H5Lite.write(f0, chunking = Map("d" ->
        H5Lite.Chunking(Seq(2), deflateLevel = 0, shuffle = false, szip = true)))
    }
  }
}
