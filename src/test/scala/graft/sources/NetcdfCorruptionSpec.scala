package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.NetcdfClassic._

/** Corruption robustness for the classic codec, same contract as
  * H5CorruptionSpec: any single-bit flip must decode or throw a plain
  * Exception promptly — never an OutOfMemoryError from a
  * file-controlled count (classic counts are bounded EXACTLY by the
  * bytes left, since classic data is raw in-file) and never a hang.
  * Covers all three versions: CDF-1 (writer output, incl. a
  * record-variable image built by hand since the writer refuses
  * record dims), CDF-2 (64-bit begins), and CDF-5 (64-bit counts).
  */
class NetcdfCorruptionSpec extends AnyFunSuite {

  private def baseFile: Array[Byte] = NetcdfClassic.write(NcFile(
    dims = Seq(NcDim("t", 3), NcDim("x", 4)),
    attrs = Seq(NcAttr("title", NC_CHAR, text = "corruption net"),
      NcAttr("levels", NC_INT, nums = Seq(1.0, 2.0, 3.0))),
    vars = Seq(
      NcVar("xs", Seq("x"), NC_FLOAT, Nil, Array(0.5, 1.5, 2.5, 3.5)),
      NcVar("v", Seq("t", "x"), NC_DOUBLE,
        Seq(NcAttr("_FillValue", NC_DOUBLE, nums = Seq(-9.0))),
        Array.tabulate(12)(_.toDouble)))))

  private def cdf5File: Array[Byte] = {
    // rebuild the CDF-5 image from NetcdfClassicSpec's layout
    val buf = java.nio.ByteBuffer.allocate(256)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(5.toByte)
    buf.putLong(0L)
    buf.putInt(0x0A).putLong(1L)
    buf.putLong(1L).put('n'.toByte).put(Array[Byte](0, 0, 0)).putLong(2L)
    buf.putInt(0).putLong(0L)
    buf.putInt(0x0B).putLong(2L)
    buf.putLong(1L).put('a'.toByte).put(Array[Byte](0, 0, 0))
    buf.putLong(1L).putLong(0L)
    buf.putInt(0).putLong(0L)
    buf.putInt(NC_INT64).putLong(16L).putLong(188L)
    buf.putLong(1L).put('u'.toByte).put(Array[Byte](0, 0, 0))
    buf.putLong(1L).putLong(0L)
    buf.putInt(0).putLong(0L)
    buf.putInt(NC_USHORT).putLong(4L).putLong(204L)
    buf.putLong(7L).putLong(8L)
    buf.putShort(1.toShort).putShort(2.toShort)
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  private def cdf2File: Array[Byte] = {
    // NetcdfClassicSpec's CDF-2 layout: 64-bit begin offsets
    val buf = java.nio.ByteBuffer.allocate(120)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(2.toByte)
    buf.putInt(0)
    buf.putInt(0x0A).putInt(1)
    buf.putInt(1).put('n'.toByte).put(Array[Byte](0, 0, 0)).putInt(2)
    buf.putInt(0).putInt(0)
    buf.putInt(0x0B).putInt(1)
    buf.putInt(1).put('a'.toByte).put(Array[Byte](0, 0, 0))
    buf.putInt(1).putInt(0)
    buf.putInt(0).putInt(0)
    buf.putInt(NC_DOUBLE).putInt(16).putLong(84L)
    buf.putDouble(3.25).putDouble(-1.0)
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  private def recordFile: Array[Byte] = {
    // NetcdfClassicSpec's record-variable CDF-1 image: t(record) x(2),
    // xs(x) fixed + v(t,x) record, numrecs 3 — exercises the record
    // loop's numrecs/recSize bounds under corruption
    val buf = java.nio.ByteBuffer.allocate(200)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    buf.putInt(3)
    buf.putInt(0x0A).putInt(2)
    buf.putInt(1).put('t'.toByte).put(Array[Byte](0, 0, 0)).putInt(0)
    buf.putInt(1).put('x'.toByte).put(Array[Byte](0, 0, 0)).putInt(2)
    buf.putInt(0).putInt(0)
    buf.putInt(0x0B).putInt(2)
    buf.putInt(2).put('x'.toByte).put('s'.toByte).put(Array[Byte](0, 0))
    buf.putInt(1).putInt(1)
    buf.putInt(0).putInt(0)
    buf.putInt(NC_FLOAT).putInt(8).putInt(132)
    buf.putInt(1).put('v'.toByte).put(Array[Byte](0, 0, 0))
    buf.putInt(2).putInt(0).putInt(1)
    buf.putInt(0).putInt(0)
    buf.putInt(NC_FLOAT).putInt(8).putInt(140)
    buf.putFloat(0.5f).putFloat(1.5f)
    (1 to 6).foreach(i => buf.putFloat(i.toFloat))
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  test("64-bit begin with high bits set fails loudly, never wraps") {
    // CDF-2/5 begins are 64-bit: a corrupt 2^32 + true_begin wraps to
    // true_begin in a bare `.toInt` and decodes the wrong (here, by
    // coincidence the right) region SILENTLY — the variable's extent
    // must be bounded against the file before any positioning. The
    // cdf2 image stores var 'a''s begin=84 as a big-endian u64 at
    // byte 76; setting its high word to 1 makes it 2^32 + 84.
    val b = cdf2File
    assert(b(76 + 7) == 84.toByte, "begin field moved — update offset")
    b(76 + 3) = 1 // begin += 2^32 (low byte of the BE high word)
    val e = intercept[Exception](NetcdfClassic.read(b))
    assert(e.getMessage.contains("outside the"), e.getMessage)
  }

  test("multi-dim element product bounds in Long — a wrapped Int count cannot under-read") {
    // dims [65536, 65537]: the Int product wraps to exactly 65536, a
    // small positive count that would pass every downstream bound and
    // silently return 65536 of the declared ~4.3e9 values; the Long
    // product must refuse loudly against the file length instead
    val buf = java.nio.ByteBuffer.allocate(160)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    buf.putInt(0)
    buf.putInt(0x0A).putInt(2)
    buf.putInt(1).put('a'.toByte).put(Array[Byte](0, 0, 0)).putInt(65536)
    buf.putInt(1).put('b'.toByte).put(Array[Byte](0, 0, 0)).putInt(65537)
    buf.putInt(0).putInt(0)
    buf.putInt(0x0B).putInt(1)
    buf.putInt(1).put('v'.toByte).put(Array[Byte](0, 0, 0))
    buf.putInt(2).putInt(0).putInt(1)
    buf.putInt(0).putInt(0)
    buf.putInt(NC_FLOAT).putInt(100).putInt(100)
    val img = java.util.Arrays.copyOf(buf.array(), buf.position())
    val e = intercept[Exception](NetcdfClassic.read(img))
    assert(e.getMessage.contains("more than the"), e.getMessage)
  }

  test("single-bit flips fail cleanly across CDF-1/2/5 incl. record vars") {
    val images = Seq(baseFile, cdf2File, recordFile, cdf5File)
    val rnd = new scala.util.Random(14L)
    for (img <- images; _ <- 1 to 400) {
      val b = img.clone()
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      try NetcdfClassic.read(b)
      catch { case _: Exception => () }
    }
  }
}
