package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import NetcdfClassic._

class NetcdfClassicSpec extends AnyFunSuite {

  private def grid2x2x2: NcFile = NcFile(
    dims = Seq(NcDim("time", 2), NcDim("lat", 2), NcDim("lon", 2)),
    attrs = Seq(NcAttr("title", NC_CHAR, text = "test granule")),
    vars = Seq(
      NcVar("time", Seq("time"), NC_INT, Nil, Array(1000.0, 2000.0)),
      NcVar("lat", Seq("lat"), NC_FLOAT, Nil, Array(10.0, 20.0)),
      NcVar("lon", Seq("lon"), NC_FLOAT, Nil, Array(-40.0, -30.0)),
      NcVar("sst", Seq("time", "lat", "lon"), NC_DOUBLE,
        Seq(NcAttr("_FillValue", NC_DOUBLE, nums = Seq(-999.0)),
          NcAttr("scale_factor", NC_DOUBLE, nums = Seq(0.5)),
          NcAttr("add_offset", NC_DOUBLE, nums = Seq(100.0))),
        Array(1, 2, 3, -999, 5, 6, 7, 8).map(_.toDouble))))

  test("write → read round-trips dims, attrs, types, and data") {
    val back = NetcdfClassic.read(NetcdfClassic.write(grid2x2x2))
    assert(back.dims.map(d => (d.name, d.length)) ===
      Seq(("time", 2), ("lat", 2), ("lon", 2)))
    assert(back.attrs.head.text === "test granule")
    val sst = back.variable("sst").get
    assert(sst.dims === Seq("time", "lat", "lon"))
    assert(sst.data.toSeq === Seq(1, 2, 3, -999, 5, 6, 7, 8).map(_.toDouble))
    assert(back.variable("lat").get.ncType === NC_FLOAT)
    assert(back.variable("time").get.data.toSeq === Seq(1000.0, 2000.0))
  }

  test("keep predicate prunes multi-D variables without decoding them; " +
    "1-D coordinates always survive") {
    val back = NetcdfClassic.read(NetcdfClassic.write(grid2x2x2),
      keep = Set.empty[String])
    assert(back.variable("sst").isEmpty)
    // coordinate axes (1-D) decode regardless of the predicate
    assert(back.variable("lat").isDefined && back.variable("time").isDefined)
    val kept = NetcdfClassic.read(NetcdfClassic.write(grid2x2x2),
      keep = Set("sst"))
    assert(kept.variable("sst").get.data.length === 8)
  }

  test("unpacked applies _FillValue then scale/offset (CF order)") {
    val sst = NetcdfClassic.read(NetcdfClassic.write(grid2x2x2))
      .variable("sst").get.unpacked
    assert(sst(0) === 100.5) // 1*0.5 + 100
    assert(sst(3).isNaN)     // fill BEFORE scaling
    assert(sst(7) === 104.0)
  }

  test("short/byte variables and numeric attrs survive the round-trip") {
    val f = NcFile(
      dims = Seq(NcDim("n", 3)),
      attrs = Seq(NcAttr("levels", NC_INT, nums = Seq(1.0, 2.0, 3.0))),
      vars = Seq(
        NcVar("s", Seq("n"), NC_SHORT, Nil, Array(-5.0, 0.0, 1234.0)),
        NcVar("b", Seq("n"), NC_BYTE, Nil, Array(-1.0, 7.0, 127.0))))
    val back = NetcdfClassic.read(NetcdfClassic.write(f))
    assert(back.attrs.head.nums === Seq(1.0, 2.0, 3.0))
    assert(back.variable("s").get.data.toSeq === Seq(-5.0, 0.0, 1234.0))
    assert(back.variable("b").get.data.toSeq === Seq(-1.0, 7.0, 127.0))
  }

  /** Hand-built CDF-1 file with a record dimension: t(record), x(2);
    * xs(x) fixed float, v(t, x) record float, numrecs = 3. Exercises
    * the record-interleaving path the writer (fixed-dims-only) cannot
    * synthesize.
    */
  test("reads record variables (interleaved per record)") {
    val buf = ByteBuffer.allocate(200).order(ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    buf.putInt(3) // numrecs
    buf.putInt(0x0A).putInt(2) // dim list
    buf.putInt(1).put('t'.toByte).put(Array[Byte](0, 0, 0)).putInt(0) // t: record
    buf.putInt(1).put('x'.toByte).put(Array[Byte](0, 0, 0)).putInt(2) // x: 2
    buf.putInt(0).putInt(0) // no global attrs
    buf.putInt(0x0B).putInt(2) // var list
    // xs(x) float, begin 132
    buf.putInt(2).put('x'.toByte).put('s'.toByte).put(Array[Byte](0, 0))
    buf.putInt(1).putInt(1) // 1 dim: x
    buf.putInt(0).putInt(0) // no attrs
    buf.putInt(NC_FLOAT).putInt(8).putInt(132)
    // v(t, x) float, begin 140; lone record var => vsize unpadded = 8
    buf.putInt(1).put('v'.toByte).put(Array[Byte](0, 0, 0))
    buf.putInt(2).putInt(0).putInt(1) // dims: t, x
    buf.putInt(0).putInt(0)
    buf.putInt(NC_FLOAT).putInt(8).putInt(140)
    assert(buf.position() === 132, s"layout drifted: ${buf.position()}")
    buf.putFloat(0.5f).putFloat(1.5f) // xs
    (1 to 6).foreach(i => buf.putFloat(i.toFloat)) // 3 records x 2
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())

    val f = NetcdfClassic.read(bytes)
    assert(f.dim("t").get.length === 3 && f.dim("t").get.isRecord)
    assert(f.variable("xs").get.data.toSeq === Seq(0.5, 1.5))
    assert(f.variable("v").get.data.toSeq === (1 to 6).map(_.toDouble))
    assert(f.shape(f.variable("v").get) === Seq(3, 2))
  }

  /** Header-only record file: numrecs = 0 with a per-record slab far
    * larger than the file — the state every appending writer passes
    * through before the first record lands. Must decode to zero
    * records, not refuse (a review pass found the r8 slab bound
    * applied the file-length floor to a slab that never hit disk).
    */
  test("reads a header-only record file (numrecs=0, slab > file)") {
    val buf = ByteBuffer.allocate(120).order(ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    buf.putInt(0) // numrecs = 0
    buf.putInt(0x0A).putInt(2) // dim list
    buf.putInt(1).put('t'.toByte).put(Array[Byte](0, 0, 0)).putInt(0) // t: record
    buf.putInt(1).put('x'.toByte).put(Array[Byte](0, 0, 0)).putInt(1000000) // x: 1M
    buf.putInt(0).putInt(0) // no global attrs
    buf.putInt(0x0B).putInt(1) // var list
    // v(t, x) float: per-record slab = 4 MB >> the ~80-byte file
    buf.putInt(1).put('v'.toByte).put(Array[Byte](0, 0, 0))
    buf.putInt(2).putInt(0).putInt(1) // dims: t, x
    buf.putInt(0).putInt(0)
    buf.putInt(NC_FLOAT).putInt(4000000).putInt(buf.position() + 4)
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())

    val f = NetcdfClassic.read(bytes)
    assert(f.dim("t").get.length === 0 && f.dim("t").get.isRecord)
    assert(f.variable("v").get.data.isEmpty)
    assert(f.shape(f.variable("v").get) === Seq(0, 1000000))
  }

  /** CDF-2 (64-bit offsets): same as CDF-1 but version byte 2 and
    * 8-byte begin fields.
    */
  test("reads CDF-2 (64-bit begin offsets)") {
    val buf = ByteBuffer.allocate(120).order(ByteOrder.BIG_ENDIAN)
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
    assert(buf.position() === 84, s"layout drifted: ${buf.position()}")
    buf.putDouble(3.25).putDouble(-1.0)
    val f = NetcdfClassic.read(java.util.Arrays.copyOf(buf.array(), buf.position()))
    assert(f.variable("a").get.data.toSeq === Seq(3.25, -1.0))
  }

  /** CDF-5 (64-bit data, the PnetCDF format): version byte 5, every
    * NON_NEG count/size is 64-bit, begin offsets 64-bit, and the
    * 64-bit/unsigned types (INT64/USHORT here) decode.
    */
  test("reads CDF-5 (64-bit counts and the extended types)") {
    val buf = ByteBuffer.allocate(256).order(ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(5.toByte)
    buf.putLong(0L) // numrecs (64-bit)
    buf.putInt(0x0A).putLong(1L) // dim list
    buf.putLong(1L).put('n'.toByte).put(Array[Byte](0, 0, 0)).putLong(2L)
    buf.putInt(0).putLong(0L) // no global attrs (ABSENT: 4+8 zeros)
    buf.putInt(0x0B).putLong(2L) // var list
    // a(n) INT64, vsize 16
    buf.putLong(1L).put('a'.toByte).put(Array[Byte](0, 0, 0))
    buf.putLong(1L).putLong(0L) // 1 dim: n
    buf.putInt(0).putLong(0L) // no attrs
    buf.putInt(NC_INT64).putLong(16L).putLong(188L)
    // u(n) USHORT, vsize 4 (2x2, padded to 4)
    buf.putLong(1L).put('u'.toByte).put(Array[Byte](0, 0, 0))
    buf.putLong(1L).putLong(0L)
    buf.putInt(0).putLong(0L)
    buf.putInt(NC_USHORT).putLong(4L).putLong(204L)
    assert(buf.position() === 188, s"layout drifted: ${buf.position()}")
    buf.putLong(-3000000000L).putLong(9007199254740993L)
    buf.putShort(0xFFFE.toShort).putShort(7.toShort)
    val f = NetcdfClassic.read(java.util.Arrays.copyOf(buf.array(), buf.position()))
    assert(f.variable("a").get.ncType === NC_INT64)
    assert(f.variable("a").get.data.toSeq ===
      Seq(-3.0e9, 9007199254740992.0)) // 2^53+1 rounds in the double plane
    assert(f.variable("u").get.data.toSeq === Seq(65534.0, 7.0))
  }

  test("rejects non-CDF and unknown-version magic") {
    intercept[IllegalArgumentException] {
      NetcdfClassic.read("not netcdf at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      NetcdfClassic.read(Array[Byte]('C', 'D', 'F', 3, 0, 0, 0, 0))
    }
    // truncated CDF-5: accepted magic, loud parse failure
    intercept[Exception] {
      NetcdfClassic.read(Array[Byte]('C', 'D', 'F', 5, 0, 0, 0, 0))
    }
  }
}
