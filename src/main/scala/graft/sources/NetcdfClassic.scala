package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Pure-JVM codec for the NetCDF classic format (CDF-1 and CDF-2),
  * implementing the public file-format spec
  * (https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html):
  * big-endian header — magic `CDF\x01`/`CDF\x02`, numrecs, dim list
  * (tag 0x0A), global attributes (tag 0x0C), variable list (tag 0x0B)
  * with per-variable begin offsets — then fixed-size variable data at
  * the begins and record variables interleaved per record.
  *
  * This closes the reference's direct-granule ingest (S1/S2,
  * `tilereadingprocessor.py:130-190` `read_grid_data`/`read_swath_data`
  * read granules through a netCDF library): the sandbox has no such
  * library, so the classic subset is implemented from the spec. Data is
  * decoded to doubles (the engine's numeric plane); CHAR variables are
  * exposed as text attributes only. HDF5-backed NetCDF-4 granules go
  * through the sibling [[H5Lite]] codec (same NcFile model);
  * `GranuleIngest.decode` sniffs the magic and dispatches.
  *
  * The same codec WRITES classic files, which serves two roles: test
  * granule synthesis for the ingest specs, and the S9 NetCDF output
  * encoder (`BaseDomsHandler.py:243-334` emits matchup results as
  * NetCDF) in [[ResultsStore]].
  */
object NetcdfClassic {

  val NC_BYTE = 1; val NC_CHAR = 2; val NC_SHORT = 3
  val NC_INT = 4; val NC_FLOAT = 5; val NC_DOUBLE = 6
  // CDF-5 (64-bit data, the PnetCDF format) additions
  val NC_UBYTE = 7; val NC_USHORT = 8; val NC_UINT = 9
  val NC_INT64 = 10; val NC_UINT64 = 11

  private val TAG_DIM = 0x0A
  private val TAG_VAR = 0x0B
  private val TAG_ATT = 0x0C

  /** Dimension; length 0 in a file marks the record dimension (its
    * effective length is numrecs, resolved at read time into `length`
    * with `isRecord = true`).
    */
  case class NcDim(name: String, length: Int, isRecord: Boolean = false)

  /** Attribute: CHAR attrs carry `text`, numeric attrs carry `nums`
    * (decoded to double; `ncType` remembers the stored type).
    */
  /** `groups` (HDF5 vlen-sequence attrs only): the per-datum element
    * counts behind the flattened `nums` — e.g. a DIMENSION_LIST's
    * per-axis reference counts, needed to tell "one scale per axis"
    * from "two scales on axis 0, none on axis 1" (both flatten to the
    * same length). Empty for scalar/fixed attrs.
    */
  case class NcAttr(name: String, ncType: Int, text: String = "",
                    nums: Seq[Double] = Nil, groups: Seq[Int] = Nil) {
    def first: Option[Double] = nums.headOption
  }

  /** Variable: `dims` are names into the file's dimension list, data
    * decoded to doubles in the file's row-major layout (record dim
    * outermost).
    */
  case class NcVar(name: String, dims: Seq[String], ncType: Int,
                   attrs: Seq[NcAttr], data: Array[Double]) {
    def attr(n: String): Option[NcAttr] = attrs.find(_.name == n)
    /** CF-convention unpacking: _FillValue → NaN, then
      * scale_factor/add_offset — same order the reference applies.
      */
    def unpacked: Array[Double] = {
      val fill = attr("_FillValue").flatMap(_.first)
      val scale = attr("scale_factor").flatMap(_.first).getOrElse(1.0)
      val off = attr("add_offset").flatMap(_.first).getOrElse(0.0)
      data.map { x =>
        if (fill.exists(f => f == x) || x.isNaN) Double.NaN
        else x * scale + off
      }
    }
  }

  case class NcFile(dims: Seq[NcDim], attrs: Seq[NcAttr], vars: Seq[NcVar]) {
    def variable(n: String): Option[NcVar] = vars.find(_.name == n)
    def dim(n: String): Option[NcDim] = dims.find(_.name == n)
    /** Shape of a variable (record dim already resolved). */
    def shape(v: NcVar): Seq[Int] = v.dims.map(d => dim(d).get.length)
  }

  private def typeSize(t: Int): Int = t match {
    case NC_BYTE | NC_CHAR | NC_UBYTE => 1
    case NC_SHORT | NC_USHORT => 2
    case NC_INT | NC_FLOAT | NC_UINT => 4
    case NC_DOUBLE | NC_INT64 | NC_UINT64 => 8
    case other => sys.error(s"netcdf: unknown nc_type $other")
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  // ---------------------------------------------------------------- read

  private class Reader(bytes: Array[Byte], wide: Boolean = false) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def int(): Int = buf.getInt()
    /** A NON_NEG field: 32-bit in CDF-1/2, 64-bit in CDF-5. The codec
      * holds whole files in one array, so counts past Int.MaxValue are
      * out of its envelope and fail loudly rather than wrapping.
      */
    def nonneg(): Int = {
      val v = if (wide) buf.getLong() else int().toLong & 0xFFFFFFFFL
      require(v >= 0 && v <= Int.MaxValue,
        s"netcdf: count/size $v outside this codec's 2 GiB envelope")
      v.toInt
    }
    def name(): String = {
      val n = nonneg()
      require(n <= buf.remaining(),
        s"netcdf: name length $n exceeds the ${buf.remaining()} bytes left")
      val b = new Array[Byte](n)
      buf.get(b)
      skipPad(n)
      new String(b, "UTF-8")
    }
    def skipPad(n: Long): Unit = {
      val p = (pad4(n) - n).toInt
      // clamp at EOF: the single-record-variable special case stores
      // record slabs UNPADDED, so a spec-valid file's last slab can
      // end exactly at the buffer limit with no pad bytes to skip
      if (p > 0) buf.position(math.min(buf.limit(), buf.position() + p))
    }
    /** Decode `n` values of `t` at the current position to doubles.
      * Classic data is raw in-file, so the count is bounded EXACTLY by
      * the bytes left — a corrupt count fails loudly instead of
      * driving a file-controlled allocation (same rule as H5Lite).
      */
    def values(t: Int, n: Int): Array[Double] = {
      require(n >= 0 && n.toLong * typeSize(t) <= buf.remaining(),
        s"netcdf: $n values of type $t exceed the ${buf.remaining()} " +
          "bytes left")
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = t match {
          case NC_BYTE => buf.get().toDouble
          case NC_CHAR | NC_UBYTE => (buf.get() & 0xFF).toDouble
          case NC_SHORT => buf.getShort().toDouble
          case NC_USHORT => (buf.getShort() & 0xFFFF).toDouble
          case NC_INT => buf.getInt().toDouble
          case NC_UINT => (buf.getInt() & 0xFFFFFFFFL).toDouble
          case NC_FLOAT => buf.getFloat().toDouble
          case NC_DOUBLE => buf.getDouble()
          case NC_INT64 => buf.getLong().toDouble
          case NC_UINT64 =>
            val l = buf.getLong()
            if (l >= 0) l.toDouble
            else l.toDouble + 1.8446744073709552e19 // above Long.MaxValue
        }
        i += 1
      }
      skipPad(n.toLong * typeSize(t))
      out
    }
    def text(n: Int): String = {
      require(n >= 0 && n <= buf.remaining(),
        s"netcdf: text length $n exceeds the ${buf.remaining()} bytes left")
      val b = new Array[Byte](n)
      buf.get(b)
      skipPad(n)
      // writers NUL-pad char attr values inside the declared length
      new String(b.takeWhile(_ != 0), "UTF-8")
    }
    def attrs(): Seq[NcAttr] = {
      val tag = int(); val count = nonneg()
      require(tag == TAG_ATT || (tag == 0 && count == 0),
        s"netcdf: bad attribute-list tag $tag")
      (0 until count).map { _ =>
        val nm = name()
        val t = int()
        val n = nonneg()
        if (t == NC_CHAR) NcAttr(nm, t, text = text(n))
        else NcAttr(nm, t, nums = values(t, n).toSeq)
      }
    }
  }

  /** Parse a classic NetCDF byte array. `keep` is projection pushdown
    * into the codec: multi-dimensional variables failing the predicate
    * are dropped WITHOUT decoding their payloads (1-D variables —
    * coordinate axes — always decode; they are tiny and needed for dim
    * identity), so ingesting one variable of a 20-variable granule
    * costs one variable's decode, not twenty.
    */
  def read(bytes: Array[Byte], keep: String => Boolean = _ => true): NcFile = {
    require(bytes.length >= 8 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F',
      "netcdf: not a CDF classic file (magic mismatch)")
    val version = bytes(3)
    require(version == 1 || version == 2 || version == 5,
      s"netcdf: unsupported CDF version $version (classic 1/2 and " +
        "CDF-5 64-bit data only — NetCDF-4/HDF5 is a different format)")
    val v5 = version == 5
    val r = new Reader(bytes, wide = v5)
    r.buf.position(4)
    // -1 = STREAMING (computed below); 64-bit in CDF-5
    val numrecsRaw: Int = {
      val raw = if (v5) r.buf.getLong() else r.int().toLong
      require(raw >= -1 && raw <= Int.MaxValue,
        s"netcdf: numrecs $raw outside this codec's envelope")
      raw.toInt
    }

    // dimensions
    val dimTag = r.int(); val dimCount = r.nonneg()
    require(dimTag == TAG_DIM || (dimTag == 0 && dimCount == 0),
      s"netcdf: bad dimension-list tag $dimTag")
    var recDimIdx = -1
    val rawDims = (0 until dimCount).map { i =>
      val nm = r.name(); val len = r.nonneg()
      if (len == 0) recDimIdx = i
      NcDim(nm, len, isRecord = len == 0)
    }

    val gatts = r.attrs()

    // variable headers
    val varTag = r.int(); val varCount = r.nonneg()
    require(varTag == TAG_VAR || (varTag == 0 && varCount == 0),
      s"netcdf: bad variable-list tag $varTag")
    case class VarHdr(name: String, dimIds: Seq[Int], attrs: Seq[NcAttr],
                      ncType: Int, vsize: Long, begin: Long)
    val hdrs = (0 until varCount).map { _ =>
      val nm = r.name()
      val nd = r.nonneg()
      val dimIds = (0 until nd).map(_ => r.nonneg())
      val va = r.attrs()
      val t = r.int()
      val vsize = r.nonneg().toLong
      // OFFSET: 32-bit in CDF-1, 64-bit in CDF-2 and CDF-5
      val begin =
        if (version == 1) r.int().toLong & 0xFFFFFFFFL else r.buf.getLong()
      VarHdr(nm, dimIds, va, t, vsize, begin)
    }

    val recHdrs = hdrs.filter(_.dimIds.headOption.contains(recDimIdx))
    // per-record slab: vsize is the padded per-record size, EXCEPT when
    // there is exactly one record variable (then it is unpadded)
    val recSize = recHdrs.map(_.vsize).sum
    val numrecs =
      if (numrecsRaw >= 0) numrecsRaw
      else if (recHdrs.isEmpty || recSize == 0) 0
      else ((bytes.length - recHdrs.map(_.begin).min) / recSize).toInt

    val dims = rawDims.map(d => if (d.isRecord) d.copy(length = numrecs) else d)

    // elements per record slab (record vars) / total elements (fixed
    // vars): the record dim, if present, is always outermost and is
    // dropped here. The product is overflow-checked in Long and
    // bounded — an Int product would wrap a corrupt multi-dim header
    // to a small positive count that passes every later bound and
    // silently under-reads the variable. The FILE-LENGTH floor (slab
    // data is raw in-file, one byte per element) applies only when
    // the slab exists on disk: fixed vars always, record vars once
    // numrecs >= 1. A header-only file (numrecs == 0 — the state
    // every appending writer passes through before the first record
    // lands) legitimately declares slabs larger than the file; it
    // must decode to zero records, not refuse. The Int ceiling stays
    // unconditional because the count narrows to Int below.
    def slabElems(h: VarHdr): Int = {
      val isRec = h.dimIds.headOption.contains(recDimIdx)
      val ds = if (isRec) h.dimIds.tail else h.dimIds
      val ceil =
        if (!isRec || numrecs > 0) bytes.length.toLong else Int.MaxValue.toLong
      val nL = ds.foldLeft(1L) { (a, i) =>
        val len = rawDims(i).length.toLong
        val p = a * len
        require(len >= 0 && (len == 0 || p / len == a) && p <= ceil,
          s"netcdf: variable '${h.name}' declares " +
            s"${ds.map(rawDims(_).length).mkString("x")} elements — more " +
            s"than the $ceil-byte decode bound")
        p
      }
      nL.max(1L).toInt
    }

    // a corrupt numrecs must fail HERE, before the record loop sizes
    // any output by it — record data is raw in-file, so the exact
    // bound is the file length
    require(recHdrs.isEmpty || numrecs == 0 ||
      (numrecs > 0 && recSize > 0 &&
        numrecs.toLong * recSize <= bytes.length),
      s"netcdf: $numrecs records of $recSize bytes exceed the " +
        s"${bytes.length}-byte file")

    val vars = hdrs.filter(h => h.dimIds.length <= 1 || keep(h.name)).map { h =>
      val isRec = h.dimIds.headOption.contains(recDimIdx)
      val n = slabElems(h)
      // every value of this variable occupies raw in-file bytes, so
      // the total count is bounded exactly by the file length — a
      // corrupt dim or numrecs fails loudly before any allocation
      val totalL = n.toLong * (if (isRec) numrecs.toLong.max(0L) else 1L)
      // divide instead of multiplying: the product could overflow Long
      require(n >= 0 && totalL >= 0 &&
        totalL <= bytes.length.toLong / typeSize(h.ncType),
        s"netcdf: variable '${h.name}' declares $totalL values of type " +
          s"${h.ncType} — more than the ${bytes.length}-byte file holds")
      // `begin` is a 64-bit field in CDF-2/5: a corrupt value of form
      // 2^32*k + small would wrap in `.toInt` and silently decode the
      // wrong region — bound the variable's LAST byte against the
      // file extent before any positioning (this also makes every
      // toInt below exact)
      val lastByte =
        if (!isRec) h.begin + n.toLong * typeSize(h.ncType)
        else if (numrecs <= 0) h.begin
        else h.begin + (numrecs - 1).toLong * recSize +
          n.toLong * typeSize(h.ncType)
      require(h.begin >= 0 && lastByte >= h.begin &&
        lastByte <= bytes.length,
        s"netcdf: variable '${h.name}' at begin=${h.begin} extends to " +
          s"byte $lastByte — outside the ${bytes.length}-byte file")
      val data =
        if (!isRec) {
          r.buf.position(h.begin.toInt)
          val total = n
          r.values(h.ncType, total)
        } else {
          val out = new ArrayBuffer[Double](totalL.toInt)
          (0 until numrecs).foreach { rec =>
            r.buf.position((h.begin + rec * recSize).toInt)
            out ++= r.values(h.ncType, n)
          }
          out.toArray
        }
      NcVar(h.name, h.dimIds.map(rawDims(_).name), h.ncType, h.attrs, data)
    }
    NcFile(dims, gatts, vars)
  }

  // --------------------------------------------------------------- write

  private class Writer {
    val out = new java.io.ByteArrayOutputStream()
    private val scratch = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
    def int(v: Int): Unit = {
      scratch.clear(); scratch.putInt(v)
      out.write(scratch.array(), 0, 4)
    }
    def pad(n: Long): Unit =
      (n until pad4(n)).foreach(_ => out.write(0))
    def name(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      int(b.length); out.write(b); pad(b.length)
    }
    def values(t: Int, vs: Seq[Double]): Unit = {
      vs.foreach { v =>
        scratch.clear()
        t match {
          case NC_BYTE => out.write(v.toByte)
          case NC_CHAR => out.write(v.toInt & 0xFF)
          case NC_SHORT => scratch.putShort(v.toShort); out.write(scratch.array(), 0, 2)
          case NC_INT => scratch.putInt(v.toInt); out.write(scratch.array(), 0, 4)
          case NC_FLOAT => scratch.putFloat(v.toFloat); out.write(scratch.array(), 0, 4)
          case NC_DOUBLE => scratch.putDouble(v); out.write(scratch.array(), 0, 8)
          case other => sys.error(s"netcdf writer: nc_type $other is " +
            "outside the CDF-1 writer subset (classic six types only)")
        }
      }
      pad(vs.length.toLong * typeSize(t))
    }
    def text(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      out.write(b); pad(b.length)
    }
    def attrs(as: Seq[NcAttr]): Unit = {
      if (as.isEmpty) { int(0); int(0) }
      else {
        int(TAG_ATT); int(as.length)
        as.foreach { a =>
          name(a.name)
          int(a.ncType)
          if (a.ncType == NC_CHAR) {
            val b = a.text.getBytes("UTF-8")
            int(b.length); text(a.text)
          } else {
            int(a.nums.length); values(a.ncType, a.nums)
          }
        }
      }
    }
  }

  /** Serialize to CDF-1 bytes. Writer subset: fixed dimensions only (no
    * record dim) — granule synthesis and result encoding never need
    * unbounded appends. Data arrays must match the dim-product length.
    */
  def write(f: NcFile): Array[Byte] = {
    require(!f.dims.exists(_.isRecord), "netcdf write: record dim unsupported")
    // a ZERO length in the header is the record-dim marker — writing a
    // fixed dim as 0 would produce a file that decodes as record-shaped
    f.dims.foreach(d => require(d.length > 0,
      s"netcdf write: dim ${d.name} has length 0 (classic encodes 0 as " +
        "the record dimension; drop the dim/vars instead)"))
    f.vars.foreach { v =>
      // Long product (caller-controlled shapes; an Int wrap could
      // collide with data.length and write a corrupt header)
      val n = v.dims.map(d => f.dim(d).getOrElse(
          sys.error(s"netcdf write: var ${v.name} references unknown dim $d"))
          .length.toLong)
        .product.max(1L)
      require(v.data.length.toLong == n,
        s"netcdf write: var ${v.name} has ${v.data.length} values, shape wants $n")
    }
    val dimIdx = f.dims.zipWithIndex.map { case (d, i) => d.name -> i }.toMap

    // header size dry-run to place the begins
    def attrBytes(as: Seq[NcAttr]): Long =
      8L + as.map { a =>
        val nameB = 4L + pad4(a.name.length)
        val valB =
          if (a.ncType == NC_CHAR) pad4(a.text.getBytes("UTF-8").length)
          else pad4(a.nums.length.toLong * typeSize(a.ncType))
        nameB + 8L + valB
      }.sum
    val dimBytes = 8L + f.dims.map(d => 4L + pad4(d.name.length) + 4L).sum
    val varHdrBytes = 8L + f.vars.map { v =>
      4L + pad4(v.name.length) + 4L + 4L * v.dims.length +
        attrBytes(v.attrs) + 4L + 4L + 4L // type + vsize + begin(CDF-1)
    }.sum
    val headerLen = 4L + 4L + dimBytes + attrBytes(f.attrs) + varHdrBytes

    val sizes = f.vars.map { v =>
      val n = v.dims.map(d => f.dim(d).get.length.toLong).product.max(1L)
      pad4(n * typeSize(v.ncType))
    }
    val begins = sizes.scanLeft(headerLen)(_ + _).init

    val w = new Writer
    w.out.write('C'); w.out.write('D'); w.out.write('F'); w.out.write(1)
    w.int(0) // numrecs
    w.int(TAG_DIM); w.int(f.dims.length)
    f.dims.foreach { d => w.name(d.name); w.int(d.length) }
    w.attrs(f.attrs)
    if (f.vars.isEmpty) { w.int(0); w.int(0) }
    else {
      w.int(TAG_VAR); w.int(f.vars.length)
      f.vars.zip(begins).zip(sizes).foreach { case ((v, begin), vsize) =>
        w.name(v.name)
        w.int(v.dims.length)
        v.dims.foreach(d => w.int(dimIdx(d)))
        w.attrs(v.attrs)
        w.int(v.ncType)
        // CDF-1 stores 32-bit sizes/offsets: a layout past 2 GiB must
        // refuse loudly, not wrap into a corrupt header
        require(vsize <= Int.MaxValue && begin <= Int.MaxValue,
          s"netcdf write: var ${v.name} at begin=$begin size=$vsize " +
            "exceeds the CDF-1 32-bit offset format")
        w.int(vsize.toInt)
        w.int(begin.toInt)
      }
    }
    f.vars.foreach(v => w.values(v.ncType, v.data.toSeq))
    w.out.toByteArray
  }
}
