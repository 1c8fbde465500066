package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

import NetcdfClassic.{NcAttr, NcDim, NcFile, NcVar}
import NetcdfClassic.{NC_BYTE, NC_CHAR, NC_DOUBLE, NC_FLOAT, NC_INT, NC_SHORT}

/** Pure-JVM codec for a documented subset of the HDF5 file format —
  * the container behind NetCDF-4 granules — implemented from the
  * public specification
  * (https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html). This closes
  * the reference's NetCDF-4 ingest path (S1/S2: the reference's
  * `tilereadingprocessor.py:130-190` reads both classic and
  * HDF5-backed granules through libnetcdf; the sandbox has no HDF5
  * library, so the subset a gridded granule actually exercises is
  * implemented directly).
  *
  * READ subset — the layout default libnetcdf/libhdf5 produce:
  *  - superblock v0/v1 (symbol-table root) and v2/v3 (direct root
  *    object header; trailing checksums are not verified)
  *  - object headers v1 (with continuation blocks) and v2 (`OHDR`)
  *  - groups via symbol-table message (B-tree v1 + SNOD + local heap),
  *    compact link messages, or DENSE link storage (Link Info message →
  *    fractal heap of link messages + v2 B-tree name index — the
  *    layout libhdf5 switches to above ~8 links per group; heaps may
  *    nest indirect blocks to any depth and be filter-compressed, and
  *    the v2 B-tree walks at any depth); nested groups flatten to
  *    `g/var` names
  *  - datatypes: fixed-point (1/2/4/8-byte, signed/unsigned, LE/BE),
  *    IEEE float (4/8-byte, LE/BE), fixed strings (attributes)
  *  - dataspaces v1/v2 (simple, any rank)
  *  - data layout v3: compact, contiguous, and chunked (B-tree v1
  *    chunk index) with the deflate (java.util.zip), shuffle,
  *    fletcher32 (checksum VERIFIED on read — a corrupt block fails
  *    loudly) and szip ([[Szip]], CCSDS 121.0 extended-Rice) filters
  *  - attribute messages v1/v2/v3 (numeric and fixed-string values),
  *    both compact (0x0C messages) and DENSE (Attribute Info message →
  *    fractal heap + type-8 v2 B-tree, libhdf5's layout above ~8
  *    attributes — ordinary CF metadata exceeds that)
  *  - variable-length attribute values through the global heap
  *    (GCOL collections): vlen strings (netCDF-4 NC_STRING attrs)
  *    and vlen sequences incl. object references — a DIMENSION_LIST
  *    resolves to the dimension-scale datasets it references, giving
  *    variables REAL shared dim identity (synthetic per-variable
  *    names remain the fallback when no list is present)
  *
  * WRITE subset (fixture synthesis + round-trip proof): superblock v0,
  * v1 object headers, one symbol-table root group (or a dense root:
  * fractal heap + v2 B-tree, optionally deflate-filtered under an
  * indirect root block), contiguous or chunked+shuffle+deflate
  * datasets, v1 attributes — each structure emitted exactly as the
  * spec draws it, so the files are valid for any real HDF5 reader,
  * not just this one.
  *
  * Decoded variables map onto the [[NetcdfClassic.NcFile]] model (data
  * as doubles, CF unpacking via `NcVar.unpacked`), so the granule
  * ingest path is format-agnostic. Compound attribute values (incl.
  * vlen-of-compound, netCDF-4's REFERENCE_LIST shape) flatten to
  * their numeric members; compound-typed DATASETS (trajectory/profile
  * in-situ records) surface each scalar numeric member as its own
  * `<dataset>.<member>` variable over the dataset's dims, in any
  * layout/filter combination. Fractal-heap objects resolve in all
  * three storage classes (managed, huge direct/indirect
  * filtered-or-not, tiny), soft links resolve their in-file paths,
  * and EXTERNAL (cross-file) links resolve through the `resolve`
  * hook of [[read]] — absent a resolver (or the target file) they
  * drop exactly as h5py does.
  */
object H5Lite {

  private val SIG: Array[Byte] =
    Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val UNDEF = -1L

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == SIG(i))

  // datatype classes
  private val C_FIXED = 0
  private val C_FLOAT = 1
  private val C_STRING = 3
  private val C_COMPOUND = 6
  private val C_REFERENCE = 7
  private val C_VLEN = 9

  /** A structure the read subset doesn't model (vlen/compound/reference
    * datatypes, exotic dataspaces) — catchable so attribute decoding
    * can degrade to an empty attr instead of aborting the granule.
    */
  private final class UnsupportedH5(msg: String) extends RuntimeException(msg)

  /** `members` (compound only): (name, byte offset in element, type). */
  private case class Dtype(clazz: Int, size: Int, le: Boolean, signed: Boolean,
                           vlenString: Boolean = false,
                           base: Option[Dtype] = None,
                           members: Seq[(String, Int, Dtype)] = Nil)
  /** `v4Index`: the version-4 layout's chunk index (HDF5 1.10+,
    * libver-LATEST writers): 1 = single chunk, 2 = implicit,
    * 3 = fixed array; None = the classic v1-B-tree walk.
    */
  private case class V4Index(indexType: Int, flags: Int,
                             singleSize: Long = UNDEF,
                             singleMask: Long = 0,
                             pageBits: Int = 0)
  private case class Layout(clazz: Int, addr: Long = UNDEF, size: Long = 0,
                            chunkDims: Seq[Int] = Nil, compactPos: Long = UNDEF,
                            v4Index: Option[V4Index] = None)
  private case class Filter(id: Int, clientValues: Seq[Long])
  private case class Dataset(name: String, dims: Seq[Long], dtype: Dtype,
                             layout: Layout, filters: Seq[Filter],
                             attrs: Seq[NcAttr], ohAddr: Long)

  // ------------------------------------------------------------------ read

  private class R(val bytes: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // EVERY file-controlled 64-bit position funnels through here: a
    // bare pos.toInt would wrap 2^32 + k to k — a VALID position — and
    // silently decode the wrong region (the class of defect reviews
    // kept finding one site at a time; bounding centrally closes it)
    def at(pos: Long): Unit = {
      require(pos >= 0 && pos <= bytes.length,
        s"h5: position $pos outside the ${bytes.length}-byte file")
      buf.position(pos.toInt)
    }
    def pos: Long = buf.position().toLong
    def u8(): Int = buf.get() & 0xff
    def u16(): Int = buf.getShort() & 0xffff
    def u32(): Long = buf.getInt() & 0xffffffffL
    def u64(): Long = buf.getLong()
    def skip(n: Int): Unit = buf.position(buf.position() + n)
    def take(n: Int): Array[Byte] = { val b = new Array[Byte](n); buf.get(b); b }
    // the Long-length twin for file-controlled sizes: bounds BEFORE
    // the Int narrow (take(sz.toInt) on a wrapped size reads a small
    // prefix silently instead of refusing)
    def takeL(n: Long): Array[Byte] = {
      require(n >= 0 && n <= buf.remaining(),
        s"h5: read of $n bytes at ${buf.position()} exceeds the " +
          s"${bytes.length}-byte file")
      take(n.toInt)
    }
    def sig4(pos: Long, s: String): Boolean =
      pos >= 0 && pos + 4 <= bytes.length && pos + 4 > pos &&
        s.zipWithIndex.forall { case (c, i) => bytes(pos.toInt + i) == c.toByte }
    def cstring(pos: Long): String = {
      require(pos >= 0 && pos <= bytes.length,
        s"h5: string position $pos outside the ${bytes.length}-byte file")
      var e = pos.toInt
      while (e < bytes.length && bytes(e) != 0) e += 1
      new String(bytes, pos.toInt, e - pos.toInt, "UTF-8")
    }
  }

  /** Parse HDF5 bytes into the engine's NcFile model. `keep` is
    * projection pushdown into the codec (same contract as
    * [[NetcdfClassic.read]]): multi-dimensional variables failing the
    * predicate are dropped WITHOUT decoding — their chunks are never
    * read, inflated, or unfiltered — while 1-D variables (coordinate
    * axes / dimension scales) always decode, keeping shared dim
    * identity intact.
    *
    * `resolve` answers EXTERNAL (cross-file) links: given the link's
    * target file name it returns that file's bytes, or None to drop
    * the link (exactly how h5py behaves when the target file is
    * absent). Resolved targets are parsed recursively (depth-capped)
    * with projection pushed to the linked subtree, and their datasets
    * surface under the link's name with synthetic per-variable dims.
    */
  def read(bytes: Array[Byte], keep: String => Boolean = _ => true,
           resolve: String => Option[Array[Byte]] = _ => None): NcFile =
    readDepth(bytes, keep, resolve, extDepth = 0)

  private def readDepth(bytes: Array[Byte], keep: String => Boolean,
                        resolve: String => Option[Array[Byte]],
                        extDepth: Int): NcFile = {
    require(isHdf5(bytes), "h5: not an HDF5 file (signature mismatch)")
    val r = new R(bytes)
    r.at(8)
    val sbVersion = r.u8()
    val rootOh: Long = sbVersion match {
      case 0 | 1 =>
        r.skip(3) // freespace/root-group versions + reserved
        r.skip(1) // shared header message version
        val soff = r.u8(); val slen = r.u8()
        require(soff == 8 && slen == 8,
          s"h5: unsupported offset/length sizes $soff/$slen (8/8 only)")
        r.skip(1) // reserved
        r.u16(); r.u16() // group leaf/internal k
        if (sbVersion == 1) { r.u16(); r.u16() } // indexed-storage k + reserved
        r.u32() // consistency flags
        r.skip(32) // base, free-space, EOF, driver-info addresses
        // root group symbol table entry
        r.u64() // link name offset
        r.u64() // object header address
      case 2 | 3 =>
        val soff = r.u8(); val slen = r.u8()
        require(soff == 8 && slen == 8,
          s"h5: unsupported offset/length sizes $soff/$slen (8/8 only)")
        r.u8() // consistency flags
        r.u64() // base address
        r.u64() // superblock extension
        r.u64() // EOF
        r.u64() // root object header address (checksum follows, unverified)
      case v => sys.error(s"h5: unsupported superblock version $v")
    }
    val sets = ArrayBuffer.empty[Dataset]
    val rootAttrs = ArrayBuffer.empty[NcAttr]
    // externally-linked variables arrive fully decoded from the
    // target file's own read: (name under OUR tree, var, shape)
    val extVars = ArrayBuffer.empty[(String, NcVar, Seq[Int])]
    walkObject(r, rootOh, "", sets, rootAttrs, isRoot = true,
      root = rootOh, onPath = Set(rootOh),
      ext = ExtCtx(resolve, extDepth, extVars, keep))

    // dim identity: a DIMENSION_LIST attribute (vlen of object
    // references, resolved through the global heap) names the
    // dimension-scale dataset backing each axis — use those REAL dim
    // names, shared across variables, when every reference resolves
    // and lengths agree; otherwise fall back to synthetic
    // per-variable names (`<var>_d<i>`)
    val dsByAddr: Map[Long, Dataset] = sets.map(d => d.ohAddr -> d).toMap
    // pre-pass: every 1-D dataset some DIMENSION_LIST references is a
    // dimension scale — its own name IS a dim name, so the coordinate
    // variable itself (which carries no DIMENSION_LIST) adopts it too
    val scaleDims: Map[String, Int] = sets.flatMap(
      _.attrs.find(_.name == "DIMENSION_LIST").toSeq.flatMap(_.nums))
      .flatMap(a => dsByAddr.get(a.toLong))
      .filter(_.dims.length == 1)
      .map(ds => ds.name -> ds.dims.head.toInt).toMap
    val dims = ArrayBuffer.empty[NcDim]
    def addDim(nm: String, len: Int): Unit =
      if (!dims.exists(_.name == nm)) dims += NcDim(nm, len)
    // a compound dataset's addressable variables are member-qualified
    // (`<ds>.<member>`), so projection pushdown must match those names
    // too or a multi-dim compound dataset is unreachable under keep().
    // Only DECODABLE members count — admitting a dataset for a
    // string/reference member would walk and inflate every chunk to
    // emit nothing
    val vars = sets.filter(d => d.dims.length <= 1 || keep(d.name) ||
      (d.dtype.clazz == C_COMPOUND && d.dtype.members.exists {
        case (nm, _, m) => (m.clazz == C_FIXED || m.clazz == C_FLOAT) &&
          keep(s"${d.name}.$nm")
      })).flatMap { d =>
      // use real dim identity only when the list is unambiguous:
      // exactly one reference per axis (multi-scale or scale-less axes
      // flatten to a different count), every reference a 1-D dataset
      // whose OWN length equals the axis length (HDF5 does not enforce
      // scale length == axis length), names distinct within the
      // variable, and no conflict with an already-registered dim —
      // anything else falls back to synthetic per-variable names
      val fromList: Option[Seq[String]] =
        d.attrs.find(_.name == "DIMENSION_LIST")
          // per-axis counts must be exactly 1: a multi-scale axis next
          // to a scale-less one flattens to the same total as one-per-
          // axis, so the flat length alone cannot catch the mismatch
          .filter(a => a.groups.isEmpty || a.groups.forall(_ == 1))
          .map(_.nums.map(a => dsByAddr.get(a.toLong)))
          .filter(_.length == d.dims.length)
          .filter(_.forall(_.exists(_.dims.length == 1)))
          .map(_.map(_.get))
          .filter { scales =>
            scales.zip(d.dims).forall { case (s, len) => s.dims.head == len } &&
              scales.map(_.name).distinct.length == scales.length
          }
          .map(_.map(_.name))
          .orElse {
            // the dimension-scale dataset itself: 1-D, named like the
            // dim it defines, same length
            if (d.dims.length == 1 && scaleDims.get(d.name)
              .contains(d.dims.head.toInt)) Some(Seq(d.name))
            else None
          }
      val resolved = fromList.filter { names =>
        // validate against already-registered dims BEFORE mutating, so
        // a partial mismatch can't leave orphan dim entries behind
        names.zip(d.dims).forall { case (nm, len) =>
          dims.find(_.name == nm).forall(_.length == len.toInt)
        }
      }
      resolved.foreach(_.zip(d.dims).foreach { case (nm, len) =>
        addDim(nm, len.toInt)
      })
      val dimNames = resolved.getOrElse {
        d.dims.zipWithIndex.map { case (len, i) =>
          val nm = s"${d.name}_d$i"
          addDim(nm, len.toInt)
          nm
        }
      }
      if (d.dtype.clazz == C_COMPOUND) {
        // compound-typed DATASET (trajectory/profile in-situ files):
        // each scalar numeric member becomes its own `<ds>.<member>`
        // variable over the dataset's dims — the columnar shape the
        // engine's point model wants. Strings/references/nested
        // compounds are skipped; a record with NO decodable member is
        // a loud failure, not a silent empty variable. All kept
        // members decode in ONE pass over the dataset (chunks are
        // walked/inflated/checksummed once, not once per member), so
        // decode cost scales with data, not member count.
        val ms = d.dtype.members.filter { case (_, _, m) =>
          m.clazz == C_FIXED || m.clazz == C_FLOAT
        }
        if (ms.isEmpty) throw new UnsupportedH5(
          s"h5: compound dataset '${d.name}' has no scalar numeric members")
        ms.foreach { case (nm, off, m) =>
          if (off < 0 || m.size < 0 || off > d.dtype.size - m.size)
            throw new UnsupportedH5(s"h5: compound member '$nm' at $off " +
              s"size ${m.size} outside element ${d.dtype.size}")
        }
        // member-level projection: a multi-dim dataset kept only via
        // member-qualified names decodes just those members
        val kept =
          if (d.dims.length <= 1 || keep(d.name)) ms
          else ms.filter { case (nm, _, _) => keep(s"${d.name}.$nm") }
        if (kept.isEmpty) Nil // defensive: never read storage for nothing
        else {
          val datas = readDataMembers(r, d,
            kept.map { case (_, off, m) => (off, m) })
          kept.zip(datas).map { case ((nm, _, m), data) =>
            NcVar(s"${d.name}.$nm", dimNames.toSeq, ncTypeOf(m), d.attrs,
              data)
          }
        }
      } else Seq(
        NcVar(d.name, dimNames.toSeq, ncTypeOf(d.dtype), d.attrs,
          readData(r, d)))
    }
    // external-link variables: synthetic per-variable dims (the target
    // file's dim names must not collide with — or silently alias —
    // this file's), keep() applied to the name under OUR tree
    val external = extVars.toSeq
      .filter { case (nm, _, shape) => shape.length <= 1 || keep(nm) }
      .map { case (nm, v, shape) =>
        val dimNames = shape.zipWithIndex.map { case (len, i) =>
          val dn = s"${nm}_d$i"
          addDim(dn, len)
          dn
        }
        v.copy(name = nm, dims = dimNames)
      }
    NcFile(dims.toSeq, rootAttrs.toSeq, vars.toSeq ++ external)
  }

  /** Messages of one object header, following continuations. Returns
    * (type, bodyPos, bodySize) triples.
    */
  private def headerMessages(r: R, addr: Long): Seq[(Int, Long, Int)] = {
    val out = ArrayBuffer.empty[(Int, Long, Int)]
    if (r.sig4(addr, "OHDR")) { // version 2
      r.at(addr + 4)
      val ver = r.u8()
      require(ver == 2, s"h5: bad OHDR version $ver")
      val flags = r.u8()
      if ((flags & 0x20) != 0) r.skip(16) // times
      if ((flags & 0x10) != 0) r.skip(4) // max-compact / min-dense
      val sizeBytes = 1 << (flags & 0x3)
      def chunkSize(): Long = sizeBytes match {
        case 1 => r.u8().toLong
        case 2 => r.u16().toLong
        case 4 => r.u32()
        case _ => r.u64()
      }
      val creationTracked = (flags & 0x4) != 0
      // consume the size field BEFORE taking the position: messages
      // start right after it (tuple args evaluate left-to-right, so
      // (r.pos, chunkSize()) would anchor the block at the size field
      // itself — off by 1/2/4/8 bytes depending on flags).
      // Size-of-chunk-0 counts the MESSAGE region only — the 4-byte
      // checksum follows it (verified against real libhdf5 granules:
      // the last message ends exactly at start+size, checksum after).
      // A continuation message's length, by contrast, covers the whole
      // OCHK block INCLUDING its signature and checksum. Each block
      // entry therefore carries its exact message-region END.
      val firstChunkSize = chunkSize()
      var blocks = List((r.pos, r.pos + firstChunkSize))
      while (blocks.nonEmpty) {
        val (start, end) = blocks.head
        blocks = blocks.tail
        r.at(start)
        while (r.pos + 4 <= end) {
          val t = r.u8()
          val sz = r.u16()
          r.u8() // message flags
          if (creationTracked) r.skip(2)
          val body = r.pos
          if (t == 0x10) {
            r.at(body)
            val off = r.u64(); val clen = r.u64()
            // OCHK: signature(4) + messages + checksum(4)
            blocks = (off + 4, off + clen - 4) :: blocks
          } else if (t != 0) out += ((t, body, sz))
          r.at(body + sz)
        }
      }
    } else { // version 1
      r.at(addr)
      val ver = r.u8()
      require(ver == 1, s"h5: bad object header version $ver at $addr")
      r.skip(1)
      var remaining = r.u16() // total message count
      r.u32() // reference count
      val hdrSize = r.u32()
      r.skip(4) // pad to 8
      var blocks = List((addr + 16, hdrSize))
      while (blocks.nonEmpty && remaining > 0) {
        val (start, len) = blocks.head
        blocks = blocks.tail
        r.at(start)
        val end = start + len
        while (remaining > 0 && r.pos + 8 <= end) {
          val t = r.u16()
          val sz = r.u16()
          r.u8(); r.skip(3)
          val body = r.pos
          remaining -= 1
          if (t == 0x10) {
            r.at(body)
            val off = r.u64(); val clen = r.u64()
            blocks = (off, clen) :: blocks
          } else if (t != 0) out += ((t, body, sz))
          r.at(body + sz)
        }
      }
    }
    out.toSeq
  }

  /** Recursively collect datasets under an object (group or dataset).
    * `root` anchors absolute soft-link paths; `onPath` is the set of
    * object addresses on the CURRENT descent, breaking soft-link
    * cycles (a link aliasing an ancestor group would otherwise recurse
    * forever).
    */
  /** External-link context threaded through the group walk: the
    * cross-file resolver, the recursion depth (cycles between files
    * are capped, not chased), and the output buffer of resolved vars.
    */
  private final case class ExtCtx(
      resolve: String => Option[Array[Byte]], depth: Int,
      out: ArrayBuffer[(String, NcVar, Seq[Int])],
      keep: String => Boolean)

  private def walkObject(r: R, addr: Long, prefix: String,
                         sets: ArrayBuffer[Dataset], rootAttrs: ArrayBuffer[NcAttr],
                         isRoot: Boolean, root: Long,
                         onPath: Set[Long], ext: ExtCtx): Unit = {
    val msgs = headerMessages(r, addr)
    val byType = msgs.groupBy(_._1)
    val isDataset = byType.contains(0x08)
    if (isDataset) {
      val (_, dsPos, _) = byType(0x01).head
      r.at(dsPos); val dims = parseDataspace(r)
      val (_, dtPos, _) = byType(0x03).head
      r.at(dtPos); val dt = parseDatatype(r)
      val (_, loPos, _) = byType(0x08).head
      r.at(loPos); val layout = parseLayout(r)
      val filters = byType.get(0x0B).map { m =>
        r.at(m.head._2); parseFilters(r)
      }.getOrElse(Nil)
      val attrs = byType.getOrElse(0x0C, Nil).map { case (_, p, _) =>
        r.at(p); parseAttr(r, r)
      } ++ byType.getOrElse(0x15, Nil).flatMap { case (_, p, _) =>
        r.at(p); denseAttrs(r) // dense attribute storage (>~8 attrs)
      }
      sets += Dataset(prefix.stripPrefix("/"), dims, dt, layout, filters,
        attrs, addr)
    } else {
      // group: children from a symbol-table message and/or link messages
      if (isRoot) {
        byType.getOrElse(0x0C, Nil).foreach { case (_, p, _) =>
          r.at(p); rootAttrs += parseAttr(r, r)
        }
        byType.getOrElse(0x15, Nil).foreach { case (_, p, _) =>
          r.at(p); rootAttrs ++= denseAttrs(r)
        }
      }
      groupChildren(r, byType).foreach {
        case (nm, External(file, objPath)) =>
          // cross-file link: parse the target file on its own (its
          // superblock, heaps, and addresses are its own address
          // space) with projection pushed to the linked subtree, then
          // graft the result under this link's name. Unresolvable
          // targets drop like h5py's missing-file behavior; cycles
          // between files stop at the depth cap.
          if (ext.depth < 4) ext.resolve(file).filter(isHdf5).foreach { tb =>
            val obj = objPath.stripPrefix("/").stripSuffix("/")
            // path of a target-file variable UNDER our link name ("/"
            // root links keep their separator; members keep their dot)
            def graft(vn: String): Option[String] = {
              val rest =
                if (obj.isEmpty) Some("/" + vn)
                else if (vn == obj) Some("")
                else if (vn.startsWith(obj + "/") || vn.startsWith(obj + "."))
                  Some(vn.drop(obj.length))
                else None
              rest.map(t => (s"$prefix/$nm" + t).stripPrefix("/"))
            }
            // compose the CALLER's projection into the sub-read (it
            // gates multi-dim datasets only, exactly like here), so a
            // pruned external dataset's chunks are never read at all
            val sub = readDepth(tb,
              v => graft(v).exists(ext.keep), ext.resolve, ext.depth + 1)
            sub.vars.foreach { v =>
              graft(v.name).foreach { ourName =>
                ext.out += ((ourName, v, sub.shape(v)))
              }
            }
          }
        case (nm, link) =>
          resolveLink(r, link, addr, root, depth = 0).foreach { a =>
            if (!onPath.contains(a))
              walkObject(r, a, s"$prefix/$nm".stripPrefix("/"), sets,
                rootAttrs, isRoot = false, root, onPath + a, ext)
          }
      }
    }
  }

  /** The children of one group object, from whichever storage its
    * header uses: symbol-table message (B-tree v1 + SNOD + local
    * heap), compact link messages, or dense storage (Link Info →
    * fractal heap + v2 B-tree — the layout libhdf5 switches to above
    * ~8 links per group).
    */
  private def groupChildren(r: R, byType: Map[Int, Seq[(Int, Long, Int)]]): Seq[(String, Link)] = {
    val children = ArrayBuffer.empty[(String, Link)]
    byType.get(0x11).foreach { m =>
      r.at(m.head._2)
      val btree = r.u64(); val heap = r.u64()
      children ++= symbolTableChildren(r, btree, heap)
        .map { case (nm, a) => (nm, Hard(a)) }
    }
    byType.getOrElse(0x06, Nil).foreach { case (_, p, _) =>
      r.at(p)
      parseLink(r).foreach(children += _)
    }
    byType.get(0x02).foreach { m =>
      r.at(m.head._2)
      children ++= denseLinks(r)
    }
    children.toSeq
  }

  /** A link's object-header address: hard links carry it; soft links
    * walk their slash path group by group — absolute from the root,
    * relative from the group holding the link — resolving nested soft
    * links up to a fixed depth. Every component except `.` (current
    * group, the ONE special name HDF5 traversal defines) is a literal
    * link-name lookup: HDF5 has no `..` notion (objects can have
    * multiple parents, so "up" is ambiguous — the format deliberately
    * omits it), and libhdf5/h5py resolve `..` as an ordinary name
    * that is normally absent, dropping the link as dangling; this
    * walker matches that. Unresolvable or too-deep paths drop the
    * link the same way.
    */
  private def resolveLink(r: R, link: Link, holder: Long, root: Long,
                          depth: Int): Option[Long] = link match {
    case Hard(a) => Some(a)
    case _ if depth > 16 => None
    // a soft-link PATH that crosses a file boundary has no in-file
    // address — dropped (externals are resolved as direct group
    // children in walkObject, where the other file's space exists)
    case _: External => None
    case Soft(path) =>
      val parts = path.split("/").filter(p => p.nonEmpty && p != ".")
      var at = if (path.startsWith("/")) root else holder
      for (part <- parts) {
        val byType = headerMessages(r, at).groupBy(_._1)
        groupChildren(r, byType).find(_._1 == part) match {
          case Some((_, l)) =>
            resolveLink(r, l, at, root, depth + 1) match {
              case Some(a) => at = a
              case None => return None
            }
          case None => return None
        }
      }
      Some(at)
  }

  private def symbolTableChildren(r: R, btree: Long, heap: Long): Seq[(String, Long)] = {
    require(r.sig4(heap, "HEAP"), s"h5: bad local heap at $heap")
    r.at(heap + 8)
    r.u64() // data segment size
    r.u64() // free-list head
    val heapData = r.u64()
    val out = ArrayBuffer.empty[(String, Long)]
    def walkNode(addr: Long): Unit = {
      require(r.sig4(addr, "TREE"), s"h5: bad group B-tree node at $addr")
      r.at(addr + 4)
      val nodeType = r.u8(); val level = r.u8(); val used = r.u16()
      require(nodeType == 0, s"h5: group B-tree has node type $nodeType")
      r.u64(); r.u64() // siblings
      // interleaved key0 child0 key1 ... — keys are heap offsets
      val children = (0 until used).map { _ => r.u64(); r.u64() }
      r.u64() // final key
      children.foreach { c =>
        if (level > 0) walkNode(c)
        else { // SNOD leaf
          require(r.sig4(c, "SNOD"), s"h5: bad symbol node at $c")
          r.at(c + 4)
          r.u8(); r.u8()
          val n = r.u16()
          val entries = (0 until n).map { _ =>
            val nameOff = r.u64(); val oh = r.u64()
            r.u32(); r.u32(); r.skip(16)
            (nameOff, oh)
          }
          entries.foreach { case (off, oh) =>
            out += ((r.cstring(heapData + off), oh))
          }
        }
      }
    }
    walkNode(btree)
    out.toSeq
  }

  /** Link Info message (type 0x02, spec §IV) → dense-group children.
    * The fractal heap (§III.G) stores each link message as a managed
    * heap object; the v2 B-tree (§III.A.2, record type 5: link-name
    * hash index) stores the heap IDs. Reading every B-tree record and
    * resolving its heap ID reproduces exactly the link set, no hash
    * verification needed.
    */
  private def denseLinks(r: R): Seq[(String, Link)] = {
    val ver = r.u8()
    require(ver == 0, s"h5: bad link info version $ver")
    val flags = r.u8()
    if ((flags & 0x1) != 0) r.skip(8) // max creation index
    val fheap = r.u64()
    val nameIdx = r.u64()
    // creation-order index address (flags & 0x2) is never read — name
    // order is irrelevant to the NcFile model
    if (fheap == UNDEF) Nil // dense storage declared but never allocated
    else {
      val heap = new FractalHeap(r, fheap)
      val ids = btree2HeapIds(r, nameIdx)
      ids.flatMap(id => parseLink(heap.objectAt(id)))
    }
  }

  /** Managed-object view of one fractal heap (§III.G): header + direct
    * blocks reachable through any depth of indirect blocks, with the
    * optional per-block I/O filter pipeline (deflate, fletcher32)
    * applied. The doubling table is self-similar: inside every indirect
    * block, rows 0 and 1 use the starting block size, row i ≥ 2 doubles
    * per row; rows whose size exceeds the max direct size hold child
    * indirect blocks, each subdividing its span with the same table
    * from the start (so a child spanning S has
    * log2(S) − log2(start·width) + 1 rows).
    */
  private final class FractalHeap(r: R, addr: Long) {
    require(r.sig4(addr, "FRHP"), s"h5: bad fractal heap header at $addr")
    r.at(addr + 4)
    require(r.u8() == 0, "h5: bad fractal heap version")
    private val heapIdLen = r.u16()
    private val ioFilterLen = r.u16()
    r.u8() // flags (direct-block checksums — not verified, like all tails)
    r.u32() // max managed object size
    r.u64() // next huge id
    private val hugeBtAddr = r.u64() // huge-object v2 B-tree address
    r.u64(); r.u64() // free space, free-space manager address
    r.u64(); r.u64() // managed space, allocated space
    r.u64() // direct-block iterator offset
    r.u64() // managed object count
    r.skip(32) // huge size/count, tiny size/count
    private val tableWidth = r.u16()
    private val startBlockSize = r.u64()
    private val maxDirectSize = r.u64()
    private val maxHeapBits = r.u16()
    r.u16() // starting rows in root indirect block
    private val rootAddr = r.u64()
    private val curRootRows = r.u16()
    // with filters the header ALWAYS carries the stored size + mask of
    // the root direct block, then the pipeline message body — the two
    // fields are present whenever the I/O filter length is non-zero,
    // even when the root is an indirect block or unallocated (libhdf5
    // sizes the header on filter_len alone); they are only *meaningful*
    // for a direct root
    private val (filteredRootSize: Long, filteredRootMask: Long) =
      if (ioFilterLen > 0) (r.u64(), r.u32())
      else (UNDEF, 0L)
    private val filters: Seq[Filter] =
      if (ioFilterLen > 0) parseFilters(r) else Nil
    private val offsetSize = (maxHeapBits + 7) / 8
    // derive the length-field width from the declared total, never
    // from a re-implementation of the writer's sizing rule
    private val lengthSize = heapIdLen - 1 - offsetSize
    require(offsetSize >= 1 && lengthSize >= 1,
      s"h5: implausible fractal heap id geometry ($heapIdLen/$offsetSize)")

    private def log2(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    private val maxDirectRows = log2(maxDirectSize) - log2(startBlockSize) + 2
    private def rowSize(row: Int): Long =
      if (row < 2) startBlockSize else startBlockSize << (row - 1)
    private def rowsFor(span: Long): Int =
      log2(span) - log2(startBlockSize * tableWidth) + 1

    /** (heapOffset, blockSize, content). Unfiltered blocks are NOT
      * copied — they keep their file address (Left) and objects are
      * read in place from the file bytes, so a dense store with
      * thousands of links costs no duplicate heap-sized allocations;
      * only filtered blocks must be decoded into a buffer (Right).
      */
    private val blocks: Seq[(Long, Long, Either[Long, Array[Byte]])] =
      if (rootAddr == UNDEF) Nil
      else if (curRootRows == 0)
        Seq(readDirect(rootAddr, startBlockSize, filteredRootSize,
          filteredRootMask))
      else readIndirect(rootAddr, curRootRows)

    private def readIndirect(a: Long, nrows: Int): Seq[(Long, Long, Either[Long, Array[Byte]])] = {
      require(r.sig4(a, "FHIB"), s"h5: bad indirect block at $a")
      r.at(a + 4)
      require(r.u8() == 0, "h5: bad indirect block version")
      r.u64() // heap header address
      r.skip(offsetSize) // block offset
      // collect entries FIRST (the reads below move the cursor):
      // direct rows carry (addr [+ stored size + mask when filtered]),
      // indirect rows carry the child address only
      val slots = (0 until nrows).flatMap { row =>
        val size = rowSize(row)
        (0 until tableWidth).map { _ =>
          if (row < maxDirectRows) {
            val ba = r.u64()
            val (stored, fmask) =
              if (ioFilterLen > 0) (r.u64(), r.u32()) else (UNDEF, 0L)
            (ba, size, stored, fmask, true)
          } else (r.u64(), size, UNDEF, 0L, false)
        }
      }
      slots.filter(_._1 != UNDEF).flatMap {
        case (ba, size, stored, fmask, direct) =>
          if (direct) Seq(readDirect(ba, size, stored, fmask))
          else readIndirect(ba, rowsFor(size))
      }
    }

    private def readDirect(a: Long, size: Long, storedSize: Long,
                           filterMask: Long): (Long, Long, Either[Long, Array[Byte]]) = {
      val content: Either[Long, Array[Byte]] =
        if (filters.isEmpty) {
          // the whole block must be in bounds — in-place reads are
          // later LIMITED to the block extent (objectAt), preserving
          // the copy-based behavior where a read could never cross
          // into adjacent file structures; the minimum-size bound
          // covers the FHDB header the signature check below reads
          // (the Right-branch forall is vacuous here)
          require(a >= 0 && size <= r.bytes.length - a &&
            size >= 4 + 1 + 8 + offsetSize,
            s"h5: direct block at $a out of bounds")
          Left(a)
        } else {
          require(storedSize != UNDEF, "h5: filtered direct block without size")
          r.at(a)
          val raw = applyFilters(r.takeL(storedSize), filters,
            filterMask, elemSize = 1)
          require(raw.length == size,
            s"h5: filtered block decoded ${raw.length} of $size bytes")
          Right(raw)
        }
      def byteAt(i: Int): Byte = content match {
        case Left(base) => r.bytes((base + i).toInt)
        case Right(b) => b(i)
      }
      require(content.forall(_.length >= 4 + 1 + 8 + offsetSize) &&
        "FHDB".zipWithIndex.forall { case (c, i) => byteAt(i) == c.toByte },
        s"h5: bad direct block at $a")
      require(byteAt(4) == 0, "h5: bad direct block version")
      var bo = 0L
      (0 until offsetSize).foreach(i =>
        bo |= ((byteAt(13 + i) & 0xffL) << (8 * i)))
      (bo, size, content)
    }

    /** Heap ID → reader positioned at the object. Type bits 4–5 of the
      * flag byte select the storage class (§III.G): 0 = managed
      * (doubling-table blocks), 1 = huge (own file space, indexed by
      * the heap's huge v2 B-tree unless the ID is wide enough to embed
      * address+length directly), 2 = tiny (payload inline in the ID).
      */
    def objectAt(id: Array[Byte]): R = ((id(0) >> 4) & 0x3) match {
      case 0 => managedAt(id)
      case 1 => hugeAt(id)
      case 2 => tinyAt(id)
      case t => throw new UnsupportedH5(s"h5: reserved heap object type $t")
    }

    private def leBytes(id: Array[Byte], from: Int, n: Int): Long = {
      var v = 0L
      (0 until n).foreach(i => v |= ((id(from + i) & 0xffL) << (8 * i)))
      v
    }

    /** Tiny object (type 2): the payload lives inside the ID itself.
      * Normal form (heap ID ≤ 18 bytes): length−1 in the low nibble of
      * the flag byte, data from byte 1. Extended form (ID > 18 bytes):
      * 12-bit length−1 split across the low nibble and a second byte.
      */
    private def tinyAt(id: Array[Byte]): R = {
      val b0 = id(0) & 0xff
      val (len, dataOff) =
        if (heapIdLen <= 18) ((b0 & 0x0f) + 1, 1)
        else ((((b0 & 0x0f) << 8) | (id(1) & 0xff)) + 1, 2)
      require(dataOff + len <= id.length,
        s"h5: tiny heap object of $len bytes overflows its ${id.length}-byte ID")
      new R(java.util.Arrays.copyOfRange(id, dataOff, dataOff + len))
    }

    /** Huge object (type 1): stored in its own file space. When the
      * heap ID is wide enough to embed address + length (+ filter mask
      * and de-filtered size for filtered heaps), libhdf5 writes them
      * directly into the ID; otherwise the ID carries a huge-object ID
      * resolved through the heap's huge v2 B-tree (record type 1
      * unfiltered / 2 filtered: address, length[, mask, memory size],
      * ID).
      */
    private def hugeAt(id: Array[Byte]): R = {
      val filtered = ioFilterLen > 0
      val directLen = 1 + 8 + 8 + (if (filtered) 4 + 8 else 0)
      val (addr, storedLen, fmask, memLen) =
        if (heapIdLen >= directLen) {
          val a = leBytes(id, 1, 8); val l = leBytes(id, 9, 8)
          if (filtered) (a, l, leBytes(id, 17, 4), leBytes(id, 21, 8))
          else (a, l, 0L, l)
        } else {
          require(hugeBtAddr != UNDEF, "h5: huge heap object but no huge B-tree")
          // the huge-object ID is sizeof-lengths (8) bytes wide; any
          // further ID bytes are padding — and shifts past 8 bytes
          // would wrap on the JVM anyway
          val hugeId = leBytes(id, 1, math.min(8, heapIdLen - 1))
          val (btType, _, recs) = btree2Records(r, hugeBtAddr)
          require(btType == (if (filtered) 2 else 1),
            s"h5: huge B-tree record type $btType (heap filtered=$filtered)")
          val rec = recs.find { rec =>
            val idOff = if (filtered) 8 + 8 + 4 + 8 else 8 + 8
            leBytes(rec, idOff, 8) == hugeId
          }.getOrElse(throw new UnsupportedH5(
            s"h5: huge object $hugeId not in huge B-tree"))
          if (filtered) (leBytes(rec, 0, 8), leBytes(rec, 8, 8),
            leBytes(rec, 16, 4), leBytes(rec, 20, 8))
          else (leBytes(rec, 0, 8), leBytes(rec, 8, 8), 0L,
            leBytes(rec, 8, 8))
        }
      // addr bounded FIRST: addr + storedLen could wrap Long for two
      // huge values and slip a negative sum past the extent check
      require(addr >= 0 && addr <= r.bytes.length && storedLen >= 0 &&
        storedLen <= r.bytes.length - addr,
        s"h5: huge object at $addr+$storedLen out of bounds")
      if (!filtered) {
        val rr = new R(r.bytes)
        rr.buf.limit((addr + storedLen).toInt)
        rr.at(addr)
        rr
      } else {
        r.at(addr)
        val raw = applyFilters(r.take(storedLen.toInt), filters, fmask,
          elemSize = 1)
        require(raw.length == memLen,
          s"h5: filtered huge object decoded ${raw.length} of $memLen bytes")
        new R(raw)
      }
    }

    /** Managed heap ID → reader positioned at the object. Heap offsets
      * count the block header bytes, so the in-block position is
      * simply (offset − blockHeapOffset).
      */
    private def managedAt(id: Array[Byte]): R = {
      var off = 0L
      (0 until offsetSize).foreach(i => off |= ((id(1 + i) & 0xffL) << (8 * i)))
      val blk = blocks.find(b => off >= b._1 && off < b._1 + b._2).getOrElse(
        throw new UnsupportedH5(s"h5: heap offset $off outside direct blocks"))
      blk._3 match {
        case Left(fileAddr) => // unfiltered: read in place, own cursor
          val rr = new R(r.bytes)
          // limit to the block extent so a malformed object cannot
          // read adjacent file structures as garbage link/attr bytes
          rr.buf.limit((fileAddr + blk._2).toInt)
          rr.at(fileAddr + (off - blk._1))
          rr
        case Right(content) =>
          val rr = new R(content)
          rr.at(off - blk._1)
          rr
      }
    }
  }

  /** Attribute Info message (type 0x15) → densely-stored attributes:
    * same fractal-heap + v2 B-tree shape as dense links, with record
    * type 8 (attribute-name index) and attribute messages as the heap
    * objects — the storage libhdf5 switches to above ~8 attributes,
    * which ordinary CF metadata (units/long_name/_FillValue/scale/
    * offset/valid_range/coordinates/…) exceeds routinely.
    */
  private def denseAttrs(r: R): Seq[NcAttr] = {
    val ver = r.u8()
    require(ver == 0, s"h5: bad attribute info version $ver")
    val flags = r.u8()
    if ((flags & 0x1) != 0) r.skip(2) // max creation index
    val fheap = r.u64()
    val nameIdx = r.u64()
    if (fheap == UNDEF) Nil
    else {
      val heap = new FractalHeap(r, fheap)
      val ids = btree2HeapIds(r, nameIdx, wantType = 8)
      ids.map(id => parseAttr(heap.objectAt(id), r))
    }
  }

  /** v2 B-tree → raw heap IDs of its records, at any depth. Record
    * layouts handled: type 5 (link name: hash(4) + variable-size heap
    * ID) and type 8 (attribute name: heap ID(8) + flags(1) + corder(4)
    * + hash(4)). Child-pointer field widths follow §III.A.2 as
    * libhdf5 sizes them: the record-count field uses ONE width at
    * every level — the minimum bytes holding the LEAF maximum (the
    * largest any node can store) — while internal children add a
    * total-subtree-count field sized per level from the cumulative
    * maximum; both derive from node size and record size alone.
    */
  private def btree2HeapIds(r: R, addr: Long, wantType: Int = 5): Seq[Array[Byte]] = {
    val (btType, recordSize, recs) = btree2Records(r, addr)
    require(btType == wantType,
      s"h5: v2 B-tree type $btType (expected $wantType)")
    wantType match {
      // type 5 (link-name index): hash(4) + variable-size heap ID
      case 5 => recs.map(_.drop(4))
      // type 8 (attribute-name index): heap ID(8) + flags + corder + hash
      case 8 => recs.map(_.take(8))
      case t => throw new UnsupportedH5(s"h5: v2 B-tree record type $t")
    }
  }

  /** v2 B-tree → raw fixed-size records at any depth, type-agnostic:
    * callers slice fields per record type (5/8 heap-ID indexes above,
    * 1/2 huge-object directories in [[FractalHeap.objectAt]]).
    */
  private def btree2Records(r: R, addr: Long): (Int, Int, Seq[Array[Byte]]) = {
    require(r.sig4(addr, "BTHD"), s"h5: bad v2 B-tree header at $addr")
    r.at(addr + 4)
    require(r.u8() == 0, "h5: bad v2 B-tree version")
    val btType = r.u8()
    val nodeSize = r.u32()
    val recordSize = r.u16()
    val depth = r.u16()
    r.u8(); r.u8() // split/merge percentages
    val rootAddr = r.u64()
    val rootNRec = r.u16()
    r.u64() // total record count

    // bytes needed to store a count value (1, 2, 3, … — libhdf5's
    // limit-encoding, not power-of-two widths)
    def encSize(v: Long): Int = (64 - java.lang.Long.numberOfLeadingZeros(
      math.max(v, 1L)) + 7) / 8
    // per-level maxima: maxNrec(u) records fit an internal node at
    // depth u once its child pointers are accounted; cumMaxNrec(u)
    // bounds a whole depth-u subtree. The child-pointer COUNT field
    // uses ONE width for every level — sized from the LEAF maximum,
    // the largest any node can hold (libhdf5's max_nrec_size); only
    // the subtree-TOTAL field is sized per child level.
    val maxNrec = new Array[Long](depth + 1)
    val cumMaxNrec = new Array[Long](depth + 1)
    maxNrec(0) = (nodeSize - 10L) / recordSize
    cumMaxNrec(0) = maxNrec(0)
    val nrecSize = encSize(maxNrec(0))
    (1 to depth).foreach { u =>
      val ptr = 8 + nrecSize + (if (u > 1) encSize(cumMaxNrec(u - 1)) else 0)
      maxNrec(u) = (nodeSize - 10L - ptr) / (recordSize + ptr)
      cumMaxNrec(u) = (maxNrec(u) + 1) * cumMaxNrec(u - 1) + maxNrec(u)
    }

    // one raw record at the cursor — field slicing happens per type in
    // the callers; every record is read regardless of its name hash
    def readRecord(): Array[Byte] = r.take(recordSize)

    def readUInt(width: Int): Long = {
      var v = 0L
      (0 until width).foreach(i => v |= (r.u8().toLong << (8 * i)))
      v
    }

    // internal records ARE valid records (the separators); include
    // them — they reference real heap objects too
    def readNode(a: Long, nRec: Int, level: Int): Seq[Array[Byte]] =
      if (level == 0) {
        require(r.sig4(a, "BTLF"), s"h5: bad v2 B-tree leaf at $a")
        r.at(a + 4)
        require(r.u8() == 0, "h5: bad v2 B-tree leaf version")
        require(r.u8() == btType, "h5: v2 B-tree leaf record type mismatch")
        (0 until nRec).map(_ => readRecord())
      } else {
        require(r.sig4(a, "BTIN"), s"h5: bad v2 B-tree node at $a")
        r.at(a + 4)
        require(r.u8() == 0, "h5: bad v2 B-tree node version")
        require(r.u8() == btType, "h5: v2 B-tree node record type mismatch")
        val sepIds = (0 until nRec).map(_ => readRecord())
        // collect child pointers FIRST — recursion moves the cursor
        val children = (0 to nRec).map { _ =>
          val ca = r.u64()
          val n = readUInt(nrecSize)
          if (level > 1) readUInt(encSize(cumMaxNrec(level - 1))) // subtree total
          // nrecSize can be wide enough to encode counts past Int
          // range; a wrapped count would silently read fewer records
          require(n >= 0 && n <= Int.MaxValue,
            s"h5: v2 B-tree child record count $n out of range")
          (ca, n.toInt)
        }
        children.flatMap { case (ca, n) => readNode(ca, n, level - 1) } ++ sepIds
      }

    // an empty tree (no records yet) has an undefined root address —
    // legal for a freshly-created chunk index
    if (rootAddr == UNDEF || rootNRec == 0) (btType, recordSize, Nil)
    else (btType, recordSize, readNode(rootAddr, rootNRec, depth))
  }

  /** A group child: hard links carry the object-header address, soft
    * links the in-file path they alias (resolved lazily against the
    * group that holds them), and external links carry the (file,
    * object path) pair the cross-file `resolve` hook answers.
    */
  private sealed trait Link
  private final case class Hard(addr: Long) extends Link
  private final case class Soft(path: String) extends Link
  private final case class External(file: String, path: String) extends Link

  /** Link message → (name, target); None for user-defined link
    * classes. External links (type 64, spec: version/flags byte +
    * NUL-terminated file name + NUL-terminated object path) carry
    * their two paths for the cross-file resolver.
    */
  private def parseLink(r: R): Option[(String, Link)] = {
    val ver = r.u8()
    require(ver == 1, s"h5: bad link message version $ver")
    val flags = r.u8()
    val linkType = if ((flags & 0x08) != 0) r.u8() else 0
    if ((flags & 0x04) != 0) r.skip(8) // creation order
    if ((flags & 0x10) != 0) r.skip(1) // charset
    val nameLen = (flags & 0x3) match {
      case 0 => r.u8().toLong
      case 1 => r.u16().toLong
      case 2 => r.u32()
      case _ => r.u64()
    }
    val name = new String(r.takeL(nameLen), "UTF-8")
    linkType match {
      case 0 => Some((name, Hard(r.u64())))
      case 1 => // soft: length(2) + path bytes (not NUL-terminated)
        val len = r.u16()
        Some((name, Soft(new String(r.take(len), "UTF-8"))))
      case 64 => // external: length(2) + ver/flags + file NUL + path NUL
        val len = r.u16()
        val data = r.take(len)
        if (data.isEmpty || ((data(0) >> 4) & 0xf) != 0) None
        else {
          val body = java.util.Arrays.copyOfRange(data, 1, data.length)
          val nul1 = body.indexOf(0.toByte)
          if (nul1 < 0) None
          else {
            val file = new String(body, 0, nul1, "UTF-8")
            val rest = java.util.Arrays.copyOfRange(body, nul1 + 1, body.length)
            val nul2 = rest.indexOf(0.toByte)
            val objp = new String(rest, 0,
              if (nul2 < 0) rest.length else nul2, "UTF-8")
            Some((name, External(file, objp)))
          }
        }
      case _ => None
    }
  }

  private def parseDataspace(r: R): Seq[Long] = {
    val ver = r.u8()
    val rank = r.u8()
    ver match {
      case 1 => r.u8(); r.skip(5) // flags + reserved
      case 2 => r.u8(); r.u8() // flags + type
      case v => throw new UnsupportedH5(s"h5: unsupported dataspace version $v")
    }
    (0 until rank).map(_ => r.u64())
  }

  /** Parse a datatype message, CONSUMING its property bytes so the
    * cursor lands exactly past the encoding — required for sequential
    * walks (compound members, vlen bases); top-level callers reposition
    * by the declared message size anyway.
    */
  private def parseDatatype(r: R): Dtype = {
    val b0 = r.u8()
    val clazz = b0 & 0xf
    val version = (b0 >> 4) & 0xf
    val bits0 = r.u8(); val bits1 = r.u8(); r.u8()
    // the element size is a file-controlled u32: a value past Int
    // range would wrap NEGATIVE in toInt and poison every downstream
    // stride computation; an element larger than the file can never
    // decode, so that is the natural loud bound
    val sizeL = r.u32()
    require(sizeL <= r.bytes.length,
      s"h5: datatype element size $sizeL exceeds the ${r.bytes.length}-byte file")
    val size = sizeL.toInt
    clazz match {
      case C_FIXED =>
        r.skip(4) // properties: bit offset + bit precision
        Dtype(clazz, size, le = (bits0 & 1) == 0, signed = (bits0 & 8) != 0)
      case C_FLOAT =>
        r.skip(12) // bit offset/precision, exponent/mantissa layout, bias
        Dtype(clazz, size, le = (bits0 & 1) == 0, signed = true)
      case C_STRING => Dtype(clazz, size, le = true, signed = false)
      case C_REFERENCE => // object reference: an 8-byte file address
        Dtype(clazz, size, le = true, signed = false)
      case C_VLEN =>
        // bit field low nibble: 0 = sequence, 1 = string; the base
        // datatype follows as the properties (chars for strings)
        val isString = (bits0 & 0xf) == 1
        val base = parseDatatype(r)
        Dtype(clazz, size, le = true, signed = false,
          vlenString = isString, base = Some(base))
      case C_COMPOUND =>
        // members: netCDF-4's REFERENCE_LIST ({dataset ref, index})
        // is the shape that actually appears in real granules. Name
        // encoding differs per datatype version: v1/v2 pad the
        // NUL-terminated name to 8 bytes, v3 does not; v1 carries
        // legacy array-dim fields; v3 stores the byte offset in the
        // minimum bytes that can hold the compound's size.
        val nMembers = bits0 | (bits1 << 8)
        // v3 offset width = bytes needed to encode the compound SIZE
        // itself (libhdf5 H5VM_limit_enc_size): 255→1, 256→2, …
        val offBytes = { var n = 1; while ((1L << (8 * n)) <= size) n += 1; n }
        val members = (0 until nMembers).map { _ =>
          val sb = new StringBuilder
          var c = r.u8()
          var read = 1
          while (c != 0) { sb.append(c.toChar); c = r.u8(); read += 1 }
          if (version <= 2 && read % 8 != 0) r.skip(8 - read % 8)
          val off = version match {
            case 3 =>
              var v = 0L
              (0 until offBytes).foreach(i => v |= (r.u8().toLong << (8 * i)))
              v.toInt
            case _ =>
              val o = r.u32().toInt
              if (version == 1) r.skip(1 + 3 + 4 + 4 + 16) // rank, reserved, perm, reserved, dims
              o
          }
          (sb.toString, off, parseDatatype(r))
        }
        Dtype(clazz, size, le = true, signed = false, members = members)
      case c => throw new UnsupportedH5(s"h5: unsupported datatype class $c " +
        "(fixed/float/string/reference/vlen/compound only)")
    }
  }

  /** Numeric-decodable members of a compound element: (offset, type). */
  private def numericMembers(dt: Dtype): Seq[(Int, Dtype)] =
    dt.members.collect {
      case (_, off, m)
        if m.clazz == C_FIXED || m.clazz == C_FLOAT || m.clazz == C_REFERENCE =>
        (off, m)
    }

  /** Flatten `count` compound elements to their numeric member values,
    * element-major (the per-element member count goes to NcAttr.groups).
    */
  private def decodeCompound(raw: Array[Byte], dt: Dtype,
                             count: Int): Array[Double] = {
    val ms = numericMembers(dt)
    // validate member extents against the element size BEFORE slicing:
    // a corrupt offset must degrade (UnsupportedH5 → empty attr), not
    // escape as an index error that aborts the whole granule
    ms.foreach { case (off, m) =>
      if (off < 0 || m.size < 0 || off > dt.size - m.size)
        throw new UnsupportedH5(
          s"h5: compound member at $off size ${m.size} outside element ${dt.size}")
    }
    (0 until count).flatMap { k =>
      ms.map { case (off, m) =>
        decode(java.util.Arrays.copyOfRange(
          raw, k * dt.size + off, k * dt.size + off + m.size), m, 1)(0)
      }
    }.toArray
  }

  /** One object from a global heap collection (`GCOL`, spec §III.E) —
    * where variable-length attribute data actually lives. Objects are
    * (index, refcount, size, data-padded-to-8) records; index 0 marks
    * the collection's free space.
    */
  private def globalHeapObject(fileR: R, collectionAddr: Long,
                               index: Int): Array[Byte] = {
    // own cursor: the caller may be mid-parse on the same bytes. A
    // structurally bad collection throws UnsupportedH5 so the caller's
    // degrade-to-empty-attr contract holds — one corrupt vlen pointer
    // must not abort the whole granule.
    def bad(msg: String) = throw new UnsupportedH5(s"h5: $msg")
    val file = new R(fileR.bytes)
    if (!file.sig4(collectionAddr, "GCOL"))
      bad(s"no global heap collection at $collectionAddr")
    file.at(collectionAddr + 4)
    if (file.u8() != 1) bad("bad global heap version")
    file.skip(3)
    val collSize = file.u64() // includes this header
    val end = collectionAddr + collSize
    if (collSize < 16 || end > file.bytes.length)
      bad(s"global heap collection size $collSize out of bounds")
    while (file.pos + 16 <= end) {
      val idx = file.u16()
      file.u16(); file.u32() // reference count, reserved
      val objSize = file.u64()
      // compare by subtraction: `pos + objSize` wraps negative for a
      // corrupt size near Long.MaxValue and would slip past the check,
      // then blow up in take() with a non-UnsupportedH5 exception
      if (objSize < 0 || objSize > end - file.pos)
        bad(s"global heap object size $objSize out of bounds")
      if (idx == 0) // free space — nothing beyond it, index 0 invalid
        bad(s"global heap object $index not found")
      if (idx == index) return file.take(objSize.toInt)
      val padTo = (objSize + 7) / 8 * 8
      if (padTo > end - file.pos) bad(s"global heap object $index not found")
      file.skip(padTo.toInt)
    }
    bad(s"global heap object $index not found")
  }

  private def parseLayout(r: R): Layout = {
    val ver = r.u8()
    require(ver == 3 || ver == 4,
      s"h5: unsupported data layout version $ver (v3/v4 only)")
    r.u8() match {
      case 0 => // compact
        val n = r.u16()
        Layout(0, size = n, compactPos = r.pos)
      case 1 =>
        Layout(1, addr = r.u64(), size = r.u64())
      case 2 if ver == 3 =>
        val nd = r.u8()
        val btree = r.u64()
        val dims = (0 until nd).map(_ => r.u32().toInt)
        Layout(2, addr = btree, chunkDims = dims) // last dim = element size
      case 2 => // v4 chunked (HDF5 1.10+): flags, variable-width dims,
        // then one of the new chunk indexes
        val flags = r.u8()
        val nd = r.u8()
        val encLen = r.u8()
        require(encLen >= 1 && encLen <= 8,
          s"h5: v4 layout dim-size width $encLen out of range")
        val dims = (0 until nd).map { _ =>
          var v = 0L
          (0 until encLen).foreach(i => v |= (r.u8().toLong << (8 * i)))
          require(v >= 0 && v <= Int.MaxValue,
            s"h5: v4 chunk dim $v out of range")
          v.toInt
        }
        r.u8() match {
          case 1 => // single chunk: whole dataset is one chunk
            val (sz, mask) =
              if ((flags & 0x2) != 0) (r.u64(), r.u32()) else (UNDEF, 0L)
            Layout(2, addr = r.u64(), chunkDims = dims,
              v4Index = Some(V4Index(1, flags, sz, mask)))
          case 2 => // implicit: unfiltered chunks packed in linear order
            Layout(2, addr = r.u64(), chunkDims = dims,
              v4Index = Some(V4Index(2, flags)))
          case 3 => // fixed array of chunk records
            val pageBits = r.u8()
            Layout(2, addr = r.u64(), chunkDims = dims,
              v4Index = Some(V4Index(3, flags, pageBits = pageBits)))
          case 5 => // v2 B-tree of chunk records (>1 unlimited dims)
            r.u32() // node size (the header re-declares it)
            r.u8(); r.u8() // split/merge percentages
            Layout(2, addr = r.u64(), chunkDims = dims,
              v4Index = Some(V4Index(5, flags)))
          case t => throw new UnsupportedH5(
            s"h5: v4 chunk index type $t unsupported (single/implicit/" +
              "fixed-array/v2-B-tree — the extensible-array index of " +
              "single-unlimited-dim datasets is the one remaining form)")
        }
      case c => sys.error(s"h5: unknown layout class $c")
    }
  }

  private def parseFilters(r: R): Seq[Filter] = {
    val ver = r.u8()
    val n = r.u8()
    if (ver == 1) r.skip(6)
    (0 until n).map { _ =>
      val id = r.u16()
      val nameLen = if (ver == 1 || id >= 256) r.u16() else 0
      r.u16() // flags
      val ncv = r.u16()
      if (nameLen > 0) {
        val padded = if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen
        r.skip(padded)
      }
      val cvs = (0 until ncv).map(_ => r.u32())
      if (ver == 1 && ncv % 2 == 1) r.skip(4)
      Filter(id, cvs)
    }
  }

  /** Parse one attribute message at `r`'s cursor. `file` is the
    * whole-file reader — variable-length values live in global heap
    * collections elsewhere in the file, so it may differ from `r`
    * (dense attributes parse out of decoded heap-block buffers).
    */
  /** Test bridge: decode one raw attribute message (v1–v3 layouts)
    * against a file image (for global-heap resolution). Lets specs pin
    * datatype encodings — e.g. hand-built compound v1/v3 members —
    * without synthesizing a whole container around them.
    */
  private[sources] def decodeAttrMessage(msg: Array[Byte],
                                         file: Array[Byte] = Array.emptyByteArray): NcAttr =
    parseAttr(new R(msg), new R(file))

  private def parseAttr(r: R, file: R): NcAttr = {
    val ver = r.u8()
    require(ver >= 1 && ver <= 3, s"h5: unsupported attribute version $ver")
    if (ver == 1) r.skip(1)
    else {
      val flags = r.u8()
      require((flags & 0x3) == 0,
        "h5: shared attribute datatype/dataspace not in subset")
    }
    val nameSize = r.u16()
    val dtSize = r.u16()
    val dsSize = r.u16()
    if (ver == 3) r.skip(1) // name character-set encoding
    def padded(n: Int): Int = if (ver == 1) (n + 7) / 8 * 8 else n
    val namePos = r.pos
    val name = r.cstring(namePos)
    r.at(namePos + padded(nameSize))
    // netCDF-4 decorates variables with vlen/reference attrs
    // (DIMENSION_LIST, REFERENCE_LIST, NC_STRING text) — vlen values
    // resolve through the global heap; compound and vlen-of-compound
    // attrs flatten their numeric members; any remaining unmodeled
    // shape decodes as an EMPTY attr rather than aborting the granule
    try {
      val dtPos = r.pos
      val dt = parseDatatype(r)
      r.at(dtPos + padded(dtSize))
      val dsPos = r.pos
      val dims = parseDataspace(r)
      r.at(dsPos + padded(dsSize))
      // overflow-checked, file-bounded element count — same rule as
      // readDataMembers: attribute values are raw in-file, so their
      // count is bounded by the bytes that exist; a corrupt dim must
      // degrade (UnsupportedH5 → empty attr), never allocate by it
      val countL = dims.foldLeft(1L) { (a, b) =>
        val p = a * b
        if (b < 0 || (b != 0 && p / b != a) ||
          p > r.bytes.length.toLong / math.max(dt.size, 1))
          throw new UnsupportedH5(
            s"h5: attribute '$name' element count ${dims.mkString("x")} " +
              "exceeds the file")
        p
      }
      val count = countL.max(1L).toInt
      dt.clazz match {
        case C_STRING =>
          val raw = r.take(dt.size * count)
          NcAttr(name, NC_CHAR, text = new String(raw.takeWhile(_ != 0), "UTF-8"))
        case C_VLEN =>
          // each datum: element count (u32), then the global heap ID
          // (collection address u64 + object index u32)
          val data = (0 until count).map { _ =>
            val len = r.u32().toInt
            val addr = r.u64()
            val idx = r.u32().toInt
            if (len == 0 || addr == UNDEF || addr == 0) Array.emptyByteArray
            else globalHeapObject(file, addr, idx)
          }
          val base = dt.base.getOrElse(
            throw new UnsupportedH5("h5: vlen without base type"))
          if (dt.vlenString)
            NcAttr(name, NC_CHAR, text = data.map(b =>
              new String(b.takeWhile(_ != 0), "UTF-8")).mkString(", "))
          else if (base.clazz == C_COMPOUND) {
            // vlen of compound — e.g. a dimension scale's
            // REFERENCE_LIST ({dataset ref, index} per referencing
            // variable): flatten each datum's numeric members
            val decoded = data.map(b =>
              decodeCompound(b, base, b.length / math.max(base.size, 1)))
            NcAttr(name, NC_DOUBLE, nums = decoded.flatten.toSeq,
              groups = decoded.map(_.length).toSeq)
          } else {
            // keep the per-datum element counts (`groups`) beside the
            // flattened values: DIMENSION_LIST resolution needs to see
            // "one reference per axis" — two scales on one axis plus a
            // bare axis flattens to the same total count
            val decoded = data.map { b =>
              val m = b.length / math.max(base.size, 1)
              decode(b, base, m)
            }
            NcAttr(name, ncTypeOf(base), nums = decoded.flatten.toSeq,
              groups = decoded.map(_.length).toSeq)
          }
        case C_COMPOUND =>
          // fixed array of compound elements (netCDF-4's REFERENCE_LIST
          // on dimension scales is exactly this): numeric members
          // flattened element-major, member count per element in groups
          val raw = r.take(dt.size * count)
          NcAttr(name, NC_DOUBLE, nums = decodeCompound(raw, dt, count).toSeq,
            groups = Seq.fill(count)(numericMembers(dt).length))
        case _ =>
          val vals = decode(r.take(dt.size * count), dt, count)
          NcAttr(name, ncTypeOf(dt), nums = vals.toSeq)
      }
    } catch {
      // BufferUnderflow covers a truncated attribute body;
      // IllegalArgument covers a skip()/at() past the buffer limit
      // (e.g. datatype property bytes truncated at a heap-block edge)
      // — same degrade-to-empty contract as an unmodeled datatype
      case _: UnsupportedH5 => NcAttr(name, NC_CHAR, text = "")
      case _: java.nio.BufferUnderflowException => NcAttr(name, NC_CHAR, text = "")
      case _: IllegalArgumentException => NcAttr(name, NC_CHAR, text = "")
    }
  }

  private def ncTypeOf(dt: Dtype): Int = dt.clazz match {
    case C_FLOAT => if (dt.size == 8) NC_DOUBLE else NC_FLOAT
    case C_STRING => NC_CHAR
    case C_COMPOUND => NC_DOUBLE // flattened numeric members
    case C_REFERENCE => NC_DOUBLE // file addresses, exact to 2^53
    case _ => dt.size match {
      case 1 => NC_BYTE
      case 2 => NC_SHORT
      case 4 => NC_INT
      case _ => NC_DOUBLE // int64: engine's numeric plane is double anyway
    }
  }

  /** Decode `count` raw elements to doubles — the degenerate
    * single-member case of [[decodeMembers]], so the attribute and
    * dataset paths share ONE (class, size) switch ([[readScalar]]).
    */
  private def decode(raw: Array[Byte], dt: Dtype, count: Int): Array[Double] =
    decodeMembers(raw, dt, count, Seq((0, dt))).head

  /** One scalar at an absolute byte position — the strided read that
    * turns a compound record into member columns without per-element
    * allocation.
    */
  private def readScalar(b: ByteBuffer, p: Int, dt: Dtype): Double =
    (dt.clazz, dt.size) match {
      case (C_FLOAT, 4) => b.getFloat(p).toDouble
      case (C_FLOAT, 8) => b.getDouble(p)
      case (C_FIXED, 1) =>
        if (dt.signed) b.get(p).toDouble else (b.get(p) & 0xff).toDouble
      case (C_FIXED, 2) =>
        if (dt.signed) b.getShort(p).toDouble
        else (b.getShort(p) & 0xffff).toDouble
      case (C_FIXED, 4) =>
        if (dt.signed) b.getInt(p).toDouble
        else (b.getInt(p) & 0xffffffffL).toDouble
      case (C_FIXED, 8) =>
        val l = b.getLong(p)
        if (dt.signed || l >= 0) l.toDouble
        else l.toDouble + 1.8446744073709552e19 // uint64 above Long.MaxValue
      case (C_REFERENCE, 8) => b.getLong(p).toDouble // object address
      case (c, s) =>
        throw new UnsupportedH5(s"h5: cannot decode datatype class $c size $s")
    }

  /** Decode `count` elements of stride `dt.size` for EVERY requested
    * (byte offset, type) member in one pass over `raw`. A simple
    * (non-compound) dataset is the degenerate single member
    * (0, dt) — same code path, same validation.
    */
  private def decodeMembers(raw: Array[Byte], dt: Dtype, count: Int,
                            members: Seq[(Int, Dtype)]): Array[Array[Double]] =
    members.map { case (off, m) =>
      val b = ByteBuffer.wrap(raw)
        .order(if (m.le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val out = new Array[Double](count)
      var k = 0
      while (k < count) {
        out(k) = readScalar(b, k * dt.size + off, m)
        k += 1
      }
      out
    }.toArray

  private def readData(r: R, d: Dataset): Array[Double] =
    readDataMembers(r, d, Seq((0, d.dtype))).head

  /** All requested members of a dataset in one pass over its storage:
    * chunks are walked, unfiltered, and checksummed exactly once no
    * matter how many members decode from them.
    */
  private def readDataMembers(r: R, d: Dataset,
                              members: Seq[(Int, Dtype)]): Array[Array[Double]] = {
    // overflow-checked element count, capped at the in-memory codec's
    // envelope (2^28 elements = 2 GiB of doubles): dataspace dims are
    // file-controlled, and a corrupt dim must fail loudly here, not
    // OOM in the output allocation (caught by the bit-flip fuzz on
    // the v4 fixtures)
    val nL = d.dims.foldLeft(1L) { (a, b) =>
      val p = a * b
      require(b >= 0 && (b == 0 || p / b == a) && p <= (1L << 28),
        s"h5: dataset '${d.name}' element count ${d.dims.mkString("x")} " +
          "exceeds the in-memory codec's envelope")
      p
    }
    val n = nL.max(1L).toInt
    // the member count is ALSO file-controlled (a 64 KiB compound
    // datatype message can declare thousands of members), so bound
    // the TOTAL output allocation — n elements x members doubles —
    // by the same 2 GiB envelope before any array is allocated
    require(members.nonEmpty &&
      n.toLong * members.length <= (1L << 28),
      s"h5: dataset '${d.name}' with ${members.length} members x $n " +
        "elements exceeds the in-memory codec's envelope")
    d.layout.clazz match {
      case 0 =>
        // compact size and position are file-controlled: bound the
        // extent before the Int narrow (same contract as loadChunk)
        require(d.layout.compactPos >= 0 &&
          d.layout.compactPos <= r.bytes.length &&
          d.layout.size >= 0 &&
          d.layout.size <= r.bytes.length - d.layout.compactPos,
          s"h5: dataset '${d.name}' compact data of ${d.layout.size} " +
            s"bytes at ${d.layout.compactPos} exceeds the " +
            s"${r.bytes.length}-byte file")
        r.at(d.layout.compactPos)
        decodeMembers(r.take(d.layout.size.toInt), d.dtype, n, members)
      case 1 =>
        if (d.layout.addr == UNDEF)
          Array.fill(members.length)(Array.fill(n)(Double.NaN))
        else {
          // n * elemSize in LONG: n <= 2^28 but the element size is a
          // file-controlled u32, and an Int product wraps a large
          // compound stride past the envelope into an uncontrolled
          // mid-decode failure instead of this loud refusal
          val byteLen = n.toLong * d.dtype.size
          require(d.layout.addr >= 0 && d.layout.addr <= r.bytes.length &&
            byteLen >= 0 && byteLen <= r.bytes.length - d.layout.addr,
            s"h5: dataset '${d.name}' contiguous data of $byteLen bytes " +
              s"at ${d.layout.addr} exceeds the ${r.bytes.length}-byte file")
          r.at(d.layout.addr)
          decodeMembers(r.take(byteLen.toInt), d.dtype, n, members)
        }
      case 2 => readChunked(r, d, n, members)
      case c => sys.error(s"h5: layout class $c unsupported")
    }
  }

  private def readChunked(r: R, d: Dataset, n: Int,
                          members: Seq[(Int, Dtype)]): Array[Array[Double]] = {
    val outs = Array.fill(members.length)(Array.fill(n)(Double.NaN))
    val rank = d.dims.length
    val chunkDims = d.layout.chunkDims.dropRight(1) // trailing entry = elem size
    require(chunkDims.length == rank,
      s"h5: chunk rank ${chunkDims.length} != dataset rank $rank")
    val dimProd = d.dims.scanRight(1L)(_ * _).tail // row-major strides

    // read+unfilter+decode ONE chunk at `addr` and copy it into place,
    // clipping edge chunks — shared by every chunk-index flavor
    def loadChunk(addr: Long, sz: Long, mask: Long, offs: Seq[Long]): Unit = {
      // the stored chunk size is a file-controlled 64-bit field: a
      // value with high bits set would narrow in `take(sz.toInt)` and
      // silently decode partial data — bound it against the file
      // extent before narrowing (sz <= length also makes toInt exact)
      require(sz >= 0 && sz <= r.bytes.length &&
        addr >= 0 && addr + sz <= r.bytes.length,
        s"h5: chunk at $addr with stored size $sz exceeds the " +
          s"${r.bytes.length}-byte file")
      r.at(addr)
      val raw = applyFilters(r.take(sz.toInt), d.filters, mask, d.dtype.size)
      val vals = decodeMembers(raw, d.dtype,
        raw.length / math.max(d.dtype.size, 1), members)
      val cProd = chunkDims.scanRight(1)(_ * _).tail
      val cn = chunkDims.product
      var k = 0
      while (k < cn) {
        var rem = k; var target = 0L; var inside = true
        var dim = 0
        while (dim < rank && inside) {
          val ci = rem / cProd(dim); rem %= cProd(dim)
          val gi = offs(dim) + ci
          if (gi >= d.dims(dim)) inside = false
          else target += gi * dimProd(dim)
          dim += 1
        }
        if (inside) {
          var mi = 0
          while (mi < vals.length) {
            if (k < vals(mi).length) outs(mi)(target.toInt) = vals(mi)(k)
            mi += 1
          }
        }
        k += 1
      }
    }

    def walkNode(addr: Long): Unit = {
      require(r.sig4(addr, "TREE"), s"h5: bad chunk B-tree node at $addr")
      r.at(addr + 4)
      val nodeType = r.u8(); val level = r.u8(); val used = r.u16()
      require(nodeType == 1, s"h5: chunk B-tree has node type $nodeType")
      r.u64(); r.u64() // siblings
      val entries = (0 until used).map { _ =>
        val sz = r.u32(); val mask = r.u32() // chunk byte size, filter mask
        val offs = (0 to rank).map(_ => r.u64()) // + element-size dim
        val child = r.u64()
        (sz, mask, offs.dropRight(1), child)
      }
      entries.foreach { case (sz, mask, offs, child) =>
        if (level > 0) walkNode(child)
        else loadChunk(child, sz, mask, offs)
      }
    }

    // chunk-grid geometry for the LINEAR v4 indexes: chunks are
    // numbered row-major over ceil(dims/chunkDims)
    def gridCounts: Seq[Long] = d.dims.zip(chunkDims).map { case (dl, cl) =>
      require(cl > 0, s"h5: zero chunk dim")
      (dl + cl - 1) / cl
    }
    def chunkOffsets(linear: Long, counts: Seq[Long]): Seq[Long] = {
      val strides = counts.scanRight(1L)(_ * _).tail
      counts.indices.map { i =>
        (linear / strides(i)) % counts(i) * chunkDims(i)
      }
    }

    (d.layout.v4Index, d.layout.addr) match {
      case (_, UNDEF) => () // never allocated: all fill
      case (None, addr) => walkNode(addr)
      case (Some(idx), addr) =>
        val counts = gridCounts
        val total = counts.product
        val chunkBytes = chunkDims.map(_.toLong).product * d.dtype.size
        idx.indexType match {
          case 1 => // single chunk — the whole dataset
            require(total == 1,
              s"h5: single-chunk index with $total chunks in the grid")
            val sz = if ((idx.flags & 0x2) != 0) idx.singleSize else chunkBytes
            loadChunk(addr, sz, idx.singleMask, Seq.fill(rank)(0L))
          case 2 => // implicit: unfiltered chunks packed in linear order
            require(d.filters.isEmpty,
              "h5: implicit chunk index cannot carry filters")
            var i = 0L
            while (i < total) {
              loadChunk(addr + i * chunkBytes, chunkBytes, 0,
                chunkOffsets(i, counts))
              i += 1
            }
          case 3 => // fixed array (FAHD/FADB, spec III.H)
            fixedArrayEntries(r, addr, total, chunkBytes).foreach {
              case (i, caddr, sz, mask) =>
                if (caddr != UNDEF) {
                  // address 0 is the superblock — an entry pointing
                  // there is corruption, never data
                  require(caddr > 0, s"h5: fixed-array chunk at $caddr")
                  loadChunk(caddr, sz, mask, chunkOffsets(i, counts))
                }
            }
          case 5 => // v2 B-tree, record type 10 (plain) / 11 (filtered):
            // address [+ size + mask], then per-dim SCALED offsets
            val (btType, recSize, recs) = btree2Records(r, addr)
            require(btType == 10 || btType == 11,
              s"h5: chunk v2 B-tree record type $btType")
            val filtered = btType == 11
            val sizeLen = recSize - 8 - 4 - 8 * rank
            if (filtered) require(sizeLen >= 1 && sizeLen <= 8,
              s"h5: filtered chunk record size $recSize for rank $rank")
            else require(recSize == 8 + 8 * rank,
              s"h5: chunk record size $recSize for rank $rank")
            recs.foreach { rec =>
              val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
              val caddr = bb.getLong()
              val (sz, mask) =
                if (filtered) {
                  var sv = 0L
                  (0 until sizeLen).foreach(i =>
                    sv |= (bb.get() & 0xffL) << (8 * i))
                  (sv, bb.getInt() & 0xffffffffL)
                } else (chunkBytes, 0L)
              val offs = (0 until rank).map(i =>
                bb.getLong() * chunkDims(i))
              if (caddr != UNDEF) {
                require(caddr > 0, s"h5: v2-B-tree chunk at $caddr")
                loadChunk(caddr, sz, mask, offs)
              }
            }
          case t => throw new UnsupportedH5(s"h5: v4 chunk index type $t")
        }
    }
    outs
  }

  /** Fixed-array chunk index (spec III.H: FAHD header + FADB data
    * block, paged above 2^pageBits entries): yields
    * (linear chunk index, address, stored byte size, filter mask).
    * Client id 0 = unfiltered entries (address only — size is the
    * chunk's nominal bytes); client id 1 = filtered (address +
    * variable-width size + mask). Every count is bounded by the file
    * before allocation.
    */
  private def fixedArrayEntries(r: R, headerAddr: Long, expected: Long,
                                chunkBytes: Long): Seq[(Long, Long, Long, Long)] = {
    require(r.sig4(headerAddr, "FAHD"), s"h5: bad fixed array at $headerAddr")
    r.at(headerAddr + 4)
    require(r.u8() == 0, "h5: bad fixed-array version")
    val clientId = r.u8()
    require(clientId == 0 || clientId == 1,
      s"h5: fixed-array client $clientId (dataset chunks only)")
    val entrySize = r.u8()
    val pageBits = r.u8()
    val nelmts = r.u64()
    val dbAddr = r.u64()
    require(entrySize > 0 && nelmts >= 0 &&
      nelmts <= r.bytes.length.toLong / entrySize,
      s"h5: fixed array declares $nelmts x$entrySize-byte entries " +
        s"but the file has ${r.bytes.length} bytes")
    require(nelmts >= expected,
      s"h5: fixed array has $nelmts entries for $expected chunks")
    if (dbAddr == UNDEF) return Nil
    require(r.sig4(dbAddr, "FADB"), s"h5: bad fixed-array data block at $dbAddr")
    r.at(dbAddr + 4)
    require(r.u8() == 0, "h5: bad fixed-array data-block version")
    require(r.u8() == clientId, "h5: fixed-array client mismatch")
    require(r.u64() == headerAddr, "h5: fixed-array header back-pointer wrong")
    val pageSize = 1L << pageBits
    val sizeLen = entrySize - 12 // filtered: addr(8) + size(sizeLen) + mask(4)
    if (clientId == 1) require(sizeLen >= 1 && sizeLen <= 8,
      s"h5: filtered fixed-array entry size $entrySize out of range")
    else require(entrySize == 8,
      s"h5: unfiltered fixed-array entry size $entrySize (must be 8)")
    def entryAt(i: Long): (Long, Long, Long, Long) = {
      val caddr = r.u64()
      if (clientId == 0) (i, caddr, chunkBytes, 0L)
      else {
        var sz = 0L
        (0 until sizeLen).foreach(b => sz |= (r.u8().toLong << (8 * b)))
        val mask = r.u32()
        (i, caddr, sz, mask)
      }
    }
    if (nelmts <= pageSize) {
      // elements inline in the data block
      (0L until expected).map(entryAt)
    } else {
      // paged: bitmap + checksum in the block, then per-page payloads
      // (each page = up-to-pageSize entries + its own checksum). Real
      // HDF5 (H5FAdblock.c) allocates EVERY page slot when the data
      // block is created and addresses pages arithmetically:
      // page p starts at pagesBase + p * (pageSize*entrySize + 4),
      // full stride even for the truncated last page. A CLEAR bitmap
      // bit means the page was never written — its chunks are fill —
      // but its slot still occupies the full stride on disk, so a
      // clear page must be stepped over, not treated as zero bytes:
      // otherwise every later page parses from the wrong offset and
      // decodes allocation slack as chunk addresses.
      require(pageBits <= 20,
        s"h5: fixed-array page_bits $pageBits out of range")
      val npages = (nelmts + pageSize - 1) / pageSize
      val bitmap = r.take(((npages + 7) / 8).toInt)
      def pageInit(p: Long): Boolean =
        ((bitmap((p / 8).toInt) >> (p % 8).toInt) & 1) != 0
      r.skip(4) // data-block checksum
      val pagesBase = r.pos
      val stride = pageSize * entrySize + 4
      val out = Seq.newBuilder[(Long, Long, Long, Long)]
      var page = 0L
      while (page < npages && page * pageSize < expected) {
        if (pageInit(page)) {
          val inPage = math.min(pageSize, nelmts - page * pageSize)
          val start = pagesBase + page * stride
          require(start + inPage * entrySize + 4 <= r.bytes.length,
            s"h5: fixed-array page $page extends past end of file")
          r.at(start)
          var i = page * pageSize
          val end = math.min(i + inPage, expected)
          while (i < end) {
            out += entryAt(i)
            i += 1
          }
        }
        page += 1
      }
      out.result()
    }
  }

  /** Reverse a stored-bytes filter pipeline (fletcher32 strip →
    * szip/deflate → unshuffle — the declared order, applied backwards).
    * Mask bit i set = pipeline filter i was SKIPPED for this block
    * (libhdf5 stores incompressible chunks raw with the compressor's
    * bit set). `elemSize` feeds shuffle when the message omits its
    * client value. Shared by the chunk walk and the fractal-heap
    * direct-block decode so both paths support the same filter set.
    */
  private def applyFilters(raw0: Array[Byte], filters: Seq[Filter],
                           mask: Long, elemSize: Int): Array[Byte] = {
    var raw = raw0
    filters.zipWithIndex.reverse.foreach { case (f, fi) =>
      if ((mask & (1L << fi)) == 0) f.id match {
        case 1 => raw = inflate(raw)
        case 2 => raw = unshuffle(raw, f.clientValues.headOption
          .map(_.toInt).getOrElse(elemSize))
        case 3 =>
          require(raw.length >= 4, "h5: fletcher32 block shorter than its checksum")
          val payload = java.util.Arrays.copyOfRange(raw, 0, raw.length - 4)
          val stored = (raw(raw.length - 4) & 0xffL) |
            ((raw(raw.length - 3) & 0xffL) << 8) |
            ((raw(raw.length - 2) & 0xffL) << 16) |
            ((raw(raw.length - 1) & 0xffL) << 24)
          val computed = fletcher32(payload)
          // libhdf5 compatibility (H5Zfletcher32.c): files written
          // before 1.6.3 may store the checksum byte-reversed — accept
          // that form too, exactly as libhdf5 still does
          val swapped = java.lang.Integer.reverseBytes(stored.toInt) & 0xffffffffL
          require(computed == stored || computed == swapped,
            s"h5: fletcher32 checksum mismatch (block is corrupt)")
          raw = payload
        case 4 =>
          require(f.clientValues.length >= 4,
            s"h5: szip filter with ${f.clientValues.length} client values")
          val cv = f.clientValues.map(_.toInt)
          raw = Szip.decompress(raw, Szip.Params(cv(0), cv(1), cv(2), cv(3)))
        case id => sys.error(s"h5: unsupported filter id $id")
      }
    }
    raw
  }

  /** HDF5's fletcher32 variant (public H5checksum.c semantics): 16-bit
    * big-endian words, 360-word partial-reduction blocks, an odd tail
    * byte padded high, two final fold steps; the filter appends the
    * result little-endian after the (possibly compressed) payload.
    */
  private[sources] def fletcher32(data: Array[Byte]): Long = {
    var sum1 = 0L; var sum2 = 0L
    var i = 0
    var remaining = data.length / 2
    while (remaining > 0) {
      var tlen = math.min(remaining, 360)
      remaining -= tlen
      while (tlen > 0) {
        sum1 += ((data(i) & 0xffL) << 8) | (data(i + 1) & 0xffL)
        i += 2
        sum2 += sum1
        tlen -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    if (data.length % 2 == 1) {
      sum1 += (data(i) & 0xffL) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    ((sum2 << 16) | sum1) & 0xffffffffL
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) sys.error("h5: truncated deflate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def unshuffle(raw: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) raw
    else {
      val n = raw.length / elemSize
      val out = new Array[Byte](raw.length)
      var j = 0
      while (j < elemSize) {
        var i = 0
        while (i < n) {
          out(i * elemSize + j) = raw(j * n + i)
          i += 1
        }
        j += 1
      }
      // bytes past n*elemSize (none in conforming chunks) pass through
      var k = n * elemSize
      while (k < raw.length) { out(k) = raw(k); k += 1 }
      out
    }
  }

  private def shuffle(raw: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) raw
    else {
      val n = raw.length / elemSize
      val out = new Array[Byte](raw.length)
      var j = 0
      while (j < elemSize) {
        var i = 0
        while (i < n) {
          out(j * n + i) = raw(i * elemSize + j)
          i += 1
        }
        j += 1
      }
      out
    }
  }

  private def deflate(raw: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Bob Jenkins' lookup3 `hashlittle` (public domain; reproduced from
    * the algorithm description the HDF5 spec references) — the hash
    * behind v2 B-tree name records AND the checksum trailing every
    * v2-era metadata structure. Little-endian word gathering with
    * zero-padding reproduces the byte-wise tail switch exactly.
    */
  private[sources] def lookup3(data: Array[Byte], init: Int = 0): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    def word(o: Int, n: Int): Int = {
      var v = 0; var j = 0
      while (j < n && o + j < data.length) {
        v |= (data(o + j) & 0xff) << (8 * j); j += 1
      }
      v
    }
    var a = 0xdeadbeef + data.length + init
    var b = a; var c = a
    var i = 0; var len = data.length
    while (len > 12) {
      a += word(i, 4); b += word(i + 4, 4); c += word(i + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; len -= 12
    }
    if (len > 0) {
      a += word(i, math.min(len, 4))
      if (len > 4) b += word(i + 4, math.min(len - 4, 4))
      if (len > 8) c += word(i + 8, math.min(len - 8, 4))
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  // ----------------------------------------------------------------- write

  /** Chunked-storage request for one variable: `dims` per data
    * dimension (need not divide the shape — edge chunks pad with 0 and
    * clip on read), deflate level 0 disables compression. `szip` swaps
    * the deflate stage for the szip (extended-Rice) filter the way
    * HDF5 does — szip is the sole compressor, so it excludes deflate
    * and shuffle; pixels_per_block is `szipPixelsPerBlock`,
    * pixels_per_scanline the chunk's fastest dimension.
    */
  case class Chunking(dims: Seq[Int], deflateLevel: Int = 6,
                      shuffle: Boolean = true, szip: Boolean = false,
                      szipPixelsPerBlock: Int = 16,
                      fletcher32: Boolean = false) {
    require(!szip || (deflateLevel == 0 && !shuffle),
      "h5 write: szip excludes deflate and shuffle")
  }

  private val GROUP_K = 4 // B-tree entries per node = 2k

  private class W {
    val out = new java.io.ByteArrayOutputStream()
    private val scratch = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    def pos: Long = out.size().toLong
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { scratch.clear(); scratch.putShort(v.toShort); out.write(scratch.array(), 0, 2) }
    def u32(v: Long): Unit = { scratch.clear(); scratch.putInt(v.toInt); out.write(scratch.array(), 0, 4) }
    def u64(v: Long): Unit = { scratch.clear(); scratch.putLong(v); out.write(scratch.array(), 0, 8) }
    def raw(b: Array[Byte]): Unit = out.write(b)
    def zero(n: Long): Unit = (0L until n).foreach(_ => out.write(0))
    def padTo8(): Unit = if (pos % 8 != 0) zero(8 - pos % 8)
    /** lookup3 checksum of everything written since `from` (the v2
      * structures checksum their own preceding bytes).
      */
    def checksum(from: Long): Unit =
      u32(lookup3(out.toByteArray.slice(from.toInt, out.size())) & 0xffffffffL)
  }

  private def dtypeFor(ncType: Int): Dtype = ncType match {
    case NC_BYTE => Dtype(C_FIXED, 1, le = true, signed = true)
    case NC_SHORT => Dtype(C_FIXED, 2, le = true, signed = true)
    case NC_INT => Dtype(C_FIXED, 4, le = true, signed = true)
    case NC_FLOAT => Dtype(C_FLOAT, 4, le = true, signed = true)
    case NC_DOUBLE => Dtype(C_FLOAT, 8, le = true, signed = true)
    case t => sys.error(s"h5 write: no datatype for nc_type $t")
  }

  private def encode(vals: Array[Double], dt: Dtype): Array[Byte] = {
    val b = ByteBuffer.allocate(vals.length * dt.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach { v =>
      (dt.clazz, dt.size) match {
        case (C_FLOAT, 4) => b.putFloat(v.toFloat)
        case (C_FLOAT, 8) => b.putDouble(v)
        case (C_FIXED, 1) => b.put(v.toByte)
        case (C_FIXED, 2) => b.putShort(v.toShort)
        case (C_FIXED, 4) => b.putInt(v.toInt)
        case (c, s) => sys.error(s"h5 write: cannot encode class $c size $s")
      }
    }
    b.array()
  }

  private def datatypeBody(dt: Dtype): Array[Byte] = {
    val b = ByteBuffer.allocate(if (dt.clazz == C_FLOAT) 20 else 12)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(((1 << 4) | dt.clazz).toByte) // version 1 + class
    if (dt.clazz == C_FLOAT) {
      // bit field: LE order, implied-msb mantissa normalization (0x20),
      // sign bit location in byte 1
      b.put(0x20.toByte).put((dt.size * 8 - 1).toByte).put(0.toByte)
    } else {
      b.put((if (dt.signed) 8 else 0).toByte).put(0.toByte).put(0.toByte)
    }
    b.putInt(dt.size)
    b.putShort(0.toShort).putShort((dt.size * 8).toShort) // bit offset/precision
    if (dt.clazz == C_FLOAT) {
      // IEEE properties: exp location/size, mantissa location/size, bias
      if (dt.size == 4) {
        b.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte)
        b.putInt(127)
      } else {
        b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte)
        b.putInt(1023)
      }
    }
    b.array()
  }

  private def stringTypeBody(len: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(((1 << 4) | C_STRING).toByte)
    b.put(0.toByte).put(0.toByte).put(0.toByte) // NUL-terminated, ASCII
    b.putInt(len)
    b.array()
  }

  private def dataspaceBody(dims: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + 8 * dims.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(dims.length.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0)
    dims.foreach(d => b.putLong(d.toLong))
    b.array()
  }

  private def attrBody(a: NcAttr): Array[Byte] = {
    def pad8(n: Int) = (n + 7) / 8 * 8
    val nameB = a.name.getBytes("UTF-8") :+ 0.toByte
    val (dtB, dsB, dataB) =
      if (a.ncType == NC_CHAR) {
        val t = a.text.getBytes("UTF-8") :+ 0.toByte
        (stringTypeBody(t.length), dataspaceBody(Nil), t)
      } else {
        val dt = dtypeFor(a.ncType)
        (datatypeBody(dt), dataspaceBody(Seq(a.nums.length)),
          encode(a.nums.toArray, dt))
      }
    val b = ByteBuffer.allocate(8 + pad8(nameB.length) + pad8(dtB.length) +
      pad8(dsB.length) + dataB.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte)
    b.putShort(nameB.length.toShort)
    b.putShort(dtB.length.toShort)
    b.putShort(dsB.length.toShort)
    b.put(nameB); b.position(b.position() + pad8(nameB.length) - nameB.length)
    b.put(dtB); b.position(b.position() + pad8(dtB.length) - dtB.length)
    b.put(dsB); b.position(b.position() + pad8(dsB.length) - dsB.length)
    b.put(dataB)
    b.array()
  }

  /** Serialize the NcFile model as a v0-superblock HDF5 file. Record
    * dims are not supported (same restriction as the classic writer).
    * `denseRoot = true` stores the root group's links DENSELY (Link
    * Info message → fractal heap of link messages + v2 B-tree name
    * index, the layout libhdf5 emits above ~8 links) instead of the
    * symbol-table B-tree — the write side of the dense-read subset,
    * with real lookup3 record hashes and structure checksums.
    */
  def write(f: NcFile, chunking: Map[String, Chunking] = Map.empty,
            denseRoot: Boolean = false,
            denseHeapFilter: Boolean = false,
            ohdrV2: Boolean = false): Array[Byte] = {
    require(!f.dims.exists(_.isRecord), "h5 write: record dim unsupported")
    case class Msg(tpe: Int, body: Array[Byte])
    def pad8(n: Int) = (n + 7) / 8 * 8
    // v2 ("OHDR") headers: sig(4)+ver+flags+chunkSize(2) + per-message
    // 4-byte headers with UNPADDED bodies + checksum(4) — the header
    // form real libhdf5 "latest" files use (the one whose message
    // anchoring bug survived four rounds of v1-only fixtures)
    def ohSize(msgs: Seq[Msg]): Long =
      if (ohdrV2) 8L + msgs.map(m => 4L + m.body.length).sum + 4L
      else 16L + msgs.map(m => 8L + pad8(m.body.length)).sum

    val vars = f.vars.sortBy(_.name)
    val shapes = vars.map(v => v.dims.map(d => f.dim(d).get.length))

    // ---- plan addresses: superblock, root OH, then either
    // btree+SNODs+heap (symbol-table root) or FRHP+FHDB+BTHD+BTLF
    // (dense root), then var OHs + data
    val sbEnd = 96L
    val rootMsgs0 = // link storage placeholder (addresses patched at emit)
      (if (denseRoot) Msg(0x02, new Array[Byte](18))
       else Msg(0x11, new Array[Byte](16))) +:
        f.attrs.map(a => Msg(0x0C, attrBody(a)))
    val rootOhAddr = sbEnd
    val btreeAddr = rootOhAddr + ohSize(rootMsgs0)
    val btreeSize = 24L + (2 * GROUP_K + 1) * 8 + 2 * GROUP_K * 8
    val snodCap = 2 * GROUP_K
    val snodCount = math.max(1, (vars.length + snodCap - 1) / snodCap)
    val snodSize = 8L + snodCap * 40L
    val snodAddr = btreeAddr + btreeSize
    val heapHdrAddr = snodAddr + snodCount * snodSize
    // heap data: 8 reserved bytes (offset 0 = empty root name), then names
    val nameOffsets = ArrayBuffer.empty[Long]
    var heapCursor = 8L
    vars.foreach { v =>
      nameOffsets += heapCursor
      heapCursor += pad8(v.name.getBytes("UTF-8").length + 1)
    }
    val heapDataSize = math.max(heapCursor, 16L)
    val heapDataAddr = heapHdrAddr + 32L

    // ---- dense-root sizing (link messages are name-sized, so the
    // whole region is computable before variable planning; object
    // header addresses inside the bodies are patched at emit)
    val linkBodies: Seq[Array[Byte]] = if (!denseRoot) Nil else vars.map { v =>
      val nb = v.name.getBytes("UTF-8")
      require(nb.length < 256, s"h5 write: dense link name too long: ${v.name}")
      val b = ByteBuffer.allocate(3 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
      // version 1, flags 0 (1-byte name length, hard link), name, OH addr
      b.put(1.toByte).put(0.toByte).put(nb.length.toByte).put(nb)
      b.putLong(0L)
      b.array()
    }
    val FhdbHeaderSize = 17L // sig + version + heap-header addr + 4-byte offset
    val HeapIdLen = 7 // 1 flag byte + 4-byte offset (32-bit heap) + 2-byte length
    val RecordSize = 4 + HeapIdLen
    val fheapAddr = btreeAddr // same slot: right after the root OH
    val denseFiltered = denseRoot && denseHeapFilter
    // deflate-only v1 pipeline message body — when the heap is
    // filtered the FRHP header grows by stored-size(8) + mask(4) +
    // this body, UNCONDITIONALLY on the root block type (libhdf5
    // sizes the header on filter_len alone; §III.G)
    val densePline: Array[Byte] = if (!denseFiltered) Array.emptyByteArray else {
      val b = ByteBuffer.allocate(8 + 8 + 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(1.toByte); b.put(new Array[Byte](6))
      b.putShort(1.toShort).putShort(0.toShort) // deflate, no name
      b.putShort(0.toShort).putShort(1.toShort) // flags, 1 client value
      b.putInt(6).putInt(0) // level; odd client count pads one word
      b.array()
    }
    val FrhpSize = 146L + (if (denseFiltered) 12L + densePline.length else 0L)
    val denseBlockSize = if (!denseRoot) 0L else if (!denseFiltered) {
      val need = FhdbHeaderSize + linkBodies.map(_.length).sum
      var s = 512L
      while (s < need) s <<= 1
      require(s <= 0xffffL,
        "h5 write: dense link block above 64 KiB out of subset")
      s
    } else {
      // filtered mode exercises the INDIRECT-root read path: size the
      // direct block for roughly half the links so they split across
      // ≥2 blocks under a one-row root indirect block (small corpora
      // whose links fit under the 512-byte floor still emit a valid
      // single-entry root FHIB)
      val maxLink = linkBodies.foldLeft(0L)(_ max _.length)
      val half = (linkBodies.map(_.length.toLong).sum + 1) / 2
      var s = 512L
      while (s < FhdbHeaderSize + math.max(maxLink, half)) s <<= 1
      require(s <= 0xffffL,
        "h5 write: dense link block above 64 KiB out of subset")
      s
    }
    // filtered mode: greedy first-fit of link bodies into direct
    // blocks (var indices per block), capped at the one-row width
    val denseAssign: Seq[Seq[Int]] = if (!denseFiltered) Nil else {
      val groups = ArrayBuffer(ArrayBuffer.empty[Int])
      var used = FhdbHeaderSize
      linkBodies.zipWithIndex.foreach { case (b, i) =>
        if (used + b.length > denseBlockSize) {
          groups += ArrayBuffer(i); used = FhdbHeaderSize + b.length
        } else { groups.last += i; used += b.length }
      }
      require(groups.length <= 4,
        s"h5 write: dense links need ${groups.length} blocks (max one row of 4)")
      groups.map(_.toSeq).toSeq
    }
    val FhibSize = 4L + 1 + 8 + 4 + 4 * 20 + 4 // sig+ver+hdr+offset+entries+csum
    val HeapSlot = denseBlockSize + 64L // per-block file allocation (deflate slack)
    val fhdbAddr = fheapAddr + FrhpSize // direct root, or the root FHIB
    val BthdSize = 38L
    val bthdAddr =
      if (denseFiltered) fhdbAddr + FhibSize + denseAssign.length * HeapSlot
      else fhdbAddr + denseBlockSize
    val btlfAddr = bthdAddr + BthdSize
    val btlfSize = {
      val used = 6L + vars.length * RecordSize + 4
      var s = 512L
      while (s < used) s <<= 1
      s
    }

    // ---- per-variable messages + data placement
    var cursor =
      if (denseRoot) btlfAddr + btlfSize else heapDataAddr + heapDataSize
    case class VarPlan(ohAddr: Long, msgs: Seq[Msg],
                       dataAddr: Long, dataBytes: Array[Byte],
                       chunks: Seq[(Array[Byte], Seq[Long])], btAddr: Long,
                       btRoot: Long, chunkRank: Int)
    val plans = vars.zip(shapes).map { case (v, shape) =>
      val dt = dtypeFor(v.ncType)
      val n = shape.product.max(1)
      require(v.data.length == n,
        s"h5 write: var ${v.name} has ${v.data.length} values, shape wants $n")
      val attrMsgs = v.attrs.map(a => Msg(0x0C, attrBody(a)))
      val base = Seq(Msg(0x01, dataspaceBody(shape)),
        Msg(0x03, datatypeBody(dt)))
      chunking.get(v.name) match {
        case None =>
          val layout = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
          layout.put(3.toByte).put(1.toByte) // v3 contiguous
          // address + size patched at emit time
          val msgs = base ++ Seq(Msg(0x08, layout.array())) ++ attrMsgs
          val ohAddr = cursor
          cursor += ohSize(msgs)
          val dataAddr = cursor
          val bytes = encode(v.data, dt)
          cursor += pad8(bytes.length)
          VarPlan(ohAddr, msgs, dataAddr, bytes, Nil, UNDEF, UNDEF, 0)
        case Some(ck) =>
          require(ck.dims.length == shape.length,
            s"h5 write: chunk rank for ${v.name} must be ${shape.length}")
          val rank = shape.length
          // enumerate chunks row-major; edge chunks padded with 0
          val counts = shape.zip(ck.dims).map { case (d, c) => (d + c - 1) / c }
          val dimProd = shape.scanRight(1)(_ * _).tail
          val cProd = ck.dims.scanRight(1)(_ * _).tail
          val chunkIdx = (0 until counts.product.max(1)).map { ci =>
            var rem = ci
            counts.indices.map { d =>
              val q = rem / counts.drop(d + 1).product.max(1)
              rem %= counts.drop(d + 1).product.max(1)
              q.toLong * ck.dims(d)
            }
          }
          val szipParams: Option[Szip.Params] =
            if (!ck.szip) None
            else {
              require(dt.size <= 4,
                s"h5 write: szip caps at 32-bit samples, got ${dt.size * 8}")
              val scan = ck.dims.last
              Some(Szip.Params(Szip.Raw | Szip.NN | Szip.LSB, dt.size * 8,
                math.min(ck.szipPixelsPerBlock, math.max(2, scan / 2 * 2)),
                math.min(scan, 128 * ck.szipPixelsPerBlock)))
            }
          val chunks = chunkIdx.map { offs =>
            val cn = ck.dims.product
            val vals = new Array[Double](cn)
            var k = 0
            while (k < cn) {
              var rem = k; var src = 0L; var inside = true
              var d = 0
              while (d < rank && inside) {
                val ci = rem / cProd(d); rem %= cProd(d)
                val gi = offs(d) + ci
                if (gi >= shape(d)) inside = false else src += gi * dimProd(d)
                d += 1
              }
              vals(k) = if (inside) v.data(src.toInt) else 0.0
              k += 1
            }
            var bytes = encode(vals, dt)
            if (ck.shuffle) bytes = shuffle(bytes, dt.size)
            if (ck.deflateLevel > 0) bytes = deflate(bytes, ck.deflateLevel)
            szipParams.foreach(p => bytes = Szip.compress(bytes, p))
            if (ck.fletcher32) {
              // checksum the post-compression payload, appended LE —
              // fletcher32 is declared (and applied) last on write, so
              // the reader strips-and-verifies it first
              val c = fletcher32(bytes)
              bytes = bytes ++ Array[Byte](c.toByte, (c >> 8).toByte,
                (c >> 16).toByte, (c >> 24).toByte)
            }
            (bytes, offs)
          }
          val filterMsg: Option[Msg] = {
            val fs = (if (ck.shuffle) Seq((2, Seq(dt.size.toLong))) else Nil) ++
              (if (ck.deflateLevel > 0) Seq((1, Seq(ck.deflateLevel.toLong))) else Nil) ++
              szipParams.map(p => (4, Seq(p.optionMask.toLong,
                p.bitsPerPixel.toLong, p.pixelsPerBlock.toLong,
                p.pixelsPerScanline.toLong))).toSeq ++
              (if (ck.fletcher32) Seq((3, Seq.empty[Long])) else Nil)
            if (fs.isEmpty) None
            else {
              val sz = 8 + fs.map(f => 8 + f._2.length * 4 +
                (if (f._2.length % 2 == 1) 4 else 0)).sum
              val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
              b.put(1.toByte).put(fs.length.toByte)
              b.put(new Array[Byte](6))
              fs.foreach { case (id, cvs) =>
                b.putShort(id.toShort).putShort(0.toShort)
                b.putShort(0.toShort).putShort(cvs.length.toShort)
                cvs.foreach(c => b.putInt(c.toInt))
                if (cvs.length % 2 == 1) b.putInt(0)
              }
              Some(Msg(0x0B, b.array()))
            }
          }
          val layout = ByteBuffer.allocate(pad8(2 + 1 + 8 + 4 * (rank + 1)))
            .order(ByteOrder.LITTLE_ENDIAN)
          layout.put(3.toByte).put(2.toByte).put((rank + 1).toByte)
          // btree address patched at emit; chunk dims + element size now
          layout.putLong(0L)
          ck.dims.foreach(d => layout.putInt(d))
          layout.putInt(dt.size)
          val msgs = base ++ filterMsg.toSeq ++
            Seq(Msg(0x08, layout.array())) ++ attrMsgs
          val ohAddr = cursor
          cursor += ohSize(msgs)
          // chunk B-tree: layers laid out LEAF-FIRST (leaves hold ≤2k
          // chunks each, parents hold ≤2k child nodes, up to a single
          // root) — the root lands last and its address goes in the
          // layout message
          val keySize = 8L + 8L * (rank + 1)
          val nodeSize = 24L + (2 * GROUP_K + 1) * keySize + 2 * GROUP_K * 8
          def levelNodes(c: Int): Int = math.max(1, (c + snodCap - 1) / snodCap)
          var levels = List(levelNodes(chunks.length)) // leaf-first
          while (levels.last > 1) levels = levels :+ levelNodes(levels.last)
          val totalNodes = levels.sum
          val btAddr = cursor
          val btRoot = btAddr + (totalNodes - 1) * nodeSize
          cursor += totalNodes * nodeSize
          val dataAddr = cursor
          chunks.foreach { case (bytes, _) => cursor += pad8(bytes.length) }
          VarPlan(ohAddr, msgs, dataAddr, Array.emptyByteArray, chunks, btAddr,
            btRoot, rank)
      }
    }
    val eof = cursor

    // ---- emit
    val w = new W
    // superblock v0
    w.raw(SIG)
    w.u8(0); w.u8(0); w.u8(0); w.u8(0) // sb/freespace/root versions + reserved
    w.u8(0); w.u8(8); w.u8(8); w.u8(0) // shared-msg ver, offsets, lengths, reserved
    w.u16(GROUP_K); w.u16(GROUP_K) // leaf k, internal k
    w.u32(0) // consistency flags
    w.u64(0); w.u64(UNDEF); w.u64(eof); w.u64(UNDEF)
    // root symbol table entry: cache type 1 carries the symbol-table
    // addresses; a dense root has no symbol table → cache type 0
    w.u64(0); w.u64(rootOhAddr)
    if (denseRoot) { w.u32(0); w.u32(0); w.u64(0); w.u64(0) }
    else { w.u32(1); w.u32(0); w.u64(btreeAddr); w.u64(heapHdrAddr) }

    def emitOh(msgs: Seq[Msg]): Unit = if (ohdrV2) {
      // chunk size counts the MESSAGE region only; the checksum
      // follows it (the convention real libhdf5 files use — verified
      // against the checked-in granules)
      val msgBytes = msgs.map(m => 4 + m.body.length).sum
      require(msgBytes <= 0xFFFF,
        s"h5 write: OHDR v2 chunk of $msgBytes bytes exceeds the 2-byte size field")
      val bb = ByteBuffer.allocate(8 + msgBytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("OHDR".getBytes("ASCII"))
      bb.put(2.toByte).put(0x01.toByte) // version; flags: 2-byte size field
      bb.putShort(msgBytes.toShort)
      msgs.foreach { m =>
        bb.put(m.tpe.toByte)
        bb.putShort(m.body.length.toShort)
        bb.put(0.toByte) // message flags
        bb.put(m.body)
      }
      w.raw(bb.array())
      w.u32(lookup3(bb.array())) // checksum over sig..last message
    } else {
      w.u8(1); w.u8(0)
      w.u16(msgs.length)
      w.u32(1) // reference count
      w.u32(msgs.map(m => 8L + pad8(m.body.length)).sum)
      w.u32(0) // pad to 8
      msgs.foreach { m =>
        w.u16(m.tpe); w.u16(pad8(m.body.length))
        w.u8(0); w.u8(0); w.u16(0)
        w.raw(m.body)
        w.zero(pad8(m.body.length) - m.body.length)
      }
    }

    if (denseRoot) {
      // root OH with patched Link Info message
      val li = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      li.put(0.toByte).put(0.toByte) // version, flags
      li.putLong(fheapAddr).putLong(bthdAddr)
      emitOh(Msg(0x02, li.array()) +: rootMsgs0.tail)

      // fractal heap header (spec §III.G)
      assert(w.pos == fheapAddr)
      val linksBytes = linkBodies.map(_.length.toLong).sum
      val frhpStart = w.pos
      val nBlocks = if (denseFiltered) denseAssign.length else 1
      val heapSpace = nBlocks * denseBlockSize
      w.raw("FRHP".getBytes("ASCII"))
      w.u8(0) // version
      w.u16(HeapIdLen)
      w.u16(densePline.length) // io filter length (0 = unfiltered)
      w.u8(0) // flags: direct blocks not checksummed
      w.u32(denseBlockSize) // max managed object size
      w.u64(0); w.u64(UNDEF) // next huge id, huge B-tree
      w.u64(heapSpace - nBlocks * FhdbHeaderSize - linksBytes) // free space
      w.u64(UNDEF) // free-space manager
      w.u64(heapSpace) // managed space
      w.u64(heapSpace) // allocated managed space
      w.u64(heapSpace) // direct-block iterator offset
      w.u64(vars.length.toLong) // managed object count
      w.u64(0); w.u64(0); w.u64(0); w.u64(0) // huge/tiny size+count
      w.u16(4) // doubling-table width
      w.u64(denseBlockSize) // starting block size
      w.u64(denseBlockSize) // max direct block size
      w.u16(32) // max heap size (bits) → 4-byte offsets
      w.u16(1) // starting rows in root indirect block
      w.u64(fhdbAddr) // root block address
      // current rows: 0 = the root IS a direct block; 1 = root FHIB
      w.u16(if (denseFiltered) 1 else 0)
      if (denseFiltered) {
        // filter_len > 0 ⇒ stored size + mask of the root DIRECT
        // block are present even though the root is indirect here
        // (meaningless but mandatory), then the pipeline message
        w.u64(0); w.u32(0)
        w.raw(densePline)
      }
      w.checksum(frhpStart)
      assert(w.pos == fhdbAddr, "h5 write: FRHP size drift")

      val heapOffsets = ArrayBuffer.empty[(Long, Int)] // (offset, length)
      if (denseFiltered) {
        // root indirect block: one row of direct-block entries, each
        // carrying (address, stored size, filter mask); the direct
        // blocks themselves are deflated whole (header included)
        val blockAddrs = (0 until nBlocks).map(i =>
          fhdbAddr + FhibSize + i * HeapSlot)
        val stored: Seq[Array[Byte]] = denseAssign.zipWithIndex.map {
          case (g, bi) =>
            val cw = new W
            cw.raw("FHDB".getBytes("ASCII"))
            cw.u8(0)
            cw.u64(fheapAddr)
            cw.u32(bi * denseBlockSize) // block offset in heap space
            g.foreach { vi =>
              heapOffsets += ((bi * denseBlockSize + cw.pos, linkBodies(vi).length))
              val patched = ByteBuffer.wrap(linkBodies(vi).clone())
                .order(ByteOrder.LITTLE_ENDIAN)
              patched.position(linkBodies(vi).length - 8)
              patched.putLong(plans(vi).ohAddr)
              cw.raw(patched.array())
            }
            cw.zero(denseBlockSize - cw.pos)
            deflate(cw.out.toByteArray, 6)
        }
        val fhibStart = w.pos
        w.raw("FHIB".getBytes("ASCII"))
        w.u8(0) // version
        w.u64(fheapAddr)
        w.u32(0) // block offset of this indirect block's span
        (0 until 4).foreach { e =>
          if (e < nBlocks) {
            require(stored(e).length <= HeapSlot,
              "h5 write: deflated dense block exceeds its slot")
            w.u64(blockAddrs(e)); w.u64(stored(e).length.toLong); w.u32(0)
          } else { w.u64(UNDEF); w.u64(0); w.u32(0) }
        }
        w.checksum(fhibStart)
        stored.zip(blockAddrs).foreach { case (s, a) =>
          assert(w.pos == a, "h5 write: FHIB slot drift")
          w.raw(s)
          w.zero(a + HeapSlot - w.pos)
        }
      } else {
        // the one direct block: header + packed link messages. Heap
        // offsets count the header bytes (block offset 0 is the block
        // start), so the first object sits at heap offset 17.
        w.raw("FHDB".getBytes("ASCII"))
        w.u8(0)
        w.u64(fheapAddr)
        w.u32(0) // block offset in heap space
        linkBodies.zip(plans).foreach { case (body, p) =>
          heapOffsets += ((w.pos - fhdbAddr, body.length))
          val patched = ByteBuffer.wrap(body.clone()).order(ByteOrder.LITTLE_ENDIAN)
          patched.position(body.length - 8)
          patched.putLong(p.ohAddr)
          w.raw(patched.array())
        }
        w.zero(fhdbAddr + denseBlockSize - w.pos)
      }

      // v2 B-tree header (type 5: link-name index)
      assert(w.pos == bthdAddr)
      val bthdStart = w.pos
      w.raw("BTHD".getBytes("ASCII"))
      w.u8(0); w.u8(5)
      w.u32(btlfSize) // node size
      w.u16(RecordSize)
      w.u16(0) // depth: leaf root
      w.u8(100); w.u8(40) // split/merge percent (libhdf5 defaults)
      w.u64(btlfAddr)
      w.u16(vars.length)
      w.u64(vars.length.toLong)
      w.checksum(bthdStart)
      assert(w.pos == btlfAddr, "h5 write: BTHD size drift")

      // leaf node: records sorted by unsigned lookup3 hash of the name
      val btlfStart = w.pos
      w.raw("BTLF".getBytes("ASCII"))
      w.u8(0); w.u8(5)
      val records = vars.zip(heapOffsets).map { case (v, (off, len)) =>
        (lookup3(v.name.getBytes("UTF-8")) & 0xffffffffL, off, len)
      }.sortBy(_._1)
      records.foreach { case (hash, off, len) =>
        w.u32(hash)
        w.u8(0) // heap ID: version 0, managed object
        w.u32(off)
        w.u16(len)
      }
      w.checksum(btlfStart)
      w.zero(btlfAddr + btlfSize - w.pos)
    } else {
    // root OH with patched symbol-table message
    val stBody = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    stBody.putLong(btreeAddr).putLong(heapHdrAddr)
    emitOh(Msg(0x11, stBody.array()) +: rootMsgs0.tail)

    // group B-tree: level 0, one child per SNOD
    assert(w.pos == btreeAddr)
    w.raw("TREE".getBytes("ASCII"))
    w.u8(0); w.u8(0); w.u16(snodCount)
    w.u64(UNDEF); w.u64(UNDEF)
    val snodFirst = (0 until snodCount).map(i => i * snodCap)
    (0 until snodCount).foreach { i =>
      w.u64(nameOffsets.lift(snodFirst(i)).getOrElse(0L)) // key i
      w.u64(snodAddr + i * snodSize) // child i
    }
    w.u64(nameOffsets.lastOption.getOrElse(0L)) // final key
    w.zero(btreeAddr + btreeSize - w.pos)

    // SNODs
    (0 until snodCount).foreach { i =>
      assert(w.pos == snodAddr + i * snodSize)
      w.raw("SNOD".getBytes("ASCII"))
      w.u8(1); w.u8(0)
      val here = vars.indices.slice(i * snodCap, (i + 1) * snodCap)
      w.u16(here.length)
      here.foreach { vi =>
        w.u64(nameOffsets(vi)); w.u64(plans(vi).ohAddr)
        w.u32(0); w.u32(0); w.zero(16)
      }
      w.zero(snodAddr + (i + 1) * snodSize - w.pos)
    }

    // local heap
    assert(w.pos == heapHdrAddr)
    w.raw("HEAP".getBytes("ASCII"))
    w.u8(0); w.u8(0); w.u16(0)
    w.u64(heapDataSize); w.u64(UNDEF); w.u64(heapDataAddr)
    w.zero(8) // heap offset 0: empty name for the root entry
    vars.zipWithIndex.foreach { case (v, i) =>
      assert(w.pos == heapDataAddr + nameOffsets(i))
      val b = v.name.getBytes("UTF-8")
      w.raw(b); w.zero(pad8(b.length + 1) - b.length)
    }
    w.zero(heapDataAddr + heapDataSize - w.pos)
    }

    // variable object headers + data
    plans.zip(vars).foreach { case (p, v) =>
      assert(w.pos == p.ohAddr, s"h5 write: OH drift for ${v.name}")
      val patched = p.msgs.map { m =>
        if (m.tpe != 0x08) m
        else {
          val b = ByteBuffer.wrap(m.body.clone()).order(ByteOrder.LITTLE_ENDIAN)
          if (p.chunks.isEmpty) { // contiguous: address + size
            b.position(2); b.putLong(p.dataAddr)
            b.putLong(p.dataBytes.length.toLong)
          } else { // chunked: B-tree ROOT address
            b.position(3); b.putLong(p.btRoot)
          }
          Msg(0x08, b.array())
        }
      }
      emitOh(patched)
      if (p.chunks.isEmpty) {
        w.raw(p.dataBytes)
        w.zero(pad8(p.dataBytes.length) - p.dataBytes.length)
      } else {
        val rank = p.chunkRank
        val keySize = 8L + 8L * (rank + 1)
        val nodeSize = 24L + (2 * GROUP_K + 1) * keySize + 2 * GROUP_K * 8
        val chunkAddrs = ArrayBuffer.empty[Long]
        var ca = p.dataAddr
        p.chunks.foreach { case (bytes, _) =>
          chunkAddrs += ca; ca += pad8(bytes.length)
        }
        val shape = vars.zip(shapes).find(_._1.name == v.name).get._2
        // leaf-first layers, written sequentially; parents reference the
        // node addresses of the layer just written, root lands at btRoot
        case class Entry(size: Long, offs: Seq[Long], addr: Long)
        var layerEntries: Seq[Entry] =
          p.chunks.zip(chunkAddrs).map { case ((bytes, offs), a) =>
            Entry(bytes.length.toLong, offs, a)
          }.toSeq
        var level = 0
        var layerAddr = p.btAddr
        var done = false
        while (!done) {
          val nNodes = math.max(1, (layerEntries.length + snodCap - 1) / snodCap)
          val parentEntries = ArrayBuffer.empty[Entry]
          (0 until nNodes).foreach { ni =>
            val nodeAddr = layerAddr + ni * nodeSize
            val mine = layerEntries.slice(ni * snodCap, (ni + 1) * snodCap)
            assert(w.pos == nodeAddr, s"h5 write: B-tree drift for ${v.name}")
            w.raw("TREE".getBytes("ASCII"))
            w.u8(1); w.u8(level); w.u16(mine.length)
            w.u64(UNDEF); w.u64(UNDEF)
            mine.foreach { e =>
              w.u32(e.size); w.u32(0)
              e.offs.foreach(o => w.u64(o)); w.u64(0L)
              w.u64(e.addr)
            }
            // final key: one past the last chunk (dataset dims)
            w.u32(0); w.u32(0)
            shape.foreach(d => w.u64(d.toLong)); w.u64(0L)
            w.zero(nodeAddr + nodeSize - w.pos)
            parentEntries += Entry(nodeSize, mine.head.offs, nodeAddr)
          }
          layerAddr += nNodes * nodeSize
          if (nNodes == 1) {
            assert(layerAddr - nodeSize == p.btRoot,
              s"h5 write: root drift for ${v.name}")
            done = true
          } else layerEntries = parentEntries.toSeq
          level += 1
        }
        assert(w.pos == p.dataAddr)
        p.chunks.foreach { case (bytes, _) =>
          w.raw(bytes); w.zero(pad8(bytes.length) - bytes.length)
        }
      }
    }
    assert(w.pos == eof, s"h5 write: EOF drift (${w.pos} vs $eof)")
    w.out.toByteArray
  }
}
