package graft.sources

import graft.SparkSpec
import NetcdfClassic.{NcAttr, NcDim, NcFile, NcVar}
import NetcdfClassic.{NC_CHAR, NC_DOUBLE, NC_FLOAT, NC_INT, NC_SHORT}

/** HDF5 subset codec: byte-level structure pins against the public
  * format spec, write→read round-trips across layouts and filters, and
  * the NetCDF-4 granule ingest path end-to-end.
  */
class H5LiteSpec extends SparkSpec {

  /** Load a checked-in /h5 fixture (shared by every fixture test). */
  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/h5/$name")
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def grid2x3(name: String = "sst") = NcFile(
    dims = Seq(NcDim("lat", 2), NcDim("lon", 3)),
    attrs = Seq(NcAttr("title", NC_CHAR, text = "h5lite test"),
      NcAttr("version", NC_INT, nums = Seq(3.0))),
    vars = Seq(
      NcVar("lat", Seq("lat"), NC_DOUBLE, Nil, Array(-0.5, 0.5)),
      NcVar("lon", Seq("lon"), NC_DOUBLE, Nil, Array(10.0, 11.0, 12.0)),
      NcVar(name, Seq("lat", "lon"), NC_FLOAT,
        Seq(NcAttr("scale_factor", NC_DOUBLE, nums = Seq(0.5)),
          NcAttr("add_offset", NC_DOUBLE, nums = Seq(100.0)),
          NcAttr("_FillValue", NC_FLOAT, nums = Seq(-9999.0))),
        Array(1.0, 2.0, -9999.0, 4.0, 5.0, 6.0))))

  test("superblock and signature bytes match the public spec") {
    val bytes = H5Lite.write(grid2x3())
    // \x89 H D F \r \n \x1a \n
    assert(bytes.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 'H'.toInt, 'D'.toInt, 'F'.toInt, '\r'.toInt, '\n'.toInt, 0x1a, '\n'.toInt))
    assert(bytes(8) === 0) // superblock version 0
    assert(bytes(13) === 8 && bytes(14) === 8) // offset/length sizes
    assert(H5Lite.isHdf5(bytes))
    // EOF address at offset 40 equals the file length
    val eof = java.nio.ByteBuffer.wrap(bytes, 40, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(eof === bytes.length.toLong)
    // structural signatures present: group B-tree, symbol node, heap
    val s = new String(bytes.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(s.contains("TREE") && s.contains("SNOD") && s.contains("HEAP"))
  }

  test("contiguous write → read round-trips dims, attrs, data, CF unpack") {
    val f = H5Lite.read(H5Lite.write(grid2x3()))
    assert(f.vars.map(_.name).sorted === Seq("lat", "lon", "sst"))
    val sst = f.variable("sst").get
    assert(f.shape(sst) === Seq(2, 3))
    assert(sst.data.toSeq === Seq(1.0, 2.0, -9999.0, 4.0, 5.0, 6.0))
    // CF unpacking through the shared NcVar model
    val un = sst.unpacked
    assert(un(0) === 100.5 && un(2).isNaN && un(5) === 103.0)
    assert(f.variable("lat").get.data.toSeq === Seq(-0.5, 0.5))
    assert(f.attrs.find(_.name == "title").get.text === "h5lite test")
    assert(f.attrs.find(_.name == "version").get.first === Some(3.0))
    assert(sst.attr("scale_factor").get.first === Some(0.5))
  }

  test("integer and short datatypes round-trip") {
    val f0 = NcFile(Seq(NcDim("n", 4)), Nil, Seq(
      NcVar("i", Seq("n"), NC_INT, Nil, Array(-2.0, -1.0, 0.0, 2147483647.0)),
      NcVar("s", Seq("n"), NC_SHORT, Nil, Array(-32768.0, -1.0, 0.0, 32767.0))))
    val f = H5Lite.read(H5Lite.write(f0))
    assert(f.variable("i").get.data.toSeq === Seq(-2.0, -1.0, 0.0, 2147483647.0))
    assert(f.variable("s").get.data.toSeq === Seq(-32768.0, -1.0, 0.0, 32767.0))
  }

  test("chunked + shuffle + deflate round-trips, including edge chunks") {
    val n = 7 * 13 // chunk 4×5 does NOT divide 7×13 — edge chunks clip
    val data = Array.tabulate(n)(i => math.sin(i * 0.7) * 50)
    val f0 = NcFile(Seq(NcDim("y", 7), NcDim("x", 13)), Nil,
      Seq(NcVar("v", Seq("y", "x"), NC_DOUBLE, Nil, data)))
    val bytes = H5Lite.write(f0,
      chunking = Map("v" -> H5Lite.Chunking(Seq(4, 5))))
    val f = H5Lite.read(bytes)
    assert(f.variable("v").get.data.toSeq === data.toSeq)
    // deflate actually engaged: on a large compressible grid the
    // chunked file undercuts the contiguous one despite B-tree overhead
    val big = NcFile(Seq(NcDim("y", 40), NcDim("x", 50)), Nil,
      Seq(NcVar("v", Seq("y", "x"), NC_DOUBLE, Nil,
        Array.fill(2000)(7.25))))
    val bigChunked = H5Lite.write(big,
      chunking = Map("v" -> H5Lite.Chunking(Seq(8, 10))))
    val bigRaw = H5Lite.write(big).length
    assert(bigChunked.length < bigRaw,
      s"chunked+deflate ${bigChunked.length} not below contiguous $bigRaw")
    assert(H5Lite.read(bigChunked).variable("v").get.data.forall(_ === 7.25))
  }

  test("many chunks exercise a multi-level chunk B-tree") {
    // 32 chunks of 2 elements > 2k=8 per node → 4 leaves + 1 root
    val data = Array.tabulate(64)(_.toDouble * 1.5)
    val f0 = NcFile(Seq(NcDim("n", 64)), Nil,
      Seq(NcVar("v", Seq("n"), NC_FLOAT, Nil, data)))
    val bytes = H5Lite.write(f0,
      chunking = Map("v" -> H5Lite.Chunking(Seq(2), deflateLevel = 0,
        shuffle = false)))
    assert(H5Lite.read(bytes).variable("v").get.data.toSeq === data.toSeq)
    // shuffle-only variant (no deflate) also round-trips
    val b2 = H5Lite.write(f0,
      chunking = Map("v" -> H5Lite.Chunking(Seq(16), deflateLevel = 0)))
    assert(H5Lite.read(b2).variable("v").get.data.toSeq === data.toSeq)
  }

  test("3-D (time, lat, lon) chunked granule round-trips") {
    val (nt, nlat, nlon) = (3, 4, 5)
    val data = Array.tabulate(nt * nlat * nlon)(_.toDouble)
    val f0 = NcFile(
      Seq(NcDim("time", nt), NcDim("lat", nlat), NcDim("lon", nlon)), Nil,
      Seq(NcVar("time", Seq("time"), NC_DOUBLE, Nil, Array(0.0, 3600.0, 7200.0)),
        NcVar("lat", Seq("lat"), NC_DOUBLE, Nil, Array(-1.5, -0.5, 0.5, 1.5)),
        NcVar("lon", Seq("lon"), NC_DOUBLE, Nil, Array(1.0, 2.0, 3.0, 4.0, 5.0)),
        NcVar("analysed_sst", Seq("time", "lat", "lon"), NC_FLOAT, Nil, data)))
    val bytes = H5Lite.write(f0, chunking =
      Map("analysed_sst" -> H5Lite.Chunking(Seq(1, 4, 5))))
    val f = H5Lite.read(bytes)
    assert(f.shape(f.variable("analysed_sst").get) === Seq(nt, nlat, nlon))
    assert(f.variable("analysed_sst").get.data.toSeq === data.toSeq)
  }

  test("dense-group round-trip: 20 variables via fractal heap + v2 B-tree") {
    // libhdf5 switches to dense link storage above ~8 links — a
    // 20-variable granule is the layout a real multi-variable NetCDF-4
    // file actually has
    val names = (0 until 20).map(i => f"var_$i%02d")
    val f0 = NcFile(
      Seq(NcDim("x", 5)),
      Seq(NcAttr("title", NC_CHAR, text = "dense granule")),
      names.zipWithIndex.map { case (nm, i) =>
        NcVar(nm, Seq("x"), NC_DOUBLE,
          Seq(NcAttr("idx", NC_INT, nums = Seq(i.toDouble))),
          Array.tabulate(5)(j => i * 100.0 + j))
      })
    val bytes = H5Lite.write(f0, denseRoot = true)
    val f = H5Lite.read(bytes)
    assert(f.vars.map(_.name).sorted === names)
    names.zipWithIndex.foreach { case (nm, i) =>
      val v = f.variable(nm).get
      assert(v.data.toSeq === (0 until 5).map(j => i * 100.0 + j))
      assert(v.attr("idx").get.nums === Seq(i.toDouble))
    }
    assert(f.attrs.exists(a => a.name == "title" && a.text == "dense granule"))
    // the dense file must NOT contain a v1 group B-tree signature for
    // the root (no TREE/SNOD for links; chunk B-trees would be TREE
    // but this file is contiguous)
    val s = new String(bytes.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(!s.contains("SNOD"))
    assert(s.contains("FRHP") && s.contains("FHDB") &&
      s.contains("BTHD") && s.contains("BTLF"))
  }

  test("FILTERED dense heap with an INDIRECT root round-trips: the FRHP " +
    "carries stored-size + mask + pipeline even though the root is an FHIB") {
    // libhdf5 writes the filtered-root size/mask fields whenever the
    // filter length is non-zero, regardless of root block type — a
    // reader that ties them to "root is direct" misparses every
    // filtered heap that has grown past its root direct block
    // long names make the link bodies total ~1.1 KiB: the half-corpus
    // sizing picks a 1024-byte block (1007 B capacity), so the links
    // CANNOT fit one block — the round-trip necessarily drives the
    // multi-block greedy split, per-block heap offsets, and the
    // multi-entry FHIB, not just a single-entry indirect root
    val names = (0 until 28).map(i => f"filtered_variable_long_name_$i%02d")
    val f0 = NcFile(
      Seq(NcDim("x", 3)), Nil,
      names.zipWithIndex.map { case (nm, i) =>
        NcVar(nm, Seq("x"), NC_DOUBLE, Nil,
          Array.tabulate(3)(j => i * 10.0 + j))
      })
    val bytes = H5Lite.write(f0, denseRoot = true, denseHeapFilter = true)
    // structural proof the indirect path was taken
    val s = new String(bytes.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(s.contains("FRHP") && s.contains("FHIB"),
      "filtered dense heap must have an indirect root block")
    assert(!s.contains("FHDB"),
      "direct blocks are deflated whole — no cleartext FHDB signature")
    val f = H5Lite.read(bytes)
    assert(f.vars.map(_.name).sorted === names)
    names.zipWithIndex.foreach { case (nm, i) =>
      assert(f.variable(nm).get.data.toSeq === (0 until 3).map(j => i * 10.0 + j))
    }
  }

  test("variable projection pushdown: non-kept payloads are NEVER " +
    "decoded (a corrupted dropped variable cannot break the read)") {
    val d1 = Array.tabulate(24)(i => math.cos(i * 0.21) * 40)
    val d2 = Array.tabulate(24)(i => 1000.0 + i)
    val f0 = NcFile(Seq(NcDim("y", 4), NcDim("x", 6)), Nil,
      Seq(NcVar("sst", Seq("y", "x"), NC_DOUBLE, Nil, d1),
        NcVar("wind", Seq("y", "x"), NC_DOUBLE, Nil, d2)))
    val bytes = H5Lite.write(f0, chunking = Map(
      "sst" -> H5Lite.Chunking(Seq(4, 6), deflateLevel = 0, shuffle = false,
        fletcher32 = true),
      "wind" -> H5Lite.Chunking(Seq(4, 6), deflateLevel = 0, shuffle = false,
        fletcher32 = true)))
    // corrupt a byte inside wind's (uncompressed, checksummed) chunk
    val probe = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(d2(0)).array()
    val at = bytes.indexOfSlice(probe.toSeq)
    assert(at > 0)
    val corrupt = bytes.clone()
    corrupt(at + 2) = (corrupt(at + 2) ^ 0x20).toByte
    // full read decodes wind → checksum failure
    intercept[Exception](H5Lite.read(corrupt).vars.foreach(_ => ()))
    // pruned read never touches wind's chunks: succeeds, sst intact,
    // wind absent from the model (asking for it fails loudly)
    val pruned = H5Lite.read(corrupt, keep = Set("sst"))
    assert(pruned.variable("sst").get.data.toSeq === d1.toSeq)
    assert(pruned.variable("wind").isEmpty)
    assert(pruned.dims.map(_.name).toSet === Set("sst_d0", "sst_d1"))
  }

  test("fletcher32 round-trips over shuffle+deflate and DETECTS a " +
    "flipped payload byte") {
    val data = Array.tabulate(40)(i => math.sin(i * 0.37) * 50)
    val f0 = NcFile(Seq(NcDim("x", 40)), Nil,
      Seq(NcVar("v", Seq("x"), NC_DOUBLE, Nil, data)))
    val bytes = H5Lite.write(f0, chunking =
      Map("v" -> H5Lite.Chunking(Seq(16), fletcher32 = true)))
    assert(H5Lite.read(bytes).variable("v").get.data.toSeq === data.toSeq)
    // also with compression off: checksum over the raw chunk
    val plain = H5Lite.write(f0, chunking = Map("v" ->
      H5Lite.Chunking(Seq(16), deflateLevel = 0, shuffle = false,
        fletcher32 = true)))
    assert(H5Lite.read(plain).variable("v").get.data.toSeq === data.toSeq)
    // flip one payload byte of the uncompressed variant: the read
    // must fail the checksum, not silently return corrupt values.
    // (Chunk payloads are raw doubles here, so locate a chunk by its
    // known first element and corrupt a byte inside it.)
    val first = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(data(16)).array()
    val at = plain.indexOfSlice(first.toSeq)
    assert(at > 0, "could not locate chunk payload to corrupt")
    val corrupt = plain.clone()
    corrupt(at + 3) = (corrupt(at + 3) ^ 0x40).toByte
    val e = intercept[Exception](
      H5Lite.read(corrupt).variable("v").get.data.toSeq)
    assert(e.getMessage.contains("fletcher32"), e.getMessage)
  }

  test("dense group combines with chunked+deflate variables") {
    val data = Array.tabulate(48)(_ * 1.5)
    val f0 = NcFile(
      Seq(NcDim("a", 6), NcDim("b", 8)), Nil,
      (0 until 12).map(i => NcVar(s"v$i", Seq("a", "b"), NC_FLOAT, Nil,
        data.map(_ + i))))
    val bytes = H5Lite.write(f0,
      chunking = Map("v3" -> H5Lite.Chunking(Seq(4, 4)), // non-dividing edge
        "v7" -> H5Lite.Chunking(Seq(2, 8), deflateLevel = 6)),
      denseRoot = true)
    val f = H5Lite.read(bytes)
    (0 until 12).foreach { i =>
      assert(f.variable(s"v$i").get.data.toSeq ===
        data.map(d => (d + i).toFloat.toDouble).toSeq, s"v$i")
    }
  }

  test("lookup3 matches the published hashlittle vectors") {
    // vectors from the lookup3.c self-test ("" and incremental strings
    // with initval 0): hashlittle("", 0) = 0xdeadbeef,
    // hashlittle("Four score and seven years ago", 0) = 0x17770551
    assert(H5Lite.lookup3(Array.emptyByteArray) === 0xdeadbeef)
    assert(H5Lite.lookup3(
      "Four score and seven years ago".getBytes("ASCII")) === 0x17770551)
  }

  test("fletcher32 matches independently computed H5checksum.c vectors") {
    // no libhdf5 binary exists in this environment to author a real
    // fletcher32-filtered file (the six checked-in field granules use
    // deflate only), so the checksum semantics are pinned against
    // values computed BY HAND and by a third python transcription of
    // the published H5checksum.c — covering the big-endian word pairing
    // ((d[0]<<8)|d[1]), the high-padded odd tail byte, and the 360-word
    // partial-reduction folds, the three places a re-derivation could
    // plausibly diverge from libhdf5
    def f(bytes: Array[Byte]): Long = H5Lite.fletcher32(bytes)
    assert(f(Array.emptyByteArray) === 0L)
    assert(f(Array[Byte](1, 2)) === 0x01020102L)
    assert(f(Array[Byte](1)) === 0x01000100L) // odd tail pads HIGH
    assert(f(Array.fill[Byte](4)(-1)) === 0xffffffffL)
    assert(f("abcde".getBytes("ASCII")) === 0x4ff029c7L)
    // 2048 B = 1024 words: crosses the 360-word reduction twice
    assert(f(Array.tabulate[Byte](2048)(i => (i % 256).toByte)) === 0x282e01feL)
    assert(f(Array.fill[Byte](1000)(0)) === 0L)
  }

  test("compound-typed datasets surface per-member point columns") {
    // tools/make_h5_fixture.py build_compound_*: v3 compound records.
    // hand_compound.h5: contiguous 'obs' — time f64, lat/lon f32,
    // qc i16 (signed, negative value included), name char[4] (string
    // member: SKIPPED, never aborts). hand_compound_chunked.h5:
    // 'prof' (depth f64, temp f32) in [2]-element chunks behind
    // shuffle+deflate with a clipped edge chunk — the full filter
    // stack striding compound elements.
    val f = H5Lite.read(res("hand_compound.h5"))
    assert(f.vars.map(_.name).sorted ===
      Seq("obs.lat", "obs.lon", "obs.qc", "obs.time"))
    val time = f.variable("obs.time").get
    assert(f.shape(time) === Seq(5))
    assert(time.data.toSeq === Seq(1000.5, 1001.5, 1002.5, 1003.5, 1004.5))
    assert(f.variable("obs.lat").get.data.toSeq ===
      Seq(10.0, 10.25, 10.5, 10.75, 11.0))
    assert(f.variable("obs.lon").get.data.toSeq ===
      Seq(-40.0, -40.5, -41.0, -41.5, -42.0))
    assert(f.variable("obs.qc").get.data.toSeq ===
      Seq(0.0, 1.0, -1.0, 2.0, 3.0))
    // the dataset's attributes ride along on every member variable
    assert(f.variable("obs.lat").get.attr("units").get.text === "insitu")
    val g = H5Lite.read(res("hand_compound_chunked.h5"))
    assert(g.variable("prof.depth").get.data.toSeq ===
      Seq(0.0, 10.0, 20.0, 30.0, 40.0))
    assert(g.variable("prof.temp").get.data.toSeq ===
      Seq(20.5, 19.0, 17.25, 15.5, 13.75))
    // projection pushdown addresses MEMBER-QUALIFIED names: a 2-D
    // compound dataset kept only via "grid.b" decodes exactly that
    // member; a keep matching nothing drops the dataset entirely
    val h = H5Lite.read(res("hand_compound_2d.h5"), keep = _ == "grid.b")
    assert(h.vars.map(_.name) === Seq("grid.b"))
    assert(h.variable("grid.b").get.data.toSeq ===
      Seq(-5.0, -6.0, -7.0, -8.0, -9.0, -10.0))
    assert(h.shape(h.variable("grid.b").get) === Seq(2, 3))
    assert(H5Lite.read(res("hand_compound_2d.h5"),
      keep = _ == "nothing").vars.isEmpty)
    // keeping the dataset name yields every member
    val full = H5Lite.read(res("hand_compound_2d.h5"), keep = _ == "grid")
    assert(full.vars.map(_.name).sorted === Seq("grid.a", "grid.b"))
    assert(full.variable("grid.a").get.data.toSeq ===
      Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0))
  }

  test("fletcher32 chunks from the independent python path verify and decode") {
    // tools/make_h5_fixture.py build_fletcher_chunked: shuffle ->
    // deflate -> fletcher32 (the real-archive stack), with the
    // checksum computed by an INDEPENDENT python implementation of the
    // public H5checksum.c algorithm — so verification no longer rests
    // on the Scala implementation agreeing with itself
    val bytes = res("hand_fletcher.h5")
    val f = H5Lite.read(bytes)
    assert(f.variable("w").get.data.toSeq ===
      Seq(100.25, -3.5, 7.75, 2024.0, -0.125, 55.5))
    // corrupting any stored checksum byte must fail LOUDLY: flip one
    // bit in the last 4 bytes of the first chunk (checksum trailer).
    // Chunk data sits at the end of the file; find it by re-reading
    // with a corrupted copy of every byte position in the tail region
    // and requiring at least one loud fletcher32 failure
    val tail = (bytes.length - 60) until bytes.length
    val loud = tail.count { p =>
      val b = bytes.clone()
      b(p) = (b(p) ^ 1).toByte
      try { H5Lite.read(b); false }
      catch {
        case e: Exception => e.getMessage != null &&
          e.getMessage.contains("fletcher32 checksum mismatch")
      }
    }
    assert(loud > 0, "no tail corruption tripped the checksum gate")
  }

  test("external links resolve through the cross-file hook, drop without it") {
    // tools/make_h5_fixture.py build_external_links: a local dataset,
    // an external link to hand_contiguous.h5's /temp, and a link to a
    // missing file. With a resolver the target file decodes in its
    // own address space and grafts under the link's name with
    // synthetic dims; without one, externals drop exactly like h5py
    // with the target file absent.
    val aux = res("hand_contiguous.h5")
    val main = res("hand_external.h5")
    val f = H5Lite.read(main,
      resolve = nm => if (nm == "hand_contiguous.h5") Some(aux) else None)
    assert(f.vars.map(_.name).sorted === Seq("ext_temp", "local"))
    val et = f.variable("ext_temp").get
    assert(f.shape(et) === Seq(2, 3))
    assert(et.data.toSeq === Seq(273.15, 274.0, 275.5, 280.25, 281.0, 282.75))
    assert(et.attr("units").get.text === "K") // target attrs ride along
    assert(f.variable("local").get.data.toSeq === Seq(7.0, 8.0))
    // no resolver: externals drop silently, local survives
    val bare = H5Lite.read(main)
    assert(bare.vars.map(_.name) === Seq("local"))
    // a link to the target ROOT ('/') grafts every target variable
    // under '<link>/<name>' — separator preserved
    val rootMain = res("hand_external_root.h5")
    val fr = H5Lite.read(rootMain,
      resolve = nm => if (nm == "hand_contiguous.h5") Some(aux) else None)
    assert(fr.vars.map(_.name) === Seq("root_lnk/temp"))
    assert(fr.variable("root_lnk/temp").get.data.length === 6)
    // projection pushdown applies to the grafted name: a keep that
    // rejects 'ext_temp' never surfaces it (multi-dim), local is 1-D
    val pruned = H5Lite.read(main, keep = _ == "nothing",
      resolve = nm => if (nm == "hand_contiguous.h5") Some(aux) else None)
    assert(pruned.vars.map(_.name) === Seq("local"))
  }

  test("version-4 data layouts: single-chunk, implicit, fixed array (incl. paged)") {
    // tools/make_h5_fixture.py build_v4_*: the HDF5 1.10+ chunk
    // indexes libver-LATEST writers emit for fixed-dims data —
    // deflate-filtered single chunk, packed implicit chunks (edge
    // chunk clipped), and shuffle+deflate fixed-array chunks in both
    // the inline and PAGED data-block forms
    val sc = H5Lite.read(res("hand_v4_single.h5")).variable("sc").get
    assert(sc.data.toSeq === (0 until 12).map(i => 3.5 * i - 7.0))
    val im = H5Lite.read(res("hand_v4_implicit.h5")).variable("im").get
    assert(im.data.toSeq === (0 until 10).map(i => 2.0 * i + 0.5))
    for (f <- Seq("hand_v4_fixedarray.h5", "hand_v4_fa_paged.h5")) {
      val fa = H5Lite.read(res(f)).variable("fa").get
      assert(fa.data.toSeq === (0 until 20).map(i => ((7 * i) % 23).toDouble),
        f)
    }
    // a PAGED fixed array with an UNINITIALIZED page (bitmap bit
    // clear) BEFORE an initialized one: page-0 chunks stay fill
    // (NaN), page-1 chunks decode. Real HDF5 allocates every page
    // slot and addresses pages arithmetically (H5FAdblock.c), so the
    // clear page's full-stride slot (garbage bytes in the fixture)
    // must be stepped over — a reader that treats it as zero on-disk
    // bytes parses page 1 from the slack and fails
    val fs = H5Lite.read(res("hand_v4_fa_sparse.h5")).variable("fs").get
    assert(fs.data.take(12).forall(_.isNaN))
    assert(fs.data.drop(12).toSeq ===
      (12 until 20).map(i => ((7 * i) % 23).toDouble))
    // v2-B-tree chunk index (record type 11: filtered chunks at
    // scaled offsets) — the >1-unlimited-dims shape
    val bt = H5Lite.read(res("hand_v4_btree.h5")).variable("bt").get
    assert(bt.data.toSeq === (0 until 24).map(i => ((11 * i) % 29).toDouble))
    // an extensible-array index (unlimited dims) refuses loudly
    val bytes = res("hand_v4_single.h5")
    // the index-type byte sits right after the 17-byte v4 header
    // (ver,class,flags,nd,encLen + 3 dims x 4): find the layout
    // message by its unique prefix 04 02 02 03 04
    val pat = Array[Byte](4, 2, 2, 3, 4)
    val at = bytes.indices.indexWhere(i => i + 5 <= bytes.length &&
      pat.indices.forall(j => bytes(i + j) == pat(j)))
    assert(at > 0, "layout message not found")
    val broken = bytes.clone()
    broken(at + 5 + 12) = 4 // single -> extensible array
    val e = intercept[Exception](H5Lite.read(broken))
    assert(e.getMessage.contains("chunk index type 4"), e.getMessage)
  }

  test("paged fixed-array page-pattern sweep: every init/clear layout decodes") {
    // tools/make_h5_fixture.py build_v4_fa_pattern: full arithmetic
    // page strides per H5FAdblock.c with the initialized-page set
    // swept over every pattern class (clear first/middle/last/all,
    // alternating two-entry pages, all-init at an exact page
    // boundary) — a page-addressing regression cannot hide behind
    // any single layout (the r8 HIGH fix was caught by exactly one)
    val patterns = Seq(
      ("q0", 2, 10, Set(1, 2)),          // clear FIRST page
      ("q1", 2, 10, Set(0, 2)),          // clear MIDDLE page
      ("q2", 2, 10, Set(0, 1)),          // clear LAST (truncated) page
      ("q3", 2, 10, Set.empty[Int]),     // ALL pages clear
      ("q4", 1, 9, Set(0, 2, 4)),        // alternating two-entry pages
      ("q5", 2, 16, Set(0, 1, 2, 3)))    // all init, exact boundary
    for ((tag, pb, nchunks, init) <- patterns) {
      val v = H5Lite.read(res(s"hand_v4_fa_$tag.h5")).variable(tag).get
      val page = 1 << pb
      val exp = (0 until nchunks * 3).map { e =>
        if (init((e / 3) / page)) ((7 * e) % 23).toDouble else Double.NaN
      }
      assert(v.data.length === exp.length, tag)
      v.data.zip(exp).zipWithIndex.foreach { case ((g, x), i) =>
        if (x.isNaN) assert(g.isNaN, s"$tag[$i]")
        else assert(g === x, s"$tag[$i]")
      }
    }
  }

  test("szip chunks from an independent python encoder decode") {
    // tools/make_h5_fixture.py build_szip: CCSDS 121.0 Rice bitstreams
    // encoded by an independent python implementation that makes its
    // OWN per-block option choices (it never emits 2nd-extension), so
    // the Scala decoder is exercised against spec-valid bytes it did
    // not produce — closing the loop the hand-pinned bitstream vectors
    // started. Chunk 1 is a +3 ramp (k-split blocks with a raw
    // reference sample); chunk 2 is constant (reference + zero-run
    // remainder-of-segment).
    val in = getClass.getResourceAsStream("/h5/hand_szip.h5")
    assert(in != null)
    val bytes = try in.readAllBytes() finally in.close()
    val f = H5Lite.read(bytes)
    val z = f.variable("z").get
    assert(z.data.toSeq ===
      ((0 until 16).map(i => 100.0 + 3 * i) ++ Seq.fill(16)(500.0)))
  }

  test("decodes spec-derived fixtures from an independent implementation") {
    // bytes hand-assembled from the HDF5 spec by tools/make_h5_fixture.py
    // (python, written independently of the Scala writer) — breaks the
    // writer↔reader round-trip circularity
    val f1 = H5Lite.read(res("hand_contiguous.h5"))
    val temp = f1.variable("temp").get
    assert(f1.shape(temp) === Seq(2, 3))
    assert(temp.data.toSeq === Seq(273.15, 274.0, 275.5, 280.25, 281.0, 282.75))
    assert(temp.attr("units").get.text === "K")
    val f2 = H5Lite.read(res("hand_chunked.h5"))
    assert(f2.variable("v").get.data.toSeq ===
      Seq(1.5, -2.5, 3.5, -4.5, 5.5, -6.5))
    // netCDF-4 decorations: a vlen-class DIMENSION_LIST attribute must
    // decode as an EMPTY attr (not abort), and a chunk stored RAW with
    // the deflate bit set in its B-tree filter mask must skip inflate
    val f3 = H5Lite.read(res("hand_nc4_decorated.h5"))
    val v3 = f3.variable("v").get
    assert(v3.data.toSeq === Seq(10.5, 11.5, 12.5, 13.5, 14.5, 15.5))
    assert(v3.attr("DIMENSION_LIST").exists(_.text === ""))
    assert(v3.attr("units").get.text === "K")
    // dense root group (Link Info → fractal heap + v2 B-tree) from the
    // independent generator: 20 variables must all resolve
    val f4 = H5Lite.read(res("hand_dense.h5"))
    assert(f4.vars.map(_.name).sorted === (0 until 20).map(i => f"d$i%02d"))
    (0 until 20).foreach { i =>
      assert(f4.variable(f"d$i%02d").get.data.toSeq ===
        (0 until 3).map(j => i * 10.0 + j), s"d$i")
    }
    // dense ATTRIBUTE storage: 10 CF-style attributes in a fractal
    // heap indexed by a type-8 v2 B-tree (libhdf5's layout above ~8
    // attrs — ordinary CF metadata exceeds that routinely)
    val fa = H5Lite.read(res("hand_dense_attrs.h5"))
    val tempDa = fa.variable("temp").get
    assert(tempDa.data.toSeq === Seq(300.0, 301.0, 302.0))
    assert(tempDa.attrs.length === 10)
    assert(tempDa.attr("units").get.text === "K")
    assert(tempDa.attr("long_name").get.text === "temperature")
    assert(tempDa.attr("coordinates").get.text === "lat lon")
    assert(tempDa.attr("references").get.text === "doc")
    // depth-1 v2 B-tree (BTIN root + separator record + two leaves) —
    // the link-index shape libhdf5 grows past ~185 links
    val f5 = H5Lite.read(res("hand_dense_deep.h5"))
    assert(f5.vars.map(_.name).sorted === (0 until 21).map(i => f"e$i%02d"))
    (0 until 21).foreach { i =>
      assert(f5.variable(f"e$i%02d").get.data.toSeq ===
        (0 until 3).map(j => i * 7.0 + j), s"e$i")
    }
    // fractal heap with a root INDIRECT block whose row 2 nests child
    // indirect blocks (one with a missing second slot) over 7 direct
    // blocks — the self-similar doubling-table walk
    val f6 = H5Lite.read(res("hand_heap_nested.h5"))
    assert(f6.vars.map(_.name).sorted === (0 until 7).map(i => s"n$i"))
    (0 until 7).foreach { i =>
      assert(f6.variable(s"n$i").get.data.toSeq === Seq(i * 2.0, i * 2.0 + 1))
    }
    // FILTERED fractal heap: the root direct block is deflated; the
    // FRHP carries the stored size, mask and pipeline message
    val f7 = H5Lite.read(res("hand_heap_filtered.h5"))
    assert(f7.vars.map(_.name).sorted === Seq("f0", "f1", "f2"))
    (0 until 3).foreach { i =>
      assert(f7.variable(s"f$i").get.data.toSeq === Seq(100.0 + i, 200.0 + i))
    }
    // DEPTH-2 v2 B-tree: root BTIN (child pointers carry the
    // subtree-total field) over 3 internal nodes and 9 leaves
    val f8 = H5Lite.read(res("hand_btree_depth2.h5"))
    assert(f8.vars.map(_.name).sorted === (0 until 24).map(i => f"q$i%02d"))
    (0 until 24).foreach { i =>
      assert(f8.variable(f"q$i%02d").get.data.toSeq === Seq(i * 3.0))
    }
  }

  test("DIMENSION_LIST references resolve to real shared dim names; " +
    "vlen strings decode through the global heap") {
    val f = H5Lite.read(res("hand_dimension_list.h5"))
    val sst = f.variable("sst").get
    // vlen-of-object-reference attr → the lat/lon datasets by identity,
    // not synthetic per-variable names
    assert(sst.dims === Seq("lat", "lon"))
    assert(f.shape(sst) === Seq(2, 3))
    assert(f.dim("lat").get.length === 2 && f.dim("lon").get.length === 3)
    assert(sst.data.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    // coordinate variables share the dims they define
    assert(f.variable("lat").get.dims === Seq("lat"))
    assert(f.variable("lon").get.dims === Seq("lon"))
    // vlen STRING attribute fetched from the GCOL collection
    assert(sst.attr("summary").get.text === "synthetic granule")
    // the vlen sequence keeps its per-axis grouping beside the
    // flattened refs: exactly one scale per axis here — the grouping
    // is what lets resolution reject a two-scales-on-one-axis list
    // that flattens to the same total
    assert(sst.attr("DIMENSION_LIST").get.groups === Seq(1, 1))
    // a corrupt global heap must DEGRADE (empty attrs, synthetic dims),
    // never abort the granule
    val bytes = res("hand_dimension_list.h5")
    val gcolPos = {
      var i = 0
      while (!(bytes(i) == 'G' && bytes(i + 1) == 'C' &&
        bytes(i + 2) == 'O' && bytes(i + 3) == 'L')) i += 1
      i
    }
    val corrupt = bytes.clone()
    corrupt(gcolPos) = 'X'.toByte
    val fc = H5Lite.read(corrupt)
    val sstC = fc.variable("sst").get
    assert(sstC.dims === Seq("sst_d0", "sst_d1"))
    assert(sstC.attr("summary").get.text === "")
    assert(sstC.data.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("compound attribute values decode as flattened numeric members " +
    "(REFERENCE_LIST-shaped {dataset ref, index}), v3 and v1 encodings") {
    import scala.collection.mutable.ArrayBuffer
    def b(v: Int) = v.toByte
    def le16(v: Int) = Seq(b(v & 0xff), b((v >> 8) & 0xff))
    def le32(v: Long) = (0 until 4).map(i => b(((v >> (8 * i)) & 0xff).toInt))
    def le64(v: Long) = (0 until 8).map(i => b(((v >> (8 * i)) & 0xff).toInt))
    val data = le64(0x1000) ++ le32(3) ++ le64(0x2000) ++ le32(7)
    val refDt = Seq(b(0x17), b(0), b(0), b(0)) ++ le32(8) // class 7, size 8
    val u32Dt = Seq(b(0x10), b(0), b(0), b(0)) ++ le32(4) ++ // class 0, size 4
      le16(0) ++ le16(32) // fixed-point properties: bit offset, precision

    // ---- v3 attribute message with a v3 compound datatype
    val dtV3 = ArrayBuffer[Byte]()
    dtV3 ++= Seq(b(0x36), b(2), b(0), b(0)) ++= le32(12) // v3 compound, 2 members
    dtV3 ++= "dataset".getBytes :+ b(0); dtV3 += b(0) // name, 1-byte offset 0
    dtV3 ++= refDt
    dtV3 ++= "index".getBytes :+ b(0); dtV3 += b(8) // name, 1-byte offset 8
    dtV3 ++= u32Dt
    val dsV2 = Seq(b(2), b(1), b(0), b(1)) ++ le64(2) // v2 dataspace, rank 1, [2]
    val name = "REFERENCE_LIST".getBytes :+ b(0)
    val msgV3 = ArrayBuffer[Byte]()
    msgV3 ++= Seq(b(3), b(0)) ++= le16(name.length) ++=
      le16(dtV3.length) ++= le16(dsV2.length) += b(0)
    msgV3 ++= name ++= dtV3 ++= dsV2 ++= data
    val a3 = H5Lite.decodeAttrMessage(msgV3.toArray)
    assert(a3.name === "REFERENCE_LIST")
    assert(a3.nums === Seq(4096.0, 3.0, 8192.0, 7.0))
    assert(a3.groups === Seq(2, 2))

    // ---- v1 attribute message with a v1 compound datatype (padded
    // member names + the legacy dimensionality/permutation fields)
    val legacy = Seq(b(0), b(0), b(0), b(0)) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) // rank+reserved, perm, res, dims
    val dtV1 = ArrayBuffer[Byte]()
    dtV1 ++= Seq(b(0x16), b(2), b(0), b(0)) ++= le32(12)
    dtV1 ++= "dataset".getBytes :+ b(0) // 8 bytes, already aligned
    dtV1 ++= le32(0) ++= legacy ++= refDt
    dtV1 ++= "index".getBytes :+ b(0) :+ b(0) :+ b(0) // padded to 8
    dtV1 ++= le32(8) ++= legacy ++= u32Dt
    val dsV1 = Seq(b(1), b(1), b(0), b(0)) ++ le32(0) ++ le64(2)
    def pad8(a: ArrayBuffer[Byte]): Unit = while (a.length % 8 != 0) a += b(0)
    val msgV1 = ArrayBuffer[Byte]()
    msgV1 ++= Seq(b(1), b(0)) ++= le16(name.length) ++=
      le16(dtV1.length) ++= le16(dsV1.length)
    msgV1 ++= name; pad8(msgV1)
    val dtLen = dtV1.length
    msgV1 ++= dtV1; pad8(msgV1)
    msgV1 ++= dsV1; pad8(msgV1)
    msgV1 ++= data
    assert(dtLen === 8 + (8 + 4 + 28 + 8) + (8 + 4 + 28 + 12))
    val a1 = H5Lite.decodeAttrMessage(msgV1.toArray)
    assert(a1.nums === Seq(4096.0, 3.0, 8192.0, 7.0))
    assert(a1.groups === Seq(2, 2))
  }

  test("2-D swath granules decode through the HDF5 path") {
    // parallel (scan, pixel) lat/lon/value arrays + per-scan time
    val (nScan, nPix) = (3, 4)
    val n = nScan * nPix
    val f0 = NcFile(
      Seq(NcDim("scan", nScan), NcDim("pixel", nPix)), Nil,
      Seq(NcVar("lat", Seq("scan", "pixel"), NC_DOUBLE, Nil,
        Array.tabulate(n)(i => i * 0.1)),
        NcVar("lon", Seq("scan", "pixel"), NC_DOUBLE, Nil,
          Array.tabulate(n)(i => 100.0 + i * 0.1)),
        NcVar("time", Seq("scan"), NC_DOUBLE, Nil,
          Array(1000.0, 2000.0, 3000.0)),
        NcVar("sst", Seq("scan", "pixel"), NC_FLOAT, Nil,
          Array.tabulate(n)(_ * 2.0))))
    val nc = graft.ingest.GranuleIngest.decode(H5Lite.write(f0))
    val pts = graft.ingest.GranuleIngest
      .swathPointsOf(nc, "s.nc", "sst").toSeq
    assert(pts.length === n)
    // per-scan-line time broadcast across the pixel dim
    assert(pts.map(_.time).distinct.sorted === Seq(1000L, 2000L, 3000L))
    assert(pts.count(_.time == 1000L) === nPix)
    assert(pts.map(_.value).sorted.last === (n - 1) * 2.0)
  }

  test("rejects truncated and non-HDF5 bytes") {
    assertThrows[IllegalArgumentException] {
      H5Lite.read(Array[Byte](1, 2, 3))
    }
    assert(!H5Lite.isHdf5("CDF\u0001junk".getBytes("ASCII")))
    val good = H5Lite.write(grid2x3())
    assertThrows[Exception] { H5Lite.read(good.take(64)) }
  }

  test("GranuleIngest dispatches HDF5 vs classic on magic, same points") {
    val f0 = grid2x3()
    val h5 = GranuleTestIo.points(H5Lite.write(f0))
    val classic = GranuleTestIo.points(NetcdfClassic.write(f0))
    assert(h5.nonEmpty && h5 === classic)
  }

  test("HDF5 granules ingest end-to-end through binaryFile into tiles") {
    import graft.ingest.GranuleIngest
    val dir = java.nio.file.Files.createTempDirectory("h5granules")
    val (nlat, nlon) = (4, 4)
    (0 until 2).foreach { d =>
      val data = Array.tabulate(nlat * nlon)(i => (i + d).toDouble)
      val f = NcFile(
        Seq(NcDim("time", 1), NcDim("lat", nlat), NcDim("lon", nlon)), Nil,
        Seq(NcVar("time", Seq("time"), NC_DOUBLE, Nil, Array(d * 86400.0)),
          NcVar("lat", Seq("lat"), NC_DOUBLE, Nil,
            Array.tabulate(nlat)(_ + 0.5)),
          NcVar("lon", Seq("lon"), NC_DOUBLE, Nil,
            Array.tabulate(nlon)(_ + 0.5)),
          NcVar("sst", Seq("time", "lat", "lon"), NC_FLOAT, Nil, data)))
      java.nio.file.Files.write(dir.resolve(s"g$d.nc"),
        H5Lite.write(f, chunking = Map("sst" -> H5Lite.Chunking(Seq(1, 2, nlon)))))
    }
    val tiles = GranuleIngest.ingestGridGranules(spark, dir.toString + "/*.nc",
      "sst", "sst_h5", tileLat = 2.0, tileLon = 2.0)
    assert(tiles.count() > 0)
    import org.apache.spark.sql.functions._
    val total = tiles.agg(sum("stats_count")).head.getLong(0)
    assert(total === 2L * nlat * nlon)
    val means = tiles.agg(min("stats_min"), max("stats_max")).head
    assert(means.getDouble(0) === 0.0 && means.getDouble(1) === 16.0)
  }

  test("dense-group NetCDF-4 granule (20+ variables) ingests end-to-end") {
    // a realistic multi-variable granule: 21 variables forces libhdf5's
    // dense link storage; the reader must resolve sst among them
    import graft.ingest.GranuleIngest
    val dir = java.nio.file.Files.createTempDirectory("h5dense")
    val (nlat, nlon) = (4, 4)
    val data = Array.tabulate(nlat * nlon)(_.toDouble)
    val extras = (0 until 18).map(i =>
      NcVar(f"aux_$i%02d", Seq("lat", "lon"), NC_FLOAT, Nil,
        Array.tabulate(nlat * nlon)(j => i * 1000.0 + j)))
    val f = NcFile(
      Seq(NcDim("time", 1), NcDim("lat", nlat), NcDim("lon", nlon)), Nil,
      Seq(NcVar("time", Seq("time"), NC_DOUBLE, Nil, Array(0.0)),
        NcVar("lat", Seq("lat"), NC_DOUBLE, Nil, Array.tabulate(nlat)(_ + 0.5)),
        NcVar("lon", Seq("lon"), NC_DOUBLE, Nil, Array.tabulate(nlon)(_ + 0.5)),
        NcVar("sst", Seq("time", "lat", "lon"), NC_FLOAT, Nil, data)) ++ extras)
    java.nio.file.Files.write(dir.resolve("g0.nc"),
      H5Lite.write(f, chunking = Map("sst" -> H5Lite.Chunking(Seq(1, 2, nlon))),
        denseRoot = true))
    val tiles = GranuleIngest.ingestGridGranules(spark, dir.toString + "/*.nc",
      "sst", "sst_dense", tileLat = 2.0, tileLon = 2.0)
    import org.apache.spark.sql.functions._
    assert(tiles.agg(sum("stats_count")).head.getLong(0) === nlat.toLong * nlon)
    assert(tiles.agg(max("stats_max")).head.getDouble(0) === 15.0)
  }

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/h5/$name")
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("OHDR v2 object headers round-trip (the form real libhdf5 files use)") {
    // the round-4 reader bug lived exactly here: v2 message anchoring
    // after the chunk-size field; v1-only fixtures never saw it
    for (dense <- Seq(false, true)) {
      val bytes = H5Lite.write(grid2x3(), ohdrV2 = true, denseRoot = dense)
      assert(new String(bytes.map(b =>
        if (b >= 32 && b < 127) b.toChar else '.')).contains("OHDR"))
      val f = H5Lite.read(bytes)
      assert(f.vars.map(_.name).sorted === Seq("lat", "lon", "sst"))
      assert(f.variable("sst").get.data.toSeq ===
        Seq(1.0, 2.0, -9999.0, 4.0, 5.0, 6.0))
      assert(f.attrs.find(_.name == "title").get.text === "h5lite test")
      assert(f.variable("sst").get.attr("scale_factor").get.first === Some(0.5))
    }
  }

  test("soft links resolve (absolute, relative, nested, '.'); '..' and " +
    "dangling drop like h5py") {
    // tools/make_h5_fixture.py build_soft_links: one dataset `base`
    // plus soft aliases through every path spelling. The subgroup's
    // '../base' and '../g/up' links must DROP: HDF5 defines no '..'
    // (multiple parents make "up" ambiguous), so libhdf5/h5py resolve
    // it as an ordinary — absent — link name, and so does this walker
    val f = H5Lite.read(fixture("hand_soft_links.h5"))
    assert(f.vars.map(_.name).sorted ===
      Seq("alias", "base", "chain", "dot", "rel"))
    f.vars.foreach(v => assert(v.data.toSeq === Seq(1.25, -2.5, 3.75), v.name))
  }

  test("huge DIRECT heap objects: 17-byte IDs embed address+length") {
    // build_huge_direct: the 200-char link name exceeds the managed
    // maximum; its link message lives at its own address with no huge
    // B-tree — the ID itself carries (addr, len)
    val f = H5Lite.read(fixture("hand_huge_direct.h5"))
    assert(f.vars.map(_.name).toSet === Set("a", "x" * 200))
    assert(f.variable("a").get.data.toSeq === Seq(7.0, 8.0, 9.0))
    assert(f.variable("x" * 200).get.data.toSeq === Seq(40.0, 41.0, 42.0))
  }

  test("tiny heap objects: extended form, payload inline in the ID") {
    // build_tiny_link: 24-byte heap IDs → extended tiny encoding; the
    // 12-byte link message for `t` never touches a heap block
    val f = H5Lite.read(fixture("hand_tiny_link.h5"))
    assert(f.vars.map(_.name).toSet === Set("m", "t"))
    assert(f.variable("m").get.data.toSeq === Seq(5.5, 6.5, 7.5))
    assert(f.variable("t").get.data.toSeq === Seq(-1.0, -2.0, -3.0))
  }

  test("huge INDIRECT FILTERED heap objects: deflated attr via huge B-tree") {
    // build_huge_filtered: deflate-filtered dense-attr heap; the 300-
    // element attribute exceeds the managed maximum and resolves
    // through a type-2 huge B-tree record (addr, stored, mask, mem, id)
    val f = H5Lite.read(fixture("hand_huge_filtered.h5"))
    assert(f.attrs.find(_.name == "units").get.text === "K")
    assert(f.attrs.find(_.name == "count").get.first === Some(3.0))
    val big = f.attrs.find(_.name == "bigtable").get
    assert(big.nums.length === 300)
    assert(big.nums.take(4) === Seq(0.0, 0.5, 1.0, 1.5))
    assert(big.nums.last === 149.5)
  }
}

/** Shared helper: decode granule bytes → sorted point tuples. */
object GranuleTestIo {
  def points(bytes: Array[Byte]): Seq[(Long, Double, Double, String)] = {
    val nc = graft.ingest.GranuleIngest.decode(bytes)
    graft.ingest.GranuleIngest.gridPointsOf(nc, "t.nc", "sst")
      // values as strings so NaN compares equal to NaN
      .map(p => (p.time, p.latitude, p.longitude, p.value.toString))
      .toSeq.sortBy(p => (p._1, p._2, p._3))
  }
}
