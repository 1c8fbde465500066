package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Corruption robustness over the exotic-structure fixtures and a real
  * granule: any single-bit flip must either decode (flip landed in
  * padding/data) or throw a plain Exception promptly — never a hang,
  * an OutOfMemoryError from a corrupt length field, or a
  * StackOverflowError from a cyclic structure. The write-side
  * round-trip property (H5LiteProps) cannot reach these structures
  * (the writer never emits soft links or huge/tiny heap objects), so
  * this is their randomized net.
  */
class H5CorruptionSpec extends AnyFunSuite {

  private def fixture(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    assert(in != null, s"missing $path")
    try in.readAllBytes() finally in.close()
  }

  test("single-bit flips fail cleanly across exotic heap fixtures") {
    val files = Seq("/h5/hand_soft_links.h5", "/h5/hand_huge_direct.h5",
      "/h5/hand_tiny_link.h5", "/h5/hand_huge_filtered.h5",
      "/h5/hand_compound.h5", "/h5/hand_compound_chunked.h5",
      "/h5/hand_fletcher.h5", "/h5/hand_szip.h5",
      "/h5/hand_v4_single.h5", "/h5/hand_v4_implicit.h5",
      "/h5/hand_v4_fixedarray.h5", "/h5/hand_v4_fa_paged.h5",
      "/h5/hand_v4_btree.h5", "/h5/hand_v4_fa_sparse.h5",
      "/h5/hand_v4_fa_q0.h5", "/h5/hand_v4_fa_q1.h5",
      "/h5/hand_v4_fa_q2.h5", "/h5/hand_v4_fa_q3.h5",
      "/h5/hand_v4_fa_q4.h5", "/h5/hand_v4_fa_q5.h5")
    val rnd = new scala.util.Random(20260814L)
    for (nm <- files; _ <- 1 to 300) {
      val b = fixture(nm)
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      // Exception = clean refusal; Error (OOM/SO) or a hang = bug
      try H5Lite.read(b)
      catch { case _: Exception => () }
    }
  }

  test("compound member count bounds the TOTAL output allocation") {
    // tools/make_h5_fixture.py build_compound_bomb: 300 members x
    // 2^20 elements = 2.5 GiB of doubles. Element count and member
    // count are each file-controlled and individually in-range; only
    // their product is absurd — the refusal must come from the total
    // bound, BEFORE any array is allocated (the layout address is
    // UNDEF, so reaching storage would mean allocating it all first)
    val e = intercept[Exception](H5Lite.read(fixture("/h5/hand_compound_bomb.h5")))
    assert(e.getMessage.contains("exceeds the in-memory codec's envelope"),
      e.getMessage)
  }

  test("contiguous n x elem_size bounds in Long — a wrapped 32-bit product cannot escape") {
    // tools/make_h5_fixture.py build_compound_stride: 2^20 elements of
    // a 4100-byte compound element = 4.3 GB, which wraps a 32-bit
    // product to ~4 MB; the extent must be bounded in Long before the
    // take() narrow, refusing loudly instead of failing mid-decode
    val e = intercept[Exception](H5Lite.read(fixture("/h5/hand_compound_stride.h5")))
    assert(e.getMessage.contains("exceeds the"), e.getMessage)
  }

  test("v4 single-chunk stored size with high bits set fails loudly") {
    // the stored chunk byte size is a 64-bit field: 2^32 + true_size
    // narrows to true_size in a bare `.toInt` and decodes silently —
    // the size must be bounded against the file extent BEFORE the
    // narrow. Patch hand_v4_single.h5's filtered-size field (u64 LE
    // at +18 past the v4 layout message prefix 04 02 02 03 04).
    val b = fixture("/h5/hand_v4_single.h5")
    val pat = Array[Byte](4, 2, 2, 3, 4)
    val at = b.indices.indexWhere(i => i + 5 <= b.length &&
      pat.indices.forall(j => b(i + j) == pat(j)))
    assert(at > 0, "v4 layout message not found")
    b(at + 18 + 4) = 1 // size += 2^32 (5th LE byte of the u64)
    val e = intercept[Exception](H5Lite.read(b))
    assert(e.getMessage.contains("stored size"), e.getMessage)
  }

  test("single-bit flips fail cleanly across the external-link pair") {
    // flip bits in BOTH the linking file and the link target — the
    // cross-file graft must degrade or fail cleanly, never hang
    val rnd = new scala.util.Random(66L)
    for (which <- Seq(0, 1); _ <- 1 to 150) {
      val main = fixture("/h5/hand_external.h5")
      val aux = fixture("/h5/hand_contiguous.h5")
      val target = if (which == 0) main else aux
      val pos = rnd.nextInt(target.length)
      target(pos) = (target(pos) ^ (1 << rnd.nextInt(8))).toByte
      try H5Lite.read(main,
        resolve = nm => if (nm == "hand_contiguous.h5") Some(aux) else None)
      catch { case _: Exception => () }
    }
  }

  test("single-bit flips fail cleanly on a real libhdf5 granule") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 150) {
      val b = fixture("/granules/not_empty_avhrr.nc4")
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      try H5Lite.read(b)
      catch { case _: Exception => () }
    }
  }
}
