package graft.sources

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import NetcdfClassic.{NcDim, NcFile, NcVar}
import NetcdfClassic.{NC_DOUBLE, NC_FLOAT, NC_INT, NC_SHORT}

/** Randomized round-trip over the H5 codec: arbitrary ranks, shapes,
  * datatypes, chunk geometries (dividing and non-dividing), and filter
  * combinations must all read back exactly — the broad net over the
  * layout arithmetic (strides, edge-chunk clipping, B-tree fan-out)
  * that example-based specs can miss.
  */
object H5LiteProps extends Properties("graft.h5.roundtrip") {

  private val genCase = for {
    rank <- Gen.choose(1, 3)
    dims <- Gen.listOfN(rank, Gen.choose(1, 7))
    ncType <- Gen.oneOf(NC_FLOAT, NC_DOUBLE, NC_INT, NC_SHORT)
    chunked <- Gen.oneOf(true, false)
    chunkDims <- Gen.listOfN(rank, Gen.choose(1, 9))
    shuffle <- Gen.oneOf(true, false)
    deflate <- Gen.oneOf(0, 1, 6)
    szip <- Gen.oneOf(true, false) // swaps deflate+shuffle when eligible
    ppb <- Gen.oneOf(2, 8, 16, 32)
    fletcher <- Gen.oneOf(true, false) // checksum after any compression
    dense <- Gen.oneOf(true, false) // root link storage: dense vs symbol table
    denseFilter <- Gen.oneOf(true, false) // deflated indirect-root link heap
    ohdrV2 <- Gen.oneOf(true, false) // v1 vs OHDR-v2 object headers
    nVars <- Gen.choose(1, 24)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (dims, ncType, chunked, chunkDims, shuffle, deflate, szip, ppb,
    fletcher, dense, denseFilter, ohdrV2, nVars, seed)

  /** The value as the on-disk type round-trips it (f32 truncation,
    * integer truncation) — what write-then-read must reproduce.
    */
  private def canon(v: Double, t: Int): Double = t match {
    case NC_FLOAT => v.toFloat.toDouble
    case NC_INT => v.toInt.toDouble
    case NC_SHORT => v.toShort.toDouble
    case _ => v
  }

  property("randomShapeTypeChunkingRoundTrip") = Prop.forAll(genCase) {
    case (dims, ncType, chunked, chunkDims, shuffle, deflate, szip, ppb,
        fletcher, dense, denseFilter, ohdrV2, nVars, seed) =>
      val n = dims.product
      val rnd = new scala.util.Random(seed)
      val datas = (0 until nVars).map(_ =>
        Array.fill(n)(canon((rnd.nextDouble() - 0.5) * 2e4, ncType)))
      val f0 = NcFile(
        dims.zipWithIndex.map { case (d, i) => NcDim(s"d$i", d) },
        Nil,
        datas.zipWithIndex.map { case (data, vi) =>
          NcVar(s"v$vi", dims.indices.map(i => s"d$i"), ncType, Nil, data)
        })
      // szip excludes deflate/shuffle (like HDF5) and 64-bit samples
      val useSzip = szip && ncType != NC_DOUBLE
      val chunking =
        if (!chunked) Map.empty[String, H5Lite.Chunking]
        else if (useSzip) Map("v0" -> H5Lite.Chunking(chunkDims, 0,
          shuffle = false, szip = true, szipPixelsPerBlock = ppb,
          fletcher32 = fletcher))
        else Map("v0" -> H5Lite.Chunking(chunkDims, deflate, shuffle,
          fletcher32 = fletcher))
      val back = H5Lite.read(H5Lite.write(f0, chunking, denseRoot = dense,
        denseHeapFilter = dense && denseFilter, ohdrV2 = ohdrV2))
      Prop.all(datas.zipWithIndex.map { case (data, vi) =>
        val v = back.variable(s"v$vi").get
        (back.shape(v) == dims) :| s"shape v$vi" &&
          (v.data.toSeq == data.toSeq) :| s"values v$vi"
      }: _*)
  }
}
