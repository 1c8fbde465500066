package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: measures the ACTUAL sketch error on the deterministic
  * `AggQueries.sketchCorpus`, so `a17c_sketch_tight`'s band is a
  * measured figure plus margin instead of a round-trip loosening.
  * The corpus is fixed by construction (inline-generated, HLL++
  * register merges order-independent), so these numbers are stable
  * across runs, SFs, and partitionings.
  *
  * Measured r13 (this probe, local[8]; rel = default rsd 0.05,
  * rel02/rel01 = rsd 0.02/0.01):
  *   grp=0 exact=15001 rel=0.0507 rel02=0.0060 rel01=0.0069
  *   grp=1 exact=25001 rel=0.0342 rel02=0.0194 rel01=0.0038
  *   grp=2 exact=35001 rel=0.0054 rel02=0.0051 rel01=0.0017
  *   grp=3 exact=45001 rel=0.0132 rel02=0.0132 rel01=0.0007
  *   p50a within [p49.5, p50.5] every group (accuracy=10000 ⇒ rank
  *   error ≤ 5 of 50000; the band is ±250 positions)
  * The gate uses rsd 0.02; band pinned in AggQueries.SketchTightBand
  * from the worst rel02 row (0.0194) + margin.
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = graft.queries.AggQueries.sketchCorpus(spark)
    val d = c.groupBy(col("grp")).agg(
      countDistinct(col("u")).as("exact"),
      approx_count_distinct(col("u")).as("hll"),
      approx_count_distinct(col("u"), 0.02).as("hll02"),
      approx_count_distinct(col("u"), 0.01).as("hll01"))
    val p = c.groupBy(col("grp")).agg(
      percentile_approx(col("v"), lit(0.5), lit(10000)).as("p50a"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.495)").as("p495"),
      expr("percentile(v, 0.505)").as("p505"))
    d.join(p, "grp").orderBy("grp").collect().foreach { r =>
      val exact = r.getAs[Long]("exact")
      val hll = r.getAs[Long]("hll")
      def re(v: Long) = math.abs(v - exact).toDouble / exact
      println(f"[sketch] grp=${r.getAs[Long]("grp")} exact=$exact hll=$hll " +
        f"rel_err=${re(hll)}%.4f " +
        f"rel02=${re(r.getAs[Long]("hll02"))}%.4f " +
        f"rel01=${re(r.getAs[Long]("hll01"))}%.4f " +
        f"p50a=${r.getAs[Double]("p50a")}%.1f p50=${r.getAs[Double]("p50")}%.1f " +
        f"band=[${r.getAs[Double]("p495")}%.1f, ${r.getAs[Double]("p505")}%.1f]")
    }
    spark.stop()
  }
}
