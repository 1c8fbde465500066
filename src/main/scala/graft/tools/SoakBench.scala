package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.HttpServer
import graft.ingest.Ingest

/** Serving-layer soak (VERDICT r5 #4): drive N concurrent
  * `/timeSeriesSpark` + `/match_spark` requests through a real
  * [[HttpServer]] socket on local[32] and measure, per concurrency
  * level, the 2xx/503 split and latency percentiles — the load-test
  * the unit-tested FAIR-pool/503 ceiling (reference: 10 jobs,
  * `NexusHandler.py:250-294`) never had. A gateless `/delay` probe
  * runs DURING each level to prove interactive endpoints stay
  * responsive while the query gate saturates.
  *
  * Run: `sbt "runMain graft.tools.SoakBench [reqsPerLevel]"`; one JSON
  * line per level on stdout; numbers go to SCALING.md.
  */
object SoakBench {

  private def fixtureTiles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val day = 86400L
    // 3 days × a 16×16 grid of 2° tiles — small enough that latency is
    // dominated by plan+schedule overhead, exactly what the gate guards
    val pts = for {
      d <- 0 until 3
      li <- 0 until 16; lo <- 0 until 16
    } yield (s"g$d.nc", li + 0.5, lo + 0.5, d * day,
      (li * 16 + lo).toDouble + d)
    Ingest.pointsToTiles(
      pts.toDF("granule", "latitude", "longitude", "time", "value"),
      2.0, 2.0, "sst")
  }

  def main(args: Array[String]): Unit = {
    val perLevel = args.headOption.map(_.toInt).getOrElse(48)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val insitu = (0 until 200).map { i =>
      (i.toLong, (i % 16) + 0.51, (i / 16 % 16) + 0.52, (i % 3) * 86400L + 900L)
    }.toDF("id", "latitude", "longitude", "time")
    // DOMS paths (incl. /match_spark) mount only with a results store
    val resultsDir = java.nio.file.Files
      .createTempDirectory("graft_soak_results").toString + "/store"
    val server = HttpServer(spark, fixtureTiles(spark), Some(insitu),
      Some(resultsDir))
    val base = s"http://127.0.0.1:${server.boundPort}"
    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()

    def hit(pathAndQuery: String): (Int, Long) = {
      val t0 = System.nanoTime()
      val r: HttpResponse[String] = client.send(
        HttpRequest.newBuilder(URI.create(base + pathAndQuery))
          .timeout(java.time.Duration.ofSeconds(120)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), (System.nanoTime() - t0) / 1000000)
    }

    val reqs = Array(
      "/timeSeriesSpark?ds=sst",
      "/match_spark?ds=sst&b=0,0,16,16&rt=5000&tt=3600")
    // warm both plans before measuring
    reqs.foreach(hit); reqs.foreach(hit)

    def pct(xs: Seq[Long], p: Double): Long =
      if (xs.isEmpty) -1
      else xs.sorted.apply(math.min(xs.length - 1,
        math.ceil(p * xs.length).toInt - 1).max(0))

    for (conc <- Seq(4, 8, 10, 12, 16, 24, 32, 48)) {
      val pool = Executors.newFixedThreadPool(conc)
      val results = new ArrayBuffer[(Int, Long)]
      val start = new CountDownLatch(1)
      val done = new CountDownLatch(perLevel)
      (0 until perLevel).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            val r = try hit(reqs(i % reqs.length))
            catch { case _: Exception => (-1, -1L) }
            results.synchronized { results += r }
            done.countDown()
          }
        })
      }
      val t0 = System.nanoTime()
      start.countDown()
      // the interactivity probe: a gateless /delay answered while the
      // query gate is (possibly) saturated
      Thread.sleep(50)
      val (probeCode, probeMs) =
        try hit("/delay?t=0.05") catch { case _: Exception => (-1, -1L) }
      val completed = done.await(300, TimeUnit.SECONDS)
      val wallMs = (System.nanoTime() - t0) / 1000000
      pool.shutdownNow()
      // snapshot under the same lock the workers append with — after a
      // timeout, interrupted stragglers may still be appending
      val snap = results.synchronized { results.toVector }
      val (ok, rejected) = snap.partition(_._1 == 200)
      val codes = snap.groupBy(_._1).map { case (c, rs) =>
        s""""$c":${rs.length}""" }.mkString("{", ",", "}")
      val lats = ok.map(_._2)
      println(s"""{"soak":{"concurrency":$conc,"requests":$perLevel,""" +
        s""""completed":$completed,""" +
        s""""ok":${ok.length},"rejected503":${rejected.count(_._1 == 503)},""" +
        s""""codes":$codes,"p50_ms":${pct(lats, 0.50)},""" +
        s""""p95_ms":${pct(lats, 0.95)},"max_ms":${pct(lats, 1.0)},""" +
        s""""wall_ms":$wallMs,"delay_probe_code":$probeCode,""" +
        s""""delay_probe_ms":$probeMs}}""")
    }
    server.stop()
    spark.stop()
  }
}
