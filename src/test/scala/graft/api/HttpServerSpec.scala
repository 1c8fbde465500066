package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Ingest

/** Request→JSON round-trips through the HTTP layer — the serving
  * contract the reference exposes via webapp.py. Every response here is
  * produced by a real socket GET against an ephemeral-port server.
  */
class HttpServerSpec extends SparkSpec {

  private lazy val tiles: DataFrame = {
    import spark.implicits._
    val day = 86400L
    val pts = for {
      d <- 0 until 3
      li <- 0 until 4; lo <- 0 until 4
    } yield (s"g$d.nc", li + 0.5, lo + 0.5, d * day, (li * 4 + lo).toDouble + d)
    val sst = Ingest.pointsToTiles(
      pts.toDF("granule", "latitude", "longitude", "time", "value"),
      2.0, 2.0, "sst")
    // second dataset (one day) for multi-dataset requests
    val clim = Ingest.pointsToTiles(
      (for { li <- 0 until 4; lo <- 0 until 4 }
        yield ("c.nc", li + 0.5, lo + 0.5, 0L, 3.0))
        .toDF("granule", "latitude", "longitude", "time", "value"),
      2.0, 2.0, "sst_CLIM")
    sst.unionByName(clim)
  }

  private lazy val insitu: DataFrame = {
    import spark.implicits._
    // in-situ observations near grid points, within tolerance
    Seq((100L, 0.51, 0.52, 1000L), (101L, 2.5, 2.5, 86400L + 500L))
      .toDF("id", "latitude", "longitude", "time")
  }

  private lazy val resultsDir =
    java.nio.file.Files.createTempDirectory("graft_http_results").toString + "/store"

  private lazy val server: HttpServer =
    HttpServer(spark, tiles, Some(insitu), Some(resultsDir))

  private val client = HttpClient.newHttpClient()

  private def get(pathAndQuery: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def getBytes(pathAndQuery: String): HttpResponse[Array[Byte]] =
    client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())

  override def afterAll(): Unit = {
    server.stop()
    super.afterAll()
  }

  test("/timeSeriesSpark over HTTP returns the gate-identical JSON") {
    val r = get("/timeSeriesSpark?ds=sst")
    assert(r.statusCode() === 200)
    assert(r.headers().firstValue("Content-Type").get.startsWith("application/json"))
    val direct = Handlers.registry("/timeSeriesSpark")(
      Handlers.QueryParams("sst"), tiles)
    val expected = "[" + direct.toJSON.collect().mkString(",") + "]"
    assert(r.body() === expected)
    assert(r.body().contains("\"cnt\":16"))
  }

  test("bbox + time params prune over HTTP (b= is minLon,minLat,maxLon,maxLat)") {
    val r = get("/timeSeriesSpark?ds=sst&b=0,0,1.9,1.9&startTime=0&endTime=0")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"cnt\":4"))
    assert(!r.body().contains("\"cnt\":16"))
  }

  test("diagnostics: /heartbeat, /version, /capabilities (incl. DOMS paths)") {
    assert(get("/heartbeat").body() === """[{"ok":true}]""")
    assert(get("/version").body().contains("nexusspark"))
    val caps = get("/capabilities").body()
    assert(caps.contains("/domsmatchup") && caps.contains("/timeSeriesSpark"))
  }

  test("unknown path → 404, missing ds → 400, bad method → 405") {
    assert(get("/nope").statusCode() === 404)
    val bad = get("/timeSeriesSpark")
    assert(bad.statusCode() === 400)
    assert(bad.body().contains("ds"))
    val post = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}/heartbeat"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(post.statusCode() === 405)
  }

  test("result-size gate returns 413 with limit=") {
    val r = get("/datainbounds?ds=sst&limit=5")
    assert(r.statusCode() === 413)
    assert(r.body().contains("narrow the query"))
  }

  test("limit=0 streams the unlimited result chunked (resultSizeLimit=0)") {
    // the query that 413s at limit=5 serves fully at limit=0 — and
    // CHUNKED (no Content-Length), i.e. the toLocalIterator path, not
    // a whole-result driver buffer
    val r = get("/datainbounds?ds=sst&limit=0")
    assert(r.statusCode() === 200)
    assert(r.headers().firstValue("Content-Length").isEmpty,
      "unlimited JSON must stream chunked, not buffer to a sized body")
    val direct = Handlers.registry("/datainbounds")(
      Handlers.QueryParams("sst"), tiles)
    val expected = "[" + direct.toJSON.collect().mkString(",") + "]"
    assert(r.body() === expected)
    // CSV twin: same rows, shared row dialect, streamed
    val c = get("/datainbounds?ds=sst&limit=0&output=CSV")
    assert(c.statusCode() === 200)
    assert(c.headers().firstValue("Content-Length").isEmpty)
    assert(c.body().linesIterator.size === direct.count() + 1)
  }

  test("streaming failures: first-job errors 400, mid-stream truncates detectably") {
    import org.apache.spark.sql.functions.udf
    val midBoom = udf((i: Long) =>
      if (i > 50) throw new RuntimeException("mid-stream boom") else i)
    val allBoom = udf((i: Long) =>
      if (i >= 0) throw new RuntimeException("first-partition boom") else i)
    val mk: org.apache.spark.sql.Column => DataFrame = f =>
      spark.range(0, 100, 1, 10).select(f.as("v"))
    val srv = new HttpServer(spark, tiles, Map(
      "/boomMid" -> ((_: Handlers.QueryParams, _: DataFrame) =>
        mk(midBoom(col("id")))),
      "/boomFirst" -> ((_: Handlers.QueryParams, _: DataFrame) =>
        mk(allBoom(col("id")))))).start()
    def g(pq: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${srv.boundPort}$pq")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    try {
      // priming runs the first partition before the status commits:
      // an immediate failure is a clean 400, not a 200 + garbage
      assert(g("/boomFirst?ds=x&limit=0").statusCode() === 400)
      assert(g("/boomFirst?ds=x&limit=0&output=CSV").statusCode() === 400)
      // a LATER partition failing can only truncate — CSV carries the
      // explicit marker line, JSON is left detectably unterminated
      val csv = g("/boomMid?ds=x&limit=0&output=CSV")
      assert(csv.statusCode() === 200)
      assert(csv.body().endsWith("__TRUNCATED__\n"))
      val json = g("/boomMid?ds=x&limit=0")
      assert(json.statusCode() === 200)
      assert(json.body().startsWith("[") && !json.body().endsWith("]"))
      // negative limits are NOT the unlimited path: loud, not a
      // silent full download
      assert(g("/boomMid?ds=x&limit=-1").statusCode() !== 200)
    } finally srv.stop()
  }

  test("a stalled streaming reader is disconnected at the idle-progress " +
    "deadline and its JobGate slot freed") {
    val srv = new HttpServer(spark, tiles, Map(
      "/big" -> ((_: Handlers.QueryParams, _: DataFrame) =>
        spark.range(0, 400000, 1, 8).toDF("id"))),
      maxConcurrentJobs = 1, streamWriteTimeoutMs = 400).start()
    def g(pq: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${srv.boundPort}$pq")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    val sock = new java.net.Socket()
    try {
      // small client window so the server's writes backpressure fast
      sock.setReceiveBufferSize(8192)
      sock.connect(new java.net.InetSocketAddress("127.0.0.1", srv.boundPort))
      sock.getOutputStream.write(
        "GET /big?ds=x&limit=0 HTTP/1.1\r\nHost: t\r\n\r\n"
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      sock.getOutputStream.flush()
      val in = sock.getInputStream
      assert(in.read(new Array[Byte](1024)) > 0) // response started…
      // …then STALL: stop draining entirely. The ~4 MB body overflows
      // every buffer, the server's write blocks, progress stops.
      // While the reader stalls inside the deadline, the single gate
      // slot is held: a second gated request sheds with 503
      assert(g("/big?ds=x&limit=5").statusCode() === 503)
      // within ~2× the deadline the watchdog disconnects the stalled
      // exchange and the slot frees: the same request now EXECUTES
      // (413 = ran the size gate, i.e. got a slot — not 503)
      val deadline = System.nanoTime() + 15L * 1000000000L
      var status = 503
      while (status == 503 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        status = g("/big?ds=x&limit=5").statusCode()
      }
      assert(status === 413,
        s"slot not freed after stalled-reader deadline (last status $status)")
    } finally {
      try sock.close() catch { case _: java.io.IOException => () }
      srv.stop()
    }
  }

  test("watchdog under partition stragglers: an iterator pull 3x the " +
    "deadline is NOT disconnected while a stalled reader alongside IS") {
    import spark.implicits._
    // each of the 4 partitions takes ~1.2 s of ENGINE time (task sleep)
    // before yielding rows — 3x the 400 ms idle-progress deadline; the
    // compute-suspend logic must keep the watchdog quiet through it
    val slowDf = spark.range(0, 40000L, 1, 4).as[Long]
      .mapPartitions { it => Thread.sleep(1200); it }.toDF("id")
    val srv = new HttpServer(spark, tiles, Map(
      "/slowpart" -> ((_: Handlers.QueryParams, _: DataFrame) => slowDf),
      "/big" -> ((_: Handlers.QueryParams, _: DataFrame) =>
        spark.range(0, 400000, 1, 8).toDF("id"))),
      maxConcurrentJobs = 2, streamWriteTimeoutMs = 400).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    def g(pq: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$pq")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    val sock = new java.net.Socket()
    try {
      // slot 1: a genuinely stalled reader on /big
      sock.setReceiveBufferSize(8192)
      sock.connect(new java.net.InetSocketAddress("127.0.0.1", srv.boundPort))
      sock.getOutputStream.write(
        "GET /big?ds=x&limit=0 HTTP/1.1\r\nHost: t\r\n\r\n"
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      sock.getOutputStream.flush()
      assert(sock.getInputStream.read(new Array[Byte](1024)) > 0)
      // slot 2: a healthy client draining the slow-partition stream
      val slow = new java.util.concurrent.CompletableFuture[String]()
      new Thread(() => {
        try slow.complete(g("/slowpart?ds=x&limit=0").body())
        catch { case e: Throwable => slow.completeExceptionally(e) }
      }).start()
      Thread.sleep(300) // both slots taken
      assert(g("/big?ds=x&limit=5").statusCode() === 503)
      // the stalled reader must be disconnected (slot freed → 413 runs)
      // WHILE the straggling stream is still mid-transfer
      val deadline = System.nanoTime() + 15L * 1000000000L
      var status = 503
      while (status == 503 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        status = g("/big?ds=x&limit=5").statusCode()
      }
      assert(status === 413,
        s"stalled reader's slot not freed (last status $status)")
      // overlap is proven by the 503 above (both slots held at once);
      // asserting !slow.isDone here would race the stream's natural
      // ~5 s duration against the 15 s freeing allowance on slow hosts.
      // The straggler completes INTACT: its pulls suspended the
      // deadline, so it was never disconnected despite 1.2 s gaps
      val body = slow.get(60, java.util.concurrent.TimeUnit.SECONDS)
      assert(body.startsWith("[") && body.endsWith("]"),
        s"slow-partition stream truncated (len ${body.length})")
      assert(body.count(_ == ',') === 39999, "slow-partition stream lost rows")
    } finally {
      try sock.close() catch { case _: java.io.IOException => () }
      srv.stop()
    }
  }

  test("interrupt backstop: a stalled reader's slot frees even when the " +
    "reflective disconnect path is unavailable") {
    // the global hook briefly disables reflection for every stream;
    // within this suite tests run sequentially, and no other suite
    // streams concurrently — restored in finally either way
    HttpServer.reflectiveDisconnectEnabled = false
    val srv = new HttpServer(spark, tiles, Map(
      "/big" -> ((_: Handlers.QueryParams, _: DataFrame) =>
        spark.range(0, 400000, 1, 8).toDF("id"))),
      maxConcurrentJobs = 1, streamWriteTimeoutMs = 400).start()
    def g(pq: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${srv.boundPort}$pq")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    val sock = new java.net.Socket()
    try {
      sock.setReceiveBufferSize(8192)
      sock.connect(new java.net.InetSocketAddress("127.0.0.1", srv.boundPort))
      sock.getOutputStream.write(
        "GET /big?ds=x&limit=0 HTTP/1.1\r\nHost: t\r\n\r\n"
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      sock.getOutputStream.flush()
      assert(sock.getInputStream.read(new Array[Byte](1024)) > 0)
      assert(g("/big?ds=x&limit=5").statusCode() === 503)
      // the interrupt path (InterruptibleChannel close) must free the
      // slot — no JDK internals involved
      val deadline = System.nanoTime() + 15L * 1000000000L
      var status = 503
      while (status == 503 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        status = g("/big?ds=x&limit=5").statusCode()
      }
      assert(status === 413,
        s"slot not freed via interrupt backstop (last status $status)")
    } finally {
      HttpServer.reflectiveDisconnectEnabled = true
      try sock.close() catch { case _: java.io.IOException => () }
      srv.stop()
    }
  }

  test("soak: slow-but-progressing streams and fast queries interleave — " +
    "fast queries keep executing and every stream completes intact") {
    val nRows = 200000
    val srv = new HttpServer(spark, tiles,
      Handlers.registry + ("/big" -> ((_: Handlers.QueryParams, _: DataFrame) =>
        spark.range(0, nRows.toLong, 1, 8).toDF("id"))),
      maxConcurrentJobs = 4, streamWriteTimeoutMs = 10000).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    def g(pq: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$pq")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    val rt = Runtime.getRuntime
    def usedMb: Long = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    val before = { System.gc(); usedMb }
    // two TRICKLE readers: drain slowly (progressing — the deadline
    // must NOT fire) while counting the full body
    val streamResults = (1 to 2).map { _ =>
      val t = new java.util.concurrent.CompletableFuture[Long]()
      new Thread(() => {
        try {
          val conn = new java.net.URL(s"$base/big?ds=x&limit=0")
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          val in = conn.getInputStream
          val buf = new Array[Byte](8192)
          var total = 0L
          var n = in.read(buf)
          while (n >= 0) {
            total += n
            Thread.sleep(5) // trickle, ~1.6 MB/s
            n = in.read(buf)
          }
          t.complete(total)
        } catch { case e: Throwable => t.completeExceptionally(e) }
      }).start()
      t
    }
    // fast gated queries interleave while the streams are still open
    Thread.sleep(300) // let the streams start and take their slots
    val fast = (1 to 6).map(_ => g("/timeSeriesSpark?ds=sst"))
    assert(fast.forall(_.statusCode() == 200),
      s"fast queries failed during streaming: ${fast.map(_.statusCode())}")
    assert(streamResults.exists(!_.isDone),
      "streams finished before the fast queries — soak did not overlap")
    // every stream completes INTACT (no truncation: progress kept the
    // watchdog quiet) …
    val sizes = streamResults.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    // body = "[" + rows joined by "," + "]"; each row ≈ {"id":N}
    val minBytes = nRows.toLong * 8
    assert(sizes.forall(_ >= minBytes), s"truncated stream bodies: $sizes")
    // …with driver memory bounded: streaming 2 full results must not
    // have materialized them (generous bound — suites run in parallel)
    val after = { System.gc(); usedMb }
    assert(after - before < 1500, s"driver heap grew ${after - before} MB " +
      "during streaming — results may be materializing")
    srv.stop()
  }

  test("DOMS execute-store-retrieve loop over HTTP") {
    // matchup with a pinned execution id; rt 5 km, tt 1 hour
    val exec = get("/domsmatchup?ds=sst&b=0,0,4,4&rt=5000&tt=3600&matchOnce=true" +
      "&executionId=test-exec-1")
    assert(exec.statusCode() === 200)
    assert(exec.body().contains("\"execution_id\":\"test-exec-1\""))
    // the in-situ point at (0.51, 0.52, t=1000) matches grid point (0.5, 0.5)
    // default = the nested DOMS shape: primary point + matches array
    val results = get("/domsresults?executionId=test-exec-1")
    assert(results.statusCode() === 200)
    assert(results.body().contains("\"matches\":[") &&
      results.body().contains("\"sid\":100"))
    // simpleResults=true flattens to plain pair rows
    val flat = get("/domsresults?executionId=test-exec-1&simpleResults=true")
    assert(flat.statusCode() === 200)
    assert(flat.body().contains("\"sid\":100") &&
      !flat.body().contains("\"matches\""))
    // canonical reference paths answer too
    val ms = get("/match_spark?ds=sst&b=0,0,4,4&rt=5000&tt=3600")
    assert(ms.statusCode() === 200, ms.body())
    assert(ms.body().contains("\"sid\":100"))
    val list = get("/domslist")
    assert(list.statusCode() === 200)
    assert(list.body().contains("test-exec-1"))
    // in-situ subset endpoints see both points
    val values = get("/domsvalues?ds=sst")
    assert(values.body().contains("\"id\":100") && values.body().contains("\"id\":101"))
  }

  test("/domsmetadata reports catalog extent; unknown dataset errors") {
    val r = get("/domsmetadata?dataset=sst")
    assert(r.statusCode() === 200, r.body())
    assert(r.body().contains("\"n_granules\":3"))
    assert(r.body().contains("\"min_lat\":0.5") && r.body().contains("\"max_lat\":3.5"))
    // ds= works as the alias (fromQuery's dataset fallback order)
    assert(get("/domsmetadata?ds=sst").body() === r.body())
    val missing = get("/domsmetadata")
    assert(missing.statusCode() === 400)
    assert(missing.body().contains("'dataset' parameter not specified"))
    // resource-missing is 404 like the reference (webmodel.py:60
    // DatasetNotFoundException code=404), NOT the malformed-request 400
    val unknown = get("/domsmetadata?dataset=nope")
    assert(unknown.statusCode() === 404)
    assert(unknown.body().contains("not found"))
  }

  test("/domsresults for an unknown execution answers 404, malformed id 400") {
    val unknown = get("/domsresults?executionId=never-was")
    assert(unknown.statusCode() === 404)
    assert(unknown.body().contains("no results for execution id"))
    // a directory-unsafe id is a BAD REQUEST, not a missing resource —
    // the two failure classes stay distinct statuses
    val malformed = get("/domsresults?executionId=a%2F..%2Fb")
    assert(malformed.statusCode() === 400)
  }

  test("/domsstats returns in-situ count + bounds for the domain") {
    val r = get("/domsstats?b=0,0,1,1&startTime=0&endTime=100000")
    assert(r.statusCode() === 200, r.body())
    // only point 100 (0.51, 0.52, t=1000) is inside; 101 is at (2.5, 2.5)
    assert(r.body().contains("\"count\":1"))
    assert(r.body().contains("\"min_lat\":0.51"))
    assert(r.body().contains("\"start_time\":1000"))
    val all = get("/domsstats")
    assert(all.body().contains("\"count\":2"))
  }

  test("/domsplot renders a stored execution (scatter/map/histogram)") {
    val exec = get("/domsmatchup?ds=sst&b=0,0,4,4&rt=5000&tt=3600" +
      "&executionId=plot-exec-1")
    assert(exec.statusCode() === 200, exec.body())
    // default type=scatter, default output=PNG (a plot endpoint IS an image)
    val scatter = getBytes("/domsplot?id=plot-exec-1")
    assert(scatter.statusCode() === 200, new String(scatter.body(), "UTF-8"))
    assert(scatter.headers().firstValue("Content-Type").get === "image/png")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(scatter.body()))
    assert(img.getWidth === 800 && img.getHeight === 400)
    // the scatter style paints 3×3 markers in series color 0
    val c0 = graft.sources.Encoders.seriesColors(0)
    val n = (for (x <- 0 until 800; y <- 0 until 400
                  if img.getRGB(x, y) == c0) yield 1).sum
    assert(n >= 9, "expected at least one scatter marker")
    assert(getBytes("/domsplot?id=plot-exec-1&type=map").statusCode() === 200)
    assert(getBytes("/domsplot?id=plot-exec-1&type=histogram").statusCode() === 200)
    // histogram data is inspectable as JSON: bins sum to the pair count
    val hist = get("/domsplot?id=plot-exec-1&type=histogram&output=JSON")
    assert(hist.statusCode() === 200, hist.body())
    assert(hist.body().contains("\"count\":"))
    // normandcurve= adds the density bars + fitted normal samples
    val norm = get("/domsplot?id=plot-exec-1&type=histogram" +
      "&normandcurve=true&output=JSON")
    assert(norm.statusCode() === 200, norm.body())
    assert(norm.body().contains("\"density\":") &&
      norm.body().contains("\"normal_pdf\":"), norm.body())
    assert(get("/domsplot?id=plot-exec-1&type=pie").statusCode() === 400)
    assert(get("/domsplot").statusCode() === 400) // id required
    // histogram + normandcurve as the DEFAULT output (PNG): the
    // density bars + fitted-normal samples must survive the render
    // path end to end (ResultsPlotQuery.py:17-40 role), not just the
    // JSON inspection above
    val nPng = getBytes("/domsplot?id=plot-exec-1&type=histogram" +
      "&normandcurve=true&pngw=400&pngh=200")
    assert(nPng.statusCode() === 200, new String(nPng.body(), "UTF-8"))
    assert(nPng.headers().firstValue("Content-Type").get === "image/png")
    val nImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(nPng.body()))
    assert(nImg.getWidth === 400 && nImg.getHeight === 200)
    // pixel sanity: a real plot paints series-colored marks over the
    // white background
    val marks = (for (x <- 0 until 400; y <- 0 until 200
                      if nImg.getRGB(x, y) != 0xffffffff) yield 1).sum
    assert(marks > 40, s"normandcurve PNG painted only $marks pixels")
  }

  test("/delay sleeps and /makeerror raises (reference diagnostics)") {
    val t0 = System.nanoTime()
    val r = get("/delay?t=0.2")
    assert(r.statusCode() === 200, r.body())
    assert((System.nanoTime() - t0) / 1e9 >= 0.2)
    assert(r.body().contains("\"slept_sec\":0.2"))
    // the t= clamp: out-of-range or non-numeric values are 400s, not
    // thread-pinning sleeps or raw NumberFormatExceptions
    assert(get("/delay?t=3600").statusCode() === 400)
    assert(get("/delay?t=-1").statusCode() === 400)
    assert(get("/delay?t=abc").body().contains("want seconds"))
    val err = get("/makeerror")
    assert(err.statusCode() === 400)
    assert(err.body().contains("division by zero"))
  }

  test("sleeping /delay requests do not starve query endpoints") {
    // two concurrent /delay sleeps (gateless) must leave the job gate
    // and enough pool threads free for a real query to finish DURING
    // the sleeps. Starvation is a RELATIVE property: compare the
    // during-sleep latency against a just-measured solo baseline of
    // the same warm query — an absolute envelope flakes whenever
    // parallel suites contend for local[32] (a cold/contended plan
    // alone can take many seconds with no starvation involved).
    get("/timeSeriesSpark?ds=sst") // warm the plan
    val s0 = System.nanoTime()
    assert(get("/timeSeriesSpark?ds=sst").statusCode() === 200)
    val solo = (System.nanoTime() - s0) / 1e9
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val delays = (1 to 2).map(_ => pool.submit(
      new java.util.concurrent.Callable[Int] {
        def call(): Int = get("/delay?t=2").statusCode()
      }))
    Thread.sleep(300) // let the delays occupy their threads
    val t0 = System.nanoTime()
    val hb = get("/heartbeat")
    val ts = get("/timeSeriesSpark?ds=sst")
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(hb.statusCode() === 200 && ts.statusCode() === 200)
    // a starved query waits ~1.7s for the sleeps to release threads;
    // an unstarved one tracks its solo time (noise-padded)
    assert(elapsed < math.max(1.5, 3 * solo + 0.5),
      f"queries should not wait out the sleeps " +
        f"($elapsed%.2f s vs solo $solo%.2f s)")
    assert(delays.map(_.get()).toSet === Set(200))
    pool.shutdown()
  }

  test("output=CSV, NETCDF and ZIP encodings") {
    val csv = get("/timeSeriesSpark?ds=sst&output=CSV")
    assert(csv.headers().firstValue("Content-Type").get === "text/csv")
    assert(csv.body().linesIterator.next().split(",").contains("cnt"))
    val nc = getBytes("/timeSeriesSpark?ds=sst&output=NETCDF")
    assert(nc.headers().firstValue("Content-Type").get === "application/x-netcdf")
    assert(new String(nc.body().take(3), "UTF-8") === "CDF")
    val zip = getBytes("/domssubset?ds=sst&output=ZIP")
    assert(zip.headers().firstValue("Content-Type").get === "application/zip")
    assert(zip.body()(0) === 'P'.toByte && zip.body()(1) === 'K'.toByte)
  }

  test("output=PNG on /timeSeriesSpark renders a line plot") {
    val r = getBytes("/timeSeriesSpark?ds=sst&output=PNG&pngw=400&pngh=200")
    assert(r.statusCode() === 200, new String(r.body(), "UTF-8"))
    assert(r.headers().firstValue("Content-Type").get === "image/png")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.body()))
    assert(img.getWidth === 400 && img.getHeight === 200)
    // white chart background + at least one polyline in series color 0
    assert(img.getRGB(0, 0) === 0xffffffff)
    val c0 = graft.sources.Encoders.seriesColors(0)
    val n = (for (x <- 0 until 400; y <- 0 until 200
                  if img.getRGB(x, y) == c0) yield 1).sum
    assert(n > 40, "expected a plotted series line")
    // pngplot=map still forces the heatmap branch on the same endpoint
    val m = getBytes("/timeSeriesSpark?ds=sst&output=PNG&pngplot=map" +
      "&pngx=day_start&pngy=mean&pngv=cnt&pngscale=1")
    assert(m.statusCode() === 200, new String(m.body(), "UTF-8"))
  }

  test("multi-dataset PNG pivots to one line per dataset") {
    val r = getBytes("/timeSeriesSpark?ds=sst&output=PNG&pngw=300&pngh=150" +
      "&pngy=mean") // explicit y: single line
    assert(r.statusCode() === 200, new String(r.body(), "UTF-8"))
    val img1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.body()))
    def count(img: java.awt.image.BufferedImage, argb: Int): Int =
      (for (x <- 0 until img.getWidth; y <- 0 until img.getHeight
            if img.getRGB(x, y) == argb) yield 1).sum
    assert(count(img1, graft.sources.Encoders.seriesColors(1)) === 0,
      "single requested series must not draw a second color")
    // two datasets → two series colors present
    val m = getBytes("/timeSeriesSpark?ds=sst,sst_CLIM&output=PNG" +
      "&pngw=300&pngh=150")
    assert(m.statusCode() === 200, new String(m.body(), "UTF-8"))
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.body()))
    assert(count(img2, graft.sources.Encoders.seriesColors(0)) > 20)
    // second dataset has ONE day (a point, possibly a single pixel) —
    // its legend swatch line alone guarantees >5 pixels of color 1
    assert(count(img2, graft.sources.Encoders.seriesColors(1)) > 5)
  }

  test("output=PNG renders the time-average map as a heatmap") {
    val r = getBytes("/timeAvgMapSpark?ds=sst&output=PNG&pngscale=1")
    assert(r.statusCode() === 200)
    assert(r.headers().firstValue("Content-Type").get === "image/png")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.body()))
    // the fixture grid is 4 lats × 4 lons; value mean = li*4 + lo + 1
    assert(img.getWidth === 4 && img.getHeight === 4)
    // min at (lat .5, lon .5) → bottom-left; max at (3.5, 3.5) → top-right
    assert(img.getRGB(0, 3) === graft.sources.Encoders.jetArgb(0.0))
    assert(img.getRGB(3, 0) === graft.sources.Encoders.jetArgb(1.0))
  }
}
