package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, first}

import graft.sources.Encoders

/** The HTTP serving layer over [[Handlers.registry]] — the reference's
  * `webapp.py:44-136` Tornado application, on the JDK's built-in
  * `com.sun.net.httpserver` (no new dependencies). Request flow per
  * GET: parse query params (P10, `QueryParams.fromQuery`) → resolve
  * the path's plan builder → execute under the [[Handlers.JobGate]]
  * (503 when the slot pool is exhausted, NexusHandler.py:250-294) →
  * size-gate the result (W5) → encode per `output=` (JSON default,
  * CSV, NETCDF, ZIP, PNG — S9).
  *
  * The server holds ONE SparkSession and one registry for its
  * lifetime; per-request cost is plan construction + execution, never
  * session startup — the reference's architecture exactly
  * (webapp.py builds its Spark context once at boot).
  */
final class HttpServer(spark: SparkSession, tiles: DataFrame,
                       registry: Map[String, Handlers.Handler],
                       port: Int = 0, maxConcurrentJobs: Int = 10,
                       resultLimit: Int = 100000,
                       streamWriteTimeoutMs: Long = 60000) {

  private val gate = new Handlers.JobGate(maxConcurrentJobs)
  private val server = JdkHttpServer.create(new InetSocketAddress(port), 0)

  // /capabilities must list THIS server's paths (incl. DOMS when
  // mounted), not the static core registry
  private val reg: Map[String, Handlers.Handler] =
    registry.updated("/capabilities", (_: Handlers.QueryParams, t: DataFrame) => {
      val s = t.sparkSession
      import s.implicits._
      registry.keys.toSeq.sorted.toDF("path")
    })

  /** Bound port (useful with port = 0: ephemeral for tests). */
  def boundPort: Int = server.getAddress.getPort

  private def queryMap(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) => Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap
  }

  private def respond(ex: HttpExchange, status: Int, contentType: String,
                      body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, body.length.toLong)
    val os = ex.getResponseBody
    try os.write(body) finally os.close()
  }

  private def jsonError(ex: HttpExchange, status: Int, msg: String): Unit =
    respond(ex, status, "application/json",
      s"""{"error":${jsonString(msg)}}""".getBytes(UTF_8))

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private sealed trait Outcome
  private final case class TooBig(limit: Long) extends Outcome
  private final case class Buffered(rows: Array[org.apache.spark.sql.Row],
                                    schema: org.apache.spark.sql.types.StructType)
    extends Outcome
  private case object Streamed extends Outcome

  /** Unlimited (`limit=0`, the reference's resultSizeLimit=0 contract,
    * webmodel.py:298-302) responses stream chunked: `toLocalIterator`
    * materializes one PARTITION at a time on the driver, so memory is
    * bounded by the largest partition instead of the whole result.
    *
    * [[streamChunked]] is the single copy of the streaming policy both
    * formats share. The iterator is PRIMED (first partition's Spark
    * job) before the 200 commits, so execution failures still surface
    * as clean 400s. A MID-stream failure can only truncate — the
    * status is on the wire — so the body is left DETECTABLY
    * incomplete: the suffix (JSON's closing bracket) is withheld and
    * the format's truncation marker appended best-effort (CSV has no
    * framing of its own, so it gets an explicit `__TRUNCATED__` final
    * line; JSON stays malformed, which any parser flags). close() is
    * guarded — a broken client socket would otherwise throw a second
    * time out of the finally.
    */
  private def streamChunked(ex: HttpExchange, contentType: String,
                            prefix: String, sep: String, suffix: String,
                            truncationMarker: String,
                            rows: Iterator[String]): Unit = {
    rows.hasNext // prime: first partition's job before the status commits
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(200, 0L)
    val os = new java.io.BufferedOutputStream(ex.getResponseBody, 64 * 1024)
    // IDLE-PROGRESS DEADLINE: a streaming transfer runs inside a
    // JobGate slot, so a reader that stops draining its socket would
    // otherwise pin the slot forever (the r9 slow-reader caveat). A
    // socket-blocked write makes no progress; when none has been made
    // for streamWriteTimeoutMs the watchdog closes the exchange from
    // its own thread, the blocked write throws, the truncation path
    // runs, and the slot frees. Buffered writes count as progress —
    // only a genuinely backpressured socket can trip the deadline.
    val progress = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    // while the writer thread is inside the ITERATOR (a toLocalIterator
    // hasNext/next runs one Spark job per partition), the deadline must
    // not count: a straggling partition — task retry, skew, GC — is
    // engine time, not a stalled client, and post-hoc progress bumps
    // alone can't distinguish a long compute from a blocked write
    val inCompute = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    // flips the instant os.close() returns: the stream is complete and
    // the JDK server may recycle the keep-alive socket for a NEW
    // request, so no teardown may run past this point
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the writer thread, for the NON-REFLECTIVE disconnect backstop:
    // the JDK server writes through a blocking SocketChannel, which is
    // an InterruptibleChannel — interrupting a thread blocked in its
    // write closes the channel (ClosedByInterruptException) with zero
    // JDK-internal access. Guarded by a lock so a late watchdog firing
    // can never interrupt the pool thread after it moved on to another
    // request; the finally clears the ref under the same lock and then
    // swallows any already-delivered interrupt flag.
    val writerLock = new Object
    var writer: Thread = Thread.currentThread()
    val period = math.max(1L, streamWriteTimeoutMs / 2)
    // NOT one-shot: the watchdog keeps firing every period while the
    // deadline stays lapsed. A single latched firing can be CONSUMED
    // without killing the stream — e.g. the interrupt lands while the
    // writer just re-entered a Spark iterator pull (InterruptedException
    // clears the flag without closing the channel), after which the
    // truncation path's os.close() can block on the same stalled socket
    // with no watchdog left to free it. Re-firing makes the teardown
    // converge: eventually a close/interrupt lands in a channel write
    // and the socket dies. `fired` only de-duplicates the log line;
    // repeat disconnects on an already-closed connection are no-ops.
    val watchdog = HttpServer.streamWatchdog.scheduleAtFixedRate(
      () => if (!done.get() && !inCompute.get() &&
                (System.nanoTime() - progress.get()) / 1000000L
                  > streamWriteTimeoutMs) {
        // BOTH teardown paths run under the writer lock, and the WHOLE
        // stall condition is re-checked inside it: this task can be
        // descheduled between the outer check and the lock, and in that
        // gap the client may drain (progress resumes — interrupting
        // then would truncate a now-healthy stream, possibly inside a
        // Spark iterator pull) or the stream may complete (`done` — a
        // teardown then could close a keep-alive connection the JDK
        // server already recycled for a NEW request; recycling needs a
        // further client round-trip, so the under-lock `done` re-check
        // NARROWS that window to the instructions between the re-check
        // and the invoke — a residual any async teardown design has,
        // requiring this task descheduled mid-lock for a full client
        // RTT). Preferred teardown: close the
        // connection via the server's own internals (unblocks the
        // writer AND tears the socket down immediately); when the
        // reflective path is unavailable (JDK internals moved,
        // --add-opens absent at deploy), fall back to interrupting the
        // blocked writer — the interruptible-channel close gives the
        // same end state instead of degrading to a log line.
        writerLock.synchronized {
          if (writer != null && !done.get() && !inCompute.get() &&
              (System.nanoTime() - progress.get()) / 1000000L
                > streamWriteTimeoutMs) {
            if (fired.compareAndSet(false, true))
              System.err.println(s"[http] streaming reader made no " +
                s"progress for >${streamWriteTimeoutMs} ms; disconnecting")
            if (!HttpServer.forceDisconnect(ex)) writer.interrupt()
          }
        }
      },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    // the deadline is suspended for the DURATION of each iterator
    // pull (inCompute) and the progress clock restarts when the pull
    // returns — so only a socket-blocked write can let it lapse
    val tracked = new Iterator[String] {
      def hasNext: Boolean = {
        inCompute.set(true)
        try rows.hasNext
        finally { progress.set(System.nanoTime()); inCompute.set(false) }
      }
      def next(): String = {
        inCompute.set(true)
        try rows.next()
        finally { progress.set(System.nanoTime()); inCompute.set(false) }
      }
    }
    try {
      try {
        os.write(prefix.getBytes(UTF_8))
        var first = true
        while (tracked.hasNext) {
          if (!first) os.write(sep.getBytes(UTF_8))
          first = false
          os.write(tracked.next().getBytes(UTF_8))
          progress.set(System.nanoTime())
        }
        os.write(suffix.getBytes(UTF_8))
      } catch {
        case e: Throwable =>
          System.err.println(s"[http] stream truncated: ${e.getMessage}")
          try os.write(truncationMarker.getBytes(UTF_8))
          catch { case _: java.io.IOException => () }
      }
    } finally {
      try os.close() catch { case _: java.io.IOException => () }
      // completion flips the moment close() returns — BEFORE the
      // watchdog can next acquire the lock — so a fire descheduled
      // between its outer check and the lock sees the stream as done
      // instead of closing a recycled connection (while close() itself
      // BLOCKS on a stalled socket, done stays false and the watchdog
      // correctly tears it down)
      done.set(true)
      watchdog.cancel(false)
      // detach from the interrupt backstop BEFORE this thread returns
      // to the pool, then drop any interrupt the watchdog already
      // delivered — a poisoned pool thread would break its next request
      writerLock.synchronized { writer = null }
      Thread.interrupted()
      ()
    }
  }

  private def streamJson(ex: HttpExchange, df: DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    streamChunked(ex, "application/json", "[", ",", "]",
      truncationMarker = "", df.toJSON.toLocalIterator().asScala)
  }

  /** Chunked CSV twin of [[streamJson]], sharing [[Encoders.csvLine]]
    * with the buffered encoder.
    */
  private def streamCsv(ex: HttpExchange, df: DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    streamChunked(ex, "text/csv",
      prefix = df.columns.mkString(",") + "\n", sep = "", suffix = "",
      truncationMarker = "__TRUNCATED__\n",
      df.toLocalIterator().asScala.map(r => Encoders.csvLine(r) + "\n"))
  }

  /** Execute a handler's plan and encode it. `output`: JSON (default,
    * an array of row objects — webmodel.py:425-431's JSON rendition),
    * CSV, NETCDF, or ZIP (CSV + NetCDF bundle, the subsetter's
    * download format). `limit=0` means UNLIMITED (the reference's
    * resultSizeLimit=0): JSON/CSV stream chunked with bounded driver
    * memory; the artifact formats (PNG/NETCDF/ZIP) buffer by nature —
    * a raster is pixel-bounded, an archive needs its full bytes.
    */
  private def run(ex: HttpExchange, path: String,
                  handler: Handlers.Handler): Unit = {
    val q = queryMap(ex)
    val params =
      // dataset-less paths: parse the full query (bbox/time/extra all
      // still apply — /domsstats takes b= with no ds=) with an empty
      // dataset instead of fromQuery's missing-ds error
      if (HttpServer.noDsPaths.contains(path) &&
          !q.contains("ds") && !q.contains("dataset"))
        Handlers.QueryParams.fromQuery(q + ("ds" -> ""))
      else Handlers.QueryParams.fromQuery(q)
    // diagnostics that run no Spark job execute OUTSIDE the job gate:
    // a sleeping /delay holding a gate slot (plus its pool thread)
    // would starve real queries — with maxConcurrentJobs sleepers the
    // whole API 503s for the duration
    def gated[T](body: => T): Option[T] =
      if (HttpServer.gatelessPaths.contains(path)) Some(body)
      else gate.tryRun(spark)(body)
    val defaultOutput =
      if (path == "/domsplot") "PNG" else "JSON" // a plot endpoint IS an image
    val output = q.getOrElse("output", defaultOutput).toUpperCase
    val lim = q.get("limit").map(_.toInt).getOrElse(resultLimit)
    // loud, not lenient: a negative limit is caller confusion (0 is
    // the documented unlimited sentinel) — fail before running a job
    require(lim >= 0, s"limit must be >= 0 (0 = unlimited), got $lim")
    gated {
      val plan = handler(params, tiles)
      // EXACTLY 0 is unlimited (the reference contract defines only 0)
      if (lim == 0) output match {
        // unlimited: the data-plane formats stream INSIDE the gate —
        // toLocalIterator schedules Spark jobs partition by partition
        // for the whole write, so the slot is genuinely executing for
        // most of the transfer. A slow-but-progressing reader holds
        // its slot through the socket-bound gaps too, exactly like the
        // reference's handler slot spanning the whole calc — but the
        // hold is now BOUNDED: a reader that stops draining entirely
        // is disconnected by streamChunked's idle-progress deadline
        // (streamWriteTimeoutMs) and its slot freed. Shedding stays
        // the job of the gate; a starved-by-downloads deployment
        // should raise maxConcurrentJobs rather than let unbounded
        // concurrent full-store scans through.
        // Only the three artifact formats buffer; an unrecognized
        // output= falls to streaming JSON exactly as the limited path
        // falls to buffered JSON — never to an unbounded collect
        case "CSV" => streamCsv(ex, plan); Streamed
        case "PNG" | "NETCDF" | "ZIP" => Buffered(plan.collect(), plan.schema)
        case _ => streamJson(ex, plan); Streamed
      }
      else Handlers.sizeGated(plan, lim) match {
        case Left(l) => TooBig(l)
        case Right(rows) => Buffered(rows, plan.schema)
      }
    } match {
      case None =>
        jsonError(ex, 503, s"max concurrent jobs ($maxConcurrentJobs) in flight")
      case Some(TooBig(limit)) =>
        jsonError(ex, 413, s"result exceeds $limit rows; narrow the query " +
          "or raise limit=")
      case Some(Streamed) => ()
      case Some(Buffered(rows, schema)) =>
        // re-wrap the collected rows as a LOCAL relation for the
        // encoders — their collect() runs no cluster job, so this
        // happens outside the gate
        val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        output match {
          case "CSV" =>
            respond(ex, 200, "text/csv", Encoders.toCsvBytes(df))
          case "NETCDF" =>
            respond(ex, 200, "application/x-netcdf", Encoders.toNetcdf(df))
          case "ZIP" =>
            respond(ex, 200, "application/zip", Encoders.toZip(Seq(
              "data.csv" -> Encoders.toCsvBytes(df),
              "data.nc" -> Encoders.toNetcdf(df))))
          case "PNG" =>
            // time-series endpoints render LINE plots (the reference's
            // TimeSeriesSpark.py:364-474 matplotlib chart); map-shaped
            // endpoints render heatmaps; /domsplot picks per its type=
            // (ResultsPlotQuery.py:32-40: scatter | map | histogram).
            // pngplot= overrides either way.
            val domsPlot = if (path != "/domsplot") None else Some(
              q.getOrElse("type", "scatter") match {
                case "map" => "map"
                case "histogram" => "series"
                case _ => "scatter"
              })
            val plot = q.getOrElse("pngplot", domsPlot.getOrElse(
              if (HttpServer.seriesPngPaths.contains(path)) "series" else "map"))
            if (plot == "series" || plot == "scatter") {
              // multi-dataset series (ds=a,b): one line per dataset —
              // pivot by dataset before plotting, like the reference's
              // per-dataset chart lines. Plot the most-derived series
              // present (lowpass > seasonal > raw mean) so smoothing
              // flags show the series they produced. Scatter draws the
              // same axes as unconnected point markers.
              val seriesCol = Seq("mean_lowpass", "mean_seasonal", "mean")
                .find(df.columns.contains)
              val plotDf =
                if (plot == "series" && df.columns.contains("dataset") &&
                    q.get("pngy").isEmpty && seriesCol.isDefined)
                  df.groupBy(col("day_start")).pivot("dataset")
                    .agg(first(col(seriesCol.get)))
                else df
              respond(ex, 200, "image/png", Encoders.toPngSeriesAuto(plotDf,
                xCol = q.get("pngx"),
                yCols = q.get("pngy").map(_.split(',').toSeq),
                width = q.get("pngw").map(_.toInt).getOrElse(800),
                height = q.get("pngh").map(_.toInt).getOrElse(400),
                style = if (plot == "scatter") "points" else "line"))
            }
            else
              respond(ex, 200, "image/png", Encoders.toPngAuto(df,
                xCol = q.get("pngx"), yCol = q.get("pngy"),
                valueCol = q.get("pngv"),
                scale = q.get("pngscale").map(_.toInt).getOrElse(8)))
          case _ =>
            val body = "[" + df.toJSON.collect().mkString(",") + "]"
            respond(ex, 200, "application/json", body.getBytes(UTF_8))
        }
    }
  }

  def start(): HttpServer = {
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        reg.get(path) match {
          case _ if ex.getRequestMethod != "GET" =>
            jsonError(ex, 405, "GET only")
          case Some(h) => run(ex, path, h)
          case None =>
            jsonError(ex, 404, s"unknown path $path; see /capabilities")
        }
      } catch {
        // resource-missing (unknown execution id / dataset) answers 404
        // like the reference (webmodel.py:60 code=404); only malformed
        // or failed requests fall to the generic 400
        case e: graft.sources.NotFoundException =>
          jsonError(ex, 404, Option(e.getMessage).getOrElse(e.getClass.getName))
        case e: Throwable =>
          jsonError(ex, 400, Option(e.getMessage).getOrElse(e.getClass.getName))
      } finally ex.close()
    })
    server.setExecutor(pool)
    server.start()
    this
  }

  // The serving pool must be LARGER than the job gate, or excess
  // requests queue unboundedly in the executor instead of shedding:
  // with pool == gate, a 48-deep burst never sees a 503 — it waits,
  // and sustained overload grows latency without bound (measured by
  // tools/SoakBench, SCALING.md). A 3x+2 pool keeps accept+parse cheap
  // and concurrent while the JobGate sheds immediately at the
  // reference's ceiling (tornado's async accept + the 10-job
  // semaphore, NexusHandler.py:250-294). The +2 keeps gateless
  // diagnostics (/delay, /heartbeat) answerable even when every
  // gate-bound slot is busy.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(2, 3 * maxConcurrentJobs + 2))

  /** Stop the listener AND the serving pool — the pool's threads are
    * non-daemon, so leaving them alive keeps the whole JVM from
    * exiting after the server is discarded (found by the soak tool
    * hanging at shutdown).
    */
  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }
}

object HttpServer {
  /** One shared daemon watchdog thread for all servers' streaming
    * idle-progress deadlines — it only ever compares a timestamp and
    * (rarely) closes a stalled exchange, so a single thread serves any
    * number of concurrent streams; daemon so it never pins the JVM.
    */
  private val streamWatchdog = {
    val t = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val th = new Thread(r, "http-stream-watchdog")
        th.setDaemon(true)
        th
      })
    t.setRemoveOnCancelPolicy(true)
    t
  }

  /** Force-close a stalled exchange's raw socket CHANNEL. The polite
    * `HttpExchange.close()` is unusable from the watchdog: it flushes
    * the chunk terminator into the very socket that is blocked, and
    * wedges the closer too. Closing the channel asynchronously is the
    * one operation that unblocks the writer thread (with an
    * AsynchronousCloseException → truncation path → gate slot freed) —
    * the same move the JDK server's own idle/maxRspTime timers make
    * (`ServerImpl` closes the `Connection` directly). The internals
    * are reached reflectively; the build opens
    * `jdk.httpserver/sun.net.httpserver` for it. Returns false when
    * the internals are unreachable (JDK layout changed, --add-opens
    * absent at deploy time) so the caller can fall back to the
    * non-reflective writer-interrupt path instead of degrading to a
    * log line — slot reclamation must never depend on reflection
    * alone.
    */
  /** Test hook: force the reflective path to report failure so specs
    * can prove the interrupt backstop frees slots on its own (there is
    * no portable way to simulate a JDK whose internals moved).
    */
  @volatile private[api] var reflectiveDisconnectEnabled = true

  /** Latched after the first genuine reflective failure: the JDK's
    * internals don't come back mid-process, and the re-firing watchdog
    * would otherwise re-throw + re-log the same 3-line error every
    * period per stalled stream. (The test hook above deliberately does
    * NOT latch — it bypasses before the try.)
    */
  @volatile private var reflectiveBroken = false
  private val invokeFailLogged =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def forceDisconnect(ex: HttpExchange): Boolean =
    if (!reflectiveDisconnectEnabled || reflectiveBroken) false
    else try {
      val implField = ex.getClass.getDeclaredField("impl")
      implField.setAccessible(true)
      val impl = implField.get(ex)
      val getConn = impl.getClass.getDeclaredMethod("getConnection")
      getConn.setAccessible(true)
      val conn = getConn.invoke(impl)
      val close = conn.getClass.getDeclaredMethod("close")
      close.setAccessible(true)
      close.invoke(conn)
      true
    } catch {
      case e: java.lang.reflect.InvocationTargetException =>
        // reflection itself WORKED — the connection's own close() threw
        // (e.g. one half-torn socket racing the client's RST). That is
        // transient and per-connection: fall back to the writer
        // interrupt for THIS fire only, without latching the preferred
        // path off for the rest of the process lifetime.
        if (invokeFailLogged.compareAndSet(false, true))
          System.err.println("[http] reflective disconnect: connection " +
            "close threw (transient; the affected stream falls back to " +
            "the writer interrupt — further occurrences are not " +
            s"logged): ${e.getCause}")
        false
      case e: Throwable =>
        // NoSuchField/NoSuchMethod/IllegalAccess/InaccessibleObject —
        // the JDK's internals moved or --add-opens is absent; that
        // verdict cannot change mid-process, so latch it and stop
        // re-logging every watchdog period
        reflectiveBroken = true
        System.err.println("[http] reflective force-disconnect unavailable " +
          "(is --add-opens jdk.httpserver/sun.net.httpserver=ALL-UNNAMED " +
          s"set?), falling back to writer interrupt from now on: $e")
        false
    }

  /** Endpoints whose results are 1-D series — output=PNG defaults to
    * the line plot for these (heatmap everywhere else).
    */
  val seriesPngPaths: Set[String] = Set(
    "/timeSeriesSpark", "/stats", "/statsSolr",
    "/dailydifferenceaverage_spark", "/dailydifferenceaverage")

  /** Diagnostic paths that run no Spark job — served outside the
    * JobGate so they can't occupy (or be starved of) query slots.
    * `/delay` in particular sleeps for seconds by design.
    */
  val gatelessPaths: Set[String] = Set(
    "/delay", "/makeerror", "/heartbeat", "/version", "/capabilities")

  /** Paths that work without a `ds=` parameter (diagnostics, stored
    * executions, in-situ stats).
    */
  val noDsPaths: Set[String] = Set(
    "/capabilities", "/heartbeat", "/version", "/list", "/delay",
    "/makeerror", "/domslist", "/domsresults", "/domsplot", "/domsstats",
    // /domsmetadata reports its own reference-parity error when the
    // dataset arg is missing (MetadataQuery.py:28)
    "/domsmetadata")

  /** Boot with the full registry: core + legacy + diagnostics + DOMS
    * (when an in-situ table and results path are supplied).
    */
  def apply(spark: SparkSession, tiles: DataFrame,
            insitu: Option[DataFrame] = None,
            resultsPath: Option[String] = None,
            port: Int = 0): HttpServer = {
    val doms = (insitu, resultsPath) match {
      case (Some(i), Some(p)) => Handlers.domsRegistry(i, p)
      case _ => Map.empty[String, Handlers.Handler]
    }
    new HttpServer(spark, tiles, Handlers.registry ++ doms, port).start()
  }
}
