package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S7 — the in-situ EDGE source as a DISTRIBUTED paged-HTTP reader
  * (`Matchup.py:639-691` `query_edge`; `fetchedgeimpl.py:62-201`
  * `fetch`/`getCount`/`__doQuery`).
  *
  * The reference fetches pages on the driver with a thread pool. Here
  * the driver issues one count probe (`itemsPerPage=0`, the
  * reference's `getCount` trick) plus one page-size confirmation fetch
  * whose items are REUSED as page 0, then ships the remaining page
  * list — just `startIndex` offsets — to executors, which fetch and
  * parse their pages independently. Fetch parallelism scales with the
  * cluster instead of a driver thread pool; at most one page's payload
  * ever sits on the driver, and it is never fetched twice.
  *
  * Parsing is `from_json` with an EXPLICIT caller schema: one pass,
  * no sampling/inference job, and (crucially) no second fetch — a
  * schema-inferring `spark.read.json(ds)` would recompute the HTTP
  * lineage once for inference and once for the read.
  *
  * Retries mirror the reference (`__fetchJson`: non-200 or bad JSON →
  * retry up to `maxTries`), per page, executor-side.
  */
object EdgeSource {

  /** The reference's "usable result" shape (`__resultRawToUsable` +
    * `getValues` placeholder trim): x/y (lon/lat), epoch time, depth,
    * platform, device, source, value.
    */
  val insituSchema: StructType = StructType.fromDDL(
    "id LONG, x DOUBLE, y DOUBLE, time LONG, depth DOUBLE, " +
      "platform STRING, device STRING, source STRING, value DOUBLE")

  /** GET `url?params…` returning the body, with the reference's retry
    * loop (any failure → retry, `maxtries` cap).
    */
  // ONE client per JVM: HttpClient is thread-safe and owns a selector
  // thread + connection pool — constructing one per page fetch churned
  // threads/file descriptors with zero connection reuse
  private lazy val httpClient = java.net.http.HttpClient.newHttpClient()

  /** GET + parse one page under ONE retry loop, honoring the
    * documented contract (non-200 OR bad JSON → retry up to
    * `maxTries`): a 200 with a truncated body or an HTML error page is
    * as transient as a 503, and parsing outside the loop gave it zero
    * retries. Exponential backoff (100 ms doubling, 2 s cap) so a
    * briefly unavailable endpoint is not hammered with back-to-back
    * retries from every page task at once — amplification that defeats
    * exactly the recovery the retries exist for.
    */
  private[sources] def fetchPageWithRetry(url: String,
                                 maxTries: Int): (Long, Long, Seq[String]) = {
    val root = fetchRootWithRetry(url, maxTries)
    (envelopeTotal(root, url), envelopePerPage(root), itemStrings(root))
  }

  /** GET + parse one page body to its jackson TREE under ONE retry
    * loop (r15: the tree is the single parse — item extraction, row
    * conversion and envelope reads all work off it; see [[EdgeJson]]).
    * Contract unchanged from the r14 string form: non-200 OR
    * unparseable/ envelope-less JSON → retry up to `maxTries`.
    */
  private[sources] def fetchRootWithRetry(
      url: String, maxTries: Int): com.fasterxml.jackson.databind.JsonNode = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(500)).GET().build()
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxTries) {
      attempt += 1
      try {
        val resp = httpClient.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) {
          val root = om.readTree(resp.body())
          envelopeTotal(root, url) // envelope-less page → retried, as before
          return root
        }
        last = new java.io.IOException(
          s"HTTP ${resp.statusCode()} from $url")
      } catch {
        // a task-kill interrupt lands in the SEND window far more
        // often than in a backoff sleep (the request timeout is
        // 500 s) — swallowing it as a generic transport error would
        // clear the flag and keep retrying for minutes; same exit
        // contract as the backoff-interrupt path below
        case ie: InterruptedException =>
          Thread.currentThread().interrupt()
          throw interruptFailure(
            s"interrupted during page fetch for $url (attempt $attempt)",
            ie, last)
        case e: Exception => last = e
      }
      if (attempt < maxTries)
        // a task-kill interrupt landing during the backoff must exit
        // under the SAME failure contract as every other path out of
        // this loop (an IOException carrying the last transport cause,
        // not a bare InterruptedException) — and the interrupt flag is
        // restored so Spark's task-kill machinery still sees it
        try Thread.sleep(math.min(2000L, 100L << math.min(attempt - 1, 10)))
        catch {
          case ie: InterruptedException =>
            Thread.currentThread().interrupt()
            throw interruptFailure(
              s"interrupted during retry backoff for $url (attempt $attempt)",
              ie, last)
        }
    }
    throw new java.io.IOException(s"max retries ($maxTries) for $url", last)
  }

  /** The interrupt-exit failure: the last transport error (when one
    * exists) is the cause — it says WHY the task was still retrying —
    * and the InterruptedException rides as suppressed so the log
    * record keeps where the interrupt landed instead of discarding
    * its stack.
    */
  private def interruptFailure(msg: String, ie: InterruptedException,
                               last: Throwable): java.io.IOException = {
    val ioe = new java.io.IOException(msg, if (last != null) last else ie)
    if (last != null) ioe.addSuppressed(ie)
    ioe
  }

  private def withParams(base: String, params: Map[String, String]): String = {
    val q = params.toSeq.sortBy(_._1).map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    if (q.isEmpty) base else base + (if (base.contains("?")) "&" else "?") + q
  }

  /** Parse one page body into its top-level ints and the `results`
    * array elements re-serialized as standalone JSON strings
    * (jackson — already on Spark's classpath).
    */
  // ONE ObjectMapper per JVM: thread-safe for reads; constructing one
  // per page (r14 shape) churned allocations for zero isolation
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def envelopeTotal(root: com.fasterxml.jackson.databind.JsonNode,
                            url: String): Long =
    Option(root.get("totalResults")).map(_.asLong())
      .getOrElse(throw new java.io.IOException(s"no totalResults in page $url"))

  private def envelopePerPage(
      root: com.fasterxml.jackson.databind.JsonNode): Long =
    Option(root.get("itemsPerPage")).map(_.asLong()).getOrElse(0L)

  private def itemNodes(root: com.fasterxml.jackson.databind.JsonNode)
      : Seq[com.fasterxml.jackson.databind.JsonNode] =
    Option(root.get("results")) match {
      case Some(arr) if arr.isArray => (0 until arr.size()).map(arr.get)
      case _ => Seq.empty
    }

  private def itemStrings(
      root: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    itemNodes(root).map(_.toString)

  private[sources] def parsePage(body: String): (Long, Long, Seq[String]) = {
    val root = om.readTree(body)
    (envelopeTotal(root, "<body>"), envelopePerPage(root), itemStrings(root))
  }

  /** Read a full EDGE query as a DataFrame.
    *
    * @param url        endpoint base URL
    * @param params     query params (startTime/endTime/bbox/platform…);
    *                   `startIndex`/`itemsPerPage` are managed here
    * @param schema     shape of one `results[]` element (fields absent
    *                   from a record come back NULL — from_json)
    * @param itemsPerPage requested page size; the server's confirmed
    *                   size from the probe wins (fetchedgeimpl honors
    *                   `itemsPerPageR` the same way)
    */
  def read(spark: SparkSession, url: String,
           params: Map[String, String] = Map.empty,
           schema: StructType = insituSchema,
           itemsPerPage: Int = 1000, maxTries: Int = 5): DataFrame = {
    val (step, starts, firstItems) = pageStarts(url, params, itemsPerPage, maxTries)
    if (starts.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // the size-confirmation probe already carried page 0's items to
    // the driver — reuse them instead of refetching the page on an
    // executor (they are at most one page; every LATER page still goes
    // executor-side only). They arrive as strings (the DSv2 planner
    // shares pageStarts and ships offsets only), so page 0 parses here
    // — once, like every other page.
    val rest = if (firstItems.nonEmpty) starts.drop(1) else starts
    val nParts = math.min(math.max(rest.length, 1),
      spark.sparkContext.defaultParallelism).max(1)
    // r15 (VERDICT #5): pages parse ONCE — jackson tree → Row via the
    // shared EdgeJson converter — instead of re-serializing each item
    // and re-parsing it with from_json (a strict 2× parse of every
    // byte). parallelize slices the page list directly; the old
    // createDataset(...).repartition(...) additionally paid a shuffle
    // of the offsets for the same even spread.
    val firstRows = firstItems.map(s => EdgeJson.externalRow(om.readTree(s), schema))
    val restRows = spark.sparkContext.parallelize(rest, nParts)
      .mapPartitions { it =>
        it.flatMap { s =>
          itemNodes(fetchRootWithRetry(pageUrl(url, params, step, s), maxTries))
            .map(EdgeJson.externalRow(_, schema))
        }
      }
    val firstRdd = spark.sparkContext.parallelize(firstRows, 1)
    spark.createDataFrame(firstRdd.union(restRows), schema)
  }

  /** Driver probe: count (`itemsPerPage=0`, the reference's getCount
    * trick) then page-size confirmation — whose items ride back for
    * reuse as page 0. Returns (server-confirmed step, page start
    * offsets, page-0 items) — empty starts for a zero-result query.
    * Shared by the function API and the DataSourceV2 scan planner
    * (which ignores the items: a DSv2 partition refetches page 0).
    */
  private[sources] def pageStarts(url: String, params: Map[String, String],
                                  itemsPerPage: Int,
                                  maxTries: Int): (Int, Seq[Long], Seq[String]) = {
    val (total, _, _) = fetchPageWithRetry(
      withParams(url, params ++ Seq("itemsPerPage" -> "0", "startIndex" -> "0")),
      maxTries)
    if (total == 0) return (itemsPerPage, Nil, Nil)
    val (_, confirmed, firstItems) = fetchPageWithRetry(
      withParams(url, params ++
        Seq("itemsPerPage" -> itemsPerPage.toString, "startIndex" -> "0")),
      maxTries)
    val step = (if (confirmed > 0) confirmed
      else math.max(1L, firstItems.length.toLong)).toInt
    (step, (0L until total by step.toLong).toSeq, firstItems)
  }

  /** Full URL of one page. */
  private[sources] def pageUrl(url: String, params: Map[String, String],
                               step: Int, startIndex: Long): String =
    withParams(url, params ++
      Seq("itemsPerPage" -> step.toString, "startIndex" -> startIndex.toString))

  /** Executor-side: fetch one page (with the retry loop) and return
    * its result elements as parsed jackson nodes — the single-parse
    * feed for both read paths (r15).
    */
  private[sources] def fetchPageNodes(pageUrl: String, maxTries: Int)
      : Seq[com.fasterxml.jackson.databind.JsonNode] =
    itemNodes(fetchRootWithRetry(pageUrl, maxTries))
}
