package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Drives EdgeSource against a local paged endpoint that mimics the
  * EDGE contract (fetchedgeimpl.py): totalResults/itemsPerPage/
  * startIndex envelope, server-forced page size, flaky pages that
  * need the retry loop.
  */
class EdgeSourceSpec extends SparkSpec {

  private val total = 23
  private val forcedPageSize = 7 // server caps whatever the client asks
  private val failures = new ConcurrentHashMap[String, Integer]()
  private val seenQueries = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def record(i: Int): String =
    s"""{"id":$i,"x":${i * 0.5},"y":${i * -0.25},"time":${1000L + i},""" +
      s""""platform":"buoy","source":"edge-test","value":${i * 1.5}}"""

  private var server: JdkHttpServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = JdkHttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/insitu", (ex: HttpExchange) => {
      seenQueries.add(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").filter(_.nonEmpty)
        .map(_.split("=", 2)).map(a => a(0) -> a.lift(1).getOrElse("")).toMap
      val start = q.getOrElse("startIndex", "0").toInt
      val asked = q.getOrElse("itemsPerPage", "10").toInt
      // page startIndex=7 fails on its first attempt — retry must save it
      val body: Array[Byte] =
        if (start == 7 && failures.putIfAbsent("p7", 1) == null) {
          ex.sendResponseHeaders(500, -1)
          ex.close()
          null
        } else {
          val n = math.min(asked, forcedPageSize)
          val items = (start until math.min(start + n, total)).map(record)
          (s"""{"totalResults":$total,"startIndex":$start,""" +
            s""""itemsPerPage":$n,"results":[${items.mkString(",")}]}""")
            .getBytes(UTF_8)
        }
      if (body != null) {
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.createContext("/empty", (ex: HttpExchange) => {
      val body = """{"totalResults":0,"startIndex":0,"itemsPerPage":0,"results":[]}"""
        .getBytes(UTF_8)
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def base(path: String) =
    s"http://127.0.0.1:${server.getAddress.getPort}$path"

  test("paged fetch returns every record exactly once despite a flaky page") {
    import spark.implicits._
    val df = EdgeSource.read(spark, base("/insitu"),
      params = Map("startTime" -> "0", "endTime" -> "9999"),
      itemsPerPage = 100) // asks 100; server forces 7 → 4 pages
    val rows = df.select("id", "x", "y", "time", "platform", "source", "value")
      .as[(Long, Double, Double, Long, String, String, Double)]
      .collect().sortBy(_._1)
    assert(rows.length === total)
    assert(rows.map(_._1).toSeq === (0 until total).map(_.toLong))
    assert(rows(4) === ((4L, 2.0, -1.0, 1004L, "buoy", "edge-test", 6.0)))
    // absent fields (depth, device) surface as NULLs, not errors
    assert(df.where(col("depth").isNull).count() === total)
    assert(failures.containsKey("p7")) // the retry path actually ran
  }

  test("an interrupt during retry backoff exits under the IOException " +
    "contract with the interrupt flag restored") {
    server.createContext("/always503", (ex: HttpExchange) => {
      ex.sendResponseHeaders(503, -1)
      ex.close()
    })
    @volatile var thrown: Throwable = null
    @volatile var flagRestored = false
    val t = new Thread(() => {
      try EdgeSource.fetchPageWithRetry(base("/always503"), maxTries = 50)
      catch {
        case e: Throwable =>
          thrown = e
          flagRestored = Thread.currentThread().isInterrupted
      }
    })
    t.start()
    Thread.sleep(300) // let it land in a backoff sleep (100ms+ doubling)
    t.interrupt()
    t.join(5000)
    assert(!t.isAlive)
    // the documented contract: an IOException carrying the last
    // transport cause — never a bare InterruptedException. The
    // interrupt may land in the send window OR the backoff sleep;
    // both exits share the contract and name their window
    assert(thrown.isInstanceOf[java.io.IOException], s"got $thrown")
    assert(thrown.getMessage.contains("interrupted during"))
    assert(thrown.getCause != null &&
      thrown.getCause.getMessage.contains("HTTP 503"))
    assert(flagRestored)
  }

  test("function and DSv2 paths agree record-for-record on adversarial " +
    "payloads (single-parse converter, field-level NULL contract)") {
    import spark.implicits._
    // wrong-typed / fractional / missing / nested fields: the
    // type-checked extraction must NULL the bad FIELD (not fabricate
    // a coerced value), and both read paths must produce identical
    // rows because they now share one converter (r15)
    server.createContext("/weird", (ex: HttpExchange) => {
      val items = Seq(
        """{"id":1,"x":"not-a-number","y":-1.5,"time":1430000000.7,"platform":42,"value":3}""",
        """{"id":2,"x":2.5,"depth":{"nested":true},"source":null,"value":"9"}""",
        """{"id":3.5,"x":1,"y":2,"time":100,"platform":"p","value":1.25}"""
      )
      val body = (s"""{"totalResults":${items.size},"startIndex":0,""" +
        s""""itemsPerPage":${items.size},"results":[${items.mkString(",")}]}""")
        .getBytes(UTF_8)
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    val fn = EdgeSource.read(spark, base("/weird"))
      .orderBy(col("id").asc_nulls_last, col("value"))
      .collect().toSeq
    val dsv2 = spark.read.format("edge").option("url", base("/weird")).load()
      .orderBy(col("id").asc_nulls_last, col("value"))
      .collect().toSeq
    assert(fn === dsv2)
    assert(fn.length === 3)
    val r1 = fn.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get
    assert(r1.isNullAt(1), "string in a double field must be NULL")
    assert(r1.isNullAt(3), "fractional time must be NULL, not truncated")
    assert(r1.getString(5) === "42", "numeric in string field keeps raw text")
    val r3 = fn.find(_.isNullAt(0)).get // id 3.5 → NULL long
    assert(r3.getDouble(1) === 1.0, "integral JSON number fills a double")
  }

  test("zero-result query yields an empty frame with the full schema") {
    val df = EdgeSource.read(spark, base("/empty"))
    assert(df.count() === 0)
    assert(df.schema === EdgeSource.insituSchema)
  }

  test("format(\"edge\") reads through DataSourceV2 with predicate pushdown") {
    import spark.implicits._
    seenQueries.clear()
    val df = spark.read.format("edge")
      .option("url", base("/insitu"))
      .load()
      .where(col("time") >= 1005L && col("time") <= 1010L && col("y") >= -5.0)
    // pushed params are visible in the scan description (explain)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EdgeScan"), plan)
    assert(plan.contains("startTime=1005"), plan)
    assert(plan.contains("endTime=1010"), plan)
    assert(plan.contains("bbox=-180.0,-5.0,180.0,90.0"), plan)
    // the server ignores the filter params (worst case) — Spark's
    // residual evaluation must still produce the exact answer
    val ids = df.select("id").as[Long].collect().sorted
    assert(ids.toSeq === (5L to 10L))
    // ...and the HTTP requests actually carried the pushed params
    assert(seenQueries.asScala.exists(q =>
      q.contains("startTime=1005") && q.contains("endTime=1010") &&
        q.contains("bbox=")), seenQueries.asScala.mkString("\n"))
  }

  test("format(\"edge\") forwards user options with their original case") {
    seenQueries.clear()
    spark.read.format("edge").option("url", base("/insitu"))
      .option("platformFilter", "buoy") // camelCase must survive
      .option("itemsPerPage", "100")    // consumed knob: must NOT leak
      .load().count()
    val qs = seenQueries.asScala.toSeq
    assert(qs.exists(_.contains("platformFilter=buoy")), qs.mkString("\n"))
    assert(!qs.exists(_.contains("platformfilter")), qs.mkString("\n"))
    // the managed paging param appears exactly once per URL
    assert(qs.forall(q => q.split("&").count(_.startsWith("itemsPerPage=")) == 1),
      qs.mkString("\n"))
  }

  test("format(\"edge\") prunes columns and handles the empty endpoint") {
    import spark.implicits._
    val pruned = spark.read.format("edge").option("url", base("/insitu")).load()
      .select("id")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: id"), scan)
    assert(pruned.as[Long].collect().length === total)
    val empty = spark.read.format("edge").option("url", base("/empty")).load()
    assert(empty.count() === 0)
    assert(empty.schema === EdgeSource.insituSchema)
  }
}
