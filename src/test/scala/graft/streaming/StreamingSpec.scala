package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  case class Ev(ts: Timestamp, event_type: String, value: Double, id: Long)

  private def t(s: Long) = new Timestamp(s * 1000)

  test("windowedStats aggregates a stream into tumbling windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(t(10), "click", 1.0, 1), Ev(t(20), "click", 3.0, 2),
      Ev(t(3700), "click", 5.0, 3), Ev(t(30), "view", 7.0, 4))
    val q = StreamingIngest.windowedStats(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(unix_timestamp($"w_start").as("w"), $"event_type", $"cnt", $"avg_v")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows === Set(
        (0L, "click", 2L, 2.0),
        (3600L, "click", 1L, 5.0),
        (0L, "view", 1L, 7.0)))
    } finally q.stop()
  }

  test("session windows group activity bursts with a gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // two bursts for 'click' separated by > 5 min, one 'view' event
    mem.addData(
      Ev(t(0), "click", 1.0, 1), Ev(t(60), "click", 2.0, 2),
      Ev(t(1000), "click", 3.0, 3), Ev(t(30), "view", 4.0, 4))
    val q = StreamingIngest.sessionStats(mem.toDF(), "5 minutes", "10 minutes")
      .select(unix_timestamp($"w_start").as("start"), $"event_type", $"cnt")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .as[(Long, String, Long)].collect().toSet
      assert(rows === Set((0L, "click", 2L), (1000L, "click", 1L),
        (30L, "view", 1L)))
    } finally q.stop()
  }

  test("dedupedStream drops duplicate ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(t(10), "click", 1.0, 1), Ev(t(11), "click", 1.0, 1),
      Ev(t(12), "click", 2.0, 2))
    val q = StreamingIngest.dedupedStream(mem.toDF(), "id", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("filePipeline ingests a directory incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(dir)
    val src = spark.readStream.schema("id LONG, v STRING").parquet(dir)
    val q = StreamingIngest.filePipeline(src, out, ckpt).start()
    try q.awaitTermination(30000) finally if (q.isActive) q.stop()
    assert(spark.read.parquet(out).count() === 2)
  }
}
