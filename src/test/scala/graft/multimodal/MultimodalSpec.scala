package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq((1L, "hello world payload"), (2L, "tiny"), (3L, ""))
      .toDF("id", "body")
  }

  test("asMediaTable produces binary payload + typed metadata") {
    val m = Multimodal.asMediaTable(media, "id", "body", "text/plain")
    val r = m.where(col("media_id") === 1L).collect()(0)
    assert(r.getAs[Array[Byte]]("payload").length === 19)
    assert(r.getStruct(r.fieldIndex("meta")).getAs[String]("mime") === "text/plain")
  }

  test("stubDecodeFeatures emits deterministic fixed-dim features") {
    import spark.implicits._
    val ds = Multimodal.asMediaTable(media, "id", "body", "text/plain")
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.stubDecodeFeatures(ds).collect().sortBy(_.media_id)
    val f2 = Multimodal.stubDecodeFeatures(ds).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 8))
    assert(f1(0).n_bytes === 19)
    assert(f1(2).n_bytes === 0)
  }

  test("stubResize keeps every k-th byte and preserves metadata") {
    import spark.implicits._
    val ds = Multimodal.asMediaTable(media, "id", "body", "text/plain")
      .as[Multimodal.MediaRow]
    val r = Multimodal.stubResize(ds, factor = 4).collect()
      .map(m => m.media_id -> m).toMap
    // "hello world payload" → indices 0,4,8,12,16 → "horpo"
    assert(new String(r(1L).payload, "UTF-8") === "horpo")
    assert(new String(r(2L).payload, "UTF-8") === "t")
    assert(r(3L).payload.length === 0)
    assert(r(1L).meta.mime === "text/plain")
  }

  test("segmentPayload splits payloads into fixed-size segments") {
    val segs = Multimodal.segmentPayload(
      Multimodal.asMediaTable(media, "id", "body", "text/plain"), segBytes = 8)
    val byId = segs.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === 3L) // 19 bytes → 8+8+3
    assert(byId(2L) === 1L)
    assert(byId.getOrElse(3L, 0L) === 0L) // empty payload → no segments
    val seg2 = segs.where(col("media_id") === 1L && col("seg_idx") === 2)
      .select(octet_length(col("seg_bytes"))).collect()(0).getInt(0)
    assert(seg2 === 3)
  }
}
