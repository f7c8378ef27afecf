package graft.operators

import graft.SparkSpecBase
import java.security.MessageDigest

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decodeMeta produces size/dimension/fingerprint per payload") {
    val docs = Seq((1L, "hello world"), (2L, "x" * 1000)).toDF("doc_id", "text")
    val out = Multimodal.decodeMeta(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap

    val d = MessageDigest.getInstance("MD5").digest("hello world".getBytes("UTF-8"))
    val fp = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val r1 = out(1L)
    assert(r1.getLong(1) == 11L && r1.getLong(2) == 12L && r1.getLong(3) == 12L &&
      r1.getLong(4) == 3L && r1.getLong(5) == fp)
    val r2 = out(2L)
    assert(r2.getLong(1) == 1000L && r2.getLong(2) == 361L && r2.getLong(3) == 41L)
  }

  test("resize emits fixed-size pixel buffers") {
    val docs = Seq((1L, "abcdef"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.resize(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload", 4, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("pixels")).toMap
    assert(out(1L).length == 12 && out(2L).length == 12)
    assert(out(1L).take(6).toSeq == "abcdef".getBytes("UTF-8").toSeq) // cyclic resample
    assert(out(1L)(6) == 'a'.toByte)
  }

  test("sampleFrames explodes payloads into strided frame rows") {
    val docs = Seq((1L, "0123456789ab")).toDF("doc_id", "text") // 12 bytes = 6 frames of 2
    val out = Multimodal.sampleFrames(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload",
      frameBytes = 2, stride = 2)
      .collect().map(r => (r.getLong(1), new String(r.getAs[Array[Byte]]("frame"))))
    assert(out.sortBy(_._1).toSeq == Seq((0L, "01"), (2L, "45"), (4L, "89")))
  }

  test("null payloads are dropped, not NPE'd") {
    val docs = Seq((1L, Some("abc")), (2L, None)).toDF("doc_id", "text")
    val withP = Multimodal.withPayload(docs, "text", "payload")
    assert(Multimodal.decodeMeta(withP, "doc_id", "payload").count() == 1)
    assert(Multimodal.resize(withP, "doc_id", "payload", 2, 2).count() == 1)
    val frames = Multimodal.sampleFrames(withP, "doc_id", "payload", 1, 1)
    assert(frames.count() == 3 && frames.select("doc_id").distinct().count() == 1)
  }

  test("decodeMeta batch iteration covers every row exactly once") {
    val docs = spark.range(0, 999).toDF("doc_id")
      .selectExpr("doc_id", "repeat('a', CAST(doc_id % 50 AS INT)) AS text")
    val out = Multimodal.decodeMeta(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload", batchSize = 64)
    assert(out.count() == 999)
    assert(out.select("doc_id").distinct().count() == 999)
  }
  test("PNM payloads decode for REAL: header dims, pixels, nearest-neighbour resize") {
    // a 4x2 P6 RGB image: left half red, right half blue
    val header = "P6\n# test image\n4 2\n255\n".getBytes("US-ASCII")
    val px = Array(
      255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255,
      255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255).map(_.toByte)
    val img = header ++ px
    // direct decode
    val Some((w, h, c, pixels)) = Multimodal.decodePnm(img)
    assert(w == 4 && h == 2 && c == 3 && pixels.sameElements(px))
    // through the Spark pipeline: real dimensions (not the size stub)
    val df = Seq((1L, img), (2L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val metaRows = Multimodal.decodeMeta(df, "doc_id", "payload")
      .select("doc_id", "width", "height", "channels")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(metaRows(1L) == ((4L, 2L, 3L)))
    assert(metaRows(2L) == (("not an image".length % 640 + 1).toLong,
      ("not an image".length % 480 + 1).toLong, 3L)) // codec fallback
    // real 2x2 nearest-neighbour downsample: picks columns 0 and 2
    val rs = Multimodal.resize(df.filter($"doc_id" === 1L), "doc_id", "payload", 2, 2)
      .select("pixels").as[Array[Byte]].head()
    val expected = Array(255, 0, 0, 0, 0, 255, 255, 0, 0, 0, 0, 255).map(_.toByte)
    assert(rs.sameElements(expected))
  }
}
