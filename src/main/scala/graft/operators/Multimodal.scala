package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: payloads are opaque
  * `binary` columns with typed metadata extracted by a batched
  * per-partition decode pass.
  *
  * Decode is REAL for the binary netpbm formats (P5 grayscale / P6 RGB —
  * header + raw pixel bytes, no codec library needed): header parse,
  * pixel extraction, and nearest-neighbour resampling are actual image
  * math. Codec formats (JPEG/PNG/video) fall back to a deterministic
  * STUB (this container has no codec libraries) keyed on the payload
  * bytes. Either way the pipeline shape is the production one: binary
  * column in, `mapPartitions` streaming fixed-size batches (the JVM
  * analogue of `mapInPandas` batch iteration — a native decoder takes
  * each batch in one call), typed struct schema out, no driver
  * involvement, arbitrary-scale parallelism.
  */
object Multimodal {

  /** REAL decode of binary netpbm: "P5" (1 channel) / "P6" (3 channels),
    * whitespace/#-comment tolerant header, maxval ≤ 255, raw pixels.
    * Returns (width, height, channels, row-major pixel bytes); None if
    * the payload is not a well-formed binary PNM. */
  def decodePnm(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes.length < 2 || bytes(0) != 'P') return None
    val ch = bytes(1) match { case '5' => 1; case '6' => 3; case _ => return None }
    var pos = 2
    def skipWs(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val b = bytes(pos)
        if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0; var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = int(); val h = int(); val maxv = int()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    pos += 1 // exactly one whitespace byte separates maxval from pixels
    val n = w.toLong * h * ch
    if (n > Int.MaxValue || bytes.length - pos < n) return None
    Some((w, h, ch, java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)))
  }

  /** REAL nearest-neighbour resample of a decoded pixel matrix. */
  def resamplePixels(px: Array[Byte], w: Int, h: Int, ch: Int,
                     tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * ch)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * w / tw).toInt
        var c = 0
        while (c < ch) {
          out((y * tw + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("size", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("channels", LongType),
    StructField("fp", LongType)))

  /** Dimension extraction: REAL for binary PNM payloads, deterministic
    * STUB for codec formats (dimensions from the payload size; the
    * fingerprint is always the first 32 bits of md5, matching the SQL
    * oracle's `('0x' || substr(md5(payload), 1, 8))::BIGINT`). */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val fp = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    decodePnm(bytes) match {
      case Some((w, h, c, _)) => (w.toLong, h.toLong, c.toLong, fp)
      case None => (bytes.length % 640 + 1, bytes.length % 480 + 1, 3L, fp)
    }
  }

  /** Attach a binary payload column derived from text (stand-in for real
    * media bytes loaded from a blob store). */
  def withPayload(docs: DataFrame, textCol: String, payloadCol: String): DataFrame =
    docs.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /** Rows with a NULL payload carry nothing to decode — drop them before
    * the batch pass (a null would NPE inside the per-batch dereference). */
  private def nonNull(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .filter(col(payloadCol).isNotNull)

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("pixels", BinaryType)))

  /** Resize to `targetW`×`targetH`: REAL nearest-neighbour resampling for
    * PNM payloads (output = targetW*targetH*channels pixel bytes); codec
    * formats keep the deterministic stand-in ("pixels" = payload bytes
    * cyclically resampled to targetW*targetH — the schema/size contract
    * of a real resizer, minus the codec this container lacks). */
  def resize(docs: DataFrame, idCol: String, payloadCol: String,
             targetW: Int, targetH: Int, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val n = targetW * targetH
    val rows = nonNull(docs, idCol, payloadCol).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val out = decodePnm(bytes) match {
              case Some((w, h, c, px)) => resamplePixels(px, w, h, c, targetW, targetH)
              case None => Array.tabulate[Byte](n)(i =>
                if (bytes.isEmpty) 0 else bytes(i % bytes.length))
            }
            Row(r.getLong(0), targetW.toLong, targetH.toLong, out)
          }
        }
      }
    spark.createDataFrame(rows, resizedSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame", BinaryType)))

  /** STUB frame sampling: treat the payload as a "video" of fixed-size
    * frames and emit every `stride`-th frame — the row-explosion shape
    * (1 payload → N frame rows) of a real video sampler, one output row
    * per sampled frame, batch iteration preserved. */
  def sampleFrames(docs: DataFrame, idCol: String, payloadCol: String,
                   frameBytes: Int, stride: Int, batchSize: Int = 64): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val spark = docs.sparkSession
    val rows = nonNull(docs, idCol, payloadCol).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val nFrames = bytes.length / frameBytes
            (0 until nFrames by stride).iterator.map { f =>
              Row(id, f.toLong, bytes.slice(f * frameBytes, (f + 1) * frameBytes))
            }
          }
        }
      }
    spark.createDataFrame(rows, frameSchema)
  }

  /** Batched metadata extraction over the payload column. */
  def decodeMeta(docs: DataFrame, idCol: String, payloadCol: String,
                 batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val rows = nonNull(docs, idCol, payloadCol).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "batch" = one native-decoder invocation in a real pipeline
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val (w, h, c, fp) = decodeStub(bytes)
            Row(id, bytes.length.toLong, w, h, c, fp)
          }
        }
      }
    spark.createDataFrame(rows, metaSchema)
  }
}
