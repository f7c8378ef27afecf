package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: payloads are opaque
  * `binary` columns with typed metadata extracted by a batched
  * per-partition decode pass.
  *
  * The decode itself is STUBBED — this container has no codec libraries —
  * with a deterministic fake keyed on the payload bytes (md5 prefix +
  * size-derived dimensions). Everything around it is the real pipeline
  * shape: binary column in, `mapPartitions` streaming fixed-size batches
  * (the JVM analogue of `mapInPandas` batch iteration — a real decoder
  * would hand each batch to a native lib in one call), typed struct
  * schema out, no driver involvement, arbitrary-scale parallelism.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("size", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("channels", LongType),
    StructField("fp", LongType)))

  /** STUB decode: a real implementation would parse the image header /
    * decode frames here. Deterministic fake: dimensions from the payload
    * size, fingerprint = first 32 bits of md5 (matches the SQL oracle's
    * `('0x' || substr(md5(payload), 1, 8))::BIGINT`). */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val fp = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (bytes.length % 640 + 1, bytes.length % 480 + 1, 3L, fp)
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

  /** STUB resize: a real implementation decodes, resamples to
    * `targetW`×`targetH`, re-encodes. Deterministic fake: "pixels" are the
    * payload bytes cyclically resampled to targetW*targetH bytes — the
    * output schema/size contract of a real resizer. */
  def resize(docs: DataFrame, idCol: String, payloadCol: String,
             targetW: Int, targetH: Int, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val n = targetW * targetH
    val rows = nonNull(docs, idCol, payloadCol).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val out = Array.tabulate[Byte](n)(i =>
              if (bytes.isEmpty) 0 else bytes(i % bytes.length))
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
