package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake derived from the bytes; the
  * Spark-side plumbing — schema, batch shape, partition-local iteration,
  * metadata threading — is real and tested. Swap `decodeStub` for a
  * JNI/codec call (or route through mapInArrow to a Python worker) in a
  * real deployment; nothing else changes.
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap a text table into a media table (payload = utf8 bytes) —
    * the test stand-in for real image/audio payloads. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"))

  /** Decoded-feature schema produced by the (stubbed) decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature_hash", StringType)))

  /** Deterministic fake "decode": width/height from byte stats, feature
    * hash from content. Stands in for image decode + feature extraction.
    * Runs partition-local over an iterator — the exact batch shape a
    * real decoder (or an Arrow-batched Python worker) would use. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // ??? <- real codec call goes here; deterministic fake instead:
        val w = 16 + (if (bytes.isEmpty) 0 else (bytes.length % 64))
        val h = 16 + (if (bytes.isEmpty) 0 else (bytes.head & 0x3f))
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        Row(id, w, h, digest)
      }
    }
    spark.createDataFrame(out, decodedSchema)
  }

  /** Batched decode: the vectorized-codec shape. Payloads are grouped
    * into fixed-size batches WITHIN each partition and handed to the
    * codec as one call per batch — exactly how an Arrow-based Python
    * worker (mapInPandas/mapInArrow) or a JNI image library wants its
    * input. The stub codec processes a whole batch; swapping in a real
    * one changes only `codec`, not the plumbing.
    *
    * SCALE: batch size bounds peak memory per task (batchSize × payload
    * size); partitions stream batches, nothing accumulates. */
  def decodeBatched(
      media: DataFrame,
      batchSize: Int = 64,
      codec: Seq[(Long, Array[Byte])] => Seq[Row] = stubCodec): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
        .grouped(batchSize)
        .flatMap(batch => codec(batch))
    }
    spark.createDataFrame(out, decodedSchema)
  }

  /** Stub batch codec — same deterministic fake as decodeStub, but with
    * the one-call-per-batch signature a real vectorized decoder has. */
  def stubCodec(batch: Seq[(Long, Array[Byte])]): Seq[Row] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      // ??? <- real codec call (whole batch) goes here
      val w = 16 + (if (bytes.isEmpty) 0 else (bytes.length % 64))
      val h = 16 + (if (bytes.isEmpty) 0 else (bytes.head & 0x3f))
      digest.reset()
      val hex = digest.digest(bytes).map("%02x".format(_)).mkString
      Row(id, w, h, hex)
    }
  }

  /** Resize planning: aspect-preserving fit of decoded (width, height)
    * into a maxW×maxH box, never upscaling. All integer arithmetic
    * (permille scale factor, floor division) — deterministic and
    * engine-portable. The byte-level resample belongs in the batched
    * codec ([[decodeBatched]]'s `codec`) like decode itself; this op is
    * the dimension planning every resize stage needs first, as a pure
    * codegen'd projection — no shuffle, no UDF. */
  def resizeDims(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame =
    decoded.withColumn("scale_pm", expr(
      s"least(CAST(${maxW.toLong * 1000} AS BIGINT) DIV width, " +
        s"CAST(${maxH.toLong * 1000} AS BIGINT) DIV height, " +
        "CAST(1000 AS BIGINT))"))
      .withColumn("out_w", expr("(width * scale_pm) DIV 1000"))
      .withColumn("out_h", expr("(height * scale_pm) DIV 1000"))

  /** Frame sampling plan: every `step`-th frame index per media item,
    * exploded to one row per sampled frame with a deterministic feature
    * id. Pure Column expressions — the fan-out is a generator, no UDF. */
  def sampleFrames(media: DataFrame, nFramesCol: String, step: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0), col(nFramesCol).cast("long") - 1,
        lit(step.toLong))).as("frame_idx"))
      .withColumn("frame_key",
        md5(concat(col("media_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))))
}
