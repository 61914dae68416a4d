package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * IMAGE decode is REAL: [[imageIoCodec]] reads PNG/BMP/GIF/JPEG with
  * the JDK's built-in `javax.imageio` and reports true pixel
  * dimensions ([[encodePng]] generates genuine PNG fixtures to prove
  * the round trip). AUDIO/VIDEO decode stays STUBBED (no codecs in the
  * JDK) with a deterministic fake derived from the bytes; the
  * Spark-side plumbing — schema, batch shape, partition-local
  * iteration, metadata threading — is identical for both, so swapping
  * a stub for a JNI/codec call (or routing through mapInArrow to a
  * Python worker) changes only the codec function.
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

  // codec passes are the canonical compute-dense stage — see Par.widen
  private def widen(df: DataFrame): DataFrame = Par.widen(df)

  /** Deterministic fake "decode": width/height from byte stats, feature
    * hash from content. Stands in for image decode + feature extraction.
    * Runs partition-local over an iterator — the exact batch shape a
    * real decoder (or an Arrow-batched Python worker) would use. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = widen(media.select("media_id", "payload")).rdd.mapPartitions { it =>
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
    val out = widen(media.select("media_id", "payload")).rdd.mapPartitions { it =>
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

  /** Deterministic PNG fixture generator: one real PNG per row, sized
    * (wCol, hCol), pixels filled from a per-id linear pattern so the
    * bytes are reproducible. Partition-local (`mapPartitions`), encoded
    * with the JDK's built-in `javax.imageio` — this is test/bench
    * fixture machinery AND the proof that real payloads flow through
    * the same media schema as the stubs. */
  def encodePng(
      df: DataFrame, idCol: String, wCol: String, hCol: String): DataFrame = {
    val spark = df.sparkSession
    val out = widen(df.select(col(idCol).cast("long"),
      col(wCol).cast("int"), col(hCol).cast("int"))).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (id * 2654435761L + y.toLong * w + x).toInt & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        Row(id, bytes, "image/png", bytes.length.toLong)
      }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** REAL image decode (round-4 task 4): `javax.imageio` reads the PNG
    * (or BMP/GIF/JPEG — whatever the JDK's registered readers accept)
    * and reports true pixel dimensions; feature hash is the payload
    * md5. Same batch signature as [[stubCodec]] — callers swap codecs,
    * the plumbing (schema, batching, partition-local iteration) is
    * untouched. Audio/video stay on the stub: the JDK ships no codec
    * for them, and the point of the batched shape is that only this
    * function changes when one arrives. */
  def imageIoCodec(batch: Seq[(Long, Array[Byte])]): Seq[Row] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"media_id=$id: no registered reader for payload")
      digest.reset()
      val hex = digest.digest(bytes).map("%02x".format(_)).mkString
      Row(id, img.getWidth, img.getHeight, hex)
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
