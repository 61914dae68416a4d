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
  * the round trip); [[phashCodec]] derives perceptual fingerprints
  * from the decoded pixels. AUDIO decode is REAL too: [[wavCodec]]
  * parses RIFF/PCM WAV with `javax.sound.sampled`. VIDEO is real at
  * the container and frame level: [[aviVideoCodec]] walks a genuine
  * RIFF/AVI structure (chunk ids, little-endian sizes, even padding,
  * avih header) and decodes Motion-PNG '00dc' frames with
  * `javax.imageio`, producing frame-grain dHash / brightness / motion
  * rows; the JDK ships no INTER-frame codec (H.264 etc.), so that one
  * decode call is the documented seam an external codec would fill.
  * The Spark-side plumbing — schema, batch shape, partition-local
  * iteration, metadata threading — is identical for all modalities, so
  * swapping a codec (or routing through mapInArrow to a Python worker)
  * changes only the codec function.
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
    * hash from content. Runs partition-local over an iterator — the
    * exact batch shape a real decoder (or an Arrow-batched Python
    * worker) would use. DOCUMENTATION EXAMPLE ONLY since r14: no
    * catalog entry decodes through it anymore — every gated media entry
    * drives the REAL codecs ([[imageIoCodec]], [[phashCodec]], the
    * WAV/AVI walkers) through [[decodeBatched]]; this stub remains as
    * the minimal illustration of the codec seam (and its spec pins that
    * the batched plumbing reproduces it row-for-row). */
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
      codec: Seq[(Long, Array[Byte])] => Seq[Row] = stubCodec,
      schema: StructType = decodedSchema): DataFrame = {
    val spark = media.sparkSession
    val out = widen(media.select("media_id", "payload")).rdd.mapPartitions { it =>
      it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
        .grouped(batchSize)
        .flatMap(batch => codec(batch))
    }
    spark.createDataFrame(out, schema)
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
      df: DataFrame, idCol: String, wCol: String, hCol: String,
      seedCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val out = widen(df.select(col(idCol).cast("long"),
      col(wCol).cast("int"), col(hCol).cast("int"),
      col(seedCol.getOrElse(idCol)).cast("long"))).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
        val seed = r.getLong(3)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // bit-scrambled per-(seed,x,y) fill: the odd-constant multiply
        // decorrelates neighboring pixels, so derived fingerprints
        // (phashCodec) distribute uniformly instead of collapsing onto
        // a handful of gradient hashes; same `seedCol` => identical
        // image, the knob fixtures use to plant true duplicates
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((seed * 2654435761L +
              (y.toLong * w + x) * 2246822519L) & 0xffffff).toInt)
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
    * untouched. Audio has its own real path ([[wavCodec]]); video
    * stays on the stub — the JDK ships no codec for it, and the point
    * of the batched shape is that only this function changes when one
    * arrives. */
  def imageIoCodec(batch: Seq[(Long, Array[Byte])]): Seq[Row] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val reader = newPngReader()
    try batch.map { case (id, bytes) =>
      val img = decodeImage(reader, bytes)
      require(img != null, s"media_id=$id: no registered reader for payload")
      digest.reset()
      val hex = digest.digest(bytes).map("%02x".format(_)).mkString
      Row(id, img.getWidth, img.getHeight, hex)
    } finally reader.dispose()
  }

  /** Deterministic WAV fixture generator: one real RIFF/PCM-16 mono
    * payload per row, `nSamplesCol` samples at `sampleRate` Hz, sample
    * i = ((seed * 2654435761 + i * 2246822519) & 0xffff) - 32768 — the
    * same scrambled-integer pattern as [[encodePng]], so decoded audio
    * features are oracle-replayable. Encoded with the JDK's built-in
    * `javax.sound.sampled` (AudioSystem WAV writer) — like the PNG
    * fixtures, this is proof that REAL codec bytes flow through the
    * media schema, not a hand-rolled header. */
  def encodeWav(
      df: DataFrame, idCol: String, nSamplesCol: String,
      seedCol: Option[String] = None, sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    val out = widen(df.select(col(idCol).cast("long"),
      col(nSamplesCol).cast("int"),
      col(seedCol.getOrElse(idCol)).cast("long"))).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0); val n = r.getInt(1); val seed = r.getLong(2)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = (((seed * 2654435761L + i * 2246822519L) & 0xffff) - 32768L).toInt
          pcm(2 * i) = (s & 0xff).toByte          // little-endian PCM-16
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sampleRate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val bytes = bos.toByteArray
        Row(id, bytes, "audio/wav", bytes.length.toLong)
      }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Decoded-audio schema: typed metadata + exact integer signal stats. */
  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("peak", LongType),      // max |sample|
    StructField("sum_abs", LongType)))  // L1 mass (integer-exact "loudness")

  /** REAL audio decode — the `javax.sound.sampled` analog of
    * [[imageIoCodec]]: parse the WAV container, stream PCM-16 frames,
    * and report sample rate, frame count, peak and L1 amplitude. All
    * integer arithmetic, so the oracle replays the stats from the
    * fixture's sample pattern exactly. Same batch signature as the
    * other codecs (swap via [[decodeBatched]]-style plumbing); video
    * remains the one stubbed modality — the JDK ships no codec for it. */
  def wavCodec(batch: Seq[(Long, Array[Byte])]): Seq[Row] = {
    batch.map { case (id, bytes) =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      // encoding and byte order matter as much as width: a big-endian
      // or unsigned 16-bit stream would pass a width-only check and
      // silently mis-sign every sample below
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        !fmt.isBigEndian,
        s"media_id=$id: expected mono little-endian signed PCM-16, got $fmt")
      val data = ais.readAllBytes()
      val n = data.length / 2
      var peak = 0L; var sumAbs = 0L
      var i = 0
      while (i < n) {
        val lo = data(2 * i) & 0xff
        val hi = data(2 * i + 1).toInt // sign-extends
        val s = math.abs((hi << 8) | lo).toLong
        if (s > peak) peak = s
        sumAbs += s
        i += 1
      }
      Row(id, fmt.getSampleRate.toInt, n.toLong, peak, sumAbs)
    }
  }

  /** Parsed PCM WAV container: a real RIFF walk (chunk ids,
    * little-endian sizes, even padding — same discipline as
    * [[parseAvi]]), yielding the fmt fields plus the data chunk's
    * position so stats can run over the payload IN PLACE. */
  private[pipeline] final case class WavPcm(
      sampleRate: Int, bitsPerSample: Int, channels: Int,
      dataOff: Int, dataLen: Int)

  private[pipeline] def parseWav(bytes: Array[Byte]): WavPcm = {
    def id(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    require(bytes.length >= 12 && id(0) == "RIFF" && id(8) == "WAVE",
      s"not a RIFF/WAVE payload (${bytes.take(4).map(_.toChar).mkString})")
    var off = 12
    var fmtCode = -1; var ch = 0; var sr = 0; var bits = 0
    var dOff = -1; var dLen = 0
    while (off + 8 <= bytes.length) {
      val cid = id(off); val szL = u32(off + 4)
      // a corrupt/crafted u32 size must be bounds-checked in LONG
      // arithmetic: truncating to Int first can wrap `off + 8 + sz`
      // negative (size near 2^31), sneaking past the guard and turning
      // the intended diagnostic into an ArrayIndexOutOfBounds — fail
      // loudly like the container requires instead
      require(szL <= bytes.length.toLong - off - 8L,
        s"corrupt RIFF chunk '$cid' at $off: size=$szL of ${bytes.length}")
      val sz = szL.toInt
      if (cid == "fmt ") {
        require(sz >= 16, s"fmt chunk too short: $sz bytes (need >= 16)")
        fmtCode = u16(off + 8); ch = u16(off + 10)
        sr = u32(off + 12).toInt; bits = u16(off + 22)
      } else if (cid == "data") { dOff = off + 8; dLen = sz }
      off += 8 + sz + (sz % 2) // chunks are even-aligned
    }
    // same contract as wavCodec's format require: WAV PCM (format tag
    // 1) is little-endian and signed at 16 bits BY SPEC, so the three
    // checks below pin exactly what that require pins
    require(fmtCode == 1 && bits == 16 && ch == 1,
      s"expected mono PCM-16 (fmt=1), got fmt=$fmtCode bits=$bits ch=$ch")
    require(dOff >= 0 && dOff + dLen <= bytes.length,
      s"data chunk missing or truncated (off=$dOff len=$dLen of ${bytes.length})")
    WavPcm(sr, bits, ch, dOff, dLen)
  }

  /** The hot-path WAV codec: [[parseWav]]'s RIFF walk + stats over the
    * payload bytes in place. Output-identical to [[wavCodec]] (the
    * javax.sound reference path — a spec pins the equality on every
    * run), but skips what profiling showed dominating the sf10 decode
    * tier: `AudioSystem.getAudioInputStream` re-discovers a provider
    * PER PAYLOAD (each non-matching reader signals by throwing — two
    * exception constructions per call), then `readAllBytes` copies the
    * whole PCM body before the loop reads it. Same batch signature as
    * every other codec. */
  def wavRiffCodec(batch: Seq[(Long, Array[Byte])]): Seq[Row] = {
    batch.map { case (id, bytes) =>
      val w = parseWav(bytes)
      val n = w.dataLen / 2
      var peak = 0L; var sumAbs = 0L
      var i = w.dataOff
      val end = w.dataOff + 2 * n
      while (i < end) {
        val lo = bytes(i) & 0xff
        val hi = bytes(i + 1).toInt // sign-extends
        val s = math.abs((hi << 8) | lo).toLong
        if (s > peak) peak = s
        sumAbs += s
        i += 2
      }
      Row(id, w.sampleRate, n.toLong, peak, sumAbs)
    }
  }

  /** Batched WAV decode over a media table — [[decodeBatched]] with the
    * audio row shape, on the [[wavRiffCodec]] hot path ([[wavCodec]] is
    * the javax.sound reference implementation it is pinned against). */
  def decodeWavBatched(media: DataFrame, batchSize: Int = 64): DataFrame =
    decodeBatched(media, batchSize, wavRiffCodec, decodedAudioSchema)

  /** Perceptual difference-hash (dHash) codec: REAL pixel path — decode
    * with `javax.imageio`, box-average luma onto a 9x8 grid, then one
    * bit per horizontal neighbor comparison -> a 64-bit fingerprint
    * (hex, row-major, one byte per grid row). Near-identical images
    * (resizes, small edits, re-encodes) land within a few bits, so
    * image near-dup becomes the same banded equi-join + bounded-verify
    * shape as MinHash/SimHash text dedup — fingerprints are 8 bytes
    * however large the payload, and only fingerprints ever shuffle.
    * All-integer arithmetic (truncating division), so the oracle can
    * replay the grid math exactly from the fixture's pixel pattern.
    * Same batch signature as [[imageIoCodec]]; requires width>=9 and
    * height>=8 (one pixel per grid cell). */
  def phashCodec(batch: Seq[(Long, Array[Byte])]): Seq[Row] = {
    val reader = newPngReader()
    try batch.map { case (id, bytes) =>
      val img = decodeImage(reader, bytes)
      require(img != null, s"media_id=$id: no registered reader for payload")
      val w = img.getWidth; val h = img.getHeight
      require(w >= 9 && h >= 8, s"media_id=$id: $w x $h below 9x8 grid")
      Row(id, w, h, dHashHex(lumaGrid(rgbOf(img), w, h)))
    } finally reader.dispose()
  }

  /** Image near-dup candidate pairs from dHash fingerprints: band on
    * the first `bandHex` hex chars (exact-match prefix — any few-bit
    * global difference still collides on SOME band in a multi-band
    * setup; one band suffices for the fixture), then verify full
    * 64-bit Hamming distance <= maxHamming per candidate.
    * SCALE: the join is a fixed-width equi-join on the band key (never
    * all-pairs); Hamming runs only on band survivors, per-byte via
    * codegen'd conv/xor/bit_count columns — no UDF, no HOF. */
  def phashPairs(
      decoded: DataFrame, maxHamming: Int, bandHex: Int = 4): DataFrame = {
    // pin the fingerprints before the self-join: `decoded` is usually
    // the codec pass, and without this both join sides would re-run
    // the full decode lineage — the catalog's heaviest stage, twice.
    // The 64-bit hash is packed into TWO longs per DOC here (8 hex
    // chars each — fits a signed long; all 16 would not), so the
    // verify is 2 xor+bit_count per CANDIDATE PAIR instead of 16
    // conv(substring(...)) string ops, and the join shuffles fixed
    // 2x8-byte keys instead of 16-char strings.
    val fp = decoded.select(col("media_id"),
        conv(substring(col("feature_hash"), 1, 8), 16, 10)
          .cast("long").as("hi"),
        conv(substring(col("feature_hash"), 9, 8), 16, 10)
          .cast("long").as("lo"),
        substring(col("feature_hash"), 1, bandHex).as("band"))
      .localCheckpoint()
    val a = fp.select(col("media_id").as("doc_a"),
      col("hi").as("ha"), col("lo").as("la"), col("band"))
    val b = fp.select(col("media_id").as("doc_b"),
      col("hi").as("hb"), col("lo").as("lb"), col("band"))
    val ham = bit_count(col("ha").bitwiseXOR(col("hb"))) +
      bit_count(col("la").bitwiseXOR(col("lb")))
    a.join(b, Seq("band")).where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", ham.cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // --------------------------------------------------------------------
  // VIDEO — real container, real frame codec. The JDK ships no
  // inter-frame video codec (H.264 etc.), so the fixture codec is
  // Motion-PNG: a genuine RIFF/AVI container (fccHandler 'MPNG', a real
  // if niche codec id) whose '00dc' frame chunks are PNG payloads the
  // JDK CAN decode. The container walk, per-frame decode, frame
  // sampling, and motion scoring below are the real pipeline; an H.264
  // frame decoder would slot into [[aviVideoCodec]]'s decode call
  // through the same batched seam, changing nothing upstream.
  // --------------------------------------------------------------------

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def u32le(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Deterministic AVI fixture generator: one real RIFF/AVI per row with
    * `nFramesCol` Motion-PNG frames sized (wCol, hCol). Frame f's pixels
    * follow the [[encodePng]] scramble with per-frame seed
    * `seed * 1000003 + f`, so every decoded pixel — and everything
    * derived from it — is oracle-replayable. Rows where `staticCol` is
    * true freeze the seed across frames (a still-image video — motion
    * exactly 0), the planted negative for scene-cut detection. */
  def encodeAviPng(
      df: DataFrame, idCol: String, wCol: String, hCol: String,
      nFramesCol: String, seedCol: Option[String] = None,
      staticCol: Option[String] = None,
      fps: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val out = widen(df.select(col(idCol).cast("long"),
      col(wCol).cast("int"), col(hCol).cast("int"),
      col(nFramesCol).cast("int"),
      col(seedCol.getOrElse(idCol)).cast("long"),
      staticCol.map(col(_).cast("boolean")).getOrElse(lit(false))))
      .rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
        val nf = r.getInt(3); val seed = r.getLong(4)
        val still = r.getBoolean(5)
        val frames = (0 until nf).map { f =>
          val fs = if (still) seed else seed * 1000003L + f
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((fs * 2654435761L +
                (y.toLong * w + x) * 2246822519L) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val bytes = buildAvi(w, h, fps, frames)
        Row(id, bytes, "video/x-msvideo", bytes.length.toLong)
      }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Assemble a minimal standards-shaped AVI: RIFF('AVI ') containing
    * LIST(hdrl){avih, LIST(strl){strh vids/MPNG, strf BITMAPINFOHEADER}}
    * and LIST(movi){'00dc' <png> ...}, chunks padded to even offsets. */
  private[pipeline] def buildAvi(
      w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fourcc(id) ++ u32le(data.length.toLong) ++ data ++ pad
    }
    def list(kind: String, contents: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ u32le(contents.length + 4L) ++ fourcc(kind) ++ contents
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = // MainAVIHeader: 14 u32 fields
      u32le(1000000L / fps) ++ u32le(0L) ++ u32le(0L) ++ u32le(0x10L) ++
        u32le(frames.length.toLong) ++ u32le(0L) ++ u32le(1L) ++
        u32le(maxFrame.toLong) ++ u32le(w.toLong) ++ u32le(h.toLong) ++
        u32le(0L) ++ u32le(0L) ++ u32le(0L) ++ u32le(0L)
    val strh = // AVIStreamHeader for the single video stream
      fourcc("vids") ++ fourcc("MPNG") ++ u32le(0L) ++ u32le(0L) ++
        u32le(1L) ++ u32le(fps.toLong) ++ // dwScale=1, dwRate=fps
        u32le(0L) ++ u32le(frames.length.toLong) ++
        u32le(maxFrame.toLong) ++ u32le(0xffffffffL) ++ u32le(0L) ++
        Array(0, 0, (w & 0xff), (w >> 8) & 0xff).map(_.toByte) ++
        Array((h & 0xff), (h >> 8) & 0xff, 0, 0).map(_.toByte)
    val strf = // BITMAPINFOHEADER, biCompression = 'MPNG'
      u32le(40L) ++ u32le(w.toLong) ++ u32le(h.toLong) ++
        Array(1, 0, 24, 0).map(_.toByte) ++ fourcc("MPNG") ++
        u32le(w.toLong * h * 3) ++ u32le(0L) ++ u32le(0L) ++
        u32le(0L) ++ u32le(0L)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32le(body.length.toLong) ++ body
  }

  /** Parsed AVI: header dims/frame count plus the raw frame payloads —
    * a REAL RIFF walk (chunk ids, little-endian sizes, even padding),
    * not a stub. Rejects non-RIFF/non-AVI bytes loudly. */
  private[pipeline] final case class AviContent(
      width: Int, height: Int, totalFrames: Int, frames: Vector[Array[Byte]])

  private[pipeline] def parseAvi(bytes: Array[Byte]): AviContent = {
    def id(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    require(bytes.length >= 12 && id(0) == "RIFF" && id(8) == "AVI ",
      s"not a RIFF/AVI payload (${bytes.take(4).map(_.toChar).mkString})")
    var width = 0; var height = 0; var total = 0
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val cid = id(off); val szL = u32(off + 4)
        // Long-arithmetic bounds guard, same reasoning as parseWav's:
        // an Int-truncated size near 2^31 would wrap the bound check
        require(szL <= to.toLong - off - 8L,
          s"corrupt RIFF chunk '$cid' at $off: size=$szL of $to")
        val sz = szL.toInt
        if (cid == "LIST") walk(off + 12, off + 8 + sz)
        else if (cid == "avih") {
          require(sz >= 40, s"avih chunk too short: $sz bytes (need >= 40)")
          total = u32(off + 8 + 16).toInt
          width = u32(off + 8 + 32).toInt
          height = u32(off + 8 + 36).toInt
        } else if (cid == "00dc" || cid == "00db")
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
        off += 8 + sz + (sz % 2) // chunks are even-aligned
      }
    }
    walk(12, bytes.length)
    AviContent(width, height, total, frames.result())
  }

  /** Decoded-video schema: one row per SAMPLED frame, with the frame's
    * dHash, integer gray mass, and motion (Σ|gray−prev sampled frame|,
    * 0 for the first sample) — everything an ingest pipeline needs for
    * frame-grain dedup, brightness QA, and scene-change detection. */
  val decodedVideoSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("frame_idx", IntegerType),
    StructField("frame_hash", StringType),
    StructField("gray_sum", LongType),
    StructField("motion", LongType)))

  /** One bulk raster read — per-pixel `getRGB` pays a color-model
    * conversion PER CALL; the array form converts the frame once
    * (measured ~3x on the decode-heavy catalog entries). */
  private def rgbOf(img: java.awt.image.BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** Decode one image payload with a REUSED reader — `ImageIO.read`
    * re-discovers a reader through the registry per call, which
    * dominates wall time on many-small-frames workloads (video). The
    * reader is per-batch (codec calls are partition-local, no sharing);
    * non-PNG payloads fall back to the generic path. */
  private def decodeImage(
      reader: javax.imageio.ImageReader,
      bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val isPng = bytes.length > 4 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
    if (!isPng)
      return javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  private def newPngReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

  /** 8x9-grid luma pool of one frame — shared by [[phashCodec]] and the
    * video codec so image and video fingerprints are comparable. */
  private def lumaGrid(rgb: Array[Int], w: Int, h: Int): Array[Array[Long]] = {
    val g = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = rgb(y * w + x)
            s += (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)) / 3
            n += 1; x += 1
          }
          y += 1
        }
        g(gy)(gx) = s / n
        gx += 1
      }
      gy += 1
    }
    g
  }

  private def dHashHex(g: Array[Array[Long]]): String = {
    val sb = new java.lang.StringBuilder(16)
    var gy = 0
    while (gy < 8) {
      var b = 0
      var gx = 0
      while (gx < 8) {
        if (g(gy)(gx + 1) > g(gy)(gx)) b |= (1 << gx)
        gx += 1
      }
      sb.append(f"$b%02x")
      gy += 1
    }
    sb.toString
  }

  /** REAL video decode: RIFF/AVI container walk + per-frame PNG decode
    * (`javax.imageio`), sampling every `step`-th frame. Per sampled
    * frame: dHash over the 8x9 luma grid, exact integer gray mass, and
    * motion = Σ per-pixel |gray − previous SAMPLED frame's gray|
    * (truncating integer luma, so the oracle replays it exactly).
    * Same batch signature as the other codecs. */
  def aviVideoCodec(step: Int = 1)(batch: Seq[(Long, Array[Byte])]): Seq[Row] = {
    val reader = newPngReader()
    try batch.flatMap { case (id, bytes) =>
      val avi = parseAvi(bytes)
      require(avi.frames.length == avi.totalFrames,
        s"media_id=$id: avih says ${avi.totalFrames} frames, " +
          s"movi has ${avi.frames.length}")
      var prev: Array[Int] = null
      (avi.frames.indices by step).map { f =>
        val img = decodeImage(reader, avi.frames(f))
        require(img != null, s"media_id=$id frame $f: undecodable payload")
        require(img.getWidth == avi.width && img.getHeight == avi.height,
          s"media_id=$id frame $f: ${img.getWidth}x${img.getHeight} " +
            s"!= header ${avi.width}x${avi.height}")
        val w = img.getWidth; val h = img.getHeight
        val rgb = rgbOf(img)
        val gray = new Array[Int](w * h)
        var graySum = 0L; var motion = 0L
        var i = 0
        while (i < rgb.length) {
          val p = rgb(i)
          val gv = (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)) / 3
          gray(i) = gv
          graySum += gv
          if (prev != null) motion += math.abs(gv - prev(i))
          i += 1
        }
        prev = gray
        Row(id, w, h, avi.totalFrames, f, dHashHex(lumaGrid(rgb, w, h)),
          graySum, motion)
      }
    } finally reader.dispose()
  }

  /** Batched AVI decode over a media table. */
  def decodeAviBatched(
      media: DataFrame, step: Int = 1, batchSize: Int = 16): DataFrame =
    decodeBatched(media, batchSize, aviVideoCodec(step), decodedVideoSchema)

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
