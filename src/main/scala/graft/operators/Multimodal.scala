package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque BINARY with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Spark-side plumbing is real — schema, batched partition processing,
  * partitioning behavior, output schema — while the codec itself is a
  * deterministic STUB (this environment ships no image/audio libraries):
  * `FakeCodec` derives "pixels" from the binary content arithmetically, so
  * tests pin exact values and an external oracle can reproduce them. Swap
  * `FakeCodec` for a real decoder (JNI/javax.imageio/ffmpeg) without touching
  * any plumbing: the operator contract is Iterator[batch of rows] →
  * Iterator[batch of rows], the JVM analog of a vectorized mapInPandas.
  */
object Multimodal {

  /** Media-table schema: opaque content + typed metadata, the layout a
    * 100 TB multimodal lake uses (content in parquet binary or pointers to
    * object storage; metadata columns prunable without touching bytes).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),      // images/video
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true), // audio
    StructField("duration_ms", LongType, nullable = true),    // audio/video
    StructField("fps", DoubleType, nullable = true)))         // video

  /** Mean/min/max/entropy features over 0..255 sample values — codec-agnostic
    * (the same stats whether samples are real pixel luminances or the fake
    * codec's per-byte values).
    */
  def featuresOf(s: Array[Int]): (Double, Int, Int, Double) =
    if (s.isEmpty) (0.0, 0, 0, 0.0)
    else {
      val hist = new Array[Long](256)
      var sum = 0L; var mn = 255; var mx = 0
      s.foreach { v =>
        sum += v; hist(v) += 1
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      val n = s.length.toDouble
      var ent = 0.0
      hist.foreach { c =>
        if (c > 0) { val p = c / n; ent -= p * math.log(p) / math.log(2) }
      }
      (sum / n, mn, mx, ent)
    }

  /** Real image decode via `javax.imageio` (ships in the JDK — no extra
    * dependency): PNG/JPEG/BMP/GIF payloads decode to per-pixel luminance
    * samples ((r+g+b)/3, 0..255, row-major). Returns None for payloads that
    * are not real images (no recognized magic, or ImageIO can't parse them)
    * so the caller falls back to [[FakeCodec]] — the synthetic md5-derived
    * blobs in the oracle-checked queries take that path, keeping m01–m04
    * byte-stable (a random 32-byte blob matching a magic still fails the
    * parse and falls back).
    */
  object ImageIOCodec {
    def looksLikeImage(content: Array[Byte]): Boolean =
      (content.length >= 8 &&
        content(0) == 0x89.toByte && content(1) == 'P' && content(2) == 'N' &&
        content(3) == 'G') ||
      (content.length >= 3 &&
        content(0) == 0xff.toByte && content(1) == 0xd8.toByte &&
        content(2) == 0xff.toByte) ||
      (content.length >= 2 && content(0) == 'B' && content(1) == 'M') ||
      (content.length >= 6 && content(0) == 'G' && content(1) == 'I' &&
        content(2) == 'F' && content(3) == '8')

    def samples(content: Array[Byte]): Option[Array[Int]] =
      if (!looksLikeImage(content)) None
      else try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))).map { img =>
          val w = img.getWidth; val h = img.getHeight
          val out = new Array[Int](w * h)
          var i = 0; var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              i += 1; x += 1
            }
            y += 1
          }
          out
        }
      } catch { case _: java.io.IOException => None }
  }

  /** ======================== STUB (clearly marked) ========================
    * Deterministic fake codec: stands in for media decoding when the payload
    * is not a real decodable image (the synthetic test blobs) or is
    * audio/video (no decoder in this environment). Derives per-byte
    * "samples" directly from the binary payload. Everything downstream is
    * codec-agnostic.
    */
  object FakeCodec {
    /** "Decode" bytes to unsigned sample values 0..255. */
    def samples(content: Array[Byte]): Array[Int] = content.map(_ & 0xff)

    /** Mean/min/max/entropy-ish features over the fake samples. */
    def features(content: Array[Byte]): (Double, Int, Int, Double) =
      featuresOf(samples(content))
  }
  /* ====================== end STUB ====================== */

  /** Decode dispatch: real ImageIO pixels for genuine image payloads,
    * FakeCodec byte-samples otherwise.
    */
  def decodeSamples(kind: String, content: Array[Byte]): Array[Int] =
    if (kind == "image") ImageIOCodec.samples(content).getOrElse(FakeCodec.samples(content))
    else FakeCodec.samples(content)

  /** Decoded-feature output schema (what a real decoder would also emit).
    * `n_samples` is the decoded sample count — pixels for a real image
    * decode (width × height, independent of the compressed payload size),
    * payload bytes for the fake codec.
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("mean_value", DoubleType, nullable = false),
    StructField("min_value", IntegerType, nullable = false),
    StructField("max_value", IntegerType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))

  /** Batched decode + feature extraction: mapPartitions processing rows in
    * fixed-size batches — the JVM analog of `mapInPandas` record batches
    * (amortizes per-batch codec setup; keeps peak memory to batchSize
    * payloads per task). Embarrassingly parallel: no shuffle, scales with
    * input splits; repartition upstream to spread decode cost if the source
    * files are few.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(featureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would go here (decoder init, buffers)
        batch.iterator.map { r =>
          val content = r.getAs[Array[Byte]](contentIdx)
          val kind = r.getString(kindIdx)
          val samples = decodeSamples(kind, content)
          val (mean, mn, mx, ent) = featuresOf(samples)
          Row(r.getLong(idIdx), kind, content.length.toLong,
            samples.length.toLong, mean, mn, mx, ent)
        }
      }
    }(enc)
  }

  /** Deterministic REAL-PNG fixture generator: one genuine PNG per input
    * row, gray gradient pixel(x, y) = (x + y + media_id) mod 256, encoded
    * with the JDK's ImageIO PNG writer. The payload starts with the PNG
    * magic and parses, so a downstream [[decodeFeatures]] MUST take the
    * real [[ImageIOCodec]] branch — and because the pixel function is
    * closed-form, an oracle can compute the decoded stats without any
    * decoder (query m07 pins the full encode → decode → feature path
    * against plain DuckDB arithmetic; only the compressed byte size is
    * encoder-dependent and is excluded there).
    *
    * Input: (media_id: long, width: int, height: int). Runs per-row in
    * mapPartitions — no shuffle, scales with input splits like the decode
    * pass itself.
    */
  def synthesizePng(dims: DataFrame): DataFrame = synthesizeImage(dims, "png")

  /** [[synthesizePng]] generalized over the JDK's offline writers
    * (png/bmp/gif — all lossless for this ≤256-gray gradient: PNG and BMP
    * are exact RGB, GIF's 256-entry palette holds every gray the pattern
    * produces; exactness is spec-pinned per format).
    */
  def synthesizeImage(dims: DataFrame, format: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val enc = Encoders.row(schema)
    val idIdx = dims.schema.fieldIndex("media_id")
    val wIdx = dims.schema.fieldIndex("width")
    val hIdx = dims.schema.fieldIndex("height")
    dims.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        val w = r.getInt(wIdx)
        val h = r.getInt(hIdx)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((x + y + mid) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, format, bos),
          s"no JDK ImageIO writer for format '$format'")
        Row(mid, "image", bos.toByteArray, w, h)
      }
    }(enc)
  }

  /** Deterministic synthetic WAV payloads: a canonical 44-byte RIFF/WAVE
    * header plus 8-bit PCM data, every field a closed-form function of
    * media_id (sample rate 8000+(id%4)·4000, channels 1+(id%2), frames
    * 64+(id%16)·16, data byte j = (7j+id) mod 256) — so a SQL oracle can
    * recompute what a correct encode→parse round trip must report without
    * ever touching bytes. The audio analog of [[synthesizeImage]].
    */
  def synthesizeWav(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    val idIdx = ids.schema.fieldIndex("media_id")
    ids.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        val sampleRate = (8000 + (mid % 4) * 4000).toInt
        val channels = (1 + (mid % 2)).toInt
        val frames = (64 + (mid % 16) * 16).toInt
        val blockAlign = channels // 8-bit PCM: 1 byte per sample
        val dataLen = frames * blockAlign
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1.toShort) // PCM
          .putShort(channels.toShort).putInt(sampleRate)
          .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
          .putShort(8.toShort)
        bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
        var j = 0
        while (j < dataLen) {
          bb.put(((7L * j + mid) % 256).toByte)
          j += 1
        }
        Row(mid, "audio", bb.array())
      }
    }(enc)
  }

  /** RIFF/WAVE header parser — a REAL chunk-walking binary parser (verifies
    * the RIFF/WAVE magics, then scans chunks by id+size, tolerating any
    * chunk order and unknown chunks) over the opaque content column. Emits
    * the fmt fields, the data-chunk length and its byte sum (proof the
    * payload round-tripped, not just the header), and the derived duration.
    * Runs as batched partition processing like [[decodeFeatures]]; malformed
    * payloads yield null fields rather than failing the scan (the 100 TB
    * posture: a corrupt object must not kill the job).
    */
  def parseWavHeader(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fmt", LongType, nullable = true),
      StructField("n_channels", LongType, nullable = true),
      StructField("sample_rate", LongType, nullable = true),
      StructField("byte_rate", LongType, nullable = true),
      StructField("block_align", LongType, nullable = true),
      StructField("bits_per_sample", LongType, nullable = true),
      StructField("data_len", LongType, nullable = true),
      StructField("data_sum", LongType, nullable = true),
      StructField("duration_us", LongType, nullable = true)))
    val enc = Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val cIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](cIdx)
        parseWav(bytes) match {
          case Some(w) =>
            Row(mid, w.fmt, w.channels, w.sampleRate, w.byteRate,
              w.blockAlign, w.bits, w.dataLen, w.dataSum,
              if (w.byteRate > 0) w.dataLen * 1000000L / w.byteRate else null)
          case None =>
            Row(mid, null, null, null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  private final case class WavInfo(fmt: Long, channels: Long,
      sampleRate: Long, byteRate: Long, blockAlign: Long, bits: Long,
      dataLen: Long, dataSum: Long, peak: Long, sumSq: Long)

  private def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var off = 12
    var fmtOpt: Option[(Long, Long, Long, Long, Long, Long)] = None
    var dataOpt: Option[(Long, Long, Long, Long)] = None
    while (off + 8 <= bytes.length) {
      val id = tag4(off)
      val size = bb.getInt(off + 4).toLong & 0xffffffffL
      val body = off + 8
      if (id == "fmt " && size >= 16 && body + 16 <= bytes.length) {
        fmtOpt = Some((
          (bb.getShort(body).toLong & 0xffff),
          (bb.getShort(body + 2).toLong & 0xffff),
          bb.getInt(body + 4).toLong & 0xffffffffL,
          bb.getInt(body + 8).toLong & 0xffffffffL,
          (bb.getShort(body + 12).toLong & 0xffff),
          (bb.getShort(body + 14).toLong & 0xffff)))
      } else if (id == "data" && body + size <= bytes.length) {
        // one pass computes the byte sum (round-trip proof), the peak
        // deviation from the 8-bit PCM midpoint, and the squared-deviation
        // sum (the RMS loudness numerator) — all exact integers
        var sum = 0L
        var peak = 0L
        var sumSq = 0L
        var j = 0
        while (j < size) {
          val v = bytes(body + j).toLong & 0xff
          sum += v
          val dev = v - 128L
          val ad = math.abs(dev)
          if (ad > peak) peak = ad
          sumSq += dev * dev
          j += 1
        }
        dataOpt = Some((size, sum, peak, sumSq))
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off = body + size.toInt + (size.toInt & 1)
    }
    for ((f, ch, sr, br, ba, bits) <- fmtOpt; (dl, ds, pk, sq) <- dataOpt)
      yield WavInfo(f, ch, sr, br, ba, bits, dl, ds, pk, sq)
  }

  /** Per-clip loudness statistics off the same RIFF walk as
    * [[parseWavHeader]]: sample count, peak deviation from the 8-bit PCM
    * midpoint, and the exact integer squared-deviation sum — the inputs of
    * the normalize-gain step an audio pipeline runs before transcription
    * (RMS/peak themselves derive from these two integers; the float math
    * lives in the caller so the parser stays integer-exact end to end).
    * Malformed payloads yield null fields, like every codec-seam parser.
    */
  def wavLoudness(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("peak", LongType, nullable = true),
      StructField("sum_sq", LongType, nullable = true)))
    val enc = Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val cIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        parseWav(r.getAs[Array[Byte]](cIdx)) match {
          case Some(w) => Row(mid, w.dataLen, w.peak, w.sumSq)
          case None => Row(mid, null, null, null)
        }
      }
    }(enc)
  }

  /** PNG container chunk-walker — the image-side sibling of
    * [[parseWavHeader]]: verify the 8-byte PNG signature, then walk the
    * chunk stream ([len:4 BE][type:4][data][crc:4 BE]), tolerating unknown
    * chunks and any chunk order after IHDR. Emits the IHDR geometry and
    * encoding fields, whether the IHDR CRC-32 validates (computed over
    * type+data per the PNG spec, via `java.util.zip.CRC32`), and whether an
    * IEND terminator was reached. Container-level only — no inflate, no
    * pixel decode (that is m07's seam) — which is exactly the cheap
    * pre-decode triage a 100 TB media pipeline runs first: reject
    * truncated/corrupt objects and read geometry without paying for
    * decompression. Malformed payloads yield null fields, never a thrown
    * error (a corrupt object must not kill the scan).
    */
  def parsePngContainer(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sig_ok", BooleanType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("bit_depth", LongType, nullable = true),
      StructField("color_type", LongType, nullable = true),
      StructField("compression", LongType, nullable = true),
      StructField("filter_method", LongType, nullable = true),
      StructField("interlace", LongType, nullable = true),
      StructField("ihdr_crc_ok", BooleanType, nullable = true),
      StructField("has_iend", BooleanType, nullable = false)))
    val enc = Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val cIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val mid = r.getLong(idIdx)
        val b = r.getAs[Array[Byte]](cIdx)
        val sigOk = b.length >= 8 &&
          (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
          b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a
        if (!sigOk) {
          Row(mid, false, null, null, null, null, null, null, null, null, false)
        } else {
          val bb = java.nio.ByteBuffer.wrap(b) // PNG is big-endian
          var off = 8
          var width: java.lang.Long = null
          var height: java.lang.Long = null
          var depth: java.lang.Long = null
          var colorType: java.lang.Long = null
          var compression: java.lang.Long = null
          var filterMethod: java.lang.Long = null
          var interlace: java.lang.Long = null
          var crcOk: java.lang.Boolean = null
          var hasIend = false
          var halt = false
          while (!halt && !hasIend && off + 8 <= b.length) {
            val len = bb.getInt(off)
            if (len < 0 || off.toLong + 12 + len > b.length) halt = true
            else {
              val typ = new String(b, off + 4, 4, "US-ASCII")
              if (typ == "IHDR" && len == 13) {
                width = bb.getInt(off + 8).toLong & 0xffffffffL
                height = bb.getInt(off + 12).toLong & 0xffffffffL
                depth = (b(off + 16) & 0xff).toLong
                colorType = (b(off + 17) & 0xff).toLong
                compression = (b(off + 18) & 0xff).toLong
                filterMethod = (b(off + 19) & 0xff).toLong
                interlace = (b(off + 20) & 0xff).toLong
                val crc = new java.util.zip.CRC32()
                crc.update(b, off + 4, 4 + len)
                crcOk = java.lang.Boolean.valueOf(
                  crc.getValue == (bb.getInt(off + 8 + len).toLong & 0xffffffffL))
              } else if (typ == "IEND") {
                hasIend = true
              }
              off += 12 + len
            }
          }
          Row(mid, true, width, height, depth, colorType, compression,
            filterMethod, interlace, crcOk, hasIend)
        }
      }
    }(enc)
  }

  /** Aspect-preserving resize metadata: fit (width, height) into a
    * maxDim bounding box, never upscaling — pure column expressions, no
    * decode needed (the real resize kernel would run in the decode pass).
    */
  def resizedDims(width: org.apache.spark.sql.Column,
                  height: org.apache.spark.sql.Column, maxDim: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(width.cast("double"), height.cast("double")))
    (floor(width * scale).cast("int"), floor(height * scale).cast("int"))
  }

  /** Perceptual difference-hash (dHash) over REAL decoded pixels: decode
    * each image payload, block-average the pixel grid down to 9×8 (block
    * of pixel (x,y) is ((x·9) div w, (y·8) div h) — a ±1-sized integer
    * partition both an oracle and any other engine reproduce exactly),
    * then emit one bit per horizontally adjacent block pair — 1 iff the
    * left block mean exceeds the right, compared as cross-multiplied
    * integer sums (sumL·nR > sumR·nL) so no float ever enters the hash.
    * Output is the 64-bit hash as 16 hex chars (two 32-bit halves to
    * dodge BIGINT sign issues in engines without unsigned formatting)
    * plus the hash popcount.
    *
    * The image near-duplicate primitive: Hamming distance between dHashes
    * survives re-encode, resize and small luma shifts, which exact byte
    * hashing (m05) does not. Requires w ≥ 9 and h ≥ 8.
    *
    * Scale shape: mapPartitions decode + per-image O(w·h) fold —
    * embarrassingly parallel, no shuffle, like [[decodeFeatures]].
    */
  def dHash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("dhash", StringType, nullable = false),
      StructField("n_ones", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    val wIdx = media.schema.fieldIndex("width")
    val hIdx = media.schema.fieldIndex("height")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val w = r.getInt(wIdx)
          val h = r.getInt(hIdx)
          require(w >= 9 && h >= 8, s"dHash needs w>=9, h>=8; got ${w}x$h")
          val samples = decodeSamples(r.getString(kindIdx),
            r.getAs[Array[Byte]](contentIdx))
          require(samples.length == w * h,
            s"decoded ${samples.length} px, expected ${w * h}")
          val sums = Array.ofDim[Long](8, 9)
          val cnts = Array.ofDim[Long](8, 9)
          var i = 0
          while (i < samples.length) {
            val x = i % w
            val y = i / w
            sums(y * 8 / h)(x * 9 / w) += samples(i)
            cnts(y * 8 / h)(x * 9 / w) += 1
            i += 1
          }
          var hi = 0
          var lo = 0
          var idx = 0
          var rr = 0
          while (rr < 8) {
            var c = 0
            while (c < 8) {
              val bit =
                if (sums(rr)(c) * cnts(rr)(c + 1) > sums(rr)(c + 1) * cnts(rr)(c)) 1
                else 0
              if (idx < 32) hi = (hi << 1) | bit else lo = (lo << 1) | bit
              idx += 1
              c += 1
            }
            rr += 1
          }
          val bits = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
          Row(r.getLong(idIdx), w, h, f"$hi%08x$lo%08x",
            java.lang.Long.bitCount(bits).toLong)
        }
      }
    }(enc)
  }

  /** Frame sampling for video rows: every `everyMs` milliseconds over
    * duration, as (media_id, frame_idx, ts_ms) — sequence + explode, fully
    * codegen'd, one output row per sampled frame.
    */
  def sampleFrames(video: DataFrame, everyMs: Long): DataFrame =
    video
      .filter(col("kind") === "video" && col("duration_ms").isNotNull && col("fps").isNotNull)
      .select(col("media_id"), col("fps"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("ts_ms"))
      .select(col("media_id"),
        floor(col("ts_ms") / 1000.0 * col("fps")).cast("long").as("frame_idx"),
        col("ts_ms"))

  /** Audio framing: explode each audio row into fixed-length sample frames
    * (`frameLen` samples, `hop`-sample stride) with integer frame energy
    * (Σ sample² over the 0..255 fake-decoded values) and a silence flag —
    * the windowing step in front of any audio feature extractor (VAD,
    * filterbanks). The byte array, the slice, and the energy fold are all
    * per-row column expressions inside whole-stage codegen: rows multiply
    * by n_frames but never shuffle, so the op scans 100 TB of audio at
    * parquet-read speed. Energy is pure integer arithmetic — byte-exact in
    * any engine that reproduces the payload.
    */
  def audioFrames(media: DataFrame, frameLen: Int, hop: Int,
                  silenceBelow: Long): DataFrame = {
    val nBytes = length(col("content"))
    // one-pass kernel, NOT transform(sequence, i => conv(substr(hex(..))))
    // — the hex subtree would re-evaluate per byte (O(n²); see BytesToLongs)
    val bytes = graft.functions.BytesToLongs(col("content"))
    val nFrames = (floor((nBytes - frameLen).cast("double") / hop) + 1).cast("int")
    val energy = aggregate(
      slice(col("bytes"), col("frame_idx") * hop + 1, lit(frameLen)),
      lit(0L), (acc, x) => acc + x * x)
    media
      .filter(col("kind") === "audio" && nBytes >= frameLen)
      .select(col("media_id"), bytes.as("bytes"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        energy.as("energy"))
      .withColumn("is_silent", (col("energy") < silenceBelow).cast("int"))
  }

  /** Deterministic synthetic media over the documents table — binary content
    * derived from the text via repeated md5 blocks (so any SQL engine can
    * reproduce byte-exact payloads for oracle checks). kind cycles
    * image/audio/video by doc_id.
    */
  def synthesize(spark: SparkSession, documents: DataFrame): DataFrame = {
    val kind = when(pmod(col("doc_id"), lit(3)) === 0, "image")
      .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
      .otherwise("video")
    documents.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      // 32 deterministic bytes: md5(text) ++ md5(text || 'x')
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("x"))))).as("content"),
      when(kind === "image", (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int"))
        .otherwise(lit(null).cast("int")).as("width"),
      when(kind === "image", (pmod(col("doc_id"), lit(5)) * 120 + 240).cast("int"))
        .otherwise(lit(null).cast("int")).as("height"),
      when(kind === "audio", lit(16000)).otherwise(lit(null).cast("int")).as("sample_rate"),
      when(kind =!= "image", (pmod(col("doc_id"), lit(10)) * 1000 + 2000).cast("long"))
        .otherwise(lit(null).cast("long")).as("duration_ms"),
      when(kind === "video", lit(24.0)).otherwise(lit(null).cast("double")).as("fps"))
  }
}
