package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.synthesize(spark, Tables.documents(spark, sf("sf0.001")))

  test("BytesToLongs equals the composable hex-substr byte extraction") {
    import org.apache.spark.sql.functions._
    val hexStr = lower(hex(col("content")))
    val composed = transform(sequence(lit(0), length(col("content")) - 1),
      i => conv(hexStr.substr(i * 2 + 1, lit(2)), 16, 10).cast("long"))
    val both = media.select(
      graft.functions.BytesToLongs(col("content")).as("native"),
      composed.as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0,
      "the one-pass kernel must match the hex idiom byte for byte")
  }

  test("synthesized media matches the declared schema and is deterministic") {
    val schema = media.schema
    assert(schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    val a = media.select("media_id", "kind").collect().map(_.toSeq).toSeq
    val b = Multimodal.synthesize(spark, Tables.documents(spark, sf("sf0.001")))
      .select("media_id", "kind").collect().map(_.toSeq).toSeq
    assert(a == b)
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
  }

  test("FakeCodec features: exact stats incl. entropy on known bytes") {
    // two distinct values, 50/50 → entropy exactly 1 bit
    val (mean, mn, mx, ent) = Multimodal.FakeCodec.features(
      Array[Byte](0, 0, -1, -1)) // -1 = 0xff = 255 unsigned
    assert(mean == 127.5 && mn == 0 && mx == 255)
    assert(math.abs(ent - 1.0) < 1e-12)
    // uniform byte → entropy 0
    val (m2, _, _, e2) = Multimodal.FakeCodec.features(Array[Byte](7, 7, 7))
    assert(m2 == 7.0 && e2 == 0.0)
    // empty payload guard
    assert(Multimodal.FakeCodec.features(Array.empty) == ((0.0, 0, 0, 0.0)))
  }

  test("ImageIOCodec decodes real PNG bytes to exact pixel luminances") {
    import java.awt.image.BufferedImage
    // 2×2 gray PNG with known luminances 0, 60, 120, 255 (r=g=b → (r+g+b)/3
    // is exact); PNG is lossless, so decode must return them bit-exactly
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    img.setRGB(0, 0, gray(0)); img.setRGB(1, 0, gray(60))
    img.setRGB(0, 1, gray(120)); img.setRGB(1, 1, gray(255))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    assert(Multimodal.ImageIOCodec.looksLikeImage(png), "PNG magic detected")
    val samples = Multimodal.ImageIOCodec.samples(png).get
    assert(samples.toSeq == Seq(0, 60, 120, 255), "row-major exact luminances")
    // dispatch: an image-kind row with real PNG content uses the real decoder
    assert(Multimodal.decodeSamples("image", png).toSeq == Seq(0, 60, 120, 255))
    val (mean, mn, mx, ent) = Multimodal.featuresOf(samples)
    assert(mean == (0 + 60 + 120 + 255) / 4.0 && mn == 0 && mx == 255)
    assert(math.abs(ent - 2.0) < 1e-12, "4 distinct values → 2 bits")

    // the synthetic md5 blobs are NOT images: magic check rejects them and
    // dispatch falls back to FakeCodec, keeping m01–m04 oracle rows stable
    val blob = media.filter(col("kind") === "image")
      .head().getAs[Array[Byte]]("content")
    assert(!Multimodal.ImageIOCodec.looksLikeImage(blob))
    assert(Multimodal.decodeSamples("image", blob).toSeq ==
      Multimodal.FakeCodec.samples(blob).toSeq)
    // truncated/corrupt payload with a forged magic → None, not a crash
    val forged = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
    assert(Multimodal.ImageIOCodec.samples(forged).isEmpty)
  }

  test("BMP and GIF round-trip the gradient pattern exactly (m08's seam)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // one synthesized image per format via the SAME generator m08 uses;
    // decode back through ImageIOCodec and compare every pixel against the
    // closed-form (x + y + id) % 256 — palette quantization (GIF) or any
    // channel shift (BMP) would break exactness here before it could reach
    // an oracle run
    val dimsSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val dims = spark.createDataFrame(
      java.util.Collections.singletonList(Row(7L, 40, 30)), dimsSchema)
    for (fmt <- Seq("bmp", "gif")) {
      val out = Multimodal.synthesizeImage(dims, fmt).head()
      val content = out.getAs[Array[Byte]]("content")
      assert(Multimodal.ImageIOCodec.looksLikeImage(content),
        s"$fmt magic must be recognized")
      val samples = Multimodal.ImageIOCodec.samples(content).get
      val expected = for (y <- 0 until 30; x <- 0 until 40)
        yield ((x + y + 7) % 256)
      assert(samples.toSeq == expected, s"$fmt decode must be pixel-exact")
    }
  }

  test("dHash is invariant across lossless re-encodes and separates content") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dimsSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val dims = spark.createDataFrame(
      java.util.Collections.singletonList(Row(7L, 40, 30)), dimsSchema)
    // the perceptual property: the SAME pixels through two different
    // codecs (PNG, BMP) must produce the IDENTICAL 64-bit hash — this is
    // what byte-level m05 dedup cannot do across re-encodes
    val hashes = Seq("png", "bmp").map { fmt =>
      val h = Multimodal.dHash(Multimodal.synthesizeImage(dims, fmt)).head()
      (h.getAs[String]("dhash"), h.getAs[Long]("n_ones"))
    }
    assert(hashes.distinct.size == 1, s"re-encode must not move the hash: $hashes")
    assert(hashes.head._1.length == 16 &&
      hashes.head._1.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    // popcount consistency: n_ones equals the hex hash's set bits
    val bits = java.lang.Long.parseUnsignedLong(hashes.head._1, 16)
    assert(java.lang.Long.bitCount(bits) == hashes.head._2)
    // different content (shifted gradient changes block ordering only if
    // pixel ramps differ — use a reversed gradient via a different id and
    // dims so block comparisons flip) must separate
    val dims2 = spark.createDataFrame(
      java.util.Collections.singletonList(Row(131L, 33, 17)), dimsSchema)
    val other = Multimodal.dHash(Multimodal.synthesizePng(dims2))
      .head().getAs[String]("dhash")
    assert(other.length == 16)
  }

  test("decodeFeatures routes real PNG content through the real decoder") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(3, 1, BufferedImage.TYPE_INT_RGB)
    (0 until 3).foreach(x => img.setRGB(x, 0, (10 << 16) | (10 << 8) | 10))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val row = org.apache.spark.sql.Row(1L, "image", png, 3, 1,
      null, null, null)
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), Multimodal.mediaSchema)
    val r = Multimodal.decodeFeatures(df).head()
    assert(r.getLong(2) == png.length.toLong, "n_bytes is the payload size")
    assert(r.getLong(3) == 3L, "n_samples is the decoded pixel count")
    assert(r.getDouble(4) == 10.0 && r.getInt(5) == 10 && r.getInt(6) == 10)
    assert(r.getDouble(7) == 0.0, "uniform image → 0 entropy")
  }

  test("decodeFeatures preserves one row per media across batch boundaries") {
    val out = Multimodal.decodeFeatures(media, batchSize = 7) // non-divisor batch
    assert(out.count() == media.count())
    assert(out.schema.fieldNames.toSeq == Multimodal.featureSchema.fieldNames.toSeq)
    val r = out.filter(col("media_id") === 0).head()
    assert(r.getLong(2) == 32L, "32 synthesized bytes")
    assert(r.getLong(3) == 32L, "fake codec: samples == payload bytes")
    assert(r.getDouble(7) > 0, "md5-derived bytes have nonzero entropy")
  }

  test("sampleFrames emits only video rows, frame math checks out") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500L)
    val joined = frames.join(media.select(col("media_id"), col("kind")), "media_id")
    assert(joined.filter(col("kind") =!= "video").count() == 0)
    val f = frames.filter(col("media_id") === 2 && col("ts_ms") === 1500).head()
    assert(f.getLong(1) == 36L, "floor(1.5s * 24fps) = 36")
  }

  test("audioFrames: audio-only rows, frame count/stride math, exact energies") {
    val frames = Multimodal.audioFrames(media, frameLen = 8, hop = 4,
      silenceBelow = 131072L)
    val joined = frames.join(media.select(col("media_id"), col("kind")), "media_id")
    assert(joined.filter(col("kind") =!= "audio").count() == 0)
    // 32 bytes, len 8, hop 4 → 7 frames per audio blob
    val perMedia = frames.groupBy("media_id").count().collect().map(_.getLong(1))
    assert(perMedia.nonEmpty && perMedia.forall(_ == 7L))
    // energies match an independent recomputation from the raw bytes
    val audioId = media.filter(col("kind") === "audio")
      .select(min(col("media_id"))).head().getLong(0)
    val content = media.filter(col("media_id") === audioId)
      .head().getAs[Array[Byte]]("content")
    val expected = (0 until 7).map { f =>
      content.slice(f * 4, f * 4 + 8).map(b => (b & 0xff).toLong)
        .map(v => v * v).sum
    }
    val got = frames.filter(col("media_id") === audioId)
      .orderBy(col("frame_idx")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.map(_._2).toSeq == expected)
    got.foreach { case (_, e, silent) =>
      assert((silent == 1) == (e < 131072L), "silence flag consistent")
    }
  }

  test("resizedDims never upscales and preserves aspect bound") {
    import spark.implicits._
    val df = Seq((960, 720), (320, 240), (512, 512), (2000, 100)).toDF("w", "h")
    val (rw, rh) = Multimodal.resizedDims(col("w"), col("h"), 512)
    val got = df.select(col("w"), col("h"), rw.as("ow"), rh.as("oh")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    got.foreach { case (w, h, ow, oh) =>
      assert(ow <= 512 && oh <= 512)
      assert(ow <= w && oh <= h, "never upscale")
    }
    assert(got.toSeq.contains((320, 240, 320, 240)), "small images untouched")
    assert(got.toSeq.contains((960, 720, 512, 384)), "aspect preserved")
  }

  test("WAV parser: round trip, chunk-order tolerance, malformed payloads") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 1. synthesize → parse reproduces every closed-form field
    val ids = spark.range(1, 4).select(col("id").as("media_id"))
    val parsed = Multimodal.parseWavHeader(Multimodal.synthesizeWav(ids))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (mid <- 1L to 3L) {
      val r = parsed(mid)
      val sr = 8000 + (mid % 4) * 4000
      val ch = 1 + (mid % 2)
      val frames = 64 + (mid % 16) * 16
      val dl = frames * ch
      assert(r.getLong(1) == 1L, "fmt = PCM")
      assert(r.getLong(2) == ch && r.getLong(3) == sr)
      assert(r.getLong(4) == sr * ch && r.getLong(5) == ch)
      assert(r.getLong(6) == 8L && r.getLong(7) == dl)
      val expSum = (0L until dl).map(j => (7L * j + mid) % 256).sum
      assert(r.getLong(8) == expSum, "data bytes round-trip exactly")
      assert(r.getLong(9) == dl * 1000000L / (sr * ch))
    }
    // 2. an unknown odd-sized chunk BEFORE fmt/data must be skipped with
    // word-alignment padding, and fields still extracted
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 3 + 1) + (8 + 16) + (8 + 4))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40 + 16 + 12 + 4)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3)).put(0.toByte) // odd size → pad byte
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(8000).putInt(8000)
      .putShort(1.toShort).putShort(8.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(4)
      .put(Array[Byte](10, 20, 30, 40))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val weird = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(7L, bb.array()),
        Row(8L, Array.fill[Byte](30)(42)), // garbage: no RIFF magic
        Row(9L, "RIFF1234WAVE".getBytes("US-ASCII"))), // header, no chunks
      schema)
    val out = Multimodal.parseWavHeader(weird)
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = out(7L)
    assert(ok.getLong(3) == 8000L && ok.getLong(7) == 4L &&
      ok.getLong(8) == 100L, "chunk walker skips unknown odd chunk")
    // 3. malformed payloads yield null fields, never an exception
    assert(ok.getLong(9) == 4L * 1000000L / 8000L)
    assert(out(8L).isNullAt(1) && out(8L).isNullAt(7), "garbage → nulls")
    assert(out(9L).isNullAt(1), "chunkless RIFF → nulls")
  }

  test("PNG container walker: real encode, corrupt CRC, truncation, garbage") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 1. a real JDK-encoded PNG parses with validated IHDR CRC and IEND
    val dims = spark.range(5, 7).select(col("id").as("media_id"),
      lit(24).cast("int").as("width"), lit(18).cast("int").as("height"))
    val realPng = Multimodal.synthesizePng(dims)
    val good = Multimodal.parsePngContainer(realPng)
      .collect().map(r => r.getLong(0) -> r).toMap
    for (mid <- 5L to 6L) {
      val r = good(mid)
      assert(r.getBoolean(1), "signature")
      assert(r.getLong(2) == 24L && r.getLong(3) == 18L, "IHDR geometry")
      assert(r.getLong(4) == 8L && r.getLong(5) == 2L, "8-bit truecolor")
      assert(r.getLong(6) == 0L && r.getLong(7) == 0L && r.getLong(8) == 0L)
      assert(r.getBoolean(9), "IHDR CRC-32 validates")
      assert(r.getBoolean(10), "IEND reached")
    }

    // 2. flip a byte inside IHDR data: CRC must fail, fields still read;
    // 3. truncate mid-chunk: no IEND, no exception; 4. garbage: sig_ok=false
    val pngBytes = realPng.collect().head.getAs[Array[Byte]]("content")
    val corrupted = pngBytes.clone()
    corrupted(16) = (corrupted(16) ^ 0x01).toByte // width low byte in IHDR
    val truncated = pngBytes.take(pngBytes.length - 6)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val bad = Multimodal.parsePngContainer(spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, corrupted),
        Row(2L, truncated),
        Row(3L, Array.fill[Byte](40)(7))),
      schema)).collect().map(r => r.getLong(0) -> r).toMap
    assert(!bad(1L).getBoolean(9), "flipped IHDR byte must fail the CRC")
    assert(bad(1L).getBoolean(1) && !bad(1L).isNullAt(2),
      "fields still extracted from the corrupt chunk")
    assert(bad(2L).getBoolean(1) && !bad(2L).getBoolean(10),
      "truncation: signature ok, IEND never reached, no exception")
    assert(!bad(3L).getBoolean(1) && bad(3L).isNullAt(2),
      "garbage: bad signature, null fields")
  }
}
