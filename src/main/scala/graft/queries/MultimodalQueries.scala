package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal binary-column operators (training-data pipeline surface).
  * Content is synthesized deterministically from the documents table
  * (md5-block bytes), so the DuckDB oracle reproduces identical payloads and
  * checks the real operators: metadata extraction, batched decode features,
  * frame sampling, resize arithmetic.
  */
object MultimodalQueries extends QueryPack {

  /** Shared oracle prelude: the synthesized media table (mirror of
    * Multimodal.synthesize — 32 content bytes = md5(text) ++ md5(text||'x')).
    */
  private val mediaCte =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    md5(text) || md5(text || 'x') AS content_hex,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 8 * 160 + 320 AS INTEGER) END AS width,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 5 * 120 + 240 AS INTEGER) END AS height,
      |    CASE WHEN doc_id % 3 <> 0 THEN CAST(doc_id % 10 * 1000 + 2000 AS BIGINT) END AS duration_ms,
      |    CASE WHEN doc_id % 3 = 2 THEN 24.0 END AS fps
      |  FROM documents)""".stripMargin

  /** m01 — binary metadata scan: byte length, magic prefix, content checksum
    * — the zero-decode pass a lake runs for cataloging/dedup of blobs.
    */
  private def m01(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
    media.select(
      col("media_id"), col("kind"),
      length(col("content")).cast("long").as("n_bytes"),
      lower(hex(substring(col("content"), 1, 2))).as("magic"),
      // checksum of the canonical hex rendering (DuckDB's md5 takes VARCHAR
      // only, so both engines hash the same lowercase-hex string)
      md5(lower(hex(col("content")))).as("checksum"))
      .orderBy(col("media_id"))
  }

  private val m01Sql = mediaCte +
    """
      |SELECT media_id, kind,
      |  CAST(octet_length(unhex(content_hex)) AS BIGINT) AS n_bytes,
      |  lower(substr(content_hex, 1, 4)) AS magic,
      |  md5(lower(content_hex)) AS checksum
      |FROM media ORDER BY media_id""".stripMargin

  /** m02 — batched decode + feature extraction through the mapPartitions
    * plumbing (Multimodal.decodeFeatures): per-media fake-decoded sample
    * stats. Exact-arithmetic outputs only (mean = int sum / n); entropy is
    * unit-tested, not oracled (float log2 sums are order-sensitive).
    */
  private def m02(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
    Multimodal.decodeFeatures(media, batchSize = 64)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("mean_value"), col("min_value").cast("long").as("min_value"),
        col("max_value").cast("long").as("max_value"))
      .orderBy(col("media_id"))
  }

  private val m02Sql = mediaCte +
    """,
      |bytes AS (SELECT media_id, kind,
      |  list_transform(range(0, CAST(octet_length(unhex(content_hex)) AS INTEGER)),
      |    i -> CAST(('0x' || substr(content_hex, 2*i + 1, 2)) AS BIGINT)) AS bs
      | FROM media)
      |SELECT media_id, kind,
      |  CAST(len(bs) AS BIGINT) AS n_bytes,
      |  CAST(list_sum(bs) AS DOUBLE) / len(bs) AS mean_value,
      |  CAST(list_min(bs) AS BIGINT) AS min_value,
      |  CAST(list_max(bs) AS BIGINT) AS max_value
      |FROM bytes ORDER BY media_id""".stripMargin

  /** m03 — video frame sampling: one row per sampled frame every 500 ms;
    * frame_idx = floor(ts/1000 · fps). sequence+explode, no decode, no
    * shuffle — output scales with duration, not content size.
    */
  private def m03(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
    Multimodal.sampleFrames(media, everyMs = 500L)
      .orderBy(col("media_id"), col("ts_ms"))
  }

  private val m03Sql = mediaCte +
    """
      |SELECT media_id,
      |  CAST(floor(ts_ms / 1000.0 * fps) AS BIGINT) AS frame_idx,
      |  CAST(ts_ms AS BIGINT) AS ts_ms
      |FROM (SELECT media_id, fps, unnest(range(0, duration_ms, 500)) AS ts_ms
      |      FROM media WHERE kind = 'video')
      |ORDER BY media_id, ts_ms""".stripMargin

  /** m04 — aspect-preserving resize metadata (fit into 512, never upscale):
    * identical IEEE double expression on both engines ⇒ bit-identical dims.
    */
  private def m04(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
      .filter(col("kind") === "image")
    val (rw, rh) = Multimodal.resizedDims(col("width"), col("height"), 512)
    media.select(col("media_id"), col("width"), col("height"),
      rw.cast("long").as("out_w"), rh.cast("long").as("out_h"))
      .orderBy(col("media_id"))
  }

  private val m04Sql = mediaCte +
    """
      |SELECT media_id, width, height,
      |  CAST(floor(width * least(1.0, 512.0 / greatest(
      |    CAST(width AS DOUBLE), CAST(height AS DOUBLE)))) AS BIGINT) AS out_w,
      |  CAST(floor(height * least(1.0, 512.0 / greatest(
      |    CAST(width AS DOUBLE), CAST(height AS DOUBLE)))) AS BIGINT) AS out_h
      |FROM media WHERE kind = 'image' ORDER BY media_id""".stripMargin

  /** m05 — exact media dedup: inject binary copies (every 4th blob under a
    * new id), group by content checksum, keep the smallest id — d01's
    * pattern on the binary domain, the zero-decode blob dedup every
    * multimodal lake runs before any expensive processing. Single hash-agg,
    * map-side combined; the shuffle carries 32-char checksums, not blobs.
    */
  private def m05(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
      .select(col("media_id"), col("content"))
    val copies = media.filter(pmod(col("media_id"), lit(4)) === 0)
      .select((col("media_id") + 500000).as("media_id"), col("content"))
    media.unionAll(copies)
      .groupBy(md5(lower(hex(col("content")))).as("fp"))
      .agg(min(col("media_id")).as("media_id"),
        min(length(col("content"))).cast("long").as("n_bytes"),
        count(lit(1)).as("n_copies"))
      .select(col("media_id"), col("n_bytes"), col("n_copies"))
      .orderBy(col("media_id"))
  }

  private val m05Sql = mediaCte +
    """,
      |all_m AS (SELECT media_id, content_hex FROM media
      |  UNION ALL
      |  SELECT media_id + 500000 AS media_id, content_hex FROM media
      |  WHERE media_id % 4 = 0)
      |SELECT MIN(media_id) AS media_id,
      |  CAST(MIN(octet_length(unhex(content_hex))) AS BIGINT) AS n_bytes,
      |  COUNT(*) AS n_copies
      |FROM all_m GROUP BY md5(lower(content_hex))
      |ORDER BY media_id""".stripMargin

  /** m06 — audio framing + energy (Multimodal.audioFrames): each audio blob
    * windowed into 8-sample frames at a 4-sample hop, with integer Σ sample²
    * energy and a silence flag — the VAD front-end shape. All per-row
    * codegen (byte extraction, slice, energy fold); output rows = media ×
    * n_frames, no shuffle before the oracle sort.
    */
  private def m06(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
    Multimodal.audioFrames(media, frameLen = 8, hop = 4, silenceBelow = 131072L)
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val m06Sql = mediaCte +
    """,
      |bytes AS (SELECT media_id,
      |  list_transform(range(0, CAST(octet_length(unhex(content_hex)) AS INTEGER)),
      |    i -> CAST(('0x' || substr(content_hex, 2*i + 1, 2)) AS BIGINT)) AS bs
      | FROM media WHERE kind = 'audio'),
      |fr AS (SELECT media_id, unnest(range(0, (len(bs) - 8) // 4 + 1)) AS f, bs
      | FROM bytes WHERE len(bs) >= 8),
      |e AS (SELECT media_id, f,
      |  CAST(list_sum(list_transform(list_slice(bs, f*4 + 1, f*4 + 8),
      |    x -> x * x)) AS BIGINT) AS energy
      | FROM fr)
      |SELECT media_id, CAST(f AS BIGINT) AS frame_idx, energy,
      |  CAST(energy < 131072 AS INT) AS is_silent
      |FROM e ORDER BY media_id, frame_idx""".stripMargin

  /** m07 — the REAL codec seam, oracle-checked end to end: synthesize a
    * genuine PNG per selected doc (gray gradient pixel = (x+y+id) mod 256,
    * `Multimodal.synthesizePng`), decode it through the SAME
    * `decodeFeatures` plumbing m02 uses — here the payload parses, so the
    * ImageIOCodec branch runs, not the fake codec — and report decoded
    * pixel stats. The oracle recomputes them from the closed-form pixel
    * function with no decoder: a wrong encode, a wrong decode, or a decode
    * that drops/duplicates pixels all hash-mismatch. The compressed byte
    * size is encoder-dependent and deliberately excluded.
    */
  private def m07(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(37)) === 0)
      .withColumn("width",
        (lit(16) + pmod(col("media_id"), lit(5)) * 8).cast("int"))
      .withColumn("height",
        (lit(12) + pmod(col("media_id"), lit(4)) * 6).cast("int"))
    val media = Multimodal.synthesizePng(dims)
    Multimodal.decodeFeatures(media, batchSize = 32)
      .select(col("media_id"), col("n_samples").as("n_px"),
        col("mean_value"), col("min_value").cast("long").as("min_value"),
        col("max_value").cast("long").as("max_value"))
      .orderBy(col("media_id"))
  }

  private val m07Sql =
    """WITH ids AS (SELECT doc_id AS media_id,
      |  16 + (doc_id % 5) * 8 AS w, 12 + (doc_id % 4) * 6 AS h
      | FROM documents WHERE doc_id % 37 = 0),
      |xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM ids),
      |g AS (SELECT media_id, x, unnest(range(0, h)) AS y FROM xs),
      |v AS (SELECT media_id, (x + y + media_id) % 256 AS val FROM g)
      |SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_px,
      |  CAST(SUM(val) AS DOUBLE) / COUNT(*) AS mean_value,
      |  CAST(MIN(val) AS BIGINT) AS min_value,
      |  CAST(MAX(val) AS BIGINT) AS max_value
      |FROM v GROUP BY media_id ORDER BY media_id""".stripMargin

  /** m08 — the other two JDK-offline codec branches, oracle-checked like
    * m07: per selected doc synthesize a genuine BMP (even ids) or GIF (odd
    * ids) of the same closed-form gray gradient, push it through the SAME
    * `decodeFeatures` plumbing, and pin the decoded pixel stats against
    * decoder-free arithmetic. BMP is uncompressed RGB; GIF exercises a
    * palette round-trip (the gradient's ≤256 grays fit one palette
    * exactly — exactness additionally spec-pinned in MultimodalSpec). A
    * wrong encode, decode, or palette quantization hash-mismatches.
    */
  private def m08(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(41)) === 0)
      .withColumn("width",
        (lit(16) + pmod(col("media_id"), lit(5)) * 8).cast("int"))
      .withColumn("height",
        (lit(12) + pmod(col("media_id"), lit(4)) * 6).cast("int"))
    val bmp = Multimodal.synthesizeImage(
      dims.where(pmod(col("media_id"), lit(2)) === 0), "bmp")
    val gif = Multimodal.synthesizeImage(
      dims.where(pmod(col("media_id"), lit(2)) === 1), "gif")
    Multimodal.decodeFeatures(bmp.unionAll(gif), batchSize = 32)
      .select(col("media_id"),
        when(pmod(col("media_id"), lit(2)) === 0, "bmp").otherwise("gif")
          .as("codec"),
        col("n_samples").as("n_px"), col("mean_value"),
        col("min_value").cast("long").as("min_value"),
        col("max_value").cast("long").as("max_value"))
      .orderBy(col("media_id"))
  }

  private val m08Sql =
    """WITH ids AS (SELECT doc_id AS media_id,
      |  16 + (doc_id % 5) * 8 AS w, 12 + (doc_id % 4) * 6 AS h
      | FROM documents WHERE doc_id % 41 = 0),
      |xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM ids),
      |g AS (SELECT media_id, x, unnest(range(0, h)) AS y FROM xs),
      |v AS (SELECT media_id, (x + y + media_id) % 256 AS val FROM g)
      |SELECT media_id,
      |  CASE WHEN media_id % 2 = 0 THEN 'bmp' ELSE 'gif' END AS codec,
      |  CAST(COUNT(*) AS BIGINT) AS n_px,
      |  CAST(SUM(val) AS DOUBLE) / COUNT(*) AS mean_value,
      |  CAST(MIN(val) AS BIGINT) AS min_value,
      |  CAST(MAX(val) AS BIGINT) AS max_value
      |FROM v GROUP BY media_id ORDER BY media_id""".stripMargin

  /** m09 — shot-boundary detection over video frame luminances: a boundary
    * wherever consecutive frame values jump by ≥ 96 (the |Δluma| cut
    * detector every video-curation pipeline runs before clip extraction;
    * here each fake-decoded byte stands in for a frame's mean luma, exactly
    * like m06 treats bytes as audio samples). Integer deltas → bit-exact in
    * any engine that reproduces the payload.
    *
    * Scale shape: byte extraction, the pairwise-delta transform, and the
    * threshold filter are all per-row codegen inside one projection — rows
    * multiply by boundary count but never shuffle before the oracle sort,
    * so the scan streams at parquet-read speed like m06.
    */
  private def m09(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
    // one-pass kernel, NOT transform(sequence, i => conv(substr(hex(..))))
    // — the hex subtree would re-evaluate per byte (O(n²); see BytesToLongs)
    val bytes = graft.functions.BytesToLongs(col("content"))
    val deltas = transform(sequence(lit(1), size(col("bytes")) - 1),
      i => element_at(col("bytes"), i + 1) - element_at(col("bytes"), i))
    media.filter(col("kind") === "video")
      .select(col("media_id"), bytes.as("bytes"))
      .select(col("media_id"), posexplode(deltas).as(Seq("p0", "delta")))
      .filter(abs(col("delta")) >= 96)
      .select(col("media_id"), (col("p0") + 1).cast("long").as("frame_idx"),
        col("delta"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val m09Sql = mediaCte +
    """,
      |bytes AS (SELECT media_id,
      |  list_transform(range(0, CAST(octet_length(unhex(content_hex)) AS INTEGER)),
      |    i -> CAST(('0x' || substr(content_hex, 2*i + 1, 2)) AS BIGINT)) AS bs
      | FROM media WHERE kind = 'video'),
      |d AS (SELECT media_id,
      |  CAST(unnest(range(1, len(bs))) AS BIGINT) AS frame_idx,
      |  unnest(list_transform(range(1, len(bs)), i -> bs[i+1] - bs[i])) AS delta
      | FROM bytes)
      |SELECT media_id, frame_idx, delta FROM d
      |WHERE abs(delta) >= 96 ORDER BY media_id, frame_idx""".stripMargin

  /** m10 — perceptual dHash over REAL decoded PNGs: synthesize the m07
    * gradient PNGs (doc_id % 31 selection), decode through the ImageIO
    * branch, block-average to 9×8 with the integer ±1 partition, and emit
    * the 64-bit difference hash (16 hex chars) + popcount per image — the
    * image near-duplicate primitive byte-exact in both engines because the
    * downsample is integer block sums and each bit is a cross-multiplied
    * integer comparison (`Multimodal.dHash`). The oracle recomputes every
    * block sum from the closed-form pixel function with no decoder: a
    * wrong encode, decode, block partition, bit order, or popcount all
    * hash-mismatch.
    *
    * Scale shape: mapPartitions decode + per-image O(w·h) fold, no
    * shuffle before the oracle sort — like m07/m08.
    */
  private def m10(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(31)) === 0)
      .withColumn("width",
        (lit(16) + pmod(col("media_id"), lit(5)) * 8).cast("int"))
      .withColumn("height",
        (lit(12) + pmod(col("media_id"), lit(4)) * 6).cast("int"))
    Multimodal.dHash(Multimodal.synthesizePng(dims), batchSize = 32)
      .orderBy(col("media_id"))
  }

  private val m10Sql =
    """WITH ids AS (SELECT doc_id AS media_id,
      |  16 + (doc_id % 5) * 8 AS w, 12 + (doc_id % 4) * 6 AS h
      | FROM documents WHERE doc_id % 31 = 0),
      |xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM ids),
      |g AS (SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |v AS (SELECT media_id, (x * 9) // w AS c, (y * 8) // h AS r,
      |  (x + y + media_id) % 256 AS val FROM g),
      |b AS (SELECT media_id, r, c, SUM(val) AS s, COUNT(*) AS n
      | FROM v GROUP BY 1, 2, 3),
      |p AS (SELECT l.media_id, l.r, l.c,
      |  CASE WHEN l.s * rt.n > rt.s * l.n THEN 1 ELSE 0 END AS bit
      | FROM b l JOIN b rt
      |   ON l.media_id = rt.media_id AND l.r = rt.r AND rt.c = l.c + 1
      | WHERE l.c < 8),
      |hb AS (SELECT media_id,
      |  CAST(SUM(CASE WHEN r < 4
      |    THEN CAST(bit AS BIGINT) << (31 - (r * 8 + c)) ELSE 0 END) AS BIGINT) AS hi,
      |  CAST(SUM(CASE WHEN r >= 4
      |    THEN CAST(bit AS BIGINT) << (31 - ((r - 4) * 8 + c)) ELSE 0 END) AS BIGINT) AS lo,
      |  CAST(SUM(bit) AS BIGINT) AS n_ones
      | FROM p GROUP BY 1)
      |SELECT i.media_id, CAST(i.w AS INTEGER) AS width,
      |  CAST(i.h AS INTEGER) AS height,
      |  printf('%08x%08x', hb.hi, hb.lo) AS dhash, hb.n_ones
      |FROM ids i JOIN hb ON i.media_id = hb.media_id
      |ORDER BY i.media_id""".stripMargin

  /** Hamming radius for m11: with 8 bands of 8 bits, any pair within
    * distance 7 must agree on at least one whole band (pigeonhole), so the
    * banded candidate join is EXACT at this radius — same guarantee
    * structure as d03's MinHash bands, here deterministic rather than
    * probabilistic.
    */
  private val HammingMax = 7

  /** m11 — perceptual-hash image dedup pairs: band each image's 64-bit
    * dHash (m10's REAL decoded-pixel hash) into 8 one-byte segments,
    * equi-join on (segment index, segment value) for candidates, verify by
    * exact Hamming distance ≤ [[HammingMax]]. This is the standard
    * billion-image dedup shape (pHash/dHash + multi-index Hamming search,
    * the MIH construction of Norouzi et al.): near-identical images —
    * resizes, re-encodes, small crops — land within a few bits, and the
    * band join finds them without comparing all pairs.
    *
    * Scale shape: candidates form on a band equi-join (never a cartesian);
    * the Hamming verify is two xor+bit_count codegen expressions per
    * candidate. A production corpus with band-bucket skew (e.g. flat-color
    * images hashing to 0) adds a d05-style bucket-occupancy cap; the
    * synthetic corpus's buckets are near-unique so none is needed here.
    */
  private def m11(s: SparkSession, dir: String): DataFrame = {
    val hashed = m10(s, dir).select(col("media_id"), col("dhash"))
    val bands = hashed.select(col("media_id"),
      posexplode(array((0 until 8).map(b =>
        substring(col("dhash"), b * 2 + 1, 2)): _*)).as(Seq("bi", "bv")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"))
      .distinct()
    val hx = hashed.select(col("media_id"),
      conv(substring(col("dhash"), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(col("dhash"), 9, 8), 16, 10).cast("long").as("lo"))
    cand
      .join(hx.as("x"), col("i") === col("x.media_id"))
      .join(hx.as("y"), col("j") === col("y.media_id"))
      .select(col("i"), col("j"),
        (expr("bit_count(x.hi ^ y.hi)") + expr("bit_count(x.lo ^ y.lo)"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= HammingMax)
      .orderBy(col("i"), col("j"))
  }

  private val m11Sql =
    s"""WITH m10 AS ($m10Sql),
       |hx AS (SELECT media_id, dhash,
       |  CAST(('0x' || substr(dhash, 1, 8)) AS BIGINT) AS hi,
       |  CAST(('0x' || substr(dhash, 9, 8)) AS BIGINT) AS lo
       | FROM m10),
       |bands AS (SELECT media_id, bi, substr(dhash, bi * 2 + 1, 2) AS bv
       | FROM (SELECT media_id, dhash,
       |   unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS bi FROM hx)),
       |cand AS (SELECT DISTINCT a.media_id AS i, b.media_id AS j
       | FROM bands a JOIN bands b
       | ON a.bi = b.bi AND a.bv = b.bv AND a.media_id < b.media_id)
       |SELECT c.i, c.j,
       |  CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
       |    AS BIGINT) AS hamming
       |FROM cand c JOIN hx x ON x.media_id = c.i JOIN hx y ON y.media_id = c.j
       |WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
       |  <= $HammingMax
       |ORDER BY i, j""".stripMargin

  /** m12 — silence-segment extraction: collapse m06's per-frame silence
    * flags into maximal silent RUNS per audio clip (start/end frame, frame
    * count, span in samples) — the voice-activity-detection shape every
    * audio curation pipeline runs to drop dead air and split on pauses
    * before transcription (frame flags alone can't say "a 3-second gap
    * starts here").
    *
    * Scale shape: framing and energy are per-row codegen (m06); the only
    * shuffle is the islands window (frame_idx − row_number per media) and
    * it carries ONLY silent frames — output-bounded, keyed by media_id,
    * the same trick as d20's contamination runs.
    */
  private def m12(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val media = Multimodal.synthesize(s, Tables.documents(s, dir))
    val frames = Multimodal.audioFrames(media, frameLen = 8, hop = 4,
      silenceBelow = 131072L)
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames.filter(col("is_silent") === 1)
      .withColumn("grp", col("frame_idx") - row_number().over(w))
      .groupBy(col("media_id"), col("grp"))
      .agg(min(col("frame_idx")).as("seg_start"),
        max(col("frame_idx")).as("seg_end"),
        count(lit(1)).as("n_frames"))
      .select(col("media_id"), col("seg_start"), col("seg_end"),
        col("n_frames"),
        (col("n_frames") * 4 + lit(4)).cast("long").as("span_samples"))
      .orderBy(col("media_id"), col("seg_start"))
  }

  private val m12Sql = mediaCte +
    """,
      |bytes AS (SELECT media_id,
      |  list_transform(range(0, CAST(octet_length(unhex(content_hex)) AS INTEGER)),
      |    i -> CAST(('0x' || substr(content_hex, 2*i + 1, 2)) AS BIGINT)) AS bs
      | FROM media WHERE kind = 'audio'),
      |fr AS (SELECT media_id, unnest(range(0, (len(bs) - 8) // 4 + 1)) AS f, bs
      | FROM bytes WHERE len(bs) >= 8),
      |e AS (SELECT media_id, CAST(f AS BIGINT) AS f,
      |  CAST(list_sum(list_transform(list_slice(bs, f*4 + 1, f*4 + 8),
      |    x -> x * x)) AS BIGINT) AS energy
      | FROM fr),
      |sil AS (SELECT media_id, f,
      |  f - ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY f) AS grp
      | FROM e WHERE energy < 131072)
      |SELECT media_id, CAST(MIN(f) AS BIGINT) AS seg_start,
      |  CAST(MAX(f) AS BIGINT) AS seg_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(COUNT(*) * 4 + 4 AS BIGINT) AS span_samples
      |FROM sil GROUP BY media_id, grp
      |ORDER BY media_id, seg_start""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("m01_media_metadata", m01, Some(m01Sql)),
    QueryDef("m02_decode_features", m02, Some(m02Sql)),
    QueryDef("m03_frame_sampling", m03, Some(m03Sql)),
    QueryDef("m04_resize_dims", m04, Some(m04Sql)),
    QueryDef("m05_media_dedup", m05, Some(m05Sql)),
    QueryDef("m06_audio_frames", m06, Some(m06Sql)),
    QueryDef("m07_png_decode", m07, Some(m07Sql)),
    QueryDef("m08_bmp_gif_decode", m08, Some(m08Sql)),
    QueryDef("m09_shot_boundaries", m09, Some(m09Sql)),
    QueryDef("m10_perceptual_hash", m10, Some(m10Sql)),
    QueryDef("m11_phash_pairs", m11, Some(m11Sql)),
    QueryDef("m12_silence_segments", m12, Some(m12Sql)),
    QueryDef("m13_wav_header", m13, Some(m13Sql)),
    QueryDef("m14_png_container", m14, Some(m14Sql)),
    QueryDef("m15_loudness", m15, Some(m15Sql)),
    QueryDef("m16_corruption_triage", m16, Some(m16Sql)))

  /** m16 — corpus corruption triage: synthesize a mixed media corpus
    * (WAVs and PNGs through the real encoders), DETERMINISTICALLY corrupt
    * a third of it (truncate the last 6 bytes — a torn upload), push
    * everything through the container parsers, and roll up parse health
    * per kind. The 100 TB ingest gate: a corrupted object yields a null
    * triage row, never a thrown task — and the corruption RATE per kind is
    * the dashboard number that pages someone. The oracle knows exactly
    * which ids were truncated, so a parser that crashes, a truncation the
    * walker misses (WAV: torn data chunk; PNG: IEND unreachable), or a
    * miscounted rollup all hash-mismatch.
    *
    * Scale shape: synthesize/corrupt/parse are per-row mapPartitions +
    * codegen byte ops; the rollup is one 4-row map-side-combined agg.
    */
  private def m16(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val wavIds = docs.select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(13)) === 4)
    val pngIds = docs.select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(13)) === 7)
      .withColumn("width",
        (lit(16) + pmod(col("media_id"), lit(5)) * 8).cast("int"))
      .withColumn("height",
        (lit(12) + pmod(col("media_id"), lit(4)) * 6).cast("int"))
    def torn(df: DataFrame): DataFrame =
      df.withColumn("content",
        when(pmod(col("media_id"), lit(3)) === 0,
          expr("substring(content, 1, length(content) - 6)"))
          .otherwise(col("content")))
    val wav = Multimodal.parseWavHeader(torn(Multimodal.synthesizeWav(wavIds)))
      .select(lit("audio").as("kind"), col("data_len").isNotNull.as("parse_ok"))
    val png = Multimodal.parsePngContainer(torn(Multimodal.synthesizePng(pngIds)))
      .select(lit("image").as("kind"),
        (col("sig_ok") && col("has_iend") &&
          coalesce(col("ihdr_crc_ok"), lit(false))).as("parse_ok"))
    wav.unionAll(png)
      .groupBy(col("kind"), col("parse_ok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("kind"), col("parse_ok"))
  }

  private val m16Sql =
    """WITH u AS (
      |  SELECT 'audio' AS kind, (doc_id % 3 <> 0) AS parse_ok
      |  FROM documents WHERE doc_id % 13 = 4
      |  UNION ALL
      |  SELECT 'image', (doc_id % 3 <> 0)
      |  FROM documents WHERE doc_id % 13 = 7)
      |SELECT kind, parse_ok, CAST(COUNT(*) AS BIGINT) AS n
      |FROM u GROUP BY kind, parse_ok ORDER BY kind, parse_ok""".stripMargin

  /** m15 — loudness / normalization-gain analysis: synthesize real WAVs
    * (m13's closed-form payloads), extract per-clip peak deviation and the
    * exact integer squared-deviation sum through the RIFF walker
    * (`Multimodal.wavLoudness`), then derive RMS and the peak-normalization
    * gain 20·log10(127/peak) in micro-dB. The pre-transcription normalize
    * step: clips whose gain is far from 0 dB get rescaled, near-silent
    * clips (huge gain) get dropped. IEEE sqrt and one float division are
    * correctly rounded from exact integers; the log lands in micro-dB
    * quantization (t33's discipline).
    *
    * Scale shape: synthesize and parse are both mapPartitions over the id
    * stream — zero shuffle before the final sort; every statistic is one
    * pass over the clip's own bytes.
    */
  private def m15(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(23)) === 3)
    Multimodal.wavLoudness(Multimodal.synthesizeWav(ids))
      .select(col("media_id"), col("n_samples"), col("peak"), col("sum_sq"),
        sqrt(col("sum_sq").cast("double") / col("n_samples").cast("double"))
          .as("rms"),
        round(lit(20.0) * log10(lit(127.0) / col("peak").cast("double"))
          * 1e6).cast("long").as("gain_udb"))
      .orderBy(col("media_id"))
  }

  private val m15Sql =
    """WITH ids AS (SELECT doc_id AS media_id FROM documents
      |  WHERE doc_id % 23 = 3),
      |p AS (SELECT media_id,
      |  CAST((64 + (media_id % 16) * 16) * (1 + (media_id % 2)) AS BIGINT)
      |    AS data_len FROM ids),
      |v AS (SELECT media_id, data_len,
      |  list_transform(range(0, data_len),
      |    j -> ((7 * j + media_id) % 256) - 128) AS devs FROM p),
      |a AS (SELECT media_id, data_len AS n_samples,
      |  CAST(list_max(list_transform(devs, d -> abs(d))) AS BIGINT) AS peak,
      |  CAST(list_sum(list_transform(devs, d -> d * d)) AS BIGINT) AS sum_sq
      | FROM v)
      |SELECT media_id, n_samples, peak, sum_sq,
      |  sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms,
      |  CAST(round(20.0 * log10(127.0 / CAST(peak AS DOUBLE)) * 1000000)
      |    AS BIGINT) AS gain_udb
      |FROM a ORDER BY media_id""".stripMargin

  /** m14 — PNG container triage, oracle-checked end to end (m13's image
    * counterpart): synthesize a genuine PNG per selected doc through the
    * real JDK encoder (`Multimodal.synthesizePng`, closed-form dims), then
    * walk the chunk stream with the hand-written container parser
    * (`Multimodal.parsePngContainer`) — signature, IHDR geometry/encoding
    * fields, IHDR CRC-32 validation, IEND presence — with NO pixel decode.
    * The oracle recomputes everything arithmetically: a wrong encode, a
    * mis-read big-endian length, a CRC over the wrong span, or a missed
    * terminator all hash-mismatch. This is the cheap pre-decode triage a
    * media pipeline runs before spending decompress cycles (m07 covers the
    * decode seam itself).
    */
  private def m14(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(31)) === 2)
      .withColumn("width",
        (lit(16) + pmod(col("media_id"), lit(5)) * 8).cast("int"))
      .withColumn("height",
        (lit(12) + pmod(col("media_id"), lit(4)) * 6).cast("int"))
    Multimodal.parsePngContainer(Multimodal.synthesizePng(dims))
      .orderBy(col("media_id"))
  }

  private val m14Sql =
    """SELECT doc_id AS media_id, true AS sig_ok,
      |  CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS width,
      |  CAST(12 + (doc_id % 4) * 6 AS BIGINT) AS height,
      |  CAST(8 AS BIGINT) AS bit_depth, CAST(2 AS BIGINT) AS color_type,
      |  CAST(0 AS BIGINT) AS compression, CAST(0 AS BIGINT) AS filter_method,
      |  CAST(0 AS BIGINT) AS interlace, true AS ihdr_crc_ok,
      |  true AS has_iend
      |FROM documents WHERE doc_id % 31 = 2 ORDER BY media_id""".stripMargin

  /** m13 — the audio codec seam, oracle-checked end to end (m07's WAV
    * counterpart): synthesize a genuine RIFF/WAVE file per selected doc
    * (canonical 44-byte header + 8-bit PCM, every field closed-form in
    * media_id — `Multimodal.synthesizeWav`), then parse it back through the
    * real chunk-walking header parser (`Multimodal.parseWavHeader`) and
    * report fmt fields, data length, data byte-sum, and derived duration.
    * The oracle recomputes all of it arithmetically with no RIFF code: a
    * wrong encode, a wrong parse, a mis-read little-endian field, or a
    * dropped/duplicated data byte all hash-mismatch.
    */
  private def m13(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"))
      .where(pmod(col("media_id"), lit(29)) === 1)
    Multimodal.parseWavHeader(Multimodal.synthesizeWav(ids))
      .orderBy(col("media_id"))
  }

  private val m13Sql =
    """WITH ids AS (SELECT doc_id AS media_id FROM documents
      |  WHERE doc_id % 29 = 1),
      |p AS (SELECT media_id,
      |  CAST(8000 + (media_id % 4) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(1 + (media_id % 2) AS BIGINT) AS n_channels,
      |  CAST(64 + (media_id % 16) * 16 AS BIGINT) AS n_frames FROM ids),
      |d AS (SELECT media_id, sample_rate, n_channels,
      |  n_channels AS block_align,
      |  sample_rate * n_channels AS byte_rate,
      |  n_frames * n_channels AS data_len FROM p)
      |SELECT media_id, CAST(1 AS BIGINT) AS fmt, n_channels, sample_rate,
      |  byte_rate, block_align, CAST(8 AS BIGINT) AS bits_per_sample,
      |  data_len,
      |  CAST(list_sum(list_transform(range(0, data_len),
      |    j -> (7 * j + media_id) % 256)) AS BIGINT) AS data_sum,
      |  data_len * 1000000 // byte_rate AS duration_us
      |FROM d ORDER BY media_id""".stripMargin
}
