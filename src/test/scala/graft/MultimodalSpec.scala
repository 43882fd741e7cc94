package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.synthesize(spark, Tables.documents(spark, sf("sf0.001")))

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

  test("decodeFeatures preserves one row per media across batch boundaries") {
    val out = Multimodal.decodeFeatures(media, batchSize = 7) // non-divisor batch
    assert(out.count() == media.count())
    assert(out.schema.fieldNames.toSeq == Multimodal.featureSchema.fieldNames.toSeq)
    val r = out.filter(col("media_id") === 0).head()
    assert(r.getLong(2) == 32L, "32 synthesized bytes")
    assert(r.getDouble(6) > 0, "md5-derived bytes have nonzero entropy")
  }

  test("sampleFrames emits only video rows, frame math checks out") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500L)
    val joined = frames.join(media.select(col("media_id"), col("kind")), "media_id")
    assert(joined.filter(col("kind") =!= "video").count() == 0)
    val f = frames.filter(col("media_id") === 2 && col("ts_ms") === 1500).head()
    assert(f.getLong(1) == 36L, "floor(1.5s * 24fps) = 36")
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
}
