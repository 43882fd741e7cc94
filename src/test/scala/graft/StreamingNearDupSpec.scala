package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.config.Duration
import graft.streaming.StreamingNearDup

case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming LSH near-dup admission vs its batch form, and both vs the
  * one-pass d12 greedy band-claim query — the three must agree.
  */
class StreamingNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_neardup_$n").toString
  }

  private val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val b = "one two three four five six seven eight nine ten eleven"
  private val c = "red orange yellow green blue indigo violet white black gray"

  test("streaming: near-copies are rejected across micro-batches, originals kept") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val bands = StreamingNearDup.bandStream(
      in.toDF().withWatermark("ts", "10 seconds"),
      col("doc_id"), col("ts"), col("text"))
    val q = StreamingNearDup.claims(bands, Duration.parse("1h"))
      .writeStream.format("memory").queryName("nd_claims")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(Doc(1, t(0), a), Doc(2, t(1), a), Doc(3, t(2), b))
      q.processAllAvailable()
      // batch 2: near-copy of doc 1 (seen in batch 1 — state must remember),
      // plus a fresh doc
      in.addData(Doc(4, t(120), a), Doc(5, t(121), c))
      q.processAllAvailable()
      val verdict = StreamingNearDup.combine(spark.table("nd_claims"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(verdict == Map(1L -> true, 2L -> false, 3L -> true,
        4L -> false, 5L -> true))
    } finally q.stop()
  }

  test("batch claims+combine equals the one-pass d12 greedy band-claim query") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    // arrival order := doc_id (the batch stand-in d12 uses)
    val withTs = docs.select(col("doc_id"),
      timestamp_seconds(col("doc_id")).as("ts"), col("text"))
    val bands = StreamingNearDup.bandStream(withTs,
      col("doc_id"), col("ts"), col("text"))
    val statefulKept = StreamingNearDup.combine(
        StreamingNearDup.claims(bands, Duration.parse("365d"), streaming = false).toDF())
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val onePass = SparkEntry.queries("d12_greedy_band_dedup")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(statefulKept == onePass,
      "stateful greedy admission must equal the one-pass min-owner form")
    assert(onePass.values.exists(identity) && onePass.values.exists(v => !v),
      "testdata must exercise both kept and rejected docs")
  }

  test("claim window lapses: a near-copy arriving after the window is admitted") {
    val docs = Seq(Doc(1, t(0), a), Doc(2, t(30), a), Doc(3, t(3700), a)).toDS()
    val bands = StreamingNearDup.bandStream(docs.toDF(),
      col("doc_id"), col("ts"), col("text"))
    val verdict = StreamingNearDup.combine(
        StreamingNearDup.claims(bands, Duration.parse("1h"), streaming = false).toDF())
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdict == Map(1L -> true, 2L -> false, 3L -> true),
      "doc 3 presents the same bands after every claim lapsed — admitted")
  }
}
