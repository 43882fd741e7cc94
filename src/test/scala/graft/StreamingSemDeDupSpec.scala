package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.config.Duration
import graft.streaming.StreamingSemDeDup

case class VecDoc(doc_id: Long, ts: Timestamp, v: Seq[Long])

/** Streaming semantic admission (StreamingSemDeDup) — cell assignment off a
  * broadcast codebook, greedy within-cell cosine rejection, bounded state —
  * and its batch form must agree event for event.
  */
class StreamingSemDeDupSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_semdd_$n").toString
  }

  // two well-separated centroids on different axes
  private def codebook = graft.operators.KMeans.codebook(
    Seq((0L, Seq(1000L, 0L, 0L, 0L)), (1L, Seq(0L, 1000L, 0L, 0L)))
      .toDF("c_id", "cv"))

  private val vA  = Seq(900L, 10L, 0L, 0L)   // cell 0
  private val vA2 = Seq(880L, 40L, 0L, 0L)   // cell 0, cos(vA, vA2) ≈ 0.999
  private val vB  = Seq(5L, 950L, 0L, 0L)    // cell 1
  private val vB2 = Seq(0L, 10L, 990L, 0L)   // cell 1 (closer to B than A), cos(vB, vB2) ≈ 0.01

  private def admitBatch(docs: Seq[VecDoc], window: String = "1h",
                         maxReps: Int = 128): Map[Long, Boolean] =
    StreamingSemDeDup.admit(
        StreamingSemDeDup.assignCells(docs.toDF(), codebook,
          col("doc_id"), col("ts"), col("v")),
        Duration.parse(window), maxReps = maxReps, streaming = false)
      .collect().map(r => r.doc_id -> r.kept).toMap

  test("streaming: semantic near-copies are rejected across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[VecDoc]
    val cells = StreamingSemDeDup.assignCells(in.toDF(), codebook,
      col("doc_id"), col("ts"), col("v")).withWatermark("ts", "10 seconds")
    val q = StreamingSemDeDup.admit(cells, Duration.parse("1h"))
      .writeStream.format("memory").queryName("semdd_v")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(VecDoc(1, t(0), vA), VecDoc(2, t(1), vB), VecDoc(3, t(2), vA))
      q.processAllAvailable()
      // batch 2: near-copy of doc 1 (state must remember across batches),
      // plus a dissimilar doc in the same cell as doc 2
      in.addData(VecDoc(4, t(120), vA2), VecDoc(5, t(121), vB2))
      q.processAllAvailable()
      val verdict = spark.table("semdd_v")
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      assert(verdict == Map(1L -> true, 2L -> true, 3L -> false,
        4L -> false, 5L -> true))
    } finally q.stop()
  }

  test("batch form agrees with the streaming run on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(VecDoc(1, t(0), vA), VecDoc(2, t(1), vB),
      VecDoc(3, t(2), vA), VecDoc(4, t(120), vA2), VecDoc(5, t(121), vB2))
    val in = MemoryStream[VecDoc]
    val q = StreamingSemDeDup.admit(
        StreamingSemDeDup.assignCells(in.toDF(), codebook,
          col("doc_id"), col("ts"), col("v"))
          .withWatermark("ts", "10 seconds"),
        Duration.parse("1h"))
      .writeStream.format("memory").queryName("semdd_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val streamed = try {
      docs.grouped(2).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      spark.table("semdd_agree")
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    } finally q.stop()
    assert(streamed == admitBatch(docs),
      "batch (NoTimeout) and streaming admission must yield identical verdicts")
  }

  test("rep window lapses: a copy arriving after the window is admitted") {
    val docs = Seq(VecDoc(1, t(0), vA), VecDoc(2, t(30), vA),
      VecDoc(3, t(3700), vA))
    assert(admitBatch(docs) == Map(1L -> true, 2L -> false, 3L -> true),
      "doc 3 arrives after every rep of its cell lapsed — admitted")
  }

  test("maxReps bounds state: oldest rep is forgotten at the cap") {
    // three mutually-dissimilar vectors in cell 0, then a copy of the first:
    // with maxReps=2 the rep of doc 1 was evicted when doc 3 was admitted,
    // so the copy is (deliberately) admitted — bounded state trades exactly
    // this much recall
    val w = Seq(900L, 0L, 430L, 0L)  // cell 0, cos vs vA ≈ 0.81
    val x = Seq(900L, 0L, -430L, 0L) // cell 0, cos vs vA ≈ 0.81, vs w ≈ 0.63
    val docs = Seq(VecDoc(1, t(0), vA), VecDoc(2, t(1), w),
      VecDoc(3, t(2), x), VecDoc(4, t(3), vA))
    assert(admitBatch(docs, maxReps = 2)(4L),
      "doc 1's rep fell off the cap, so its copy is re-admitted")
    assert(!admitBatch(docs, maxReps = 3)(4L),
      "with room for all three reps the copy is rejected")
  }
}
