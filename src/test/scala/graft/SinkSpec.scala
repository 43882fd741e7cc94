package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DuplicateInjector, EventGenerator}
import graft.sources.IdempotentParquetSink

class SinkSpec extends SparkSpecBase {
  import spark.implicits._

  test("idempotent sink: a replayed batchId writes nothing (exactly-once counts)") {
    val root = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val sink = new IdempotentParquetSink(root)
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    assert(sink.writeBatch(b0, 0L))
    assert(sink.writeBatch(b1, 1L))
    assert(!sink.writeBatch(b0, 0L), "replay of batch 0 must be dropped")
    assert(!sink.writeBatch(b0.unionAll(b0), 1L), "replay with different data too")
    val back = sink.read(spark)
    assert(back.count() == 3, "no duplicates after replays")
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("keepFirstSalted equals keepFirst exactly (two-phase min_by)") {
    // skewed input: one hot key with many rows + a long tail
    val gen = EventGenerator.generate(spark, 2000L, seed = 3L)
      .withColumn("k", when(col("row_id") < 1500, lit("HOT"))
        .otherwise(col("event_id")))
    val sent = DuplicateInjector.injectEveryK(gen, col("row_id"), 3)
    val plain = Dedup.keepFirst(sent, Seq("k"),
      to_timestamp(col("created_at")), col("row_id"))
    val salted = Dedup.keepFirstSalted(sent, Seq("k"),
      to_timestamp(col("created_at")), col("row_id"), saltBuckets = 8)
    val a = plain.collect().map(_.toSeq).toSet
    val b = salted.collect().map(_.toSeq).toSet
    assert(a == b, "salting must not change results, only the shuffle shape")
    assert(salted.filter(col("k") === "HOT").count() == 1)
  }
}
