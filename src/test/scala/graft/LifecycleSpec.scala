package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{QueryLifecycle, StreamingPipeline}

class LifecycleSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lc").toString

  private def startDummy(name: String): StreamingQuery = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Int]
    in.addData(1, 2, 3)
    in.toDF().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
  }

  test("lifecycle: create, already-exists, stop-if-running, not-found (O1)") {
    val q = QueryLifecycle.create(spark, "lc_test")(startDummy)
    try {
      assert(QueryLifecycle.getRunning(spark, "lc_test").isDefined)
      intercept[QueryLifecycle.AlreadyExists](
        QueryLifecycle.create(spark, "lc_test")(startDummy))
      assert(QueryLifecycle.stopIfRunning(spark, "lc_test"))
      assert(!QueryLifecycle.stopIfRunning(spark, "lc_test"), "second stop is a no-op")
      intercept[QueryLifecycle.NotFound](QueryLifecycle.delete(spark, "lc_test"))
      val q2 = QueryLifecycle.createOrReplace(spark, "lc_test")(startDummy)
      assert(q2.isActive)
      q2.stop()
    } finally if (q.isActive) q.stop()
  }

  test("rate-source generator stream produces schema'd events at a bounded rate") {
    val events = StreamingPipeline.rateSource(spark, rps = 500, seed = 42L)
    assert(events.isStreaming)
    assert(events.columns.toSeq == Seq("event_id", "user_id", "created_at", "ts"))
    val q = events.writeStream.format("memory").queryName("rate_smoke")
      .option("checkpointLocation", tmp()).start()
    try {
      // let a couple of micro-batches through
      Thread.sleep(2500)
      q.processAllAvailable()
      // Liveness + shape only: the memory sink is at-least-once (batches can
      // replay with fresh wall-clock timestamps), so value-level determinism
      // is pinned on the batch generator path (PropertySpec) instead.
      val rows = spark.table("rate_smoke")
      assert(rows.count() > 0, "rate source emitted events")
      assert(rows.select("event_id").distinct().count() > 0)
      val sample = rows.select("event_id").head().getString(0)
      assert(sample.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}"),
        "uuid4-shaped event ids")
    } finally q.stop()
  }
}
