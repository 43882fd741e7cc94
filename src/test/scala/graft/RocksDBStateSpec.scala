package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Duration
import graft.streaming.StreamingDedup

/** The 100 TB dedup-state path: GraftSession configures the RocksDB state
  * store provider so 8h-window key state is disk-backed. This pins that the
  * provider actually loads and dedups across micro-batches in this
  * environment (rocksdbjni is on the Spark jars classpath).
  */
class RocksDBStateSpec extends SparkSpecBase {
  import spark.implicits._

  test("dropDuplicatesWithinWatermark on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    try {
      val in = MemoryStream[Ev]
      val out = StreamingDedup.withinWatermark(
        in.toDF(), Seq("event_id"), "ts", Duration.parse("1h"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks").toString
      val q = out.writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        def t(s: Long) = new Timestamp(1700000000000L + s * 1000)
        in.addData(Ev("a", t(0), "first"), Ev("b", t(1), "first"))
        q.processAllAvailable()
        in.addData(Ev("a", t(60), "dup"), Ev("c", t(61), "first"))
        q.processAllAvailable()
        val rows = spark.table("rocks_out").as[Ev].collect()
        assert(rows.map(_.event_id).sorted.toSeq == Seq("a", "b", "c"))
        assert(rows.forall(_.payload == "first"))
        assert(q.lastProgress.stateOperators.asScala.nonEmpty ||
          q.recentProgress.exists(_.stateOperators.nonEmpty),
          "dedup ran with a state operator")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private implicit class ArrOps[T](a: Array[T]) { def asScala: Seq[T] = a.toSeq }
}
