package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.config.{Duration, SchemaField}
import graft.operators.EventGenerator
import graft.sources.{KafkaIO, KafkaTopicAdmin}
import graft.streaming.StreamingDedup

/** Live Kafka smoke profile — the S3/S4/S11 edges against a real broker,
  * mirroring LiveSinkSpec's pattern for ClickHouse. Runs only when
  * `SPARK_GRAFT_KAFKA_URL` points at a reachable bootstrap server AND the
  * Kafka jars are on the classpath (kafka-clients for the admin verbs,
  * spark-sql-kafka for the producer/consumer formats — both ship on any
  * cluster with the Kafka connector; neither is in this offline sandbox).
  * Cancelled (not failed) otherwise, so the suite is green offline and the
  * live path stays runnable:
  *
  *   SPARK_GRAFT_KAFKA_URL=broker:9092 sbt "testOnly graft.LiveKafkaSpec"
  *
  * Covers the reference's full Kafka loop (src/generate_events.py:47-71 →
  * src/utils/kafka.py:38-144): topic admin lifecycle, JSON produce,
  * readStream with broker LogAppendTime as event time, windowed dedup,
  * exact-count verification.
  */
class LiveKafkaSpec extends SparkSpecBase {

  private val urlOpt = sys.env.get("SPARK_GRAFT_KAFKA_URL")

  private def endpoint(url: String) =
    KafkaTopicAdmin.Endpoint.reflective(url) match {
      case Left(why) => cancel(why); throw new IllegalStateException
      case Right(ep) => ep
    }

  test("live: topic admin — idempotent create, list, prefix cleanup") {
    assume(urlOpt.isDefined, "SPARK_GRAFT_KAFKA_URL not set — live Kafka smoke skipped")
    val ep = endpoint(urlOpt.get)
    try {
      val topic = s"load_graft_live_admin_${System.nanoTime()}"
      val first = KafkaTopicAdmin.createTopicsIfNotExists(ep, Seq(topic))
      assert(first == Seq(topic -> KafkaTopicAdmin.CreateResult.Created))
      // second create must surface AlreadyExists, not fail (kafka.py:77-80)
      val second = KafkaTopicAdmin.createTopicsIfNotExists(ep, Seq(topic))
      assert(second == Seq(topic -> KafkaTopicAdmin.CreateResult.AlreadyExists))
      assert(ep.listTopics().contains(topic))
      val report = KafkaTopicAdmin.cleanup(ep, prefix = "load_graft_live_admin_")
      assert(report.deleted.contains(topic) && report.failed.isEmpty)
    } finally ep.close()
  }

  test("live: produce → readStream → windowed dedup → exact count") {
    assume(urlOpt.isDefined, "SPARK_GRAFT_KAFKA_URL not set — live Kafka smoke skipped")
    val url = urlOpt.get
    val ep = endpoint(url)
    val topic = s"load_graft_live_e2e_${System.nanoTime()}"
    try {
      KafkaTopicAdmin.createTopicsIfNotExists(ep, Seq(topic))

      // the reference load shape: unique events + re-sent duplicates
      val unique = 500L
      val dupes = 50L
      val gen = EventGenerator.generate(spark, unique, seed = 11L)
      KafkaIO.write(gen, topic, url)
      KafkaIO.write(gen.where(col("row_id") < dupes), topic, url)

      val fields = Seq("event_id", "user_id", "created_at", "name", "email")
        .map(SchemaField(_, "string"))
      val decoded = KafkaIO.readStream(spark, topic, url, fields,
        startingOffsets = "earliest")
      val dd = StreamingDedup.withinWatermark(
        decoded, Seq("event_id"), "kafka_ts", Duration.parse("8h"))

      val q = dd.writeStream.format("memory").queryName("live_kafka_dd")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
      val got = spark.sql("SELECT COUNT(DISTINCT event_id) FROM live_kafka_dd")
        .head().getLong(0)
      assert(got == unique,
        s"windowed dedup over the live topic must recover the $unique unique events, got $got")
    } finally {
      KafkaTopicAdmin.cleanup(ep, prefix = "load_graft_live_e2e_")
      ep.close()
    }
  }
}
