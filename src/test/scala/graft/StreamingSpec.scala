package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.config._
import graft.streaming.{StreamingDedup, StreamingPipeline, TemporalJoin}

/** Streaming semantics, driven synchronously through MemoryStream —
  * duplicates within the window must be dropped across micro-batch
  * boundaries (the reference's oracle: sink rows == unique generated,
  * reference src/pipeline_test.py:21-23).
  */
case class Ev(event_id: String, ts: Timestamp, payload: String)
case class REv(r_event_id: String, r_ts: Timestamp, extra: String)

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_stream_$n").toString
  }

  test("withinWatermark drops cross-batch duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingDedup.withinWatermark(
      in.toDF(), Seq("event_id"), "ts", Duration.parse("1h"))
    val q = out.writeStream.format("memory").queryName("dd1")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(Ev("a", t(0), "first"), Ev("b", t(1), "first"))
      q.processAllAvailable()
      // duplicate of "a" arriving in a LATER micro-batch — state must drop it
      in.addData(Ev("a", t(120), "dup"), Ev("c", t(121), "first"))
      q.processAllAvailable()
      val rows = spark.table("dd1").as[Ev].collect()
      assert(rows.map(_.event_id).sorted.toSeq == Seq("a", "b", "c"))
      assert(rows.forall(_.payload == "first"), "first occurrence must win")
    } finally q.stop()
  }

  test("keepFirstStateful: suppress within window, re-admit after (GlassFlow semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val events = in.toDF().withWatermark("ts", "10 seconds").as[Ev]
    val out = StreamingDedup.keepFirstStateful[Ev](
      events, _.event_id, _.ts, Duration.parse("60s"))
    val q = out.writeStream.format("memory").queryName("dd2")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(Ev("k", t(0), "v0"), Ev("k", t(30), "v1")) // v1 inside window
      q.processAllAvailable()
      in.addData(Ev("k", t(59), "v2")) // still inside [0, 60)
      q.processAllAvailable()
      in.addData(Ev("k", t(60), "v3")) // window expired — new first
      q.processAllAvailable()
      val rows = spark.table("dd2").as[Ev].collect().sortBy(_.ts.getTime)
      assert(rows.map(_.payload).toSeq == Seq("v0", "v3"))
    } finally q.stop()
  }

  test("keepFirstStateful: behind-watermark events are filtered, query survives") {
    // An event whose suppression window would close behind the watermark:
    // Spark's FlatMapGroupsWithStateExec drops rows older than the
    // event-time watermark before they reach user code (so the timeout
    // IllegalArgumentException path needs the defensive watermark+1 clamp
    // only for boundary equality). Pin the drop + query survival; this is
    // the documented divergence from GlassFlow, which would re-admit the
    // late row (StreamingDedup scaladoc / SURVEY §2.7 ST3).
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val events = in.toDF().withWatermark("ts", "5 seconds").as[Ev]
    val out = StreamingDedup.keepFirstStateful[Ev](
      events, _.event_id, _.ts, Duration.parse("10s"))
    val q = out.writeStream.format("memory").queryName("dd3")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      in.addData(Ev("k", t(0), "v0"), Ev("w", t(100), "advance"))
      q.processAllAvailable() // watermark → ~95s
      in.addData(Ev("k", t(50), "late")) // behind the watermark — filtered
      q.processAllAvailable()
      val rows = spark.table("dd3").as[Ev].collect().sortBy(_.ts.getTime)
      assert(rows.map(_.payload).toSeq == Seq("v0", "advance"),
        "late row dropped by the stateful operator's watermark filter")
      assert(q.exception.isEmpty, "query must not die on late rows")
    } finally q.stop()
  }

  test("keepFirstStateful batch mode agrees with Dedup.tumbling regime (window ≫ horizon)") {
    val events = Seq(
      Ev("a", t(0), "keep"), Ev("a", t(5), "drop"), Ev("b", t(2), "keep"),
      Ev("b", t(100), "drop"), Ev("c", t(50), "keep")).toDS()
    val out = StreamingDedup.keepFirstStateful[Ev](
      events, _.event_id, _.ts, Duration.parse("8h"), streaming = false)
    assert(out.collect().map(_.payload).forall(_ == "keep"))
    assert(out.count() == 3)
  }

  test("temporal stream-stream join matches within tolerance only") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    val left = l.toDF().select(col("event_id").as("l_key"),
      col("ts").as("l_ts"), col("payload").as("l_val"))
    val right = r.toDF().select(col("event_id").as("r_key"),
      col("ts").as("r_ts"), col("payload").as("r_val"))
    val joined = TemporalJoin.stream(left, right,
      "l_key", "r_key", "l_ts", "r_ts", Duration.parse("10s"))
    val q = joined.writeStream.format("memory").queryName("tj1")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      l.addData(Ev("x", t(100), "L"))
      r.addData(Ev("x", t(105), "near"), Ev("x", t(200), "far"),
        Ev("y", t(100), "wrong-key"))
      q.processAllAvailable()
      val rows = spark.table("tj1").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("r_val") == "near")
    } finally q.stop()
  }

  test("outer temporal join emits unmatched left rows after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    val left = l.toDF().select(col("event_id").as("l_key"),
      col("ts").as("l_ts"), col("payload").as("l_val"))
    val right = r.toDF().select(col("event_id").as("r_key"),
      col("ts").as("r_ts"), col("payload").as("r_val"))
    val joined = TemporalJoin.streamOuter(left, right,
      "l_key", "r_key", "l_ts", "r_ts", Duration.parse("10s"))
    val q = joined.writeStream.format("memory").queryName("tjo1")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      // x matches within tolerance; z has no partner at all
      l.addData(Ev("x", t(100), "L-match"), Ev("z", t(101), "L-alone"))
      r.addData(Ev("x", t(105), "near"), Ev("y", t(103), "wrong-key"))
      q.processAllAvailable()
      // watermark sentinels far past 101+10s on BOTH sides, then one more
      // batch: expired left state null-pads on the batch AFTER the
      // watermark advances (the documented micro-batch caveat)
      l.addData(Ev("wm", t(1000), "sentinel"))
      r.addData(Ev("wm2", t(1000), "sentinel"))
      q.processAllAvailable()
      l.addData(Ev("wm3", t(1001), "sentinel"))
      q.processAllAvailable()
      val rows = spark.table("tjo1").collect()
        .filter(x => !x.getAs[String]("l_val").contains("sentinel"))
      val matched = rows.filter(_.getAs[String]("l_val") == "L-match")
      assert(matched.length == 1 && matched.head.getAs[String]("r_val") == "near",
        "matching rows join exactly as the inner form")
      val alone = rows.filter(_.getAs[String]("l_val") == "L-alone")
      assert(alone.length == 1 && alone.head.isNullAt(
        alone.head.fieldIndex("r_val")),
        "unmatched left row must surface null-padded after expiry")
    } finally q.stop()
  }

  test("asOf join picks the latest right row at-or-before left.ts") {
    val trades = Seq(("A", t(100), 10.0), ("A", t(200), 20.0)).toDF("sym", "tts", "px")
    val quotes = Seq(
      ("A", t(95), 9.5), ("A", t(99), 9.9), ("A", t(101), 10.1),
      ("A", t(150), 15.0)).toDF("qsym", "qts", "bid")
    val out = TemporalJoin.asOf(trades, quotes, "sym", "qsym",
      col("tts"), col("qts"), Duration.parse("60s"))
    val got = out.select("sym", "px", "bid").collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set((10.0, 9.9), (20.0, 15.0)))
  }

  test("end-to-end streaming pipeline: rate-free e2e via memory stream, count == unique") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = PipelineConfig(
      pipelineId = "p1",
      sourceSchema = Seq(SchemaField("event_id", "string")),
      dedup = DedupConfig(enabled = true, idField = "event_id",
        timeWindow = Duration.parse("1h")),
      join = None,
      sink = SinkConfig("out_t", maxBatchSize = 1000,
        maxDelayTime = Duration.parse("1s"),
        tableMapping = Seq(
          FieldMapping("event_id", "event_id", "uuid"),
          FieldMapping("payload", "val", "string"))))
    val in = MemoryStream[Ev]
    val sinkDir = tmp()
    val q = StreamingPipeline.start(in.toDF(), cfg, "ts", sinkDir, tmp())
    try {
      // 6 events, 2 duplicates ⇒ 4 unique (the reference's exact-count oracle)
      in.addData(Ev("e1", t(0), "a"), Ev("e2", t(1), "b"), Ev("e1", t(2), "dup"))
      q.processAllAvailable()
      in.addData(Ev("e3", t(3), "c"), Ev("e2", t(4), "dup"), Ev("e4", t(5), "d"))
      q.processAllAvailable()
      val sunk = new graft.sources.IdempotentParquetSink(sinkDir).read(spark)
      assert(sunk.columns.filterNot(_ == "epoch").sorted.toSeq == Seq("event_id", "val"))
      assert(sunk.count() == 4, "added_records == total_generated (unique)")
    } finally q.stop()
  }

  test("configured temporal join: dedup → join → projection end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = PipelineConfig(
      pipelineId = "pj",
      sourceSchema = Seq(SchemaField("event_id", "string")),
      dedup = DedupConfig(enabled = true, idField = "event_id",
        timeWindow = Duration.parse("1h")),
      join = Some(JoinConfig(enabled = true, joinKey = "event_id",
        timeWindow = Duration.parse("10s"))),
      sink = SinkConfig("out_j", maxBatchSize = 1000,
        maxDelayTime = Duration.parse("1s"),
        tableMapping = Seq(
          FieldMapping("event_id", "event_id", "string"),
          FieldMapping("extra", "extra", "string"))))
    val l = MemoryStream[Ev]
    val r = MemoryStream[REv]
    val out = StreamingPipeline.transform(l.toDF(), cfg, "ts", Some(r.toDF()))
    val q = out.writeStream.format("memory").queryName("pj1")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      l.addData(Ev("e1", t(100), "a"), Ev("e2", t(200), "b"),
        Ev("e1", t(102), "dup"))
      r.addData(REv("e1", t(105), "joined"), // within ±10s of e1
        REv("e2", t(300), "too-late"))       // 100s after e2 — outside window
      q.processAllAvailable()
      val rows = spark.table("pj1").collect()
      assert(rows.map(_.getAs[String]("event_id")).toSeq == Seq("e1"),
        "only the in-tolerance match survives; the duplicate never double-joins")
      assert(rows.head.getAs[String]("extra") == "joined")
      assert(spark.table("pj1").columns.toSeq == Seq("event_id", "extra"))
    } finally q.stop()
  }

  test("restart from checkpoint: dedup state survives, no loss and no dup") {
    val cfg = PipelineConfig(
      pipelineId = "pr",
      sourceSchema = Seq(SchemaField("event_id", "string")),
      dedup = DedupConfig(enabled = true, idField = "event_id",
        timeWindow = Duration.parse("1h")),
      join = None,
      sink = SinkConfig("out_r", maxBatchSize = 1000,
        maxDelayTime = Duration.parse("1s"),
        tableMapping = Seq(
          FieldMapping("event_id", "event_id", "string"),
          FieldMapping("payload", "val", "string"))))
    val stage = tmp()
    val sinkDir = tmp()
    val ckpt = tmp()
    def events(dir: String) = spark.readStream
      .schema(Seq(Ev("x", t(0), "x")).toDF().schema)
      .parquet(dir)
    // epoch 1: three events, one in-batch duplicate
    Seq(Ev("e1", t(0), "a"), Ev("e2", t(1), "b"), Ev("e1", t(2), "dup"))
      .toDF().write.mode("append").parquet(stage)
    val q1 = StreamingPipeline.start(events(stage), cfg, "ts", sinkDir, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    // epoch 2 arrives while the query is DOWN; e2's duplicate is only
    // droppable if the state store recovered across the restart
    Seq(Ev("e3", t(3), "c"), Ev("e2", t(4), "late-dup"), Ev("e4", t(5), "d"))
      .toDF().write.mode("append").parquet(stage)
    val q2 = StreamingPipeline.start(events(stage), cfg, "ts", sinkDir, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val sunk = new graft.sources.IdempotentParquetSink(sinkDir).read(spark)
    assert(sunk.count() == 4, "4 unique across the restart — no loss, no dup")
    assert(sunk.select("event_id").as[String].collect().sorted.toSeq ==
      Seq("e1", "e2", "e3", "e4"))
  }

  test("kafka wire-format round trip: toJsonValue → decode preserves fields") {
    import graft.sources.KafkaIO
    val fields = Seq(SchemaField("event_id", "string"), SchemaField("name", "string"))
    val df = Seq(("id1", "alice"), ("id2", "bob")).toDF("event_id", "name")
    val wire = KafkaIO.toJsonValue(df)
      .withColumn("timestamp", lit(t(0))) // broker LogAppendTime stand-in
    val back = KafkaIO.decode(wire, fields)
    assert(back.columns.toSeq == Seq("event_id", "name", "kafka_ts"))
    assert(back.select("event_id", "name").as[(String, String)].collect().toSet ==
      Set(("id1", "alice"), ("id2", "bob")))
  }

  test("base64 credential/CA decode matches the reference edge (P6)") {
    import graft.sources.KafkaIO
    val auth = KafkaIO.KafkaAuth.fromBase64("SASL_PLAINTEXT", "PLAIN",
      "user", java.util.Base64.getEncoder.encodeToString("s3cret".getBytes("UTF-8")))
    assert(auth.password == "s3cret")
    assert(KafkaIO.options("b:9092", Some(auth))("kafka.sasl.jaas.config")
      .contains("""password="s3cret""""))
    // JAAS injection hardening: quotes/backslashes in credentials are escaped
    val hostile = KafkaIO.KafkaAuth("SASL_PLAINTEXT", "PLAIN",
      """u"ser""", """p\ass" password="x""")
    val jaas = KafkaIO.options("b:9092", Some(hostile))("kafka.sasl.jaas.config")
    assert(jaas.contains("""username="u\"ser""""))
    assert(jaas.contains("""password="p\\ass\" password=\"x""""))
    val pem = "-----BEGIN CERTIFICATE-----\nabc\n-----END CERTIFICATE-----"
    val path = KafkaIO.writeRootCa(
      java.util.Base64.getEncoder.encodeToString(pem.getBytes("UTF-8")))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8") == pem)
  }

  test("ClickHouse DDL follows the reference ORDER BY rule") {
    import graft.sources.ClickHouseSink
    val sink = SinkConfig("load_t", 5000, Duration.parse("10s"), Seq(
      FieldMapping("event_id", "event_id", "uuid"),
      FieldMapping("created_at", "created_at", "datetime"),
      FieldMapping("name", "name", "string")))
    val noJoin = ClickHouseSink.createTableDdl(sink, None)
    assert(noJoin ==
      "CREATE TABLE IF NOT EXISTS load_t (`event_id` UUID, `created_at` DateTime, " +
        "`name` String) ENGINE = MergeTree() ORDER BY (`event_id`)")
    val withJoin = ClickHouseSink.createTableDdl(sink,
      Some(JoinConfig(enabled = true, joinKey = "created_at",
        timeWindow = Duration.parse("1h"))))
    assert(withJoin.endsWith("ORDER BY (`created_at`)"))
    assert(ClickHouseSink.jdbcOptions(sink, None)("batchsize") == "5000")
  }
}
