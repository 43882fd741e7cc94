package graft

import org.apache.spark.sql.functions._

/** Batch–streaming agreement: the same windowed aggregation over the events
  * table must produce identical results whether the parquet is read as a
  * batch table or replayed through a file-source stream with a watermark —
  * the property that lets one query definition serve both the lake and the
  * live pipeline (kappa-style).
  */
class StreamBatchAgreementSpec extends SparkSpecBase {

  test("tumbling 1-day window agg: file-stream replay == batch") {
    val dir = sf("sf0.001")
    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

    // replay the same parquet as a bounded stream (one file per trigger),
    // applying the same ts normalization Tables.events does on the batch side
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource wants a directory — stage the single file into one
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val streamed = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .transform(Tables.normalizeEventTs)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

    val ckpt = java.nio.file.Files.createTempDirectory("graft_agree").toString
    val q = streamed.writeStream.format("memory").queryName("agree_out")
      .outputMode("complete") // bounded replay: complete mode yields the final state
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val a = spark.table("agree_out").collect().map(_.toSeq).toSet
      val b = batch.collect().map(_.toSeq).toSet
      assert(a == b, "streaming replay must converge to the batch answer")
      assert(b.nonEmpty)
    } finally q.stop()
  }

  test("temporal join (J1 streaming form): file-stream replay == batch") {
    // the bench's join-stage shape (StreamBench op=join) on real data:
    // per-user clicks joined to purchases within ±30 min, both sides
    // replayed as streams — must converge to TemporalJoin.batch exactly
    val dir = sf("sf0.001")
    val tol = graft.config.Duration.parse("30m")
    def side(df: org.apache.spark.sql.DataFrame, typ: String, p: String) = df
      .filter(col("event_type") === typ)
      .select(col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"),
        col("event_id").as(s"${p}_id"))
    val ev = Tables.events(spark, dir)
    val batch = graft.streaming.TemporalJoin.batch(
      side(ev, "click", "l"), side(ev, "purchase", "r"),
      "l_user", "r_user", col("l_ts"), col("r_ts"), tol)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stage = java.nio.file.Files.createTempDirectory("graft_tj_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    def stream() = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .transform(Tables.normalizeEventTs)
    val streamed = graft.streaming.TemporalJoin.stream(
      side(stream(), "click", "l"), side(stream(), "purchase", "r"),
      "l_user", "r_user", "l_ts", "r_ts", tol)

    val ckpt = java.nio.file.Files.createTempDirectory("graft_tj").toString
    val q = streamed.writeStream.format("memory").queryName("tj_out")
      .outputMode("append") // stream-stream inner join emits matches as found
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val a = spark.table("tj_out").collect().map(_.toSeq).toSet
      val b = batch.collect().map(_.toSeq).toSet
      assert(a == b, "streaming temporal join must converge to the batch answer")
      assert(b.nonEmpty)
    } finally q.stop()
  }

  test("session window agg (ST7 streaming form): file-stream replay == batch") {
    val dir = sf("sf0.001")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
    val batch = agg(Tables.events(spark, dir))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stage = java.nio.file.Files.createTempDirectory("graft_sess_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val streamed = agg(spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .transform(Tables.normalizeEventTs)
      .withWatermark("ts", "1 day"))

    val ckpt = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val q = streamed.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val a = spark.table("sess_out").collect().map(_.toSeq).toSet
      val b = batch.collect().map(_.toSeq).toSet
      assert(a == b, "streaming session windows must converge to the batch answer")
      assert(b.nonEmpty)
    } finally q.stop()
  }
}
