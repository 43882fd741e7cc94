package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.config.SchemaField

/** S3/S4 — Kafka edge, kept thin and swappable (no broker in CI; the `kafka`
  * format resolves at runtime when spark-sql-kafka is on the cluster
  * classpath).
  *
  * Reference behavior being mirrored:
  *  - producer: JSON event per message, SASL_PLAINTEXT auth
  *    (reference: src/generate_events.py:47-71);
  *  - consumer: declared schema, JSON decode, starting offset `latest`,
  *    broker-stamped LogAppendTime as event time
  *    (reference: config/glassflow/deduplication_pipeline.json:15-51,
  *    src/utils/kafka.py:38-57).
  */
object KafkaIO {

  final case class KafkaAuth(securityProtocol: String, saslMechanism: String,
                             username: String, password: String)

  object KafkaAuth {
    /** P6 — the reference ships credentials base64-encoded and decodes them
      * before use (reference: src/utils/kafka.py:15-21,
      * src/utils/clickhouse.py:17); same decode at the config edge.
      */
    def fromBase64(securityProtocol: String, saslMechanism: String,
                   username: String, passwordB64: String): KafkaAuth =
      KafkaAuth(securityProtocol, saslMechanism, username,
        new String(java.util.Base64.getDecoder.decode(passwordB64), "UTF-8"))
  }

  /** Base64-decode a PEM root CA to a temp file, returning its path — the
    * reference's TLS edge (src/generate_events.py:52-58: decode `root_ca`,
    * write temp file, point `ssl.ca.location` at it).
    */
  def writeRootCa(rootCaB64: String): String = {
    val f = java.io.File.createTempFile("graft_ca", ".pem")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      java.util.Base64.getDecoder.decode(rootCaB64))
    f.getAbsolutePath
  }

  /** Build the option map shared by reads and writes. SASL credentials become
    * a JAAS config string — the Spark-side equivalent of the reference's
    * `sasl.username/password` producer params.
    */
  /** JAAS string-literal escaping: backslashes and double quotes in
    * credentials would otherwise terminate the quoted value and inject
    * arbitrary JAAS options.
    */
  private[sources] def jaasEscape(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"")

  def options(bootstrap: String, auth: Option[KafkaAuth]): Map[String, String] = {
    val base = Map("kafka.bootstrap.servers" -> bootstrap)
    auth.fold(base) { a =>
      base ++ Map(
        "kafka.security.protocol" -> a.securityProtocol,
        "kafka.sasl.mechanism" -> a.saslMechanism,
        "kafka.sasl.jaas.config" ->
          ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
            s"""username="${jaasEscape(a.username)}" password="${jaasEscape(a.password)}";"""))
    }
  }

  /** Declared source schema → StructType (all-string fields, reference
    * pipeline config field list). Never inferred (SURVEY.md §1.3).
    */
  def schemaOf(fields: Seq[SchemaField]): StructType =
    StructType(fields.map(f => StructField(f.name, StringType, nullable = true)))

  /** Encode every column into one JSON `value` — the producer-side projection
    * (batch or streaming; works on any DataFrame).
    */
  def toJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).cast("string").as("value"))

  /** Producer: write `df` as JSON messages to `topic`. */
  def write(df: DataFrame, topic: String, bootstrap: String,
            auth: Option[KafkaAuth] = None): Unit =
    toJsonValue(df).write.format("kafka")
      .options(options(bootstrap, auth))
      .option("topic", topic)
      .save()

  /** Consumer: streaming read of `topic`, JSON-decoded against the declared
    * schema. Exposes the broker timestamp as `kafka_ts` — the reference's
    * event time is LogAppendTime (src/utils/kafka.py:46-48), so dedup
    * watermarks key off `kafka_ts`, not any payload field.
    */
  def readStream(spark: SparkSession, topic: String, bootstrap: String,
                 fields: Seq[SchemaField], auth: Option[KafkaAuth] = None,
                 startingOffsets: String = "latest"): DataFrame = {
    val raw = spark.readStream.format("kafka")
      .options(options(bootstrap, auth))
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
    decode(raw, fields)
  }

  /** JSON-decode the Kafka wire columns against the declared schema (shared
    * by the streaming reader and batch tests — pure column expressions).
    */
  def decode(raw: DataFrame, fields: Seq[SchemaField]): DataFrame =
    raw.select(
      from_json(col("value").cast("string"), schemaOf(fields)).as("j"),
      col("timestamp").as("kafka_ts"))
      .select(fields.map(f => col(s"j.${f.name}").as(f.name)) :+ col("kafka_ts"): _*)
}
