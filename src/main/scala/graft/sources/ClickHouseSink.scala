package graft.sources

import org.apache.spark.sql.DataFrame

import graft.config.{JoinConfig, SinkConfig}

/** S5/S6 — ClickHouse sink edge: DDL generation + batched JDBC writer.
  *
  * Reference behavior mirrored:
  *  - DDL: `CREATE TABLE IF NOT EXISTS t (cols) ENGINE = MergeTree ORDER BY k`
  *    where k = the join key when a join is enabled, else the first mapped
  *    column (reference: src/utils/clickhouse.py:22-52, src/pre_process.py:9-12);
  *  - type lattice string→{UUID, DateTime, String}
  *    (reference: config/glassflow/deduplication_pipeline.json:73-91);
  *  - batched inserts flushed by `max_batch_size` rows
  *    (reference: deduplication_pipeline.json:65-66).
  *
  * Offline by design: DDL/options are pure functions (unit-tested); the JDBC
  * call itself happens only when a reachable `jdbcUrl` is supplied. The
  * foreachBatch hook in graft.streaming.StreamingPipeline supplies the
  * at-least-once micro-batch; pair with ReplacingMergeTree or a
  * batchId-keyed insert-dedup table for effective exactly-once
  * (SURVEY.md §7.4).
  */
object ClickHouseSink {

  /** Reference type lattice → ClickHouse column types. */
  def chType(columnType: String): String = columnType match {
    case "uuid"     => "UUID"
    case "datetime" => "DateTime"
    case "int"      => "Int32"
    case "long"     => "Int64"
    case "double"   => "Float64"
    case _          => "String"
  }

  /** MergeTree DDL with the reference's ORDER BY rule. */
  def createTableDdl(sink: SinkConfig, join: Option[JoinConfig]): String = {
    val cols = sink.tableMapping
      .map(m => s"`${m.columnName}` ${chType(m.columnType)}")
      .mkString(", ")
    val orderBy = sink.orderByKey(join)
    s"CREATE TABLE IF NOT EXISTS ${sink.table} ($cols) " +
      s"ENGINE = MergeTree() ORDER BY (`$orderBy`)"
  }

  /** JDBC writer options for one micro-batch: `batchsize` is the reference's
    * `max_batch_size` flush knob; `createTableOptions` carries the MergeTree
    * clause for first-write DDL.
    */
  def jdbcOptions(sink: SinkConfig, join: Option[JoinConfig]): Map[String, String] =
    Map(
      "dbtable" -> sink.table,
      "batchsize" -> sink.maxBatchSize.toString,
      "createTableOptions" ->
        s"ENGINE = MergeTree() ORDER BY (`${sink.orderByKey(join)}`)",
      "isolationLevel" -> "NONE")

  /** The foreachBatch body: write one micro-batch over JDBC. */
  def writeBatch(batch: DataFrame, jdbcUrl: String, sink: SinkConfig,
                 join: Option[JoinConfig]): Unit =
    batch.write.mode("append")
      .format("jdbc")
      .option("url", jdbcUrl)
      .options(jdbcOptions(sink, join))
      .save()

  /** Batch-id-keyed replay suppression for the JDBC sink — the `(table,
    * batchId)` bookkeeping scheme IdempotentParquetSink's epoch directories
    * implement for files. A replayed micro-batch finds its marker row in
    * `<table>__epochs` and writes nothing; returns false in that case.
    *
    * The marker is inserted AFTER the data write (ClickHouse has no
    * cross-statement transaction), so a crash between the two replays that
    * one batch — at-least-once in the failure window, exactly-once in
    * steady state; pair with ReplacingMergeTree keyed on the dedup id when
    * the window must be closed too. Exercised live by LiveSinkSpec when
    * `SPARK_GRAFT_CH_URL` is set.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, jdbcUrl: String,
                           sink: SinkConfig, join: Option[JoinConfig]): Boolean = {
    val epochs = s"${sink.table}__epochs"
    val conn = java.sql.DriverManager.getConnection(jdbcUrl)
    try {
      val st = conn.createStatement()
      try {
        st.execute(s"CREATE TABLE IF NOT EXISTS `$epochs` (`batch_id` Int64) " +
          "ENGINE = MergeTree() ORDER BY (`batch_id`)")
        val rs = st.executeQuery(
          s"SELECT COUNT(*) FROM `$epochs` WHERE `batch_id` = $batchId")
        val replayed = rs.next() && rs.getLong(1) > 0
        if (replayed) false
        else {
          writeBatch(batch, jdbcUrl, sink, join)
          st.execute(s"INSERT INTO `$epochs` (`batch_id`) VALUES ($batchId)")
          true
        }
      } finally st.close()
    } finally conn.close()
  }
}
