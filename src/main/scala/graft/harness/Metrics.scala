package graft.harness

/** A1–A5 — result record + derived metric formulas, field-for-field with the
  * reference's TestResultModel (reference: src/utils/metrics.py:13-42) and
  * its arithmetic (src/utils/publish.py:61-65, src/pipeline_test.py:104-111;
  * formulas verified against results/19_05_001_results.csv row 2).
  */
final case class TestResult(
    testId: String,
    variantId: String,
    timestamp: String, // ISO-8601, reference uses datetime.isoformat()
    durationSec: Double,
    paramNumProcesses: Int,
    paramTotalRecords: Long,
    paramDuplicationRate: Double,
    paramDeduplicationWindow: String,
    paramMaxBatchSize: Int,
    paramMaxDelayTime: String,
    resultTotalGenerated: Option[Long] = None,
    resultTotalDuplicates: Option[Long] = None,
    resultNumRecords: Option[Long] = None,
    resultNumProcesses: Option[Int] = None,
    resultTimeTakenPublishMs: Option[Double] = None,
    resultKafkaIngestionRps: Option[Double] = None,
    resultSuccess: Option[Boolean] = None,
    resultTimeTakenMs: Option[Double] = None,
    resultAvgLatencyMs: Option[Double] = None,
    resultLagMs: Option[Double] = None,
    resultGlassflowRps: Option[Double] = None)

object TestResult {
  /** CSV column order — exactly the reference's header
    * (results/19_05_001_results.csv:1).
    */
  val Columns: Seq[String] = Seq(
    "test_id", "variant_id", "timestamp", "duration_sec",
    "param_num_processes", "param_total_records", "param_duplication_rate",
    "param_deduplication_window", "param_max_batch_size", "param_max_delay_time",
    "result_total_generated", "result_total_duplicates", "result_num_records",
    "result_num_processes", "result_time_taken_publish_ms",
    "result_kafka_ingestion_rps", "result_success", "result_time_taken_ms",
    "result_avg_latency_ms", "result_lag_ms", "result_glassflow_rps")

  def toRow(r: TestResult): Seq[String] = {
    def o[T](v: Option[T]): String = v.map(_.toString).getOrElse("")
    Seq(r.testId, r.variantId, r.timestamp, r.durationSec.toString,
      r.paramNumProcesses.toString, r.paramTotalRecords.toString,
      r.paramDuplicationRate.toString, r.paramDeduplicationWindow,
      r.paramMaxBatchSize.toString, r.paramMaxDelayTime,
      o(r.resultTotalGenerated), o(r.resultTotalDuplicates),
      o(r.resultNumRecords), o(r.resultNumProcesses),
      o(r.resultTimeTakenPublishMs), o(r.resultKafkaIngestionRps),
      o(r.resultSuccess.map(b => if (b) "True" else "False")),
      o(r.resultTimeTakenMs), o(r.resultAvgLatencyMs), o(r.resultLagMs),
      o(r.resultGlassflowRps))
  }
}

object Metrics {

  /** Duplicate arithmetic (reference: src/generate_events.py:31-39):
    * of `sent` records, unique = sent/(1+ratio) (int division), duplicates
    * make up the rest. CSV row 2: 5,000,000 sent → 4,545,454 + 454,546.
    */
  def uniqueOf(sent: Long, ratio: Double): Long = (sent / (1 + ratio)).toLong
  def duplicatesOf(sent: Long, ratio: Double): Long = sent - uniqueOf(sent, ratio)

  /** kafka_ingestion_rps = num_records * 1000 / max(per-process publish ms)
    * (reference: src/utils/publish.py:62,65 — rounded to int).
    */
  def kafkaIngestionRps(numRecords: Long, publishMs: Double): Double =
    math.round(numRecords * 1000.0 / publishMs).toDouble

  /** avg_latency_ms = time_ms / records — throughput⁻¹, not true latency;
    * name kept for CSV parity (reference: src/pipeline_test.py:109,
    * SURVEY.md §2.10).
    */
  def avgLatencyMs(timeTakenMs: Double, numRecords: Long): Double =
    timeTakenMs / numRecords

  /** glassflow_rps = records / time_ms * 1000, rounded
    * (reference: src/pipeline_test.py:111).
    */
  def engineRps(numRecords: Long, timeTakenMs: Double): Double =
    math.round(numRecords / timeTakenMs * 1000.0).toDouble

  /** Progress percentage with Δ≥5 gating (reference:
    * src/pipeline_test.py:25-35). Returns the new "last logged" value.
    */
  def progressPct(added: Long, total: Long): Long =
    math.round(added * 100.0 / total)

  /** O6 — per-variant result table (reference `display_results`,
    * src/utils/metrics.py:155-165: same metric rows, same rounding; plain
    * aligned text instead of the rich console). Pure function so the CLI
    * prints it and the spec pins it.
    */
  def displayTable(r: TestResult): String = {
    def d(v: Option[Double], places: Int): String =
      v.map(x => s"%.${places}f".format(x)).getOrElse("-")
    val rows = Seq(
      "Status" -> (if (r.resultSuccess.contains(true)) "Success" else "Failed"),
      "Duration" -> f"${r.durationSec}%.2f seconds",
      "Records Processed" -> r.resultNumRecords.map(_.toString).getOrElse("-"),
      "Source RPS in Kafka" -> d(r.resultKafkaIngestionRps, 0),
      "Average Latency" -> s"${d(r.resultAvgLatencyMs, 4)} ms",
      "Lag" -> s"${d(r.resultLagMs, 2)} ms",
      "Engine RPS" -> s"${d(r.resultGlassflowRps, 2)} records/s")
    val w = rows.map(_._1.length).max
    val header = s"Test Results [${r.testId}/${r.variantId}]"
    (header +: rows.map { case (k, v) => s"  ${k.padTo(w, ' ')}  $v" })
      .mkString("\n")
  }
}
