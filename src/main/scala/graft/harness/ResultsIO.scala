package graft.harness

import java.io.{File, FileWriter, PrintWriter}
import scala.io.Source
import scala.util.Try

/** S12/S13 — results CSV append-writer and validated reader
  * (reference: src/utils/metrics.py:98-106, 117-150).
  *
  * Driver-side java.io by design: the result set is tiny (one row per
  * variant). Values are stringified on write and strictly re-validated on
  * read — field-set equality first, then per-row typed parse, skipping (and
  * reporting) bad rows, exactly the reference's tolerance.
  */
final class ResultsIO(path: String) {

  /** Append one result; write the header iff the file is new/empty
    * (reference: header-once append, src/utils/metrics.py:98-106).
    */
  def writeResult(r: TestResult): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val fresh = !f.exists() || f.length() == 0
    val w = new PrintWriter(new FileWriter(f, true))
    try {
      if (fresh) w.println(TestResult.Columns.mkString(","))
      w.println(TestResult.toRow(r).map(csvQuote).mkString(","))
    } finally w.close()
  }

  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Read + validate: strict header field-set equality, then per-row parse;
    * malformed rows are skipped with a notice (reference:
    * src/utils/metrics.py:137-150).
    */
  def readValidatedResults(): Seq[TestResult] = {
    val f = new File(path)
    if (!f.exists()) return Seq.empty
    val src = Source.fromFile(f)
    try {
      val lines = src.getLines().toSeq
      if (lines.isEmpty) return Seq.empty
      val header = splitCsv(lines.head)
      if (header.toSet != TestResult.Columns.toSet) {
        System.err.println(
          s"[results] header mismatch: ${header.toSet.diff(TestResult.Columns.toSet)} " +
            s"unexpected, ${TestResult.Columns.toSet.diff(header.toSet)} missing")
        return Seq.empty
      }
      val idx = TestResult.Columns.map(c => c -> header.indexOf(c)).toMap
      lines.tail.zipWithIndex.flatMap { case (line, i) =>
        parseRow(splitCsv(line), idx) match {
          case Some(r) => Some(r)
          case None =>
            System.err.println(s"[results] skipping invalid row ${i + 2}")
            None
        }
      }
    } finally src.close()
  }

  /** Variant ids already completed — the resume anti-join's build side
    * (reference: src/test_executor.py:73-74).
    */
  def completedVariantIds(): Set[String] =
    readValidatedResults().map(_.variantId).toSet

  private def parseRow(row: Seq[String], idx: Map[String, Int]): Option[TestResult] = {
    def at(c: String): Option[String] =
      idx.get(c).filter(i => i >= 0 && i < row.size).map(row(_))
    def req(c: String): Option[String] = at(c).filter(_.nonEmpty)
    def opt[T](c: String, f: String => T): Option[Option[T]] = at(c) match {
      case None | Some("") => Some(None)
      case Some(v) => Try(f(v)).toOption.map(Some(_))
    }
    for {
      testId <- req("test_id")
      variantId <- req("variant_id")
      ts <- req("timestamp")
      dur <- req("duration_sec").flatMap(v => Try(v.toDouble).toOption)
      np <- req("param_num_processes").flatMap(v => Try(v.toInt).toOption)
      tr <- req("param_total_records").flatMap(v => Try(v.toLong).toOption)
      dr <- req("param_duplication_rate").flatMap(v => Try(v.toDouble).toOption)
      dw <- req("param_deduplication_window")
      mbs <- req("param_max_batch_size").flatMap(v => Try(v.toInt).toOption)
      mdt <- req("param_max_delay_time")
      rtg <- opt("result_total_generated", _.toLong)
      rtd <- opt("result_total_duplicates", _.toLong)
      rnr <- opt("result_num_records", _.toLong)
      rnp <- opt("result_num_processes", _.toInt)
      rtp <- opt("result_time_taken_publish_ms", _.toDouble)
      rki <- opt("result_kafka_ingestion_rps", _.toDouble)
      rsu <- opt("result_success", s => s == "True" || s == "true")
      rtt <- opt("result_time_taken_ms", _.toDouble)
      ral <- opt("result_avg_latency_ms", _.toDouble)
      rlg <- opt("result_lag_ms", _.toDouble)
      rgr <- opt("result_glassflow_rps", _.toDouble)
    } yield TestResult(testId, variantId, ts, dur, np, tr, dr, dw, mbs, mdt,
      rtg, rtd, rnr, rnp, rtp, rki, rsu, rtt, ral, rlg, rgr)
  }

  /** Minimal RFC-4180 line splitter (quoted fields with "" escapes). */
  private def splitCsv(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }
}
