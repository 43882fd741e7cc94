package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** O1 — pipeline lifecycle, Spark-native: the reference drives an external
  * engine over REST with create / get-running / stop-if-running / delete and
  * an "already exists" / "not found" error taxonomy
  * (reference: src/utils/pipeline.py:10-123). Here the pipeline IS a
  * StreamingQuery; the same state machine maps onto the session's
  * StreamingQueryManager, keyed by query name.
  */
object QueryLifecycle {

  final case class AlreadyExists(name: String)
    extends RuntimeException(s"pipeline '$name' already exists")
  final case class NotFound(name: String)
    extends RuntimeException(s"pipeline '$name' not found")

  /** Running query by name, if any. */
  def getRunning(spark: SparkSession, name: String): Option[StreamingQuery] =
    spark.streams.active.find(q => Option(q.name).contains(name))

  /** Create via `start`; refuses to double-start the same name (the
    * reference's 'already exists' arm, src/utils/pipeline.py:73-113).
    */
  def create(spark: SparkSession, name: String)
            (start: String => StreamingQuery): StreamingQuery = {
    if (getRunning(spark, name).isDefined) throw AlreadyExists(name)
    start(name)
  }

  /** Stop iff running; false when nothing was running (the reference's
    * stop_if_running, src/utils/pipeline.py).
    */
  def stopIfRunning(spark: SparkSession, name: String): Boolean =
    getRunning(spark, name) match {
      case Some(q) => q.stop(); true
      case None => false
    }

  /** Delete = stop + forget; throws NotFound if it never existed (the
    * reference's 'not found' arm).
    */
  def delete(spark: SparkSession, name: String): Unit =
    getRunning(spark, name) match {
      case Some(q) => q.stop()
      case None => throw NotFound(name)
    }

  /** Replace-or-create: the pre_process flow (stop old pipeline, start new —
    * reference: src/pre_process.py:37-62).
    */
  def createOrReplace(spark: SparkSession, name: String)
                     (start: String => StreamingQuery): StreamingQuery = {
    stopIfRunning(spark, name)
    start(name)
  }
}
