package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every operator query receives an `sfDir` (e.g. /root/testdata/sf0.01) and
  * reads only through here, so scans stay uniform: parquet source → Catalyst
  * column pruning + predicate pushdown. No schema inference beyond the
  * parquet footer (SURVEY.md §1.3: schemas are declared, never inferred).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsNorm(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts normalization, robust to the two physical types the driver
    * has shipped: parquet TIMESTAMP(NANOS) (Spark 4 refuses it as a
    * timestamp — read raw nanos via the legacy conf and truncate to µs,
    * exactly DuckDB's TIMESTAMP_NS downcast) and plain TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ — cast to the session-TZ timestamp; the
    * session is pinned UTC so values are identical instants). Either way
    * downstream operators see one canonical µs TimestampType `ts`.
    */
  private def eventsNorm(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** The `ts`-column half of [[eventsNorm]], shared with streaming readers
    * that re-read the raw parquet through a file-source stream and must
    * apply the identical normalization (StreamBatchAgreementSpec).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long (legacy TIMESTAMP(NANOS) testdata)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Register every table as a temp view so the engine's full surface is
    * reachable from `spark.sql(...)` (same names the DuckDB oracles use).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memoized total row count of `<sfDir>/<name>.parquet` — sizes scale
    * parameters (VectorFunctions.planesFor) without paying a count job on
    * every query build. Safe per JVM: the driver's testdata dirs are
    * immutable within a session.
    */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$sfDir/$name",
      _ => java.lang.Long.valueOf(apply(spark, sfDir, name).count())).longValue()

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
