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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read as
    * a timestamp. Read it as raw nanos (legacy conf) and truncate to µs —
    * exactly what DuckDB does when casting its TIMESTAMP_NS down — so both
    * engines see identical values.
    */
  private def eventsNorm(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.functions._
    raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
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
