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

  /** Round-18: memoized relation resolution. Every `spark.read.parquet`
    * resolves the source eagerly — file listing plus a footer-reading
    * schema-inference JOB — measured at ~50 ms per call on this box; the
    * bench builds ~2-3 table reads per query × 219 queries, so re-resolving
    * was ~20 s of pure metadata overhead per sweep. The resolved DataFrame
    * (schema + InMemoryFileIndex — METADATA only, never rows or results) is
    * reused per (session, path): exactly what a catalog-backed table gives
    * a production cluster, where the metastore owns the schema and the scan
    * still reads every byte from parquet at execution time. Safe here
    * because the corpus dirs are immutable for a JVM's lifetime (testdata
    * is read-only; stress/inflate corpora write to fresh temp dirs — and
    * [[invalidate]] exists for any future writer that reuses a path).
    * Keyed by the owning SparkSession: a new session never sees plans from
    * a stopped one, and [[evictStopped]] (run on every read-through) drops
    * a stopped session's entries so a long-lived multi-session JVM cannot
    * accumulate dead plans or pin dead sessions (round-19, the round-18
    * verdict's retention item).
    *
    * The map holds MEMOIZED THUNKS, not eagerly-resolved frames: under
    * `computeIfAbsent` only the lazy holder is constructed — O(1) inside
    * the bin lock — and the file-listing/footer job runs on first
    * dereference under the holder's own monitor, outside the map (the
    * SessionCache.readThrough pattern; round-18 advice).
    *
    * Self-join caveat: repeated reads return the SAME DataFrame object,
    * so a future query joining a table to itself via `df1("c") === df2("c")`
    * on two Tables reads would hit AMBIGUOUS_SELF_JOIN where fresh reads
    * disambiguated by expression id. No current query does (all self-joins
    * alias with `.as(...)` — 219/219 oracle parity); a caller that needs
    * distinct lineage should clone with `.toDF()`.
    */
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), () => DataFrame]()

  /** Drop entries owned by stopped sessions. The predicate is injectable
    * only for the spec (the suite's one shared context must stay alive);
    * production callers use the default.
    */
  private[graft] def evictStopped(
      stopped: SparkSession => Boolean = _.sparkContext.isStopped): Unit =
    dfCache.keySet.removeIf(k => stopped(k._1))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    evictStopped()
    dfCache.computeIfAbsent((spark, s"$sfDir/$name"), _ => {
      lazy val df: DataFrame =
        if (name == "events") eventsNorm(spark, sfDir)
        else spark.read.parquet(s"$sfDir/$name.parquet")
      () => df
    })()
  }

  /** Drop memoized relations AND row counts under `sfDir` (call after
    * overwriting a corpus path in place — no current writer does; all
    * stress corpora are fresh temp dirs).
    */
  def invalidate(sfDir: String): Unit = {
    dfCache.keySet.removeIf(_._2.startsWith(sfDir + "/"))
    rowCountCache.keySet.removeIf(_.startsWith(sfDir + "/"))
  }

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

  private[graft] val rowCountCache =
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
