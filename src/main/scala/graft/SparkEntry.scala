package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.FieldMapping
import graft.operators.{Dedup, DuplicateInjector, EventGenerator, MappingProjection}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Query packs, one per operator family (SURVEY.md §2). */
  private def packs: Seq[QueryPack] =
    Seq(CoreQueries, TextQueries, DedupQueries, SimilarityQueries, JoinQueries,
      MultimodalQueries, RelationalQueries, GraphQueries)

  // a def, not a lazy val: the oracle SQL builders read the graft.scale.*
  // conf knobs at build time, so the registry must re-evaluate per access —
  // caching would freeze the first session's knob values forever
  private def all: Seq[QueryDef] = packs.flatMap(_.defs)

  /** Flagship: the reference's whole pipeline, batch form —
    * S1 generator → S2 duplicate injection → ST1 keep-first dedup →
    * P1 mapping projection into the reference sink schema
    * (reference: config/glassflow/deduplication_pipeline.json:68-99).
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val gen = EventGenerator.generate(spark, 1000L, seed = 42L)
    val sent = DuplicateInjector.injectEveryK(gen, col("row_id"), 10)
    val dedup = Dedup.keepFirst(sent, Seq("event_id"),
      to_timestamp(col("created_at")), col("row_id"))
    MappingProjection(dedup, Seq(
      FieldMapping("event_id", "event_id", "uuid"),
      FieldMapping("user_id", "user_id", "uuid"),
      FieldMapping("created_at", "created_at", "datetime"),
      FieldMapping("name", "user_name", "string"),
      FieldMapping("email", "user_email", "string")))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** LINEAR alternate oracles for queries whose registry oracle is a
    * deliberately super-linear readable spec (r27/r32/r33's step-join
    * EXISTS forms) — used by the ×10 overflow correctness gate, where
    * the quadratic/cubic forms are infeasible at ~10k events/user.
    * `graft.Verify` overlays these when SPARK_GRAFT_ORACLE_LINEAR=1;
    * the driver's own rounds always see [[oracleSql]] unchanged.
    */
  def oracleSqlLinear: Map[String, String] = RelationalQueries.linearOracles
}
