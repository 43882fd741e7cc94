package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MinHashLSH

/** Session-scoped materialization of the CANONICAL near-dup pair table —
  * the verified MinHash+LSH output (i, j, jac) at the corpus-standard
  * parameters (3-shingles, k=8 signatures, 4 bands of 2, Jaccard ≥ 0.3)
  * that SEVENTEEN queries start from: the whole graph pack (g01–g08 via
  * [[GraphQueries]]) and the dedup consumers d03/d07/d08/d17/d18/d19/
  * d21/d24 (d32 joined in the same round).
  *
  * With [[graft.config.Scale.graphEdgeCache]] on (the bench/pipeline
  * profile), the first consumer in a session writes the full pair table to
  * a session-scoped parquet location and every later consumer — graph or
  * dedup — reads it back: at 100 TB that is ONE corpus scan + banded join
  * for the whole downstream pack instead of seventeen. Off (the test-profile
  * default), every query builds its own pairs and stays fully
  * self-contained against its DuckDB oracle; ScaleConfSpec pins
  * cached == uncached bit-identical on both a graph and a dedup consumer
  * (the jac doubles round-trip parquet exactly).
  *
  * The cache holds PATHS, not DataFrames — parquet on disk survives the
  * bench harness's per-query unpersist sweep, which would truncate a
  * cached localCheckpoint's blocks. Keys are a per-session-INSTANCE UUID
  * (never an identity hash: those are non-unique across live sessions and
  * reusable after GC, which could serve a stale table built under a
  * different conf), the location is shared between driver and executors
  * (`spark.graft.scale.graphEdgeCachePath`, else warehouse-relative), and
  * every root written this JVM is swept on exit.
  */
object MaterializedPairs {

  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]

  /** Cache roots created this JVM, swept by [[cleanupHook]] on exit. Each
    * entry carries the Hadoop conf it was written with so remote-FS roots
    * (HDFS/S3 warehouse) delete through the right filesystem.
    */
  private val cacheRoots = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.hadoop.conf.Configuration]

  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      cacheRoots.forEach { (root, conf) =>
        try {
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(conf).delete(p, true)
        } catch { case _: Throwable => () } // best-effort sweep
      }
    }, "graft-gedges-cleanup"))

  /** A real unique id per session INSTANCE: a fresh UUID minted on first
    * use and held in a weak map (Spark's own `sessionUUID` has the
    * semantics we want but is private[sql]). Weak keys mean a dead
    * session's entry vanishes and a new session can only ever mint a NEW
    * id.
    */
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String])
  private def sessionId(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  /** Where cached pair tables live: `spark.graft.scale.graphEdgeCachePath`
    * if set, else warehouse-relative (`spark.sql.warehouse.dir`) — a
    * location SHARED between driver and executors on a real cluster. A
    * `createTempDirectory` driver-local path would only work when driver
    * and executors share a filesystem (local mode); on the 100 TB cluster
    * shape this knob targets, executors writing/reading a non-shared local
    * path would fail or silently produce partial reads.
    */
  private def cacheRoot(s: SparkSession): String = {
    val base = s.conf.getOption("spark.graft.scale.graphEdgeCachePath")
      .getOrElse(s.conf.get("spark.sql.warehouse.dir"))
    s"${base.stripSuffix("/")}/graft_gedges/${sessionId(s)}"
  }

  /** The canonical verified near-dup pair table (i < j, exact jac ≥ 0.3),
    * materialized once per (session, sfDir) when the knob is on.
    */
  def nearDup(s: SparkSession, dir: String): DataFrame = {
    def build = MinHashLSH.nearDuplicates(Tables.documents(s, dir),
      col("doc_id"), col("text"), shingleN = 3, k = 8, r = 2, threshold = 0.3)
    if (!graft.config.Scale.graphEdgeCache) build
    else {
      cleanupHook // register the exit sweep once
      val key = (sessionId(s), dir)
      val path = pairCache.computeIfAbsent(key, _ => {
        val root = cacheRoot(s)
        cacheRoots.putIfAbsent(root, s.sparkContext.hadoopConfiguration)
        // one subdir per source dir under the session root; the dir string
        // is hashed so URIs/slashes can't break the path
        val p = s"$root/${java.lang.Integer.toHexString(dir.hashCode)}/pairs"
        build.write.mode("overwrite").parquet(p)
        p
      })
      s.read.parquet(path)
    }
  }
}
