package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic ×N inflation of the documents/embeddings tables with
  * CONTROLLED duplicate structure — the corpus the stress bench runs the
  * heavy dedup/ANN/text pack against to measure scaling empirically
  * instead of arguing it from plan shape.
  *
  * Every output row derives from (base row, replica r) through pure
  * codegen column expressions — no driver loops, no sampling jitter: the
  * same (srcDir, n) always produces the identical corpus, so stress
  * numbers are comparable across rounds.
  *
  * Replica composition mirrors the duplicate arithmetic the reference
  * harness injects into its event stream (10% duplicates at the default
  * profile — reference: src/generate_events.py:31-39, re-derived): replica
  * 0 is the base corpus byte-for-byte; each further replica is, per row by
  * a seeded hash split, 10% EXACT duplicate (same text/vector, new id),
  * 10% NEAR duplicate (one appended token / one perturbed dimension —
  * Jaccard ≈ 1 for real documents, cosine ≈ 1 for vectors), 80% novel
  * (re-suffixed vocabulary / fresh hash-derived vector) — so dedup-family
  * queries see duplicate work that GROWS with the corpus the way a real
  * crawl's does, while text-stats queries see realistic length/shape
  * distributions throughout.
  */
object StressCorpus {

  /** documents ×n: (doc_id·n + r) keeps ids unique and replica-0 ids
    * recoverable (doc_id·n).
    */
  def documents(spark: SparkSession, srcDir: String, n: Int): DataFrame = {
    require(n >= 1, s"factor must be >= 1, got $n")
    val base = Tables.documents(spark, srcDir)
    val reps = base.crossJoin(
      spark.range(n).select(col("id").as("r")))
    val h = pmod(hash(col("doc_id"), col("r"), lit("#stress")), lit(100))
    // novel docs re-suffix every token with the replica id: identical
    // length/token-count statistics, zero shingle overlap with other
    // replicas — d02/d03/t24 candidate volume stays governed by the
    // CONTROLLED duplicate fractions, not by accidental vocabulary overlap
    val novel = concat_ws(" ",
      transform(split(col("text"), " "),
        w => concat(w, lit("_"), col("r"))))
    val nearDup = concat(col("text"), lit(" nd"), col("r"))
    val text2 = when(col("r") === 0, col("text"))
      .when(h < 10, col("text"))
      .when(h < 20, nearDup)
      .otherwise(novel)
    reps.select(
      (col("doc_id") * n + col("r")).as("doc_id"),
      text2.as("text"), col("lang"), col("source"),
      length(text2).cast("long").as("n_chars"))
  }

  /** embeddings ×n: same split; near-dups scale ONE dimension by ~2%
    * (cosine ≥ 0.999 against the source vector), novel vectors are fresh
    * iid hash-derived floats in the base value range.
    */
  def embeddings(spark: SparkSession, srcDir: String, n: Int): DataFrame = {
    require(n >= 1, s"factor must be >= 1, got $n")
    val base = Tables.embeddings(spark, srcDir)
    val dims = base.select(size(col("embedding"))).head().getInt(0)
    val reps = base.crossJoin(
      spark.range(n).select(col("id").as("r")))
    val h = pmod(hash(col("vec_id"), col("r"), lit("#stress")), lit(100))
    val novel = array((0 until dims).map(i =>
      ((pmod(hash(col("vec_id"), col("r"), lit(i)), lit(20001)) - lit(10000))
        .cast("double") / lit(10000.0)).cast("float")): _*)
    val nearDup = transform(col("embedding"), (x, i) =>
      when(i === pmod(col("r"), lit(dims)), x * lit(1.02f)).otherwise(x))
    val emb2 = when(col("r") === 0, col("embedding"))
      .when(h < 10, col("embedding"))
      .when(h < 20, nearDup)
      .otherwise(novel)
    reps.select(
      (col("vec_id") * n + col("r")).as("vec_id"),
      emb2.as("embedding"), col("label"))
  }

  /** lineitem ×n: each replica keeps every basket's part composition
    * byte-for-byte but lives under a fresh order key (l_orderkey·n + r) —
    * ORDERS multiply, per-order baskets don't, so co-purchase pair volume
    * (r26's cost driver) grows exactly ×n and lift values are invariant.
    * A replica that also remapped partkeys would instead hold pair SUPPORT
    * constant while the support threshold filters everything out; keeping
    * parts fixed is what makes the ×n arm measure the pair join's scaling.
    */
  def lineitem(spark: SparkSession, srcDir: String, n: Int): DataFrame = {
    require(n >= 1, s"factor must be >= 1, got $n")
    val base = Tables.lineitem(spark, srcDir)
    base.crossJoin(spark.range(n).select(col("id").as("r")))
      .withColumn("l_orderkey", col("l_orderkey") * n + col("r"))
      .drop("r")
  }

  /** events ×n: fresh unique event ids, everything else byte-identical —
    * group keys (event_type), user ids, values, and timestamps all repeat,
    * so every per-group aggregate sees EXACTLY ×n the rows over the same
    * key space. This is the overflow-exercise shape: the moment-sum pack's
    * per-group Σvq/Σvq² row counts grow ×n while n_users/count-distinct
    * results stay pinned to the base corpus, and the DuckDB oracle computes
    * the same inflated input exactly (HUGEINT), so a decimal-path slip on
    * the Spark side lands as a hash mismatch, not a silent wrap.
    */
  def events(spark: SparkSession, srcDir: String, n: Int): DataFrame = {
    require(n >= 1, s"factor must be >= 1, got $n")
    Tables.events(spark, srcDir)
      .crossJoin(spark.range(n).select(col("id").as("r")))
      .withColumn("event_id", col("event_id") * n + col("r"))
      .drop("r")
  }

  /** orders ×n: fresh order keys, all other columns (dates, priorities,
    * totals) byte-identical — time-bucketed groups grow ×n.
    */
  def orders(spark: SparkSession, srcDir: String, n: Int): DataFrame = {
    require(n >= 1, s"factor must be >= 1, got $n")
    Tables.orders(spark, srcDir)
      .crossJoin(spark.range(n).select(col("id").as("r")))
      .withColumn("o_orderkey", col("o_orderkey") * n + col("r"))
      .drop("r")
  }

  /** Materialize the inflated tables under `outDir` with the driver's
    * table filenames, so every `SparkEntry.queries` entry runs against the
    * stress corpus by just receiving `outDir` as its sfDir.
    */
  def write(spark: SparkSession, srcDir: String, outDir: String, n: Int): Unit = {
    documents(spark, srcDir, n).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, srcDir, n).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    lineitem(spark, srcDir, n).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    // orders inflates under the SAME key remap as lineitem (k·n + r on
    // both sides), so per-replica referential integrity holds and the
    // pack's order-join queries (q20/q23) measure a join whose fact sides
    // both grew ×n. Dimension tables pass through unchanged — at any SF
    // they are the broadcast side, and inflating them would change what
    // the queries mean, not how they scale.
    orders(spark, srcDir, n).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$srcDir/$dim.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$dim.parquet")
  }
}
