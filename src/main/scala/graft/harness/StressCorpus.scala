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

  /** Materialize both inflated tables under `outDir` with the driver's
    * table filenames, so every `SparkEntry.queries` entry runs against the
    * stress corpus by just receiving `outDir` as its sfDir.
    */
  def write(spark: SparkSession, srcDir: String, outDir: String, n: Int): Unit = {
    documents(spark, srcDir, n).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, srcDir, n).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }
}
