package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection over word shingles.
  *
  * Pipeline: shingle → k independent minhashes (map-side-combinable MIN
  * aggregations over exploded shingles — one shuffle on doc_id) → group
  * adjacent minhashes into bands → equi-join on (band index, band value) for
  * candidates (O(n·bands) rows, never O(n²)) → exact Jaccard verification of
  * candidates only.
  *
  * Hash family: h_j(s) = md5("<j>:" + s), compared lexicographically — no
  * engine-specific hash, so an external SQL oracle reproduces the exact
  * candidate set. Probability a pair with Jaccard J collides on one band of
  * r rows is J^r; candidates are then verified exactly, so false positives
  * cost only the verification join and false negatives follow the standard
  * (k, r) S-curve.
  */
object MinHashLSH {

  /** (doc_id, shingles) → (doc_id, m0..m{k-1}). */
  def signatures(docs: DataFrame, docId: Column, shingles: Column, k: Int): DataFrame = {
    val exploded = docs.select(docId.as("doc_id"), explode(shingles).as("sh"))
    val aggs = (0 until k).map(j => min(md5(concat(lit(s"$j:"), col("sh")))).as(s"m$j"))
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Bands of `r` adjacent signature columns, hashed to one value each. */
  def banded(sig: DataFrame, k: Int, r: Int): DataFrame = {
    val nBands = k / r
    val bands = (0 until nBands).map { b =>
      val cols = (b * r until (b + 1) * r).map(j => col(s"m$j"))
      struct(lit(b).as("band_idx"), md5(concat(cols: _*)).as("band_val"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val"))
  }

  /** Candidate pairs (i < j) colliding on at least one band. */
  def candidates(bandedDf: DataFrame): DataFrame = {
    val l = bandedDf.as("l")
    val r = bandedDf.as("r")
    l.join(r,
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_val") === col("r.band_val") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))
      .distinct()
  }

  /** Full pipeline over a text column: near-dup pairs with exact-verified
    * Jaccard >= threshold among LSH candidates.
    */
  def nearDuplicates(docs: DataFrame, docId: Column, text: Column,
                     shingleN: Int, k: Int, r: Int, threshold: Double): DataFrame = {
    val withSh = docs.select(docId.as("doc_id"),
      TextFunctions.wordShingles(text, shingleN).as("shingles"))
    val sig = signatures(withSh, col("doc_id"), col("shingles"), k)
    val cand = candidates(banded(sig, k, r))
    val sets = withSh.select(col("doc_id"), col("shingles"))
    cand
      .join(sets.as("sa"), col("i") === col("sa.doc_id"))
      .join(sets.as("sb"), col("j") === col("sb.doc_id"))
      .select(col("i"), col("j"),
        TextFunctions.jaccard(col("sa.shingles"), col("sb.shingles")).as("jac"))
      .filter(col("jac") >= threshold)
  }
}
