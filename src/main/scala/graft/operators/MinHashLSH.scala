package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSig, ShingleHashes, TextFunctions}

/** MinHash + LSH near-duplicate detection over hashed word shingles.
  *
  * Pipeline: shingle-hash (one md5 per shingle → 60-bit long, see
  * ShingleHashes) → k minhashes via Kirsch–Mitzenmacher double hashing
  * (per-row native MinHashSig — zero shuffle) → bands of
  * r adjacent minhashes combined into one integer band value → equi-join on
  * (band index, band value) for candidates (O(n·bands) rows, never O(n²)) →
  * exact Jaccard verification of candidates over the hashed shingle sets.
  *
  * Hash family — portable integer arithmetic, reproducible in any SQL engine
  * (no engine-specific hash functions):
  *   s   = 60-bit shingle hash (first 15 hex digits of md5)
  *   h1  = s mod 2³², h2 = (s >> 28) | 1   (forced odd)
  *   m_j = min over shingles of (h1 + j·h2) mod 2³²
  * One md5 per shingle total — versus one per (shingle × k) for the naive
  * per-function-md5 family — and all downstream state is 8-byte longs.
  * Probability a pair with Jaccard J collides on a band of r rows is J^r;
  * candidates are verified exactly, so false positives only cost the
  * verification join and false negatives follow the standard (k, r) S-curve.
  */
object MinHashLSH {

  /** (doc_id, shingleHashes: array<long>) → (doc_id, m0..m{k-1}).
    *
    * Computed PER ROW — a doc's signature depends only on its own shingle
    * set, so there is nothing to shuffle. (The naive explode →
    * groupBy(doc_id) → k MIN aggs form exchanges one row per (doc ×
    * shingle); at 100 TB that shuffle dwarfs the arithmetic. The composable
    * per-row form `array_min(transform(...))` × k is interpreted, outside
    * codegen — see MinHashSig, which computes all k minima in one codegen'd
    * pass.) Docs with no shingles (< n tokens) are dropped, matching the
    * grouped form which emits no row for an empty group.
    */
  def signatures(docs: DataFrame, docId: Column, shingleHashes: Column,
                 k: Int): DataFrame =
    docs.filter(size(shingleHashes) > 0)
      .select(docId.as("doc_id"), MinHashSig(shingleHashes, k).as("sig"))
      .select(col("doc_id") +: mCols(col("sig"), k): _*)

  /** m0..m{k-1} projections over a `MinHashSig` array column. */
  def mCols(sig: Column, k: Int): Seq[Column] =
    (0 until k).map(j => sig.getItem(j).as(s"m$j"))

  /** array<struct<band_idx, band_val>> over existing m0..m{k-1} columns. */
  def bandArray(k: Int, r: Int): Column = {
    val bands = (0 until k / r).map { b =>
      val cols = (b * r until (b + 1) * r).map(j => col(s"m$j"))
      val bv = cols.reduce((acc, m) => acc * 1000003L + m)
      struct(lit(b).as("band_idx"), bv.as("band_val"))
    }
    array(bands: _*)
  }

  /** Bands of `r` adjacent signature columns, combined into one long each
    * (m·1000003 + m' per step — collisions are astronomically rare and only
    * add candidates, which exact verification then filters).
    */
  def banded(sig: DataFrame, k: Int, r: Int): DataFrame =
    sig.select(col("doc_id"), explode(bandArray(k, r)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val"))

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
    * Jaccard >= threshold among LSH candidates. Jaccard is computed over the
    * hashed shingle sets (8-byte elements) — identical to string-shingle
    * Jaccard up to 60-bit hash collisions, which an oracle reproduces by
    * hashing the same way.
    */
  def nearDuplicates(docs: DataFrame, docId: Column, text: Column,
                     shingleN: Int, k: Int, r: Int, threshold: Double): DataFrame =
    nearDuplicatesFrom(
      docs.select(docId.as("doc_id"),
        ShingleHashes(TextFunctions.tokens(text), shingleN).as("shingles")),
      shingles = org.apache.spark.sql.functions.col("shingles"),
      k = k, r = r, threshold = threshold)

  /** [[nearDuplicates]] from a caller-supplied `(doc_id, <shingles>)`
    * frame — the seam that lets a session-materialized shingle table
    * (graft.queries.MaterializedShingles) feed the pair build without a
    * second tokenize+shingle corpus scan. The frame is referenced three
    * times (signatures + both verify sides), so callers should pass a
    * materialized frame.
    */
  def nearDuplicatesFrom(withSh: DataFrame, shingles: Column,
                         k: Int, r: Int, threshold: Double): DataFrame = {
    val sig = signatures(withSh, col("doc_id"), shingles, k)
    val cand = candidates(banded(sig, k, r))
    val sets = withSh.select(col("doc_id"), shingles.as("shingles"))
    cand
      .join(sets.as("sa"), col("i") === col("sa.doc_id"))
      .join(sets.as("sb"), col("j") === col("sb.doc_id"))
      .select(col("i"), col("j"),
        TextFunctions.jaccard(col("sa.shingles"), col("sb.shingles")).as("jac"))
      .filter(col("jac") >= threshold)
  }
}
