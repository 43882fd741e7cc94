package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library for training-data pipelines — all pure
  * column expressions (codegen'd, no UDFs), so they stay inside
  * WholeStageCodegen and scale linearly with input splits.
  *
  * Cross-engine determinism: token hashing goes through md5 (bit-identical
  * in any engine) rather than Spark's xxhash64/hash, so every operator here
  * is verifiable against a SQL oracle. For pure-Spark workloads xxhash64 is
  * ~5× faster; pass `portableHash = false` where offered.
  */
object TextFunctions {

  /** Whitespace tokenizer (the documents table is space-delimited). */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup.
    * Guarded: Spark's sequence(1, 0) would count DOWN, so short docs map to
    * an empty array instead.
    *
    * Built as a zip_with chain over n length-aligned slices, NOT as
    * `transform(sequence(1, g), i => concat(element_at(ws, i), ...))`: in
    * the latter the tokenizer subtree `ws` sits INSIDE the lambda and is
    * re-evaluated at every position (O(m²) per row — the d26 trap; measured
    * 188 s vs 1 s on 2000-token docs). Here every reference to `ws` is an
    * ARGUMENT (slice/size), evaluated once per row, and the lambdas touch
    * only their own variables.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = tokens(text)
    val g = size(ws) - (n - 1)
    val slices = (0 until n).map(k => slice(ws, lit(k + 1), g))
    val joined = slices.reduceLeft((acc, s) =>
      zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
    array_distinct(
      when(size(ws) >= n, joined)
        .otherwise(array().cast("array<string>")))
  }

  /** 60-bit token hash from the first 15 hex chars of md5 — positive in a
    * signed 64-bit lane in every engine (no sign-extension pitfalls).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit-range hash, for lookup indexing. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Exact content fingerprint: md5 of case-folded, whitespace-collapsed
    * text — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Jaccard similarity of two pre-distinct arrays, as exact-int division. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  /** Language-marker profiles for the n-gram/stopword language-ID heuristic.
    * Order matters: ties resolve to the earliest entry.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "有"))

  /** Per-language stopword-overlap score: |distinct tokens ∩ profile|. */
  def langScore(text: Column, profile: Seq[String]): Column =
    size(array_intersect(distinctTokens(text), array(profile.map(lit): _*)))

  /** Predicted language: argmax of profile scores, first-listed wins ties,
    * "und" (unknown) when all scores are 0.
    */
  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (lang, prof) => lang -> langScore(text, prof) }
    val best = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc > 0 && sc === best, lit(lang)).otherwise(acc)
    }
  }
}
