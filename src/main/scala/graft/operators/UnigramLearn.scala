package graft.operators

import scala.collection.mutable

/** Unigram-LM (SentencePiece-style) vocabulary learning — the OTHER
  * canonical subword trainer next to [[BpeLearn]] (Kudo 2018,
  * "Subword Regularization": seed a large candidate vocabulary, run EM
  * over piece likelihoods, prune to a target size). This is the
  * deterministic hard-EM (Viterbi) variant, integer-quantized end to
  * end so a DuckDB oracle can replay the identical rounds:
  *
  *   - '''seed''': every substring of length 1..[[MaxPieceLen]] of the
  *     frequency-capped word-type table, counted with overlaps and
  *     weighted by type frequency; ALL single characters are kept
  *     (coverage — every word stays segmentable) plus the top
  *     `seedCap` multi-character pieces by (count DESC, piece ASC).
  *   - '''M-step''': piece costs in integer micro-nats,
  *     cost(p) = round(1e6 · ln((total + V) / (count(p) + 1))) — the
  *     Laplace-smoothed negative log-likelihood; the transcendental is
  *     quantized BEFORE any comparison (the t20/t33 discipline), so
  *     every later step is exact integer arithmetic.
  *   - '''E-step''' (hard EM): per word type, the Viterbi segmentation
  *     minimizing the summed piece cost — left-to-right DP,
  *     best(i) = min over j ∈ [i−MaxPieceLen, i) with w[j..i) in the
  *     vocabulary of best(j) + cost(w[j..i)), ties broken by the
  *     smaller (cumulative cost, j) pair (smallest j = longest last
  *     piece). New counts = Σ type-frequency · uses on the Viterbi
  *     path; pieces falling to zero stay in the vocabulary at the
  *     smoothed cost (the EM never shrinks the candidate set — only
  *     the final prune does, as in the published trainer).
  *   - '''prune''': after `rounds` EM rounds keep all single
  *     characters plus the top `targetVocab` multi-character pieces by
  *     (final count DESC, piece ASC), ranked in that order.
  *
  * Word types longer than [[MaxWordLen]] are excluded from the fit
  * (published trainers cap candidate-bearing sentences the same way);
  * the fertility measurement falls back to one-piece-per-character for
  * them, which the apply side and the oracle encode identically.
  *
  * Scale shape: the fit consumes the SAME bounded top-cap type collect
  * t42's BPE trainer does (≤cap rows ever reach the driver — the model
  * fits where the model lives), and costs O(cap · MaxWordLen ·
  * MaxPieceLen) per round independent of corpus size; the corpus-wide
  * measurement (t45) is one broadcast map join. Reference provenance:
  * the tokenizer-training stage of an LLM data pipeline (the t08/t37
  * consumers of a finished vocabulary).
  */
object UnigramLearn extends Serializable {

  /** Longest candidate piece (SentencePiece's max_sentencepiece_length
    * class of knob, small here so the oracle's DP unroll stays finite).
    */
  val MaxPieceLen = 4

  /** Longest word type admitted to the fit; longer types fall back to
    * per-character segmentation in [[segmentLengths]].
    */
  val MaxWordLen = 16

  /** A learned piece: rank (1-based, by final count DESC then piece),
    * surface string, and its final E-step count.
    */
  final case class Piece(rank: Int, piece: String, count: Long)

  /** Micro-nat piece costs for a vocabulary with counts: the
    * Laplace-smoothed quantized negative log-likelihood (see object
    * doc). `v` is the FULL candidate-vocabulary size, constant across
    * rounds.
    */
  private def costs(counts: Map[String, Long], v: Int): Map[String, Long] = {
    val total = counts.valuesIterator.sum
    counts.map { case (p, c) =>
      p -> math.round(
        math.log((total + v).toDouble / (c + 1).toDouble) * 1e6)
    }
  }

  /** Viterbi segmentation of `w` under integer piece costs: the DP of
    * the object doc, returning the path's pieces left to right.
    * Feasible for any word whose characters are all in the vocabulary
    * (singles are never pruned during EM).
    */
  private[operators] def viterbi(w: String,
                                 cost: Map[String, Long]): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Long.MaxValue)
    val from = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (best(j) != Long.MaxValue) {
          cost.get(w.substring(j, i)) match {
            case Some(c) =>
              val cand = best(j) + c
              // j ascends and the comparison is strict, so ties keep
              // the SMALLEST j (the longest last piece) — the (cost, j)
              // tie rule the oracle's ROW_NUMBER(ORDER BY c, j) encodes
              if (cand < best(i)) {
                best(i) = cand
                from(i) = j
              }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    require(best(n) != Long.MaxValue, s"unsegmentable word: $w")
    val path = mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val j = from(pos)
      path += w.substring(j, pos)
      pos = j
    }
    path.reverseIterator.toSeq
  }

  /** The bounded driver-side fit (see object doc): seed → `rounds` EM
    * rounds → prune, returning the ranked final vocabulary.
    */
  def learnLocal(types: Seq[(String, Long)], seedCap: Int, rounds: Int,
                 targetVocab: Int): Seq[Piece] = {
    val ts = types.filter(_._1.length <= MaxWordLen)
    // seed counts: overlapping substrings, frequency-weighted
    val cnt0 = mutable.Map.empty[String, Long]
    for ((w, f) <- ts; l <- 1 to MaxPieceLen; i <- 0 to w.length - l) {
      val p = w.substring(i, i + l)
      cnt0(p) = cnt0.getOrElse(p, 0L) + f
    }
    val singles = cnt0.iterator.filter(_._1.length == 1).toSeq
    val multis = cnt0.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedCap)
    var counts: Map[String, Long] = (singles ++ multis).toMap
    val v = counts.size
    for (_ <- 1 to rounds) {
      val cost = costs(counts, v)
      val used = mutable.Map.empty[String, Long]
      for ((w, f) <- ts; p <- viterbi(w, cost))
        used(p) = used.getOrElse(p, 0L) + f
      counts = counts.map { case (p, _) => p -> used.getOrElse(p, 0L) }
    }
    val kept = counts.iterator.filter(_._1.length == 1).toSeq ++
      counts.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(targetVocab)
    kept.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => Piece(i + 1, p, c) }
  }

  /** The fully-DISTRIBUTED form of [[learnLocal]], for type tables too
    * large to cap-collect (the same split [[BpeLearn]] keeps): the seed
    * count is one distributed substring-explode aggregation, and each EM
    * round is one distributed pass over the type table with the
    * micro-nat cost table BROADCAST into a per-partition Viterbi
    * (the cost table is vocabulary-sized — ≤ seedCap + alphabet rows —
    * so it always broadcasts), followed by a vocabulary-sized count
    * collect for the next M-step. Bit-identical to [[learnLocal]] by
    * construction — every integer rule is shared — and spec-pinned so
    * the equivalence cannot drift (UnigramLearnSpec).
    *
    * Scale shape: R+1 passes over the type table, nothing larger than
    * the vocabulary ever reaches the driver, and the per-row Viterbi is
    * O(MaxWordLen · MaxPieceLen) with no allocation beyond the DP
    * arrays.
    */
  def learn(types: org.apache.spark.sql.DataFrame, seedCap: Int,
            rounds: Int, targetVocab: Int): Seq[Piece] = {
    import org.apache.spark.sql.functions._
    val s = types.sparkSession
    import s.implicits._
    val ts = types.select(col(types.columns.head).as("w"),
        col(types.columns(1)).cast("long").as("f"))
      .filter(length(col("w")) <= MaxWordLen)
      .as[(String, Long)]
    // seed: one substring-explode aggregation (map-side combined)
    val cnt0 = ts.flatMap { case (w, f) =>
      for (l <- 1 to MaxPieceLen; i <- 0 to w.length - l)
        yield (w.substring(i, i + l), f)
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
    val singles = cnt0.filter(_._1.length == 1).collect() // ≤ alphabet
    val multis = cnt0.filter(_._1.length > 1)
      .orderBy(desc("_2"), asc("_1")).limit(seedCap).collect() // bounded
    var counts: Map[String, Long] = (singles ++ multis).toMap
    val v = counts.size
    for (_ <- 1 to rounds) {
      val cost = costs(counts, v)
      val bc = s.sparkContext.broadcast(cost)
      val used = ts.flatMap { case (w, f) =>
        viterbi(w, bc.value).map(p => (p, f))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }
        .collect().toMap // ≤ vocabulary rows
      counts = counts.map { case (p, _) => p -> used.getOrElse(p, 0L) }
    }
    val kept = counts.iterator.filter(_._1.length == 1).toSeq ++
      counts.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(targetVocab)
    kept.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => Piece(i + 1, p, c) }
  }

  /** Per-type Viterbi segment LENGTHS under the PRUNED vocabulary (the
    * tokenizer t45 measures fertility with): costs are re-derived from
    * the kept pieces' final counts — the same smoothed micro-nat
    * formula with the kept-set total and size — and types beyond
    * [[MaxWordLen]] fall back to one piece per character. The result is
    * the broadcastable word → n_pieces map; corpus words outside the
    * capped type table use the same per-character fallback on the apply
    * side.
    */
  def segmentLengths(types: Seq[(String, Long)],
                     learned: Seq[Piece]): Map[String, Int] = {
    val counts = learned.map(p => p.piece -> p.count).toMap
    val cost = costs(counts, counts.size)
    types.map { case (w, _) =>
      w -> (if (w.length > MaxWordLen) w.length else viterbi(w, cost).size)
    }.toMap
  }
}
