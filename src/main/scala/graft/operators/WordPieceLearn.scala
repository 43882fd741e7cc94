package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed WordPiece vocabulary LEARNING — the THIRD canonical
  * tokenizer trainer next to [[BpeLearn]] (BPE) and [[UnigramLearn]]
  * (unigram-LM): the BERT trainer (Schuster & Nakajima 2012, "Japanese
  * and Korean voice search"; Devlin et al. 2019; the published
  * HuggingFace `tokenizers` WordPieceTrainer). The loop is BPE's —
  * iteratively merge one adjacent symbol pair — but the winner is the
  * pair maximizing the unigram-likelihood GAIN of the merge,
  *
  *   score(a, b) = count(ab) / (count(a) · count(b)),
  *
  * not the raw pair count: merging `ab` raises the corpus likelihood
  * under a unigram LM by ~count(ab)·log(count(ab)/(count(a)·count(b))),
  * so the max-score pair is the max-gain merge. The effect is the
  * documented WordPiece bias toward RARE-symbol pairs that always occur
  * together (high conditional probability) over frequent-but-independent
  * pairs — BPE's `th` (frequent) can lose to `qu` (nearly deterministic).
  *
  * == Determinism: the quantized score ==
  *
  * The score is a ratio of exact integer counts; comparing it as a
  * float invites cross-engine last-bit trouble (the family's standing
  * rule — see QueryDef's scaladoc), so the winner rule compares
  *
  *   scoreQ = floor(count(ab) · 10¹⁵ / (count(a) · count(b)))
  *
  * in EXACT integer arithmetic (BigInt here, HUGEINT in the DuckDB
  * oracle), ties by gram ascending — both engines replay the identical
  * total order by construction. 10¹⁵ keeps ~15 significant digits:
  * distinct true scores collapse only below 10⁻¹⁵ relative, where the
  * deterministic gram tie-break takes over identically on both sides.
  *
  * == Representation ==
  *
  * Identical to [[BpeLearn]]: each word type's segmentation is a string
  * whose every char is one live symbol (original chars or the
  * private-use placeholder U+E000+rank for merge `rank`), pair stats
  * are overlap-counted 2-char substrings weighted by type frequency,
  * symbol stats are chars weighted the same way, and the merge is the
  * left-to-right non-overlapping `replace`. [[graft.functions.BpeApply]]
  * therefore applies a learned WordPiece table unchanged (t47 measures
  * fertility through it — the merge-replay encoder; BERT's runtime
  * greedy longest-match encoder is the deployment-time variant and
  * agrees on every word whose merge path is unambiguous).
  *
  * == Scale shape ==
  *
  * Like BpeLearn: the fit runs over the word-TYPE table (bounded by
  * vocabulary, not corpus). [[learnLocal]] is the capped-type driver fit
  * (the HuggingFace/SentencePiece shape — the model fit runs where the
  * model lives). [[learn]] is the distributed twin for uncappable type
  * tables: each round aggregates pair and symbol counts
  * map-side-combined and collects BOTH — bounded by the SYMBOL ALPHABET
  * (≤ 26 base chars + one placeholder per round, so ≤ |Σ|² pair rows ≈
  * a few thousand), never by types or corpus — then picks the winner in
  * exact BigInt on the driver. WordPieceLearnSpec pins the two
  * bit-identical on real data.
  */
object WordPieceLearn {

  /** One learned merge: `rank` (0-based; placeholder U+E000+rank), the
    * winning 2-symbol `gram` in placeholder encoding, the fully
    * `decoded` surface string, the pair `count` and quantized `scoreQ`
    * at selection time.
    */
  final case class Merge(rank: Int, gram: String, decoded: String,
                         count: Long, scoreQ: Long)

  /** The score quantization scale (15 significant digits). */
  val Scale: BigInt = BigInt(10).pow(15)

  private def winner(pairs: Iterable[(String, Long)],
                     syms: collection.Map[String, Long])
    : Option[(String, Long, Long)] = {
    var best: (String, Long, Long) = null
    pairs.foreach { case (g, c) =>
      val sq = (BigInt(c) * Scale /
        (BigInt(syms(g.substring(0, 1))) * syms(g.substring(1, 2)))).toLong
      if (best == null || sq > best._3 || (sq == best._3 && g < best._1))
        best = (g, c, sq)
    }
    Option(best)
  }

  private def decode(g: String, out: collection.Seq[Merge]): String =
    g.flatMap { ch =>
      if (ch >= 0xE000 && ch < 0xE000 + out.size) out(ch - 0xE000).decoded
      else ch.toString
    }

  /** Learn `rounds` merges from an in-memory word-type table
    * `(enc, frequency)` — the capped-type fit t46 runs. Stops early when
    * no adjacent pair remains.
    */
  def learnLocal(types: Seq[(String, Long)], rounds: Int): Seq[Merge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var encs = types.map(_._1).toArray
    val fs = types.map(_._2).toArray
    var exhausted = false
    for (r <- 0 until rounds if !exhausted) {
      val pairs = scala.collection.mutable.HashMap.empty[String, Long]
      val syms = scala.collection.mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < encs.length) {
        val e = encs(i)
        var j = 0
        while (j < e.length) {
          syms.update(e.substring(j, j + 1),
            syms.getOrElse(e.substring(j, j + 1), 0L) + fs(i))
          if (j < e.length - 1) {
            val g = e.substring(j, j + 2)
            pairs.update(g, pairs.getOrElse(g, 0L) + fs(i))
          }
          j += 1
        }
        i += 1
      }
      winner(pairs, syms) match {
        case None => exhausted = true
        case Some((g, c, sq)) =>
          out += Merge(r, g, decode(g, out), c, sq)
          val ph = String.valueOf((0xE000 + r).toChar)
          encs = encs.map(_.replace(g, ph))
      }
    }
    out.toSeq
  }

  /** The distributed twin over a word-type DataFrame `(enc: string,
    * f: long)` — bit-identical to [[learnLocal]] (WordPieceLearnSpec
    * pins it): per round, ONE map-side-combined aggregation each for
    * pair and symbol counts, two alphabet-bounded collects, the exact
    * BigInt winner, one narrow `replace`.
    */
  def learn(words: DataFrame, rounds: Int): Seq[Merge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var encDf = words
    var exhausted = false
    for (r <- 0 until rounds if !exhausted) {
      val pairs = encDf.filter(length(col("enc")) >= 2)
        .select(col("f"), explode(transform(
          sequence(lit(1), length(col("enc")) - 1),
          i => col("enc").substr(i, lit(2)))).as("g"))
        .groupBy(col("g")).agg(sum(col("f")).as("cnt"))
        .collect().map(row => row.getString(0) -> row.getLong(1))
      if (pairs.isEmpty) exhausted = true
      else {
        val syms = encDf
          .select(col("f"), explode(transform(
            sequence(lit(1), length(col("enc"))),
            i => col("enc").substr(i, lit(1)))).as("s"))
          .groupBy(col("s")).agg(sum(col("f")).as("cnt"))
          .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
        val Some((g, c, sq)) = winner(pairs, syms)
        out += Merge(r, g, decode(g, out), c, sq)
        encDf = encDf.withColumn("enc",
          replace(col("enc"), lit(g),
            lit(String.valueOf((0xE000 + r).toChar))))
      }
    }
    out.toSeq
  }
}
