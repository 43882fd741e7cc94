package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary LEARNING — the canonical tokenizer-training
  * loop (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units", the published algorithm every BPE tokenizer
  * trains with): iteratively merge the corpus's most frequent adjacent
  * symbol pair, `rounds` times. The learned merge table is what
  * [[graft.functions.BpeApply]] consumes at encode time.
  *
  * == Representation: one placeholder char per merge ==
  *
  * Each word type's current segmentation is a STRING in which every
  * character is one live symbol — original characters, or a Unicode
  * private-use placeholder (U+E000+rank) standing for merge `rank`
  * (exactly BpeApply's placeholder scheme). That makes both halves of a
  * Lloyd-style round pure string ops any engine reproduces bit-for-bit:
  *
  *   - pair stats    = the multiset of 2-char substrings of each word,
  *     weighted by word frequency (adjacent-pair counts WITH overlap —
  *     "aaa" contributes (a,a) twice — per the published `get_stats`);
  *   - the merge     = `replace(enc, pair, placeholder)`, whose
  *     left-to-right non-overlapping scan is exactly the published
  *     single-pair merge ("aaa" under (a,a) becomes (aa)(a)), and is the
  *     same scan in Spark, Java, and every SQL engine's `replace`.
  *
  * A merged symbol can never cascade within its own round: the winning
  * pair is 2 chars, its placeholder 1 — `a+b` is strictly longer than
  * either side, so the placeholder can't re-match. No end-of-word marker
  * is appended (intra-word merges only); words are lowercase-alpha types
  * (the caller filters), so corpus text can never collide with the
  * private-use plane.
  *
  * == Scale shape ==
  *
  * The loop runs over the word-TYPE table (one row per distinct word +
  * its corpus frequency) — bounded by vocabulary size (Heaps' law:
  * ~10⁶–10⁸ types at 100 TB), NOT corpus size; the one corpus-sized scan
  * is the caller's word count, paid once. Each round is (a) one
  * map-side-combined pair-count aggregation over the types (the 2-gram
  * explode fans out ≤ word-length rows per type), (b) ONE
  * TakeOrderedAndProject(1) — `orderBy(...).limit(1)`, ≤1 row ever
  * leaves a partition, never a global sort — and (c) a narrow per-row
  * `replace`. Rounds chain lazily over the checkpointed type table:
  * round r recomputes r cheap replaces rather than materializing each
  * generation. R rounds ≈ R small jobs + 1 corpus scan, the minimum the
  * published algorithm admits.
  */
object BpeLearn {

  /** One learned merge: `rank` (0-based; placeholder U+E000+rank), the
    * winning 2-symbol `gram` in placeholder encoding, the fully `decoded`
    * surface string it stands for, and the pair `count` at selection time.
    */
  final case class Merge(rank: Int, gram: String, decoded: String, count: Long)

  /** Learn `rounds` merges from a word-type table `(enc: string,
    * f: long)` — `enc` the word, `f` its corpus frequency. Stops early if
    * no adjacent pair remains (every type fully merged). Deterministic:
    * the winner is (count DESC, gram ASC) — binary UTF-8 gram order, the
    * same total order DuckDB's default collation gives the oracle.
    */
  /** The same merge loop over an in-memory word-type table — the path a
    * production tokenizer trainer actually takes once the type table is
    * frequency-capped (HuggingFace/SentencePiece both collect the capped
    * type counts and fit locally): the model FIT runs where the model
    * lives, like the k-means codebook update. Bit-identical to [[learn]]
    * by construction — same overlap-counting stats, same
    * (count DESC, gram ASC) winner (all symbols are BMP chars, where
    * Java's UTF-16 compare == UTF-8 binary == the engines' orders), same
    * left-to-right non-overlapping `String.replace` merge; BpeLearnSpec
    * pins the agreement on both the Sennrich corpus and real data.
    */
  def learnLocal(types: Seq[(String, Long)], rounds: Int): Seq[Merge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var encs = types.map(_._1).toArray
    val fs = types.map(_._2).toArray
    var exhausted = false
    for (r <- 0 until rounds if !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < encs.length) {
        val e = encs(i)
        var j = 0
        while (j < e.length - 1) {
          val g = e.substring(j, j + 2)
          counts.update(g, counts.getOrElse(g, 0L) + fs(i))
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (g, c) = counts.minBy { case (g, c) => (-c, g) }
        val decoded = g.flatMap { ch =>
          if (ch >= 0xE000 && ch < 0xE000 + out.size)
            out(ch - 0xE000).decoded
          else ch.toString
        }
        out += Merge(r, g, decoded, c)
        val ph = String.valueOf((0xE000 + r).toChar)
        encs = encs.map(_.replace(g, ph))
      }
    }
    out.toSeq
  }

  def learn(words: DataFrame, rounds: Int): Seq[Merge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var encDf = words
    var exhausted = false
    for (r <- 0 until rounds if !exhausted) {
      val counts = encDf.filter(length(col("enc")) >= 2)
        .select(col("f"), explode(transform(
          sequence(lit(1), length(col("enc")) - 1),
          i => col("enc").substr(i, lit(2)))).as("g"))
        .groupBy(col("g")).agg(sum(col("f")).as("cnt"))
      // TakeOrderedAndProject(1): the argmax pair, never a global sort
      val top = counts.orderBy(col("cnt").desc, col("g")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val g = top(0).getString(0)
        val decoded = g.flatMap { ch =>
          if (ch >= 0xE000 && ch < 0xE000 + out.size)
            out(ch - 0xE000).decoded
          else ch.toString
        }
        out += Merge(r, g, decoded, top(0).getLong(1))
        encDf = encDf.withColumn("enc",
          replace(col("enc"), lit(g),
            lit(String.valueOf((0xE000 + r).toChar))))
      }
    }
    out.toSeq
  }
}
