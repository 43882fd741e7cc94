package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeApply
import graft.operators.BpeLearn

/** BPE vocabulary learning (t42's operator) on the hand-traceable
  * Sennrich-style corpus, plus the BpeApply round-trip of the learned
  * table.
  */
class BpeLearnSpec extends SparkSpecBase {

  /** The classic training corpus: low×3, lower×2, newest×4, widest×1.
    * Hand trace (pair stats WITH overlap, winner = count DESC then gram
    * ASC in binary UTF-8 order):
    *   round 0: we=6 (lower 2 + newest 4)            → merge "we"
    *   round 1: lo=5 ties st=5, "lo" < "st"          → merge "lo"
    *   round 2: st=5                                 → merge "st"
    *   round 3: ne=4 ties e⟨we⟩=4 and ⟨we⟩⟨st⟩=4; 'e' (0x65) < 'n'
    *            (0x6E) < U+E000 in UTF-8 binary      → merge e+⟨we⟩ = "ewe"
    */
  private def wordTypes = {
    import spark.implicits._
    Seq(("low", 3L), ("lower", 2L), ("newest", 4L), ("widest", 1L))
      .toDF("enc", "f")
  }

  test("learn() replays the published merge loop, tie-broken by gram order") {
    val merges = BpeLearn.learn(wordTypes, 4)
    assert(merges.map(m => (m.rank, m.decoded, m.count)) ==
      Seq((0, "we", 6L), (1, "lo", 5L), (2, "st", 5L), (3, "ewe", 4L)))
    // gram encodings: rounds 1-3 reference earlier placeholders
    assert(merges(0).gram == "we")
    assert(merges(3).gram == "e\uE000") // the pair (e, placeholder-of-merge-0)
  }

  test("learnLocal == learn: the driver fit is bit-identical to the distributed loop") {
    // on the Sennrich corpus (has a count tie AND a nested-placeholder
    // merge) and on real data's type table — pins the t42 fast path
    // against the 100 TB distributed form
    val a = BpeLearn.learnLocal(
      Seq(("low", 3L), ("lower", 2L), ("newest", 4L), ("widest", 1L)), 4)
    val b = BpeLearn.learn(wordTypes, 4)
    assert(a == b)
    import graft.functions.TextFunctions.tokens
    val real = Tables.documents(spark, sf("sf0.001"))
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(col("w").as("enc"), col("f"))
      .localCheckpoint()
    val types = real.orderBy(col("f").desc, col("enc")).limit(65536)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(BpeLearn.learnLocal(types, 8) == BpeLearn.learn(real, 8))
  }

  test("learning exhausts gracefully when every type is fully merged") {
    import spark.implicits._
    val tiny = Seq(("ab", 5L), ("a", 3L)).toDF("enc", "f")
    val merges = BpeLearn.learn(tiny, 10)
    // round 0 merges "ab"; afterwards no 2-symbol word remains
    assert(merges.map(m => (m.decoded, m.count)) == Seq(("ab", 5L)))
  }

  test("BpeApply round-trips the learned table: encode agrees with the merge replay") {
    import spark.implicits._
    // the faithful BPE encoder applies the GRAM encodings in rank order:
    // BpeApply's placeholder-per-rank replace is then exactly the
    // learning loop's own merge replay (vocab index i = rank i, so the
    // placeholders line up). Decoded surfaces would miss nested merges
    // ("ewe" is gone from the surface once "we" collapses).
    val vocab = BpeLearn.learn(wordTypes, 4).map(_.gram)
    // true BPE segmentations under merges [we, lo, st, e+(we)]:
    //   low    → (lo) w           = 2 units
    //   lower  → (lo)(we) r       = 3 units
    //   newest → n (e(we))(st)    = 3 units  (the nested round-3 merge)
    //   widest → w i d e (st)     = 5 units
    val got = Seq("low", "lower", "newest", "widest").toDF("w")
      .select(col("w"), BpeApply(col("w"), vocab).getItem(0).as("units"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("low" -> 2L, "lower" -> 3L, "newest" -> 3L,
      "widest" -> 5L))
  }

  test("t42 on real data: ranks are 1..R, counts are non-increasing, merges non-trivial") {
    val rows = SparkEntry.queries("t42_bpe_learn")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    assert(rows.forall(_._2.length >= 2), "every merge decodes to >= 2 chars")
    assert(rows.forall(r => !r._2.exists(c => c >= 0xE000 && c <= 0xF8FF)),
      "decoded merges contain no placeholder chars")
    // counts can only shrink or tie as merges consume pair mass
    // NOT strictly: a later round's winner may outnumber an earlier one's
    // remaining mass — but the FIRST merge is the global max pair
    assert(rows.head._3 == rows.map(_._3).max,
      "round 0 selects the globally most frequent pair")
  }
}
