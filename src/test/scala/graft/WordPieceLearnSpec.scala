package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeLearn, WordPieceLearn}

/** The WordPiece trainer (t46/t47's operator): hand-traced likelihood
  * scoring, the documented divergence from BPE's count winner, the
  * quantized-score tie rule, the placeholder/decode discipline shared
  * with BpeLearn, and the local-vs-distributed bit-identity pin.
  */
class WordPieceLearnSpec extends SparkSpecBase {
  import spark.implicits._

  test("the winner maximizes count(ab)/(count(a)*count(b)), not count(ab)") {
    // Corpus: "th" is FREQUENT but its symbols are everywhere; "qu"
    // occurs less often but q occurs only before u.
    //   types: thus f=6, that f=6, quit f=3, aqua f=1
    //   counts: th=12; t=21, h=12 → score(th) = 12/252 ≈ 0.048
    //           qu=4;  q=4,  u=10 → score(qu) = 4/40 = 0.1
    // (us and ui ALSO score exactly 0.1 — 6/60 and 3/30 — so the gram
    // tie-break decides: "qu" < "ui" < "us".) BPE picks th (count 12);
    // WordPiece picks qu.
    val types = Seq(("thus", 6L), ("that", 6L), ("quit", 3L), ("aqua", 1L))
    val bpe = BpeLearn.learnLocal(types, 1)
    val wp = WordPieceLearn.learnLocal(types, 1)
    assert(bpe.head.decoded == "th")
    assert(wp.head.decoded == "qu")
    assert(wp.head.count == 4L)
    assert(wp.head.scoreQ == (WordPieceLearn.Scale / 10).toLong)
  }

  test("hand-traced two rounds: ties break by gram, placeholders decode") {
    // {abab f=2, abc f=1}. Round 1: pairs ab=5 (overlap: abab's grams
    // are ab,ba,ab), ba=2, bc=1; symbols a=5, b=5, c=1.
    //   score(ab) = 5/25 = 0.2, score(bc) = 1/5 = 0.2 — an EXACT tie;
    //   gram ASC picks "ab". score(ba) = 2/25 = 0.08.
    val types = Seq(("abab", 2L), ("abc", 1L))
    val wp = WordPieceLearn.learnLocal(types, 2)
    assert(wp.head.decoded == "ab")
    assert(wp.head.count == 5L)
    assert(wp.head.scoreQ == (WordPieceLearn.Scale / 5).toLong)
    // Round 2 over {φφ f=2, φc f=1} (φ = the ab placeholder): pairs
    // φφ=2, φc=1; symbols φ=5, c=1. score(φφ) = 2/25 = 0.08,
    // score(φc) = 1/5 = 0.2 — the rare-but-deterministic pair wins and
    // decodes through the placeholder to "abc".
    assert(wp(1).decoded == "abc")
    assert(wp(1).count == 1L)
    assert(wp(1).scoreQ == (WordPieceLearn.Scale / 5).toLong)
  }

  test("exhaustion stops the loop like BpeLearn") {
    // one type, one pair: round 0 merges it, round 1 finds no pair
    val wp = WordPieceLearn.learnLocal(Seq(("ab", 1L)), 5)
    assert(wp.map(_.decoded) == Seq("ab"))
  }

  test("distributed learn is bit-identical to learnLocal on real data") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("\\A[a-z]+\\z"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val types = docs.orderBy(col("f").desc, col("w")).limit(65536)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val local = WordPieceLearn.learnLocal(types, 8)
    val dist = WordPieceLearn.learn(
      docs.select(col("w").as("enc"), col("f")), 8)
    assert(local == dist,
      "capped driver fit and distributed twin must agree bit-for-bit")
    assert(local.size == 8)
    // the quantized score is positive and ≤ 10^15 (score ≤ 1) on every
    // round, and pair counts are positive
    local.foreach { m =>
      assert(m.scoreQ > 0L && m.scoreQ <= 1000000000000000L)
      assert(m.count > 0L)
    }
  }
}
