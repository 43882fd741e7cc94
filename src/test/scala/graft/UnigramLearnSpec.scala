package graft

import graft.operators.UnigramLearn

/** The unigram-LM trainer (t44/t45's fit): hand-traced Viterbi, EM
  * behavior on a discriminating corpus, coverage and determinism
  * invariants, and the distributed form's bit-identity pin.
  */
class UnigramLearnSpec extends SparkSpecBase {

  private def learn(types: Seq[(String, Long)], seedCap: Int = 512,
                    rounds: Int = 3, target: Int = 64) =
    UnigramLearn.learnLocal(types, seedCap, rounds, target)

  test("singles are always kept: every word stays segmentable after pruning") {
    val types = Seq(("abab", 10L), ("cd", 1L), ("zzzz", 3L))
    val learned = learn(types, seedCap = 4, target = 1)
    val pieces = learned.map(_.piece).toSet
    for (ch <- "abcdz") assert(pieces.contains(ch.toString),
      s"single '$ch' must survive the prune")
  }

  test("the unigram objective favors the LONGEST affordable piece") {
    // the whole word "abab" is itself a candidate (≤ MaxPieceLen) and one
    // piece always beats two of anything remotely comparable in a
    // product-of-probabilities model — the signature behavior that
    // distinguishes unigram-LM from BPE's bottom-up pair merging. The
    // Viterbi path is [abab], so the sub-piece 'ab' goes UNUSED (count 0).
    val types = Seq(("abab", 100L), ("xy", 1L))
    val learned = learn(types)
    val topMulti = learned.filter(_.piece.length > 1).minBy(_.rank)
    assert(topMulti.piece == "abab" && topMulti.count == 100L,
      s"expected the whole-word piece to win, got $topMulti")
    assert(learned.find(_.piece == "ab").exists(_.count == 0L),
      "'ab' is dominated by the whole-word piece and ends unused")
  }

  test("E-step counts are frequency-weighted and conserved per word") {
    // every word of length n contributes freq × (pieces on its path);
    // summing piece-count × piece-length over the final vocabulary of a
    // single-word corpus must reconstruct freq × word length
    val types = Seq(("abcabc", 7L))
    val learned = learn(types)
    val mass = learned.map(p => p.count * p.piece.length).sum
    assert(mass == 7L * 6,
      "character mass on the Viterbi path is conserved")
  }

  test("ranking is (count DESC, piece ASC) — deterministic on ties") {
    // hand trace: vocab {a, b, ab, ba}; round 1 costs make [ab] cheaper
    // than [a, b] (one piece at ln(34/6) beats two at ln(34/11)), so the
    // E-step collapses both words onto their bigram and the singles drop
    // to zero. Final ranking ties 'ab' and 'ba' at 5 (piece ASC breaks),
    // and 'a'/'b' at 0.
    val learned = learn(Seq(("ab", 5L), ("ba", 5L)))
    assert(learned.sortBy(_.rank).map(p => (p.piece, p.count)) ==
      Seq(("ab", 5L), ("ba", 5L), ("a", 0L), ("b", 0L)))
  }

  test("words beyond MaxWordLen are excluded from the fit; segmentLengths falls back per char") {
    val long = "a" * (UnigramLearn.MaxWordLen + 3)
    val types = Seq((long, 50L), ("aa", 2L))
    val learned = learn(types)
    // the long word contributed nothing: 'aa' mass comes from the short
    // word only (one 'aa' piece per Viterbi path of "aa")
    val aa = learned.find(_.piece == "aa")
    assert(aa.forall(_.count <= 2L), s"long type must not feed counts: $aa")
    val seg = UnigramLearn.segmentLengths(types, learned)
    assert(seg(long) == long.length, "per-character fallback past MaxWordLen")
    // with only ("aa", 2) in the fit, the smoothed single is cheap enough
    // that [a, a] (2·ln(8/5)) undercuts [aa] (ln(8/3)) — the rare bigram
    // never earns its keep, exactly the prune-the-unjustified behavior
    // the Laplace smoothing is there for
    assert(seg("aa") == 2, "'aa' stays two singles under the learned vocab")
  }

  test("determinism: the same types give bit-identical vocabularies across runs") {
    val types = Seq(("banana", 9L), ("bandana", 4L), ("cabana", 6L),
      ("nab", 2L), ("ban", 11L))
    val a = learn(types)
    val b = learn(types.reverse) // input order must not matter either
    assert(a == b, "learnLocal must be a pure function of the type SET")
  }

  test("fertility sanity: learned segmentation is never longer than characters") {
    val types = Seq(("banana", 9L), ("bandana", 4L), ("cabana", 6L))
    val seg = UnigramLearn.segmentLengths(types, learn(types))
    types.foreach { case (w, _) =>
      assert(seg(w) >= 1 && seg(w) <= w.length, s"$w -> ${seg(w)}")
    }
  }

  test("the distributed learn is bit-identical to the driver fit") {
    // the t42 split, unigram edition: t44 fits on the bounded top-cap
    // collect (the model fits where the model lives); the distributed
    // form exists for uncappable type tables, and every integer rule is
    // shared — so the two vocabularies must match EXACTLY, ranks,
    // counts and all
    import spark.implicits._
    val types = Seq(("banana", 9L), ("bandana", 4L), ("cabana", 6L),
      ("nab", 2L), ("ban", 11L), ("abab", 7L), ("x" * 20, 50L))
    val local = UnigramLearn.learnLocal(types, seedCap = 16, rounds = 3,
      targetVocab = 8)
    val dist = UnigramLearn.learn(types.toDF("w", "f"), seedCap = 16,
      rounds = 3, targetVocab = 8)
    assert(dist == local,
      "distributed EM must replay the driver fit bit-for-bit")
  }
}
