package graft

/** Contracts for the round-11 data-selection pair:
  *
  *  - t40 UniMax budgets satisfy the waterfill invariants exactly: the
  *    allocations exhaust the budget, a capped language gets precisely its
  *    1.0-epoch capacity, and every uncapped language sits at one common
  *    water level below 1.0 epochs;
  *  - t39 DSIR log importance weights rank a document written in the
  *    target domain's vocabulary above one written in the out-of-domain
  *    vocabulary regardless of the document's own language label, and the
  *    per-doc feature count is exactly its bigram count.
  */
class DsirUnimaxSpec extends SparkSpecBase {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    rows.map { case (id, text, lang) =>
      (id, text, lang, "synth", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def doc(n: Int, word: String): String =
    Seq.fill(n)(word).mkString(" ")

  test("t40 waterfill: budget exhausted, caps exact, one water level") {
    // token counts: en 1000, de/es/fr 100 each => budget = 0.8*1300 = 1040.
    // Ascending waterfill caps de/es/fr at 100 and leaves en at
    // theta = 1040 - 300 = 740 (0.74 epochs).
    val dir = writeDocs(Seq(
      (0L, doc(1000, "en0"), "en"),
      (1L, doc(100, "de0"), "de"),
      (2L, doc(100, "es0"), "es"),
      (3L, doc(100, "fr0"), "fr")))
    val rows = SparkEntry.queries("t40_unimax_budget")(spark, dir).collect()
    assert(rows.length == 4)
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    val budget = 1040.0
    val total = rows.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(total - budget) < 1e-6, s"allocations must exhaust $budget, got $total")
    for (l <- Seq("de", "es", "fr")) {
      assert(byLang(l).getAs[Boolean]("capped"), s"$l must cap at 1 epoch")
      assert(byLang(l).getAs[Double]("alloc_tokens") == 100.0)
      assert(byLang(l).getAs[Double]("epochs_used") == 1.0)
    }
    assert(!byLang("en").getAs[Boolean]("capped"))
    assert(byLang("en").getAs[Double]("alloc_tokens") == 740.0)
    assert(byLang("en").getAs[Double]("epochs_used") < 1.0)
  }

  test("t40 waterfill: uniform share when no language caps") {
    // en 500, de 400 => budget = 720, uniform share 360 < both caps.
    val dir = writeDocs(Seq(
      (0L, doc(500, "en0"), "en"),
      (1L, doc(400, "de0"), "de")))
    val rows = SparkEntry.queries("t40_unimax_budget")(spark, dir).collect()
    assert(rows.forall(!_.getAs[Boolean]("capped")))
    assert(rows.forall(_.getAs[Double]("alloc_tokens") == 360.0))
  }

  test("t39 DSIR weight ranks target-vocabulary text above out-of-domain") {
    // Target (en) corpus speaks vocabulary A; the raw remainder speaks B.
    // Two probe docs share the SAME de label and differ only in vocabulary:
    // the A-speaking probe must score strictly higher.
    // 600 tokens per doc so the real counts dominate the +1024-bucket
    // add-one smoothing (at 60 tokens the smoothing term swamps the ratio
    // and both weights land negative; the RANKING survives, the signs
    // don't — sized here so both assertions are meaningful)
    val vocabA = doc(600, "tgt")
    val vocabB = doc(600, "oth")
    val dir = writeDocs(Seq(
      (0L, vocabA, "en"), (1L, vocabA, "en"), (2L, vocabA, "en"),
      (3L, vocabB, "de"), (4L, vocabB, "de"),
      (5L, vocabA, "de"), // probe: target vocabulary, non-target label
      (6L, vocabB, "de"))) // probe: out-of-domain vocabulary
    val rows = SparkEntry.queries("t39_dsir_weights")(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.forall(_.getAs[Long]("n_feats") == 599L),
      "every 600-token doc has exactly 599 bigram features")
    val inDomain = byId(5L).getAs[Double]("avg_lw")
    val outDomain = byId(6L).getAs[Double]("avg_lw")
    assert(inDomain > outDomain,
      s"target-vocabulary probe must outscore out-of-domain ($inDomain vs $outDomain)")
    assert(inDomain > 0.0 && outDomain < 0.0,
      "target vocab is MORE likely under target, out-of-domain vocab LESS")
  }
}
