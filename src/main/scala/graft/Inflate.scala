package graft

import graft.harness.StressCorpus

/** Deterministic corpus inflation to a verify-ready directory — the tool
  * behind the large-SF correctness spot-runs (distinct from the stress
  * BENCH, which times a fixed pack; this writes a full table set that
  * `graft.Verify` + `tools/check.py` can gate exactly like a driver round).
  *
  * usage: graft.Inflate <srcDir> <outDir> <factor> [eventsFactor]
  *
  * documents/embeddings inflate with [[StressCorpus]]'s controlled
  * duplicate structure (novel replicas re-suffix vocabulary, so shingle
  * document frequencies stay bounded and the d02 df-cap guard holds);
  * lineitem/orders/events inflate by exact replication under fresh primary
  * keys (group keys and values byte-identical, so per-group row counts
  * grow ×factor over the same key space — the moment-sum overflow-exercise
  * shape). events takes an optional LARGER factor: its per-type groups are
  * the ones the decimal-sum guards bound (~1.9M rows/group), and reaching
  * that needs ×100 where the relational tables only need ×10. Dimension
  * tables are copied through unchanged.
  */
object Inflate {
  def main(args: Array[String]): Unit = {
    if (args.length < 3 || args.length > 4) {
      System.err.println(
        "usage: graft.Inflate <srcDir> <outDir> <factor> [eventsFactor]")
      sys.exit(2)
    }
    val (src, out) = (args(0), args(1))
    val n = args(2).toInt
    val nEvents = args.lift(3).map(_.toInt).getOrElse(n)
    val spark = GraftSession.local("graft-inflate")
    def save(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
    save(StressCorpus.documents(spark, src, n), "documents")
    save(StressCorpus.embeddings(spark, src, n), "embeddings")
    save(StressCorpus.lineitem(spark, src, n), "lineitem")
    save(StressCorpus.orders(spark, src, n), "orders")
    save(StressCorpus.events(spark, src, nEvents), "events")
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      save(spark.read.parquet(s"$src/$dim.parquet"), dim)
    System.err.println(s"[inflate] wrote $out at x$n (events x$nEvents)")
    spark.stop()
  }
}
