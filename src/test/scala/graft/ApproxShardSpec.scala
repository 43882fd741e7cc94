package graft

import org.apache.spark.sql.functions._

import graft.sources.ShardWriter

/** The declared 100 TB fallbacks, tested against their exact counterparts:
  * approx_count_distinct / approx_percentile replace r03's exact distinct
  * count and r05's rank-selected percentiles when a full shuffle-and-sort
  * stops being affordable — here their error envelopes are pinned at small
  * sf so the swap is a measured decision, not a hope. Plus the shard
  * publish layout (partition pruning + bounded file size).
  */
class ApproxShardSpec extends SparkSpecBase {

  test("approx_count_distinct within 5% of exact (r03's scale fallback)") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val rows = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile brackets the exact rank-selected percentile (r05 fallback)") {
    val q = Tables.events(spark, sf("sf0.01"))
      .select(col("event_type"),
        round(col("value").cast("double") * 1000000).cast("long").as("vq"))
    // exact p50 via rank selection (r05's formulation)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("vq"))
    val exact = q
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("vq"))).as("p50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = q.groupBy(col("event_type"))
      .agg(percentile_approx(col("vq"), lit(0.5), lit(1000)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((et, ex) <- exact) {
      val ap = approx(et).toDouble
      assert(math.abs(ap - ex) / math.max(math.abs(ex.toDouble), 1.0) < 0.05,
        s"$et: approx $ap vs exact $ex")
    }
  }

  test("HLL sketches shard-merge losslessly (distinct count across 1000 executors)") {
    // The 100-TB distinct-count path: each executor sketches its partition,
    // the sketches union associatively — the estimate must be IDENTICAL to
    // the single-pass global sketch (merge loses nothing), and inside the
    // standard HLL error envelope vs exact. This is what lets r03-style
    // distinct stats run as one narrow pass + a tiny union instead of
    // shuffling raw ids.
    val ev = Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), pmod(col("event_id"), lit(32)).as("shard"))
    val global = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getLong(0)
    val merged = ev.groupBy(col("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(merged == global,
      s"sharded-then-unioned sketch ($merged) must equal the global sketch ($global)")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"sketch estimate $merged vs exact $exact outside the HLL envelope")
  }

  test("shard publish: hive partition layout, pruning, bounded files, sorted content") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    ShardWriter.publish(docs, out,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
      maxRecordsPerFile = 100L)
    // directory-level partitioning exists
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langDirs.nonEmpty && langDirs.forall(_.matches("lang=\\w+")))
    // partition pruning: a lang filter scans only that directory
    val one = langDirs.head.stripPrefix("lang=")
    val pruned = spark.read.parquet(out).filter(col("lang") === one)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(!planStr.contains("Filter") || pruned.count() ==
      spark.read.parquet(s"$out/${langDirs.head}").count(),
      "lang filter must resolve via partition pruning")
    // round trip is lossless
    assert(spark.read.parquet(out).count() == docs.count())
    // bounded files: no shard exceeds maxRecordsPerFile
    val shardCounts = spark.read.parquet(out)
      .select(input_file_name().as("f"))
      .groupBy(col("f")).count().select(max(col("count")))
      .head().getLong(0)
    assert(shardCounts <= 100L, "maxRecordsPerFile must bound every shard")
  }
}
