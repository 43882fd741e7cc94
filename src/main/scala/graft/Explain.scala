package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.harness.Profiling

/** Per-query diagnosis: run one registered query N times and report, per
  * run, wall time / job count / stage count / summed task time — the
  * numbers that separate "the plan computes too much" (task time ≈ wall ×
  * cores) from "the plan has too many synchronization points" (job count
  * high, task time ≪ wall). The bench sweep's per-query medians say WHICH
  * query is slow; this says WHY.
  *
  * usage: runMain graft.Explain <name> [sfDir] [runs] [--plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Explain <queryName> [sfDir] [runs] [--plan]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).filterNot(_.startsWith("--")).map(_.toInt).getOrElse(3)
    val showPlan = args.contains("--plan")
    val fn = SparkEntry.queries.getOrElse(name,
      { System.err.println(s"unknown query: $name"); sys.exit(2) })
    val spark = GraftSession.local("graft-explain")
    val prof = Profiling.attach(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    // same JVM warm-up the bench applies, so run 1 ≈ the bench's cold run
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    (1 to runs).foreach { i =>
      jobs.set(0); stages.set(0); prof.reset()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val planned = System.nanoTime()
      val n = df.collect().length
      val t1 = System.nanoTime()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"run $i: wall=${(t1 - t0) / 1e9}%.2fs " +
        f"build=${(planned - t0) / 1e9}%.2fs rows=$n " +
        s"jobs=${jobs.get} stages=${stages.get} ${prof.report}")
    }
    if (showPlan) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
