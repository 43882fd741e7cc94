package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.harness.Profiling

/** Round-18 optimization diagnostics — NOT a driver surface.
  *
  * For each selected query: dump `.explain("formatted")` to
  * `$SPARK_GRAFT_OPT_OUT/<name>.txt` and time three consecutive runs in one
  * session (run 1 carries planning + codegen compile; runs 2-3 are warm), with
  * per-run task-metric deltas (executor task time, GC, shuffle bytes) from
  * [[Profiling]]. Separating wall time from summed task time shows whether a
  * query is parallelism-bound or overhead-bound, and cold-minus-warm isolates
  * the fixed per-query cost the single-shot bench tail pays.
  *
  * Session knobs mirror graft.Bench (same caches, same shuffle sizing) so
  * timings are comparable to the sweep. Results are never persisted; every
  * run recomputes from the parquet inputs.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_OPT_ONLY (comma-separated names; default: all),
  * SPARK_GRAFT_OPT_OUT (plan dir; default /tmp/optplans),
  * SPARK_GRAFT_OPT_RUNS (default 3).
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_OPT_OUT", "/tmp/optplans"))
    Files.createDirectories(outDir)
    val runs = sys.env.getOrElse("SPARK_GRAFT_OPT_RUNS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_OPT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    val spark = GraftSession.local("graft-optprofile")
    // the bench sweep's session caches — cost attribution must match the sweep
    Seq("graphEdgeCache", "shingleCache", "groundTruthCache", "kmeansCache",
      "alignCache", "ivfCache", "lshBandsCache").foreach(k =>
      spark.conf.set(s"spark.graft.scale.$k", "1"))
    // same JVM warmup as the bench
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val prof = Profiling.attach(spark)
    // SPARK_GRAFT_OPT_JOBS=1: per-job submission→completion lines, to see how
    // much of a query's wall clock is serialized stage-job latency
    if (sys.env.get("SPARK_GRAFT_OPT_JOBS").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            t0.put(j.jobId, System.nanoTime())
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = Option(t0.remove(j.jobId)).map(n =>
              (System.nanoTime() - n) / 1e9).getOrElse(-1.0)
            println(f"[job] id=${j.jobId} wall=$s%.3f")
          }
        })
    }
    val qs = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }

    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"$name.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        // SPARK_GRAFT_OPT_PHASES=1: split each run into plan-build /
        // analyze+optimize / execute, to separate driver plan work from jobs
        val phases = sys.env.get("SPARK_GRAFT_OPT_PHASES").contains("1")
        val recs = (1 to runs).map { _ =>
          prof.reset()
          val t0 = System.nanoTime()
          if (phases) {
            val b0 = System.nanoTime()
            val df2 = fn(spark, sfDir)
            val b1 = System.nanoTime()
            df2.queryExecution.executedPlan // force analysis + optimization
            val b2 = System.nanoTime()
            df2.count()
            val b3 = System.nanoTime()
            println(f"[phase] $name build=${(b1 - b0) / 1e9}%.3f " +
              f"plan=${(b2 - b1) / 1e9}%.3f exec=${(b3 - b2) / 1e9}%.3f")
          } else fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          val line = f"wall=$wall%.3f taskSec=${prof.taskTimeMs.sum / 1000.0}%.2f " +
            f"gcSec=${prof.gcTimeMs.sum / 1000.0}%.2f " +
            f"shufMB=${prof.shuffleReadB.sum / 1048576.0}%.1f"
          line
        }
        println(s"[opt] $name ${recs.mkString(" | ")}")
      } catch {
        case e: Throwable => println(s"[opt] $name FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
