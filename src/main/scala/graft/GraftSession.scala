package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-ready defaults.
  *
  * Local mode sizes shuffle parallelism to the core count (Spark's 200
  * default over-partitions a single node); on a real cluster the same
  * builder is used with `master` unset and AQE coalescing the 2× initial
  * partitions down to data-proportional sizes. Streaming state goes to
  * RocksDB so 8h-window dedup state (SURVEY.md §7.4) is bounded by disk,
  * not heap.
  */
object GraftSession {

  def cpus: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(Runtime.getRuntime.availableProcessors())

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")

  /** Local session: local[N] with shuffle partitions = N. */
  def local(appName: String = "graft"): SparkSession = {
    val n = cpus
    val s = builder(appName)
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
