package graft

/** Round-18: Tables memoizes RELATION RESOLUTION (schema + file listing)
  * per (session, path) — each fresh `spark.read.parquet` pays a ~50 ms
  * footer-inference job, which across a 219-query sweep was ~20 s of pure
  * metadata overhead. The memo holds metadata only: execution still scans
  * parquet every run (no InMemoryRelation ever enters the plan).
  */
class TablesCacheSpec extends SparkSpecBase {

  test("repeated reads reuse the resolved relation") {
    val a = Tables.lineitem(spark, sf("sf0.001"))
    val b = Tables.lineitem(spark, sf("sf0.001"))
    assert(a eq b, "same (session, path) must return the memoized DataFrame")
    val other = Tables.lineitem(spark, sf("sf0.01"))
    assert(!(other eq a), "different dirs resolve independently")
  }

  test("memo is metadata only — the plan stays a parquet scan, never cached rows") {
    val df = Tables.orders(spark, sf("sf0.001"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("InMemoryRelation"),
      "memoized relation must not pin row data")
    assert(df.queryExecution.sparkPlan.toString.contains("FileScan parquet") ||
      df.queryExecution.sparkPlan.toString.contains("Scan parquet"),
      "execution must read from the parquet source")
  }

  test("invalidate drops a dir's memoized relations") {
    val dir = sf("sf0.001")
    val a = Tables.customer(spark, dir)
    Tables.invalidate(dir)
    val b = Tables.customer(spark, dir)
    assert(!(a eq b), "invalidate must force re-resolution")
    assert(a.schema == b.schema, "re-resolution sees the same immutable dir")
    // events keeps its µs-normalized ts through the memo path
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(Tables.events(spark, dir) eq ev)
  }

  test("invalidate drops the dir's memoized row counts too") {
    val dir = sf("sf0.001")
    val n = Tables.rowCount(spark, dir, "region")
    assert(Tables.rowCountCache.containsKey(s"$dir/region"))
    Tables.invalidate(dir)
    assert(!Tables.rowCountCache.containsKey(s"$dir/region"),
      "invalidate must drop row counts under the dir (a future in-place " +
        "writer would otherwise serve stale counts)")
    assert(Tables.rowCount(spark, dir, "region") == n,
      "re-count over the immutable dir sees the same value")
  }

  test("a stopped session's entries are evicted (released, not pinned)") {
    val dir = sf("sf0.001")
    val a = Tables.nation(spark, dir)
    // the suite shares ONE live context, so the spec injects the
    // stopped-predicate; production apply() sweeps with
    // sparkContext.isStopped on every read-through
    Tables.evictStopped(_ => true)
    val b = Tables.nation(spark, dir)
    assert(!(a eq b),
      "entries of a stopped session must be dropped so the session and " +
        "its plans can be collected")
    assert(Tables.nation(spark, dir) eq b, "live-session memoization intact")
  }
}
