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
}
