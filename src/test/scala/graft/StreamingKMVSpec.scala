package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{KeyedHash, StreamingKMV}

/** Streaming KMV distinct-count (StreamingKMV, r13's live form): the
  * synopsis is deterministic and order-FREE, so streaming agrees with the
  * batch sketch bit-for-bit with no ordered-delivery caveat; sub-k groups
  * report exactly; state is k 60-bit long prefixes per group at any
  * stream length, and the codegen prefix expression agrees with the
  * JVM-side hex parse exactly.
  */
class StreamingKMVSpec extends SparkSpecBase {
  import spark.implicits._

  private var n = 0
  private def tmp(): String = {
    n += 1
    java.nio.file.Files.createTempDirectory(s"graft_skmv_$n").toString
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** The JVM-side 60-bit prefix of a value, via the hex rendering — what
    * keyedHashes' codegen conv/substring path must reproduce.
    */
  private def pfx(s: String): Long = StreamingKMV.prefixOf(md5Hex(s))

  test("keyedHashes' codegen prefix equals the JVM hex parse (hex<->long pin)") {
    val vals = (1 to 200).map(i => s"item_$i") :+ "" :+ "0" :+ "édge"
    val got = StreamingKMV.keyedHashes(
        vals.toDF("v"), lit("g"), col("v"))
      .collect().map(_.h).toSeq
    val want = vals.map(pfx)
    assert(got == want,
      "conv(substring(md5, 1, 15), 16, 10) must equal Long.parseLong(hex[0,15), 16)")
    assert(got.forall(h => h >= 0 && h < (1L << 60)), "prefixes live in [0, 2^60)")
  }

  test("below k distinct values the synopsis is the set: estimate exact") {
    val evs = (1 to 40).map(i => KeyedHash("g", pfx(s"v$i"))) ++
      (1 to 40).map(i => KeyedHash("g", pfx(s"v$i"))) // repeats fold away
    val out = StreamingKMV.track(evs.toDS(), k = 64).collect()
    assert(out.length == 1)
    assert(out.head.n_total == 80L && out.head.n_tracked == 40L)
    assert(out.head.kth_frac == -1.0 && out.head.est_distinct == 40.0,
      "under k the estimate must be the exact distinct count")
  }

  test("arrival order cannot matter: shuffled replay produces the same sketch") {
    val vals = (1 to 500).map(i => s"item_$i")
    val fwd = vals.map(v => KeyedHash("g", pfx(v)))
    val rev = fwd.reverse
    val a = StreamingKMV.track(fwd.toDS(), k = 64).collect()
      .maxBy(_.n_total)
    val b = StreamingKMV.track(rev.toDS(), k = 64).collect()
      .maxBy(_.n_total)
    assert(a == b, "a min-k set is order-free — forward == reversed replay")
    assert(a.kth_frac > 0 && a.n_tracked == 64)
  }

  test("streaming micro-batches agree with the r13 batch sketch bit-for-bit") {
    val dir = sf("sf0.001")
    val raw = Tables.events(spark, dir)
    // same value, same md5 prefix, same global scope as r13 (group constant)
    val typed = StreamingKMV.keyedHashes(raw, lit("all"), col("event_id"))
      .collect()
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedHash]
    val q = StreamingKMV.track(in.toDS(), k = 64)
      .writeStream.format("memory").queryName("skmv_agree")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val last = try {
      typed.grouped(700).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("skmv_agree")
        .as[graft.streaming.KmvSnapshot].collect().maxBy(_.n_total)
    } finally q.stop()
    val r13 = SparkEntry.queries("r13_kmv_cardinality")(spark, dir)
      .collect().head
    assert(last.kth_frac == r13.getAs[Double]("kth_frac"),
      "the streaming kth fraction must equal the batch sketch exactly")
    assert(last.est_distinct == r13.getAs[Double]("est_distinct"),
      "the streaming estimate must equal the batch estimate exactly")
    assert(last.n_total == raw.count(), "every observation folded")
  }

  test("per-group tracking: independent sketches, state bounded at k each") {
    val evs = (1 to 2000).map { i =>
      KeyedHash(s"g${i % 3}", pfx(s"u${i % 700}"))
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedHash]
    val q = StreamingKMV.track(in.toDS(), k = 16)
      .writeStream.format("memory").queryName("skmv_groups")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    try {
      evs.grouped(500).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      val latest = StreamingKMV.latest(spark.table("skmv_groups"))
        .collect().map(r => r.getAs[String]("group") ->
          (r.getAs[Long]("n_tracked"), r.getAs[Double]("est_distinct"))).toMap
      assert(latest.keySet == Set("g0", "g1", "g2"))
      // the sketch is deterministic: fold the same input in plain Scala
      // and require the per-group estimates EQUAL the streaming ones
      // (k=16 is deliberately coarse — exactness of the synopsis, not
      // accuracy of the estimate, is the property under test)
      val expected = evs.groupBy(_.group).map { case (g, es) =>
        val kth = es.map(_.h).distinct.sorted.take(16).last
        g -> 15.0 / StreamingKMV.fracOf(kth)
      }
      latest.foreach { case (g, (tracked, est)) =>
        assert(tracked == 16L, "synopsis truncates at k")
        assert(est == expected(g), s"$g estimate must equal the exact fold")
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 3L, "one state row per group")
    } finally q.stop()
  }

  test("the cutoff fast path cannot change the synopsis: full-stream vs split fold") {
    // feed 3000 values in one batch vs 30 batches of 100 — the per-batch
    // cutoff rejection (h >= kth minimum skips set work) must be
    // invisible in the final sketch
    val vals = (1 to 3000).map(i => KeyedHash("g", pfx(s"x$i")))
    val one = StreamingKMV.track(vals.toDS(), k = 32).collect()
      .maxBy(_.n_total)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedHash]
    val q = StreamingKMV.track(in.toDS(), k = 32)
      .writeStream.format("memory").queryName("skmv_split")
      .outputMode("append").option("checkpointLocation", tmp()).start()
    val many = try {
      vals.grouped(100).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
      spark.table("skmv_split")
        .as[graft.streaming.KmvSnapshot].collect().maxBy(_.n_total)
    } finally q.stop()
    assert(one == many, "batch splitting must not change the sketch")
  }
}
