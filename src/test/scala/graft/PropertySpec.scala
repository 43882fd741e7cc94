package graft

import org.apache.spark.sql.functions._

import graft.config.Duration
import graft.harness.{GridGenerator, Metrics}
import graft.operators.{Dedup, DuplicateInjector, EventGenerator}

/** Property tests for the arithmetic contracts (SURVEY.md §5):
  * dedup ∘ inject = identity on counts, sampling cardinality/evenness,
  * duration parsing, duplicate arithmetic. Cases are seeded sweeps (the
  * scalatest↔scalacheck bridge isn't on the offline classpath).
  */
class PropertySpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(42)

  test("∀ (n, k): dedup(injectEveryK(gen n, k)) restores exactly n rows") {
    for (_ <- 1 to 8) {
      val n = 1L + rnd.nextInt(500)
      val k = 1 + rnd.nextInt(20)
      val gen = EventGenerator.generate(spark, n, seed = 1L, numPartitions = 4)
      val sent = DuplicateInjector.injectEveryK(gen, col("row_id"), k)
      val expectedSent = n + (n + k - 1) / k // rows with row_id % k == 0
      assert(sent.count() == expectedSent, s"n=$n k=$k")
      val back = Dedup.keepFirst(sent, Seq("event_id"),
        to_timestamp(col("created_at")), col("row_id"))
      assert(back.count() == n, s"n=$n k=$k")
    }
  }

  test("∀ (len, k): evenSample returns min(k, len) items, ordered, from the input") {
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(201)
      val k = 1 + rnd.nextInt(50)
      val xs = (0 until len).toList
      val s = GridGenerator.evenSample(xs, k)
      assert(s.size == math.min(k, len), s"len=$len k=$k")
      assert(s == s.sorted, "evenly spaced indices are monotonic")
      assert(s.forall(xs.contains))
      // reference arithmetic: idx_i = int(i * len/k)
      if (len > k) {
        val step = len.toDouble / k
        assert(s == (0 until k).map(i => xs((i * step).toInt)), s"len=$len k=$k")
      }
    }
  }

  test("∀ sent, ratio: unique + duplicates == sent, unique == floor(sent/(1+r))") {
    for (_ <- 1 to 500) {
      val sent = math.abs(rnd.nextLong()) % 10000000L
      val r = rnd.nextDouble()
      val u = Metrics.uniqueOf(sent, r)
      val d = Metrics.duplicatesOf(sent, r)
      assert(u + d == sent, s"sent=$sent r=$r")
      assert(u == (sent / (1 + r)).toLong)
    }
    // the reference's own CSV row 2 numbers
    assert(Metrics.uniqueOf(5000000L, 0.1) == 4545454L)
    assert(Metrics.duplicatesOf(5000000L, 0.1) == 454546L)
  }

  test("duration parse/render round trip on canonical forms") {
    val units = Seq("ms" -> 1L, "s" -> 1000L, "m" -> 60000L,
      "h" -> 3600000L, "d" -> 86400000L)
    for (_ <- 1 to 200) {
      val n = 1L + rnd.nextInt(10000)
      val (u, mult) = units(rnd.nextInt(units.size))
      assert(Duration.parse(s"$n$u").millis == n * mult, s"$n$u")
    }
    assert(Duration.parse("1h30m").millis == 5400000L)
    intercept[IllegalArgumentException](Duration.parse("10 parsecs"))
  }

  test("d02 df cap: no-op below the cap, kills candidate groups above it") {
    val dir = sf("sf0.001")
    val un = queries.DedupQueries.d02Pairs(spark, dir, maxDf = Int.MaxValue)
      .collect().map(_.toSeq)
    val capped = queries.DedupQueries.d02Pairs(spark, dir, maxDf = 1000)
      .collect().map(_.toSeq)
    assert(un.nonEmpty && un.sameElements(capped),
      "a cap above every real document frequency must not change results")
    // maxDf = 1 drops every multi-document shingle group → no candidates left
    assert(queries.DedupQueries.d02Pairs(spark, dir, maxDf = 1).count() == 0L)
  }

  test("d02 cap exceeds every real shingle group (oracle comparability guard)") {
    // The DuckDB oracle computes UNCAPPED all-pairs Jaccard; Spark caps df at
    // DefaultMaxDf. They agree only while no real group reaches the cap —
    // assert it so a testdata change can't silently diverge them (the same
    // guard runs DuckDB-side in tools/check.py).
    import graft.functions.ShingleHashes
    for (d <- Seq("sf0.001", "sf0.01")) {
      val maxDf = Tables.documents(spark, sf(d))
        .select(explode(ShingleHashes(split(col("text"), " "), 3)).as("sng"))
        .groupBy(col("sng")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).head().getLong(0)
      assert(maxDf < queries.DedupQueries.DefaultMaxDf,
        s"$d: max shingle df $maxDf reaches the cap — capped d02 and uncapped oracle diverge")
    }
  }

  test("∀ n: LSH bucket occupancy n/2^planesFor(n) is bounded by the target, not by n") {
    import graft.functions.VectorFunctions._
    // the scale contract behind s02/s06/d11: expected per-band bucket
    // occupancy never exceeds TargetBucketSize at ANY corpus size — the
    // plane count grows with log2(n) instead of freezing at a constant
    // (a fixed plane count makes candidate joins O(n²/2^const))
    val sizes = Seq(1L, 100L, 500L, 2000L, 16384L, 100000L, 10000000L,
      1000000000L, 1000000000000L, 10000000000000L)
    for (n <- sizes) {
      val p = planesFor(n)
      assert(p >= MinPlanes, s"floor violated at n=$n")
      assert(n.toDouble / math.pow(2.0, p) <= TargetBucketSize,
        s"expected occupancy ${n.toDouble / math.pow(2.0, p)} exceeds " +
          s"$TargetBucketSize at n=$n (p=$p)")
      assert(p <= 62, s"band value must fit a long at n=$n")
    }
    // the static SQL oracles pin the MinPlanes floor — planesFor must sit at
    // that floor for every verify-scale corpus (sf0.001/sf0.01/sf0.1), else
    // DataFrame and oracle hyperplane sets would diverge
    for (n <- Seq(500L, 2000L, 5000L))
      assert(planesFor(n) == MinPlanes, s"SQL-oracle floor broken at n=$n")
  }

  test("packing/chunking/percentile/funnel invariants hold on real data") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val nToks = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)

    // t12: every doc lands in exactly one batch; tokens are conserved;
    // shards stay in range; no batch exceeds the budget by more than one
    // straddling document (batch = start-offset div budget, so a batch's
    // token total is < budget + its last doc's length ≤ budget - 1 + maxLen)
    val packing = SparkEntry.queries("t12_seq_packing")(spark, dir)
    assert(packing.agg(sum(col("n_docs"))).head().getLong(0) == nDocs)
    assert(packing.agg(sum(col("n_tokens"))).head().getLong(0) == nToks)
    assert(packing.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    val maxLen = docs.select(max(size(split(col("text"), " ")))).head().getInt(0)
    assert(packing.filter(col("n_tokens") >= 512 + maxLen).count() == 0,
      "a batch may overflow the budget only by its final straddling doc")

    // t14: chunks tile each doc — conserved doc count, first chunk at token
    // 1, last chunk reaches the final token (start + n_toks - 1 == len)
    val chunks = SparkEntry.queries("t14_chunking")(spark, dir)
    assert(chunks.select(countDistinct(col("doc_id"))).head().getLong(0) == nDocs)
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("len"))
    val lastCover = chunks.groupBy(col("doc_id"))
      .agg(max(col("start_tok") + col("n_toks") - 1).as("covered"),
        min(col("start_tok")).as("first"))
      .join(lens, "doc_id")
    assert(lastCover.filter(col("covered") =!= col("len") ||
      col("first") =!= 1).count() == 0, "chunks must cover every token")

    // r05: percentiles are monotone per group
    val pct = SparkEntry.queries("r05_percentiles")(spark, dir)
    assert(pct.filter(col("p50") > col("p90") || col("p90") > col("p99"))
      .count() == 0)

    // j05: rates bounded, conversions never exceed clicks
    val funnel = SparkEntry.queries("j05_conversion_funnel")(spark, dir)
    assert(funnel.filter(col("n_converted") > col("n_clicks") ||
      col("conv_rate") < 0 || col("conv_rate") > 1).count() == 0)

    // t15: shares partition the corpus (sum to 1); a source's weighted token
    // mass equals the uniform target (weight · share = 1/n_sources)
    val mix = SparkEntry.queries("t15_domain_mix")(spark, dir).collect()
    assert(math.abs(mix.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-9)
    val nSrc = mix.length
    mix.foreach { r =>
      val bal = r.getAs[Double]("mix_weight") * r.getAs[Double]("token_share")
      assert(math.abs(bal - 1.0 / nSrc) < 1e-9,
        "reweighted shares must be uniform across sources")
    }

    // t16: at most the quota per language; deterministic under repartitioning
    val quota = SparkEntry.queries("t16_quota_sample")(spark, dir)
    val perLang = quota.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(perLang.filter(col("n") > 20).count() == 0)
    assert(quota.select(max(col("rk"))).head().getLong(0) <= 20L)

    // d11: every cluster has >= 2 members (singletons aren't emitted) and the
    // representative is the component label (min member id)
    val sem = SparkEntry.queries("d11_semantic_dedup")(spark, dir)
    assert(sem.filter(col("n_members") < 2 ||
      col("rep_vec_id") =!= col("component")).count() == 0)
  }

  test("SCD2/PQ/TPC-H-shape invariants hold on real data") {
    val dir = sf("sf0.001")
    val ev = Tables.events(spark, dir)

    // j08: per user — versions are contiguous from 1, intervals tile the
    // history (valid_to(k) == valid_from(k+1)), exactly one open (current)
    // interval, and run sizes conserve the user's event count
    val scd = SparkEntry.queries("j08_scd2_intervals")(spark, dir)
    val perUser = scd.groupBy(col("user_id")).agg(
      min(col("version")).as("vmin"), max(col("version")).as("vmax"),
      count(lit(1)).as("n_runs"),
      sum(col("is_current").cast("long")).as("n_open"),
      sum(col("n_events")).as("n_ev"))
    assert(perUser.filter(col("vmin") =!= 1 || col("vmax") =!= col("n_runs") ||
      col("n_open") =!= 1).count() == 0,
      "versions must be contiguous with exactly one current row per user")
    val evCounts = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_raw"))
    assert(perUser.join(evCounts, "user_id")
      .filter(col("n_ev") =!= col("n_raw")).count() == 0,
      "runs must conserve each user's event count")
    import org.apache.spark.sql.expressions.Window
    val nxt = Window.partitionBy(col("user_id")).orderBy(col("version"))
    assert(scd.withColumn("nf", lead(col("valid_from"), 1).over(nxt))
      .filter(col("nf").isNotNull && col("valid_to") =!= col("nf"))
      .count() == 0, "intervals must tile: valid_to == next valid_from")

    // s08: histogram covers every (vector, subspace) exactly once; codes are
    // drawn from the 8-centroid codebook; distortion is non-negative
    val pq = SparkEntry.queries("s08_pq_codes")(spark, dir)
    val nVecs = Tables.embeddings(spark, dir).count()
    val perSub = pq.groupBy(col("sub")).agg(sum(col("n_vecs")).as("n"),
      countDistinct(col("code")).as("n_codes"))
    assert(perSub.count() == 4 &&
      perSub.filter(col("n") =!= nVecs || col("n_codes") > 8).count() == 0,
      "each subspace must assign every vector to one of ≤8 codes")
    assert(pq.filter(col("mean_d2") < 0).count() == 0)

    // q20: a sole failing supplier exists only for multi-supplier orders, so
    // numwait is bounded by the supplier's own distinct returned orders
    val q20 = SparkEntry.queries("q20_sole_failing_supplier")(spark, dir)
    assert(q20.filter(col("numwait") < 1).count() == 0)

    // q19: the top-20 rows descend by revenue (full tiebreak)
    val q19 = SparkEntry.queries("q19_returned_items")(spark, dir).collect()
    val revs = q19.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "rows must descend by revenue")
  }

  test("generator is collision-free and deterministic across partitionings") {
    val a = EventGenerator.generate(spark, 300L, seed = 7L, numPartitions = 1)
    val b = EventGenerator.generate(spark, 300L, seed = 7L, numPartitions = 8)
    assert(a.select("event_id").distinct().count() == 300L)
    val ra = a.orderBy("row_id").collect().map(_.toSeq)
    val rb = b.orderBy("row_id").collect().map(_.toSeq)
    assert(ra.sameElements(rb), "partitioning must not change row content")
  }

  test("t21 sorted-run fold == histogram arithmetic; s09/j09 invariants on real data") {
    val dir = sf("sf0.001")
    // t21: the incremental 2(c−1) run accumulation must equal Σc(c−1) and
    // max_count the true max multiplicity, per doc, vs a driver histogram.
    val t21 = SparkEntry.queries("t21_token_concentration")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
    var checked = 0
    for (r <- docs) {
      val ws = r.getString(1).split(" ", -1)
      if (ws.length >= 2) {
        val h = ws.groupBy(identity).map(_._2.length.toLong)
        val exp = (ws.length.toLong, h.max, h.map(c => c * (c - 1)).sum)
        assert(t21(r.getLong(0)) == exp, s"doc ${r.getLong(0)}")
        checked += 1
      }
    }
    assert(checked > 100, "the property must cover a real corpus slice")

    // s09: every code in [0,256); decode(code cell midpoint) is within one
    // cell span of the input for every dim — the quantizer's error bound.
    val s09 = SparkEntry.queries("s09_sq_codes")(spark, dir).collect()
    assert(s09.nonEmpty)
    for (r <- s09) {
      val codes = r.getString(1).split(',').map(_.toLong).toSeq
      assert(codes.length == 64 && codes.forall(c => c >= 0 && c < 256))
    }

    // j09: concurrency is symmetric-consistent — total directed overlap
    // pairs (Σ n_concurrent) must be even, and every count ≥ 0.
    val j09 = SparkEntry.queries("j09_concurrent_sessions")(spark, dir)
      .collect().map(_.getLong(2))
    assert(j09.forall(_ >= 0L))
    assert(j09.sum % 2 == 0, "overlap is symmetric: directed pairs pair up")
  }

  test("MinKCollect: O(k) buffer, == sort-then-slice, any split/order") {
    import java.sql.Timestamp
    import graft.functions.{MinKCollect, PathEv}
    implicit val ord: Ordering[PathEv] =
      Ordering.by((e: PathEv) => (e.ts.getTime, e.event_id))
    implicit val enc: org.apache.spark.sql.Encoder[Seq[PathEv]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    for (trial <- 1 to 12) {
      val k = 1 + rnd.nextInt(7)
      val n = 1 + rnd.nextInt(400) // sessions far longer than k
      val agg = new MinKCollect[PathEv](k)
      val evs = Seq.tabulate(n)(i =>
        PathEv(new Timestamp(rnd.nextInt(100000).toLong), i.toLong, s"t${i % 7}"))
      val shuffled = rnd.shuffle(evs)
      // arbitrary partial split + merge, tracking the max buffer size ever
      // held: the whole point is that a session of ANY length costs O(k)
      var maxBuf = 0
      val parts = shuffled.grouped(1 + rnd.nextInt(50)).map { chunk =>
        var b = agg.zero
        chunk.foreach { e => b = agg.reduce(b, e); maxBuf = maxBuf max b.size }
        b
      }.toSeq
      val merged = parts.reduce { (a, b) =>
        val m = agg.merge(a, b); maxBuf = maxBuf max m.size; m
      }
      assert(maxBuf <= k, s"buffer exceeded k=$k (saw $maxBuf)")
      assert(agg.finish(merged) == evs.sorted.take(k),
        s"trial $trial: min-k must equal sort-then-slice")
    }
  }

  test("j13/r17/r18/s18 invariants hold on real data") {
    val dir = sf("sf0.001")

    // j13: shares are an exact partition of the purchase value — per
    // purchase, Σ share_cents == round(value·100), ranks are 1..k dense,
    // and no share differs from another by more than one cent
    val attr = SparkEntry.queries("j13_attribution")(spark, dir)
    val purchaseCents = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"),
        round(col("value").cast("double") * 100).cast("long").as("true_cents"))
    val offSum = attr.groupBy(col("p_id"))
      .agg(sum(col("share_cents")).as("sum_c"))
      .join(purchaseCents, "p_id")
      .filter(col("sum_c") =!= col("true_cents"))
    assert(offSum.count() == 0, "shares sum to the purchase value exactly")
    val bad = attr.groupBy(col("p_id"), col("n_touches"))
      .agg(sum(col("share_cents")).as("sum_c"), count(lit(1)).as("k"),
        max(col("share_cents")).as("mx"), min(col("share_cents")).as("mn"),
        max(col("touch_rank")).as("mxrk"))
      .filter(col("k") =!= col("n_touches") || col("mxrk") =!= col("k") ||
        col("mx") - col("mn") > 1)
    assert(bad.count() == 0,
      "every purchase: dense ranks, counts match, shares within one cent")
    // Σ share_value · 100 == Σ share_cents exactly (display column honest)
    val sv = attr.agg(sum(col("share_cents")).as("sc"),
      sum(round(col("share_value") * 100).cast("long")).as("sv")).head()
    assert(sv.getLong(0) == sv.getLong(1))

    // r17: D ∈ [0, 1], halves partition each type's rows
    val ks = SparkEntry.queries("r17_ks_drift")(spark, dir)
    assert(ks.filter(col("ks_d") < 0 || col("ks_d") > 1).count() == 0)
    val evByType = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = ks.join(evByType, "event_type")
      .filter(col("n_a") + col("n_b") =!= col("n"))
    assert(joined.count() == 0, "a/b halves partition each type exactly")

    // r18: ≤10 rows per type, counts non-increasing in rank
    val hh = SparkEntry.queries("r18_heavy_hitters")(spark, dir)
    assert(hh.filter(col("rk") > 10).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val lagW = Window.partitionBy(col("event_type")).orderBy(col("rk"))
    assert(hh.withColumn("prev", lag(col("cnt"), 1).over(lagW))
      .filter(col("prev").isNotNull && col("cnt") > col("prev"))
      .count() == 0, "counts never increase down the ranking")

    // s18: exactly 5 distinct picks; rank 1 is the relevance argmax; every
    // later pick's mmr ≤ its own rel (a 0.3·max_sim penalty only subtracts
    // when sims are positive — assert on the weaker always-true bound
    // mmr == 0.7·rel − 0.3·max_sim ≤ 0.7·rel + 0.3)
    val mmr = SparkEntry.queries("s18_mmr_diversity")(spark, dir).collect()
    assert(mmr.length == 5)
    assert(mmr.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    val byRank = mmr.sortBy(_.getAs[Long]("rank"))
    assert(byRank.head.getAs[Double]("rel") ==
      mmr.map(_.getAs[Double]("rel")).max ||
      byRank.head.getAs[Double]("mmr") == byRank.head.getAs[Double]("rel"),
      "rank 1 is the pure-relevance pick")
    byRank.tail.foreach { r =>
      assert(r.getAs[Double]("mmr") <= 0.7 * r.getAs[Double]("rel") + 0.3)
    }
  }

  test("r14 bucketed-join EWMA and t27 Zipf fit match sequential references") {
    val dir = sf("sf0.001")
    // r14: the bucketed equi-join re-expression of the trailing window must
    // equal a driver-side sequential computation bit for bit
    val out = SparkEntry.queries("r14_ewma")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
        round(col("value").cast("double") * 100).cast("long").as("vq"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4).toSeq
      sorted.zipWithIndex.collect { case (_, i) if (i + 1) % 29 == 0 =>
        val win = sorted.slice(math.max(0, i - 19), i + 1).toSeq
        val l = win.length
        val ws = win.zipWithIndex.map { case (v, j) =>
          v * (1L << (19 - (l - 1 - j))) }.sum
        val wsum = win.indices.map(j => 1L << (19 - (l - 1 - j))).sum
        (t, (i + 1).toLong) -> (l.toLong, ws.toDouble / (wsum * 100).toDouble)
      }
    }.toMap
    assert(out == expected, "EWMA bucketed join must equal the sequential fold")

    // t27: the distributed exact-integer regression must equal a direct
    // least-squares fit over the same vocabulary head
    val row = SparkEntry.queries("t27_zipf_fit")(spark, dir).head()
    val words = graft.Tables.documents(spark, dir)
      .select(col("text")).collect().flatMap(_.getString(0).split(" "))
    val head = words.groupBy(identity).map { case (w, a) => (w, a.length.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(50)
    val xy = head.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(c.toDouble) * 1e6))
    }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val num = (n * sxy - sx * sy).toDouble
    val dx = (n * sxx - sx * sx).toDouble
    val dy = (n * syy - sy * sy).toDouble
    val slope = num / dx
    val intercept = (sy.toDouble / 1e6 - slope * (sx.toDouble / 1e6)) / n.toDouble
    val a = num / math.sqrt(dx)
    assert(row.getAs[Long]("n_terms") == n)
    assert(row.getAs[Double]("slope") == slope)
    assert(row.getAs[Double]("intercept") == intercept)
    assert(row.getAs[Double]("r2") == a * a / dy)
    assert(slope < -0.1 && slope > -3.0, s"plausible Zipf slope, got $slope")
  }
}
