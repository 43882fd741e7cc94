package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational breadth beyond the reference's surface: grouping sets,
  * date/string expression pack, exact statistical aggregates, set ops —
  * the remainder of what "a user could switch their queries to this engine"
  * implies. Determinism rules per QueryDef.scala.
  */
object RelationalQueries extends QueryPack {

  /** r01 — ROLLUP grouping-set aggregation with decimal-exact sums.
    * GROUPING() disambiguates the null super-aggregate rows.
    */
  private def r01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))

  private val r01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  /** r02 — date/string expression pack over orders: calendar extraction,
    * month truncation, string slicing/cleanup — the per-row transform
    * vocabulary, all codegen'd builtins.
    */
  private def r02(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderpriority").startsWith("1"))
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        upper(substring(col("o_orderpriority"), 3, 20)).as("prio_name"),
        length(trim(col("o_orderpriority"))).cast("long").as("prio_len"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("status_key"))
      .orderBy(col("o_orderkey"))

  private val r02Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(day(o_orderdate) AS BIGINT) AS d,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  upper(substr(o_orderpriority, 3)) AS prio_name,
      |  CAST(length(trim(o_orderpriority)) AS BIGINT) AS prio_len,
      |  o_orderstatus || '#' || o_orderpriority AS status_key
      |FROM orders
      |WHERE o_orderpriority LIKE '1%'
      |ORDER BY o_orderkey""".stripMargin

  /** r03 — exact statistical aggregates: distinct counts plus stddev derived
    * from integer-quantized sums (vq = round(v·10⁶); Σvq and Σvq² are exact
    * integers, so the final double math is bit-identical in any engine —
    * unlike a naive double stddev whose partial sums are order-dependent,
    * or DECIMAL casts whose double→decimal rounding differs per engine).
    */
  private def r03(s: SparkSession, dir: String): DataFrame = {
    val vq = round(col("value").cast("double") * 1000000).cast("long")
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), vq.as("vq"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        // both sums in decimal with operands cast BEFORE the multiply
        // (r11's pattern): Σvq passes int64 at warehouse row counts too
        // (vq ≤ 5.6e8 at the 1e6 quantization), and a per-term vq² in
        // long would wrap at vq ≳ 3e9 on a wider value range;
        // decimal→double matches the oracle's VARCHAR→DOUBLE route
        // (r22 class)
        sum(col("vq").cast("decimal(38,0)")).as("sum_vq"),
        sum(col("vq").cast("decimal(38,0)")
          * col("vq").cast("decimal(38,0)")).as("sum_vq2"))
      .select(col("event_type"), col("n"), col("n_users"),
        (col("sum_vq").cast("double") / 1000000.0).as("sum_v"),
        // sample stddev from exact integer sums, descaled at the end:
        // sqrt((Σvq² − (Σvq)²/n) / (n−1)) / 10⁶
        (sqrt((col("sum_vq2").cast("double")
          - col("sum_vq").cast("double") * col("sum_vq").cast("double") / col("n"))
          / (col("n") - 1)) / 1000000.0).as("stddev_v"))
      .orderBy(col("event_type"))
  }

  private val r03Sql =
    """WITH q AS (
      |  SELECT event_type, user_id,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vq
      |  FROM events),
      |a AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    COUNT(DISTINCT user_id) AS n_users,
      |    SUM(vq) AS sum_vq, SUM(CAST(vq AS HUGEINT) * vq) AS sum_vq2
      |  FROM q GROUP BY event_type),
      |-- HUGEINT sums route through VARCHAR (r11's rule): correctly
      |-- rounded to DOUBLE, matching Spark's decimal->double
      |f AS (SELECT event_type, n, n_users,
      |  CAST(CAST(sum_vq AS VARCHAR) AS DOUBLE) AS d1,
      |  CAST(CAST(sum_vq2 AS VARCHAR) AS DOUBLE) AS d2 FROM a)
      |SELECT event_type, n, n_users,
      |  d1 / 1000000.0 AS sum_v,
      |  sqrt((d2 - d1 * d1 / n) / (n - 1)) / 1000000.0 AS stddev_v
      |FROM f ORDER BY event_type""".stripMargin

  /** r04 — set operations: INTERSECT / EXCEPT over derived key sets (users
    * who clicked vs users who purchased).
    */
  private def r04(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clickers = ev.filter(col("event_type") === "click").select(col("user_id"))
    val buyers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val both = clickers.intersect(buyers).withColumn("cohort", lit("click_and_buy"))
    val onlyClick = clickers.except(buyers).withColumn("cohort", lit("click_only"))
    both.unionAll(onlyClick)
      .groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"))
  }

  private val r04Sql =
    """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |cb AS (SELECT user_id, 'click_and_buy' AS cohort FROM c INTERSECT
      |       SELECT user_id, 'click_and_buy' FROM b),
      |onlyc AS (SELECT user_id, 'click_only' AS cohort FROM c EXCEPT
      |          SELECT user_id, 'click_only' FROM b)
      |SELECT cohort, COUNT(*) AS n_users FROM (
      |  SELECT * FROM cb UNION ALL SELECT * FROM onlyc)
      |GROUP BY cohort ORDER BY cohort""".stripMargin

  /** r05 — exact discrete percentiles by rank selection: per event type,
    * the value at rank ceil(p·n) of the integer-quantized distribution
    * (p50/p90/p99). Rank selection over exact ints is engine-independent,
    * unlike interpolated percentile_cont whose float formula association
    * differs across engines. One window sort per group — the exact path;
    * at lake scale swap in approx_percentile and keep this as the auditor.
    */
  private def r05(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value").cast("double") * 1000000).cast("long").as("vq"))
    val ranked = q
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("vq"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    def pct(p: Double, name: String) =
      (max(when(col("rn") === ceil(col("n") * p), col("vq"))).cast("double")
        / 1000000.0).as(name)
    ranked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        pct(0.5, "p50"), pct(0.9, "p90"), pct(0.99, "p99"))
      .orderBy(col("event_type"))
  }

  private val r05Sql =
    """WITH q AS (SELECT event_type,
      |  CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vq FROM events),
      |r AS (SELECT event_type, vq,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vq) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM q)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN vq END) AS DOUBLE) / 1000000.0 AS p50,
      |  CAST(MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN vq END) AS DOUBLE) / 1000000.0 AS p90,
      |  CAST(MAX(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN vq END) AS DOUBLE) / 1000000.0 AS p99
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** r06 — analytic window pack: per-user running totals, lag deltas, and
    * ranks over the event stream (the sessionization/feature-engineering
    * window vocabulary). Running sums accumulate exact quantized ints
    * (order-independent given the total (ts, event_id) order), descaled to
    * doubles at the end.
    */
  private def r06(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value").cast("double") * 1000000).cast("long").as("vq"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    q.select(col("event_id"), col("user_id"),
        row_number().over(w).cast("long").as("rn"),
        (sum(col("vq")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / 1000000.0).as("run_v"),
        ((col("vq") - lag(col("vq"), 1).over(w)).cast("double") / 1000000.0)
          .as("delta_v"))
      .orderBy(col("user_id"), col("rn"))
  }

  private val r06Sql =
    """WITH q AS (SELECT event_id, user_id, ts,
      |  CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vq FROM events)
      |SELECT event_id, user_id,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |  CAST(SUM(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / 1000000.0 AS run_v,
      |  CAST(vq - LAG(vq, 1) OVER w AS DOUBLE) / 1000000.0 AS delta_v
      |FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, rn""".stripMargin

  /** r07 — CUBE over the documents corpus (lang × source): token totals at
    * all four grouping levels in ONE pass (per-cell, per-lang, per-source,
    * grand total) — the data-card cross-tab r01's ROLLUP can't produce
    * (rollup omits the source-only margin). GROUPING() flags disambiguate
    * the null super-aggregate rows; within a fixed flag pair the null
    * pattern is constant, so cross-engine null ordering never matters.
    */
  private def r07(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    Tables.documents(s, dir)
      .select(col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_src"))
      .orderBy(col("g_lang"), col("g_src"), col("lang"), col("source"))
  }

  private val r07Sql =
    """WITH d AS (SELECT lang, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks FROM documents)
      |SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
      |  CAST(GROUPING(source) AS BIGINT) AS g_src
      |FROM d GROUP BY CUBE (lang, source)
      |ORDER BY g_lang, g_src, lang, source""".stripMargin

  /** r08 — pivot cross-tab: per-source doc counts spread across language
    * columns. Spark's `pivot` with an EXPLICIT value list compiles to a
    * single-pass hash aggregate of `count(CASE WHEN lang = v)` columns — one
    * shuffle on `source`, no per-language re-scan, no transpose; never call
    * valueless `pivot(col)` at scale (it runs a distinct-collect job on the
    * driver first). Missing cells coalesce to 0 to match SQL's SUM(CASE).
    */
  private def r08(s: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val p = Tables.documents(s, dir)
      .groupBy(col("source"))
      .pivot("lang", langs)
      .agg(count(lit(1)))
    p.select(col("source") +: langs.map(l =>
        coalesce(col(l), lit(0L)).as(l)): _*)
      .orderBy(col("source"))
  }

  private val r08Sql =
    """SELECT source,
      |  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
      |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
      |  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
      |  CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
      |  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** r09 — explicit GROUPING SETS (the asymmetric shape neither r01's
    * rollup nor r07's cube expresses: both one-dimension margins but no
    * grand total), via the native Dataset.groupingSets API — one Expand +
    * one hash aggregate, exactly the rollup plan family. Decimal-exact sums
    * cast to double once; grouping() flags disambiguate real NULL groups.
    */
  private def r09(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("ship_year", year(col("l_shipdate")).cast("long"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("ship_year")),
          Seq(col("l_returnflag")), Seq(col("ship_year"))),
        col("l_returnflag"), col("ship_year"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("ship_year")).cast("long").as("g_sy"))
      .orderBy(col("g_rf"), col("g_sy"), col("l_returnflag"), col("ship_year"))

  private val r09Sql =
    """SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(CAST(year(l_shipdate) AS BIGINT)) AS BIGINT) AS g_sy
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, ship_year), (l_returnflag), (ship_year))
      |ORDER BY g_rf, g_sy, l_returnflag, ship_year""".stripMargin

  /** r10 — distribution-shape stats (skewness, excess kurtosis) per event
    * type, the data-card moments r03's mean/stddev stop short of. Built the
    * r03 way: quantize values to integer cents, accumulate EXACT power sums
    * (Σv, Σv², Σv³, Σv⁴ — the cubes/quartics in decimal(38,0) so no long
    * overflow at any corpus size), then evaluate the central-moment formulas
    * once per group in double with an identical expression tree in both
    * engines. Skew/kurtosis are scale-invariant, so the quantization factor
    * cancels; mean/stddev descale by 100. One map-side-combined aggregation
    * over a 5-group key — no second pass, no window, codegen end to end.
    */
  private def r10(s: SparkSession, dir: String): DataFrame = {
    val vq = round(col("value").cast("double") * 100).cast("long")
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val agg = Tables.events(s, dir)
      .select(col("event_type"), vq.as("vq"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("vq")).as("s1"),
        // power sums in decimal with operands cast BEFORE every multiply
        // (r11's pattern): Σvq² passes int64 at ~10⁹ rows/type and a
        // per-term vq³/vq⁴ in long wraps on a wider value range — long
        // would wrap silently while the oracle's HUGEINT stays exact
        // (the r22 overflow class)
        sum(dc(col("vq")) * dc(col("vq"))).as("s2"),
        sum(dc(col("vq")) * dc(col("vq")) * dc(col("vq"))).as("s3"),
        sum(dc(col("vq")) * dc(col("vq"))
          * dc(col("vq")) * dc(col("vq"))).as("s4"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val s3 = col("s3").cast("double")
    val s4 = col("s4").cast("double")
    val mean = s1 / n
    val m2 = s2 / n - mean * mean
    val m3 = s3 / n - lit(3.0) * mean * (s2 / n) +
      lit(2.0) * mean * mean * mean
    val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
      lit(6.0) * mean * mean * (s2 / n) -
      lit(3.0) * mean * mean * mean * mean
    val sd = sqrt(m2)
    agg.select(col("event_type"), col("n"),
        (mean / lit(100.0)).as("mean_v"),
        (sd / lit(100.0)).as("stddev_pop_v"),
        (m3 / (sd * sd * sd)).as("skewness"),
        (m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
      .orderBy(col("event_type"))
  }

  private val r10Sql =
    """WITH q AS (SELECT event_type,
      |  CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS vq FROM events),
      |a AS (SELECT event_type, COUNT(*) AS n, SUM(vq) AS s1,
      |  SUM(CAST(vq AS HUGEINT) * vq) AS s2,
      |  SUM(CAST(vq AS HUGEINT) * vq * vq) AS s3,
      |  SUM(CAST(vq AS HUGEINT) * vq * vq * vq) AS s4
      | FROM q GROUP BY event_type),
      |-- HUGEINT→DOUBLE in DuckDB is not correctly rounded (off by an ulp on
      |-- ~2⁶⁵ sums); VARCHAR→DOUBLE is, and matches Spark's decimal→double.
      |f AS (SELECT event_type, n,
      |  CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS d1,
      |  CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS d2,
      |  CAST(CAST(s3 AS VARCHAR) AS DOUBLE) AS d3,
      |  CAST(CAST(s4 AS VARCHAR) AS DOUBLE) AS d4 FROM a),
      |g AS (SELECT event_type, n, d1 / nd AS mean, nd, d2, d3, d4 FROM f),
      |h AS (SELECT event_type, n, mean,
      |  d2 / nd - mean * mean AS m2,
      |  d3 / nd - CAST(3 AS DOUBLE) * mean * (d2 / nd)
      |    + CAST(2 AS DOUBLE) * mean * mean * mean AS m3,
      |  d4 / nd - CAST(4 AS DOUBLE) * mean * (d3 / nd)
      |    + CAST(6 AS DOUBLE) * mean * mean * (d2 / nd)
      |    - CAST(3 AS DOUBLE) * mean * mean * mean * mean AS m4
      | FROM g)
      |SELECT event_type, n,
      |  mean / CAST(100 AS DOUBLE) AS mean_v,
      |  sqrt(m2) / CAST(100 AS DOUBLE) AS stddev_pop_v,
      |  m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
      |  m4 / (m2 * m2) - CAST(3 AS DOUBLE) AS kurtosis
      |FROM h ORDER BY event_type""".stripMargin

  /** r11 — Pearson correlation matrix over lineitem's numeric measures
    * (quantity, extendedprice, discount), the feature-redundancy screen a
    * data card runs before model training. Built the r10 way: quantize to
    * integer cents, accumulate EXACT linear and cross/square power sums in
    * one aggregation (products in decimal(38,0) — Σ(price²) overflows long
    * at warehouse row counts), then evaluate the product-moment formula
    * once in double with an identical expression tree in both engines.
    *
    * Scale shape: ONE map-side-combined corpus aggregation collapsing to a
    * single row; the three output rows explode from that row's struct array
    * — no second scan, no join, codegen end to end.
    */
  private def r11(s: SparkSession, dir: String): DataFrame = {
    def quant(c: String) = round(col(c).cast("double") * 100).cast("long")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val li = Tables.lineitem(s, dir).select(
      quant("l_quantity").as("x1"), quant("l_extendedprice").as("x2"),
      quant("l_discount").as("x3"))
    val agg = li.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x3")).as("s3"),
      sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
      sum(dec(col("x2")) * dec(col("x2"))).as("s22"),
      sum(dec(col("x3")) * dec(col("x3"))).as("s33"),
      sum(dec(col("x1")) * dec(col("x2"))).as("s12"),
      sum(dec(col("x1")) * dec(col("x3"))).as("s13"),
      sum(dec(col("x2")) * dec(col("x3"))).as("s23"))
    val nd = col("n").cast("double")
    def d(name: String) = col(name).cast("double")
    def corr(sx: String, sy: String, sxx: String, syy: String, sxy: String) =
      (nd * d(sxy) - d(sx) * d(sy)) /
        sqrt((nd * d(sxx) - d(sx) * d(sx)) * (nd * d(syy) - d(sy) * d(sy)))
    agg.select(col("n"), explode(array(
        struct(lit("extendedprice~discount").as("pair"),
          corr("s2", "s3", "s22", "s33", "s23").as("corr_v")),
        struct(lit("quantity~discount").as("pair"),
          corr("s1", "s3", "s11", "s33", "s13").as("corr_v")),
        struct(lit("quantity~extendedprice").as("pair"),
          corr("s1", "s2", "s11", "s22", "s12").as("corr_v"))))
        .as("c"))
      .select(col("c.pair").as("pair"), col("n"), col("c.corr_v").as("corr_v"))
      .orderBy(col("pair"))
  }

  private val r11Sql =
    """WITH q AS (SELECT
      |  CAST(round(CAST(l_quantity AS DOUBLE) * 100) AS BIGINT) AS x1,
      |  CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS x2,
      |  CAST(round(CAST(l_discount AS DOUBLE) * 100) AS BIGINT) AS x3
      | FROM lineitem),
      |a AS (SELECT COUNT(*) AS n,
      |  SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3,
      |  SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
      |  SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
      |  SUM(CAST(x3 AS HUGEINT) * x3) AS s33,
      |  SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
      |  SUM(CAST(x1 AS HUGEINT) * x3) AS s13,
      |  SUM(CAST(x2 AS HUGEINT) * x3) AS s23
      | FROM q),
      |-- HUGEINT→DOUBLE is not correctly rounded in DuckDB; VARCHAR→DOUBLE
      |-- is, and matches Spark's decimal→double (see r10). The linear sums
      |-- s1/s2/s3 are HUGEINT too (DuckDB SUM(BIGINT) widens), so they take
      |-- the same route — exact below 2^53 either way, divergence-proof above
      |f AS (SELECT n, CAST(n AS DOUBLE) AS nd,
      |  CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS d1,
      |  CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS d2,
      |  CAST(CAST(s3 AS VARCHAR) AS DOUBLE) AS d3,
      |  CAST(CAST(s11 AS VARCHAR) AS DOUBLE) AS d11,
      |  CAST(CAST(s22 AS VARCHAR) AS DOUBLE) AS d22,
      |  CAST(CAST(s33 AS VARCHAR) AS DOUBLE) AS d33,
      |  CAST(CAST(s12 AS VARCHAR) AS DOUBLE) AS d12,
      |  CAST(CAST(s13 AS VARCHAR) AS DOUBLE) AS d13,
      |  CAST(CAST(s23 AS VARCHAR) AS DOUBLE) AS d23
      | FROM a)
      |SELECT pair, n, corr_v FROM (
      |  SELECT 'extendedprice~discount' AS pair, n,
      |    (nd * d23 - d2 * d3) /
      |    sqrt((nd * d22 - d2 * d2) * (nd * d33 - d3 * d3)) AS corr_v FROM f
      |  UNION ALL
      |  SELECT 'quantity~discount', n,
      |    (nd * d13 - d1 * d3) /
      |    sqrt((nd * d11 - d1 * d1) * (nd * d33 - d3 * d3)) FROM f
      |  UNION ALL
      |  SELECT 'quantity~extendedprice', n,
      |    (nd * d12 - d1 * d2) /
      |    sqrt((nd * d11 - d1 * d1) * (nd * d22 - d2 * d2)) FROM f)
      |ORDER BY pair""".stripMargin

  /** r12 — Benford leading-digit screen over order totals: the
    * first-significant-digit distribution a data-quality (or fraud) audit
    * compares against Benford's law before trusting a monetary column.
    * Values are quantized to integer cents first so the leading digit is
    * exact in both engines (no float-formatting hazard).
    *
    * Scale shape: one map-side-combined groupBy collapsing the corpus to
    * ≤9 rows; the share normalization is a window over that 9-row
    * aggregate (a deliberate single partition of ≤9 rows, not a
    * corpus-wide window).
    */
  private def r12(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("o_totalprice").cast("double") * 100).cast("long")
    Tables.orders(s, dir)
      .select(substring(cents.cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(Window.partitionBy()))
      .orderBy(col("digit"))
  }

  private val r12Sql =
    """WITH q AS (SELECT substr(CAST(CAST(round(CAST(o_totalprice AS DOUBLE)
      |    * 100) AS BIGINT) AS VARCHAR), 1, 1) AS digit
      | FROM orders),
      |a AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY digit)
      |SELECT digit, n, CAST(n AS DOUBLE) / SUM(n) OVER () AS share
      |FROM a ORDER BY digit""".stripMargin

  /** r14 trailing window length (rows) and output sampling modulus. */
  private val EwmaW = 20
  private val EwmaSampleMod = 29

  /** r14 — exponentially weighted moving average (α = 1/2) of the event
    * value stream, per event type, over a trailing [[EwmaW]]-row window —
    * the smoothing op behind rate dashboards and drift monitors. Dyadic
    * weights make it oracle-exact: value quantized to integer cents, the
    * row at distance d from the head weighted 2^(19−d), numerator and
    * weight-sum accumulated as EXACT integers (|ws| ≤ 20 · 49e3·100 ·
    * 2¹⁹ ≈ 5e11 — far inside 2⁵³), one final double division shared by
    * both engines. A 20-row dyadic tail IS the α=1/2 EWMA to double
    * precision (2⁻²⁰ < ulp of any sum term).
    *
    * Scale shape: the ONLY per-type window is the row_number assignment;
    * the windowed weighting itself is re-expressed as a bucketed
    * EQUI-join — each contributor duplicates into its own rn-bucket of
    * [[EwmaW]] rows and the next, targets join on (event_type, bucket) —
    * so the heavy stage shuffles on a key whose cardinality GROWS with the
    * data (event_type × rn/20) instead of windowing over 5 whale
    * partitions: ≤ 2 copies per row in, ≤ 40 candidates per target, any
    * number of reducers. (DuckDB's oracle keeps the naive self-join — at
    * oracle scale the shapes agree row-for-row.)
    */
  private def r14(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables.events(s, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
        round(col("value").cast("double") * 100).cast("long").as("vq"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))))
      .select(col("event_type"), col("rn"), col("vq"))
    val contrib = v
      .withColumn("bkt", explode(array(expr(s"(rn - 1) DIV $EwmaW"),
        expr(s"(rn - 1) DIV $EwmaW + 1"))))
      .select(col("event_type"), col("bkt"), col("rn").as("crn"),
        col("vq").as("cvq"))
    val tgt = v.select(col("event_type"), col("rn"),
      expr(s"(rn - 1) DIV $EwmaW").as("bkt"))
    val wcol = expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${EwmaW - 1} - (rn - crn) AS INT))")
    val agg = tgt.join(contrib, Seq("event_type", "bkt"))
      .where(col("rn") >= col("crn") && col("rn") - col("crn") < EwmaW)
      .select(col("event_type"), col("rn"),
        (col("cvq") * wcol).as("wv"), wcol.as("w"))
      .groupBy(col("event_type"), col("rn"))
      .agg(count(lit(1)).as("n_win"), sum(col("wv")).as("ws"),
        sum(col("w")).as("wsum"))
    agg.where(col("rn") % EwmaSampleMod === 0)
      .select(col("event_type"), col("rn").cast("long").as("rn"),
        col("n_win"),
        (col("ws").cast("double") / (col("wsum") * 100).cast("double"))
          .as("ewma"))
      .orderBy(col("event_type"), col("rn"))
  }

  private val r14Sql =
    s"""WITH v AS (SELECT event_type,
       |  CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS vq,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
       | FROM events),
       |p AS (SELECT n.event_type, n.rn, COUNT(*) AS n_win,
       |  SUM(c.vq * (CAST(1 AS BIGINT) << CAST(${EwmaW - 1} - (n.rn - c.rn) AS INT))) AS ws,
       |  SUM(CAST(1 AS BIGINT) << CAST(${EwmaW - 1} - (n.rn - c.rn) AS INT)) AS wsum
       | FROM v n JOIN v c ON n.event_type = c.event_type
       |   AND n.rn - c.rn BETWEEN 0 AND ${EwmaW - 1}
       | GROUP BY 1, 2)
       |SELECT event_type, CAST(rn AS BIGINT) AS rn,
       |  CAST(n_win AS BIGINT) AS n_win,
       |  CAST(CAST(ws AS BIGINT) AS DOUBLE)
       |    / CAST(CAST(wsum AS BIGINT) * 100 AS DOUBLE) AS ewma
       |FROM p WHERE rn % $EwmaSampleMod = 0 ORDER BY event_type, rn""".stripMargin

  /** r15 — running z-score anomaly screen: every event scored against the
    * exact mean/stddev of the STRICTLY PRECEDING events of its type
    * (cumulative integer power sums, one window pass), anomalies = |z| ≥ 3
    * after a 30-event burn-in. This is the batch form of
    * `streaming/StreamingStats.score` — the ONLINE detector with O(1)
    * state per key — and the two are row-for-row identical by
    * construction (StreamingStatsSpec pins the agreement; this oracle pins
    * the arithmetic end to end).
    *
    * Scale shape: one keyed cumulative window (running sums are inherently
    * sequential per type — the streaming form is how this runs at 100 TB,
    * with (type, epoch) sharding and associative sum merges), then a
    * per-row z expression and filter. No join, no second pass.
    */
  private def r15(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    graft.streaming.StreamingStats
      .batchZScores(ev, col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .where(col("anomalous"))
      .select(col("event_id"), col("event_type"), col("vq"),
        col("n_before"), col("zscore"))
      .orderBy(col("event_type"), col("event_id"))
  }

  private val r15Sql =
    """WITH v AS (SELECT event_id, ts, event_type,
      |  CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS vq FROM events),
      |c AS (SELECT event_id, event_type, vq,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_before,
      |  COALESCE(CAST(SUM(vq) OVER w AS BIGINT), 0) AS s1,
      |  COALESCE(CAST(SUM(vq * vq) OVER w AS BIGINT), 0) AS s2
      | FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT event_id, event_type, vq, n_before,
      |  CASE WHEN n_before >= 30
      |    AND (CAST(s2 AS DOUBLE) / CAST(n_before AS DOUBLE)
      |      - (CAST(s1 AS DOUBLE) / CAST(n_before AS DOUBLE))
      |        * (CAST(s1 AS DOUBLE) / CAST(n_before AS DOUBLE))) > 0
      |  THEN (CAST(vq AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n_before AS DOUBLE))
      |    / sqrt(CAST(s2 AS DOUBLE) / CAST(n_before AS DOUBLE)
      |      - (CAST(s1 AS DOUBLE) / CAST(n_before AS DOUBLE))
      |        * (CAST(s1 AS DOUBLE) / CAST(n_before AS DOUBLE)))
      |  ELSE 0.0 END AS zscore
      | FROM c)
      |SELECT event_id, event_type, vq, n_before, zscore FROM z
      |WHERE n_before >= 30 AND abs(zscore) >= 3.0
      |ORDER BY event_type, event_id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("r01_rollup", r01, Some(r01Sql)),
    QueryDef("r02_date_string_pack", r02, Some(r02Sql)),
    QueryDef("r03_exact_stats", r03, Some(r03Sql)),
    QueryDef("r04_set_ops", r04, Some(r04Sql)),
    QueryDef("r05_percentiles", r05, Some(r05Sql)),
    QueryDef("r06_window_pack", r06, Some(r06Sql)),
    QueryDef("r07_cube_datacard", r07, Some(r07Sql)),
    QueryDef("r08_pivot_crosstab", r08, Some(r08Sql)),
    QueryDef("r09_grouping_sets", r09, Some(r09Sql)),
    QueryDef("r10_moment_stats", r10, Some(r10Sql)),
    QueryDef("r11_correlation_matrix", r11, Some(r11Sql)),
    QueryDef("r12_benford_digits", r12, Some(r12Sql)),
    QueryDef("r13_kmv_cardinality", r13, Some(r13Sql)),
    QueryDef("r14_ewma", r14, Some(r14Sql)),
    QueryDef("r15_zscore", r15, Some(r15Sql)),
    QueryDef("r16_chisq_drift", r16, Some(r16Sql)),
    QueryDef("r17_ks_drift", r17, Some(r17Sql)),
    QueryDef("r18_heavy_hitters", r18, Some(r18Sql)),
    QueryDef("r19_countmin", r19, Some(r19Sql)),
    QueryDef("r20_autocorr", r20, Some(r20Sql)),
    QueryDef("r21_equidepth_hist", r21, Some(r21Sql)),
    QueryDef("r22_spearman_drift", r22, Some(r22Sql)),
    QueryDef("r23_gini_concentration", r23, Some(r23Sql)),
    QueryDef("r24_mad_spread", r24, Some(r24Sql)),
    QueryDef("r25_dq_audit", r25, Some(r25Sql)),
    QueryDef("r26_basket_lift", r26, Some(r26Sql)),
    QueryDef("r27_window_funnel", r27, Some(r27Sql)),
    QueryDef("r28_retention", r28, Some(r28Sql)),
    QueryDef("r29_strict_funnel", r29, Some(r29Sql)),
    QueryDef("r30_sequence_count", r30, Some(r30Sql)),
    QueryDef("r31_dedup_funnel", r31, Some(r31Sql)),
    QueryDef("r32_sequence_match", r32, Some(r32Sql)),
    QueryDef("r33_strict_increase_funnel", r33, Some(r33Sql)),
    QueryDef("r34_hist_quantiles", r34, Some(r34Sql)),
    QueryDef("r35_sequence_next_node", r35, Some(r35Sql)),
    QueryDef("r36_sequence_prev_node", r36, Some(r36Sql)),
    QueryDef("r37_strict_order_ch", r37, Some(r37Sql)),
    QueryDef("r38_strict_dedup_ch", r38, Some(r38Sql)))

  /** r27 — windowed funnel (the ClickHouse `windowFunnel` analytics shape
    * the reference's sink engine is famous for), DEFAULT mode: per user,
    * the furthest step reached in the view → click → purchase sequence
    * where the whole chain completes within 24 h of its anchoring view,
    * reported as users per furthest-level. EXISTS semantics — any view
    * may anchor the chain, not just the earliest — via per-user
    * running-maximum window frames over the family's shared (ts,
    * event_id) total order (the oracle SQL keeps the equivalent step-join
    * form as the readable spec). Same-microsecond events chain in
    * event_id order, exactly as r29/r31 sequence them — the one corpus
    * class where the default mode and r33's `strict_increase` diverge
    * (FunnelModesSpec pins the tie corpus on both). (j05 is the
    * single-hop complement — a click→purchase conversion RATE per day;
    * this is the multi-step chained form with the anchored window, the
    * windowFunnel signature.)
    *
    * Scale shape — NO pair table, ever (round-11 verdict: the former
    * view×click chain join materialized V·C rows per user inside the
    * window, quadratic for a bot user): the EXISTS semantics collapse to
    * two per-user running maxima over the sequence order —
    *   lv(row)  = latest view strictly before this row in the sequence
    *   ba(row)  = max over clicks strictly before this row of lv(click)
    * A click reaches level 2 iff lv ≥ t₂ − w (some view anchors it inside
    * the window); a purchase reaches level 3 iff ba ≥ t₃ − w: the click
    * at t₂ whose freshest anchor t₁ = ba satisfies t₁ ≥ t₃ − w gives the
    * chain t₁ ≤ t₂ ≤ t₃ ≤ t₁ + w in sequence order (t₂ ≤ t₁ + w follows
    * from t₂ ≤ t₃), and maximizing t₁ is lossless for EXISTS — if the
    * freshest anchor misses the window no anchor makes it. Both maxima
    * are ROWS frames ending one row back over the (tsu, event_id) sort,
    * so "strictly before" means strictly before IN THE SEQUENCE — ties
    * chain, in the deterministic order both engines share.
    * One shuffle on user_id (the standard funnel co-partitioning), a
    * per-user sort shared by both window passes and the per-user max —
    * per-user cost O(E·log E) and O(1) state, a bot user is just a big
    * sorted run. Levels nest by construction (a qualifying purchase's
    * click qualifies, a qualifying click's view exists), so furthest level
    * = the per-user max of the per-row level.
    * Since round 14 this is an INSTANCE of the sequence-pattern engine:
    * [[graft.operators.SequenceMatch.funnelLevels]] is the K-step
    * compiled form of exactly this running-anchor-maximum construction.
    */
  private def r27(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    graft.operators.SequenceMatch.funnelLevels(ev, "user_id", "tsu",
        "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowSeconds = 24L * 3600,
        mode = graft.operators.SequenceMatch.Default)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  private val r27Sql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (SELECT user_id, ts AS t1, event_id AS i1 FROM events WHERE event_type = 'view'),
      |c AS (SELECT user_id, ts AS t2, event_id AS i2 FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS t3, event_id AS i3 FROM events WHERE event_type = 'purchase'),
      |l1 AS (SELECT DISTINCT user_id FROM v),
      |vc AS (SELECT v.user_id, v.t1, c.t2, c.i2 FROM v JOIN c ON c.user_id = v.user_id
      |  AND (c.t2 > v.t1 OR (c.t2 = v.t1 AND c.i2 > v.i1))
      |  AND c.t2 <= v.t1 + INTERVAL 24 HOUR),
      |l2 AS (SELECT DISTINCT user_id FROM vc),
      |l3 AS (SELECT DISTINCT vc.user_id FROM vc JOIN p ON p.user_id = vc.user_id
      |  AND (p.t3 > vc.t2 OR (p.t3 = vc.t2 AND p.i3 > vc.i2))
      |  AND p.t3 <= vc.t1 + INTERVAL 24 HOUR)
      |SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
      |  SELECT CAST(
      |      CASE WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN l2.user_id IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN l3.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS level
      |  FROM u
      |  LEFT JOIN l1 ON l1.user_id = u.user_id
      |  LEFT JOIN l2 ON l2.user_id = u.user_id
      |  LEFT JOIN l3 ON l3.user_id = u.user_id)
      |GROUP BY level ORDER BY level""".stripMargin

  /** r33 — strict_increase windowed funnel (the fourth and last of
    * ClickHouse's `windowFunnel` modes, completing the family next to
    * r27 default / r29 strict_order / r31 strict_dedup): identical to
    * the default mode except that chained steps must have STRICTLY
    * INCREASING timestamps — a same-microsecond view → click pair chains
    * under r27 (the family's (ts, event_id) order sequences them) but
    * not here. On tie-free corpora the two modes agree exactly;
    * FunnelModesSpec pins both the agreement and the tie divergence.
    *
    * Scale shape: r27's two running maxima with RANGE frames ending at
    * −1 µs over the event-time order instead of ROWS frames over the
    * sequence order — the strict `<` of the chain comparisons lives in
    * the frame bound, everything else (one user_id shuffle, one per-user
    * sort, O(1) state) is shared with the default mode. Like r27, an
    * instance of [[graft.operators.SequenceMatch.funnelLevels]] — the
    * mode IS the `strictIncrease` knob.
    */
  private def r33(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    graft.operators.SequenceMatch.funnelLevels(ev, "user_id", "tsu",
        "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowSeconds = 24L * 3600,
        mode = graft.operators.SequenceMatch.StrictIncrease)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  private val r33Sql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (SELECT user_id, ts AS t1 FROM events WHERE event_type = 'view'),
      |c AS (SELECT user_id, ts AS t2 FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS t3 FROM events WHERE event_type = 'purchase'),
      |l1 AS (SELECT DISTINCT user_id FROM v),
      |vc AS (SELECT v.user_id, v.t1, c.t2 FROM v JOIN c ON c.user_id = v.user_id
      |  AND c.t2 > v.t1 AND c.t2 <= v.t1 + INTERVAL 24 HOUR),
      |l2 AS (SELECT DISTINCT user_id FROM vc),
      |l3 AS (SELECT DISTINCT vc.user_id FROM vc JOIN p ON p.user_id = vc.user_id
      |  AND p.t3 > vc.t2 AND p.t3 <= vc.t1 + INTERVAL 24 HOUR)
      |SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
      |  SELECT CAST(
      |      CASE WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN l2.user_id IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN l3.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS level
      |  FROM u
      |  LEFT JOIN l1 ON l1.user_id = u.user_id
      |  LEFT JOIN l2 ON l2.user_id = u.user_id
      |  LEFT JOIN l3 ON l3.user_id = u.user_id)
      |GROUP BY level ORDER BY level""".stripMargin

  /** r28 — conditioned weekly retention (the ClickHouse
    * `retention(cond1, cond2, …)` shape proper): users cohorted by the
    * week of their first SIGNUP event; for each week offset 0–3, how many
    * of the cohort PURCHASED that week, and the retention ratio — the
    * behavioral form (did the qualifying action recur?) that
    * condition-based retention reports. j06 is the engagement complement:
    * any-activity retention of first-activity cohorts, matrix counts
    * without ratios.
    * Weeks are Monday-aligned `date_trunc` in both engines, so offsets
    * are exact multiples of 604800 s in the UTC session and the integer
    * division is exact.
    *
    * Scale shape: two user-keyed aggregations (first signup, distinct
    * purchase weeks) joined on user_id, then a groupBy on the tiny
    * (cohort, offset) key; the cohort-size side is |weeks| rows and
    * broadcasts into the final ratio join.
    */
  private def r28(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val first = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).as("cohort_ts"))
    val activity = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val active = first.join(activity, "user_id")
      .select(col("cohort_ts"),
        ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort_ts")))
          / 604800L).cast("long").as("offset"),
        col("user_id"))
      .filter(col("offset").between(0, 3))
      .groupBy(col("cohort_ts"), col("offset"))
      .agg(count(lit(1)).as("n_active")) // (user, wk) distinct upstream
    val sizes = first.groupBy(col("cohort_ts"))
      .agg(count(lit(1)).as("cohort_users"))
    active.join(broadcast(sizes), "cohort_ts")
      .select(date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort"),
        col("offset"), col("cohort_users"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_users")).as("retention"))
      .orderBy(col("cohort"), col("offset"))
  }

  private val r28Sql =
    """WITH first AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |activity AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |  FROM events WHERE event_type = 'purchase'),
      |act AS (SELECT f.cohort_ts,
      |    CAST((epoch(CAST(a.wk AS TIMESTAMP))
      |      - epoch(CAST(f.cohort_ts AS TIMESTAMP))) / 604800 AS BIGINT)
      |      AS "offset",
      |    a.user_id
      |  FROM first f JOIN activity a ON a.user_id = f.user_id),
      |active AS (SELECT cohort_ts, "offset", CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM act WHERE "offset" BETWEEN 0 AND 3 GROUP BY cohort_ts, "offset"),
      |sizes AS (SELECT cohort_ts, CAST(COUNT(*) AS BIGINT) AS cohort_users
      |  FROM first GROUP BY cohort_ts)
      |SELECT strftime(active.cohort_ts, '%Y-%m-%d') AS cohort,
      |  "offset", cohort_users, n_active,
      |  CAST(n_active AS DOUBLE) / cohort_users AS retention
      |FROM active JOIN sizes ON sizes.cohort_ts = active.cohort_ts
      |ORDER BY cohort, "offset"""".stripMargin

  /** r29 — STRICT-ORDER windowed funnel (ClickHouse `windowFunnel(w)(…)`
    * with the `strict_order` mode, the second of the sink engine's funnel
    * semantics): the view → click → purchase chain counts only when the
    * three events are CONSECUTIVE in the user's full event sequence — any
    * intervening event of any type breaks the chain ("A→B→D→C stops
    * finding A→B→C at D") — and the whole chain completes within 24 h of
    * its anchoring view. r27 is the EXISTS complement (any view may
    * anchor, interventions don't matter); the strict mode is what
    * product analytics uses to measure UNINTERRUPTED flows (did the user
    * go view→click→purchase directly, or wander?). Reported as users per
    * furthest strict level, like r27.
    *
    * Semantics: per user, events are sequenced by (ts, event_id) — the
    * deterministic total order both engines share; a purchase reaches
    * strict level 3 iff its two immediate predecessors are click then
    * view with t₃ ≤ t₁ + w; a click reaches 2 iff its immediate
    * predecessor is a view with t₂ ≤ t₁ + w. Levels nest (the sequence
    * order makes t₂ ≤ t₃ ≤ t₁ + w), so furthest = per-user max.
    *
    * Scale shape: ONE window pass — the consecutiveness makes the chain
    * ending at each row unique, so the engine's running maxima
    * degenerate to lag(1) anchor carries over the per-user
    * (ts, event_id) sort, then the per-user max and a 4-row census. No
    * joins, no pair table; a bot user costs one sorted run (the same
    * skew-proof shape r27/j05 moved to this round, stressed by the
    * funnel-skew arm). Since round 15 an INSTANCE of the
    * sequence-pattern engine:
    * [[graft.operators.SequenceMatch.funnelLevels]] with the
    * [[graft.operators.SequenceMatch.StrictOrder]] mode — the former
    * bespoke lag-pair construction, generalized to K steps there.
    */
  private def r29(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    graft.operators.SequenceMatch.funnelLevels(ev, "user_id", "tsu",
        "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowSeconds = 24L * 3600,
        mode = graft.operators.SequenceMatch.StrictOrder)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  private val r29Sql =
    """WITH w AS (SELECT user_id, event_type, ts,
      |  LAG(event_type, 1) OVER u AS p1t, LAG(ts, 1) OVER u AS p1ts,
      |  LAG(event_type, 2) OVER u AS p2t, LAG(ts, 2) OVER u AS p2ts
      | FROM events WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |l AS (SELECT user_id, MAX(CASE
      |    WHEN event_type = 'purchase' AND p1t = 'click' AND p2t = 'view'
      |         AND ts <= p2ts + INTERVAL 24 HOUR THEN 3
      |    WHEN event_type = 'click' AND p1t = 'view'
      |         AND ts <= p1ts + INTERVAL 24 HOUR THEN 2
      |    WHEN event_type = 'view' THEN 1 ELSE 0 END) AS level
      |  FROM w GROUP BY user_id)
      |SELECT CAST(level AS BIGINT) AS level,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM l GROUP BY level ORDER BY level""".stripMargin

  /** r30 — greedy non-overlapping sequence counting (ClickHouse
    * `sequenceCount('(?1).*(?2)')(ts, view, click)` — the third of the
    * sink engine's sequence analytics after r27's EXISTS windowFunnel and
    * r29's strict_order mode): per user, HOW MANY separate view → click
    * journeys happened, scanning left to right and never reusing an
    * event — the repeat-engagement count that a funnel level (did it
    * happen at all) cannot express. Reported as users per match count;
    * users with view/click activity but no completed journey land in the
    * matches = 0 row, users with NEITHER event type never enter the scan
    * (the pushed filter is the point — they carry no signal).
    *
    * Semantics: over the user's view/click subsequence in (ts, event_id)
    * order, the greedy non-overlapping match count equals the number of
    * clicks whose immediate predecessor IN THE SUBSEQUENCE is a view —
    * each view-run → click-run boundary completes exactly one match and
    * greedy matching resets there (the run-collapse argument in the
    * scaladoc of [[graft.streaming.StreamingSeqCount]], whose live form
    * this is the batch twin of).
    *
    * Scale shape: the type filter pushes into the scan (only view/click
    * rows leave it), then ONE window pass — a single lag() — and a
    * two-level aggregation onto the tiny match-count key. No joins; a
    * bot user costs one sorted run (the funnel-skew-arm shape).
    * Since round 14 this is an INSTANCE of the sequence-pattern engine:
    * [[graft.operators.SequenceMatch.countGreedy2]] is the compiled form
    * of the run-boundary reduction, shared with r32's pattern family.
    */
  private def r30(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"))
    graft.operators.SequenceMatch.countGreedy2(ev, "user_id", "tsu",
        "event_id", col("event_type") === "view",
        col("event_type") === "click")
      .groupBy(col("matches"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("matches"))
  }

  private val r30Sql =
    """WITH f AS (SELECT user_id, ts, event_id, event_type FROM events
      |  WHERE event_type IN ('view', 'click')),
      |w AS (SELECT user_id, event_type,
      |  LAG(event_type, 1) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS prev FROM f),
      |m AS (SELECT user_id, CAST(SUM(CASE WHEN event_type = 'click'
      |    AND prev = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS matches
      |  FROM w GROUP BY user_id)
      |SELECT matches, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM m GROUP BY matches ORDER BY matches""".stripMargin

  /** r32 — the sequenceMatch pattern family (ClickHouse
    * `sequenceMatch('(?1)…(?K)')(ts, cond1, …)` with arbitrary condition
    * chains, `.*`/adjacency gaps and per-gap time bounds — the general
    * engine the bespoke funnel/sequence queries r27/r29/r30/r31/r33 are
    * instances of): five distinct patterns over the event stream, each
    * reported as (users entering the scan, users matched, match rate).
    * The patterns exercise every gap kind the typed representation
    * supports: a 3-step `.*` chain, two upper time bounds (click within
    * 1 h of a view; purchase within 24 h of a signup), subsequence
    * adjacency, and a LOWER bound (purchase at least 1 h after a view —
    * the delayed-conversion shape no windowFunnel mode can ask).
    *
    * Semantics and the proof that one pass of running extrema is exact
    * live in [[graft.operators.SequenceMatch]]; the oracle pins each
    * pattern through an independent formulation (EXISTS step-joins with
    * the family's (ts, event_id) sequence order, and a lag() scan for
    * the adjacency pattern).
    *
    * Scale shape: per pattern, the condition filter pushes into the
    * scan, then stacked window passes over ONE user-keyed sort — no
    * joins, no pair table; the five per-pattern aggregates are 1-row
    * frames unioned at the end. A bot user costs one sorted run per
    * pattern (skew-arm stressed like the funnel family).
    */
  private def r32(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SequenceMatch
    import graft.operators.SequenceMatch._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    def et(t: String) = col("event_type") === t
    val pats: Seq[(String, Pattern)] = Seq(
      "p1_vcp_any" -> Pattern(
        Seq(et("view"), et("click"), et("purchase")), Seq(AnyGap, AnyGap)),
      "p2_vc_within_1h" -> Pattern(
        Seq(et("view"), et("click")), Seq(Within(3600L))),
      "p3_sp_within_24h" -> Pattern(
        Seq(et("signup"), et("purchase")), Seq(Within(86400L))),
      "p4_vc_adjacent" -> Pattern(
        Seq(et("view"), et("click")), Seq(Adjacent)),
      "p5_vp_after_1h" -> Pattern(
        Seq(et("view"), et("purchase")), Seq(AtLeast(3600L))))
    pats.map { case (nm, p) =>
      SequenceMatch.matchesPerUser(ev, "user_id", "tsu", "event_id", p)
        .agg(count(lit(1)).as("n_users"),
          coalesce(sum(when(col("matched"), 1L).otherwise(0L)), lit(0L))
            .as("n_matched"))
        .select(lit(nm).as("pattern"), col("n_users"), col("n_matched"),
          (col("n_matched").cast("double") / col("n_users"))
            .as("match_rate"))
    }.reduce(_ unionAll _).orderBy(col("pattern"))
  }

  private val r32Sql =
    """WITH p1u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events WHERE event_type IN ('view','click','purchase')),
      |p1m AS (SELECT CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_matched
      |  FROM events v
      |  JOIN events c ON c.user_id = v.user_id AND v.event_type = 'view'
      |    AND c.event_type = 'click'
      |    AND (c.ts > v.ts OR (c.ts = v.ts AND c.event_id > v.event_id))
      |  JOIN events p ON p.user_id = c.user_id AND p.event_type = 'purchase'
      |    AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))),
      |p2u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events WHERE event_type IN ('view','click')),
      |p2m AS (SELECT CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_matched
      |  FROM events v JOIN events c ON c.user_id = v.user_id
      |    AND v.event_type = 'view' AND c.event_type = 'click'
      |    AND (c.ts > v.ts OR (c.ts = v.ts AND c.event_id > v.event_id))
      |    AND c.ts <= v.ts + INTERVAL 3600 SECOND),
      |p3u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events WHERE event_type IN ('signup','purchase')),
      |p3m AS (SELECT CAST(COUNT(DISTINCT sg.user_id) AS BIGINT) AS n_matched
      |  FROM events sg JOIN events p ON p.user_id = sg.user_id
      |    AND sg.event_type = 'signup' AND p.event_type = 'purchase'
      |    AND (p.ts > sg.ts OR (p.ts = sg.ts AND p.event_id > sg.event_id))
      |    AND p.ts <= sg.ts + INTERVAL 86400 SECOND),
      |p4s AS (SELECT user_id, event_type, LAG(event_type) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events WHERE event_type IN ('view','click')),
      |p4m AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_matched
      |  FROM p4s WHERE event_type = 'click' AND prev = 'view'),
      |p5m AS (SELECT CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_matched
      |  FROM events v JOIN events p ON p.user_id = v.user_id
      |    AND v.event_type = 'view' AND p.event_type = 'purchase'
      |    AND p.ts >= v.ts + INTERVAL 3600 SECOND),
      |p5u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events WHERE event_type IN ('view','purchase'))
      |SELECT pattern, n_users, n_matched,
      |  CAST(n_matched AS DOUBLE) / n_users AS match_rate FROM (
      |  SELECT 'p1_vcp_any' AS pattern, n_users, n_matched FROM p1u, p1m
      |  UNION ALL
      |  SELECT 'p2_vc_within_1h', n_users, n_matched FROM p2u, p2m
      |  UNION ALL
      |  SELECT 'p3_sp_within_24h', n_users, n_matched FROM p3u, p3m
      |  UNION ALL
      |  SELECT 'p4_vc_adjacent', p2u.n_users, n_matched FROM p2u, p4m
      |  UNION ALL
      |  SELECT 'p5_vp_after_1h', n_users, n_matched FROM p5u, p5m)
      |ORDER BY pattern""".stripMargin

  /** r31 — dedup-strict windowed funnel (ClickHouse
    * `windowFunnel(strict_dedup)` — the sink engine's funnel mode
    * family: r27 is the default EXISTS mode, r29 `strict_order`, r33
    * `strict_increase` — which differs from the default only on
    * same-microsecond ties, where its strictly-greater timestamp
    * comparisons refuse to chain):
    * a REPEATED event of a condition the chain already holds interrupts
    * it — "view, click, click, purchase" stops at level 2 (the second
    * click re-matches the held condition 2), while unrelated event types
    * pass freely (unlike strict_order, where ANY intervening event
    * breaks the chain). r31 therefore sits strictly between r27 and r29:
    * V,C,C,P is 3 / 2 / 2 and V,signup,C is 2 / 2 / 1 under
    * r27 / r31 / r29 respectively. Reported as users per furthest level,
    * every user censused, like r29.
    *
    * Semantics (EXISTS over anchors, the family's reading): for each
    * anchor view a, the chain's click is THE FIRST click after a — valid
    * iff it lands within the 24 h window and before the next view after
    * a (a second view re-matches held condition 1); the chain's purchase
    * is the first purchase after that click — valid iff within the
    * anchor's window and before both the next view and the next click
    * after the chain click. A user's level is the max over their
    * anchors. All sequencing is the family's (ts, event_id) total order.
    *
    * Scale shape: join-free — ONE user-keyed sort feeds the stacked
    * window passes (per-row sequence position; per-step next-event
    * positions; the greedy next-step rows fetched by nested struct
    * minima), then the per-user max and a 4-row census. A bot user
    * costs one sorted run; the oracle uses equi-joins on the computed
    * positions instead of struct window mins, pinning the identical
    * semantics through an independent formulation. Since round 15 an
    * INSTANCE of the sequence-pattern engine:
    * [[graft.operators.SequenceMatch.funnelLevels]] with the
    * [[graft.operators.SequenceMatch.StrictDedup]] mode — the former
    * bespoke 3-step struct-min construction, generalized to K steps
    * there.
    */
  private def r31(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    graft.operators.SequenceMatch.funnelLevels(ev, "user_id", "tsu",
        "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowSeconds = 24L * 3600,
        mode = graft.operators.SequenceMatch.StrictDedup)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  private val r31Sql =
    """WITH e AS (SELECT user_id, event_type, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS pos FROM events),
      |n AS (SELECT *,
      |    MIN(CASE WHEN event_type = 'view' THEN pos END) OVER f AS nv,
      |    MIN(CASE WHEN event_type = 'click' THEN pos END) OVER f AS ncpos,
      |    MIN(CASE WHEN event_type = 'purchase' THEN pos END) OVER f AS nppos
      |  FROM e WINDOW f AS (PARTITION BY user_id ORDER BY pos
      |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      |a AS (SELECT v.user_id, v.ts AS t1, v.nv AS vnv, v.ncpos AS vnc,
      |    c.ts AS t2, c.nv AS cnv, c.ncpos AS cnc, c.nppos AS cnp, p.ts AS t3
      |  FROM n v
      |  LEFT JOIN n c ON c.user_id = v.user_id AND c.pos = v.ncpos
      |  LEFT JOIN n p ON p.user_id = c.user_id AND p.pos = c.nppos
      |  WHERE v.event_type = 'view'),
      |lv AS (SELECT user_id, MAX(CASE
      |    WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL 24 HOUR
      |     AND vnc < COALESCE(vnv, 9223372036854775807)
      |     AND t3 IS NOT NULL AND t3 <= t1 + INTERVAL 24 HOUR
      |     AND cnp < LEAST(COALESCE(cnv, 9223372036854775807),
      |                     COALESCE(cnc, 9223372036854775807)) THEN 3
      |    WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL 24 HOUR
      |     AND vnc < COALESCE(vnv, 9223372036854775807) THEN 2
      |    ELSE 1 END) AS level
      |  FROM a GROUP BY user_id),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT CAST(COALESCE(lv.level, 0) AS BIGINT) AS level,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM u LEFT JOIN lv ON lv.user_id = u.user_id
      |GROUP BY 1 ORDER BY level""".stripMargin

  /** r26 — market-basket association lift: the top co-purchased part
    * pairs ranked by lift = P(a,b)/(P(a)·P(b)) over order baskets, with a
    * minimum co-occurrence support of 2. Lift > 1: the pair co-occurs
    * more than independence predicts (bundle/recommend); the classic
    * association-rule screen computed exactly — the ratio is one float
    * division of two exact integer products.
    *
    * Scale shape: the pair generator is a SELF EQUI-JOIN ON THE ORDER KEY
    * (pairs per order = basket²/2, bounded by basket size — never a
    * part×part cartesian); per-part supports are map-side-combined counts;
    * the 1-row order total broadcasts; top-20 is TakeOrderedAndProject.
    *
    * Skew note (round-18 verdict): the grouped-basket form concentrates
    * one order's basket²/2 pair GENERATION in the task holding that order
    * (the old self-join spread the same quadratic output across the join).
    * Orders are contract-bounded baskets in this schema (every shipped SF
    * and the ×N stress corpora); a pathologically wide order now fails
    * loudly in [[graft.functions.SortedPairs]] (pair count must fit one
    * array) instead of silently owning a straggler task — the fix at that
    * point is a basket-width guard/split, not a silent slow task.
    */
  private def r26(s: SparkSession, dir: String): DataFrame = {
    // ONE basket shuffle replaces the round-17 shape's three lineitem-sized
    // exchanges (distinct + both self-join sides): group to sorted distinct
    // per-order baskets once, then generate each basket's ordered pairs
    // in-place with the d26 transform/slice kernel (pairs per order still
    // basket²/2 — the same multiset the o-keyed self-join produced, with
    // a.p < b.p guaranteed by the sorted array). Supports and the order
    // total both derive from the materialized basket table, so lineitem is
    // scanned exactly once — at 100 TB that one scan is the cost floor.
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
      .localCheckpoint()
    // the order total is ONE exact long off the already-materialized basket
    // table — a driver-side count replaces the 1-row agg subtree + its
    // broadcast stage in the final job (round 18; same bounded-collect
    // discipline as j20's brackets)
    val nOrders = baskets.count()
    // per-part supports materialized once (round 19): pc is joined on BOTH
    // pair endpoints, and the lazy form re-executed the basket explode +
    // count per reference (the before-plan carried the subtree twice); the
    // checkpoint is |parts| rows — corpus-vocabulary-sized, far below the
    // pair table
    val pc = baskets.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n_p"))
      .localCheckpoint()
    // pair generation via the SortedPairs kernel (round 19): one exact-size
    // array per basket instead of the flatten/transform/slice chain's ~4×
    // object churn — same pair multiset (a.p < b.p off the sorted set)
    baskets.select(explode(graft.functions.SortedPairs(col("ps"))).as("pr"))
      .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
      .join(pc.withColumnRenamed("p", "pa").withColumnRenamed("n_p", "na"),
        Seq("pa"))
      .join(pc.withColumnRenamed("p", "pb").withColumnRenamed("n_p", "nb"),
        Seq("pb"))
      .select(col("pa"), col("pb"), col("n_ab"), col("na"), col("nb"),
        ((col("n_ab") * lit(nOrders)).cast("double") /
          (col("na") * col("nb")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb"))
      .limit(20)
  }

  private val r26Sql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |  FROM lineitem),
      |tot AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM li),
      |pc AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM li GROUP BY p),
      |pairs AS (SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2)
      |SELECT pairs.pa, pairs.pb, pairs.n_ab,
      |  ca.n_p AS na, cb.n_p AS nb,
      |  CAST(pairs.n_ab * tot.n_orders AS DOUBLE)
      |    / CAST(ca.n_p * cb.n_p AS DOUBLE) AS lift
      |FROM pairs JOIN pc ca ON ca.p = pairs.pa
      |JOIN pc cb ON cb.p = pairs.pb, tot
      |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin

  /** r25 — referential-integrity / data-quality audit: the dbt-test shape
    * as one long-format report — primary-key uniqueness per table,
    * foreign-key orphan counts along the lineitem→orders→customer→nation
    * chain, and null-key counts. On healthy synthetic data every n_bad is
    * 0 — which is the content: the audit PASSING is the gate a 100 TB
    * ingest promotes a snapshot on, and any nonzero row names exactly
    * which contract broke.
    *
    * Scale shape: each PK check is one map-side-combined count-distinct
    * agg; each FK check is ONE keyed left join counting null probes (the
    * dim sides broadcast; the lineitem→orders join is the only
    * fact-to-fact shuffle and carries just the two key columns); the
    * report is a union of 1-row frames.
    */
  private def r25(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    def pk(dfName: String, df: DataFrame, cols: Seq[String]): DataFrame =
      df.agg((count(lit(1)) - countDistinct(col(cols.head),
          cols.tail.map(col): _*)).as("n_bad"),
        count(lit(1)).as("n_total"))
        .select(lit(dfName + "_pk_dup").as("check_name"), col("n_bad"),
          col("n_total"))
    def fk(name: String, fact: DataFrame, factKey: String,
           dim: DataFrame, dimKey: String, bcast: Boolean): DataFrame = {
      val d = dim.select(col(dimKey)).distinct()
      fact.select(col(factKey))
        .join(if (bcast) broadcast(d) else d,
          col(factKey) === col(dimKey), "left")
        .agg(sum(when(col(dimKey).isNull, 1L).otherwise(0L)).as("n_bad"),
          count(lit(1)).as("n_total"))
        .select(lit(name).as("check_name"), col("n_bad"), col("n_total"))
    }
    val nulls = o.agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_bad"),
      count(lit(1)).as("n_total"))
      .select(lit("orders_null_custkey").as("check_name"), col("n_bad"),
        col("n_total"))
    Seq(
      pk("lineitem", li, Seq("l_orderkey", "l_linenumber")),
      pk("orders", o, Seq("o_orderkey")),
      pk("customer", c, Seq("c_custkey")),
      fk("lineitem_fk_orphan", li, "l_orderkey", o, "o_orderkey",
        bcast = false),
      fk("orders_fk_orphan", o, "o_custkey", c, "c_custkey", bcast = true),
      fk("customer_fk_orphan", c, "c_nationkey", n, "n_nationkey",
        bcast = true),
      nulls)
      .reduce(_ unionAll _)
      .withColumn("bad_rate",
        col("n_bad").cast("double") / col("n_total").cast("double"))
      .orderBy(col("check_name"))
  }

  private val r25Sql =
    """WITH u AS (
      |  SELECT 'lineitem_pk_dup' AS check_name,
      |    CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_bad,
      |    CAST(COUNT(*) AS BIGINT) AS n_total FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_pk_dup',
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'customer_pk_dup',
      |    CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT 'lineitem_fk_orphan',
      |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      |    ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'orders_fk_orphan',
      |    CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM orders o2 LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON o2.o_custkey = c.c_custkey
      |  UNION ALL
      |  SELECT 'customer_fk_orphan',
      |    CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM customer c2 LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
      |    ON c2.c_nationkey = n.n_nationkey
      |  UNION ALL
      |  SELECT 'orders_null_custkey',
      |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT) FROM orders)
      |SELECT check_name, n_bad, n_total,
      |  CAST(n_bad AS DOUBLE) / CAST(n_total AS DOUBLE) AS bad_rate
      |FROM u ORDER BY check_name""".stripMargin

  /** r24 — median absolute deviation per event type: the robust spread
    * statistic (r05 gives robust location; stddev-based spread is ruined
    * by the same outliers MAD ignores — the pair is the screen that
    * separates "value drifted" from "a few rows exploded"). Exact rank
    * selection twice: the per-type median of the 1e6-quantized values,
    * then the median of |x − med| — both ceil(n/2)-th order statistics
    * under a total order, integer end to end until the final /1e6.
    *
    * Scale shape: two type-keyed rank windows (hash-partitioned by the
    * 5-value type key) and two keyed aggs; the deviation pass re-derives
    * from the first via a broadcast 5-row median frame — the corpus never
    * shuffles except by its window key. 5 output rows.
    */
  private def r24(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = Tables.events(s, dir).select(col("event_type"),
      round(col("value").cast("double") * 1000000).cast("long").as("vq"))
    def medianOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
      val n = Window.partitionBy(col("event_type"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(n))
        .groupBy(col("event_type"))
        .agg(max(when(col("rn") === ceil(col("n") * 0.5), col(valueCol)))
          .as(out))
    }
    val med = medianOf(q, "vq", "med_q")
    val dev = q.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), abs(col("vq") - col("med_q")).as("dq"))
    medianOf(dev, "dq", "mad_q")
      .join(broadcast(med), Seq("event_type"))
      .select(col("event_type"),
        (col("med_q").cast("double") / 1e6).as("median"),
        (col("mad_q").cast("double") / 1e6).as("mad"))
      .orderBy(col("event_type"))
  }

  private val r24Sql =
    """WITH q AS (SELECT event_type,
      |  CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vq
      | FROM events),
      |r1 AS (SELECT event_type, vq,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vq) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM q),
      |med AS (SELECT event_type,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN vq END) AS med_q
      | FROM r1 GROUP BY event_type),
      |d AS (SELECT q.event_type, abs(q.vq - med.med_q) AS dq
      |  FROM q JOIN med ON med.event_type = q.event_type),
      |r2 AS (SELECT event_type, dq,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dq) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM d),
      |mad AS (SELECT event_type,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN dq END) AS mad_q
      | FROM r2 GROUP BY event_type)
      |SELECT med.event_type,
      |  CAST(med.med_q AS DOUBLE) / 1e6 AS median,
      |  CAST(mad.mad_q AS DOUBLE) / 1e6 AS mad
      |FROM med JOIN mad ON mad.event_type = med.event_type
      |ORDER BY med.event_type""".stripMargin

  /** r23 — per-type Gini concentration of user activity: how unevenly is
    * each event type's volume spread across users? Gini from the exact
    * rank formula over ascending per-user counts,
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx), every term a BIGINT — the one
    * float division happens last. G ≈ 0: volume spread evenly; G → 1: a
    * few users own the type — which is simultaneously the bot-traffic
    * screen and the SHUFFLE-SKEW audit (x_i is exactly the per-key row
    * count a groupBy(user) would shuffle; a type with G near 1 is the one
    * that needs the salted path the skew arm measures).
    *
    * Scale shape: a (type, user)-keyed count, ONE type-keyed rank window
    * (hash-partitions by type), one type-keyed agg. 5 output rows.
    */
  private def r23(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("x"), col("user_id"))
    // Σ(i·x) in decimal with operands cast BEFORE the multiply (r11's
    // pattern — a per-term i·x in long would wrap before the sum ever saw
    // it; the r22 overflow class; the oracle's CAST(HUGEINT AS BIGINT)
    // would RAISE while Spark wrapped), and the Gini evaluated as an
    // identical double expression tree in both engines —
    // (n_users+1)·n_events overflows at the same scale
    val nud = col("n_users").cast("double")
    val ned = col("n_events").cast("double")
    cnt.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("n_events"),
        sum(col("i").cast("decimal(38,0)")
          * col("x").cast("decimal(38,0)")).as("s2x"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        ((lit(2.0) * col("s2x").cast("double") - (nud + lit(1.0)) * ned) /
          (nud * ned)).as("gini"))
      .orderBy(col("event_type"))
  }

  private val r23Sql =
    """WITH c AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY event_type, user_id),
      |r AS (SELECT event_type, x,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, user_id)
      |    AS BIGINT) AS i FROM c),
      |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(x) AS BIGINT) AS n_events,
      |  SUM(CAST(i AS HUGEINT) * x) AS s2h
      | FROM r GROUP BY event_type),
      |-- HUGEINT sum routes through VARCHAR (r11's rule); the Gini is the
      |-- same double expression tree as the Spark side
      |f AS (SELECT event_type, n_users, n_events,
      |  CAST(n_users AS DOUBLE) AS nud, CAST(n_events AS DOUBLE) AS ned,
      |  CAST(CAST(s2h AS VARCHAR) AS DOUBLE) AS s2d FROM a)
      |SELECT event_type, n_users, n_events,
      |  (2.0 * s2d - (nud + 1.0) * ned) / (nud * ned) AS gini
      |FROM f ORDER BY event_type""".stripMargin

  /** r22 — Spearman rank correlation between event VALUE and event TIME,
    * per type: the nonparametric monotone-trend drift detector (robust to
    * outliers and any monotone rescaling — the rank-based complement of
    * r11's Pearson and r17's KS). Ties take midranks; the midrank of a row
    * is (2·RANK + ties − 1)/2, so DOUBLED midranks are exact integers and
    * Σd² stays in integer arithmetic end to end:
    * ρ = 1 − 6·Σd²/(n(n²−1)) = 1 − 1.5·S4/(n(n²−1)) where
    * S4 = Σ(2rₐ−2r_b)² = 4·Σd². Reported without the tie-correction
    * factor (documented: midrank ρ, the common production form). S4's
    * worst case is 4n(n²−1)/3 — past int64 at ~1.9M rows per type — so it
    * accumulates in decimal(38,0) (HUGEINT in the oracle) and reaches the
    * output through the r10/r11 divergence-proof route (Spark
    * decimal→double == DuckDB VARCHAR→DOUBLE, both correctly rounded);
    * ρ's denominator n(n²−1) overflows at the same scale and is evaluated
    * as an identical double expression tree in both engines.
    *
    * Scale shape: two type-keyed rank windows (value order, time order —
    * both hash-partition by event_type) + tie counts via composite-keyed
    * windows, then one map-side-combined agg per type. 5 output rows.
    */
  private def r22(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(col("event_type"),
      round(col("value").cast("double") * 1000000).cast("long").as("vq"),
      unix_micros(col("ts")).as("us"))
    val byV = Window.partitionBy(col("event_type")).orderBy(col("vq"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("us"))
    val ranked = e
      .withColumn("ra2", lit(2) * rank().over(byV)
        + count(lit(1)).over(Window.partitionBy(col("event_type"), col("vq")))
        - 1)
      .withColumn("rb2", lit(2) * rank().over(byT)
        + count(lit(1)).over(Window.partitionBy(col("event_type"), col("us")))
        - 1)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val nd = col("n").cast("double")
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("ra2") - col("rb2")) * dec(col("ra2") - col("rb2")))
          .as("s4x"))
      .select(col("event_type"), col("n"),
        col("s4x").cast("double").as("s4"),
        (lit(1.0) - lit(1.5) * col("s4x").cast("double") /
          (nd * (nd * nd - lit(1.0)))).as("rho"))
      .orderBy(col("event_type"))
  }

  private val r22Sql =
    """WITH e AS (SELECT event_type,
      |  CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vq,
      |  epoch_us(ts) AS us FROM events),
      |r AS (SELECT event_type,
      |  2 * RANK() OVER (PARTITION BY event_type ORDER BY vq)
      |    + COUNT(*) OVER (PARTITION BY event_type, vq) - 1 AS ra2,
      |  2 * RANK() OVER (PARTITION BY event_type ORDER BY us)
      |    + COUNT(*) OVER (PARTITION BY event_type, us) - 1 AS rb2
      | FROM e),
      |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  SUM(CAST(ra2 - rb2 AS HUGEINT) * (ra2 - rb2)) AS s4h
      | FROM r GROUP BY event_type),
      |-- HUGEINT->VARCHAR->DOUBLE is correctly rounded and matches Spark's
      |-- decimal->double (see r10/r11); n(n^2-1) overflows int64 at the
      |-- same ~1.9M-rows-per-type scale as S4, so the denominator is the
      |-- same double expression tree as the Spark side
      |f AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
      |  CAST(CAST(s4h AS VARCHAR) AS DOUBLE) AS s4 FROM a)
      |SELECT event_type, n, s4,
      |  1.0 - 1.5 * s4 / (nd * (nd * nd - 1.0)) AS rho
      |FROM f ORDER BY event_type""".stripMargin

  /** r21 buckets per group (equi-depth). */
  private val HistB = 8

  /** r21 — per-group equi-depth histogram construction: the ANALYZE
    * TABLE / optimizer-statistics artifact — for every nation, split its
    * customers' account balances into [[HistB]] equal-population buckets
    * and report each bucket's population, value bounds, and NDV. Equi-depth
    * (not equi-width) is what engines actually keep: bounds adapt to the
    * distribution so selectivity estimates stay uniform per bucket.
    * Balances are quantized to exact integer cents; NTILE's tie order is
    * total (cents, custkey), so bucket assignment is bit-identical across
    * engines.
    *
    * Scale shape: ONE nation-keyed window pass (NTILE partitions by the
    * group key — hash-distributed, never a global sort) feeding one
    * (nation, bucket)-keyed agg. The un-keyed variant of this query is the
    * one to refuse at 100 TB; the per-group form is exactly how a
    * distributed ANALYZE shards its histogram builds.
    */
  private def r21(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.customer(s, dir).select(col("c_custkey"),
      col("c_nationkey").cast("long").as("nation"),
      round(col("c_acctbal").cast("double") * 100).cast("long").as("cents"))
    c.withColumn("bucket", ntile(HistB).over(
        Window.partitionBy(col("nation"))
          .orderBy(col("cents"), col("c_custkey"))).cast("long"))
      .groupBy(col("nation"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("cents")).as("ndv"),
        (min(col("cents")).cast("double") / 100.0).as("lo"),
        (max(col("cents")).cast("double") / 100.0).as("hi"))
      .orderBy(col("nation"), col("bucket"))
  }

  private val r21Sql =
    s"""WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
       |  CAST(round(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS cents
       | FROM customer),
       |b AS (SELECT nation, cents,
       |  CAST(NTILE($HistB) OVER (PARTITION BY nation
       |    ORDER BY cents, c_custkey) AS BIGINT) AS bucket FROM c)
       |SELECT nation, bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COUNT(DISTINCT cents) AS BIGINT) AS ndv,
       |  CAST(MIN(cents) AS DOUBLE) / 100.0 AS lo,
       |  CAST(MAX(cents) AS DOUBLE) / 100.0 AS hi
       |FROM b GROUP BY nation, bucket ORDER BY nation, bucket""".stripMargin

  /** Count-min sketch geometry for r19: depth 4 × width 64 cells, pairwise
    * hashes h_r(k) = ((a_r·k + b_r) mod P) mod W with a fixed prime P —
    * integer-exact and engine-independent. Constants are small enough that
    * a_r·k + b_r stays far below 2⁶³ for any realistic key domain.
    */
  private val CmDepth = 4
  private val CmWidth = 64L
  private val CmPrime = 1000003L
  private val CmA = Seq(31L, 37L, 41L, 43L)
  private val CmB = Seq(7L, 11L, 13L, 17L)

  /** Shared hash-constant VALUES table for the r19 oracle. */
  private val cmRows = (0 until CmDepth)
    .map(r => s"(${r}, ${CmA(r)}, ${CmB(r)})").mkString(",")

  /** r19 — count-min sketch frequency estimation (Cormode & Muthukrishnan
    * 2005), checked against exact counts: build the depth×width counter
    * grid over `orders.o_custkey`, then for the top-20 true-frequency keys
    * report the CMS estimate min_r(cell[r][h_r(k)]) and its overcount
    * (CMS errors are one-sided: est ≥ true always — the oracle hash-match
    * proves the sketch reproduces exactly, and the overcount column shows
    * the collision inflation at this width). r13/r18's companion: KMV
    * answers "how many distinct", CMS answers "how often is key k" in
    * O(d·w) memory regardless of key cardinality.
    *
    * Scale shape: the sketch build is ONE map-side-combined aggregate into
    * at most d·w = 256 cells — the classic mergeable-summary shape (each
    * partition combines locally, the reduce moves ≤256 rows per
    * partition). The probe side is 20 keys × 4 rows joined against the
    * 256-cell sketch via broadcast. Nothing scales with key cardinality.
    */
  private def r19(s: SparkSession, dir: String): DataFrame = {
    def buckets = array((0 until CmDepth).map { r =>
      struct(lit(r).as("r"),
        pmod(pmod(lit(CmA(r)) * col("k") + lit(CmB(r)), lit(CmPrime)),
          lit(CmWidth)).as("b"))
    }: _*)
    val keys = Tables.orders(s, dir)
      .select(col("o_custkey").cast("long").as("k"))
    val cells = keys.select(explode(buckets).as("c"))
      .groupBy(col("c.r").as("r"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cell"))
    val truth = keys.groupBy(col("k")).agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("k")).limit(20)
    val probes = truth.select(col("k"), col("true_cnt"), explode(buckets).as("c"))
      .select(col("k"), col("true_cnt"),
        col("c.r").as("r"), col("c.b").as("b"))
    probes.join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("k"), col("true_cnt"))
      .agg(min(col("cell")).as("est_cnt"))
      .select(col("k").as("custkey"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))
      .orderBy(col("true_cnt").desc, col("custkey"))
  }

  private def r19Sql: String =
    s"""WITH k AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders),
       |hh(r, a, b) AS (VALUES $cmRows),
       |h AS (SELECT k.k, hh.r,
       |        ((hh.a * k.k + hh.b) % $CmPrime) % $CmWidth AS bkt
       |      FROM k, hh),
       |cells AS (SELECT r, bkt, CAST(COUNT(*) AS BIGINT) AS cell
       |          FROM h GROUP BY r, bkt),
       |truth AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS true_cnt
       |          FROM k GROUP BY k ORDER BY true_cnt DESC, k LIMIT 20),
       |probes AS (SELECT t.k, t.true_cnt, hh.r,
       |             ((hh.a * t.k + hh.b) % $CmPrime) % $CmWidth AS bkt
       |           FROM truth t, hh)
       |SELECT p.k AS custkey, p.true_cnt, MIN(c.cell) AS est_cnt,
       |  MIN(c.cell) - p.true_cnt AS overcount
       |FROM probes p JOIN cells c ON c.r = p.r AND c.bkt = p.bkt
       |GROUP BY p.k, p.true_cnt
       |ORDER BY p.true_cnt DESC, custkey""".stripMargin

  /** Autocorrelation lags reported by r20. */
  private val AcLags = 3

  /** r20 — lag-k autocorrelation of the daily order-count series (k =
    * 1..[[AcLags]]): the drift/seasonality probe over ingest volume —
    * near-zero lag-1 says day-to-day volume is independent; high lag-7
    * would say weekly seasonality (worth knowing before time-based train
    * splits like t19). Pearson correlation of the series against its
    * k-shifted self, all moments as exact integer sums (r11's discipline)
    * with doubles entering only in the final ratio.
    *
    * Scale shape: the raw scan reduces FIRST to one row per calendar day
    * (map-side-combined count), so the windowed lag runs over a series of
    * |days| rows — thousands, not billions, at any SF; the single-partition
    * window over that reduced series is deliberate and bounded (same
    * justification as r14's EWMA scan). Sums are long-exact below 2⁵³
    * (daily counts ~10⁹ would need day-squared sums > 2⁶³ only past
    * ~10 000× TPC-H SF100; the oracle routes HUGEINT through VARCHAR so
    * only Spark's long width bounds it).
    */
  private def r20(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("d"))
    val laggy = daily.select(col("c") +: (1 to AcLags).map(kk =>
      lead(col("c"), kk).over(w).as(s"y$kk")): _*)
    val pairs = laggy.select(explode(array((1 to AcLags).map(kk =>
        struct(lit(kk).as("lag"), col("c").as("x"),
          col(s"y$kk").as("y"))): _*)).as("p"))
      .select(col("p.lag").as("lag"), col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("y").isNotNull)
    // ALL moment arithmetic in decimal(38,0), operands cast BEFORE the
    // multiply (r11's pattern): a per-term x·y in long wraps once daily
    // counts reach ~3e9, and Σx/Σy wrap with the corpus row count — while
    // the oracle's HUGEINT stays exact (r22 class); decimal→double
    // matches the oracle's VARCHAR→DOUBLE route exactly
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val agg = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n"),
      sum(dc(col("x"))).as("sx"), sum(dc(col("y"))).as("sy"),
      sum(dc(col("x")) * dc(col("x"))).as("sxx"),
      sum(dc(col("y")) * dc(col("y"))).as("syy"),
      sum(dc(col("x")) * dc(col("y"))).as("sxy"))
    def d(c: String) = col(c).cast("double")
    agg.select(col("lag").cast("long").as("lag"), col("n"),
        ((d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
            (d("n") * d("syy") - d("sy") * d("sy")))).as("autocorr"))
      .orderBy(col("lag"))
  }

  private def r20Sql: String = {
    val leads = (1 to AcLags)
      .map(k => s"LEAD(c, $k) OVER (ORDER BY d) AS y$k").mkString(",\n|  ")
    val arms = (1 to AcLags).map(k =>
      s"SELECT $k AS lag, x, y$k AS y FROM l WHERE y$k IS NOT NULL")
      .mkString("\n|  UNION ALL ")
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY d),
       |l AS (SELECT c AS x,
       |  $leads
       | FROM daily),
       |p AS (
       |  $arms),
       |a AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
       |  SUM(x) AS sx, SUM(y) AS sy,
       |  SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |  SUM(CAST(y AS HUGEINT) * y) AS syy,
       |  SUM(CAST(x AS HUGEINT) * y) AS sxy FROM p GROUP BY lag),
       |-- HUGEINT sums route through VARCHAR (see r11): correctly-rounded
       |-- to DOUBLE, matching Spark's long->double cast
       |f AS (SELECT lag, n, CAST(n AS DOUBLE) AS nd,
       |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dx,
       |  CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dy,
       |  CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx,
       |  CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS dyy,
       |  CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dxy
       | FROM a)
       |SELECT CAST(lag AS BIGINT) AS lag, n,
       |  (nd * dxy - dx * dy) /
       |  sqrt((nd * dxx - dx * dx) * (nd * dyy - dy * dy)) AS autocorr
       |FROM f ORDER BY lag""".stripMargin
  }

  /** KMV sketch size for r13. */
  private val KmvK = 64

  /** r13 — KMV (k-minimum-values) distinct-count sketch, checked against
    * the exact answer: hash every distinct event_id to a uniform fraction
    * (md5 → first 15 hex digits as a 60-bit long prefix / 2⁶⁰), keep the
    * k smallest prefixes, estimate |distinct| as (k−1)/kth_fraction.
    * Unlike HLL registers, the KMV synopsis is fully deterministic and
    * engine-portable — any engine with md5 reproduces the identical
    * k-set, estimate, and relative error, so the sketch itself is
    * oracle-checkable (and mergeable: the union of two k-sets
    * re-truncated to k IS the sketch of the union — the property that
    * makes it a one-pass distributed aggregate).
    *
    * The 60-bit long domain (round 14) is shared BIT-FOR-BIT with
    * [[graft.streaming.StreamingKMV]] — the live form keeps 64 longs per
    * group instead of 64 hex strings; the synopsis is defined over
    * DISTINCT prefixes so the ~n²/2⁶¹ prefix-collision event collapses
    * identically in every engine, and the 60-bit integer → double cast
    * rounds nearest-even identically in Spark and DuckDB.
    *
    * Scale shape: distinct() is one map-side-combined exchange on the key;
    * the k-smallest selection plans as TakeOrderedAndProject (≤ k rows
    * leave any partition — at 100 TB the ordering ships 64 longs per
    * partition, not the key set); the estimate is a 1-row reduction.
    */
  private def r13(s: SparkSession, dir: String): DataFrame = {
    val pref = Tables.events(s, dir).select(col("event_id")).distinct()
      .select(conv(substring(md5(col("event_id").cast("string")), 1, 15),
        16, 10).cast("long").as("hp"))
      .distinct()
    val kset = pref.orderBy(col("hp")).limit(KmvK)
      .select((col("hp").cast("double") /
        lit(graft.streaming.StreamingKMV.Domain)).as("frac"))
    val exact = Tables.events(s, dir).select(col("event_id")).distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    val est = lit((KmvK - 1).toDouble) / col("kth_frac")
    kset.agg(max(col("frac")).as("kth_frac"))
      .crossJoin(exact) // 1 row × 1 row
      .select(
        lit(KmvK.toLong).as("k"),
        col("kth_frac"),
        est.as("est_distinct"),
        col("exact_distinct"),
        (abs(est - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double")).as("rel_err"))
  }

  private val r13Sql =
    s"""WITH u AS (SELECT DISTINCT event_id FROM events),
       |h AS (SELECT DISTINCT CAST(('0x' ||
       |    substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hp
       |  FROM u),
       |ks AS (SELECT hp FROM h ORDER BY hp LIMIT $KmvK),
       |f AS (SELECT MAX(CAST(hp AS DOUBLE) / 1152921504606846976.0)
       |        AS kth_frac FROM ks),
       |x AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM u)
       |SELECT CAST($KmvK AS BIGINT) AS k, kth_frac,
       |  ${KmvK - 1}.0 / kth_frac AS est_distinct,
       |  exact_distinct,
       |  ABS(${KmvK - 1}.0 / kth_frac - CAST(exact_distinct AS DOUBLE))
       |    / CAST(exact_distinct AS DOUBLE) AS rel_err
       |FROM f, x""".stripMargin

  /** r34 — fixed-resolution histogram quantiles (the mergeable,
    * BIT-EXACT quantile sketch next to r05's exact percentiles: r05
    * answers "the exact p99" with a full sort, this answers "the p99 to
    * one bucket width" with a sketch whose union is an elementwise SUM —
    * the only quantile structure that is one-pass, mergeable across
    * partitions/engines/streams AND deterministic, where KLL/t-digest
    * reproduce only in distribution): per event type, the p50/p90/p99 of
    * the value column quantized to cents, over 512 one-unit buckets on
    * [0, 512), reported as the first cumulative-rank crossing's bucket
    * upper bound with rank = ⌈n·p/100⌉ in pure integer arithmetic.
    * [[graft.streaming.StreamingQuantileHist]] is the LIVE twin — same
    * geometry, same rank rule, snapshot == this query bit-for-bit on
    * shared rows (StreamingQuantileHistSpec pins it).
    *
    * Scale shape: a map-side-combined count on the (type, bucket) key —
    * at most groups × 514 rows ever shuffle regardless of input size —
    * then a window pass over that tiny frame; the full sort r05 pays
    * never happens.
    */
  private def r34(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.events(s, dir)
      .select(col("event_type").as("grp"),
        expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cv"))
    graft.streaming.StreamingQuantileHist
      .batchQuantiles(cents, "grp", "cv",
        graft.streaming.QHistConfig(lo = 0L, width = 100L, buckets = 512))
      .orderBy(col("grp"))
  }

  private val r34Sql =
    """WITH v AS (SELECT event_type AS grp,
      |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cv
      |  FROM events),
      |b AS (SELECT grp, CASE WHEN cv < 0 THEN 0
      |    WHEN (cv - 0) // 100 >= 512 THEN 513
      |    ELSE ((cv - 0) // 100) + 1 END AS bucket FROM v),
      |c AS (SELECT grp, bucket, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM b GROUP BY grp, bucket),
      |m AS (SELECT grp, bucket, c,
      |    CAST(SUM(c) OVER (PARTITION BY grp ORDER BY bucket) AS BIGINT)
      |      AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n_total
      |  FROM c),
      |u AS (SELECT grp, n_total, cum,
      |    CASE WHEN bucket <= 0 THEN 0 WHEN bucket > 512
      |      THEN 9223372036854775807 ELSE bucket * 100 END AS ub
      |  FROM m)
      |SELECT grp, MAX(n_total) AS n_total,
      |  MIN(CASE WHEN cum >= (n_total * 50 + 99) // 100 THEN ub END) AS p50,
      |  MIN(CASE WHEN cum >= (n_total * 90 + 99) // 100 THEN ub END) AS p90,
      |  MIN(CASE WHEN cum >= (n_total * 99 + 99) // 100 THEN ub END) AS p99
      |FROM u GROUP BY grp ORDER BY grp""".stripMargin

  /** r35 — sequence next-node (ClickHouse
    * `sequenceNextNode('forward', 'first_match')(…)` — the path-analysis
    * member of the sequence family: r27/r29/r31/r33 say how FAR users
    * get, r30 how OFTEN, r32 WHETHER a pattern exists; this says WHERE
    * USERS GO NEXT after converting): per user, take the FIRST completed
    * view → click journey — exactly r30's first greedy match, the click
    * whose immediate view/click-subsequence predecessor is a view,
    * earliest in the family's (ts, event_id) order — and report the
    * event type of the next event in the user's FULL sequence (any
    * type; `none` when the converting click is the user's last event).
    * Census: (next_node, n_users) over users with ≥1 completed journey.
    *
    * Scale shape: ONE user-keyed sort shared by four window passes
    * (global position + lead; subsequence lag; whole-partition min for
    * the first boundary), then a census on the tiny next-node key. No
    * joins — the oracle uses an equi-join on the computed first
    * position as the independent formulation.
    */
  private def r35(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    val user = Window.partitionBy(col("user_id"))
    val e0 = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
      .withColumn("pos", row_number().over(ord))
      .withColumn("nxt", lead(col("event_type"), 1).over(ord))
    val f = e0.filter(col("event_type").isin("view", "click"))
      .withColumn("prev", lag(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("pos"))))
    val b = f.filter(col("event_type") === "click" && col("prev") === "view")
      .withColumn("fpos", min(col("pos")).over(user))
      .filter(col("pos") === col("fpos"))
    b.select(coalesce(col("nxt"), lit("none")).as("next_node"))
      .groupBy(col("next_node"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("next_node"))
  }

  private val r35Sql =
    """WITH e AS (SELECT user_id, event_type, ts, event_id,
      |    ROW_NUMBER() OVER w AS pos, LEAD(event_type) OVER w AS nxt
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT user_id, event_type, pos, nxt,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY pos) AS prev
      |  FROM e WHERE event_type IN ('view', 'click')),
      |b AS (SELECT user_id, pos, nxt FROM f
      |  WHERE event_type = 'click' AND prev = 'view'),
      |fb AS (SELECT user_id, MIN(pos) AS fpos FROM b GROUP BY user_id)
      |SELECT COALESCE(b.nxt, 'none') AS next_node,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM b JOIN fb ON fb.user_id = b.user_id AND b.pos = fb.fpos
      |GROUP BY next_node ORDER BY next_node""".stripMargin

  /** r36 — sequence previous-node (ClickHouse
    * `sequenceNextNode('backward', 'last_match')(…)` — the remaining
    * direction/base pair next to r35's forward/first_match, completing
    * the path-analysis modes: r35 asks where users GO after their FIRST
    * conversion, this asks where users CAME FROM before their LAST):
    * per user, take the LAST completed view → click journey — the
    * latest boundary click in the family's (ts, event_id) order, whose
    * immediate view/click-subsequence predecessor is a view — and
    * report the event type of the event immediately BEFORE that
    * journey's view in the user's FULL sequence (any type; `none` when
    * the view is the user's first event). Census: (prev_node, n_users)
    * over users with ≥1 completed journey.
    *
    * Semantics notes vs r35: `backward` walks the full sequence in
    * reverse from the match's FIRST step (the view), so the reported
    * node is the view's full-sequence predecessor; `last_match`
    * anchors on the latest journey (MAX position boundary instead of
    * MIN). The lag-of-lag carry (`vprv` = the subsequence predecessor
    * row's own full-sequence predecessor type) rides the SAME two
    * window sorts r35 uses — direction and base are knobs on the four
    * window passes, not new machinery.
    *
    * Scale shape: ONE user-keyed sort shared by four window passes
    * (global position + lag; subsequence lag pair; whole-partition max
    * for the last boundary), then a census on the tiny prev-node key.
    * No joins — the oracle reads the view row's predecessor through an
    * equi-join on the computed position instead of the lag-of-lag
    * carry, the independent formulation; both are LINEAR (the r35
    * pattern the ×10 overflow gate rides).
    */
  private def r36(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    val user = Window.partitionBy(col("user_id"))
    val sub = Window.partitionBy(col("user_id")).orderBy(col("pos"))
    val e0 = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
      .withColumn("pos", row_number().over(ord))
      .withColumn("prv", lag(col("event_type"), 1).over(ord))
    val f = e0.filter(col("event_type").isin("view", "click"))
      .withColumn("prev", lag(col("event_type"), 1).over(sub))
      .withColumn("vprv", lag(col("prv"), 1).over(sub))
    val b = f.filter(col("event_type") === "click" && col("prev") === "view")
      .withColumn("lpos", max(col("pos")).over(user))
      .filter(col("pos") === col("lpos"))
    b.select(coalesce(col("vprv"), lit("none")).as("prev_node"))
      .groupBy(col("prev_node"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("prev_node"))
  }

  private val r36Sql =
    """WITH e AS (SELECT user_id, event_type, ts, event_id,
      |    ROW_NUMBER() OVER w AS pos, LAG(event_type) OVER w AS prv
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT user_id, event_type, pos,
      |    LAG(event_type) OVER u AS prev, LAG(pos) OVER u AS prevpos
      |  FROM e WHERE event_type IN ('view', 'click')
      |  WINDOW u AS (PARTITION BY user_id ORDER BY pos)),
      |b AS (SELECT user_id, pos, prevpos FROM f
      |  WHERE event_type = 'click' AND prev = 'view'),
      |lb AS (SELECT user_id, MAX(pos) AS lpos FROM b GROUP BY user_id),
      |sel AS (SELECT b.user_id, b.prevpos FROM b
      |  JOIN lb ON lb.user_id = b.user_id AND b.pos = lb.lpos)
      |SELECT COALESCE(v.prv, 'none') AS prev_node,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM sel JOIN e v ON v.user_id = sel.user_id AND v.pos = sel.prevpos
      |GROUP BY prev_node ORDER BY prev_node""".stripMargin

  /** r37 — ClickHouse-TRUE `strict_order` windowed funnel (the shipped
    * scan, next to r29's deliberately-stricter full-consecutiveness
    * variant), with BOTH of the published loop's termination rules
    * (round 18 completes the second, per ADVICE): (1) an event matching
    * NO step condition stops the user's whole scan the first time it
    * appears after a step-1 event; (2) an event matching condition
    * j ≥ 3 whose level-(j−1) slot was never written (no earlier
    * window-valid chain reached j−1) terminates the scan at the
    * contiguous level reached so far — view, purchase, click is level 1
    * (the purchase finds no click slot and stops the scan), and a later
    * clean chain never revives it. Everything before the first stop
    * chains like r27's default EXISTS mode. The readings split exactly
    * on interleaved IN-FAMILY events: view, click, view, purchase is
    * level 3 here (the second view matches condition 1 and the
    * purchase's click slot is written) and level 2 under r29; A→B→D→C
    * (D out-of-family) is level 2 under both — the ClickHouse docs' own
    * example. Reported as users per furthest level, every user
    * censused, like the rest of the family.
    *
    * Scale shape: [[graft.operators.SequenceMatch.funnelLevels]] with
    * the [[graft.operators.SequenceMatch.StrictOrderCH]] mode — claims,
    * slot-written flags and the first-stop mask are all window passes
    * on the SAME per-user (ts, event_id) sort the default chain runs on
    * (zero extra shuffles), so the whole query is still one user-keyed
    * sort, no joins, O(1) per-row state. The oracle replays the same
    * scan in SQL windows (r38Sql's style): anchor maxima, window-checked
    * claims, the two stop rules, then max-claim-before-stop per user.
    */
  private def r37(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    graft.operators.SequenceMatch.funnelLevels(ev, "user_id", "tsu",
        "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowSeconds = 24L * 3600,
        mode = graft.operators.SequenceMatch.StrictOrderCH)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  private val r37Sql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |w1 AS (SELECT user_id, ts, event_id, event_type,
      |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER sp AS m2,
      |    MAX(CASE WHEN event_type = 'view' THEN 1 END) OVER sp AS seen1
      |  FROM events
      |  WINDOW sp AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |w2 AS (SELECT *,
      |    (event_type = 'click' AND m2 IS NOT NULL
      |     AND ts <= m2 + INTERVAL 24 HOUR) AS c2,
      |    CASE WHEN event_type = 'click' THEN m2 END AS a2
      |  FROM w1),
      |w3 AS (SELECT *,
      |    MAX(a2) OVER sp AS m3,
      |    MAX(CASE WHEN c2 THEN 1 END) OVER sp AS rb2
      |  FROM w2
      |  WINDOW sp AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |w4 AS (SELECT *,
      |    (event_type = 'purchase' AND m3 IS NOT NULL
      |     AND ts <= m3 + INTERVAL 24 HOUR) AS c3,
      |    CASE WHEN seen1 = 1 AND
      |      (event_type NOT IN ('view', 'click', 'purchase')
      |       OR (event_type = 'purchase' AND rb2 IS NULL))
      |      THEN 1 END AS brk
      |  FROM w3),
      |w5 AS (SELECT *,
      |    MAX(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
      |  FROM w4),
      |lv AS (SELECT user_id, MAX(CASE WHEN dead = 1 THEN 0
      |    WHEN c3 THEN 3 WHEN c2 THEN 2
      |    WHEN event_type = 'view' THEN 1 ELSE 0 END) AS level
      |  FROM w5 GROUP BY user_id)
      |SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
      |  SELECT CAST(COALESCE(lv.level, 0) AS BIGINT) AS level
      |  FROM u LEFT JOIN lv ON lv.user_id = u.user_id)
      |GROUP BY level ORDER BY level""".stripMargin

  /** r38 — ClickHouse-TRUE `strict_deduplication` windowed funnel (the
    * literal shipped scan, next to r31's EXISTS-over-anchors variant):
    * scanning the user's view/click/purchase events in order, a repeat
    * of a condition some chain ALREADY REACHED stops the whole scan,
    * and the result is the literal `repeated-condition-index − 1` —
    * view, click, click is level 1 here (the second click repeats
    * condition 2; 2 − 1 = 1) where r31 reads 2; view, click, click,
    * purchase is 1 vs r31's 2 vs r27's 3. A first completion of the
    * full chain returns 3 before any later repeat can demote it, and a
    * scan with neither repeat nor completion falls back to the highest
    * level reached — i.e. agrees with r27. Views never terminate (they
    * re-anchor, per the scan's branch order). Reported as users per
    * level, every user censused.
    *
    * Scale shape: [[graft.operators.SequenceMatch.funnelLevels]] with
    * the [[graft.operators.SequenceMatch.StrictDedupCH]] mode — the
    * default chain's window-checked level claims ARE the scan's slot
    * writes, so the scan reduces to claim flags + per-user firsts on
    * the one (ts, event_id) sort: no joins, O(1) per-row state, a bot
    * user is one sorted run. The oracle replays the same scan in SQL
    * windows with the firsts as conditional MIN aggregates (earliest
    * termination fetched as a pos-leading integer encoding).
    */
  private def r38(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    graft.operators.SequenceMatch.funnelLevels(ev, "user_id", "tsu",
        "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowSeconds = 24L * 3600,
        mode = graft.operators.SequenceMatch.StrictDedupCH)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  private val r38Sql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |f AS (SELECT user_id, ts, event_id, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |w1 AS (SELECT user_id, event_type, ts,
      |    ROW_NUMBER() OVER sq AS pos,
      |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER sp AS m2
      |  FROM f WINDOW
      |    sq AS (PARTITION BY user_id ORDER BY ts, event_id),
      |    sp AS (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |w2 AS (SELECT *, MAX(CASE WHEN event_type = 'click' THEN m2 END)
      |    OVER (PARTITION BY user_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m3
      |  FROM w1),
      |c AS (SELECT *,
      |    COALESCE(event_type = 'click'
      |      AND m2 >= ts - INTERVAL 24 HOUR, FALSE) AS c2,
      |    COALESCE(event_type = 'purchase'
      |      AND m3 >= ts - INTERVAL 24 HOUR, FALSE) AS c3
      |  FROM w2),
      |rb AS (SELECT *,
      |    MAX(CASE WHEN c2 THEN 1 END) OVER sp = 1 AS rb2,
      |    MAX(CASE WHEN c3 THEN 1 END) OVER sp = 1 AS rb3
      |  FROM c WINDOW sp AS (PARTITION BY user_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |g AS (SELECT user_id,
      |    MIN(CASE WHEN event_type = 'click' AND COALESCE(rb2, FALSE)
      |          THEN pos * 10 + 1
      |        WHEN event_type = 'purchase' AND COALESCE(rb3, FALSE)
      |          THEN pos * 10 + 2 END) AS tcode,
      |    MIN(CASE WHEN c3 THEN pos END) AS kpos,
      |    MAX(CASE WHEN c3 THEN 3 WHEN c2 THEN 2
      |        WHEN event_type = 'view' THEN 1 ELSE 0 END) AS mx
      |  FROM rb GROUP BY user_id),
      |lv AS (SELECT user_id, CASE
      |    WHEN kpos IS NOT NULL AND (tcode IS NULL OR kpos < tcode // 10)
      |      THEN 3
      |    WHEN tcode IS NOT NULL THEN tcode % 10
      |    ELSE mx END AS level FROM g)
      |SELECT CAST(COALESCE(lv.level, 0) AS BIGINT) AS level,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM u LEFT JOIN lv ON lv.user_id = u.user_id
      |GROUP BY 1 ORDER BY level""".stripMargin

  /** r16 — chi-square distribution drift: split the event stream at the
    * midpoint of its time range and test whether the event-type mix of the
    * late half drifted from the early half — the categorical-drift monitor
    * that complements r15 (per-value z-scores) and r14 (per-type level
    * EWMA): those see VALUE changes, this sees MIX changes (a type
    * vanishing or flooding). Per type: observed counts in each half,
    * expected counts under independence, and the type's contribution to
    * the chi-square statistic (Σ over the 5 rows = the test statistic,
    * 4 degrees of freedom).
    *
    * Determinism: all counts stay BIGINT; the deviation d = o_a·n −
    * n_type·n_a is exact integer (|d| < n² — long-safe through sf1.0, the
    * decimal widening is mechanical beyond); each contribution is a fixed
    * two-term double expression over exactly-converted integers — no
    * float sum whose order could wander.
    *
    * Scale shape: one map-side-combined count aggregate over (type) with
    * conditional sums, one broadcast single-row totals join — the whole
    * query is two scans' worth of work collapsed to 5 rows, any corpus
    * size.
    */
  private def r16(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val mid = ev.agg(expr("(MIN(us) + MAX(us)) DIV 2").as("mid"))
    val perType = ev.crossJoin(broadcast(mid))
      .groupBy(col("event_type"))
      .agg(sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("n_a"),
        count(lit(1)).as("n_type"))
      .withColumn("n_b", col("n_type") - col("n_a"))
    val totals = perType.agg(sum(col("n_a")).as("t_a"),
      sum(col("n_type")).as("t_n"))
    val d = col("n_a") * col("t_n") - col("n_type") * col("t_a")
    val dd = d.cast("double") * d.cast("double")
    val denA = (col("n_type") * col("t_a")).cast("double") * col("t_n").cast("double")
    val denB = (col("n_type") * (col("t_n") - col("t_a"))).cast("double") *
      col("t_n").cast("double")
    perType.crossJoin(broadcast(totals))
      .select(col("event_type"), col("n_a"), col("n_b"), col("n_type"),
        (col("n_type").cast("double") * col("t_a").cast("double")
          / col("t_n").cast("double")).as("exp_a"),
        (col("n_type").cast("double") * (col("t_n") - col("t_a")).cast("double")
          / col("t_n").cast("double")).as("exp_b"),
        (dd / denA + dd / denB).as("chisq_contrib"))
      .orderBy(col("event_type"))
  }

  private val r16Sql =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
      |m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM e),
      |pt AS (SELECT event_type,
      |  CAST(SUM(CASE WHEN us <= m.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |  CAST(COUNT(*) AS BIGINT) AS n_type
      | FROM e, m GROUP BY event_type),
      |tt AS (SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
      |  CAST(SUM(n_type) AS BIGINT) AS t_n FROM pt)
      |SELECT event_type, n_a, n_type - n_a AS n_b, n_type,
      |  CAST(n_type AS DOUBLE) * CAST(t_a AS DOUBLE) / CAST(t_n AS DOUBLE)
      |    AS exp_a,
      |  CAST(n_type AS DOUBLE) * CAST(t_n - t_a AS DOUBLE) / CAST(t_n AS DOUBLE)
      |    AS exp_b,
      |  (CAST(n_a * t_n - n_type * t_a AS DOUBLE)
      |     * CAST(n_a * t_n - n_type * t_a AS DOUBLE))
      |    / (CAST(n_type * t_a AS DOUBLE) * CAST(t_n AS DOUBLE))
      |  + (CAST(n_a * t_n - n_type * t_a AS DOUBLE)
      |       * CAST(n_a * t_n - n_type * t_a AS DOUBLE))
      |    / (CAST(n_type * (t_n - t_a) AS DOUBLE) * CAST(t_n AS DOUBLE))
      |    AS chisq_contrib
      |FROM pt, tt
      |ORDER BY event_type""".stripMargin

  /** r17 — exact Kolmogorov–Smirnov drift per event type: split each
    * type's value stream at the time-range midpoint (r16's cut) and
    * compute the exact two-sample KS statistic D = max |CDF_a − CDF_b| —
    * the VALUE-distribution drift test completing the monitor family
    * (r16 sees mix drift across types, r15 per-event outliers; this sees
    * a type's whole value distribution shifting shape with zero
    * distributional assumptions). D is carried as the integer numerator
    * max |cum_a·n_b − cum_b·n_a| over the merged support (exact — no
    * float enters until the final division), with the smallest quantized
    * value attaining it reported as the drift location.
    *
    * Scale shape: one count aggregate per (type, distinct value), then
    * per-TYPE ordered prefix sums — the windows key on event_type, so
    * partitions spread across types and each holds |distinct values of
    * one type| rows (the same keyed-window discipline as r05's exact
    * percentiles; nothing global ever sorts).
    */
  private def r17(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value").cast("double") * 1000000).cast("long").as("vq"),
        unix_micros(col("ts")).as("us"))
    val mid = ev.agg(expr("(MIN(us) + MAX(us)) DIV 2").as("mid"))
    val perVq = ev.crossJoin(broadcast(mid))
      .groupBy(col("event_type"), col("vq"))
      .agg(sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("us") > col("mid"), 1L).otherwise(0L)).as("cb"))
    val cw = Window.partitionBy(col("event_type")).orderBy(col("vq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(col("event_type"))
    val scored = perVq
      .withColumn("cum_a", sum(col("ca")).over(cw))
      .withColumn("cum_b", sum(col("cb")).over(cw))
      .withColumn("n_a", sum(col("ca")).over(tw))
      .withColumn("n_b", sum(col("cb")).over(tw))
      .withColumn("d_num",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(col("d_num").desc, col("vq"))
    scored.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_a"), col("n_b"), col("d_num"),
        (col("d_num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("ks_d"),
        (col("vq").cast("double") / 1000000.0).as("at_value"))
      .orderBy(col("event_type"))
  }

  private val r17Sql =
    """WITH e AS (SELECT event_type,
      |  CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vq,
      |  epoch_us(ts) AS us FROM events),
      |m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM e),
      |pv AS (SELECT event_type, vq,
      |  CAST(SUM(CASE WHEN us <= m.mid THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |  CAST(SUM(CASE WHEN us > m.mid THEN 1 ELSE 0 END) AS BIGINT) AS cb
      | FROM e, m GROUP BY event_type, vq),
      |c AS (SELECT event_type, vq,
      |  CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
      |  CAST(SUM(cb) OVER w AS BIGINT) AS cum_b,
      |  CAST(SUM(ca) OVER t AS BIGINT) AS n_a,
      |  CAST(SUM(cb) OVER t AS BIGINT) AS n_b
      | FROM pv
      | WINDOW w AS (PARTITION BY event_type ORDER BY vq
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  t AS (PARTITION BY event_type)),
      |d AS (SELECT event_type, vq, n_a, n_b,
      |  ABS(cum_a * n_b - cum_b * n_a) AS d_num,
      |  ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY ABS(cum_a * n_b - cum_b * n_a) DESC, vq) AS rn
      | FROM c)
      |SELECT event_type, n_a, n_b, d_num,
      |  CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      |    AS ks_d,
      |  CAST(vq AS DOUBLE) / 1000000.0 AS at_value
      |FROM d WHERE rn = 1
      |ORDER BY event_type""".stripMargin

  /** r18 — exact heavy hitters: top-10 users per event type by exact
    * count, ranked (count desc, user_id) — the batch ground truth of the
    * streaming SpaceSaving sketch, THROUGH THE SAME CODE PATH
    * (`StreamingTopK.exactTopK`) the batch==streaming agreement spec pins
    * the sketch against, so the oracle check here transitively anchors
    * the streaming operator's no-eviction behavior to DuckDB.
    *
    * Scale shape: one map-side-combined count over (type, user), then a
    * per-type rank window whose partitions are the per-type user sets —
    * keyed, spread, top-10 cut. At unbounded-stream scale this exact form
    * is impossible (state = all users) — which is precisely the gap the
    * SpaceSaving sketch fills with capacity-bounded state.
    */
  private def r18(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingTopK.exactTopK(Tables.events(s, dir),
        col("event_type"), col("user_id"), capacity = 10)
      .select(col("group").as("event_type"), col("rank").as("rk"),
        col("item").as("user_id"), col("cnt"))
      .orderBy(col("event_type"), col("rk"))

  // item ids travel as STRINGS through the tracker (stream-generic), so
  // the oracle casts BEFORE ranking — the count-tie ordering is over the
  // string form on both sides
  private val r18Sql =
    """WITH c AS (SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
      |  COUNT(*) AS cnt
      | FROM events GROUP BY event_type, CAST(user_id AS VARCHAR)),
      |r AS (SELECT event_type, user_id, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY cnt DESC, user_id) AS BIGINT) AS rk
      | FROM c)
      |SELECT event_type, rk, user_id, cnt FROM r WHERE rk <= 10
      |ORDER BY event_type, rk""".stripMargin

  /** LINEAR alternate oracles for the ×10 overflow gate (exposed as
    * `SparkEntry.oracleSqlLinear`; `graft.Verify` overlays them when
    * `SPARK_GRAFT_ORACLE_LINEAR=1`).
    *
    * The REGISTRY oracles for r27/r32/r33 are deliberately readable
    * step-join EXISTS specs — quadratic (r27/r33) or cubic (r32's p1)
    * per user, infeasible in DuckDB on the inflated overflow corpus
    * (~10k events/user). These forms compute the SAME semantics
    * linearly, via the running-extrema reduction the engine's scaladoc
    * proves exact ([[graft.operators.SequenceMatch]]): one window pass
    * per level over the family's (ts, event_id) order (r33: RANGE
    * frames over event-time µs — the strict_increase mode's frame).
    *
    * Independence stance: the gate's job is catching ARITHMETIC
    * overflow wraps cross-engine (DuckDB evaluates in its own engine,
    * HUGEINT-safe), not re-proving query semantics — the registry's
    * step-join oracles pin semantic equivalence exactly at every driver
    * SF, and the linear≡step-join reduction is proven in the engine
    * scaladoc and pinned by FunnelModesSpec/SequenceMatchSpec corpora.
    */
  def linearOracles: Map[String, String] = Map(
    "r27_window_funnel" ->
      """WITH w1 AS (SELECT user_id, event_type, ts, event_id,
        |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER sq AS m2
        |  FROM events WINDOW sq AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |w2 AS (SELECT user_id, event_type, ts, m2,
        |    MAX(CASE WHEN event_type = 'click' THEN m2 END) OVER sq AS m3
        |  FROM w1 WINDOW sq AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |l AS (SELECT user_id, MAX(CASE
        |    WHEN event_type = 'purchase'
        |      AND m3 >= ts - INTERVAL 24 HOUR THEN 3
        |    WHEN event_type = 'click'
        |      AND m2 >= ts - INTERVAL 24 HOUR THEN 2
        |    WHEN event_type = 'view' THEN 1 ELSE 0 END) AS level
        |  FROM w2 GROUP BY user_id)
        |SELECT CAST(level AS BIGINT) AS level,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM l GROUP BY level ORDER BY level""".stripMargin,
    "r33_strict_increase_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
        |  FROM events),
        |w1 AS (SELECT user_id, event_type, t,
        |    MAX(CASE WHEN event_type = 'view' THEN t END) OVER sq AS m2
        |  FROM e WINDOW sq AS (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |w2 AS (SELECT user_id, event_type, t, m2,
        |    MAX(CASE WHEN event_type = 'click' THEN m2 END) OVER sq AS m3
        |  FROM w1 WINDOW sq AS (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |l AS (SELECT user_id, MAX(CASE
        |    WHEN event_type = 'purchase'
        |      AND m3 >= t - 86400000000 THEN 3
        |    WHEN event_type = 'click'
        |      AND m2 >= t - 86400000000 THEN 2
        |    WHEN event_type = 'view' THEN 1 ELSE 0 END) AS level
        |  FROM w2 GROUP BY user_id)
        |SELECT CAST(level AS BIGINT) AS level,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM l GROUP BY level ORDER BY level""".stripMargin,
    "r32_sequence_match" ->
      """WITH f1 AS (SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |a1 AS (SELECT user_id, event_type, ts, event_id,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 END) OVER sq AS sv
        |  FROM f1 WINDOW sq AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |a2 AS (SELECT user_id, event_type,
        |    MAX(CASE WHEN event_type = 'click' AND sv = 1 THEN 1 END)
        |      OVER sq AS svc
        |  FROM a1 WINDOW sq AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(m) AS BIGINT) AS n_matched FROM (
        |  SELECT user_id, MAX(CASE WHEN event_type = 'purchase'
        |      AND svc = 1 THEN 1 ELSE 0 END) AS m
        |  FROM a2 GROUP BY user_id)),
        |f2 AS (SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE event_type IN ('view', 'click')),
        |b1 AS (SELECT user_id, event_type, ts,
        |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER sq AS lv,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM f2 WINDOW sq AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(m) AS BIGINT) AS n_matched FROM (
        |  SELECT user_id, MAX(CASE WHEN event_type = 'click'
        |      AND lv >= ts - INTERVAL 3600 SECOND THEN 1 ELSE 0 END) AS m
        |  FROM b1 GROUP BY user_id)),
        |p4 AS (SELECT CAST(SUM(m) AS BIGINT) AS n_matched FROM (
        |  SELECT user_id, MAX(CASE WHEN event_type = 'click'
        |      AND prev = 'view' THEN 1 ELSE 0 END) AS m
        |  FROM b1 GROUP BY user_id)),
        |f3 AS (SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE event_type IN ('signup', 'purchase')),
        |c1 AS (SELECT user_id, event_type, ts,
        |    MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER sq AS lsg
        |  FROM f3 WINDOW sq AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(m) AS BIGINT) AS n_matched FROM (
        |  SELECT user_id, MAX(CASE WHEN event_type = 'purchase'
        |      AND lsg >= ts - INTERVAL 86400 SECOND THEN 1 ELSE 0 END) AS m
        |  FROM c1 GROUP BY user_id)),
        |f4 AS (SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE event_type IN ('view', 'purchase')),
        |d1 AS (SELECT user_id, event_type, ts,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) OVER sq AS ev
        |  FROM f4 WINDOW sq AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p5 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(m) AS BIGINT) AS n_matched FROM (
        |  SELECT user_id, MAX(CASE WHEN event_type = 'purchase'
        |      AND ev <= ts - INTERVAL 3600 SECOND THEN 1 ELSE 0 END) AS m
        |  FROM d1 GROUP BY user_id))
        |SELECT pattern, n_users, n_matched,
        |  CAST(n_matched AS DOUBLE) / n_users AS match_rate FROM (
        |  SELECT 'p1_vcp_any' AS pattern, n_users, n_matched FROM p1
        |  UNION ALL
        |  SELECT 'p2_vc_within_1h', n_users, n_matched FROM p2
        |  UNION ALL
        |  SELECT 'p3_sp_within_24h', n_users, n_matched FROM p3
        |  UNION ALL
        |  SELECT 'p4_vc_adjacent', p2.n_users, p4.n_matched FROM p2, p4
        |  UNION ALL
        |  SELECT 'p5_vp_after_1h', n_users, n_matched FROM p5)
        |ORDER BY pattern""".stripMargin)
}
