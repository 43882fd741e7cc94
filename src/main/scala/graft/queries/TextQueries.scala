package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table: token statistics,
  * language ID, quality scoring, fingerprinting (training-data pipeline
  * surface). All pure column expressions — one parquet scan, no shuffle
  * except the final tiny sort.
  */
object TextQueries extends QueryPack {

  /** t01 — token counting: counts, distinct ratio, mean token length. */
  private def t01(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ws = tokens(col("text"))
    docs.select(
      col("doc_id"),
      col("lang"),
      size(ws).cast("long").as("n_tokens"),
      size(array_distinct(ws)).cast("long").as("n_distinct"),
      (size(array_distinct(ws)).cast("double") / size(ws)).as("distinct_ratio"),
      (aggregate(transform(ws, w => length(w)), lit(0), (a, x) => a + x).cast("double")
        / size(ws)).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  private val t01Sql =
    """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id, lang,
      |  len(ws) AS n_tokens,
      |  len(list_distinct(ws)) AS n_distinct,
      |  CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS distinct_ratio,
      |  CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws) AS avg_token_len
      |FROM w ORDER BY doc_id""".stripMargin

  /** t02 — language ID: stopword-profile argmax (n-gram heuristic),
    * first-listed language wins ties, 'und' when nothing matches.
    */
  private def t02(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val scoreCols = LangProfiles.map { case (lang, prof) =>
      langScore(col("text"), prof).cast("long").as(s"s_$lang")
    }
    docs.select(
      Seq(col("doc_id"), col("lang").as("true_lang"),
        langId(col("text")).as("pred_lang")) ++ scoreCols: _*)
      .orderBy(col("doc_id"))
  }

  private val t02Sql =
    """WITH w AS (SELECT doc_id, lang AS true_lang,
      |  list_distinct(string_split(text, ' ')) AS dt FROM documents),
      |sc AS (SELECT doc_id, true_lang,
      |  len(list_intersect(dt, ['the','a','of','and','is'])) AS s_en,
      |  len(list_intersect(dt, ['der','die','und','das','ist'])) AS s_de,
      |  len(list_intersect(dt, ['el','la','de','los','es'])) AS s_es,
      |  len(list_intersect(dt, ['le','les','des','est','une'])) AS s_fr,
      |  len(list_intersect(dt, ['的','是','了','在','有'])) AS s_zh
      | FROM w)
      |SELECT doc_id, true_lang,
      |  CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 AND s_zh = 0 THEN 'und'
      |       WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |       WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS pred_lang,
      |  CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
      |  CAST(s_es AS BIGINT) AS s_es, CAST(s_fr AS BIGINT) AS s_fr,
      |  CAST(s_zh AS BIGINT) AS s_zh
      |FROM sc ORDER BY doc_id""".stripMargin

  /** t03 — quality scoring: distinct-token ratio × length factor, banded. */
  private def t03(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ws = tokens(col("text"))
    val ratio = size(array_distinct(ws)).cast("double") / size(ws)
    val lenFactor = least(lit(1.0), size(ws).cast("double") / 50.0)
    val score = ratio * lenFactor
    docs.select(
      col("doc_id"),
      size(ws).cast("long").as("n_tokens"),
      ratio.as("distinct_ratio"),
      score.as("quality_score"),
      when(score >= 0.6, "high").when(score >= 0.4, "medium")
        .otherwise("low").as("quality_band"))
      .orderBy(col("doc_id"))
  }

  private val t03Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |q AS (SELECT doc_id, len(ws) AS n_tokens,
      |  CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS distinct_ratio,
      |  (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
      |    * least(CAST(1.0 AS DOUBLE), CAST(len(ws) AS DOUBLE) / 50.0) AS quality_score
      | FROM w)
      |SELECT doc_id, n_tokens, distinct_ratio, quality_score,
      |  CASE WHEN quality_score >= 0.6 THEN 'high'
      |       WHEN quality_score >= 0.4 THEN 'medium' ELSE 'low' END AS quality_band
      |FROM q ORDER BY doc_id""".stripMargin

  /** t04 — document fingerprinting: exact content hash (normalized md5) and
    * a min-shingle rolling fingerprint (minhash k=1 over word 3-shingles).
    */
  private def t04(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.select(
      col("doc_id"),
      fingerprint(col("text")).as("fp_exact"),
      array_min(transform(wordShingles(col("text"), 3),
        x => md5(concat(lit("0:"), x)))).as("fp_minshingle"))
      .orderBy(col("doc_id"))
  }

  private val t04Sql =
    """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, text,
      |  list_distinct(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s3
      | FROM w)
      |SELECT doc_id,
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_exact,
      |  list_min(list_transform(s3, x -> md5('0:' || x))) AS fp_minshingle
      |FROM sh ORDER BY doc_id""".stripMargin

  /** t05 — deterministic stratified sampling: per-language keep rates via a
    * content-stable hash threshold (md5-derived, so reproducible anywhere and
    * stable under re-partitioning — the property `sample()` lacks). The
    * training-data balancing op: downsample the dominant class.
    */
  private def t05(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // bucket ∈ [0, 1000): first 8 md5 hex digits of "smp:<doc_id>" mod 1000
    val bucket = pmod(
      conv(substring(md5(concat(lit("smp:"), col("doc_id"))), 1, 8), 16, 10)
        .cast("long"), lit(1000L))
    val keepRate = when(col("lang") === "en", 300L)
      .when(col("lang") === "zh", 500L)
      .otherwise(1000L)
    docs.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < keepRate)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  private val t05Sql =
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substr(md5('smp:' || doc_id), 1, 8)) AS BIGINT) % 1000 AS bucket
      |  FROM documents)
      |WHERE bucket < CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 500 ELSE 1000 END
      |ORDER BY doc_id""".stripMargin

  /** t06 — BPE-style pre-tokenization counting: split on letter runs, digit
    * runs, and single punctuation marks (ASCII classes — identical regex
    * semantics in any engine), the unit a byte-pair tokenizer would consume.
    */
  private def t06(s: SparkSession, dir: String): DataFrame = {
    val pieces = regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(pieces).cast("long").as("n_pieces"),
        size(array_distinct(pieces)).cast("long").as("n_distinct_pieces"),
        size(filter(pieces, p => p.rlike("^[0-9]+$"))).cast("long").as("n_number_runs"))
      .orderBy(col("doc_id"))
  }

  private val t06Sql =
    """WITH p AS (SELECT doc_id,
      |  regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS pieces
      | FROM documents)
      |SELECT doc_id,
      |  CAST(len(pieces) AS BIGINT) AS n_pieces,
      |  CAST(len(list_distinct(pieces)) AS BIGINT) AS n_distinct_pieces,
      |  CAST(len(list_filter(pieces, x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS n_number_runs
      |FROM p ORDER BY doc_id""".stripMargin

  /** t07 — repetition scoring (C4/RefinedWeb-style quality signal): the
    * share of a document covered by its single most frequent word 3-gram.
    * Occurrences count multiplicity (no distinct), so copy-paste loops score
    * high.
    *
    * Repetition is a per-document statistic, so it is computed per row:
    * sort the gram array, then the max multiplicity is the longest run of
    * equal adjacent elements — one pass with `aggregate()`. Zero shuffle
    * except the final tiny sort; at corpus scale this stays a map-only scan
    * (the earlier explode + double hash-aggregation form shuffled ~every
    * token in the corpus).
    */
  private def t07(s: SparkSession, dir: String): DataFrame = {
    // ws is a NAMED column, referenced 4× below — CollapseProject keeps
    // multi-referenced non-cheap aliases materialized, so the lambda's
    // element_at calls hit the array once per row instead of re-running
    // the tokenizer per gram position (the d26 trap)
    val docs = Tables.documents(s, dir)
      .withColumn("ws", tokens(col("text")))
    val ws = col("ws")
    val mk = (i: Column) => concat_ws(" ",
      element_at(ws, i.cast("int")), element_at(ws, (i + 1).cast("int")),
      element_at(ws, (i + 2).cast("int")))
    val all3 = transform(sequence(lit(1), size(ws) - 2), mk)
    // longest equal run in the sorted gram array = max multiplicity
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"))
    val maxRep = aggregate(array_sort(all3), zero,
      (acc, g) => {
        val run = when(acc.getField("prev") === g, acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs.filter(size(ws) >= 3)
      .select(col("doc_id"),
        (size(ws) - 2).cast("long").as("n_grams"),
        maxRep.as("max_rep"))
      .select(col("doc_id"), col("n_grams"), col("max_rep"),
        (col("max_rep").cast("double") / col("n_grams")).as("rep_ratio"))
      .orderBy(col("doc_id"))
  }

  private val t07Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
      | FROM w WHERE len(ws) >= 3),
      |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, MAX(c) AS max_rep,
      |  CAST(MAX(c) AS DOUBLE) / SUM(c) AS rep_ratio
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** t08 — BPE-apply encoding over the fixed merge vocabulary (see
    * BpeApply): per-doc encoded-unit count, merge events, and compression
    * ratio. A real piece encoding (rank-ordered merges), not just
    * pre-tokenization counting (t06) — and still a zero-shuffle map pass,
    * one native codegen'd expression per row.
    */
  private def t08(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BpeApply
    Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        BpeApply(col("text")).as("enc"))
      .select(col("doc_id"), col("n_chars"),
        col("enc").getItem(0).as("n_units"),
        col("enc").getItem(1).as("n_merges"))
      .select(col("doc_id"), col("n_chars"), col("n_units"), col("n_merges"),
        when(col("n_units") > 0,
          col("n_chars").cast("double") / col("n_units")).as("compression"))
      .orderBy(col("doc_id"))
  }

  private val t08Sql: String = {
    import graft.functions.BpeApply
    val enc = BpeApply.Vocab.zipWithIndex.foldLeft("text") {
      case (acc, (tok, i)) => s"replace($acc, '$tok', chr(${0xE000 + i}))"
    }
    val phs = BpeApply.Vocab.indices.map(i => s"chr(${0xE000 + i})").mkString(" || ")
    s"""WITH m AS (SELECT doc_id, text, $enc AS enc FROM documents)
       |SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(length(enc) AS BIGINT) AS n_units,
       |  CAST(length(enc) - length(translate(enc, $phs, '')) AS BIGINT) AS n_merges,
       |  CASE WHEN length(enc) > 0
       |       THEN CAST(length(text) AS DOUBLE) / length(enc) END AS compression
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** t09 — PII scrubbing: redact emails and phone numbers, counting what
    * was found. Deterministic PII is planted on every 7th document first
    * (the same inject-then-operate pattern as d01/q05), so the scrubber is
    * exercised against known ground truth; the md5 of the scrubbed text
    * pins the exact redaction output cross-engine. Pure per-row regex work
    * — zero shuffle, stays in codegen.
    */
  private def t09(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\b555-[0-9]{4}\\b"
    val planted = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" today")))
      .otherwise(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), planted.as("ptext"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("ptext"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("ptext"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("ptext"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  private val t09Sql =
    """WITH p AS (SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0
      |       THEN text || ' contact user' || doc_id || '@example.com or 555-' ||
      |            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      |       ELSE text END AS ptext
      | FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(ptext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(ptext, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(
      |        regexp_replace(ptext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS scrub_md5
      |FROM p ORDER BY doc_id""".stripMargin

  /** t10 — corpus data card: ROLLUP over (source, lang) with doc counts,
    * token totals, and mean quality (t03's score, integer-quantized for an
    * order-independent cross-engine mean) — the per-slice summary a
    * training-data release documents. One shuffle (the rollup), partial
    * aggregation map-side.
    */
  private def t10(s: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    val ratio = size(array_distinct(ws)).cast("double") / size(ws)
    val quality = ratio * least(lit(1.0), size(ws).cast("double") / 50.0)
    Tables.documents(s, dir)
      .select(col("source"), col("lang"), size(ws).cast("long").as("n_toks"),
        round(quality * 1000000).cast("long").as("q6"))
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        (sum(col("q6")).cast("double") / count(lit(1)) / 1000000.0)
          .as("mean_quality_r6"),
        grouping(col("source")).cast("long").as("g_s"),
        grouping(col("lang")).cast("long").as("g_l"))
      .orderBy(col("g_s"), col("g_l"), col("source"), col("lang"))
  }

  private val t10Sql =
    """WITH w AS (SELECT source, lang,
      |  len(string_split(text, ' ')) AS n_toks,
      |  CAST(round(((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / len(string_split(text, ' ')))
      |      * least(CAST(1.0 AS DOUBLE),
      |              CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0))
      |    * 1000000) AS BIGINT) AS q6
      | FROM documents)
      |SELECT source, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(SUM(q6) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_quality_r6,
      |  CAST(GROUPING(source) AS BIGINT) AS g_s,
      |  CAST(GROUPING(lang) AS BIGINT) AS g_l
      |FROM w GROUP BY ROLLUP (source, lang)
      |ORDER BY g_s, g_l, source, lang""".stripMargin

  /** t11 — corpus vocabulary / heavy hitters: top-100 tokens by frequency
    * (count desc, token asc — a total order, so the limit is deterministic).
    * The vocabulary-building op of a tokenizer pipeline. Explode + one
    * map-side-combined count; the top-100 runs as TakeOrderedAndProject
    * over the aggregated vocab, not a global sort of the corpus.
    */
  private def t11(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(100)

  private val t11Sql =
    """SELECT tok, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 100""".stripMargin

  /** t12 — sequence packing: assign documents to fixed-token-budget
    * training batches by cumulative token offset within each (language,
    * shard) stream (batch = start_offset div budget — contiguous packing,
    * the deterministic approximation of greedy bin packing sequence-packers
    * use). The shard is a deterministic doc bucket (doc_id mod PackShards):
    * a real corpus is ~half one language, so a lang-only window would sort
    * half the corpus in ONE window partition at 100× — sharding bounds every
    * window partition to ~1/PackShards of its language while preserving the
    * contract (contiguous packing within a stream; a trainer consumes each
    * (lang, shard) stream independently). PackShards is the scale knob:
    * raise it with corpus size to keep partitions executor-sized.
    * Output is the per-batch manifest (docs, tokens, fill ratio).
    */
  private val PackShards = 8

  private def t12(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 512
    val ws = tokens(col("text"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), size(ws).cast("long").as("n_toks"))
      .withColumn("shard", pmod(col("doc_id"), lit(PackShards)).cast("long"))
      .withColumn("cum", sum(col("n_toks")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("batch_id", expr(s"(cum - n_toks) div $budget"))
      .groupBy(col("lang"), col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .select(col("lang"), col("shard"), col("batch_id"), col("n_docs"),
        col("n_tokens"), (col("n_tokens").cast("double") / budget).as("fill_ratio"))
      .orderBy(col("lang"), col("shard"), col("batch_id"))
  }

  private val t12Sql =
    s"""WITH d AS (SELECT doc_id, lang, doc_id % $PackShards AS shard,
      |  len(string_split(text, ' ')) AS n_toks FROM documents),
      |c AS (SELECT doc_id, lang, shard, n_toks,
      |  SUM(n_toks) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      | FROM d)
      |SELECT lang, CAST(shard AS BIGINT) AS shard,
      |  CAST((cum - n_toks) // 512 AS BIGINT) AS batch_id,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_toks) AS DOUBLE) / 512 AS fill_ratio
      |FROM c GROUP BY lang, shard, batch_id
      |ORDER BY lang, shard, batch_id""".stripMargin

  /** t13 — bigram fluency: score each document by the mean document
    * frequency of its distinct word bigrams — the integer-exact proxy for
    * the LM perplexity filter (CCNet-style) that avoids cross-engine
    * float-log drift: gibberish bigrams appear in one document, fluent ones
    * corpus-wide. Two shuffles: one map-side-combined df count over the
    * corpus, one join of per-doc bigrams against that table (both keyed on
    * the 8-byte ShingleHashes bigram hash, never strings). At lake scale
    * the LM side truncates to the top-K bigrams and broadcasts (the d09
    * shape); here it stays exact for the oracle.
    */
  private def t13(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleHashes
    val docs = Tables.documents(s, dir)
    val ws = tokens(col("text"))
    val grams = docs
      .select(col("doc_id"), explode(ShingleHashes(ws, 2)).as("g"))
    val lm = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(lm, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("df")).as("df_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("df_sum").cast("double") / col("n_bigrams")).as("mean_df"))
      .orderBy(col("doc_id"))
  }

  private val t13Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)),
      |    i -> CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15)) AS BIGINT)))) AS g
      | FROM w WHERE len(ws) >= 2),
      |lm AS (SELECT g, COUNT(*) AS df FROM g GROUP BY g)
      |SELECT g.doc_id,
      |  COUNT(*) AS n_bigrams,
      |  CAST(SUM(lm.df) AS DOUBLE) / COUNT(*) AS mean_df
      |FROM g JOIN lm ON g.g = lm.g
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** t14 — document chunking: overlapping 64-token windows at stride 48
    * (16-token overlap), the chunk-and-embed preprocessing of a retrieval/
    * embedding pipeline. One row per chunk with its offset, length, and a
    * content hash (md5 of the space-joined window — pins exact chunk
    * boundaries cross-engine). sequence+transform+explode: zero shuffle,
    * output scales with token count.
    */
  private def t14(s: SparkSession, dir: String): DataFrame = {
    val chunkLen = 64
    val stride = 48
    // ws materialized (multi-referenced alias survives CollapseProject):
    // the chunk lambda's slice reads the array per chunk instead of
    // re-running the tokenizer per chunk (the d26 trap)
    val ws = col("ws")
    val nChunks = floor((size(ws) - 1).cast("double") / stride).cast("int") + 1
    val chunk = (i: Column) => {
      val start = i * stride + 1
      val piece = slice(ws, start, lit(chunkLen))
      struct(i.cast("long").as("chunk_idx"),
        start.cast("long").as("start_tok"),
        size(piece).cast("long").as("n_toks"),
        md5(concat_ws(" ", piece)).as("chunk_md5"))
    }
    Tables.documents(s, dir)
      .withColumn("ws", tokens(col("text")))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), nChunks - 1), chunk)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.start_tok"),
        col("c.n_toks"), col("c.chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val t14Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |c AS (SELECT doc_id, ws,
      |  unnest(range(0, CAST(floor(CAST(len(ws) - 1 AS DOUBLE) / 48) AS BIGINT) + 1)) AS chunk_idx
      | FROM w)
      |SELECT doc_id,
      |  CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  CAST(chunk_idx * 48 + 1 AS BIGINT) AS start_tok,
      |  CAST(len(list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64)) AS BIGINT) AS n_toks,
      |  md5(array_to_string(list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** t15 — domain-mixture reweighting: per-source token shares and the
    * sampling weight that would rebalance the mixture to uniform across
    * sources (the DoReMi/data-mixing bookkeeping a pretraining pipeline
    * runs before sampling: weight = target_share / current_share). One
    * map-side-combined aggregation over the corpus (output = |sources| rows),
    * totals joined back as a broadcast of a single row. All ratios derive
    * from exact BIGINT token counts in one division each, so both engines
    * compute bit-identical doubles.
    */
  private def t15(s: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(s, dir)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot_tokens")).as("token_share"),
        (col("tot_tokens").cast("double") / (col("n_sources") * col("n_tokens")))
          .as("mix_weight"))
      .orderBy(col("source"))
  }

  private val t15Sql =
    """WITH d AS (SELECT source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks FROM documents),
      |s AS (SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM d GROUP BY source),
      |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
      |  COUNT(*) AS n_sources FROM s)
      |SELECT source, n_docs, n_tokens,
      |  CAST(n_tokens AS DOUBLE) / tot_tokens AS token_share,
      |  CAST(tot_tokens AS DOUBLE) / (n_sources * n_tokens) AS mix_weight
      |FROM s CROSS JOIN t ORDER BY source""".stripMargin

  /** t16 — fixed-quota stratified sample: exactly min(K, |stratum|) docs per
    * language, selected by smallest md5(doc_id) — the deterministic
    * "give me 20 spot-check docs per language" op. Complements t05 (RATE
    * sampling: output grows with corpus; quota sampling: output fixed).
    * Uses the partial-combinable TopKByScore aggregator, so the shuffle
    * carries ≤ K rows per (map partition × language) instead of sorting each
    * language's whole stratum in one window partition — the same 100×-skew
    * argument as t12's shards. The hash uses 13 hex digits (52 bits) so its
    * negation is exact in the aggregator's double score and ordering matches
    * the oracle's BIGINT sort bit-for-bit.
    */
  private def t16(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKByScore
    val quota = 20
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val topk = TopKByScore(quota)
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), (-h.cast("double")).as("score"))
      .groupBy(col("lang"))
      .agg(topk(col("doc_id"), col("score")).as("tk"))
      .select(col("lang"), posexplode(col("tk")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  private val t16Sql =
    """WITH h AS (SELECT lang, doc_id,
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS hv
      | FROM documents),
      |r AS (SELECT lang, doc_id,
      |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk FROM h)
      |SELECT lang, rk, doc_id FROM r WHERE rk <= 20
      |ORDER BY lang, rk""".stripMargin

  /** t17 — temperature-scaled sampling weights: the multilingual-LM mixing
    * op (XLM-R style): upsample low-resource languages by exponentiating the
    * empirical language distribution, here α = 0.5 so the exponential is
    * `sqrt` — exact (correctly rounded) in IEEE 754 on both engines. The
    * normalizing sum runs over 52-bit integer quantizations of the scaled
    * weights, so it is order-independent and the whole result is
    * bit-deterministic cross-engine (the same trick as t16's hash scores).
    * One hash agg over the corpus + a broadcast 1-row total; output = langs.
    */
  private def t17(s: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val withP = perLang
      .crossJoin(broadcast(perLang.agg(sum(col("n_docs")).as("n_total"))))
      .select(col("lang"), col("n_docs"),
        round(sqrt(col("n_docs").cast("double") / col("n_total")) * 1e9)
          .cast("long").as("sw"))
    withP
      .crossJoin(broadcast(withP.agg(sum(col("sw")).as("sw_total"))))
      .select(col("lang"), col("n_docs"),
        (col("sw").cast("double") / col("sw_total")).as("sample_weight"),
        round(lit(100000.0) * (col("sw").cast("double") / col("sw_total")))
          .cast("long").as("docs_at_100k"))
      .orderBy(col("lang"))
  }

  private val t17Sql =
    """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c),
      |w AS (SELECT lang, n_docs,
      |  CAST(round(sqrt(CAST(n_docs AS DOUBLE) / n_total) * 1e9) AS BIGINT) AS sw
      |  FROM c CROSS JOIN t),
      |wt AS (SELECT CAST(SUM(sw) AS BIGINT) AS sw_total FROM w)
      |SELECT lang, n_docs,
      |  CAST(sw AS DOUBLE) / sw_total AS sample_weight,
      |  CAST(round(100000.0 * (CAST(sw AS DOUBLE) / sw_total)) AS BIGINT) AS docs_at_100k
      |FROM w CROSS JOIN wt ORDER BY lang""".stripMargin

  /** t18 — training-shard assignment: deterministically hash-partition the
    * corpus into 64 output shards (the "write the training set as N files"
    * op) and report each shard's doc/token load. The content-stable md5
    * shard id reproduces on any engine and any cluster size — unlike a
    * round-robin or partition-index scheme — and the balance report is the
    * skew check a 100-TB shard-writer needs before committing output. Uses
    * 13 hex digits (52 bits, exact in a BIGINT) like t05/t16.
    */
  private def t18(s: SparkSession, dir: String): DataFrame = {
    val hv = conv(substring(md5(concat(lit("shard:"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    Tables.documents(s, dir)
      .select(pmod(hv, lit(64L)).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        max(col("n_toks")).as("max_doc_toks"))
      .orderBy(col("shard"))
  }

  private val t18Sql =
    """WITH d AS (SELECT
      |  CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) % 64 AS shard,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      | FROM documents)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(MAX(n_toks) AS BIGINT) AS max_doc_toks
      |FROM d GROUP BY shard ORDER BY shard""".stripMargin

  /** t19 — stable train/val/test split: assign each doc to a split by a
    * content-stable hash fraction (80/10/10) and report per-(split, lang)
    * doc/token loads. The hash-based assignment is THE reproducible-split
    * op: it never changes when the corpus is re-partitioned, re-ordered, or
    * incrementally extended (new docs land in splits at the target rates
    * without moving old ones) — unlike randomSplit, whose assignment depends
    * on partitioning. 13 hex digits (52 bits) are exact in a double, and the
    * divisor 2^52 is a power of two, so the fraction is an exact scaling —
    * bit-identical in any engine. One map-side-combined agg; output =
    * |splits × langs|.
    */
  private def t19(s: SparkSession, dir: String): DataFrame = {
    val hv = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    val frac = hv.cast("double") / lit(4503599627370496.0) // 2^52, exact
    val split = when(frac < 0.8, "train").when(frac < 0.9, "val")
      .otherwise(lit("test"))
    Tables.documents(s, dir)
      .select(split.as("split"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("split"), col("lang"))
  }

  private val t19Sql =
    """WITH d AS (SELECT lang,
      |  CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS frac,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      | FROM documents)
      |SELECT CASE WHEN frac < 0.8 THEN 'train' WHEN frac < 0.9 THEN 'val'
      |  ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      |FROM d GROUP BY split, lang ORDER BY split, lang""".stripMargin

  /** t20 — weighted priority sample: k docs sampled with probability
    * increasing in weight (here n_chars — "prefer longer docs"), via
    * Duffield–Lund–Thorup priority sampling (Priority sampling for
    * estimation of arbitrary subset sums, JACM 2007): priority = u/w with
    * u uniform from a content-stable hash; keep the k smallest (equivalent
    * to their w/u largest-k form). Deterministic and engine-portable where
    * A-ES's exp/log keys are not: u is a 52-bit hash (exact in a double),
    * w a small integer, and one IEEE division is correctly rounded — so
    * both engines compute bit-identical priorities. Plans as
    * TakeOrderedAndProject: per-partition top-k, no global sort, the
    * sample never exceeds k rows on the wire at any corpus size.
    */
  private def t20(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    val hv = conv(substring(md5(concat(lit("wsample:"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    // weight 0 is undefined in priority sampling (and a 0/0-adjacent NULL
    // priority would sort engine-dependently): zero-length docs are
    // ineligible, filtered identically in the SQL oracle
    Tables.documents(s, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (hv.cast("double") / col("n_chars").cast("double")).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  private val t20Sql =
    """SELECT doc_id, lang, n_chars,
      |  CAST(CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
      |FROM documents
      |WHERE n_chars > 0
      |ORDER BY priority, doc_id LIMIT 100""".stripMargin

  /** t21 — token-concentration scoring: Gini–Simpson collision mass and
    * top-token share per document, the unigram-distribution half of the
    * repetition family (t07 measures repeated 3-gram RUNS; this measures how
    * much of the doc one token — or the head of the distribution — owns,
    * the "page of 'cookie cookie cookie…'" filter corpus pipelines run
    * before training). simpson = P(two random tokens are equal) =
    * Σc(c−1)/(n(n−1)); top_share = max count / n.
    *
    * Zero shuffle: the token histogram never materializes — one fold over
    * the doc's SORTED token array carries (prev, run, max run, pair sum),
    * where extending a run from c−1 to c adds 2(c−1) to Σc(c−1). All-int
    * accumulation (order-free), one double division per output — bit-exact
    * cross-engine. Per-row cost is the array sort, the same bound as t07.
    */
  private def t21(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ws = tokens(col("text"))
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("maxc"), lit(0L).as("s2"))
    val folded = aggregate(array_sort(ws), zero,
      (acc, w) => {
        val run = when(acc.getField("prev") === w, acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("maxc"), run).as("maxc"),
          (acc.getField("s2") + lit(2L) * (run - 1)).as("s2"))
      })
    docs.filter(size(ws) >= 2)
      .select(col("doc_id"), size(ws).cast("long").as("n_tokens"),
        folded.getField("maxc").as("max_count"),
        folded.getField("s2").as("pair_sum"))
      .select(col("doc_id"), col("n_tokens"), col("max_count"),
        col("pair_sum"),
        (col("pair_sum").cast("double")
          / (col("n_tokens") * (col("n_tokens") - 1))).as("simpson"),
        (col("max_count").cast("double") / col("n_tokens")).as("top_share"))
      .orderBy(col("doc_id"))
  }

  private val t21Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
      |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
      |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |        CAST(MAX(c) AS BIGINT) AS max_count,
      |        CAST(SUM(c * (c - 1)) AS BIGINT) AS pair_sum
      |      FROM c GROUP BY doc_id)
      |SELECT doc_id, n_tokens, max_count, pair_sum,
      |  CAST(pair_sum AS DOUBLE) / (n_tokens * (n_tokens - 1)) AS simpson,
      |  CAST(max_count AS DOUBLE) / n_tokens AS top_share
      |FROM a WHERE n_tokens >= 2 ORDER BY doc_id""".stripMargin

  /** t22 — TF-IDF top terms: the 3 most characteristic tokens per document
    * by tf·(N/df) weight — the inverted-index statistic behind sparse
    * retrieval, keyword extraction, and topic labeling over a corpus. The
    * idf factor is the raw ratio N/df, not log(N/df): the classic log form
    * is NOT bit-reproducible across engines (libm log differs in the last
    * ulp), while tf·N/df is one exact integer product and one IEEE division
    * — identical everywhere, and rank-equivalent for any fixed tf.
    *
    * Scale shape: tf is the natural token-explode groupBy (the cost any
    * corpus tokenization pays); df reuses tf's output; the per-doc rank
    * window partitions by doc_id, whose group size is bounded by document
    * length — never by corpus size. N joins as a broadcast 1-row aggregate.
    */
  private def t22(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("tfidf"))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("tfidf"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("doc_id"), col("rk"))
  }

  private val t22Sql =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM t GROUP BY doc_id, tok),
      |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |sc AS (SELECT doc_id, tok, tf, df,
      |         CAST(tf * n_docs AS DOUBLE) / df AS tfidf
      |       FROM tf JOIN df USING (tok) CROSS JOIN n),
      |r AS (SELECT doc_id, tok, tf, df, tfidf,
      |        ROW_NUMBER() OVER (PARTITION BY doc_id
      |                           ORDER BY tfidf DESC, tok) AS rk
      |      FROM sc)
      |SELECT doc_id, tok, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** t23 — Gopher-style quality rules (Rae et al. 2021 §A1.1, re-expressed
    * for this corpus): per-document pass/fail flags for word count, mean
    * word length, type-token ratio, and stopword presence, plus the
    * composite keep decision. Every rule is integer arithmetic or a single
    * IEEE division compared to a constant — bit-deterministic cross-engine.
    * Pure per-row column expressions over one scan: zero shuffle, whole-
    * stage codegen end to end (the repetition/top-share rule lives in t21,
    * which needs the per-token groupBy these rules deliberately avoid).
    */
  private def t23(s: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    val n = size(ws).cast("long")
    val sumLen = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val nDistinct = size(array_distinct(ws)).cast("long")
    val nStop = size(filter(ws, w => w === "the" || w === "a")).cast("long")
    val meanLen = sumLen.cast("double") / n
    val ttr = nDistinct.cast("double") / n
    val okCount = (n >= 30) && (n <= 10000)
    val okLen = (meanLen >= 3.0) && (meanLen <= 10.0)
    val okTtr = ttr >= 0.2
    val okStop = nStop >= 2
    Tables.documents(s, dir).select(
      col("doc_id"), n.as("n_words"), meanLen.as("mean_word_len"),
      ttr.as("ttr"), nStop.as("n_stop"),
      okCount.cast("int").as("ok_count"), okLen.cast("int").as("ok_len"),
      okTtr.cast("int").as("ok_ttr"), okStop.cast("int").as("ok_stop"),
      (okCount && okLen && okTtr && okStop).cast("int").as("keep"))
      .orderBy(col("doc_id"))
  }

  private val t23Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |s AS (SELECT doc_id,
      |  CAST(len(ws) AS BIGINT) AS n_words,
      |  CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS sum_len,
      |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
      |  CAST(len(list_filter(ws, x -> x = 'the' OR x = 'a')) AS BIGINT) AS n_stop
      | FROM w),
      |f AS (SELECT doc_id, n_words,
      |  CAST(sum_len AS DOUBLE) / n_words AS mean_word_len,
      |  CAST(n_distinct AS DOUBLE) / n_words AS ttr, n_stop,
      |  CAST(n_words >= 30 AND n_words <= 10000 AS INT) AS ok_count,
      |  CAST(CAST(sum_len AS DOUBLE) / n_words >= 3.0
      |       AND CAST(sum_len AS DOUBLE) / n_words <= 10.0 AS INT) AS ok_len,
      |  CAST(CAST(n_distinct AS DOUBLE) / n_words >= 0.2 AS INT) AS ok_ttr,
      |  CAST(n_stop >= 2 AS INT) AS ok_stop
      | FROM s)
      |SELECT doc_id, n_words, mean_word_len, ttr, n_stop,
      |  ok_count, ok_len, ok_ttr, ok_stop,
      |  ok_count * ok_len * ok_ttr * ok_stop AS keep
      |FROM f ORDER BY doc_id""".stripMargin

  /** t24 — inter-document n-gram novelty: per document, how much of its
    * distinct 8-gram shingle set also appears in OTHER documents — Gopher's
    * "duplicate n-gram fraction" signal at the corpus level (t07/t21 measure
    * repetition WITHIN a doc; t24 measures it ACROSS docs, which is what
    * boilerplate and template spam actually look like). Reports the shingle
    * count, the shared-shingle count, and novelty = 1 − shared/total.
    *
    * Scale shape: the same machinery as t22's df side — per-row distinct
    * shingle hashes ([[ShingleHashes]], codegen, 8-byte keys) exploded into
    * a map-side-combined groupBy, joined back on the shingle hash. Both
    * shuffles carry (long, long) pairs, O(total shingles); no window, no
    * corpus-size-dependent group.
    */
  private def t24(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.ShingleHashes(tokens(col("text")), 8))
          .as("sng"))
    val df = sh.groupBy(col("sng")).agg(count(lit(1)).as("df"))
    sh.join(df, "sng")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (lit(1.0) - col("n_shared").cast("double") / col("n_shingles"))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  private val t24Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 6),
      |  i -> CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]), 1, 15)) AS BIGINT)))) AS sng
      | FROM w WHERE len(ws) >= 8),
      |df AS (SELECT sng, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY sng),
      |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      | FROM sh JOIN df USING (sng) GROUP BY doc_id)
      |SELECT doc_id, n_shingles, n_shared,
      |  CAST(1 AS DOUBLE) - CAST(n_shared AS DOUBLE) / n_shingles AS novelty
      |FROM a ORDER BY doc_id""".stripMargin

  /** t25 — hapax statistics: per document, the count of words occurring
    * exactly once (hapax legomena) and exactly twice (dis legomena) plus
    * their ratios — the vocabulary-burstiness signal that separates natural
    * prose (hapax-rich) from template/boilerplate text (hapax-poor) more
    * sharply than t23's type-token ratio, and the classical input to
    * Good–Turing mass estimates.
    *
    * Scale shape: explode → one map-side-combined (doc_id, word) count →
    * one map-side-combined per-doc aggregate; both shuffles are keyed by
    * doc-bounded groups, no window, no join.
    */
  private def t25(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("n_dis"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("n_dis"),
        (col("n_hapax").cast("double") / col("n_types")).as("hapax_ratio"),
        (col("n_hapax").cast("double") / col("n_tokens")).as("hapax_share"))
      .orderBy(col("doc_id"))

  private val t25Sql =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      | FROM documents),
      |c AS (SELECT doc_id, w, COUNT(*) AS cnt FROM w GROUP BY doc_id, w),
      |a AS (SELECT doc_id,
      |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
      | FROM c GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_types, n_hapax, n_dis,
      |  CAST(n_hapax AS DOUBLE) / n_types AS hapax_ratio,
      |  CAST(n_hapax AS DOUBLE) / n_tokens AS hapax_share
      |FROM a ORDER BY doc_id""".stripMargin

  /** Vocabulary head size the t27 regression fits over. */
  private val ZipfK = 50

  /** t27 — Zipf rank–frequency fit: rank the corpus vocabulary by
    * frequency, regress ln(freq) on ln(rank) over the top [[ZipfK]] terms,
    * and report slope / intercept / r² — the power-law health check of a
    * natural corpus (Zipf's law: slope ≈ −1; a synthetic or
    * boilerplate-heavy corpus bends it). Determinism: ln values are
    * quantized to 1e−6 integers, ALL regression sums are exact BIGINT
    * arithmetic (|n·Σxy| ≤ 50·50·5.5e13 ≈ 1.4e17 < 2⁶³), and the
    * slope/intercept/r² divisions are single shared double expressions.
    * The quantization scale cancels in the slope (both axes ×1e6).
    *
    * Scale shape: explode → one map-side-combined word count; the top-K
    * head is TakeOrderedAndProject (≤ K rows per partition on the wire);
    * the regression is a 1-group partial-combined aggregate over K rows.
    * No window over the vocabulary, no join.
    */
  private def t27(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val head = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(ZipfK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("w"))))
    val q = head.select(
      round(log(col("rk").cast("double")) * 1e6).cast("long").as("x"),
      round(log(col("cnt").cast("double")) * 1e6).cast("long").as("y"))
    val agg = q.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n")
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (n * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = num / dx
    val intercept = (col("sy").cast("double") / lit(1e6)
      - slope * (col("sx").cast("double") / lit(1e6))) / n.cast("double")
    agg.select(n.as("n_terms"), slope.as("slope"), intercept.as("intercept"),
        ((num / sqrt(dx)) * (num / sqrt(dx)) / dy).as("r2"))
      .orderBy(col("n_terms"))
  }

  private val t27Sql =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |c AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
       |h AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rk
       |      FROM c ORDER BY cnt DESC, w LIMIT $ZipfK),
       |q AS (SELECT CAST(round(ln(CAST(rk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
       |             CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS y
       |      FROM h),
       |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |  CAST(SUM(x * x) AS BIGINT) AS sxx,
       |  CAST(SUM(y * y) AS BIGINT) AS syy,
       |  CAST(SUM(x * y) AS BIGINT) AS sxy FROM q)
       |SELECT n AS n_terms,
       |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       |    AS slope,
       |  (CAST(sy AS DOUBLE) / 1e6
       |    - (CAST(n * sxy - sx * sy AS DOUBLE)
       |        / CAST(n * sxx - sx * sx AS DOUBLE))
       |      * (CAST(sx AS DOUBLE) / 1e6)) / CAST(n AS DOUBLE) AS intercept,
       |  (CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)))
       |    * (CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)))
       |    / CAST(n * syy - sy * sy AS DOUBLE) AS r2
       |FROM a ORDER BY n_terms""".stripMargin

  /** t28 — readability grades: Automated Readability Index and
    * Coleman–Liau per document, from the three exact counts every
    * syllable-free readability formula is built on — non-space characters,
    * whitespace tokens, sentence marks ([.!?], floor 1). Both grades are
    * single double expressions over exact integers, shared verbatim by
    * both engines; they bucket documents for curriculum/quality mixing
    * without a tokenizer or syllable model.
    *
    * Scale shape: pure per-row column expressions inside the scan — one
    * pass, no shuffle but the final tiny sort.
    */
  private def t28(s: SparkSession, dir: String): DataFrame = {
    val chars = length(regexp_replace(col("text"), "\\s+", "")).cast("long")
    val words = size(tokens(col("text"))).cast("long")
    val sents = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0))).cast("long"))
    val cw = col("n_chars_ns").cast("double") / col("n_words").cast("double")
    val ws = col("n_words").cast("double") / col("n_sents").cast("double")
    val ari = lit(4.71) * cw + lit(0.5) * ws - lit(21.43)
    val cli = (lit(0.0588) * (cw * lit(100.0))) -
      (lit(0.296) * (col("n_sents").cast("double") /
        col("n_words").cast("double") * lit(100.0))) - lit(15.8)
    Tables.documents(s, dir)
      .select(col("doc_id"), chars.as("n_chars_ns"), words.as("n_words"),
        sents.as("n_sents"))
      .select(col("doc_id"), col("n_chars_ns"), col("n_words"), col("n_sents"),
        ari.as("ari"), cli.as("cli"),
        ceil(ari).cast("long").as("ari_grade"))
      .orderBy(col("doc_id"))
  }

  private val t28Sql =
    """WITH c AS (SELECT doc_id,
      |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_chars_ns,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS BIGINT) AS n_sents
      | FROM documents)
      |SELECT doc_id, n_chars_ns, n_words, n_sents,
      |  4.71 * (CAST(n_chars_ns AS DOUBLE) / CAST(n_words AS DOUBLE))
      |    + 0.5 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
      |    - 21.43 AS ari,
      |  0.0588 * (CAST(n_chars_ns AS DOUBLE) / CAST(n_words AS DOUBLE) * 100.0)
      |    - 0.296 * (CAST(n_sents AS DOUBLE) / CAST(n_words AS DOUBLE) * 100.0)
      |    - 15.8 AS cli,
      |  CAST(ceil(4.71 * (CAST(n_chars_ns AS DOUBLE) / CAST(n_words AS DOUBLE))
      |    + 0.5 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
      |    - 21.43) AS BIGINT) AS ari_grade
      |FROM c ORDER BY doc_id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("t01_token_stats", t01, Some(t01Sql)),
    QueryDef("t02_lang_id", t02, Some(t02Sql)),
    QueryDef("t03_quality_score", t03, Some(t03Sql)),
    QueryDef("t04_fingerprint", t04, Some(t04Sql)),
    QueryDef("t05_stratified_sample", t05, Some(t05Sql)),
    QueryDef("t06_bpe_pieces", t06, Some(t06Sql)),
    QueryDef("t07_repetition", t07, Some(t07Sql)),
    QueryDef("t08_bpe_apply", t08, Some(t08Sql)),
    QueryDef("t09_pii_scrub", t09, Some(t09Sql)),
    QueryDef("t10_data_card", t10, Some(t10Sql)),
    QueryDef("t11_vocab_topk", t11, Some(t11Sql)),
    QueryDef("t12_seq_packing", t12, Some(t12Sql)),
    QueryDef("t13_bigram_fluency", t13, Some(t13Sql)),
    QueryDef("t14_chunking", t14, Some(t14Sql)),
    QueryDef("t15_domain_mix", t15, Some(t15Sql)),
    QueryDef("t16_quota_sample", t16, Some(t16Sql)),
    QueryDef("t17_temperature_mix", t17, Some(t17Sql)),
    QueryDef("t18_shard_assign", t18, Some(t18Sql)),
    QueryDef("t19_train_split", t19, Some(t19Sql)),
    QueryDef("t20_weighted_sample", t20, Some(t20Sql)),
    QueryDef("t21_token_concentration", t21, Some(t21Sql)),
    QueryDef("t22_tfidf_terms", t22, Some(t22Sql)),
    QueryDef("t23_quality_rules", t23, Some(t23Sql)),
    QueryDef("t24_ngram_novelty", t24, Some(t24Sql)),
    QueryDef("t25_hapax_stats", t25, Some(t25Sql)),
    QueryDef("t26_token_yield", t26, Some(t26Sql)),
    QueryDef("t27_zipf_fit", t27, Some(t27Sql)),
    QueryDef("t28_readability", t28, Some(t28Sql)),
    QueryDef("t29_rake_keywords", t29, Some(t29Sql)),
    QueryDef("t30_oov_rate", t30, Some(t30Sql)),
    QueryDef("t31_langid_confusion", t31, Some(t31Sql)),
    QueryDef("t32_pmi_collocations", t32, Some(t32Sql)),
    QueryDef("t33_token_entropy", t33, Some(t33Sql)),
    QueryDef("t34_chunk_dedup", t34, Some(t34Sql)),
    QueryDef("t35_bigram_xent", t35, Some(t35Sql)),
    QueryDef("t36_code_switch", t36, Some(t36Sql)),
    QueryDef("t37_tokenizer_fertility", t37, Some(t37Sql)),
    QueryDef("t38_vocab_coverage", t38, Some(t38Sql)),
    QueryDef("t39_dsir_weights", t39, Some(t39Sql)),
    QueryDef("t40_unimax_budget", t40, Some(t40Sql)),
    QueryDef("t41_budget_selection", t41, Some(t41Sql)),
    QueryDef("t42_bpe_learn", t42, Some(t42Sql)),
    QueryDef("t43_learned_fertility", t43, Some(t43Sql)),
    QueryDef("t44_unigram_learn", t44, Some(t44Sql)),
    QueryDef("t45_unigram_fertility", t45, Some(t45Sql)),
    QueryDef("t46_wordpiece_learn", t46, Some(t46Sql)),
    QueryDef("t47_wordpiece_fertility", t47, Some(t47Sql)))

  /** t41 — token-budget greedy data selection (the doc-level knapsack of
    * data-selection pipelines): spend a fixed token budget (half the
    * corpus) on the highest quality-density documents — density is
    * integer micro-TTR per token, `(1e6·n_distinct) div n_toks` — taking
    * the greedy prefix of the (density DESC, doc_id) order until the
    * budget would be exceeded, reported as a per-source rollup of what
    * made the cut.
    *
    * Scale shape — the global sort is REFUSED: a naive cumulative window
    * over (density DESC) sorts the whole corpus into one task. Instead
    * (a) one map pass computes densities, (b) a ≤978-row coarse-bucket
    * token-sum aggregate is collected (bounded like the IVF codebook
    * collects — bucket key = density div 1024, so the count is fixed by
    * the density RANGE, not the corpus), (c) the driver walks buckets
    * descending to find the single threshold bucket the budget crosses
    * inside, and (d) the recursion repeats ONE level inside that bucket:
    * a second ≤1024-row collect of per-EXACT-DENSITY token sums finds the
    * single crossing density value, every higher density is selected
    * wholesale, and only the one exact-dq tie class pays the cumulative
    * window (ordered by doc_id — dq is constant there). The selection is
    * bit-identical to the full-sort prefix (bucket key and dq are both
    * monotone prefixes of the (dq DESC, doc_id) sort order); the
    * unpartitioned frame is bounded by ONE density value's population —
    * ~1/10⁶ of the corpus in expectation, and adversarial mass would have
    * to concentrate on a single exact integer density to degrade it
    * (r15 VERDICT task 7; previously the whole ~1/10³ bucket paid it).
    */
  private def t41(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val ws = tokens(col("text"))
    val base = docs.select(col("doc_id"), col("source"),
        size(ws).cast("long").as("n_toks"),
        size(array_distinct(ws)).cast("long").as("n_distinct"))
      .filter(col("n_toks") > 0)
      .withColumn("dq", expr("(1000000 * n_distinct) div n_toks"))
      .withColumn("bk", expr("dq div 1024"))
      .localCheckpoint() // referenced by budget agg, bucket sums, selection
    // coalesce: sum over zero rows is NULL — an empty tokenized corpus
    // must degrade to empty output (budget 0 selects nothing), not NPE
    val budget = base.agg(coalesce(expr("sum(n_toks) div 2"), lit(0L)).as("b"))
      .collect()(0).getLong(0) // 1 row
    // bounded collect: density ≤ 1e6 → at most 978 bucket rows
    val buckets = base.groupBy(col("bk")).agg(sum(col("n_toks")).as("btoks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    var cum = 0L
    var threshold = Option.empty[Long]
    buckets.foreach { case (bk, toks) =>
      if (threshold.isEmpty) {
        if (cum + toks <= budget) cum += toks
        else threshold = Some(bk)
      }
    }
    val selected = threshold match {
      case None => base // the whole corpus fits the budget
      case Some(tb) =>
        val high = base.filter(col("bk") > tb)
        val tieAll = base.filter(col("bk") === tb)
        // level-2 recursion: exact-density sums within the crossing
        // bucket — bounded collect (a bucket spans ≤1024 integer dq
        // values), walked exactly like the bucket walk above
        val sub = tieAll.groupBy(col("dq")).agg(sum(col("n_toks")).as("stoks"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
        var cum2 = 0L
        var t2 = Option.empty[Long]
        sub.foreach { case (dq, toks) =>
          if (t2.isEmpty) {
            if (cum + cum2 + toks <= budget) cum2 += toks
            else t2 = Some(dq)
          }
        }
        val tie = t2 match {
          case None => tieAll // unreachable when the walk above crossed here
          case Some(dq2) =>
            val w = Window.orderBy(col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            tieAll.filter(col("dq") > dq2).unionByName(
              tieAll.filter(col("dq") === dq2)
                .withColumn("cum", sum(col("n_toks")).over(w))
                .filter(col("cum") + lit(cum + cum2) <= budget)
                .drop("cum"))
        }
        high.unionByName(tie)
    }
    selected.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("source"))
  }

  private val t41Sql =
    """WITH d AS (SELECT doc_id, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
      |  CAST((1000000 * len(list_distinct(string_split(text, ' '))))
      |    // len(string_split(text, ' ')) AS BIGINT) AS dq
      | FROM documents WHERE len(string_split(text, ' ')) > 0),
      |b AS (SELECT CAST(SUM(n_toks) // 2 AS BIGINT) AS budget FROM d),
      |r AS (SELECT *, SUM(n_toks) OVER (ORDER BY dq DESC, doc_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      |FROM r, b WHERE cum <= budget GROUP BY source ORDER BY source""".stripMargin

  /** Merge rounds t42 learns (and the oracle SQL unrolls). A real
    * tokenizer run raises this to ~32k–100k without changing the plan
    * shape — each extra round is one more in-memory pass over the capped
    * type table, never another corpus scan.
    */
  private val BpeLearnRounds = 8

  /** Frequency cap on the word-type table t42 fits from: the top
    * BpeTypeCap types by (frequency DESC, word) — the bounded collect
    * that makes the driver-side fit provably O(cap), independent of
    * corpus size (the same fixed-K pattern as the IVF/PQ codebooks).
    * Published trainers apply exactly this cutoff (min_frequency /
    * vocab pruning): sub-cap types are statistically irrelevant to the
    * first ~100k merges. 65536 ≫ any test corpus's type count.
    */
  private val BpeTypeCap = 65536

  /** t42 — distributed BPE vocabulary LEARNING (the tokenizer-training
    * loop itself — the piece t08/t37 consume a finished merge table
    * from): build the word-type frequency table in one corpus scan, then
    * run [[graft.operators.BpeLearn]]'s published Sennrich merge loop for
    * [[BpeLearnRounds]] rounds. Output is the learned merge table —
    * (rank, decoded surface string, pair count at selection) — i.e.
    * exactly the artifact a BpeApply vocabulary is.
    *
    * Word types are lowercase-alpha tokens (the deterministic,
    * engine-portable corpus normalization; also guarantees text can never
    * collide with the private-use placeholder plane the merge encoding
    * uses). The oracle replays the identical loop as [[BpeLearnRounds]]
    * unrolled CTE generations — same pair stats (2-gram substrings with
    * overlap), same (count DESC, gram ASC) winner rule, same
    * left-to-right `replace` merge — so the learned tables match
    * bit-for-bit. BpeLearnSpec pins the hand-traced Sennrich corpus and
    * the BpeApply round-trip of the learned vocabulary.
    *
    * Scale shape: ONE distributed corpus scan builds the word-type
    * counts (map-side-combined — types, not occurrences, leave the
    * mappers), one TakeOrderedAndProject collects the top-[[BpeTypeCap]]
    * types (bounded: ≤cap rows ever reach the driver, like the IVF/PQ
    * codebook collects), and the merge loop fits in memory
    * (BpeLearn.learnLocal — the model fit runs where the model lives;
    * the fully-distributed BpeLearn.learn remains for uncappable type
    * tables and is spec-pinned bit-identical). R rounds cost ZERO extra
    * Spark jobs — the 8-round distributed form spent ~190 ms/round on
    * pure job overhead over a 31-row type table.
    */
  /** The capped word-type collect t42/t43 fit from: top [[BpeTypeCap]]
    * lowercase-alpha types by (frequency DESC, word) — ≤cap rows ever
    * reach the driver.
    */
  private def bpeTypes(s: SparkSession, dir: String): Seq[(String, Long)] =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("w"))
      // \A..\z, not ^..$: Java's '$' also matches before a final line
      // terminator, so a token carrying a trailing newline would pass
      // '^[a-z]+$' here yet fail the oracle's regexp_full_match — \A/\z
      // make this a true full match (round-16 ADVICE).
      .filter(col("w").rlike("\\A[a-z]+\\z"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(BpeTypeCap) // bounded collect
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  private def t42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.BpeLearn.learnLocal(bpeTypes(s, dir), BpeLearnRounds)
      .map(m => (m.rank + 1L, m.decoded, m.count))
      .toDF("rk", "merged", "n_pairs")
      .orderBy(col("rk"))
  }

  /** t43 — tokenizer fertility under the LEARNED merge table: train the
    * BPE vocabulary on the corpus (t42's capped fit) and immediately
    * measure per-language fertility by applying it corpus-wide — the
    * train→apply composition a tokenizer pipeline actually runs (t37
    * measures the same statistic under the fixed demo vocabulary).
    * Applying the GRAM encodings in rank order through BpeApply IS the
    * faithful BPE encoder (placeholders line up with learning ranks —
    * BpeLearnSpec's round-trip pin), so `n_units` is the true BPE
    * sequence length under the learned tokenizer.
    *
    * Scale shape: the fit is one corpus scan + a bounded type collect
    * (see t42); the measurement is ONE more codegen corpus pass (the
    * 8-entry merge table ships inside the BpeApply expression) + a
    * ≤#languages-row rollup. The oracle replays the fit's unrolled CTE
    * chain and encodes with the same nested replaces.
    */
  private def t43(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BpeApply
    val vocab = graft.operators.BpeLearn
      .learnLocal(bpeTypes(s, dir), BpeLearnRounds).map(_.gram)
    Tables.documents(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("w"),
        BpeApply(col("text"), vocab).getItem(0).as("u"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("u")).as("n_units"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_units"),
        (col("n_units").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy(col("lang"))
  }

  private def bpePh(r: Int) = s"chr(${0xE000 + r})"

  /** The unrolled learning replay t42/t43 oracles share: word-type CTE +
    * one (pair stats, winner, merged generation, decoded) block per round.
    * Each generation's merge needle is COALESCEd to a never-occurring
    * private-use sentinel so a round past learning exhaustion (empty
    * m-CTE → NULL scalar subquery → replace() would NULL every encoding)
    * is a no-op, like the Scala path (round-16 ADVICE). A scalar
    * subquery, NOT `CASE WHEN EXISTS`: the uncorrelated scalar hoists to
    * a constant, while DuckDB evaluated the EXISTS per ROW — re-running
    * the m-aggregation for every type and cascading through all eight
    * generations (the first attempt wedged the sf0.001 check).
    */
  private def bpeLearnCtes: String = {
    val head =
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |w0 AS (SELECT w AS enc, CAST(COUNT(*) AS BIGINT) AS f FROM tok
         |  WHERE regexp_full_match(w, '[a-z]+') GROUP BY w
         |  ORDER BY f DESC, w LIMIT $BpeTypeCap)""".stripMargin
    val gens = (0 until BpeLearnRounds).map { r =>
      val dec = (0 until r).foldLeft("g")((acc, j) =>
        s"replace($acc, ${bpePh(j)}, (SELECT merged FROM d$j))")
      s""",
         |p$r AS (SELECT substr(enc, CAST(i AS INTEGER), 2) AS g, f FROM
         |  (SELECT enc, f, unnest(generate_series(1, length(enc) - 1)) AS i
         |   FROM w$r)),
         |m$r AS (SELECT g, CAST(SUM(f) AS BIGINT) AS cnt FROM p$r GROUP BY g
         |  ORDER BY cnt DESC, g LIMIT 1),
         |w${r + 1} AS (SELECT
         |  replace(enc, COALESCE((SELECT g FROM m$r), chr(${0xEFFF})), ${bpePh(r)}) AS enc, f
         |  FROM w$r),
         |d$r AS (SELECT $dec AS merged, cnt FROM m$r)""".stripMargin
    }.mkString
    head + gens
  }

  private def t42Sql: String = {
    val union = (0 until BpeLearnRounds).map(r =>
      s"SELECT CAST(${r + 1} AS BIGINT) AS rk, merged, cnt AS n_pairs FROM d$r")
      .mkString("\n UNION ALL ")
    s"$bpeLearnCtes\n$union\nORDER BY rk"
  }

  private def t43Sql: String = {
    // faithful BPE encode: the learned GRAMS (placeholder encodings, via
    // scalar subqueries on the m-CTEs) replace in rank order over the
    // raw text — identical left-to-right scan to BpeApply.compute. Each
    // needle is COALESCEd to a never-occurring private-use sentinel: if
    // learning exhausts before BpeLearnRounds (every type fully merged),
    // the empty m-CTE's scalar subquery would be NULL and replace()
    // would NULL the whole encoding, where BpeApply with the shorter
    // learned vocab degrades gracefully — with the sentinel needle an
    // exhausted round is a no-op replace (round-16 ADVICE; a CASE WHEN
    // EXISTS fold would duplicate the accumulator per round and grow the
    // expression 2^rounds). The sentinel lives in the same private-use
    // plane the placeholders do, so the no-text-collision assumption is
    // the one BpeApply already makes.
    val enc = (0 until BpeLearnRounds).foldLeft("text")((acc, r) =>
      s"replace($acc, COALESCE((SELECT g FROM m$r), chr(${0xEFFF})), ${bpePh(r)})")
    s"""$bpeLearnCtes,
       |m2x AS (SELECT lang,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
       |  CAST(length($enc) AS BIGINT) AS u FROM documents)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(w) AS BIGINT) AS n_words,
       |  CAST(SUM(u) AS BIGINT) AS n_units,
       |  CAST(SUM(u) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS fertility
       |FROM m2x GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Unigram-LM trainer knobs (t44/t45): seed keeps all single chars +
    * top-[[UnigramSeedCap]] multi-char substrings; [[UnigramEmRounds]]
    * hard-EM rounds; the prune keeps singles + top-[[UnigramTargetVocab]]
    * multis. A real SentencePiece run raises these (~1M seed, EM to
    * sub-1% likelihood delta, 32k target) without changing the plan
    * shape — the fit stays one bounded collect.
    */
  private val UnigramSeedCap = 512
  private val UnigramEmRounds = 3
  private val UnigramTargetVocab = 64

  private def unigramLearned =
    (types: Seq[(String, Long)]) => graft.operators.UnigramLearn
      .learnLocal(types, UnigramSeedCap, UnigramEmRounds, UnigramTargetVocab)

  /** t44 — unigram-LM (SentencePiece-style) vocabulary LEARNING: the
    * other canonical tokenizer trainer next to t42's BPE — seed
    * substring candidates over the capped word-type table, run
    * [[UnigramEmRounds]] deterministic hard-EM (Viterbi) rounds over
    * micro-nat piece costs, prune to singles + top-[[UnigramTargetVocab]]
    * (algorithm and determinism discipline in
    * [[graft.operators.UnigramLearn]]'s scaladoc). Output is the ranked
    * learned vocabulary with final expected counts.
    *
    * Scale shape: identical to t42 — ONE distributed corpus scan builds
    * the type table, one bounded top-cap collect (≤65536 rows) reaches
    * the driver, and the whole EM costs O(cap·16·4) per round with zero
    * further Spark jobs (the fully-distributed
    * [[graft.operators.UnigramLearn.learn]] remains for uncappable type
    * tables and is spec-pinned bit-identical, the t42 split). The
    * oracle replays the identical seed → EM →
    * prune pipeline as unrolled CTEs: the DP over word positions
    * unrolls to [[graft.operators.UnigramLearn.MaxWordLen]] generations
    * per round (types longer than that are excluded from the fit, both
    * engines alike) and the Viterbi backtrace to as many walk steps,
    * with ties pinned by the shared (cost, predecessor) rule.
    */
  private def t44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    unigramLearned(bpeTypes(s, dir))
      .map(p => (p.rank.toLong, p.piece, p.count))
      .toDF("rk", "piece", "n_uses")
      .orderBy(col("rk"))
  }

  /** The shared t44/t45 oracle replay: capped type table → substring
    * seed → [[UnigramEmRounds]] unrolled EM rounds (cost CTE, 16 DP
    * generations, 16 backtrace steps, usage rollup) → pruned vocab
    * `vf`. Every integer rule matches
    * [[graft.operators.UnigramLearn.learnLocal]] exactly: micro-nat
    * costs round(ln((total+V)/(cnt+1))·1e6), DP ties by (cost, j),
    * per-round counts frequency-weighted over the Viterbi path.
    */
  private def unigramCtes: String = {
    import graft.operators.UnigramLearn.{MaxPieceLen, MaxWordLen}
    val head =
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |w0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok
         |  WHERE regexp_full_match(w, '[a-z]+') GROUP BY w
         |  ORDER BY f DESC, w LIMIT $BpeTypeCap),
         |w0x AS (SELECT w, f FROM w0 WHERE length(w) <= $MaxWordLen),
         |sd AS (${(1 to MaxPieceLen).map(l =>
        s"""SELECT substr(w, CAST(i AS INTEGER), $l) AS p, f FROM
           |  (SELECT w, f, unnest(generate_series(1, length(w) - ${l - 1})) AS i
           |   FROM w0x)""".stripMargin).mkString("\n UNION ALL\n ")}),
         |c0 AS (SELECT p, CAST(SUM(f) AS BIGINT) AS cnt FROM sd GROUP BY p),
         |v1 AS (SELECT p, cnt FROM c0 WHERE length(p) = 1
         |  UNION ALL
         |  SELECT p, cnt FROM (SELECT p, cnt FROM c0 WHERE length(p) > 1
         |    ORDER BY cnt DESC, p LIMIT $UnigramSeedCap)),
         |vn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v1)""".stripMargin
    val rounds = (1 to UnigramEmRounds).map { r =>
      val dp = (1 to MaxWordLen).map { i =>
        val branches = (math.max(0, i - MaxPieceLen) until i).map { j =>
          s"""SELECT b.w, b.f, b.c + k.c AS c, $j AS j
             |      FROM b${r}_$j b JOIN k$r k ON k.p = substr(b.w, ${j + 1}, ${i - j})
             |      WHERE length(b.w) >= $i""".stripMargin
        }.mkString("\n      UNION ALL\n")
        s""",
           |b${r}_$i AS (SELECT w, f, c, j FROM (
           |  SELECT w, f, c, j, ROW_NUMBER() OVER (PARTITION BY w ORDER BY c, j) AS rn
           |  FROM (\n$branches)) WHERE rn = 1)""".stripMargin
      }.mkString
      val bAll = (1 to MaxWordLen).map(i =>
        s"SELECT w, f, c, j, $i AS i FROM b${r}_$i").mkString("\n  UNION ALL ")
      val walk = (1 to MaxWordLen).map { st =>
        s""",
           |t${r}_$st AS (SELECT t.w, t.f, B.j AS pos,
           |    substr(t.w, B.j + 1, t.pos - B.j) AS p
           |  FROM t${r}_${st - 1} t JOIN bb$r B ON B.w = t.w AND B.i = t.pos
           |  WHERE t.pos > 0)""".stripMargin
      }.mkString
      val uses = (1 to MaxWordLen).map(st =>
        s"SELECT p, f FROM t${r}_$st").mkString("\n  UNION ALL ")
      s""",
         |k$r AS (SELECT p, CAST(round(ln(
         |    CAST((SELECT SUM(cnt) FROM v$r) + (SELECT n FROM vn) AS DOUBLE) /
         |    CAST(cnt + 1 AS DOUBLE)) * 1e6) AS BIGINT) AS c FROM v$r),
         |b${r}_0 AS (SELECT w, f, CAST(0 AS BIGINT) AS c, 0 AS j FROM w0x)$dp,
         |bb$r AS ($bAll),
         |t${r}_0 AS (SELECT w, f, CAST(length(w) AS INTEGER) AS pos FROM w0x)$walk,
         |u$r AS (SELECT p, CAST(SUM(f) AS BIGINT) AS cnt FROM (
         |  $uses) GROUP BY p),
         |v${r + 1} AS (SELECT v.p, COALESCE(u.cnt, CAST(0 AS BIGINT)) AS cnt
         |  FROM v$r v LEFT JOIN u$r u ON u.p = v.p)""".stripMargin
    }.mkString
    val vNext = UnigramEmRounds + 1
    val prune =
      s""",
         |vf AS (SELECT p, cnt FROM v$vNext WHERE length(p) = 1
         |  UNION ALL
         |  SELECT p, cnt FROM (SELECT p, cnt FROM v$vNext WHERE length(p) > 1
         |    ORDER BY cnt DESC, p LIMIT $UnigramTargetVocab))""".stripMargin
    head + rounds + prune
  }

  /** Force every CTE in the unigram replay MATERIALIZED: DuckDB inlines
    * plain CTEs, and the DP generations reference their 4 predecessors
    * each — inlined, that's an exponential plan (and one parquet open
    * per copy: the sf0.01 check died on "Too many open files" before
    * this). The chain is linear once materialized. Safe textually: in
    * the generated SQL, `name AS (` only ever introduces a CTE (column
    * aliases never precede a parenthesis).
    */
  private def materializedCtes(sql: String): String =
    sql.replaceAll("([A-Za-z0-9_]+) AS \\(", "$1 AS MATERIALIZED (")

  private def t44Sql: String = materializedCtes(
    s"""$unigramCtes
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, p) AS BIGINT) AS rk,
       |  p AS piece, cnt AS n_uses
       |FROM vf ORDER BY rk""".stripMargin)

  /** t45 — per-language fertility under the LEARNED unigram tokenizer:
    * t44's train step composed with a corpus-wide measurement, the
    * unigram counterpart of t43's BPE train→apply. The apply side needs
    * NO new kernel: the segmenter's unit counts are a ≤cap-row
    * word → n_pieces map (Viterbi lengths under the pruned vocabulary's
    * re-smoothed costs, per-character fallback past the caps), so the
    * measurement is one corpus scan with a BROADCAST map join and a
    * ≤#languages rollup — at 100 TB the map is still one driver-side
    * fit and one broadcast. The oracle replays the same final-cost DP
    * and joins the identical map.
    */
  private def t45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = bpeTypes(s, dir)
    val seg = graft.operators.UnigramLearn
      .segmentLengths(types, unigramLearned(types))
    val segDf = broadcast(seg.toSeq.toDF("sw", "su"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("w"),
        explode(tokens(col("text"))).as("tok"))
      .join(segDf, col("tok") === col("sw"), "left")
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(sum(coalesce(col("su").cast("long"),
        length(col("tok")).cast("long"))).as("u"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("u")).as("n_units"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_units"),
        (col("n_units").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy(col("lang"))
  }

  private def t45Sql: String = {
    import graft.operators.UnigramLearn.{MaxPieceLen, MaxWordLen}
    // final-cost DP (g_*) + backtrace step count (y_*) over the pruned
    // vocabulary — the segmenter the measurement applies
    val dp = (1 to MaxWordLen).map { i =>
      val branches = (math.max(0, i - MaxPieceLen) until i).map { j =>
        s"""SELECT b.w, b.c + k.c AS c, $j AS j
           |      FROM g_$j b JOIN kf k ON k.p = substr(b.w, ${j + 1}, ${i - j})
           |      WHERE length(b.w) >= $i""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s""",
         |g_$i AS (SELECT w, c, j FROM (
         |  SELECT w, c, j, ROW_NUMBER() OVER (PARTITION BY w ORDER BY c, j) AS rn
         |  FROM (\n$branches)) WHERE rn = 1)""".stripMargin
    }.mkString
    val gAll = (1 to MaxWordLen).map(i =>
      s"SELECT w, j, $i AS i FROM g_$i").mkString("\n  UNION ALL ")
    val walk = (1 to MaxWordLen).map { st =>
      s""",
         |y_$st AS (SELECT y.w, G.j AS pos, y.np + 1 AS np
         |  FROM y_${st - 1} y JOIN gg G ON G.w = y.w AND G.i = y.pos
         |  WHERE y.pos > 0)""".stripMargin
    }.mkString
    val yAll = (0 to MaxWordLen).map(st =>
      s"SELECT w, pos, np FROM y_$st").mkString("\n  UNION ALL ")
    materializedCtes(s"""$unigramCtes,
       |kf AS (SELECT p, CAST(round(ln(
       |    CAST((SELECT SUM(cnt) FROM vf) + (SELECT COUNT(*) FROM vf) AS DOUBLE) /
       |    CAST(cnt + 1 AS DOUBLE)) * 1e6) AS BIGINT) AS c FROM vf),
       |g_0 AS (SELECT w, CAST(0 AS BIGINT) AS c, 0 AS j FROM w0x)$dp,
       |gg AS ($gAll),
       |y_0 AS (SELECT w, CAST(length(w) AS INTEGER) AS pos, 0 AS np FROM w0x)$walk,
       |segmap AS (SELECT w, CAST(np AS BIGINT) AS su FROM ($yAll)
       |  WHERE pos = 0),
       |m AS (SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wcnt,
       |    unnest(string_split(text, ' ')) AS tk
       |  FROM documents),
       |du AS (SELECT doc_id, lang, wcnt,
       |    CAST(SUM(COALESCE(sm.su, length(m.tk))) AS BIGINT) AS u
       |  FROM m LEFT JOIN segmap sm ON sm.w = m.tk
       |  GROUP BY doc_id, lang, wcnt)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(wcnt) AS BIGINT) AS n_words,
       |  CAST(SUM(u) AS BIGINT) AS n_units,
       |  CAST(SUM(u) AS DOUBLE) / CAST(SUM(wcnt) AS DOUBLE) AS fertility
       |FROM du GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** WordPiece merge rounds (t46/t47) — the same knob class as
    * [[BpeLearnRounds]]; a real run raises it without changing the plan.
    */
  private val WordPieceRounds = 8

  /** t46 — WordPiece vocabulary LEARNING (the BERT trainer — the third
    * canonical tokenizer trainer, completing the triad next to t42's
    * BPE and t44's unigram-LM): the BPE merge loop with the
    * likelihood-gain winner rule score(a,b) = count(ab) /
    * (count(a)·count(b)), compared as the exact integer-quantized
    * scoreQ = floor(count(ab)·10¹⁵ / (count(a)·count(b))) with ties by
    * gram — algorithm, determinism discipline and the BPE-vs-WordPiece
    * divergence argument in [[graft.operators.WordPieceLearn]]'s
    * scaladoc. Output is the learned merge table with pair counts and
    * quantized scores at selection time.
    *
    * Scale shape: identical to t42 — one distributed corpus scan, one
    * bounded top-[[BpeTypeCap]] type collect, driver-side fit (the
    * alphabet-bounded distributed twin
    * [[graft.operators.WordPieceLearn.learn]] is spec-pinned
    * bit-identical). The oracle replays the identical rounds as
    * unrolled CTEs — same overlap pair stats, same per-symbol stats,
    * the same HUGEINT floor-division score, same exhaustion no-op
    * guard as t42/t43's.
    */
  private def t46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.WordPieceLearn
      .learnLocal(bpeTypes(s, dir), WordPieceRounds)
      .map(m => (m.rank + 1L, m.decoded, m.count, m.scoreQ))
      .toDF("rk", "merged", "n_pairs", "score_q")
      .orderBy(col("rk"))
  }

  /** The unrolled WordPiece replay t46/t47 oracles share: the t42 CTE
    * skeleton plus a per-round symbol-count CTE and the quantized-score
    * winner (HUGEINT multiply + floor division — exactly
    * [[graft.operators.WordPieceLearn]]'s BigInt arithmetic). Unlike
    * bpeLearnCtes, each generation w$r is referenced THREE times (pair
    * stats, symbol stats, next generation), so the caller must wrap
    * with [[materializedCtes]] — inlined, the chain would go 3^rounds.
    */
  private def wpLearnCtes: String = {
    val head =
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |w0 AS (SELECT w AS enc, CAST(COUNT(*) AS BIGINT) AS f FROM tok
         |  WHERE regexp_full_match(w, '[a-z]+') GROUP BY w
         |  ORDER BY f DESC, w LIMIT $BpeTypeCap)""".stripMargin
    val gens = (0 until WordPieceRounds).map { r =>
      val dec = (0 until r).foldLeft("g")((acc, j) =>
        s"replace($acc, ${bpePh(j)}, (SELECT merged FROM d$j))")
      s""",
         |p$r AS (SELECT g, CAST(SUM(f) AS BIGINT) AS cnt FROM
         |  (SELECT substr(enc, CAST(i AS INTEGER), 2) AS g, f FROM
         |    (SELECT enc, f, unnest(generate_series(1, length(enc) - 1)) AS i
         |     FROM w$r)) GROUP BY g),
         |s$r AS (SELECT sym, CAST(SUM(f) AS BIGINT) AS cnt FROM
         |  (SELECT substr(enc, CAST(i AS INTEGER), 1) AS sym, f FROM
         |    (SELECT enc, f, unnest(generate_series(1, length(enc))) AS i
         |     FROM w$r)) GROUP BY sym),
         |m$r AS (SELECT g, cnt,
         |    CAST((CAST(cnt AS HUGEINT) * 1000000000000000) //
         |      (CAST(sa AS HUGEINT) * CAST(sb AS HUGEINT)) AS BIGINT) AS sq
         |  FROM (SELECT p.g AS g, p.cnt AS cnt, sa.cnt AS sa, sb.cnt AS sb
         |    FROM p$r p
         |    JOIN s$r sa ON sa.sym = substr(p.g, 1, 1)
         |    JOIN s$r sb ON sb.sym = substr(p.g, 2, 1))
         |  ORDER BY sq DESC, g LIMIT 1),
         |w${r + 1} AS (SELECT
         |  replace(enc, COALESCE((SELECT g FROM m$r), chr(${0xEFFF})), ${bpePh(r)}) AS enc, f
         |  FROM w$r),
         |d$r AS (SELECT $dec AS merged, cnt, sq FROM m$r)""".stripMargin
    }.mkString
    head + gens
  }

  private def t46Sql: String = {
    val union = (0 until WordPieceRounds).map(r =>
      s"SELECT CAST(${r + 1} AS BIGINT) AS rk, merged, cnt AS n_pairs, sq AS score_q FROM d$r")
      .mkString("\n UNION ALL ")
    materializedCtes(s"$wpLearnCtes\n$union\nORDER BY rk")
  }

  /** t47 — per-language fertility under the LEARNED WordPiece table:
    * t46's train step composed with the corpus-wide measurement,
    * completing the trainer-triad fertility row (t43 = BPE,
    * t45 = unigram-LM, t47 = WordPiece). The apply side is BpeApply
    * over the learned grams in rank order — the merge-replay encoder
    * (BERT's runtime greedy longest-match encoder is the
    * deployment-time variant; see WordPieceLearn's scaladoc). Scale
    * shape identical to t43: fit = one corpus scan + bounded collect,
    * measurement = one more codegen corpus pass + a ≤#languages rollup.
    */
  private def t47(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BpeApply
    val vocab = graft.operators.WordPieceLearn
      .learnLocal(bpeTypes(s, dir), WordPieceRounds).map(_.gram)
    Tables.documents(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("w"),
        BpeApply(col("text"), vocab).getItem(0).as("u"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("u")).as("n_units"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_units"),
        (col("n_units").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy(col("lang"))
  }

  private def t47Sql: String = {
    // the same rank-ordered replace encode as t43Sql, needles from the
    // WordPiece m-CTEs, same exhaustion sentinel no-op
    val enc = (0 until WordPieceRounds).foldLeft("text")((acc, r) =>
      s"replace($acc, COALESCE((SELECT g FROM m$r), chr(${0xEFFF})), ${bpePh(r)})")
    materializedCtes(s"""$wpLearnCtes,
       |m2x AS (SELECT lang,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
       |  CAST(length($enc) AS BIGINT) AS u FROM documents)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(w) AS BIGINT) AS n_words,
       |  CAST(SUM(u) AS BIGINT) AS n_units,
       |  CAST(SUM(u) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS fertility
       |FROM m2x GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** t37 — tokenizer fertility per language: encoded units per word
    * through the real rank-ordered BPE (t08's BpeApply), aggregated by
    * language. THE tokenizer-equity number: a language with 2× fertility
    * pays 2× the sequence length (and compute, and context budget) per
    * word, which is exactly what multilingual data mixes (t15/t17) are
    * balanced against. Per-doc encoding is the native codegen expression;
    * the rollup is one 5-row keyed agg.
    */
  private def t37(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BpeApply
    Tables.documents(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("w"),
        BpeApply(col("text")).getItem(0).as("u"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("u")).as("n_units"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_units"),
        (col("n_units").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy(col("lang"))
  }

  private val t37Sql: String = {
    import graft.functions.BpeApply
    val enc = BpeApply.Vocab.zipWithIndex.foldLeft("text") {
      case (acc, (tok, i)) => s"replace($acc, '$tok', chr(${0xE000 + i}))"
    }
    s"""WITH m AS (SELECT lang,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
       |  CAST(length($enc) AS BIGINT) AS u FROM documents)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(w) AS BIGINT) AS n_words,
       |  CAST(SUM(u) AS BIGINT) AS n_units,
       |  CAST(SUM(u) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS fertility
       |FROM m GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** t36 — code-switch / mixed-language detection: run t02's language ID
    * on the whole doc AND on each half independently; halves that disagree
    * flag a document whose language changes mid-stream (concatenated
    * scrapes, boilerplate in a second language, template + content
    * mismatch). Whole-doc argmax language ID structurally CANNOT see this
    * — the majority half always wins — which is why curation pipelines
    * run segment-level language ID before routing documents to
    * language-specific filters.
    *
    * Scale shape: pure per-row column expressions (slice, intersect
    * against 5-token literal profiles) — one scan, zero shuffle before
    * the output sort.
    */
  private def t36(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ws = tokens(col("text"))
    val h = (size(ws).cast("double") / 2).cast("int")
    val head = concat_ws(" ", slice(ws, lit(1), h))
    val tail = concat_ws(" ", slice(ws, h + 1, size(ws) - h))
    docs.select(col("doc_id"), col("lang"),
        langId(col("text")).as("lang_all"),
        langId(head).as("lang_head"),
        langId(tail).as("lang_tail"))
      .withColumn("code_switched", col("lang_head") =!= col("lang_tail"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB rendering of langId over an arbitrary SQL string expression —
    * the same first-listed-wins argmax as TextFunctions.langId.
    */
  private def langPredSql(e: String): String = {
    val scores = LangProfiles.map { case (lang, prof) =>
      lang -> (s"len(list_intersect(list_distinct(string_split($e, ' ')), " +
        s"[${prof.map("'" + _ + "'").mkString(",")}]))")
    }
    val g = s"greatest(${scores.map(_._2).mkString(", ")})"
    "CASE " + scores.map { case (l, sc) =>
      s"WHEN $sc > 0 AND $sc = $g THEN '$l'"
    }.mkString(" ") + " ELSE 'und' END"
  }

  private def t36Sql: String =
    s"""WITH w AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws
       |  FROM documents),
       |h AS (SELECT doc_id, lang, text,
       |  array_to_string(ws[1:(len(ws) // 2)], ' ') AS head,
       |  array_to_string(ws[(len(ws) // 2 + 1):len(ws)], ' ') AS tail
       | FROM w)
       |SELECT doc_id, lang,
       |  ${langPredSql("text")} AS lang_all,
       |  ${langPredSql("head")} AS lang_head,
       |  ${langPredSql("tail")} AS lang_tail,
       |  ${langPredSql("head")} <> ${langPredSql("tail")} AS code_switched
       |FROM h ORDER BY doc_id""".stripMargin

  /** t34 chunk width in tokens (non-overlapping). */
  private val ChunkC = 8

  /** t34 — INTRA-document span dedup: split each document into
    * non-overlapping [[ChunkC]]-token chunks, drop exact repeats of an
    * earlier chunk, and report the token yield. The sub-document
    * granularity the d-family's whole-doc operators never touch: a page
    * whose body repeats a navigation block survives whole-doc dedup
    * (unique overall) but still feeds the trainer the same span dozens of
    * times — this measures exactly that redundancy (the within-doc
    * companion of t07's character-run repetition view).
    *
    * Scale shape: pure per-row array expressions (chunking, distinct,
    * token re-count) inside whole-stage codegen — no shuffle, no explode;
    * the corpus streams through at parquet-read speed.
    */
  private def t34(s: SparkSession, dir: String): DataFrame = {
    // ws/chunks/uniq are NAMED multi-referenced columns (kept materialized
    // by CollapseProject): the chunk lambda's slice reads the token array
    // instead of re-running the tokenizer per chunk (the d26 trap), and
    // the distinct/size/fold consumers share one chunks array per row
    val ws = col("ws")
    val m = size(ws)
    val nc = expr(s"CAST(ceil(size(split(text, ' ')) / ${ChunkC}.0) AS INT)")
    val uniq = col("uniq")
    val tokensOut = aggregate(uniq, lit(0L),
      (acc, c) => acc + size(split(c, " ")))
    Tables.documents(s, dir)
      .withColumn("ws", tokens(col("text")))
      .withColumn("chunks", transform(sequence(lit(0), nc - 1),
        k => concat_ws(" ", slice(ws, (k * ChunkC + 1).cast("int"), lit(ChunkC)))))
      .withColumn("uniq", array_distinct(col("chunks")))
      .select(
        col("doc_id"), m.cast("long").as("n_tokens"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(uniq).cast("long").as("n_unique"),
        tokensOut.as("tokens_out"),
        (tokensOut.cast("double") / m.cast("double")).as("yield_ratio"))
      .orderBy(col("doc_id"))
  }

  private val t34Sql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |c AS (SELECT doc_id, len(ws) AS m,
       |  list_transform(range(0, CAST(ceil(len(ws) / ${ChunkC}.0) AS BIGINT)),
       |    k -> array_to_string(ws[(k * $ChunkC + 1):(k * $ChunkC + $ChunkC)],
       |      ' ')) AS chunks
       | FROM w),
       |u AS (SELECT doc_id, m, chunks, list_distinct(chunks) AS uniq FROM c),
       |t AS (SELECT doc_id, m, chunks, uniq,
       |  CAST(list_sum(list_transform(uniq,
       |    x -> len(string_split(x, ' ')))) AS BIGINT) AS tokens_out
       | FROM u)
       |SELECT doc_id, CAST(m AS BIGINT) AS n_tokens,
       |  CAST(len(chunks) AS BIGINT) AS n_chunks,
       |  CAST(len(uniq) AS BIGINT) AS n_unique, tokens_out,
       |  CAST(tokens_out AS DOUBLE) / CAST(m AS DOUBLE) AS yield_ratio
       |FROM t ORDER BY doc_id""".stripMargin

  /** t35 — bigram language-model cross-entropy scoring: the perplexity
    * filter (CCNet / Gopher lineage — score text under a small LM trained
    * on trusted data; high cross-entropy flags gibberish, boilerplate, and
    * out-of-domain text). The model is an add-one-smoothed token bigram LM
    * trained on t19's content-stable train split (hash-fraction < 0.8);
    * every held-out doc is scored by its mean negative log-probability.
    * Each bigram's ln p(w2|w1) = ln((c(w1,w2)+1)/(c(w1·)+V)) is quantized
    * to integer micro-nats BEFORE summation (t33's discipline: float-sum
    * order never matters), so the cross-engine hash is exact; the headline
    * xent_nats derives from two exact integers. All lp terms are strictly
    * negative (numerator < denominator always), so no −0.0 hazard.
    *
    * Scale shape: model tables are vocabulary-sized map-side-combined aggs
    * over the train corpus (context counts derive from the bigram table —
    * one explode, not two); scoring is two keyed equi-joins against those
    * tables (build sides grow with vocabulary, not corpus) plus one
    * doc-keyed agg. The broadcast is a single 1-row vocab count.
    */
  private def t35(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val hv = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    val frac = hv.cast("double") / lit(4503599627370496.0) // 2^52, exact
    val ws = tokens(col("text"))
    // sequence(1, size-1) counts DOWN for single-token docs (the
    // wordShingles guard's lesson) — only ever build bigrams after the
    // size >= 2 filter, mirroring the oracle's len(ws) >= 2
    def bigramsOf(c: Column): Column =
      transform(sequence(lit(1), size(c) - 1), i =>
        struct(element_at(c, i.cast("int")).as("w1"),
          element_at(c, (i + 1).cast("int")).as("w2")))
    val base = docs.select(col("doc_id"), frac.as("frac"), ws.as("ws"))
    val train = base.filter(col("frac") < 0.8)
    val bg = train.filter(size(col("ws")) >= 2)
      .select(explode(bigramsOf(col("ws"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cxy"))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("cxy")).as("cw"))
    val vocab = train.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    base.filter(col("frac") >= 0.8 && size(col("ws")) >= 2)
      .select(col("doc_id"), explode(bigramsOf(col("ws"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(bg, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("cxy"), lit(0L)) + 1).cast("double") /
          (coalesce(col("cw"), lit(0L)) + col("v")).cast("double")) * 1e6)
          .cast("long").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("total_micronats"))
      .select(col("doc_id"), col("n_bigrams"), col("total_micronats"),
        (-col("total_micronats").cast("double") /
          (col("n_bigrams").cast("double") * 1e6)).as("xent_nats"))
      .orderBy(col("doc_id"))
  }

  private val t35Sql =
    """WITH d AS (SELECT doc_id,
      |  CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS frac,
      |  string_split(text, ' ') AS ws FROM documents),
      |bg AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS cxy
      |  FROM (SELECT unnest(list_transform(range(1, len(ws)),
      |      i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
      |    FROM d WHERE frac < 0.8 AND len(ws) >= 2)
      |  GROUP BY b.w1, b.w2),
      |ctx AS (SELECT w1, CAST(SUM(cxy) AS BIGINT) AS cw FROM bg GROUP BY w1),
      |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
      |    SELECT unnest(ws) AS w FROM d WHERE frac < 0.8)),
      |sc AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
      |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |      i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS b
      |    FROM d WHERE frac >= 0.8 AND len(ws) >= 2)),
      |lp AS (SELECT sc.doc_id,
      |    CAST(round(ln(CAST(COALESCE(bg.cxy, 0) + 1 AS DOUBLE) /
      |      CAST(COALESCE(ctx.cw, 0) + v.v AS DOUBLE)) * 1e6) AS BIGINT) AS lp
      |  FROM sc LEFT JOIN bg ON sc.w1 = bg.w1 AND sc.w2 = bg.w2
      |  LEFT JOIN ctx ON sc.w1 = ctx.w1, v)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(lp) AS BIGINT) AS total_micronats,
      |  -CAST(SUM(lp) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e6)
      |    AS xent_nats
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** t32 minimum bigram count (PMI over rare bigrams is noise). */
  private val PmiMinCount = 5

  /** t32 — collocation mining by pointwise mutual information: the top-20
    * adjacent-word bigrams whose corpus-wide co-occurrence most exceeds
    * the independence expectation. Reported as the PMI RATIO
    * p(x,y)/(p(x)p(y)) = (c_xy/T)·(N/c_x)·(N/c_y) rather than its log —
    * the same ranking (log is monotone) without a transcendental in the
    * cross-engine hash. The curation use: top collocations expose templated
    * boilerplate ("click here", "all rights") that per-doc dedup misses.
    *
    * Scale shape: positional bigram extraction is a per-row array
    * expression; both count tables are map-side-combined aggregates keyed
    * by word; the bigram→unigram joins are keyed equi-joins (vocab-sized,
    * not corpus-sized); totals are one-row broadcasts. Top-20 is
    * TakeOrderedAndProject.
    */
  private def t32(s: SparkSession, dir: String): DataFrame = {
    // ws materialized (multi-referenced alias survives CollapseProject) so
    // the bigram lambda's element_at hits the array, not a re-run of the
    // tokenizer per position (the d26 trap)
    val docs = Tables.documents(s, dir)
      .withColumn("ws", tokens(col("text")))
    val ws = col("ws")
    val bigrams = when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1), i =>
          struct(element_at(ws, i.cast("int")).as("w1"),
            element_at(ws, (i + 1).cast("int")).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bg = docs.select(explode(bigrams).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= PmiMinCount)
    val ug = docs.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = docs.select(
      sum(size(ws)).cast("long").as("n_tok"),
      sum(greatest(size(ws) - 1, lit(0))).cast("long").as("n_big"))
    bg.join(ug.as("u1"), col("w1") === col("u1.w"))
      .join(ug.as("u2"), col("w2") === col("u2.w"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"),
        ((col("c_xy").cast("double") * col("n_tok").cast("double") *
          col("n_tok").cast("double")) /
          (col("n_big").cast("double") * col("u1.c").cast("double") *
            col("u2.c").cast("double"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(20)
  }

  private val t32Sql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |bg AS (SELECT b.w1, b.w2, CAST(COUNT(*) AS BIGINT) AS c_xy FROM (
       |    SELECT unnest(list_transform(range(1, len(ws)),
       |      i -> {'w1': ws[i], 'w2': ws[i+1]})) AS b
       |    FROM w WHERE len(ws) >= 2) GROUP BY b.w1, b.w2
       |  HAVING COUNT(*) >= $PmiMinCount),
       |ug AS (SELECT w AS tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(ws) AS w FROM w) GROUP BY w),
       |t AS (SELECT CAST(SUM(len(ws)) AS BIGINT) AS n_tok,
       |  CAST(SUM(greatest(len(ws) - 1, 0)) AS BIGINT) AS n_big FROM w)
       |SELECT bg.w1, bg.w2, bg.c_xy,
       |  (CAST(bg.c_xy AS DOUBLE) * CAST(t.n_tok AS DOUBLE) *
       |    CAST(t.n_tok AS DOUBLE)) /
       |  (CAST(t.n_big AS DOUBLE) * CAST(u1.c AS DOUBLE) *
       |    CAST(u2.c AS DOUBLE)) AS pmi_ratio
       |FROM bg JOIN ug u1 ON bg.w1 = u1.tok JOIN ug u2 ON bg.w2 = u2.tok, t
       |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 20""".stripMargin

  /** t33 — per-document token-distribution entropy, 1e-6-quantized: the
    * repetitiveness/gibberish signal expressed as Shannon entropy over the
    * document's own token histogram. To keep the cross-engine hash exact
    * despite transcendentals, each distinct token's c·ln(c) term is rounded
    * to integer micro-nats BEFORE summation (float-sum order never matters;
    * t27's discipline) and the reported score is
    * ent_micronats = round(ln(n)·1e6) − (Σ round(c·ln(c)·1e6)) / n
    * (integer division) — the exact entropy quantized at 1e-6 nat, far
    * below any curation threshold's resolution. Single-token-type docs
    * score 0; low scores flag template/repetition documents (the
    * information-theoretic complement of t07's longest-run view).
    *
    * Scale shape: one corpus scan → per-(doc, token) map-side-combined
    * count → per-doc aggregate; everything is keyed by doc_id, no window,
    * no broadcast, linear in corpus tokens.
    */
  private def t33(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val cnt = tok.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(round(col("c").cast("double") * log(col("c").cast("double"))
          * lit(1e6)).cast("long")).as("sclnc"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (round(log(col("n_tokens").cast("double")) * lit(1e6)).cast("long")
          - expr("sclnc DIV n_tokens")).as("ent_micronats"))
      .orderBy(col("doc_id"))
  }

  private val t33Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY doc_id, w),
      |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  CAST(SUM(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1e6)
      |    AS BIGINT)) AS BIGINT) AS sclnc
      | FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_distinct,
      |  CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
      |    - sclnc // n_tokens AS ent_micronats
      |FROM a ORDER BY doc_id""".stripMargin

  /** t26 — effective token yield: the budget number a training run reads
    * first — of all tokens in the raw corpus, how many survive exact
    * dedup (one representative per md5(text) fingerprint)? Reported as raw
    * and surviving doc/token counts plus the yield ratios. The duplicate
    * mass uses d01's keep-smallest-id convention, so the surviving set is
    * exactly what d01 would emit.
    *
    * Scale shape: one map-side-combined aggregate per fingerprint (token
    * count rides along as min_by payload ≡ any representative's count,
    * since duplicates share text), then a 1-row rollup — two exchanges
    * carrying ≤ |distinct| and 1 rows; no joins, no windows.
    */
  private def t26(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
    d.groupBy(col("fp"))
      .agg(count(lit(1)).as("copies"), sum(col("n_toks")).as("toks_all"),
        min(col("n_toks")).as("toks_one"))
      .agg(sum(col("copies")).as("n_docs"),
        count(lit(1)).as("n_unique_docs"),
        sum(col("toks_all")).as("total_tokens"),
        sum(col("toks_one")).as("unique_tokens"))
      .select(col("n_docs"), col("n_unique_docs"),
        col("total_tokens"), col("unique_tokens"),
        (col("n_unique_docs").cast("double") / col("n_docs"))
          .as("doc_yield"),
        (col("unique_tokens").cast("double") / col("total_tokens"))
          .as("token_yield"))
  }

  private val t26Sql =
    """WITH d AS (SELECT doc_id, md5(text) AS fp,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      | FROM documents),
      |g AS (SELECT fp, COUNT(*) AS copies,
      |  CAST(SUM(n_toks) AS BIGINT) AS toks_all,
      |  CAST(MIN(n_toks) AS BIGINT) AS toks_one
      | FROM d GROUP BY fp)
      |SELECT CAST(SUM(copies) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_unique_docs,
      |  CAST(SUM(toks_all) AS BIGINT) AS total_tokens,
      |  CAST(SUM(toks_one) AS BIGINT) AS unique_tokens,
      |  CAST(COUNT(*) AS DOUBLE) / SUM(copies) AS doc_yield,
      |  CAST(SUM(toks_one) AS DOUBLE) / SUM(toks_all) AS token_yield
      |FROM g""".stripMargin

  /** The stopword delimiter set for t29 — the en profile t02's language ID
    * already pins cross-engine.
    */
  private val RakeStops = Seq("the", "a", "of", "and", "is")

  /** t29 — RAKE keyword extraction (Rose, Engel, Cramer, Cowley, "Automatic
    * keyword extraction from individual documents", 2010): candidate
    * phrases are the maximal runs of non-stopword tokens; each word scores
    * deg/freq (deg = Σ length of the phrases its occurrences sit in,
    * freq = occurrence count, both per document); a phrase scores the sum
    * over its word occurrences; top 3 phrases per doc. The metadata-
    * enrichment step of a curation pipeline (topical keys for routing,
    * clustering, and dedup explanation without a model).
    *
    * Determinism: word scores are FLOOR-scaled integers (deg·10⁶ DIV freq)
    * and phrase scores integer sums of them, so no float enters until the
    * display column; ties rank by phrase text.
    *
    * Scale shape: everything is keyed by doc_id (the run-id window, the
    * phrase agg, the per-doc word stats) or (doc_id, word) — no corpus-
    * wide key ever forms, so the shuffles spread with the document count.
    * The phrase-assembly collect_list buffers one run of one document —
    * bounded by document length, not data distribution.
    */
  private def t29(s: SparkSession, dir: String): DataFrame = {
    // One native pass per document (graft.functions.RakeTopK): RAKE never
    // leaves the document, so the former relational form's six doc-keyed
    // exchanges (run-id window, phrase agg, two joins, two aggregates, rank
    // window) were pure data movement — the kernel computes the identical
    // integer-exact scores and (score DESC, phrase ASC) top-3 inside the
    // scan projection. The DuckDB oracle keeps the relational form.
    val rake = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.RakeTopK(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          tokens(col("text"))), RakeStops, 3))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(rake).as("r"))
      .select(col("doc_id"), col("r.rk").as("rk"), col("r.phrase").as("phrase"),
        col("r.n_words").as("n_words"), col("r.score_scaled").as("score_scaled"),
        (col("r.score_scaled").cast("double") / 1000000.0).as("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  private val t29Sql = {
    val stops = RakeStops.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |  CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos
      | FROM documents),
      |nst AS (SELECT doc_id, pos, w FROM tok WHERE w NOT IN ($stops)),
      |r AS (SELECT doc_id, pos, w,
      |  pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      | FROM nst),
      |ph AS (SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS plen,
      |  string_agg(w, ' ' ORDER BY pos) AS phrase
      | FROM r GROUP BY doc_id, grp),
      |occ AS (SELECT r.doc_id, r.grp, r.w, ph.plen
      | FROM r JOIN ph ON ph.doc_id = r.doc_id AND ph.grp = r.grp),
      |ws AS (SELECT doc_id, w,
      |  CAST((SUM(plen) * 1000000) // COUNT(*) AS BIGINT) AS sc
      | FROM occ GROUP BY doc_id, w),
      |psc AS (SELECT occ.doc_id, occ.grp,
      |  CAST(SUM(ws.sc) AS BIGINT) AS score_scaled
      | FROM occ JOIN ws ON ws.doc_id = occ.doc_id AND ws.w = occ.w
      | GROUP BY occ.doc_id, occ.grp),
      |top AS (SELECT ph.doc_id, ph.phrase, ph.plen, psc.score_scaled,
      |  ROW_NUMBER() OVER (PARTITION BY ph.doc_id
      |    ORDER BY psc.score_scaled DESC, ph.phrase) AS rk
      | FROM ph JOIN psc ON psc.doc_id = ph.doc_id AND psc.grp = ph.grp)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, phrase, plen AS n_words,
      |  score_scaled,
      |  CAST(score_scaled AS DOUBLE) / 1000000.0 AS score
      |FROM top WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin
  }

  /** t30 — out-of-vocabulary rate of the held-out splits: build the
    * distinct token vocabulary of t19's TRAIN split, then measure what
    * fraction of val/test tokens fall outside it — the leakage-free
    * vocabulary-coverage check run before committing a tokenizer or
    * estimating UNK rates (a val split whose OOV rate is near zero while
    * test's is high also flags a bad split). Same content-stable split
    * hash as t19, so the splits here ARE t19's splits.
    *
    * Scale shape: the vocabulary is a distinct over train tokens and the
    * membership test a token-keyed left-anti equi-join — both shuffle on
    * the token (vocabulary-cardinality keys, no corpus-wide hot key), and
    * the result collapses to two rows. At production vocabulary sizes the
    * join side stays a shuffle join on purpose (a 10M-type vocab is too
    * big to broadcast but trivial to co-partition); d16's Bloom pattern is
    * the drop-in when an approximate pre-filter pays.
    */
  private def t30(s: SparkSession, dir: String): DataFrame = {
    val hv = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    val frac = hv.cast("double") / lit(4503599627370496.0) // 2^52, exact
    val split = when(frac < 0.8, "train").when(frac < 0.9, "val")
      .otherwise(lit("test"))
    val toks = Tables.documents(s, dir)
      .select(split.as("split"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.filter(col("split") === "train")
      .select(col("tok")).distinct()
    val held = toks.filter(col("split") =!= "train")
    val oov = held.join(vocab, Seq("tok"), "left_anti")
      .groupBy(col("split")).agg(count(lit(1)).as("n_oov"))
    held.groupBy(col("split")).agg(count(lit(1)).as("n_tokens"))
      .join(oov, Seq("split"), "left")
      .select(col("split"), col("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("split"))
  }

  /** t31 — language-ID confusion matrix: cross-tabulate t02's predicted
    * language against the labeled one, with per-cell recall (share of the
    * true language's docs landing in this cell) and precision (share of
    * the predicted language's docs) — the standard classifier eval
    * artifact, here grading the engine's OWN t02 heuristic so a profile
    * regression (a stopword list edit, a tie-break change) shows up as a
    * moved matrix cell, not a silent drift.
    *
    * Scale shape: one per-row codegen prediction pass, one count
    * aggregate over ≤ |langs|² keys, two window sums over that tiny
    * matrix. Corpus-size-independent output.
    */
  private def t31(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val preds = Tables.documents(s, dir)
      .select(col("lang").as("true_lang"), langId(col("text")).as("pred_lang"))
    val cm = preds.groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val tw = Window.partitionBy(col("true_lang"))
    val pw = Window.partitionBy(col("pred_lang"))
    cm.withColumn("n_true", sum(col("n")).over(tw))
      .withColumn("n_pred", sum(col("n")).over(pw))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        (col("n").cast("double") / col("n_true").cast("double")).as("recall"),
        (col("n").cast("double") / col("n_pred").cast("double"))
          .as("precision"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  private val t31Sql =
    s"""WITH t02 AS ($t02Sql),
       |cm AS (SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
       | FROM t02 GROUP BY true_lang, pred_lang),
       |x AS (SELECT true_lang, pred_lang, n,
       |  CAST(SUM(n) OVER (PARTITION BY true_lang) AS BIGINT) AS n_true,
       |  CAST(SUM(n) OVER (PARTITION BY pred_lang) AS BIGINT) AS n_pred
       | FROM cm)
       |SELECT true_lang, pred_lang, n,
       |  CAST(n AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall,
       |  CAST(n AS DOUBLE) / CAST(n_pred AS DOUBLE) AS precision
       |FROM x ORDER BY true_lang, pred_lang""".stripMargin

  private val t30Sql =
    """WITH d AS (SELECT
      |  CASE WHEN frac < 0.8 THEN 'train' WHEN frac < 0.9 THEN 'val'
      |    ELSE 'test' END AS split, text FROM (
      |  SELECT text,
      |    CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS frac
      |  FROM documents)),
      |tok AS (SELECT split, unnest(string_split(text, ' ')) AS tok FROM d),
      |vocab AS (SELECT DISTINCT tok FROM tok WHERE split = 'train'),
      |held AS (SELECT split, tok FROM tok WHERE split <> 'train'),
      |oov AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_oov FROM held
      | WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY split),
      |tot AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM held
      | GROUP BY split)
      |SELECT tot.split AS split, tot.n_tokens, COALESCE(oov.n_oov, 0) AS n_oov,
      |  CAST(COALESCE(oov.n_oov, 0) AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE)
      |    AS oov_rate
      |FROM tot LEFT JOIN oov ON oov.split = tot.split
      |ORDER BY tot.split""".stripMargin

  /** t38's coverage points: vocabulary sizes a tokenizer build would test. */
  private val CoverageKs = Seq(100, 1000, 10000)

  /** t38 — vocabulary coverage curve: the fraction of total corpus token
    * MASS covered by the top-K most frequent types, for each K in
    * [[CoverageKs]] — the tokenizer/vocab-sizing diagnostic (how big must
    * the word-level vocabulary be before byte/BPE fallback is rare?). The
    * complement of t11 (which LISTS the head types) and t27 (which fits
    * the Zipf slope): this reports the cumulative mass curve a sizing
    * decision actually reads off. Tie order at each K boundary is total
    * (count desc, token), so the curve is bit-identical across engines.
    *
    * Scale shape: ONE corpus explode into a map-side-combined (token →
    * count) aggregate, localCheckpoint'd (vocab-sized, reused by all
    * arms); each K arm is a distributed TakeOrderedAndProject top-K over
    * that vocab plus a ≤K-row sum — no corpus-wide or un-keyed window
    * anywhere (the global ROW_NUMBER alternative is the plan to refuse:
    * it funnels the whole vocabulary through one partition).
    */
  private def t38(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val total = cnt.agg(sum(col("c")).cast("long").as("n_total"))
    val arms = CoverageKs.map { k =>
      cnt.orderBy(col("c").desc, col("w")).limit(k)
        .agg(lit(k).cast("long").as("k"),
          sum(col("c")).cast("long").as("covered"))
    }.reduce(_.unionAll(_))
    arms.crossJoin(broadcast(total))
      .select(col("k"), col("covered"), col("n_total"),
        (col("covered").cast("double") / col("n_total").cast("double"))
          .as("coverage"))
      .orderBy(col("k"))
  }

  private val t38Sql = {
    val arms = CoverageKs.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k, CAST(SUM(c) AS BIGINT) AS covered
         |FROM (SELECT c FROM cnt ORDER BY c DESC, w LIMIT $k)""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM cnt),
       |arms AS (
       |  $arms)
       |SELECT k, covered, n_total,
       |  CAST(covered AS DOUBLE) / CAST(n_total AS DOUBLE) AS coverage
       |FROM arms, tot ORDER BY k""".stripMargin
  }

  /** t39's hashed-feature space size (DSIR's bucket count knob). */
  private val DsirBuckets = 1024L

  /** t39 — DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-bigram features are under a TARGET
    * domain's feature distribution than under the raw corpus's. The target
    * here is the English slice (`lang = 'en'` — standing in for "trusted
    * domain sample"); features are adjacent-word bigrams hashed into
    * [[DsirBuckets]] buckets (the dimensionality-collapse that makes the
    * density ratio estimable at any corpus size). Per-doc weight is the
    * summed add-one-smoothed log ratio ln(p_target(b)/p_raw(b)) over the
    * doc's feature bag — the log importance weight a resampling pass would
    * exponentiate. Each bucket's ln is quantized to integer micro-nats
    * BEFORE the per-doc sum (t35's discipline: float-sum order never
    * matters), so the cross-engine hash is exact.
    *
    * Scale shape: ONE corpus explode, ever (round-15: the former plan ran
    * it twice — once for the model, once for scoring — and built each
    * bigram as a concat_ws string fed to md5 hex; the features now come
    * from the [[graft.functions.PositionalShingleHashes]] codegen kernel —
    * one native md5 pass over the token bytes per doc, 60-bit longs out,
    * no intermediate strings, the oracle's hash literal moving 13 → 15 hex
    * chars with it). The corpus explodes
    * into a map-side-combined per-(doc_id, lang, bucket) count, which is
    * localCheckpoint'd and feeds BOTH sides: the 1024-row model table is a
    * second tiny aggregate over it (lang is per-doc, so summing the
    * per-doc counts is exactly the former per-bucket count), and scoring
    * is the same table broadcast-joined against the 1024-row weight table,
    * then one doc-keyed agg. The checkpoint is at most docs × 1024 rows —
    * corpus-bounded, far below the bigram explode it replaces. No
    * corpus-sized build side, no shuffle wider than (doc_id, bucket).
    */
  private def t39(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val perDoc = base.select(col("doc_id"), col("lang"),
        explode(graft.functions.PositionalShingleHashes(col("ws"), 2))
          .as("h"))
      .select(col("doc_id"), col("lang"),
        pmod(col("h"), lit(DsirBuckets)).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val perB = perDoc
      .groupBy(col("b"))
      .agg(sum(col("n")).as("cr"),
        sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("ct"))
    val tot = perB.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val lw = perB.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(((col("ct") + 1).cast("double") *
            (col("tr") + DsirBuckets).cast("double")) /
          ((col("cr") + 1).cast("double") *
            (col("tt") + DsirBuckets).cast("double"))) * 1e6)
          .cast("long").as("lw"))
    perDoc
      .join(broadcast(lw), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * col("lw")).as("total_microlw"))
      .select(col("doc_id"), col("n_feats"), col("total_microlw"),
        (col("total_microlw").cast("double") /
          (col("n_feats").cast("double") * 1e6)).as("avg_lw"))
      .orderBy(col("doc_id"))
  }

  private val t39Sql =
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
       |f AS (SELECT doc_id, lang,
       |    CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT) % $DsirBuckets AS b
       |  FROM (SELECT doc_id, lang,
       |      unnest(list_transform(range(1, len(ws)),
       |        i -> ws[i] || ' ' || ws[i + 1])) AS bg
       |    FROM d WHERE len(ws) >= 2)),
       |pb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |  FROM f GROUP BY b),
       |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr,
       |    CAST(SUM(ct) AS BIGINT) AS tt FROM pb),
       |lw AS (SELECT b, CAST(round(ln(
       |    (CAST(ct + 1 AS DOUBLE) * CAST(tr + $DsirBuckets AS DOUBLE)) /
       |    (CAST(cr + 1 AS DOUBLE) * CAST(tt + $DsirBuckets AS DOUBLE))) * 1e6)
       |    AS BIGINT) AS lw
       |  FROM pb, tot),
       |dc AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM f GROUP BY doc_id, b)
       |SELECT dc.doc_id, CAST(SUM(n) AS BIGINT) AS n_feats,
       |  CAST(SUM(n * lw) AS BIGINT) AS total_microlw,
       |  CAST(SUM(n * lw) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) * 1e6) AS avg_lw
       |FROM dc JOIN lw ON dc.b = lw.b
       |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin

  /** t40's training-token budget as a fraction of the corpus total. */
  private val UnimaxBudgetFrac = 0.8

  /** t40 — UniMax language-sampling budgets (Chung et al. 2023): allocate a
    * fixed training-token budget across languages as UNIFORMLY as possible
    * subject to a per-language epoch cap (here 1.0 epoch — never repeat
    * data), the principled alternative to t17's temperature sampling (which
    * still over-samples head languages and starves the tail). The waterfill
    * is computed analytically: languages sorted by capacity ascending, a
    * language is capped iff its capacity is at most the uniform share of
    * the budget left when it is reached (caps ascending makes the test
    * monotone — once one language exceeds the share, all larger ones do),
    * and every uncapped language gets the same water level
    * theta = (budget − Σ capped capacities) / #uncapped.
    *
    * Scale shape: ONE corpus pass (map-side-combined per-language token
    * sum); everything after operates on the language-cardinality table —
    * bounded by #languages (5 here, hundreds at worst), so the single
    * unkeyed window is over a provably tiny frame, never corpus rows.
    * All comparisons are single IEEE divisions of exact integers, so the
    * capped/uncapped verdicts are bit-identical across engines.
    */
  private def t40(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLang = Tables.documents(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang")).agg(sum(col("n")).as("n_tokens"))
      .localCheckpoint() // ≤ #languages rows — everything below reuses it
    val tot = perLang.agg(
      floor(sum(col("n_tokens")).cast("double") * UnimaxBudgetFrac)
        .cast("long").as("budget"),
      count(lit(1)).as("n_langs"))
    val w = Window.orderBy(col("n_tokens"), col("lang"))
    val flagged = perLang.crossJoin(broadcast(tot))
      .withColumn("idx", row_number().over(w))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("share",
        (col("budget") - col("cum") + col("n_tokens")).cast("double") /
          (col("n_langs") - col("idx") + 1).cast("double"))
      .withColumn("capped", col("n_tokens").cast("double") <= col("share"))
    val theta = flagged.agg(
      sum(when(col("capped"), col("n_tokens")).otherwise(0L)).as("used_cap"),
      sum(when(col("capped"), 1L).otherwise(0L)).as("k"))
      .crossJoin(broadcast(tot))
      .select(when(col("n_langs") > col("k"),
        (col("budget") - col("used_cap")).cast("double") /
          (col("n_langs") - col("k")).cast("double")).as("theta"))
    flagged.crossJoin(broadcast(theta))
      .select(col("lang"), col("n_tokens"), col("capped"),
        when(col("capped"), col("n_tokens").cast("double"))
          .otherwise(col("theta")).as("alloc_tokens"),
        (when(col("capped"), col("n_tokens").cast("double"))
          .otherwise(col("theta")) / col("n_tokens").cast("double"))
          .as("epochs_used"),
        (when(col("capped"), col("n_tokens").cast("double"))
          .otherwise(col("theta")) / col("budget").cast("double"))
          .as("budget_share"))
      .orderBy(col("lang"))
  }

  private val t40Sql =
    s"""WITH pl AS (SELECT lang,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang),
       |tot AS (SELECT CAST(floor(CAST(SUM(n_tokens) AS DOUBLE) * $UnimaxBudgetFrac) AS BIGINT) AS budget,
       |    CAST(COUNT(*) AS BIGINT) AS n_langs FROM pl),
       |fl AS (SELECT lang, n_tokens, budget,
       |    CAST(n_tokens AS DOUBLE) <=
       |      CAST(budget - cum + n_tokens AS DOUBLE) /
       |      CAST(n_langs - idx + 1 AS DOUBLE) AS capped
       |  FROM (SELECT pl.*, tot.*,
       |      ROW_NUMBER() OVER (ORDER BY n_tokens, lang) AS idx,
       |      SUM(n_tokens) OVER (ORDER BY n_tokens, lang
       |        ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM pl, tot)),
       |th AS (SELECT CASE WHEN tot.n_langs > k THEN
       |      CAST(tot.budget - used_cap AS DOUBLE) / CAST(tot.n_langs - k AS DOUBLE)
       |    END AS theta
       |  FROM (SELECT CAST(SUM(CASE WHEN capped THEN n_tokens ELSE 0 END) AS BIGINT) AS used_cap,
       |      CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k
       |    FROM fl), tot)
       |SELECT lang, n_tokens, capped,
       |  CASE WHEN capped THEN CAST(n_tokens AS DOUBLE) ELSE theta END AS alloc_tokens,
       |  CASE WHEN capped THEN CAST(n_tokens AS DOUBLE) ELSE theta END /
       |    CAST(n_tokens AS DOUBLE) AS epochs_used,
       |  CASE WHEN capped THEN CAST(n_tokens AS DOUBLE) ELSE theta END /
       |    CAST(budget AS DOUBLE) AS budget_share
       |FROM fl, th ORDER BY lang""".stripMargin
}
