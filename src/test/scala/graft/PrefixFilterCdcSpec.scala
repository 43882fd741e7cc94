package graft

import org.apache.spark.sql.functions._

import graft.functions.ShingleHashes
import graft.functions.TextFunctions.tokens

/** Contracts for the round-9 curation batch:
  *
  *  - d27 prefix filtering is LOSSLESS — its candidate bound is
  *    conservative, so the verified output must equal the brute-force
  *    all-pairs shingle-Jaccard >= tau set exactly (the property d02's
  *    df-cap heuristic cannot offer);
  *  - d28 content-defined chunking resynchronizes after an insertion (the
  *    rsync/LBFS property fixed-width chunking lacks) and its chunks
  *    partition each document;
  *  - t35 bigram-LM scores are strictly positive cross-entropies over
  *    exactly the held-out bigram-bearing docs.
  */
class PrefixFilterCdcSpec extends SparkSpecBase {

  test("d27 prefix filtering is lossless vs brute-force all-pairs Jaccard") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("d27_prefix_filter_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    // brute force on the driver: 500 shingle sets, all 124,750 pairs
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"), ShingleHashes(tokens(col("text")), 3).as("sh"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
      .sortBy(_._1)
    val tau = graft.queries.DedupQueries.ApssTau
    val want = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (da, sa) = sets(i); (db, sb) = sets(j)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa intersect sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= tau
    } yield (da, db, inter.toLong)).toSet

    assert(got == want,
      s"prefix-filtered join must equal brute force (got ${got.size}, want ${want.size})")
    assert(want.nonEmpty, "the corpus must contain true near-dup pairs")
  }

  test("d28 CDC chunking resynchronizes after a prefix insertion") {
    import spark.implicits._
    // two docs: B is A with three junk tokens prepended. Fixed-width
    // chunking shifts every chunk; CDC realigns at the first content
    // boundary, so the two docs must share at least one chunk fingerprint.
    val body = (1 to 120).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    Seq((0L, body, "en", "a", body.length.toLong),
        (1L, s"zz0 zz1 zz2 $body", "en", "a", body.length + 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("d28_cdc_chunk_dedup")(spark, dir).collect()
    assert(rows.exists(_.getAs[Long]("n_docs") == 2L),
      "an inserted prefix must not destroy all shared chunks downstream")

    // chunks partition the document: boundary tokens (md5 first hex in
    // {0,1}) split the body into runs whose concatenation restores it
    val words = body.split(" ")
    def isBoundary(w: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val h = "%02x".format(d(0) & 0xff).charAt(0)
      h == '0' || h == '1'
    }
    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = scala.collection.mutable.ArrayBuffer.empty[String]
    words.foreach { w =>
      cur += w
      if (isBoundary(w)) { chunks += cur.mkString(" "); cur.clear() }
    }
    if (cur.nonEmpty) chunks += cur.mkString(" ")
    assert(chunks.mkString(" ") == body, "chunks must partition the document")
    assert(chunks.size >= 2, "the 120-token body must contain a boundary")
  }

  test("t35 scores exactly the held-out bigram-bearing docs, all xent > 0") {
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("t35_bigram_xent")(spark, dir).collect()
    assert(rows.nonEmpty, "the 20% held-out split must be non-empty")
    assert(rows.forall(_.getAs[Long]("total_micronats") < 0L),
      "every bigram log-prob is strictly negative (num < den always)")
    assert(rows.forall(_.getAs[Double]("xent_nats") > 0.0))

    // coverage: one row per held-out doc with >= 2 tokens
    val expected = Tables.documents(spark, dir)
      .select(col("doc_id"),
        conv(substring(md5(concat(lit("split:"),
          col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
          .cast("double").divide(lit(4503599627370496.0)).as("frac"),
        size(tokens(col("text"))).as("n"))
      .filter(col("frac") >= 0.8 && col("n") >= 2)
      .count()
    assert(rows.length.toLong == expected,
      "every held-out doc with a bigram gets exactly one score")
  }
}
