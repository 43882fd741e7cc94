package graft

import org.apache.spark.sql.functions._

/** The SQL face of the engine: after Tables.registerAll, users run plain
  * Spark SQL over the same table names the oracles use — including
  * correlated subqueries and CTEs, which exercise Catalyst's decorrelation.
  */
class SqlInterfaceSpec extends SparkSpecBase {

  test("spark.sql over registered views matches the DataFrame path") {
    Tables.registerAll(spark, sf("sf0.001"))
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(_.toSeq)
    val viaDf = Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("s"))
      .orderBy(col("l_returnflag"))
      .collect().map(_.toSeq)
    assert(viaSql.sameElements(viaDf))
  }

  test("documents/embeddings views serve the pipeline vocabulary in plain SQL") {
    Tables.registerAll(spark, sf("sf0.001"))
    // vocabulary top-k (t11's SQL face)
    val vocab = spark.sql(
      """SELECT tok, COUNT(*) AS n
        |FROM (SELECT explode(split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 5""".stripMargin).collect()
    assert(vocab.length == 5 && vocab.head.getLong(1) >= vocab.last.getLong(1))
    // cross-modality join (q13's SQL face)
    val fused = spark.sql(
      """SELECT e.label, COUNT(*) AS n
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY e.label ORDER BY e.label""".stripMargin).collect()
    assert(fused.nonEmpty)
    val viaDf = Tables.documents(spark, sf("sf0.001"))
      .join(Tables.embeddings(spark, sf("sf0.001")),
        col("vec_id") === col("doc_id"))
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .orderBy(col("label")).collect()
    assert(fused.map(_.toSeq).sameElements(viaDf.map(_.toSeq)))
  }

  test("window functions over views: running sum matches DataFrame window") {
    Tables.registerAll(spark, sf("sf0.001"))
    val viaSql = spark.sql(
      """SELECT event_id,
        |  SUM(CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin)
      .collect().map(_.toSeq)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaDf = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"),
        sum(round(col("value").cast("double") * 1000000).cast("long"))
          .over(w).as("run"))
      .orderBy(col("event_id")).limit(100)
      .collect().map(_.toSeq)
    assert(viaSql.sameElements(viaDf))
  }

  test("native codegen kernels are callable from plain SQL and match the DataFrame path") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.{MinHashSig, ShingleHashes, VectorFunctions}
    Tables.registerAll(spark, sf("sf0.001"))
    // exact integer dot product (the similarity family's kernel)
    val dotSql = spark.sql(
      """SELECT vec_id, graft_dot_long(q, q) AS d FROM
        |(SELECT vec_id,
        |   transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        | FROM embeddings) ORDER BY vec_id LIMIT 50""".stripMargin)
      .collect().map(_.toSeq)
    val q = VectorFunctions.quantize(col("embedding"))
    val dotDf = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), VectorFunctions.dotLong(q, q).as("d"))
      .orderBy(col("vec_id")).limit(50).collect().map(_.toSeq)
    assert(dotSql.sameElements(dotDf) && dotSql.nonEmpty)
    // shingles → minhash signature (the dedup family's kernel)
    val sigSql = spark.sql(
      """SELECT doc_id,
        |  graft_minhash_sig(graft_shingle_hashes(split(text, ' '), 3), 8) AS sig
        |FROM documents ORDER BY doc_id LIMIT 20""".stripMargin)
      .collect().map(_.toSeq)
    val sigDf = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), ColumnBridge.column(MinHashSig(
        ColumnBridge.expression(ColumnBridge.column(ShingleHashes(
          ColumnBridge.expression(split(col("text"), " ")), 3))), 8)).as("sig"))
      .orderBy(col("doc_id")).limit(20).collect().map(_.toSeq)
    assert(sigSql.sameElements(sigDf))
    // banded LSH signature
    val lsh = spark.sql(
      """SELECT graft_lsh_band_sig(
        |  transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
        |  4, 8, 64) AS bs
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    assert(lsh.length == 5 && lsh.forall(_.getSeq[Long](0).length == 4))
    // size parameters select codegen shapes — non-literals must be rejected
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L), CAST(vec_id AS INT)) FROM embeddings")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("correlated EXISTS subquery decorrelates and answers correctly") {
    Tables.registerAll(spark, sf("sf0.001"))
    val got = spark.sql(
      """SELECT count(*) FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin)
      .head().getLong(0)
    val expected = Tables.customer(spark, sf("sf0.001"))
      .join(Tables.orders(spark, sf("sf0.001"))
          .filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(got == expected && got > 0)
  }
}
