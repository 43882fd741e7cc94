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
