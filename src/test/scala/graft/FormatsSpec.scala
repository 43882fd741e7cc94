package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format breadth: the engine's tables round-trip through every
  * batch format Spark ships (parquet is the native store; JSON/CSV are the
  * interchange edges a harness actually meets; ORC is the other columnar).
  * Schemas are always declared on read (SURVEY §1.3 — never inferred), and
  * CSV carries typed columns through the declared schema.
  */
class FormatsSpec extends SparkSpecBase {

  private def docs() = Tables.documents(spark, sf("sf0.001"))
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("n_chars", LongType)))

  private def roundTrip(format: String,
                        options: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_fmt_$format").toString
    val src = docs()
    src.write.mode("overwrite").options(options).format(format).save(dir)
    val back = spark.read.schema(schema).options(options).format(format).load(dir)
    assert(back.schema == schema, s"$format: declared schema must hold")
    val a = src.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b), s"$format round trip must be lossless")
  }

  test("json round trip with declared schema") { roundTrip("json") }

  test("csv round trip with declared schema and header") {
    roundTrip("csv", Map("header" -> "true"))
  }

  test("orc round trip with declared schema") { roundTrip("orc") }

  test("orc predicate pushdown reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_push").toString
    docs().write.mode("overwrite").format("orc").save(dir)
    val q = spark.read.schema(schema).format("orc").load(dir)
      .filter(col("doc_id") > 400).select(col("doc_id"))
    val s = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(s.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,400)]"),
      "filter must push into the ORC scan")
    assert(q.count() == docs().filter(col("doc_id") > 400).count())
  }
}
