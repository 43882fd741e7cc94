package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.FieldMapping

/** P1 — typed field-mapping projection: rename `fieldName` → `columnName` and
  * cast per `columnType` (reference:
  * config/glassflow/deduplication_pipeline.json:68-99; DDL consumption at
  * src/utils/clickhouse.py:37-46).
  *
  * Pure narrow projection — Catalyst folds it into the scan (column pruning
  * reaches the parquet footer), zero shuffle.
  */
object MappingProjection {

  /** Type lattice observed in the reference (SURVEY.md §1.2):
    * string→uuid stays a validated 36-char string (Spark has no UUID type),
    * string→datetime parses "yyyy-MM-dd HH:mm:ss", identity otherwise.
    */
  def castTo(c: Column, columnType: String): Column = columnType match {
    case "uuid"     => c.cast("string")
    case "datetime" => to_timestamp(c, "yyyy-MM-dd HH:mm:ss")
    case "string"   => c.cast("string")
    case "int"      => c.cast("int")
    case "long"     => c.cast("long")
    case "double"   => c.cast("double")
    case other => throw new IllegalArgumentException(s"unknown column_type: $other")
  }

  def apply(df: DataFrame, mapping: Seq[FieldMapping]): DataFrame =
    df.select(mapping.map(m => castTo(col(m.fieldName), m.columnType).as(m.columnName)): _*)
}
