package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked operator query: a Spark implementation over the
  * testdata tables plus (when SQL-expressible) the equivalent DuckDB SQL.
  *
  * Determinism contract (so the driver's hash compare is stable):
  *  - every query ends in a total ORDER BY (full tiebreak), mirrored in SQL;
  *  - double aggregates go through exact DECIMAL arithmetic and are cast to
  *    DOUBLE only at the end (bit-identical across engines);
  *  - cross-engine hashing uses md5 (the common primitive), never engine
  *    hash functions;
  *  - raw ns-precision timestamps are truncated or excluded from outputs.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def defs: Seq[QueryDef]
}
