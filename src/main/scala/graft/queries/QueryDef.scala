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
  *
  * Scale contract — the higher-order-function recompute rule (round 9):
  * a non-trivial subtree referenced INSIDE a transform/aggregate/filter
  * lambda is re-evaluated at every element (Catalyst does not hoist it,
  * and CollapseProject inlines single-use projection aliases back into the
  * lambda) — measured 188 s vs 1 s building 3-grams over 2000-token docs,
  * and the round-8 d26 artifact loss (724 s for one query). Therefore:
  *  - lambdas may reference ONLY their own variables, attributes, and
  *    literals — never an inline tokenizer/decoder/digest subtree;
  *  - arrays a lambda indexes into must be NAMED columns referenced at
  *    least twice (CollapseProject keeps multi-referenced non-cheap
  *    aliases materialized), or restructured so every expensive reference
  *    sits at ARGUMENT position (zip_with over slices — wordShingles), or
  *    replaced by a one-pass codegen kernel (WinnowFingerprints,
  *    BytesToLongs, ShingleHashes).
  *
  * The unbounded-FOLLOWING window rule (round 15): never aggregate over
  * a `ROWS BETWEEN … AND UNBOUNDED FOLLOWING` frame in a per-key window —
  * Spark's UnboundedFollowingWindowFunctionFrame recomputes the aggregate
  * FROM SCRATCH per output row, O(n²) per partition (a 400k-row hot user
  * wedged r31 for 42 CPU-minutes; invisible at ~100 rows/key). Compute
  * suffix extrema as RUNNING aggregates over the DESCENDING order instead
  * (same row set, the O(n) accumulating UnboundedPreceding frame) — see
  * SequenceMatch's strict_dedup fetches and j15's next-click side.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def defs: Seq[QueryDef]
}
