package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Embedding/vector expression library (similarity search, near-dup).
  *
  * Two numeric regimes:
  *  - `dot`/`cosine`: plain double arithmetic — fastest, for pure-Spark use.
  *  - `quantize` + `dotLong`/`cosineQ`: exact integer dot products over
  *    quantized vectors (×10⁴). Integer sums are order-independent and
  *    bit-identical in every engine, so oracle-checked queries use these; the
  *    final cosine is IEEE-deterministic double math over exact ints.
  */
object VectorFunctions {

  /** Quantize a float vector to integers (×10000, round-half-away-from-zero
    * — no .5 ties exist for float inputs, see SimilarityQueries).
    */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 10000).cast("long"))

  /** Exact integer dot product of two quantized vectors — native codegen'd
    * expression (see DotProductLong; ~50× the interpreted HOF form on
    * pair-join workloads).
    */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Double dot product (production path, non-oracle). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine over quantized vectors: exact-int dots, deterministic doubles. */
  def cosineQ(a: Column, b: Column): Column =
    dotLong(a, b).cast("double") /
      (sqrt(dotLong(a, a).cast("double")) * sqrt(dotLong(b, b).cast("double")))

  /** Cosine over raw float/double vectors (production path). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic random-hyperplane weights for LSH: integer in
    * [-1000, 1000] derived from md5("hp:<plane>:<dim>") — reproducible in
    * Scala and in any SQL engine with md5.
    */
  def hyperplane(plane: Int, dims: Int): Array[Long] =
    Array.tabulate(dims) { d =>
      val hex = md5Hex(s"hp:$plane:$d").substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** LSH scale parameters. A FIXED plane count makes within-bucket joins
    * O(n²/2^planes) — quadratic at any setting once n outgrows it. Instead
    * the plane count adapts: `planesFor(n)` chooses the smallest width (with
    * floor [[MinPlanes]]) such that expected band-bucket occupancy
    * n / 2^planes never exceeds [[TargetBucketSize]], so candidate volume
    * per bucket is bounded by a constant at ANY corpus size (PropertySpec
    * pins this for n up to 10^13). Recall loss from narrower buckets is
    * recovered by hashing [[LshBands]] independent bands (disjoint
    * hyperplane sets) and unioning candidates — d03's banded-MinHash
    * recall/cost trade, applied to sign LSH.
    */
  val TargetBucketSize = 64
  val MinPlanes = 8
  val LshBands = 4

  /** Planes per band for a corpus of n vectors: max(MinPlanes,
    * ceil(log2(n / TargetBucketSize))) — guarantees n / 2^planes ≤
    * TargetBucketSize for every n (for n below 2^MinPlanes·Target the floor
    * already over-partitions).
    */
  def planesFor(n: Long): Int = {
    val needed = math.ceil(
      math.log(math.max(n, 1L).toDouble / TargetBucketSize) / math.log(2.0)).toInt
    math.max(MinPlanes, needed)
  }

  /** Per-band sign-bucket values: band t hashes with the disjoint hyperplane
    * set [t·p, (t+1)·p). Returns an array of `bands` longs — posexplode to
    * (band_idx, band_val) rows for the candidate equi-join. One native
    * codegen call for all bands (see LshBandSig — the compositional
    * bands×planes expression forest bloats generated code at scale widths).
    */
  def lshBandVals(vQuantized: Column, bands: Int, planesPerBand: Int,
                  dims: Int): Column =
    LshBandSig(vQuantized, bands, planesPerBand, dims)

  /** DuckDB rendering of one band's [[lshBandVals]] value — same hyperplanes,
    * same bit order, so oracle SQL reproduces bucket ids exactly.
    */
  def lshBandValSql(band: Int, planesPerBand: Int, dims: Int): String =
    (0 until planesPerBand).map { h =>
      val wl = hyperplane(band * planesPerBand + h, dims)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v::DOUBLE[], $wl::DOUBLE[]) >= 0 THEN ${1L << h} ELSE 0 END)"
    }.mkString(" + ")

  /** The full banded (vec_id, bi, bv) CTE over a quantized CTE named `q` —
    * DuckDB zips the parallel unnests positionally, mirroring posexplode.
    * ONE renderer for every oracle that joins on band buckets (s02/s06/d11):
    * the bit layout here and in [[lshBandVals]]/LshBandSig must never drift
    * apart, so neither may two SQL copies of it.
    */
  def lshBandsCteSql(bands: Int, planesPerBand: Int, dims: Int): String = {
    val bis = (0 until bands).mkString("[", ", ", "]")
    val bvs = (0 until bands)
      .map(t => "(" + lshBandValSql(t, planesPerBand, dims) + ")")
      .mkString("[", ",\n  ", "]")
    s"bands AS (SELECT vec_id, unnest($bis) AS bi, unnest($bvs) AS bv FROM q)"
  }
}
