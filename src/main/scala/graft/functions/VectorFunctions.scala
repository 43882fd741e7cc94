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

  /** Sign-bucket id over `planes` hyperplanes: bit h set iff w_h · v >= 0.
    * Cheap (planes × dims multiply-adds per row), no shuffle — the hash side
    * of LSH-bucketed ANN.
    */
  def lshBucket(vQuantized: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { h =>
      val w = array(hyperplane(h, dims).map(lit): _*)
      when(dotLong(vQuantized, w) >= 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
}
