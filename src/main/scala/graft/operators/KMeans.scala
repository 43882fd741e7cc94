package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotLong

/** Distributed quantized Lloyd k-means over integer-quantized vectors —
  * the clustering primitive a semantic-curation pipeline (SemDeDup-style
  * cluster-then-dedup, cluster-balanced sampling, IVF coarse quantizers)
  * runs over the whole corpus.
  *
  * Scale shape: the centroid set collapses to a SINGLE broadcast row
  * holding a c_id-sorted array of (c_id, centroid) structs, and assignment
  * is a per-row argmin fold over that array — one corpus map pass per
  * iteration, zero corpus shuffles; the centroid update is a ≤k-row
  * map-side-combined aggregation. T iterations therefore cost exactly T
  * scans, the minimum any Lloyd implementation can do.
  *
  * Determinism (the repo's oracle rules): seeds are lowest-k-by-md5;
  * distances are exact quantized-int L2² via the ‖a‖²−2a·b+‖b‖² identity
  * with ties broken toward the smaller c_id (the candidate array is
  * c_id-sorted and the fold uses strict less-than); updated centroids
  * re-quantize with one round(sum/count) per dimension over exact integer
  * sums — every assignment, centroid, and distance is reproducible
  * bit-for-bit in any engine that follows the same arithmetic.
  *
  * Expects `(vec_id: long, v: array<long>)` input, as produced by
  * `VectorFunctions.quantize`.
  */
object KMeans {

  /** The k vec_ids with the smallest md5(vec_id || salt) — a deterministic,
    * size-fixed, engine-portable seed sample (TakeOrderedAndProject: ≤k rows
    * ever leave a partition).
    */
  def seedIds(vecs: DataFrame, k: Int, salt: String = "#km"): DataFrame =
    vecs.select(col("vec_id"))
      .orderBy(md5(concat(col("vec_id").cast("string"), lit(salt))),
        col("vec_id"))
      .limit(k)

  /** Collapse (c_id, cv) centroid rows into one broadcastable row holding
    * the c_id-sorted candidate array.
    */
  def codebook(cents: DataFrame): DataFrame = cents
    .select(struct(col("c_id"), col("cv")).as("cand"))
    .agg(sort_array(collect_list(col("cand"))).as("cands"))

  /** The per-row argmin fold over a cross-joined codebook's `cands` array:
    * the (d2, c_id)-smallest candidate as a (d2, c_id) struct — strict less
    * over the c_id-sorted array means the smaller c_id wins ties, matching
    * ROW_NUMBER(ORDER BY d2, c_id). `v` is the row's vector, `xx` its
    * precomputed self-dot. Shared by batch assignment and the streaming
    * SemDeDup admission's stream-static cell assignment.
    */
  def nearest(v: org.apache.spark.sql.Column,
              xx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(col("cands"),
      named_struct(lit("d2"), lit(Long.MaxValue), lit("c_id"), lit(-1L)),
      (acc, c) => {
        val d2 = xx -
          lit(2L) * dotLong(v, c.getField("cv")) +
          dotLong(c.getField("cv"), c.getField("cv"))
        when(d2 < acc.getField("d2"),
          named_struct(lit("d2"), d2, lit("c_id"), c.getField("c_id")))
          .otherwise(acc)
      })

  /** Assign every vector to its nearest centroid. Output:
    * (vec_id, v, c_id, d2).
    *
    * The codebook is ≤k rows and FIXED for the pass, so it is materialized
    * once on the driver and shipped inside a
    * [[graft.functions.NearestCell]] codegen expression: assignment is a
    * pure whole-stage-codegen projection — no crossJoin row widening, no
    * interpreted higher-order fold (~1.2 ms/row at 64 centroids), and the
    * per-pass cost is the one corpus scan Lloyd requires. Arithmetic and
    * the (d2, c_id) tie rule are bit-identical to [[nearest]]
    * (spec-pinned), so oracle parity is unchanged.
    */
  def assign(vecs: DataFrame, cb: DataFrame): DataFrame = {
    val cands: Array[(Long, Array[Long])] = cb
      .select(explode(col("cands")).as("c"))
      .select(col("c.c_id"), col("c.cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val best = graft.functions.NearestCell.withD2(
      col("v"), cands.map(_._1), cands.map(_._2))
    vecs.select(col("vec_id"), col("v"),
      best.getField("c_id").as("c_id"), best.getField("d2").as("d2"))
  }

  /** Lloyd centroid update: per-dimension exact integer sums re-quantized
    * with round(sum/count). Empty cells drop out (both here and in any
    * faithful oracle), so the centroid count can only shrink.
    */
  def update(assigned: DataFrame, dims: Int): DataFrame =
    assigned.groupBy(col("c_id"))
      .agg(count(lit(1)).as("n"),
        (0 until dims).map(i =>
          sum(element_at(col("v"), i + 1)).as(s"s$i")): _*)
      .select(col("c_id"),
        array((0 until dims).map(i =>
          round(col(s"s$i").cast("double") / col("n"))
            .cast("long")): _*).as("cv"))

  /** Full fit: seed, run `iters` assignment+update rounds, return the final
    * assignment (vec_id, v, c_id, d2). Callers wanting plan reuse of the
    * result (e.g. a within-cell self-join) should `localCheckpoint()` it.
    */
  def cluster(vecs: DataFrame, dims: Int, k: Int, iters: Int): DataFrame = {
    val cb0 = codebook(vecs.join(broadcast(seedIds(vecs, k)), "vec_id")
      .select(col("vec_id").as("c_id"), col("v").as("cv")))
    val cbT = (1 to iters).foldLeft(cb0)((cb, _) =>
      codebook(update(assign(vecs, cb), dims)))
    assign(vecs, cbT)
  }
}
