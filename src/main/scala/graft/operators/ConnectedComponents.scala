package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * of a dedup pipeline (near-dup PAIRS → duplicate GROUPS → one kept
  * representative per group).
  *
  * Min-label propagation: every node starts labeled with itself; each round
  * every node takes the min label among itself and its neighbors; fixpoint =
  * components labeled by their minimum member. Each round is one shuffled
  * join + one aggregation, with `localCheckpoint` breaking lineage so the
  * plan stays O(1) per round. Rounds needed = graph diameter (near-dup
  * clusters are shallow); a 100 TB run would switch to the
  * large-star/small-star contraction (O(log n) rounds) but keep this exact
  * same DataFrame shape.
  */
object ConnectedComponents {

  /** edges(i, j) → (id, component); component = min node id of the
    * component. Only nodes appearing in edges are labeled (callers union in
    * singletons if needed).
    */
  def labelPropagation(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Materialize the edge list ONCE: every round joins against it, and
    // without this the whole upstream plan (e.g. an LSH pipeline) would
    // re-execute per round.
    val adj = edges.select(col("i").as("a"), col("j").as("b"))
      .unionAll(edges.select(col("j").as("a"), col("i").as("b")))
      .localCheckpoint(true)
    var labels = adj.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("label"))).head().getLong(0)
    // labels only ever decrease, so the total is a cheap convergence witness
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each node's candidate label: min over neighbors' current labels
      val fromNeighbors = adj.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nl"))
      val next = labels.join(fromNeighbors, col("id") === col("a"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
