package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * of a dedup pipeline (near-dup PAIRS → duplicate GROUPS → one kept
  * representative per group).
  *
  * Two algorithms, same contract (edges(i, j) → (id, component) with
  * component = min member id; only nodes appearing in edges are labeled):
  *
  *  - [[labelPropagation]]: each round every node takes the min label among
  *    itself and its neighbors; rounds = graph diameter. Right for near-dup
  *    graphs (shallow clusters, tiny diameters).
  *  - [[starContraction]]: alternating large-star/small-star contraction
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC 2014) — O(log n) rounds regardless of diameter, the 100 TB path
  *    for deep or adversarial graphs.
  *
  * [[components]] dispatches between them (system property `graft.cc.algo`:
  * `propagation` default, `star`); ConnectedComponentsSpec pins their
  * agreement on every topology including deep chains.
  */
object ConnectedComponents {

  /** Dispatch point used by the dedup queries (d07/d08): by default, try
    * label propagation with a bounded round budget and FALL BACK to star
    * contraction if it hasn't converged (deep-diameter graph) — the caller
    * always gets an answer, never a convergence exception. Both algorithms
    * produce identical labelings (spec-pinned), so correctness rows don't
    * move whichever path runs. Force one with -Dgraft.cc.algo=star or
    * =propagation (the forced propagation path keeps the throwing contract).
    * Measured at sf0.1 (near-dup graph, diameter ≈ 2-3): propagation 3.4 s
    * vs star 5.1 s on d07 — propagation stays the default for shallow
    * dedup clusters; contraction is the guaranteed-O(log n) safety net.
    * The wasted propagation rounds before falling back are bounded by
    * maxIter; for a dedup graph that budget is ~10× its real diameter.
    */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame =
    sys.props.get("graft.cc.algo") match {
      case Some("star") => starContraction(edges)
      case Some("propagation") => labelPropagation(edges, maxIter)
      case _ => propagate(edges, maxIter).getOrElse(starContraction(edges))
    }

  /** edges(i, j) → (id, component); component = min node id of the
    * component. Only nodes appearing in edges are labeled (callers union in
    * singletons if needed). Throws on non-convergence — use [[components]]
    * for the auto-fallback form.
    */
  def labelPropagation(edges: DataFrame, maxIter: Int = 20): DataFrame =
    propagate(edges, maxIter).getOrElse(
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIter rounds " +
          "(graph diameter too deep) — use starContraction"))

  /** Propagation core: Some(labels) on convergence, None when the round
    * budget runs out (diameter > maxIter).
    */
  private def propagate(edges: DataFrame, maxIter: Int): Option[DataFrame] = {
    // Materialize the edge list ONCE: every round joins against it, and
    // without this the whole upstream plan (e.g. an LSH pipeline) would
    // re-execute per round.
    val adj = edges.select(col("i").as("a"), col("j").as("b"))
      .unionAll(edges.select(col("j").as("a"), col("i").as("b")))
      .localCheckpoint(true)
    var labels = adj.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // coalesce: SUM over an EMPTY frame is NULL — an empty edge set (legal:
    // a bucketed candidate stage can find zero pairs) must converge to an
    // empty labeling, not throw on getLong
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
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
    if (!converged) None
    else Some(labels.select(col("id"), col("label").as("component")))
  }

  /** Large-star/small-star contraction. Each round:
    *
    *  - large-star: for every node x, link each strictly-larger neighbor to
    *    m = min(Γ(x) ∪ {x});
    *  - small-star: orient edges toward the smaller endpoint, then for every
    *    node x link x and all its smaller neighbors to their minimum.
    *
    * Both steps are one groupBy + one equi-join (no collect of neighbor
    * lists — the min is aggregated, then joined back), so a skewed
    * high-degree node never materializes its adjacency in memory. The edge
    * set converges to a star forest rooted at each component's minimum in
    * O(log n) rounds; convergence is detected exactly: a directed child→root
    * edge set is a star forest iff no node is both a parent and a child.
    */
  def starContraction(edges: DataFrame): DataFrame = {
    // full node set up front: self-loop-only nodes leave the edge list when
    // loops are dropped, but the contract labels every node that appears
    val nodes = edges.select(col("i").as("id"))
      .unionAll(edges.select(col("j").as("id")))
      .distinct()
      .localCheckpoint(true)
    var e = edges.select(col("i").as("u"), col("j").as("v"))
      .filter(col("u") =!= col("v"))
      .localCheckpoint(true)
    if (e.isEmpty)
      return nodes.select(col("id"), col("id").as("component"))

    def largeStar(in: DataFrame): DataFrame = {
      val nbrs = in.select(col("u").as("x"), col("v").as("y"))
        .unionAll(in.select(col("v").as("x"), col("u").as("y")))
      val mins = nbrs.groupBy(col("x"))
        .agg(min(col("y")).as("mn"))
        .select(col("x"), least(col("mn"), col("x")).as("m"))
      nbrs.join(mins, "x")
        .filter(col("y") > col("x"))
        .select(col("y").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(in: DataFrame): DataFrame = {
      val oriented = in.select(
        greatest(col("u"), col("v")).as("x"), least(col("u"), col("v")).as("y"))
      val mins = oriented.groupBy(col("x")).agg(min(col("y")).as("m"))
      oriented.join(mins, "x")
        .select(col("y").as("u"), col("m").as("v"))
        .unionAll(mins.select(col("x").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // 2·ceil(log2 n) rounds suffice; 40 covers any graph that fits anywhere
    val maxRounds = 40
    var round = 0
    var isStarForest = false
    while (!isStarForest && round < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint(true)
      isStarForest = e.select(col("v").as("n")).distinct()
        .join(e.select(col("u").as("n")).distinct(), "n")
        .isEmpty
      round += 1
    }
    if (!isStarForest)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxRounds rounds")
    // star forest: every edge is child→root(=component min); roots self-label;
    // nodes not in the forest (self-loop-only) are their own singleton
    val labeled = e.select(col("u").as("id"), col("v").as("component"))
      .unionAll(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
    nodes.join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
