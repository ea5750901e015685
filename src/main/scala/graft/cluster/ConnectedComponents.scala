package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Transitive closure over scored pairs ≥ θ — the reference's
 * `dedupe:clustering (fn connected_components)†` (in-memory union-find)
 * re-expressed as the large-star/small-star MapReduce algorithm
 * (Kiveris et al., "Connected Components in MapReduce and Beyond",
 * SoCC 2014) in pure DataFrames — no GraphFrames jar ships in
 * /opt/spark/jars (SURVEY.md §2.6 G2; BASELINE.json:6 "iterative
 * connected-components with checkpointed convergence").
 *
 * Each iteration is two groupBy+join rounds; convergence is O(log n)
 * iterations on adversarial graphs and 1-2 on near-clique dedupe
 * components. Every iteration is checkpointed to truncate lineage
 * (reliable checkpoint when a checkpoint dir is set — the resume
 * contract — else localCheckpoint).
 */
object ConnectedComponents {

  case class CCResult(labels: DataFrame, iterations: Int)

  /** Large-star: connect every neighbor larger than u to u's min neighbor. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val minn = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(minn, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: connect u and all smaller neighbors to the minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val minn = or.groupBy("u").agg(min(col("v")).as("m"))
    or.join(minn, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(minn.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  private def checkpointed(df: DataFrame, spark: SparkSession): DataFrame =
    Checkpoints.checkpointed(df, spark)

  /**
   * @param edges DataFrame with two long/numeric columns (id1, id2)
   * @return labels (id, component) for every node APPEARING IN AN EDGE;
   *         component = min node id of the component. Callers add
   *         singletons by left-joining their vertex set (component := id).
   */
  def run(edges: DataFrame, maxIter: Int = 50): CCResult = {
    val spark = edges.sparkSession
    var e = edges.toDF("u", "v")
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    e = checkpointed(e, spark)

    var converged = false
    var iter = 0
    var prevSig: (Long, Long) = signature(e)
    while (!converged && iter < maxIter) {
      val next = checkpointed(smallStar(largeStar(e)), spark)
      val sig = signature(next)
      converged = sig == prevSig
      prevSig = sig
      e = next
      iter += 1
    }

    // at fixpoint every edge is (member, root) with root = component min
    val labels = e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
    CCResult(labels, iter)
  }

  /** Cheap fixpoint detector: (edge count, order-independent hash xor) —
    * bit_xor instead of sum: overflow-free under ANSI mode. */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count("*").as("n"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /**
   * Assign every vertex a component: edge-connected nodes get the CC label,
   * isolated ones themselves (matches the reference: unclustered records
   * keep their own entity†).
   */
  def labelAll(vertices: DataFrame, idCol: String, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val cc = run(edges, maxIter).labels
    vertices.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /**
   * Giant-component cap (G2 tail): the reference re-thresholds inside
   * components that exceed the size cap (`dedupe:clustering†` caps giant
   * components) — transitive closure on crawl data can chain unrelated
   * pages through weak hubs. Components larger than `cap` have their
   * internal edges re-thresholded at θ+Δ (Δ grows per round) and are
   * re-clustered; repeats until all components fit or rounds run out.
   *
   * @param labels (id, component)
   * @param scoredEdges (id1, id2, score)
   */
  def capGiantComponents(labels: DataFrame, scoredEdges: DataFrame,
      cap: Int, theta: Double, thetaStep: Double = 0.1,
      maxRounds: Int = 4): DataFrame = {
    var current = labels
    var round = 1
    var done = false
    while (!done && round <= maxRounds) {
      val oversized = current.groupBy("component")
        .agg(count("*").as("n")).filter(col("n") > cap)
        .select(col("component"))
      if (oversized.isEmpty) done = true
      else {
        val bigIds = current.join(oversized, "component").select(col("id"))
        val keep = current.join(oversized, Seq("component"), "left_anti")
        val subEdges = scoredEdges
          .join(bigIds.withColumnRenamed("id", "id1"), "id1")
          .join(bigIds.withColumnRenamed("id", "id2"), "id2")
          .filter(col("score") >= theta + round * thetaStep)
          .select(col("id1"), col("id2"))
        val relabeled = labelAll(bigIds, "id", subEdges)
        current = keep.select("id", "component")
          .unionByName(relabeled.select("id", "component"))
        round += 1
      }
    }
    current
  }

  /**
   * Incremental transitive closure: fold a NEW batch of edges into an
   * existing labeling without replaying the old edge list — the
   * crawl-update cadence at 10^12-document scale, where each snapshot
   * adds a sliver of pages/edges and re-running CC over the full
   * historical pair stream would dominate the job.
   *
   * A component is connectivity-equivalent to its star (member →
   * component root), so CC(star(CC(E₁)) ∪ E₂) = CC(E₁ ∪ E₂): the result
   * EQUALS the full recompute (IncrementalCCSpec fuzz-asserts this), at
   * the cost of one edge per previously-labeled node instead of the full
   * E₁. Labels are min-member ids, so components untouched by the new
   * batch keep their exact previous label — persistent entity ids are
   * stable across snapshots for free ([[Crosswalk]] reconciles the
   * changed ones).
   *
   * @param prevLabels (id, component) from the previous run — every
   *                   previously known node, singletons included
   * @param newEdges   (id1, id2) this batch's accepted pairs; endpoints
   *                   may be brand-new nodes
   * @return (id, component) covering prev nodes ∪ new-edge endpoints
   */
  def incrementalLabelAll(prevLabels: DataFrame, newEdges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val prev = prevLabels.toDF("id", "component")
    val ne = newEdges.toDF("id1", "id2")
    val star = prev.filter(col("id") =!= col("component"))
      .select(col("id").as("id1"), col("component").as("id2"))
    val vertices = prev.select(col("id"))
      .union(ne.select(col("id1").as("id")))
      .union(ne.select(col("id2").as("id")))
      .distinct()
    labelAll(vertices, "id", star.unionByName(ne), maxIter)
  }
}
