package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Clustering-threshold sensitivity sweep.
 *
 * The reference picks ONE score threshold (recall-weighted argmax,
 * `dedupe:api (fn threshold)†`, our C11/`score.Threshold`) and clusters
 * at it. At crawl scale that single number hides the decision that
 * matters most: how violently does the entity structure move when θ
 * moves? This operator answers it — for each candidate θ, transitive
 * entities over the `score ≥ θ` edge subset, summarized as exact
 * integer statistics (node/component counts, largest component), so a
 * reviewer sees the knee of the curve before committing a threshold to
 * a 10^12-row entity_map.
 *
 * Scale shape: one pass over the scored-pair snapshot per θ (the edge
 * set only SHRINKS as θ rises — thresholding happens before any
 * shuffle), then a CC run on the surviving edges; stats are two
 * map-side-combinable aggregates over the labeling. Since score ≥ θ_hi
 * implies score ≥ θ_lo, each sweep level's components REFINE the
 * previous level's (asserted in ThresholdSweepSpec); the independent
 * runs are embarrassingly parallel across θ if a caller wants to
 * trade cluster capacity for latency.
 */
object ThresholdSweep {

  /** Transitive labels at one threshold (edge-incident nodes only). */
  def labelsAt(scoredPairs: DataFrame, theta: Double,
      scoreCol: String = "score"): DataFrame =
    ConnectedComponents.run(
      scoredPairs.filter(col(scoreCol) >= theta).select("id1", "id2")).labels

  /**
   * @param scoredPairs (id1, id2, <scoreCol>) scored candidate pairs
   * @param thetas      thresholds to sweep (any order; echoed in output)
   * @return one row per θ: (theta, n_nodes, n_components, largest) —
   *         counts over edge-incident nodes; a θ killing every edge
   *         still yields its row (all zeros): "nothing clusters here"
   *         is the sweep's most useful possible answer
   */
  def sweep(scoredPairs: DataFrame, thetas: Seq[Double],
      scoreCol: String = "score"): DataFrame = {
    require(thetas.nonEmpty, "sweep needs at least one threshold")
    thetas.map { th =>
      val perComp = labelsAt(scoredPairs, th, scoreCol)
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      perComp.agg(
        coalesce(sum(col("sz")), lit(0L)).as("n_nodes"),
        count(lit(1)).as("n_components"),
        coalesce(max(col("sz")), lit(0L)).as("largest"))
        .select(lit(th).as("theta"), col("n_nodes"),
          col("n_components"), col("largest"))
    }.reduce(_ unionByName _)
  }
}
