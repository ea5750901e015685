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

  /**
   * Same contract as [[sweep]], one distributed pass instead of K
   * iterative CC runs: because components at θ_hi REFINE components at
   * θ_lo, ONE base CC at min(θ) partitions the edge set into groups that
   * never interact at ANY swept θ — so each base component sweeps every
   * θ level locally with an incremental union-find (edges added
   * score-descending, monotone node/component/largest counters
   * snapshotted at each θ boundary: O(E α) total for ALL thetas), then
   * per-θ stats sum across groups. K thetas cost one CC + one
   * stats shuffle, not K CCs over the biggest graph.
   *
   * Scale guard: base components bigger than `maxComponentEdges` edges
   * (a θ_min low enough to glue the corpus together) are diverted to the
   * per-θ [[sweep]] path — its iterative CC handles unbounded components
   * — and their stats are summed back in; everything else never buffers
   * more than the cap in one task. The count pre-pass is a map-combined
   * key census, cheap relative to the base CC it follows.
   */
  def sweepFast(scoredPairs: DataFrame, thetas: Seq[Double],
      scoreCol: String = "score", maxComponentEdges: Int = 5000000): DataFrame = {
    require(thetas.nonEmpty, "sweep needs at least one threshold")
    val spark = scoredPairs.sparkSession
    import spark.implicits._
    val thDesc = thetas.distinct.sortBy(th => -th)
    val edges = scoredPairs
      .filter(col(scoreCol) >= thetas.min)
      .select(col("id1").cast("long").as("id1"),
        col("id2").cast("long").as("id2"),
        col(scoreCol).cast("double").as("_s"))
    val base = ConnectedComponents.run(edges.select("id1", "id2")).labels
    val withComp = edges
      .join(base.withColumnRenamed("id", "id1")
        .withColumnRenamed("component", "_comp"), Seq("id1"))
      .select(col("_comp"), col("id1"), col("id2"), col("_s"))
      .as[(Long, Long, Long, Double)]
    val bigComps = withComp.groupByKey(_._1).count()
      .filter(_._2 > maxComponentEdges.toLong).map(_._1).collect().toSet
    val (bigStats, smallInput) =
      if (bigComps.isEmpty) (None, withComp)
      else (Some(sweep(
          withComp.filter(t => bigComps.contains(t._1))
            .toDF("_comp", "id1", "id2", "_s").drop("_comp"),
          thDesc, "_s")),
        withComp.filter(t => !bigComps.contains(t._1)))
    val perComp = smallInput.groupByKey(_._1).flatMapGroups { (_, it) =>
      val es = it.map(t => (t._2, t._3, t._4)).toArray.sortBy(e => -e._3)
      val parent = new java.util.HashMap[Long, Long]()
      val sz = new java.util.HashMap[Long, Long]()
      var nNodes = 0L; var nComp = 0L; var largest = 0L
      def find(x0: Long): Long = {
        var x = x0
        while (parent.get(x) != x) {
          parent.put(x, parent.get(parent.get(x))); x = parent.get(x)
        }
        x
      }
      def addNode(x: Long): Unit = if (!parent.containsKey(x)) {
        parent.put(x, x); sz.put(x, 1L)
        nNodes += 1; nComp += 1; if (largest < 1L) largest = 1L
      }
      def union(a: Long, b: Long): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          val (hi, lo) = if (sz.get(ra) >= sz.get(rb)) (ra, rb) else (rb, ra)
          parent.put(lo, hi)
          val s = sz.get(hi) + sz.get(lo); sz.put(hi, s)
          if (s > largest) largest = s
          nComp -= 1
        }
      }
      var i = 0
      thDesc.iterator.map { th =>
        while (i < es.length && es(i)._3 >= th) {
          addNode(es(i)._1); addNode(es(i)._2)
          union(es(i)._1, es(i)._2)
          i += 1
        }
        (th, nNodes, nComp, largest)
      }
    }.toDF("theta", "n_nodes", "n_components", "largest")
    val combined = bigStats.fold(perComp)(perComp.unionByName(_))
      .groupBy(col("theta")).agg(
        sum(col("n_nodes")).as("n_nodes"),
        sum(col("n_components")).as("n_components"),
        max(col("largest")).as("largest"))
    // every requested θ gets its row (zeros when no edge anywhere
    // survives), duplicates echoed — exactly [[sweep]]'s contract
    thetas.toDF("theta").join(combined, Seq("theta"), "left")
      .select(col("theta"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_components"), lit(0L)).as("n_components"),
        coalesce(col("largest"), lit(0L)).as("largest"))
  }
}
