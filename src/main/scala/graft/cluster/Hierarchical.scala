package graft.cluster

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Optional per-component hierarchical refinement (SURVEY.md §2.6 G3) —
 * the reference's `dedupe:clustering (fn cluster)†` runs agglomerative
 * clustering INSIDE each connected component and cuts the dendrogram at a
 * cophenetic threshold, splitting components that transitive closure
 * over-merged (A~B, B~C strong but A~C weak).
 *
 * The north rule makes plain CC the default (BASELINE.json:14); this is
 * the flagged-off refinement. Components are small after thresholding, so
 * each group's HAC runs single-node inside `flatMapGroups` (average
 * linkage over distance = 1 - score; unobserved pairs = distance 1.0);
 * components above `maxComponentSize` pass through unrefined (logged by
 * the caller via cluster_size).
 */
object Hierarchical {

  /** Average-linkage HAC on a dense distance matrix; returns cluster ids
    * (0-based) after cutting at `cut`. Deterministic: merge order ties
    * break by (min cluster index). */
  private[cluster] def hacLabels(n: Int, dist: Array[Array[Double]], cut: Double): Array[Int] = {
    // active clusters as mutable member lists
    val members = Array.tabulate(n)(i => scala.collection.mutable.ArrayBuffer(i))
    val active = scala.collection.mutable.LinkedHashSet(0 until n: _*)
    def avgDist(a: Int, b: Int): Double = {
      var s = 0.0
      var c = 0
      members(a).foreach { i =>
        members(b).foreach { j => s += dist(i)(j); c += 1 }
      }
      s / c
    }
    var merged = true
    while (merged && active.size > 1) {
      merged = false
      var best = Double.MaxValue
      var ba = -1; var bb = -1
      val act = active.toIndexedSeq
      var x = 0
      while (x < act.length) {
        var y = x + 1
        while (y < act.length) {
          val d = avgDist(act(x), act(y))
          if (d < best - 1e-12) { best = d; ba = act(x); bb = act(y) }
          y += 1
        }
        x += 1
      }
      if (best <= cut) {
        members(ba) ++= members(bb)
        active.remove(bb)
        merged = true
      }
    }
    val out = new Array[Int](n)
    active.toIndexedSeq.sorted.zipWithIndex.foreach { case (c, idx) =>
      members(c).foreach(m => out(m) = idx)
    }
    out
  }

  /**
   * @param labels (id, component) from CC
   * @param scoredPairs (id1, id2, score)
   * @param cut cophenetic distance threshold (reference default 0.5†)
   * @return (id, component) with component ids refined — sub-clusters get
   *         component = min(id of sub-cluster members) for stable ids
   */
  def refine(labels: DataFrame, scoredPairs: DataFrame, cut: Double = 0.5,
      maxComponentSize: Int = 1000): DataFrame = {
    val l1 = labels.select(col("id").as("id1"), col("component"))
    val edges = scoredPairs.join(l1, "id1")
      .select(col("component"), col("id1"), col("id2"), col("score"))
    // group all of a component's edges + members; edges already imply
    // membership of both endpoints (CC labels come from the same edges)
    val out = StructType(Seq(
      StructField("id", LongType), StructField("component", LongType)))
    implicit val enc = Encoders.row(out)
    val refined = edges
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (comp, rows) =>
        val es = rows.toArray
        val ids = es.flatMap(r => Seq(r.getLong(1), r.getLong(2))).distinct.sorted
        if (ids.length > maxComponentSize) {
          ids.iterator.map(i => Row(i, comp))
        } else {
          val idx = ids.zipWithIndex.toMap
          val n = ids.length
          val dist = Array.fill(n, n)(1.0)
          var i = 0
          while (i < n) { dist(i)(i) = 0.0; i += 1 }
          es.foreach { r =>
            val a = idx(r.getLong(1)); val b = idx(r.getLong(2))
            val d = 1.0 - r.getDouble(3)
            dist(a)(b) = d; dist(b)(a) = d
          }
          val sub = hacLabels(n, dist, cut)
          // stable sub-cluster id: min member id
          val subMin = sub.zipWithIndex.groupBy(_._1)
            .map { case (c, xs) => c -> xs.map(x => ids(x._2)).min }
          ids.indices.iterator.map(i => Row(ids(i), subMin(sub(i))))
        }
      }
    // singletons (no edges) keep their CC label
    labels.join(refined.withColumnRenamed("component", "refined"), Seq("id"), "left")
      .select(col("id"), coalesce(col("refined"), col("component")).as("component"))
  }
}
