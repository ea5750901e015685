package graft.cluster

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Cannot-link constraint enforcement at cluster time.
 *
 * The reference's training loop lets a human mark a pair as DISTINCT
 * (`dedupe-api:api/app.py (route /mark-pair)†` writes `distinct` labels;
 * SURVEY.md §3.3). Those labels steer the learned model, but a strong
 * transitive chain can still pull a human-rejected pair into one entity —
 * the one outcome a reviewer explicitly forbade. This operator makes the
 * labels binding: no output entity contains both endpoints of a
 * cannot-link pair.
 *
 * Method: components untouched by any cannot-link pair pass through
 * unchanged (the common case — human labels are tiny at crawl scale, so
 * the join that finds violations is a broadcast against the label set).
 * Each violated component is re-clustered in-group with
 * constraint-respecting average-linkage HAC (Davidson & Ravi,
 * "Agglomerative Hierarchical Clustering with Constraints", SDM 2005†):
 * the merge loop never joins two clusters whose union would contain a
 * forbidden pair; forbiddenness ORs on merge. Components above
 * `maxComponentSize` take the deterministic detach fallback instead of
 * buffering a giant edge list in one task: the greater endpoint of each
 * cannot-link pair becomes its own singleton entity.
 *
 * Must-link labels are the trivial dual — union them into the edge list
 * before CC ([[withMustLink]]) so transitive closure absorbs them.
 */
object Constraints {

  /** Average-linkage HAC labels like [[Hierarchical.hacLabels]], plus a
    * symmetric item-level `forbidden` relation: clusters whose union
    * contains a forbidden pair never merge. Lance-Williams distance
    * updates; forbiddenness ORs when clusters merge. Deterministic:
    * ties break by first-in-index-order, exactly as the unconstrained
    * kernel. */
  private[cluster] def constrainedHacLabels(
      n: Int, dist: Array[Array[Double]], forbidden: Array[Array[Boolean]],
      cut: Double): Array[Int] = {
    val d = new Array[Double](n * n)
    val f = new Array[Boolean](n * n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        d(i * n + j) = dist(i)(j)
        f(i * n + j) = forbidden(i)(j)
        j += 1
      }
      i += 1
    }
    val size = Array.fill(n)(1)
    val alive = Array.fill(n)(true)
    val members = Array.tabulate(n)(i => scala.collection.mutable.ArrayBuffer(i))
    var nActive = n
    var continue = true
    while (continue && nActive > 1) {
      var best = Double.MaxValue
      var ba = -1; var bb = -1
      var x = 0
      while (x < n) {
        if (alive(x)) {
          var y = x + 1
          while (y < n) {
            if (alive(y) && !f(x * n + y)) {
              val dd = d(x * n + y)
              if (dd < best - 1e-12) { best = dd; ba = x; bb = y }
            }
            y += 1
          }
        }
        x += 1
      }
      if (ba >= 0 && best <= cut) {
        val sa = size(ba); val sb = size(bb)
        var k = 0
        while (k < n) {
          if (alive(k) && k != ba && k != bb) {
            val nd = (sa * d(ba * n + k) + sb * d(bb * n + k)) / (sa + sb)
            d(ba * n + k) = nd
            d(k * n + ba) = nd
            val nf = f(ba * n + k) || f(bb * n + k)
            f(ba * n + k) = nf
            f(k * n + ba) = nf
          }
          k += 1
        }
        size(ba) = sa + sb
        members(ba) ++= members(bb)
        alive(bb) = false
        nActive -= 1
      } else continue = false
    }
    val out = new Array[Int](n)
    var idx = 0
    i = 0
    while (i < n) {
      if (alive(i)) { members(i).foreach(m => out(m) = idx); idx += 1 }
      i += 1
    }
    out
  }

  /** Must-link labels are extra edges: transitive closure absorbs them. */
  def withMustLink(edges: DataFrame, mustLink: DataFrame): DataFrame =
    edges.toDF("id1", "id2").unionByName(mustLink.toDF("id1", "id2"))

  /**
   * Enforce cannot-link pairs on a CC labeling.
   *
   * @param labels (id, component) from [[ConnectedComponents]]
   * @param scoredPairs (id1, id2, score) — the scored candidate pairs
   *                    (intra-component edges carry the HAC distances)
   * @param cannotLink (id1, id2) human-labeled distinct pairs
   * @param cut cophenetic cut for the in-group re-clustering (reference
   *            default 0.5†, same as [[Hierarchical.refine]])
   * @return (id, component) — identical to `labels` except inside
   *         violated components, which are re-clustered so that no
   *         cannot-link pair shares a component; sub-cluster id = min
   *         member id (stable, same scheme as refine)
   */
  def enforceCannotLink(labels: DataFrame, scoredPairs: DataFrame,
      cannotLink: DataFrame, cut: Double = 0.5,
      maxComponentSize: Int = 1000): DataFrame = {
    val l1 = labels.select(col("id").as("id1"), col("component"))
    val l2 = labels.select(col("id").as("id2"), col("component").as("component2"))
    // violated = both endpoints of a cannot-link pair in one component.
    // cannotLink is human-labeled and therefore tiny — broadcast it so
    // the violation scan is one pass over labels with no shuffle.
    val cl = broadcast(cannotLink.toDF("id1", "id2"))
    val violations = cl.join(l1, "id1").join(l2, "id2")
      .filter(col("component") === col("component2"))
      .select(col("component"), col("id1"), col("id2"))
    val violatedComps = violations.select("component").distinct()

    val compSize = labels.groupBy(col("component"))
      .agg(count(lit(1)).as("_csize"))
    val smallViolated = violatedComps.join(compSize, "component")
      .filter(col("_csize") <= maxComponentSize).select("component")
    val bigViolated = violatedComps.join(compSize, "component")
      .filter(col("_csize") > maxComponentSize).select("component")

    // ---- small violated components: constrained HAC in-group ----------
    // one row stream per component: scored edges (kind 0) + forbidden
    // pairs (kind 1, score unused)
    val edges = scoredPairs
      .select(col("id1"), col("id2"), col("score"))
      .join(l1, "id1").join(l2, "id2")
      .filter(col("component") === col("component2"))
      .join(smallViolated, "component")
      .select(col("component"), col("id1"), col("id2"), col("score"), lit(0).as("kind"))
    val forb = violations.join(smallViolated, "component")
      .select(col("component"), col("id1"), col("id2"), lit(0.0).as("score"), lit(1).as("kind"))
    // members roster too: a violated component's member with no scored
    // edge (possible when the caller thresholds pairs before CC and
    // passes only survivors here) must still be emitted
    val roster = labels.join(smallViolated, "component")
      .select(col("component"), col("id").as("id1"), col("id").as("id2"),
        lit(0.0).as("score"), lit(2).as("kind"))

    val out = StructType(Seq(
      StructField("id", LongType), StructField("component", LongType)))
    implicit val enc = Encoders.row(out)
    val reclustered = edges.unionByName(forb).unionByName(roster)
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (comp, rows) =>
        val es = rows.toArray
        val ids = es.flatMap(r => Seq(r.getLong(1), r.getLong(2))).distinct.sorted
        if (ids.length > maxComponentSize) {
          // roster raced past the DataFrame-side size guard (cannot
          // happen — the guard uses the same labels — but stay safe)
          ids.iterator.map(i => Row(i, comp))
        } else {
          val idx = ids.zipWithIndex.toMap
          val n = ids.length
          val dist = Array.fill(n, n)(1.0)
          val forbid = Array.fill(n, n)(false)
          var i = 0
          while (i < n) { dist(i)(i) = 0.0; i += 1 }
          es.foreach { r =>
            val a = idx(r.getLong(1)); val b = idx(r.getLong(2))
            if (r.getInt(4) == 0) {
              // duplicate pair rows (same pair scored under several block
              // keys, or unsanitized caller input) collapse to their BEST
              // score — a min, so the result is independent of the
              // nondeterministic row arrival order inside the group
              val d = 1.0 - r.getDouble(3)
              if (d < dist(a)(b)) { dist(a)(b) = d; dist(b)(a) = d }
            } else if (r.getInt(4) == 1) {
              forbid(a)(b) = true; forbid(b)(a) = true
            }
          }
          val sub = constrainedHacLabels(n, dist, forbid, cut)
          val subMin = sub.zipWithIndex.groupBy(_._1)
            .map { case (c, xs) => c -> xs.map(x => ids(x._2)).min }
          ids.indices.iterator.map(i => Row(ids(i), subMin(sub(i))))
        }
      }

    // ---- giant violated components: deterministic detach fallback -----
    // never ship a >maxComponentSize edge list into one task; instead
    // detach the GREATER endpoint of every cannot-link pair into its own
    // singleton. Pairwise separation holds: of any forbidden pair at
    // most one endpoint stays behind, and every detached node is alone.
    val detached = violations.join(bigViolated, "component")
      .select(greatest(col("id1"), col("id2")).as("id"))
      .distinct()

    val relabels = reclustered
      .unionByName(detached.select(col("id"), col("id").as("component")))
    labels.join(relabels.withColumnRenamed("component", "fixed"), Seq("id"), "left")
      .select(col("id"), coalesce(col("fixed"), col("component")).as("component"))
  }
}
