package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import ComponentGraphs.{simpleEdges, byComponent, collectComponent, Interner}

/**
 * Bridge edges of the match graph — the over-merge repair primitive.
 *
 * A transitive entity is only as trustworthy as its weakest cut: two
 * dense duplicate families glued together by ONE borderline pair
 * collapse into a single merged entity, and that glue edge is a BRIDGE
 * — its removal disconnects the component (Tarjan 1974, low-link†).
 * Surfacing bridges (optionally only those whose score sits below a
 * floor) hands a reviewer exactly the edges whose veto splits an
 * over-merged entity; the repair is local by construction, no
 * cluster-wide recompute.
 *
 * Scale shape: input normalized once to a simple undirected graph
 * ([[ComponentGraphs.simpleEdges]]), ONE base CC partitions the edge
 * set by component, and each component runs an iterative explicit-stack
 * low-link DFS in a single task — O(V+E), primitive CSR adjacency +
 * int arrays behind the shared open-addressing interner, ~40 B/edge.
 * Components are entity-sized by construction upstream (the
 * giant-component cap in CC); the `maxComponentEdges` guard fails fast
 * with the offending component's label rather than OOM if a caller
 * feeds an uncapped graph.
 */
object Bridges {

  /** Per-component low-link kernel: runs the iterative DFS over the
    * component's simple edges and returns (bridge edge flags, cut-vertex
    * node ids). Shared by [[bridgeEdges]] and [[cutVertices]]. */
  private def lowLinkKernel(eu: Array[Long], ev: Array[Long])
      : (Array[Boolean], Array[Long]) = {
    val m = eu.length
    val interner = new Interner(m)
    val es = new Array[Int](m); val et = new Array[Int](m)
    var i = 0
    while (i < m) {
      es(i) = interner.intern(eu(i)); et(i) = interner.intern(ev(i)); i += 1
    }
    val n = interner.n
    // --- CSR adjacency: arc j of edge e=j>>1, reverse arc = j^1 ---
    val deg = new Array[Int](n + 1)
    i = 0
    while (i < m) { deg(es(i) + 1) += 1; deg(et(i) + 1) += 1; i += 1 }
    i = 1
    while (i <= n) { deg(i) += deg(i - 1); i += 1 }
    val off = java.util.Arrays.copyOf(deg, n) // running fill cursor
    val arcTo = new Array[Int](2 * m); val arcId = new Array[Int](2 * m)
    i = 0
    while (i < m) {
      arcTo(off(es(i))) = et(i); arcId(off(es(i))) = 2 * i; off(es(i)) += 1
      arcTo(off(et(i))) = es(i); arcId(off(et(i))) = 2 * i + 1; off(et(i)) += 1
      i += 1
    }
    // --- iterative low-link DFS. Tree arc with low[child] > disc[u]:
    //     bridge. Non-root u with a child where low[child] >= disc[u]:
    //     cut vertex; a root is one iff it has >= 2 tree children. ---
    val disc = Array.fill(n)(-1); val low = new Array[Int](n)
    val viaArc = new Array[Int](n) // arc that discovered the node
    val stkNode = new Array[Int](n); val stkPtr = new Array[Int](n)
    val isBridge = new Array[Boolean](m)
    val isCut = new Array[Boolean](n)
    var timer = 0
    var root = 0
    while (root < n) {
      if (disc(root) == -1) {
        var sp = 0
        var rootKids = 0
        stkNode(0) = root; stkPtr(0) = deg(root); viaArc(root) = -1
        disc(root) = timer; low(root) = timer; timer += 1
        while (sp >= 0) {
          val u = stkNode(sp)
          if (stkPtr(sp) < deg(u + 1)) {
            val a = stkPtr(sp); stkPtr(sp) += 1
            val w = arcTo(a)
            // skip ONLY the reverse arc of the tree arc we came by —
            // on a simple graph that's exactly the parent edge
            if (arcId(a) != (viaArc(u) ^ 1)) {
              if (disc(w) == -1) {
                viaArc(w) = arcId(a)
                disc(w) = timer; low(w) = timer; timer += 1
                sp += 1; stkNode(sp) = w; stkPtr(sp) = deg(w)
              } else if (disc(w) < low(u)) low(u) = disc(w)
            }
          } else {
            sp -= 1
            if (sp >= 0) {
              val p = stkNode(sp)
              if (low(u) < low(p)) low(p) = low(u)
              if (low(u) > disc(p)) isBridge(viaArc(u) >> 1) = true
              if (sp == 0) rootKids += 1
              else if (low(u) >= disc(p)) isCut(p) = true
            }
          }
        }
        if (rootKids >= 2) isCut(root) = true
      }
      root += 1
    }
    val cuts = new scala.collection.mutable.ArrayBuilder.ofLong
    i = 0
    while (i < n) { if (isCut(i)) cuts += interner.nodeId(i); i += 1 }
    (isBridge, cuts.result())
  }

  /** [[bridgeEdges]] over an ALREADY-normalized simple edge frame —
    * callers that have paid the distinct shuffle pass it here instead
    * of re-normalizing. */
  private[cluster] def bridgeEdgesSimple(simple: DataFrame,
      maxComponentEdges: Int): DataFrame = {
    val spark = simple.sparkSession
    import spark.implicits._
    val cap = maxComponentEdges
    byComponent(simple)
      .flatMapGroups { (comp, it) =>
        val (eu, ev) = collectComponent(comp, it, cap, "bridge analysis")
        val (isBridge, _) = lowLinkKernel(eu, ev)
        eu.indices.iterator.filter(isBridge).map(e => (eu(e), ev(e), comp))
      }
      .toDF("id1", "id2", "component")
  }

  /**
   * @param edges (id1, id2) match edges, any orientation, duplicates and
   *              self-loops tolerated (normalized away)
   * @return one row per bridge of the simple graph:
   *         (id1, id2, component) with id1 < id2 and component = the
   *         CC label (min reachable id) of the edge's component
   */
  def bridgeEdges(edges: DataFrame, maxComponentEdges: Int = 2000000): DataFrame =
    bridgeEdgesSimple(simpleEdges(edges), maxComponentEdges)

  /**
   * Articulation records: nodes whose removal disconnects their entity —
   * the single RECORD (as opposed to a bridge's single pair) gluing two
   * duplicate families together, typically a dirty row matching both.
   *
   * @return one row per cut vertex: (id, component)
   */
  def cutVertices(edges: DataFrame, maxComponentEdges: Int = 2000000): DataFrame = {
    val simple = simpleEdges(edges)
    val spark = simple.sparkSession
    import spark.implicits._
    val cap = maxComponentEdges
    byComponent(simple)
      .flatMapGroups { (comp, it) =>
        val (eu, ev) = collectComponent(comp, it, cap, "cut analysis")
        val (_, cuts) = lowLinkKernel(eu, ev)
        cuts.iterator.map(id => (id, comp))
      }
      .toDF("id", "component")
  }

  /** Canonical-orientation scores, max-deduped per pair. The groupBy
    * IS the distinct, so `select(id1, id2)` of the result is already a
    * simple edge frame (modulo self-loops) — no second shuffle. */
  private def canonScores(scoredPairs: DataFrame, scoreCol: String): DataFrame =
    scoredPairs.select(
        least(col("id1"), col("id2")).cast("long").as("id1"),
        greatest(col("id1"), col("id2")).cast("long").as("id2"),
        col(scoreCol))
      .filter(col("id1") =!= col("id2"))
      .groupBy("id1", "id2").agg(max(col(scoreCol)).as(scoreCol))

  private def weakOfSimple(simple: DataFrame, scores: DataFrame,
      scoreCol: String, floor: Double, cap: Int): DataFrame =
    bridgeEdgesSimple(simple, cap)
      .join(scores, Seq("id1", "id2"))
      .filter(col(scoreCol) < floor)

  /** Bridges whose score sits below `floor` — the review surface: each
    * row is one borderline edge whose veto splits an entity in two.
    * `scoredPairs` must carry (id1, id2, scoreCol); score lookup joins
    * on the canonical orientation. */
  def weakBridges(scoredPairs: DataFrame, scoreCol: String,
      floor: Double, maxComponentEdges: Int = 2000000): DataFrame = {
    val scores = canonScores(scoredPairs, scoreCol)
    weakOfSimple(scores.select("id1", "id2"), scores,
      scoreCol, floor, maxComponentEdges)
  }

  /**
   * Apply the repair: delete every weak bridge and relabel. Safe by
   * construction — removing a NON-bridge below the floor would only
   * thin a cluster that stays connected anyway, but removing a weak
   * BRIDGE splits exactly the entities glued by one borderline pair;
   * nothing else moves. Every node of the ORIGINAL graph keeps a row
   * (a node orphaned by the deletion becomes its own singleton entity),
   * so the output is a total relabeling, not an edge-incident subset.
   * The node universe is read from `scoredPairs` BEFORE the self-loop
   * filter, so a record appearing only in self-loop pairs still gets
   * its singleton row.
   *
   * @return (id, component) for every node of the input graph, labels
   *         carrying CC's min-reachable-id contract over the kept edges
   */
  def splitWeakBridges(scoredPairs: DataFrame, scoreCol: String,
      floor: Double, maxComponentEdges: Int = 2000000): DataFrame = {
    // materialize the canon-score census once: it feeds the bridge
    // analysis' edge frame, the weak-score join AND the kept-edge
    // anti-join — three consumers that would each re-run the groupBy
    // (and the full scored-pair scan behind it) otherwise
    val scores = Checkpoints.checkpointed(
      canonScores(scoredPairs, scoreCol), scoredPairs.sparkSession)
    val simple = scores.select("id1", "id2")
    val weak = weakOfSimple(simple, scores, scoreCol, floor, maxComponentEdges)
      .select("id1", "id2")
    val kept = simple.join(weak, Seq("id1", "id2"), "left_anti")
    // kept ⊆ the canonical simple edges, so the relabel skips CC's
    // re-normalize distinct and takes the size-adaptive labels path
    val labels = ConnectedComponents.labelsOfSimple(kept)
    scoredPairs
      .select(explode(array(col("id1").cast("long"),
        col("id2").cast("long"))).as("id"))
      // a pair with a null endpoint contributes its non-null side only —
      // without this, the exploded null would miss the labels join and
      // surface as a phantom (null, null) row in the "total relabeling"
      .filter(col("id").isNotNull)
      .distinct()
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
