package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import ComponentGraphs.{simpleEdges, byComponent, collectComponent, Interner}

/**
 * k-core decomposition of the match graph — the robustness complement
 * to [[Bridges]]: where a bridge is the single pair whose veto splits
 * an entity, a node's CORE NUMBER is the largest k for which it
 * survives repeatedly deleting every record with fewer than k strong
 * matches (Matula & Beck 1983, degeneracy ordering†). High-core nodes
 * form the entity's trust kernel — the subset that stays together no
 * matter which individual borderline record a reviewer vetoes; core 1
 * pendants are the records hanging off it by a thread.
 *
 * Scale shape: one base CC partitions the edge set by component; each
 * component runs the linear bucket-peeling pass (O(V+E), primitive
 * arrays behind [[ComponentGraphs]]' shared interner) in a single
 * task, with the same fail-fast `maxComponentEdges` guard as Bridges.
 */
object Cores {

  /** [[coreNumbers]] over an ALREADY-normalized simple edge frame. */
  private[cluster] def coreNumbersSimple(simple: DataFrame,
      maxComponentEdges: Int): DataFrame = {
    val spark = simple.sparkSession
    import spark.implicits._
    val cap = maxComponentEdges
    byComponent(simple)
      .flatMapGroups { (comp, it) =>
        val (eu, ev) = collectComponent(comp, it, cap, "core analysis")
        val m = eu.length
        val interner = new Interner(m)
        val es = new Array[Int](m); val et = new Array[Int](m)
        var i = 0
        while (i < m) {
          es(i) = interner.intern(eu(i)); et(i) = interner.intern(ev(i))
          i += 1
        }
        val n = interner.n
        // CSR adjacency
        val off = new Array[Int](n + 1)
        i = 0
        while (i < m) { off(es(i) + 1) += 1; off(et(i) + 1) += 1; i += 1 }
        i = 1
        while (i <= n) { off(i) += off(i - 1); i += 1 }
        val cur = java.util.Arrays.copyOf(off, n)
        val arcTo = new Array[Int](2 * m)
        i = 0
        while (i < m) {
          arcTo(cur(es(i))) = et(i); cur(es(i)) += 1
          arcTo(cur(et(i))) = es(i); cur(et(i)) += 1
          i += 1
        }
        // Matula-Beck bucket peel: process nodes in increasing current
        // degree; core(u) = its degree at removal time (monotone max)
        val deg = new Array[Int](n)
        i = 0
        while (i < n) { deg(i) = off(i + 1) - off(i); i += 1 }
        val maxDeg = if (n == 0) 0 else deg.max
        val bucketStart = new Array[Int](maxDeg + 2)
        i = 0
        while (i < n) { bucketStart(deg(i) + 1) += 1; i += 1 }
        i = 1
        while (i <= maxDeg + 1) { bucketStart(i) += bucketStart(i - 1); i += 1 }
        val order = new Array[Int](n); val pos = new Array[Int](n)
        val fill = java.util.Arrays.copyOf(bucketStart, maxDeg + 1)
        i = 0
        while (i < n) {
          order(fill(deg(i))) = i; pos(i) = fill(deg(i)); fill(deg(i)) += 1
          i += 1
        }
        val core = new Array[Int](n)
        var k = 0
        i = 0
        while (i < n) {
          val u = order(i)
          if (deg(u) > k) k = deg(u)
          core(u) = k
          var a = off(u)
          while (a < off(u + 1)) {
            val w = arcTo(a)
            if (deg(w) > deg(u)) {
              // swap w to the front of its degree bucket, then shrink it
              val dw = deg(w); val pw = pos(w)
              val front = bucketStart(dw)
              val other = order(front)
              order(front) = w; order(pw) = other
              pos(w) = front; pos(other) = pw
              bucketStart(dw) += 1
              deg(w) = dw - 1
            }
            a += 1
          }
          i += 1
        }
        (0 until n).iterator
          .map(x => (interner.nodeId(x), core(x).toLong, comp))
      }
      .toDF("id", "core", "component")
  }

  /**
   * @param edges (id1, id2) match edges, any orientation, duplicates
   *              and self-loops tolerated (normalized away)
   * @return (id, core, component) per edge-incident node: its core
   *         number and its base CC label (min reachable id)
   */
  def coreNumbers(edges: DataFrame, maxComponentEdges: Int = 2000000): DataFrame =
    coreNumbersSimple(simpleEdges(edges), maxComponentEdges)

  /** Nodes of the k-core, relabeled WITHIN the core subgraph (deleting
    * low-core nodes can split a component; labels follow CC's
    * min-reachable-id contract over the surviving edges). */
  def kCore(edges: DataFrame, k: Int,
      maxComponentEdges: Int = 2000000): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val simple = simpleEdges(edges)
    val cores = coreNumbersSimple(simple, maxComponentEdges)
      .filter(col("core") >= k).select(col("id"))
    val coreEdges = simple
      .join(cores.withColumnRenamed("id", "id1"), Seq("id1"))
      .join(cores.withColumnRenamed("id", "id2"), Seq("id2"))
      .select("id1", "id2")
    // every k-core node (k >= 1) has >= 1 surviving edge by definition,
    // so CC's edge-incident labeling already covers the full node set;
    // coreEdges ⊆ the canonical simple edges, so the relabel skips the
    // re-normalize distinct and takes the size-adaptive labels path
    ConnectedComponents.labelsOfSimple(coreEdges)
  }
}
