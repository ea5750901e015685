package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
 * Scale shape: the input is normalized to a simple undirected graph
 * (canonical orientation, self-loops dropped, parallel duplicates
 * collapsed — a duplicated candidate pair is the same assertion, not a
 * second cable), then ONE base CC partitions the edge set by component
 * and each component runs an iterative explicit-stack low-link DFS in a
 * single task — O(V+E), primitive CSR adjacency + int arrays behind an
 * open-addressing intern table, ~40 B/edge. Components are entity-sized
 * by construction upstream (the giant-component cap in CC); the
 * `maxComponentEdges` guard fails fast with the offending component's
 * label rather than OOM if a caller feeds an uncapped graph.
 */
object Bridges {

  /**
   * @param edges (id1, id2) match edges, any orientation, duplicates and
   *              self-loops tolerated (normalized away)
   * @return one row per bridge of the simple graph:
   *         (id1, id2, component) with id1 < id2 and component = the
   *         CC label (min reachable id) of the edge's component
   */
  def bridgeEdges(edges: DataFrame, maxComponentEdges: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val simple = edges
      .select(least(col("id1"), col("id2")).cast("long").as("u"),
        greatest(col("id1"), col("id2")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val base = ConnectedComponents.run(
      simple.select(col("u").as("id1"), col("v").as("id2"))).labels
    val cap = maxComponentEdges
    simple
      .join(base.withColumnRenamed("id", "u")
        .withColumnRenamed("component", "_comp"), Seq("u"))
      .select(col("_comp"), col("u"), col("v"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (comp, it) =>
        // --- collect the component's edges into primitive arrays ---
        val ub = new scala.collection.mutable.ArrayBuilder.ofLong
        val vb = new scala.collection.mutable.ArrayBuilder.ofLong
        var m = 0
        it.foreach { t =>
          if (m >= cap) throw new IllegalStateException(
            s"component $comp exceeds maxComponentEdges=$cap — cap the " +
              "match graph (giant-component cap) before bridge analysis")
          ub += t._2; vb += t._3; m += 1
        }
        val eu = ub.result(); val ev = vb.result()
        // --- intern node ids -> [0, n) via open addressing ---
        var tcap = Integer.highestOneBit(math.max(8, m * 4) - 1) << 1
        val keys = new Array[Long](tcap); val used = new Array[Boolean](tcap)
        val idx = new Array[Int](tcap)
        var n = 0
        def intern(key: Long): Int = {
          var h = java.lang.Long.hashCode(key) & (tcap - 1)
          while (used(h) && keys(h) != key) h = (h + 1) & (tcap - 1)
          if (used(h)) idx(h)
          else { keys(h) = key; used(h) = true; idx(h) = n; n += 1; idx(h) }
        }
        val es = new Array[Int](m); val et = new Array[Int](m)
        var i = 0
        while (i < m) { es(i) = intern(eu(i)); et(i) = intern(ev(i)); i += 1 }
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
        // --- iterative low-link DFS; tree arc with low[child] > disc[u]
        //     marks edge child-ward as a bridge ---
        val disc = Array.fill(n)(-1); val low = new Array[Int](n)
        val viaArc = new Array[Int](n) // arc that discovered the node
        val stkNode = new Array[Int](n); val stkPtr = new Array[Int](n)
        val isBridge = new Array[Boolean](m)
        var timer = 0
        var root = 0
        while (root < n) {
          if (disc(root) == -1) {
            var sp = 0
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
                }
              }
            }
          }
          root += 1
        }
        (0 until m).iterator.filter(isBridge).map(e => (eu(e), ev(e), comp))
      }
      .toDF("id1", "id2", "component")
  }

  /** Bridges whose score sits below `floor` — the review surface: each
    * row is one borderline edge whose veto splits an entity in two.
    * `scoredPairs` must carry (id1, id2, scoreCol); score lookup joins
    * on the canonical orientation. */
  def weakBridges(scoredPairs: DataFrame, scoreCol: String,
      floor: Double, maxComponentEdges: Int = 2000000): DataFrame = {
    val canon = scoredPairs.select(
      least(col("id1"), col("id2")).as("id1"),
      greatest(col("id1"), col("id2")).as("id2"),
      col(scoreCol))
    bridgeEdges(canon.select("id1", "id2"), maxComponentEdges)
      .join(canon.groupBy("id1", "id2").agg(max(col(scoreCol)).as(scoreCol)),
        Seq("id1", "id2"))
      .filter(col(scoreCol) < floor)
  }
}
