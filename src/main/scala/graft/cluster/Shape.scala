package graft.cluster

import org.apache.spark.sql.DataFrame
import ComponentGraphs.{simpleEdges, byComponent, collectComponent, Interner}

/**
 * Entity shape diagnostics — exact diameter/radius per component of the
 * match graph. A healthy duplicate family is ball-shaped (every record
 * a couple of hops from every other); a CHAIN-merged entity — A≈B≈C≈…
 * where the ends share nothing — is long and thin. Diameter vs size is
 * the reviewer's tell: diameter ≈ n−1 means the entity exists only by
 * transitivity through a chain of borderline pairs, the exact shape
 * [[Bridges]] and [[Cores]] then localize.
 *
 * Scale shape: one base CC partitions the edge set; each component runs
 * all-pairs BFS over primitive CSR arrays in a single task — exact, no
 * approximation, O(V·(V+E)) per component. That quadratic is the point
 * of the `maxComponentNodes` guard (default 4096): entity-sized
 * components cost ≤ a few ms; anything bigger should have hit the
 * giant-component cap upstream, so the guard fails fast instead of
 * burning a task on an uncapped graph.
 */
object Shape {

  /**
   * @param edges (id1, id2) match edges, any orientation, duplicates
   *              and self-loops tolerated (normalized away)
   * @return one row per component:
   *         (component, n_nodes, n_edges, diameter, radius) — diameter
   *         = max over nodes of eccentricity, radius = min; a
   *         single-edge component reports (2, 1, 1, 1)
   */
  def entityShapes(edges: DataFrame, maxComponentNodes: Int = 4096,
      maxComponentEdges: Int = 2000000): DataFrame = {
    val simple = simpleEdges(edges)
    val spark = simple.sparkSession
    import spark.implicits._
    val nodeCap = maxComponentNodes
    val edgeCap = maxComponentEdges
    byComponent(simple)
      .mapGroups { (comp, it) =>
        val (eu, ev) = collectComponent(comp, it, edgeCap, "shape analysis")
        val m = eu.length
        val interner = new Interner(m)
        val es = new Array[Int](m); val et = new Array[Int](m)
        var i = 0
        while (i < m) {
          es(i) = interner.intern(eu(i)); et(i) = interner.intern(ev(i))
          i += 1
        }
        val n = interner.n
        if (n > nodeCap) throw new IllegalStateException(
          s"component $comp has $n nodes > maxComponentNodes=$nodeCap — " +
            "cap the match graph (giant-component cap) before shape analysis")
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
        // all-pairs BFS: eccentricity per source, then max/min
        val dist = new Array[Int](n); val queue = new Array[Int](n)
        var diameter = 0; var radius = Int.MaxValue
        var src = 0
        while (src < n) {
          java.util.Arrays.fill(dist, -1)
          dist(src) = 0; queue(0) = src
          var head = 0; var tail = 1
          var ecc = 0
          while (head < tail) {
            val u = queue(head); head += 1
            var a = off(u)
            while (a < off(u + 1)) {
              val w = arcTo(a)
              if (dist(w) < 0) {
                dist(w) = dist(u) + 1
                if (dist(w) > ecc) ecc = dist(w)
                queue(tail) = w; tail += 1
              }
              a += 1
            }
          }
          if (ecc > diameter) diameter = ecc
          if (ecc < radius) radius = ecc
          src += 1
        }
        (comp, n.toLong, m.toLong, diameter.toLong, radius.toLong)
      }
      .toDF("component", "n_nodes", "n_edges", "diameter", "radius")
  }
}
