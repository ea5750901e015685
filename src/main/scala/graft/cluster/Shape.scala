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
 * in a single task over primitive CSR arrays — exact, no approximation.
 * The eccentricity loop is BoundingDiameters (Takes & Kosters 2011†,
 * the iFUB family): each BFS from a chosen source fixes that node's
 * eccentricity exactly and bounds every other node's within
 * [max(d, ecc−d), ecc+d]; nodes whose bounds can no longer move the
 * diameter OR the radius drop out, and real entity components resolve
 * in a handful of BFS runs instead of V of them (worst case remains
 * O(V·(V+E)) — the adversarial graphs where no bound helps). That
 * residual quadratic is the point of the `maxComponentNodes` guard
 * (default 4096): entity-sized components cost ≤ a few ms; anything
 * bigger should have hit the giant-component cap upstream, so the guard
 * fails fast instead of burning a task on an uncapped graph.
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
        // BoundingDiameters: exact diameter AND radius, few BFS typical
        val dist = new Array[Int](n); val queue = new Array[Int](n)
        val eccLo = new Array[Int](n)
        val eccHi = new Array[Int](n)
        java.util.Arrays.fill(eccHi, Int.MaxValue)
        val active = new Array[Boolean](n)
        java.util.Arrays.fill(active, true)
        var nActive = n
        var dLo = 0                 // max exact/lower ecc seen
        var rHi = Int.MaxValue      // min exact/upper ecc seen
        def bfsEcc(src: Int): Int = {
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
          ecc
        }
        // first source: max-degree node (center-ish — the classic
        // double-sweep opener); then alternate the bound we attack
        var pick = 0
        var v = 1
        while (v < n) {
          if (off(v + 1) - off(v) > off(pick + 1) - off(pick)) pick = v
          v += 1
        }
        var highTurn = true
        while (nActive > 0) {
          val ecc = bfsEcc(pick)
          if (ecc > dLo) dLo = ecc
          if (ecc < rHi) rHi = ecc
          // tighten every node's band with this BFS's distances, drop
          // nodes that can no longer move the diameter or the radius,
          // and choose the next source while scanning
          var nextPick = -1; var nextKey = 0
          v = 0
          while (v < n) {
            if (active(v)) {
              val d = dist(v)
              val lo = math.max(d, ecc - d)
              if (lo > eccLo(v)) eccLo(v) = lo
              if (ecc + d < eccHi(v)) eccHi(v) = ecc + d
              if (eccLo(v) == eccHi(v) ||
                  (eccHi(v) <= dLo && eccLo(v) >= rHi)) {
                // resolved: an exact band contributes its value; a
                // dominated band can't change either statistic
                if (eccLo(v) == eccHi(v)) {
                  if (eccLo(v) > dLo) dLo = eccLo(v)
                  if (eccHi(v) < rHi) rHi = eccHi(v)
                }
                active(v) = false; nActive -= 1
              } else {
                // attack the larger gap: alternate between the node
                // whose upper bound most exceeds dLo (diameter side)
                // and the one whose lower bound most undercuts rHi
                val key = if (highTurn) eccHi(v) else -eccLo(v)
                if (nextPick < 0 || key > nextKey ||
                    (key == nextKey &&
                      off(v + 1) - off(v) > off(nextPick + 1) - off(nextPick))) {
                  nextPick = v; nextKey = key
                }
              }
            }
            v += 1
          }
          // re-drop pass: dLo/rHi may have tightened after a node's
          // bounds were tested above (monotone, so one extra sweep)
          v = 0
          while (v < n) {
            if (active(v) && eccHi(v) <= dLo && eccLo(v) >= rHi) {
              active(v) = false; nActive -= 1
              if (v == nextPick) nextPick = -1
            }
            v += 1
          }
          if (nextPick < 0 && nActive > 0) {
            // pick survived neither scan: take any remaining active node
            v = 0
            while (v < n && !active(v)) v += 1
            nextPick = v
          }
          pick = nextPick
          highTurn = !highTurn
        }
        (comp, n.toLong, m.toLong, dLo.toLong, rHi.toLong)
      }
      .toDF("component", "n_nodes", "n_edges", "diameter", "radius")
  }
}
