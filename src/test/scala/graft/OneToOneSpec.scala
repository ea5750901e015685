package graft

import org.apache.spark.sql.functions._
import graft.cluster.OneToOne

class OneToOneSpec extends SparkSpec {
  import spark.implicits._

  /** the definition the distributed algorithm must reproduce exactly:
    * walk pairs in (score desc, id1, id2) order, keep a pair iff both
    * endpoints are still free */
  private def sequentialGreedy(pairs: Seq[(Long, Long, Double)],
      bipartite: Boolean): Set[(Long, Long)] = {
    val usedL = scala.collection.mutable.Set[Long]()
    val usedR = if (bipartite) scala.collection.mutable.Set[Long]() else usedL
    val out = scala.collection.mutable.Set[(Long, Long)]()
    for ((a, b, _) <- pairs.sortBy { case (a, b, s) => (-s, a, b) })
      if (!usedL.contains(a) && !usedR.contains(b)) {
        usedL += a; usedR += b; out += ((a, b))
      }
    out.toSet
  }

  private def run(pairs: Seq[(Long, Long, Double)], bipartite: Boolean) =
    OneToOne.greedyMatch(pairs.toDF("id1", "id2", "score"), bipartite)
      .pairs.select("id1", "id2").as[(Long, Long)].collect().toSet

  test("bipartite matching equals sequential greedy on a hand fixture") {
    val edges = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (2L, 10L, 0.85),
      (2L, 11L, 0.7), (3L, 11L, 0.6), (3L, 12L, 0.95))
    assert(run(edges, bipartite = true) == Set((1L, 10L), (2L, 11L), (3L, 12L)))
    assert(run(edges, bipartite = true) == sequentialGreedy(edges, bipartite = true))
  }

  test("randomized: distributed result == sequential greedy (both modes)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3; bipartite <- Seq(true, false)) {
      // discrete scores force ties -> exercises the (id1, id2) tie-break.
      // non-bipartite endpoints draw from ONE overlapping range so nodes
      // genuinely appear in both roles (the mode's distinguishing case)
      val edges = (1 to 200).flatMap { _ =>
        val a = rnd.nextInt(40).toLong
        val b = if (bipartite) (rnd.nextInt(40) + 100).toLong
                else rnd.nextInt(40).toLong
        if (!bipartite && a == b) None
        else Some((math.min(a, b), math.max(a, b), (rnd.nextInt(8) + 1) / 8.0))
      }.groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      assert(run(edges, bipartite) == sequentialGreedy(edges, bipartite),
        s"trial=$trial bipartite=$bipartite")
    }
  }

  test("same-universe reflexive pairs are dropped, not a livelock") {
    // a self-loop can never be locally dominant; it must be filtered at
    // entry instead of stalling the drain until maxIter
    val edges = Seq((5L, 5L, 0.9), (1L, 2L, 0.8))
    assert(run(edges, bipartite = false) == Set((1L, 2L)))
  }

  test("same-universe mode: shared ids across roles conflict correctly") {
    // node 2 appears as id2 of (1,2) and id1 of (2,3): matching (1,2)
    // must kill (2,3) in same-universe mode, not in bipartite mode
    val edges = Seq((1L, 2L, 0.9), (2L, 3L, 0.8))
    assert(run(edges, bipartite = false) == Set((1L, 2L)))
    assert(run(edges, bipartite = true) == Set((1L, 2L), (2L, 3L)))
  }

  test("chain needs multiple dominant rounds and stays one-to-one") {
    // path graph with descending scores: greedy takes alternate edges
    val edges = (1L to 9L).map(i => (i, i + 1, 1.0 - i * 0.05))
    val got = run(edges, bipartite = false)
    assert(got == sequentialGreedy(edges, bipartite = false))
    val nodes = got.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(nodes.distinct.size == nodes.size) // matching: no node twice
  }

  test("empty input yields empty matching with the INPUT schema") {
    val empty = Seq.empty[(String, String, Double)].toDF("id1", "id2", "score")
    val out = OneToOne.greedyMatch(empty).pairs
    assert(out.isEmpty)
    assert(out.schema("id1").dataType == org.apache.spark.sql.types.StringType)
  }
}
