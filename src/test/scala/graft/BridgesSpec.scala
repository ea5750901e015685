package graft

import graft.cluster.Bridges
import org.apache.spark.sql.DataFrame

/** Bridge-edge detection for over-merge repair (cluster/Bridges). */
class BridgesSpec extends SparkSpec {
  import spark.implicits._

  private def bridges(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    Bridges.bridgeEdges(edges.toDF("id1", "id2"))
      .select("id1", "id2").as[(Long, Long)].collect().toSet

  test("chain: every edge is a bridge; cycle: none") {
    assert(bridges(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Set((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(bridges(Seq((1L, 2L), (2L, 3L), (3L, 1L))).isEmpty)
  }

  test("two triangles glued by one edge: only the glue is a bridge") {
    val tri1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val tri2 = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    assert(bridges(tri1 ++ tri2 :+ ((3L, 10L))) == Set((3L, 10L)))
  }

  test("normalization: duplicates collapse, self-loops drop, orientation-free") {
    // the 1-2 edge appears three ways; still ONE edge, still a bridge
    assert(bridges(Seq((1L, 2L), (2L, 1L), (1L, 2L), (5L, 5L))) ==
      Set((1L, 2L)))
    // a parallel duplicate must NOT turn a bridge into a non-bridge:
    // the simple graph collapses it (same assertion, not a second cable)
    assert(bridges(Seq((1L, 2L), (2L, 1L), (2L, 3L))) ==
      Set((1L, 2L), (2L, 3L)))
  }

  test("component labels carry CC's min-id contract") {
    val got = Bridges.bridgeEdges(
        Seq((5L, 9L), (20L, 21L), (21L, 22L), (22L, 20L), (22L, 30L))
          .toDF("id1", "id2"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((5L, 9L, 5L), (22L, 30L, 20L)))
  }

  test("weakBridges: only bridges under the floor survive, with scores") {
    val scored = Seq(
      (1L, 2L, 0.99), (2L, 3L, 0.99), (3L, 1L, 0.99), // cycle, strong
      (3L, 10L, 0.62),                                // weak glue bridge
      (10L, 11L, 0.99)                                // strong bridge
    ).toDF("id1", "id2", "score")
    val got = Bridges.weakBridges(scored, "score", floor = 0.8)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((3L, 10L, 1L, 0.62)))
  }

  test("splitWeakBridges: weak glue splits, strong bridges stay, orphans kept") {
    val scored = Seq(
      (1L, 2L, 0.99), (2L, 3L, 0.99), (3L, 1L, 0.99), // strong triangle
      (3L, 10L, 0.62),                                // weak bridge: cut
      (10L, 11L, 0.99), (11L, 12L, 0.99), (12L, 10L, 0.99),
      (20L, 21L, 0.55),                               // weak bridge, BOTH
                                                      // ends orphaned -> singletons
      (30L, 31L, 0.55), (31L, 32L, 0.55), (32L, 30L, 0.55) // weak CYCLE:
                                                      // no bridge, survives whole
    ).toDF("id1", "id2", "score")
    val got = Bridges.splitWeakBridges(scored, "score", floor = 0.8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 21L,
      30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("splitWeakBridges: a null endpoint contributes its non-null side only") {
    val scored = Seq(
      (Some(1L), Some(2L), 0.99),
      (Some(5L), None: Option[Long], 0.9) // hostile: half a pair
    ).toDF("id1", "id2", "score")
    val got = Bridges.splitWeakBridges(scored, "score", floor = 0.8)
      .as[(Long, Long)].collect().toMap
    // no phantom (null, null) row; 5 survives as its own singleton
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }

  private def cuts(edges: Seq[(Long, Long)]): Set[Long] =
    Bridges.cutVertices(edges.toDF("id1", "id2"))
      .select("id").as[Long].collect().toSet

  test("cutVertices: chain interior, star hub, triangle glue nodes") {
    assert(cuts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == Set(2L, 3L))
    assert(cuts(Seq((1L, 2L), (2L, 3L), (3L, 1L))).isEmpty)
    assert(cuts(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == Set(1L))
    // two triangles glued by an edge: BOTH its endpoints are cuts
    val tri1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val tri2 = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    assert(cuts(tri1 ++ tri2 :+ ((3L, 10L))) == Set(3L, 10L))
    // glued through a SHARED record instead: only the hub is a cut
    val tri2b = Seq((3L, 11L), (11L, 12L), (12L, 3L))
    assert(cuts(tri1 ++ tri2b) == Set(3L))
  }

  test("fuzz: cutVertices matches naive remove-node-and-recheck") {
    val rnd = new scala.util.Random(17)
    for (round <- 0 until 4) {
      val es = (0 until 60).map { _ =>
        val a = rnd.nextInt(20).toLong; val b = rnd.nextInt(20).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      def splitsAt(x: Long): Boolean = {
        val nbrs = es.collect {
          case (a, b) if a == x => b
          case (a, b) if b == x => a
        }.distinct
        if (nbrs.length < 2) false
        else {
          val adj = es.filter(e => e._1 != x && e._2 != x)
            .flatMap(e => Seq(e, e.swap))
            .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
          val seen = scala.collection.mutable.Set(nbrs.head)
          val q = scala.collection.mutable.Queue(nbrs.head)
          while (q.nonEmpty) {
            val u = q.dequeue()
            adj.getOrElse(u, Nil).foreach(w => if (seen.add(w)) q.enqueue(w))
          }
          nbrs.exists(!seen(_))
        }
      }
      assert(cuts(es) == nodes.filter(splitsAt).toSet, s"round $round")
    }
  }

  test("fuzz: matches naive remove-edge-and-recheck-connectivity") {
    val rnd = new scala.util.Random(13)
    for (round <- 0 until 4) {
      val es = (0 until 60).map { _ =>
        val a = rnd.nextInt(22).toLong; val b = rnd.nextInt(22).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      def reaches(skip: (Long, Long), from: Long, to: Long): Boolean = {
        val adj = es.filter(_ != skip).flatMap(e => Seq(e, e.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val seen = scala.collection.mutable.Set(from)
        val q = scala.collection.mutable.Queue(from)
        while (q.nonEmpty) {
          val u = q.dequeue()
          adj.getOrElse(u, Nil).foreach(w =>
            if (seen.add(w)) q.enqueue(w))
        }
        seen(to)
      }
      val naive = es.filter(e => !reaches(e, e._1, e._2)).toSet
      assert(bridges(es) == naive, s"round $round")
    }
  }
}
