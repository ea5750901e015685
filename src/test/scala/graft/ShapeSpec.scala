package graft

import graft.cluster.Shape

/** Entity shape diagnostics (cluster/Shape). */
class ShapeSpec extends SparkSpec {
  import spark.implicits._

  private def shapes(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long, Long)] =
    Shape.entityShapes(edges.toDF("id1", "id2"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("chain vs clique vs star: diameter tells the merge shape") {
    // 5-chain: the chain-merge smell — diameter = n-1, radius = ceil((n-1)/2)
    assert(shapes(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ==
      Map(1L -> ((5L, 4L, 4L, 2L))))
    // 4-clique: ball-shaped, diameter 1
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(shapes(clique) == Map(1L -> ((4L, 6L, 1L, 1L))))
    // star: hub radius 1... actually hub ecc 1, leaves ecc 2
    assert(shapes(Seq((1L, 2L), (1L, 3L), (1L, 4L))) ==
      Map(1L -> ((4L, 3L, 2L, 1L))))
    // two components report independently; single edge -> (2,1,1,1)
    assert(shapes(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L))) ==
      Map(1L -> ((3L, 3L, 1L, 1L)), 10L -> ((2L, 1L, 1L, 1L))))
  }

  test("long path and even cycle: pruning must stay exact at the extremes") {
    // 30-path: diameter 29, radius 15 — the worst case for naive bound
    // tricks; BoundingDiameters must still return the exact pair
    val path = (1L until 30L).map(i => (i, i + 1))
    assert(shapes(path) == Map(1L -> ((30L, 29L, 29L, 15L))))
    // 12-cycle: every ecc = 6 -> diameter = radius = 6
    val cyc = (1L until 12L).map(i => (i, i + 1)) :+ (12L, 1L)
    assert(shapes(cyc) == Map(1L -> ((12L, 12L, 6L, 6L))))
  }

  test("fuzz: diameter/radius match naive Floyd-Warshall") {
    val rnd = new scala.util.Random(43)
    for (round <- 0 until 8) {
      // later rounds are bigger and sparser (long chains survive),
      // exercising the bound-pruning loop far from the clique regime
      val nn = if (round < 4) 16 else 48
      val ne = if (round < 4) 40 else 60
      val es = (0 until ne).map { _ =>
        val a = rnd.nextInt(nn).toLong; val b = rnd.nextInt(nn).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val idx = nodes.zipWithIndex.toMap
      val n = nodes.length
      val INF = 1 << 20
      val d = Array.fill(n, n)(INF)
      nodes.indices.foreach(i => d(i)(i) = 0)
      es.foreach { e => d(idx(e._1))(idx(e._2)) = 1; d(idx(e._2))(idx(e._1)) = 1 }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
      // group nodes by reachability; compute per-component stats
      val naive = nodes.indices.groupBy(i =>
          nodes.indices.filter(j => d(i)(j) < INF).map(nodes).min)
        .map { case (comp, members) =>
          val eccs = members.map(i =>
            members.map(j => d(i)(j)).max)
          comp -> ((members.size.toLong,
            es.count(e => members.contains(idx(e._1)) &&
              members.contains(idx(e._2))).toLong,
            eccs.max.toLong, eccs.min.toLong))
        }
      assert(shapes(es) == naive, s"round $round")
    }
  }
}
