package graft

import graft.cluster.Cores

/** k-core decomposition (cluster/Cores). */
class CoresSpec extends SparkSpec {
  import spark.implicits._

  private def cores(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Cores.coreNumbers(edges.toDF("id1", "id2"))
      .select("id", "core").as[(Long, Long)].collect().toMap

  test("core numbers: chain=1, triangle=2, clique4=3, pendant=1") {
    assert(cores(Seq((1L, 2L), (2L, 3L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(cores(Seq((1L, 2L), (2L, 3L), (3L, 1L))).values.toSet == Set(2L))
    val clique4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = cores(clique4 :+ ((4L, 9L))) // plus a pendant off node 4
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 9L -> 1L))
  }

  test("kCore relabels within the core: peeling the glue splits components") {
    // two 4-cliques joined through a degree-2 middle record: the middle
    // peels at k=3 and the core falls apart into the two cliques
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val es = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 50L), (50L, 10L))
    val got = Cores.kCore(es.toDF("id1", "id2"), k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("fuzz: core numbers match naive iterated peeling at every k") {
    val rnd = new scala.util.Random(41)
    for (round <- 0 until 4) {
      val es = (0 until 80).map { _ =>
        val a = rnd.nextInt(24).toLong; val b = rnd.nextInt(24).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      def survivors(k: Int): Set[Long] = {
        var adj = es.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        var changed = true
        while (changed) {
          val kill = adj.collect { case (u, s) if s.size < k => u }.toSet
          changed = kill.nonEmpty
          adj = adj.collect { case (u, s) if !kill(u) =>
            u -> (s -- kill)
          }
        }
        adj.keySet
      }
      val naive = es.flatMap(e => Seq(e._1, e._2)).distinct.map { u =>
        u -> (1 to 24).reverse.find(k => survivors(k)(u)).getOrElse(0).toLong
      }.toMap
      assert(cores(es) == naive, s"round $round")
    }
  }
}
