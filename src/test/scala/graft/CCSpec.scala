package graft

import graft.cluster.ConnectedComponents

/** F7 fixtures: hand-built edge lists → expected components. */
class CCSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("id1", "id2")).labels
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain a-b-c is transitive") {
    val got = components(Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star") {
    val got = components(Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("two disjoint components") {
    val got = components(Seq((1L, 2L), (10L, 11L), (11L, 12L)))
    assert(got(1L) == 1L && got(2L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
  }

  test("long path (worst case for naive propagation)") {
    val n = 64
    val edges = (1L until n).map(i => (i, i + 1))
    val got = components(edges)
    assert(got.values.toSet == Set(1L))
    assert(got.size == n)
  }

  test("duplicate + reversed edges are harmless") {
    val got = components(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelAll adds singletons") {
    val vertices = Seq(1L, 2L, 3L, 99L).toDF("id")
    val got = ConnectedComponents
      .labelAll(vertices, "id", Seq((1L, 2L)).toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 99L -> 99L))
  }
}
