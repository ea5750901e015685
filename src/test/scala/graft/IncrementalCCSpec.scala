package graft

import graft.cluster.ConnectedComponents
import org.apache.spark.sql.DataFrame

/** Incremental transitive closure: CC(star(CC(E1)) ∪ E2) = CC(E1 ∪ E2),
  * and labels untouched by the batch stay put. */
class IncrementalCCSpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def full(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    asMap(ConnectedComponents.labelAll(
      vertices.toDF("id"), "id", edges.toDF("id1", "id2")))

  test("batch joining two old components equals full recompute") {
    val v = Seq(1L, 2L, 3L, 4L, 5L)
    val e1 = Seq((1L, 2L), (3L, 4L))
    val prev = ConnectedComponents.labelAll(v.toDF("id"), "id", e1.toDF("id1", "id2"))
    val e2 = Seq((2L, 3L), (5L, 6L)) // merge {1,2}+{3,4}; new node 6
    val got = asMap(ConnectedComponents.incrementalLabelAll(prev, e2.toDF("id1", "id2")))
    assert(got == full(v :+ 6L, e1 ++ e2))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("untouched components keep their exact previous label") {
    val v = (1L to 10L).toSeq
    val e1 = Seq((1L, 2L), (3L, 4L), (7L, 8L))
    val prev = ConnectedComponents.labelAll(v.toDF("id"), "id", e1.toDF("id1", "id2"))
    val got = asMap(ConnectedComponents.incrementalLabelAll(
      prev, Seq((9L, 10L)).toDF("id1", "id2")))
    val before = asMap(prev)
    (1L to 8L).foreach(i => assert(got(i) == before(i), s"label of $i churned"))
    assert(got(9L) == 9L && got(10L) == 9L)
  }

  test("fuzz: incremental equals full recompute") {
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 5) {
      val n = 40
      val all = (0 until 80).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val (e1, e2) = all.splitAt(all.length / 2)
      val v = (0L until n.toLong).toSeq
      val prev = ConnectedComponents.labelAll(v.toDF("id"), "id", e1.toDF("id1", "id2"))
      val got = asMap(ConnectedComponents.incrementalLabelAll(prev, e2.toDF("id1", "id2")))
      assert(got == full(v, e1 ++ e2), s"round $round diverged")
    }
  }
}
