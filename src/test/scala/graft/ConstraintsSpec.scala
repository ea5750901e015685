package graft

import graft.cluster.{ConnectedComponents, Constraints}
import org.apache.spark.sql.DataFrame

/** Cannot-link enforcement (cluster/Constraints): the human "distinct"
  * label must be binding on the final entities. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long, Double)]): DataFrame =
    ConnectedComponents.run(
      edges.map(e => (e._1, e._2)).toDF("id1", "id2")).labels

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("strong chain splits at the cannot-link pair") {
    val scored = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (3L, 4L, 0.9))
    val got = asMap(Constraints.enforceCannotLink(
      labelsOf(scored), scored.toDF("id1", "id2", "score"),
      Seq((1L, 4L)).toDF("id1", "id2")))
    assert(got(1L) == got(2L))
    assert(got(3L) == got(4L))
    assert(got(1L) != got(4L))
    // stable sub-ids: min member
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("unviolated components pass through untouched") {
    val scored = Seq((1L, 2L, 0.9), (10L, 11L, 0.9))
    val labels = labelsOf(scored)
    // cannot-link across two DIFFERENT components: no violation
    val got = asMap(Constraints.enforceCannotLink(
      labels, scored.toDF("id1", "id2", "score"),
      Seq((1L, 10L)).toDF("id1", "id2")))
    assert(got == asMap(labels))
  }

  test("giant-component fallback detaches the greater endpoint") {
    val scored = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (3L, 4L, 0.9), (4L, 5L, 0.9))
    val got = asMap(Constraints.enforceCannotLink(
      labelsOf(scored), scored.toDF("id1", "id2", "score"),
      Seq((1L, 5L), (2L, 4L)).toDF("id1", "id2"),
      maxComponentSize = 3))
    // 5 and 4 detach; 1,2,3 keep the CC label
    assert(got(5L) == 5L && got(4L) == 4L)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
  }

  test("must-link edges merge components through transitive closure") {
    val edges = Seq((1L, 2L), (10L, 11L)).toDF("id1", "id2")
    val ml = Seq((2L, 10L)).toDF("id1", "id2")
    val got = asMap(ConnectedComponents.run(
      Constraints.withMustLink(edges, ml)).labels)
    assert(got.values.toSet == Set(1L))
  }

  test("fuzz: constraint always holds, output refines CC, deterministic") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 5) {
      val n = 30
      val scored = (0 until 60).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b), 0.6 + rnd.nextDouble() * 0.4)
      }.filter(e => e._1 != e._2).distinct
      val cl = (0 until 6).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val labels = labelsOf(scored)
      val scoredDf = scored.toDF("id1", "id2", "score")
      val clDf = cl.toDF("id1", "id2")
      val got = asMap(Constraints.enforceCannotLink(labels, scoredDf, clDf))
      val got2 = asMap(Constraints.enforceCannotLink(labels, scoredDf, clDf))
      val orig = asMap(labels)
      assert(got == got2, s"round $round: nondeterministic")
      assert(got.keySet == orig.keySet, s"round $round: ids lost/added")
      cl.foreach { case (a, b) =>
        if (got.contains(a) && got.contains(b))
          assert(got(a) != got(b), s"round $round: cannot-link ($a,$b) co-labeled")
      }
      // refinement: members of one output cluster were one CC component
      got.groupBy(_._2).values.foreach { members =>
        assert(members.keys.map(orig).toSet.size == 1,
          s"round $round: output cluster spans CC components")
      }
    }
  }
}
