package graft

import graft.cluster.ThresholdSweep
import org.apache.spark.sql.DataFrame

/** Threshold sensitivity sweep (cluster/ThresholdSweep). */
class ThresholdSweepSpec extends SparkSpec {
  import spark.implicits._

  private val scored = Seq(
    (1L, 2L, 0.99), (2L, 3L, 0.80), (3L, 4L, 0.99), // chain, weak middle
    (10L, 11L, 0.90),
    (20L, 21L, 0.60)).toDF("id1", "id2", "score")

  private def rows(df: DataFrame): Map[Double, (Long, Long, Long)] =
    df.collect().map(r =>
      r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("sweep stats at each threshold, zeros when nothing survives") {
    val got = rows(ThresholdSweep.sweep(scored, Seq(0.5, 0.85, 0.95, 1.0)))
    assert(got(0.5) == ((8L, 3L, 4L)))   // {1..4}, {10,11}, {20,21}
    assert(got(0.85) == ((6L, 3L, 2L)))  // {1,2},{3,4},{10,11}
    assert(got(0.95) == ((4L, 2L, 2L)))  // {1,2},{3,4}
    assert(got(1.0) == ((0L, 0L, 0L)))   // nothing clusters — still a row
  }

  test("sweepFast equals sweep on the fixture, including the zero row") {
    val thetas = Seq(0.5, 0.85, 0.95, 1.0)
    assert(rows(ThresholdSweep.sweepFast(scored, thetas)) ==
      rows(ThresholdSweep.sweep(scored, thetas)))
  }

  test("sweepFast equals sweep under fuzz, incl. giant-component fallback") {
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 3) {
      val es = (0 until 120).map { _ =>
        val a = rnd.nextInt(30).toLong; val b = rnd.nextInt(30).toLong
        (math.min(a, b), math.max(a, b), rnd.nextDouble())
      }.filter(e => e._1 != e._2).toDF("id1", "id2", "score")
      val thetas = Seq(0.15, 0.4, 0.7, 0.9, 0.999)
      val naive = rows(ThresholdSweep.sweep(es, thetas))
      assert(rows(ThresholdSweep.sweepFast(es, thetas)) == naive,
        s"round $round: fast != naive")
      // cap of 1 edge forces EVERY component through the naive fallback
      assert(rows(ThresholdSweep.sweepFast(es, thetas,
        maxComponentEdges = 1)) == naive, s"round $round: fallback != naive")
    }
  }

  test("sweepFast matches sweep on NaN scores and self-loops") {
    // Spark `col >= θ` admits NaN at every θ (NaN sorts largest); CC.run
    // drops self-loop edges — both paths must agree on both edge cases
    val weird = Seq(
      (1L, 2L, Double.NaN),  // kept at EVERY theta, even 1.0
      (5L, 5L, 0.99),        // self-loop: contributes nothing
      (5L, 6L, 0.60),
      (7L, 7L, 0.95)         // node 7 has ONLY a self-loop: never counted
    ).toDF("id1", "id2", "score")
    val thetas = Seq(0.5, 0.9, 1.0)
    val naive = rows(ThresholdSweep.sweep(weird, thetas))
    assert(naive(1.0) == ((2L, 1L, 2L)), "NaN edge must survive θ=1.0")
    assert(naive(0.9) == ((2L, 1L, 2L)), "self-loops must not count")
    assert(rows(ThresholdSweep.sweepFast(weird, thetas)) == naive)
    assert(rows(ThresholdSweep.sweepFast(weird, thetas,
      maxComponentEdges = 1)) == naive, "fallback path parity")
  }

  test("fuzz: rising theta refines components; stats monotone") {
    val rnd = new scala.util.Random(11)
    for (round <- 0 until 3) {
      val es = (0 until 50).map { _ =>
        val a = rnd.nextInt(25).toLong; val b = rnd.nextInt(25).toLong
        (math.min(a, b), math.max(a, b), rnd.nextDouble())
      }.filter(e => e._1 != e._2).distinct.toDF("id1", "id2", "score")
      val thetas = Seq(0.2, 0.5, 0.8)
      val stats = rows(ThresholdSweep.sweep(es, thetas))
      val labelSets = thetas.map { th =>
        ThresholdSweep.labelsAt(es, th).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      thetas.sliding(2).zip(labelSets.sliding(2)).foreach {
        case (Seq(lo, hi), Seq(lmap, hmap)) =>
          // node and largest-component counts can only shrink
          assert(stats(hi)._1 <= stats(lo)._1, s"round $round: n_nodes grew")
          assert(stats(hi)._3 <= stats(lo)._3, s"round $round: largest grew")
          // refinement: a hi-θ component never spans two lo-θ components
          hmap.groupBy(_._2).values.foreach { members =>
            assert(members.keys.map(lmap).toSet.size == 1,
              s"round $round: θ=$hi component spans θ=$lo components")
          }
        case _ => ()
      }
    }
  }
}
