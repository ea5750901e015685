package graft

import graft.cluster.ClusterEval
import org.apache.spark.sql.DataFrame

/** Adjusted Rand agreement between labelings (cluster/ClusterEval). */
class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: DataFrame): (Long, Long, Long, Long, Double, Double) = {
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5))
  }

  test("identical labelings agree perfectly, relabeling-invariant") {
    val a = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("id", "component")
    // same partition, different cluster ids
    val b = Seq((1L, 9L), (2L, 9L), (3L, 7L), (4L, 7L), (5L, 0L))
      .toDF("id", "component")
    val (n, sb, sa, sb2, ri, ari) = row(ClusterEval.adjustedRand(a, b))
    assert(n == 5 && sb == 2 && sa == 2 && sb2 == 2)
    assert(ri == 1.0 && ari == 1.0)
  }

  test("textbook contingency spot value") {
    // A = {1,2,3},{4,5,6}; B = {1,2},{3,4,5},{6}
    val a = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L)
      .toDF("id", "component")
    val b = Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 3L)
      .toDF("id", "component")
    val (n, sBoth, sA, sB, ri, ari) = row(ClusterEval.adjustedRand(a, b))
    // contingency rows: (1: 2,1,0) (2: 0,2,1) → s_both = C(2,2)+C(2,2) = 2
    // s_a = 2*C(3,2) = 6; s_b = C(2,2)+C(3,2)+0 = 4; C(6,2) = 15
    assert(n == 6 && sBoth == 2 && sA == 6 && sB == 4)
    // exp = 6*4/15 = 1.6; ari = (2-1.6)/((6+4)/2-1.6) = 0.4/3.4
    assert(math.abs(ari - 0.117647) < 1e-9)
    // ri = 1 - (6+4-2*2)/15 = 1 - 6/15 = 0.6
    assert(math.abs(ri - 0.6) < 1e-9)
  }

  test("degenerate: all singletons on both sides → ari 1.0 by convention") {
    val a = Seq(1L -> 1L, 2L -> 2L, 3L -> 3L).toDF("id", "component")
    val (_, _, _, _, ri, ari) = row(ClusterEval.adjustedRand(a, a))
    assert(ri == 1.0 && ari == 1.0)
  }

  test("bcubed: textbook contingency spot values") {
    // truth = {1,2,3},{4,5,6}; pred = {1,2},{3,4,5},{6}
    val truth = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L)
      .toDF("id", "component")
    val pred = Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 3L)
      .toDF("id", "component")
    val r = ClusterEval.bcubed(pred, truth).collect()(0)
    assert(r.getLong(0) == 6)
    // P per record: 1,1,1/3,2/3,2/3,1 → 7/9; R: 2/3,2/3,1/3,2/3,2/3,1/3 → 5/9
    assert(math.abs(r.getDouble(1) - 0.777778) < 2e-6)
    assert(math.abs(r.getDouble(2) - 0.555556) < 2e-6)
    assert(math.abs(r.getDouble(3) - 35.0 / 54.0) < 2e-6) // 0.648148
  }

  test("bcubed: identical labelings → all 1.0; relabeling-invariant") {
    val a = Seq(1L -> 4L, 2L -> 4L, 3L -> 9L).toDF("id", "component")
    val b = Seq(1L -> 7L, 2L -> 7L, 3L -> 1L).toDF("id", "component")
    val r = ClusterEval.bcubed(a, b).collect()(0)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
  }

  test("bcubed: precision/recall duality under argument swap") {
    val rnd = new scala.util.Random(11)
    val ids = (1L to 50L)
    val a = ids.map(i => i -> rnd.nextInt(7).toLong).toDF("id", "component")
    val b = ids.map(i => i -> rnd.nextInt(4).toLong).toDF("id", "component")
    val ab = ClusterEval.bcubed(a, b).collect()(0)
    val ba = ClusterEval.bcubed(b, a).collect()(0)
    assert(ab.getDouble(1) == ba.getDouble(2)) // P(a,b) == R(b,a)
    assert(ab.getDouble(2) == ba.getDouble(1))
    assert(ab.getDouble(3) == ba.getDouble(3))
  }

  test("fuzz: symmetry + self-agreement + range") {
    val rnd = new scala.util.Random(5)
    for (round <- 0 until 3) {
      val ids = (1L to 40L)
      val a = ids.map(i => i -> (rnd.nextInt(6).toLong)).toDF("id", "component")
      val b = ids.map(i => i -> (rnd.nextInt(6).toLong)).toDF("id", "component")
      val (_, _, _, _, _, ab) = row(ClusterEval.adjustedRand(a, b))
      val (_, _, _, _, _, ba) = row(ClusterEval.adjustedRand(b, a))
      val (_, _, _, _, riaa, aa) = row(ClusterEval.adjustedRand(a, a))
      assert(ab == ba, s"round $round: asymmetric")
      assert(aa == 1.0 && riaa == 1.0, s"round $round: self-agreement != 1")
      assert(ab <= 1.0 && ab >= -1.0, s"round $round: out of range")
    }
  }
}
