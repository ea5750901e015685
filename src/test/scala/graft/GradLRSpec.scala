package graft

import org.apache.spark.sql.functions._
import graft.score.GradLR

/** Distributed full-batch LR (score/GradLR) vs an in-memory reference. */
class GradLRSpec extends SparkSpec {
  import spark.implicits._

  private def half(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Independent single-threaded twin of GradLR.fit's exact arithmetic. */
  private def reference(feats: Seq[(Long, String, Long)],
      labels: Map[Long, Double], iters: Int, lr: Double): Map[String, Long] = {
    val n = labels.size
    var w = Map.empty[String, Long].withDefaultValue(0L)
    for (_ <- 1 to iters) {
      val m = feats.groupBy(_._1).view.mapValues(
        _.map { case (_, f, x) => x * w(f) }.sum).toMap
      val r = labels.map { case (id, y) =>
        id -> (1.0 / (1.0 + math.exp(-m.getOrElse(id, 0L) / 1e6)) - y)
      }
      val g = feats.groupBy(_._2).view.mapValues(
        _.map { case (id, _, x) => half(x * r(id) * 1e6) }.sum).toMap
      w = (w.keySet ++ g.keySet).map { f =>
        f -> (w(f) - half(lr * g.getOrElse(f, 0L) / n))
      }.toMap.withDefaultValue(0L)
    }
    w
  }

  test("fit matches the in-memory reference bit for bit") {
    val feats = Seq(
      (1L, "good", 3L), (1L, "spark", 1L), (1L, "__bias__", 1L),
      (2L, "good", 1L), (2L, "bad", 1L), (2L, "__bias__", 1L),
      (3L, "bad", 2L), (3L, "spark", 2L), (3L, "__bias__", 1L),
      (4L, "bad", 1L), (4L, "__bias__", 1L))
    val labels = Map(1L -> 1.0, 2L -> 1.0, 3L -> 0.0, 4L -> 0.0)
    val got = GradLR.fit(feats.toDF("id", "feature", "x"),
        labels.toSeq.toDF("id", "y"), iters = 3, learnRate = 0.5)
      .as[(String, Long)].collect().toMap
    assert(got == reference(feats, labels, 3, 0.5))
  }

  test("learns a separable vocabulary to full training accuracy") {
    val docs = (1 to 60).map { i =>
      if (i % 2 == 0) (i.toLong, "good clean prose text", 1.0)
      else (i.toLong, "bad spam junk text", 0.0)
    }
    val feats = GradLR.tokenFeatures(
      docs.toDF("id", "text", "y"), "id", "text")
    val labels = docs.map(d => (d._1, d._3)).toDF("id", "y")
    val w = GradLR.fit(feats, labels, iters = 10, learnRate = 5.0)
    val acc = GradLR.predict(feats, w).join(labels, "id")
      .filter((col("score") > 0.5) === (col("y") === 1.0)).count()
    assert(acc == 60)
  }

  test("hashed features train to the same separation") {
    val docs = (1 to 60).map { i =>
      if (i % 2 == 0) (i.toLong, "good clean prose text", 1.0)
      else (i.toLong, "bad spam junk text", 0.0)
    }
    val feats = GradLR.hashFeatures(GradLR.tokenFeatures(
      docs.toDF("id", "text", "y"), "id", "text"), bits = 18)
    val labels = docs.map(d => (d._1, d._3)).toDF("id", "y")
    val w = GradLR.fit(feats, labels, iters = 10, learnRate = 5.0)
    val acc = GradLR.predict(feats, w).join(labels, "id")
      .filter((col("score") > 0.5) === (col("y") === 1.0)).count()
    assert(acc == 60)
    // weight table is bounded by the hash space, not the vocabulary
    assert(w.count() <= (1L << 18))
  }

  test("a step on a different batch keeps absent features' weights") {
    val w0 = Seq(("stale", 123456L)).toDF("feature", "w")
    val feats = Seq((1L, "fresh", 1L)).toDF("id", "feature", "x")
    val labels = Seq((1L, 1.0)).toDF("id", "y")
    val w1 = GradLR.step(feats, labels, w0, learnRate = 0.5)
      .as[(String, Long)].collect().toMap
    assert(w1("stale") == 123456L)
    assert(w1.contains("fresh"))
  }
}
