package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise-F1 harness (BASELINE.json:2,14): F1 is measured on labeled
 * pairs drawn AT SHARED BLOCKING KEYS — i.e. over the candidate-pair set
 * itself — so it scores classification fidelity, exactly like the
 * reference's evaluation on labeled pairs†.
 */
object Eval {

  case class PRF(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
  }

  /**
   * @param scoredPairs (id1, id2, score)
   * @param truth (id, cluster) ground-truth assignment
   * @param theta decision threshold
   */
  def pairwiseF1(scoredPairs: DataFrame, truth: DataFrame, theta: Double): PRF = {
    val t1 = truth.select(col("id").as("id1"), col("cluster").as("c1"))
    val t2 = truth.select(col("id").as("id2"), col("cluster").as("c2"))
    val labeled = scoredPairs.join(t1, "id1").join(t2, "id2")
      .select(
        (col("score") >= theta).as("pred"),
        (col("c1") === col("c2")).as("truth"))
    val r = labeled.agg(
      sum(when(col("pred") && col("truth"), 1L).otherwise(0L)),
      sum(when(col("pred") && !col("truth"), 1L).otherwise(0L)),
      sum(when(!col("pred") && col("truth"), 1L).otherwise(0L))).collect()(0)
    PRF(
      Option(r.get(0)).fold(0L)(_ => r.getLong(0)),
      Option(r.get(1)).fold(0L)(_ => r.getLong(1)),
      Option(r.get(2)).fold(0L)(_ => r.getLong(2)))
  }

  /** Same but judging the CLUSTERING output (component assignment) rather
    * than raw scores — predicted = same component. */
  def clusteringF1(pairs: DataFrame, labels: DataFrame, truth: DataFrame): PRF = {
    val l1 = labels.select(col("id").as("id1"), col("component").as("p1"))
    val l2 = labels.select(col("id").as("id2"), col("component").as("p2"))
    val t1 = truth.select(col("id").as("id1"), col("cluster").as("c1"))
    val t2 = truth.select(col("id").as("id2"), col("cluster").as("c2"))
    val j = pairs.join(l1, "id1").join(l2, "id2").join(t1, "id1").join(t2, "id2")
      .select((col("p1") === col("p2")).as("pred"), (col("c1") === col("c2")).as("truth"))
    val r = j.agg(
      sum(when(col("pred") && col("truth"), 1L).otherwise(0L)),
      sum(when(col("pred") && !col("truth"), 1L).otherwise(0L)),
      sum(when(!col("pred") && col("truth"), 1L).otherwise(0L))).collect()(0)
    PRF(
      Option(r.get(0)).fold(0L)(_ => r.getLong(0)),
      Option(r.get(1)).fold(0L)(_ => r.getLong(1)),
      Option(r.get(2)).fold(0L)(_ => r.getLong(2)))
  }
}
