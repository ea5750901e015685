package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Isotonic score calibration — maps raw classifier scores to calibrated
 * match probabilities by monotone (pool-adjacent-violators) regression
 * (Zadrozny & Elkan 2002†; PAV per Robertson–Wright–Dykstra, Order
 * Restricted Statistical Inference†). The LR sigmoid ranks pairs well
 * but its probabilities drift once thresholds/weights come from a
 * different label mix; isotonic re-reads "score 0.97" as "the observed
 * match rate among pairs scoring like this", monotonicity enforced.
 *
 * Scale shape: the labeled set is human-review-sized BY CONSTRUCTION
 * (the same bounded-collect contract as Training's driver-side LR fit),
 * so pooling by distinct score is one map-combined aggregate and the
 * PAV stack runs driver-side on the pooled points; the returned mapping
 * is a small table a caller broadcast-joins onto any scored frame.
 *
 * Determinism contract: equal scores pool FIRST (labels average), then
 * PAV merges adjacent violators. With 0/1 labels every block mean is
 * the division of two exact integers, and the fit equals the minimax
 * characterization fit(x) = max_{i≤x} min_{j≥x} mean(y[i..j]) — the
 * identity the DuckDB oracle computes directly (q_isotonic), so the
 * calibrated values are bit-identical cross-engine.
 */
object Calibration {

  /** Driver-side weighted PAV over (weight, ySum) points already sorted
    * ascending by score. Returns the fitted value per input point. */
  def pav(w: Array[Double], ySum: Array[Double]): Array[Double] = {
    val k = w.length
    val bw = new Array[Double](k); val bs = new Array[Double](k)
    val bCnt = new Array[Int](k) // input points absorbed by each block
    var top = -1
    var i = 0
    while (i < k) {
      top += 1; bw(top) = w(i); bs(top) = ySum(i); bCnt(top) = 1
      while (top > 0 && bs(top - 1) * bw(top) >= bs(top) * bw(top - 1)) {
        // previous mean >= current mean (cross-multiplied: exact for
        // integer-valued operands) -> violator: merge
        bw(top - 1) += bw(top); bs(top - 1) += bs(top)
        bCnt(top - 1) += bCnt(top); top -= 1
      }
      i += 1
    }
    val out = new Array[Double](k)
    var b = 0; var j = 0
    while (b <= top) {
      val mean = bs(b) / bw(b)
      var c = 0
      while (c < bCnt(b)) { out(j) = mean; j += 1; c += 1 }
      b += 1
    }
    out
  }

  /**
   * @param labeled frame carrying a raw score and a {0,1} (or [0,1])
   *                label per reviewed pair
   * @return (score, n, calibrated): one row per distinct score,
   *         ascending, with the monotone calibrated probability
   */
  def isotonicTable(labeled: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val pooled = labeled
      .select(col(scoreCol).cast("double").as("score"),
        col(labelCol).cast("double").as("y"))
      .filter(col("score").isNotNull && col("y").isNotNull)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("ysum"))
      .orderBy(col("score"))
      .as[(Double, Long, Double)].collect()
    val fit = pav(pooled.map(_._2.toDouble), pooled.map(_._3))
    pooled.indices.map(i => (pooled(i)._1, pooled(i)._2, fit(i)))
      .toDF("score", "n", "calibrated")
  }

  /** Calibrate a scored frame with the fitted step function: each score
    * takes the calibrated value of the LARGEST fitted score ≤ it (scores
    * below the smallest fitted point clamp to its value; NaN propagates
    * — a broken upstream ratio must surface, not masquerade as a
    * confidently-low probability). Broadcast range lookup — the mapping
    * is review-sized, the scored frame is not. */
  def applyTable(scored: DataFrame, mapping: DataFrame,
      scoreCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val steps = mapping.select(col("score"), col("calibrated"))
      .as[(Double, Double)].collect().sortBy(_._1)
    require(steps.nonEmpty, "empty calibration mapping")
    val bc = spark.sparkContext.broadcast(steps)
    val look = udf { s: Double =>
      val arr = bc.value
      var lo = 0; var hi = arr.length - 1
      if (s.isNaN) Double.NaN
      else if (s <= arr(0)._1) arr(0)._2
      else {
        while (lo < hi) { // largest index with score <= s
          val mid = (lo + hi + 1) >>> 1
          if (arr(mid)._1 <= s) lo = mid else hi = mid - 1
        }
        arr(lo)._2
      }
    }
    scored.withColumn("calibrated", look(col(scoreCol).cast("double")))
  }
}
