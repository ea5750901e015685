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
   * @param maxDistinctScores fail-fast bound on the driver collect:
   *                pooling by score is only driver-sized when scores are
   *                DISCRETE. A continuous-score frame (47M LR sigmoids)
   *                has one distinct value per row and would collect the
   *                whole frame — with the cap it fails fast and points
   *                at [[fixedWidthBins]]/[[quantileBins]] instead of
   *                OOMing the driver.
   * @return (score, n, calibrated): one row per distinct score,
   *         ascending, with the monotone calibrated probability
   */
  def isotonicTable(labeled: DataFrame, scoreCol: String,
      labelCol: String, maxDistinctScores: Int = 100000): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val grouped = labeled
      .select(col(scoreCol).cast("double").as("score"),
        col(labelCol).cast("double").as("y"))
      .filter(col("score").isNotNull && col("y").isNotNull)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("ysum"))
    // the count is one extra distributed aggregate over the already-
    // pooled frame (distinct-score-sized input, 1-row output) — cheap
    // insurance against a corpus-sized collect
    val distinct = grouped.count()
    require(distinct <= maxDistinctScores,
      s"$distinct distinct scores exceed maxDistinctScores=" +
        s"$maxDistinctScores - the PAV pool would collect one row per " +
        "distinct score onto the driver. Pre-bin continuous scores " +
        "(Calibration.fixedWidthBins / quantileBins) or raise the " +
        "cap deliberately.")
    val pooled = grouped.orderBy(col("score"))
      .as[(Double, Long, Double)].collect()
    val fit = pav(pooled.map(_._2.toDouble), pooled.map(_._3))
    pooled.indices.map(i => (pooled(i)._1, pooled(i)._2, fit(i)))
      .toDF("score", "n", "calibrated")
  }

  /**
   * Pre-binning for mass calibration over CONTINUOUS scores: replaces
   * each score with its bin's representative so [[isotonicTable]]'s
   * distinct-score pool is bounded by `bins` regardless of corpus size.
   *
   *  - `fixedWidthBins`: score → lower edge of its width-(hi−lo)/bins
   *    bin, clamped into [lo, hi]. One codegen'd expression, no shuffle,
   *    deterministic — the default for probability-like scores on [0,1].
   *  - `quantileBins`: bin edges = exact distributed quantiles
   *    (stats/Quantiles — MSD-radix censuses, no sort, driver work
   *    corpus-size-independent), so each bin carries equal mass even
   *    under heavy score skew; the score maps to the largest edge ≤ it
   *    via a broadcast range join of the `bins`-row edge table.
   */
  def fixedWidthBins(labeled: DataFrame, scoreCol: String, bins: Int,
      lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo: $bins, [$lo,$hi]")
    val width = (hi - lo) / bins
    val s = col(scoreCol).cast("double")
    val idx = least(lit(bins - 1), greatest(lit(0),
      floor((s - lit(lo)) / lit(width)).cast("int")))
    // null/NaN scores stay null/NaN instead of silently becoming the lo
    // bin (greatest() SKIPS nulls and a non-ANSI NaN→int cast is 0, so
    // the bare expression would fabricate real-looking bottom-bin rows
    // that isotonicTable's isNotNull filter can no longer drop)
    labeled.withColumn(scoreCol,
      when(s.isNull, lit(null).cast("double"))
        .when(isnan(s), lit(Double.NaN))
        .otherwise(lit(lo) + idx * lit(width)))
  }

  /** See [[fixedWidthBins]]. Equal-mass edges from the exact quantile
    * operator (driver sees only the `bins`-element edge list — the
    * quantile kernel's own censuses are 2^16-bounded); ties in heavy
    * mass points collapse edges (fewer, larger bins — correct under
    * PAV, which pools equal scores anyway). Scores below the smallest
    * edge clamp up to it, so the output's distinct-score count is
    * ≤ `bins` by construction. */
  def quantileBins(labeled: DataFrame, scoreCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"need bins>0: $bins")
    val qs = (1 to bins).map(_.toDouble / bins)
    val spark = labeled.sparkSession
    import spark.implicits._
    val edgeArr = graft.stats.Quantiles.quantilesDisc(
        labeled.select(col(scoreCol).cast("double").as(scoreCol))
          .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol))), scoreCol, qs)
      .select(col("value").cast("double")).as[Double]
      .collect().distinct.sorted
    require(edgeArr.nonEmpty, "no scores to bin")
    val arrCol = array(edgeArr.map(lit(_)): _*)
    val s = col(scoreCol).cast("double")
    // null/NaN preserved (not coalesced into the bottom edge): a failed
    // comparator's row must stay filterable, not bias the first bin
    labeled.withColumn(scoreCol,
      when(s.isNull, lit(null).cast("double"))
        .when(isnan(s), lit(Double.NaN))
        .otherwise(coalesce(
          array_max(filter(arrCol, e => e <= s)), lit(edgeArr.head))))
  }

  /** Calibrate a scored frame with the fitted step function: each score
    * takes the calibrated value of the LARGEST fitted score ≤ it (scores
    * below the smallest fitted point clamp to its value; NaN propagates
    * — a broken upstream ratio must surface, not masquerade as a
    * confidently-low probability). The lookup is a native codegen'd
    * expression (`StepLookupExpr`: binary search over the plan-shipped
    * sorted table), not a Scala UDF — this apply runs once per CORPUS
    * row, and a UDF here was the one non-codegen operator on that path;
    * the mapping itself is review-sized (isotonic cap), so shipping it
    * in the task binary costs what the broadcast did. */
  def applyTable(scored: DataFrame, mapping: DataFrame,
      scoreCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val steps = mapping.select(col("score"), col("calibrated"))
      .as[(Double, Double)].collect().sortBy(_._1)
    require(steps.nonEmpty, "empty calibration mapping")
    scored.withColumn("calibrated", graft.gfunctions.step_lookup(
      col(scoreCol).cast("double"), steps.map(_._1), steps.map(_._2)))
  }
}
