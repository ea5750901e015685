package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Score-threshold selection (SURVEY.md §2.5 C11) — the reference's
 * `dedupe:api (fn threshold / ThresholdMixin)†`: choose θ maximizing the
 * recall-weighted F-score estimated from the score distribution, treating
 * each pair's score as its match probability (dedupe's trick: no labels
 * needed — expected precision at θ is mean score above θ, expected recall
 * is mass above θ over total mass).
 *
 * Distributed: ONE aggregation builds a fixed-width score histogram;
 * the θ argmax runs driver-side over the (tiny) histogram.
 */
object Threshold {

  /** @param scoredPairs needs a `score` column in [0,1]
    * @param recallWeight dedupe's recall_weight (1.0 = F1)
    * @param bins histogram resolution */
  def select(scoredPairs: DataFrame, recallWeight: Double = 1.0,
      bins: Int = 200): Double = {
    val hist = scoredPairs
      .select(least(floor(col("score") * bins).cast("int"), lit(bins - 1)).as("bin"),
        col("score"))
      .groupBy("bin")
      .agg(count("*").as("n"), sum("score").as("mass"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    val totalMass = hist.map(_._3).sum
    if (totalMass == 0.0) return 0.5

    // sweep θ = bin lower edges from high to low, accumulating counts/mass
    var bestTheta = 0.5
    var bestScore = Double.MinValue
    var nAbove = 0L
    var massAbove = 0.0
    hist.reverse.foreach { case (bin, n, mass) =>
      nAbove += n
      massAbove += mass
      val theta = bin.toDouble / bins
      val precision = massAbove / nAbove
      val recall = massAbove / totalMass
      // F-beta with beta = recallWeight, matching dedupe's recall_weight
      // semantics†: (1+β²)·P·R / (β²·P + R) — β, not β², was used here
      // before, silently re-parameterizing the knob for any weight ≠ 1
      val b2 = recallWeight * recallWeight
      val f = (1 + b2) * precision * recall / (b2 * precision + recall)
      if (f > bestScore) { bestScore = f; bestTheta = theta }
    }
    bestTheta
  }
}
