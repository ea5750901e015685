package graft.block

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocking quality metrics (beyond the reference; the standard ER
 * evaluation triple — Christen, "Data Matching" 2012†; Papadakis et al.
 * blocking surveys†): given the candidate pairs a blocking scheme
 * generates and a labeled ground-truth pair set, report
 *
 *  - reduction ratio  RR = 1 − |C| / (n·(n−1)/2) — how much of the
 *    quadratic comparison space the scheme eliminated;
 *  - pair completeness PC = |C ∩ T| / |T| — recall of true pairs
 *    (a blocking scheme's only correctness risk);
 *  - pairs quality    PQ = |C ∩ T| / |C| — precision of the candidate
 *    stream (how much comparator work is wasted).
 *
 * All inputs to the ratios are exact integer counts (the hit count is a
 * semi-join, the totals plain counts), so the DuckDB oracle twin
 * reproduces them bit-for-bit; the three divisions are single IEEE ops
 * on both engines. One row out — this is a diagnostic aggregate, not a
 * data path, and it runs as two counts plus one semi-join over the
 * candidate stream (no quadratic anything; the truth side is
 * human-label-sized or rule-derived).
 */
object BlockingEval {

  /**
   * @param candidates (id1, id2) candidate pairs, id1 < id2, distinct
   * @param truth      (id1, id2) true duplicate pairs, id1 < id2, distinct
   * @param nRecords   corpus size n for the RR denominator
   * @return one row: n_candidates, n_truth, n_hit (long);
   *         reduction_ratio, pair_completeness, pairs_quality (double)
   */
  def quality(candidates: DataFrame, truth: DataFrame, nRecords: Long): DataFrame = {
    val c = candidates.select("id1", "id2")
    val t = truth.select("id1", "id2")
    val counts = c.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(t.agg(count(lit(1)).as("n_truth")))
      .crossJoin(c.join(t, Seq("id1", "id2"), "left_semi")
        .agg(count(lit(1)).as("n_hit")))
    val totalPairs = lit(nRecords) * lit(nRecords - 1) / lit(2L)
    counts.select(
      col("n_candidates"), col("n_truth"), col("n_hit"),
      (lit(1.0) - col("n_candidates") / totalPairs).as("reduction_ratio"),
      (col("n_hit") / col("n_truth")).as("pair_completeness"),
      (col("n_hit") / col("n_candidates")).as("pairs_quality"))
  }
}
