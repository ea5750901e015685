package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Temperature-based source mixing — the multilingual/domain sampling
 * rule of mBERT/XLM-R and The Pile's domain weights (public
 * technique†): a source with n_s rows gets mix share ∝ n_s^α; α < 1
 * flattens the source distribution so rare domains and languages
 * survive a budgeted training mix instead of being drowned by the
 * biggest crawl segment. The reference engine has no analog — this is
 * a beyond-survey corpus-curation operator in the q_dsir /
 * q_budget_sample family.
 *
 * Scale shape: per-source counts are one map-combined aggregate
 * broadcast back to the scan; row selection is a HASH-THRESHOLD
 * Bernoulli over a deterministic per-row key — no window, no
 * per-source sort, every row decided scan-side in one pass. Selected
 * counts are therefore binomial around each quota (±√n), the price of
 * not sorting; the exact-count alternative (row_number per source)
 * funnels each source through ONE task — the partition-less-window
 * scale-killer PlanSpec rejects elsewhere.
 *
 * Determinism contract: the sample key is a Lehmer/Park–Miller
 * multiplicative step (overflow-safe modmul: (id mod M)·A stays under
 * 2^47), and for the default α = 0.5 the share weights use IEEE
 * `sqrt`, which is correctly rounded on every engine — so the kept
 * row SET is bit-reproducible and SQL-expressible (oracle:
 * q_temperature_mix). Other α use `pow`, whose last-ulp rounding is
 * libm-specific: fine inside one engine, not oracle-gated.
 */
object Mixing {

  /** 2^31 − 1 (Mersenne prime M31) and the Park–Miller
    * minimal-standard multiplier. */
  val KeyMod = 2147483647L
  val KeyMul = 48271L

  /** Deterministic pseudo-random key in [0, KeyMod): TWO Lehmer LCG
    * steps from the nonzero seed (id mod (M−1)) + 1. One step is not
    * enough — a single multiply of a small sequential id stays far
    * below M (id ≤ 44k never wraps), so every row of a small corpus
    * lands under any realistic threshold; the second step wraps the
    * modulus hundreds of times and mixes. Each multiply stays under
    * 2^47 (operand < M ≈ 2^31), so no overflow under ANSI mode; pmod
    * handles negative xxhash64 ids. */
  def sampleKey(id: Column): Column = {
    val s0 = pmod(id, lit(KeyMod - 1L)) + lit(1L)
    val s1 = pmod(s0 * lit(KeyMul), lit(KeyMod))
    pmod(s1 * lit(KeyMul), lit(KeyMod))
  }

  /**
   * Keep each row of `docs` independently with its source's
   * temperature rate: rate_s = min(1, targetRows · n_s^α / Σ_t n_t^α
   * / n_s). Output = input columns + `keep_rate` (rounded to 6; the
   * FILTER uses the raw rate). Rows with a NULL source are excluded
   * from the mix AND from the quota math — an unattributed row can't
   * join back to a rate, so counting its group would silently depress
   * every real source's quota. Rows with a NULL id are excluded the
   * same way (explicitly, not via the null-propagating sampleKey
   * comparison): a keyless row can never be kept, so counting it in
   * `_n` would silently depress its source's realized quota.
   */
  def temperatureMix(docs: DataFrame, idCol: String, sourceCol: String,
      targetRows: Long, alpha: Double = 0.5): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    def share(n: Column): Column =
      if (alpha == 0.5) sqrt(n.cast("double"))
      else pow(n.cast("double"), lit(alpha))
    val attributed =
      docs.filter(col(sourceCol).isNotNull && col(idCol).isNotNull)
    val counts = attributed.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", share(col("_n")))
    val rates = counts
      .crossJoin(broadcast(counts.agg(sum(col("_w")).as("_tot"))))
      .withColumn("_rate", least(lit(1.0),
        lit(targetRows.toDouble) * col("_w") / col("_tot") /
          col("_n").cast("double")))
      .select(col(sourceCol), col("_rate"))
    attributed.join(broadcast(rates), Seq(sourceCol))
      .filter(sampleKey(col(idCol)).cast("double") <
        col("_rate") * lit(KeyMod.toDouble))
      .withColumn("keep_rate", round(col("_rate"), 6))
      .drop("_rate")
  }
}
