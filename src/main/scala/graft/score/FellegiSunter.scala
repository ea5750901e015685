package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unsupervised match-weight estimation: the Fellegi–Sunter latent-class
 * model (Fellegi & Sunter JASA 1969†) fitted by EM (Winkler 1988†; the
 * same estimator Splink ships for Spark SQL†). Where `Training.fitLR`
 * needs labeled pairs, this learns from the candidate pairs alone —
 * the standard bootstrap when no human labels exist yet.
 *
 * Model: each candidate pair is a latent match (prob λ) or non-match;
 * conditionally on the class, the K binary field-agreement indicators
 * γ_k are independent with P(γ_k=1 | match) = m_k and
 * P(γ_k=1 | non-match) = u_k.
 *
 * Scale shape — the whole point of this formulation at 10¹²-doc scale:
 * the likelihood depends on the pairs ONLY through the 2^K
 * agreement-pattern histogram, so the single distributed step is one
 * map-side-combinable `groupBy(γ…).count()` that collapses any number
 * of pairs into ≤ 2^K rows (K ≤ ~20 by construction — field count, not
 * data size). EM then iterates on the driver over those sufficient
 * statistics at cost independent of corpus size, and the fitted weights
 * re-enter the plan as literals inside a codegen'd [[posterior]] column
 * — no shuffle, no UDF, no model object on the executors.
 *
 * Determinism: patterns are sorted before accumulation, the iteration
 * count is fixed (no data-dependent early exit), and probabilities are
 * clamped to [1e-6, 1-1e-6] so degenerate fixtures cannot divide by
 * zero. Same inputs → bit-identical parameters on every run.
 */
object FellegiSunter {

  /** Fitted parameters. `m(k)`/`u(k)` index [[gammaCols]] order. */
  case class FsParams(lambda: Double, m: Array[Double], u: Array[Double]) {
    /** log2 agreement weight per field — the classical FS match weight. */
    def agreeWeight(k: Int): Double = math.log(m(k) / u(k)) / math.log(2.0)
    def disagreeWeight(k: Int): Double =
      math.log((1.0 - m(k)) / (1.0 - u(k))) / math.log(2.0)
  }

  private val Eps = 1e-6
  private def clamp(x: Double): Double = math.min(1.0 - Eps, math.max(Eps, x))

  /**
   * The one distributed step: collapse pairs into the agreement-pattern
   * histogram `(γ_1…γ_K, n)`. Null indicators count as disagreement
   * here (callers wanting missing-as-uninformative should pre-project
   * three-valued γ columns and fit per-stratum).
   */
  def agreementPatterns(pairs: DataFrame, gammaCols: Seq[String]): DataFrame = {
    val gs = gammaCols.map(g =>
      when(col(g).isNull, lit(0)).otherwise(col(g).cast("int")).as(g))
    pairs.select(gs: _*).groupBy(gammaCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /**
   * EM over pattern sufficient statistics (driver-side; input is ≤ 2^K
   * rows by construction). `patterns` maps each 0/1 agreement vector to
   * its pair count.
   */
  def emFit(patterns: Seq[(Seq[Int], Long)], iters: Int = 20,
            lambda0: Double = 0.1, m0: Double = 0.9, u0: Double = 0.1): FsParams = {
    require(patterns.nonEmpty, "empty pattern histogram")
    val k = patterns.head._1.length
    require(patterns.forall(_._1.length == k), "ragged gamma vectors")
    // deterministic accumulation order regardless of collect() order
    val pats = patterns.sortBy(_._1.mkString).toArray
    val total = pats.map(_._2).sum.toDouble
    var lambda = lambda0
    var m = Array.fill(k)(m0)
    var u = Array.fill(k)(u0)
    for (_ <- 0 until iters) {
      var wSum = 0.0
      val mNum = Array.fill(k)(0.0)
      val uNum = Array.fill(k)(0.0)
      for ((g, n) <- pats) {
        var pm = lambda; var pu = 1.0 - lambda
        var i = 0
        while (i < k) {
          pm *= (if (g(i) == 1) m(i) else 1.0 - m(i))
          pu *= (if (g(i) == 1) u(i) else 1.0 - u(i))
          i += 1
        }
        val w = pm / (pm + pu) // posterior P(match | pattern)
        wSum += n * w
        i = 0
        while (i < k) {
          if (g(i) == 1) { mNum(i) += n * w; uNum(i) += n * (1.0 - w) }
          i += 1
        }
      }
      lambda = clamp(wSum / total)
      m = mNum.map(x => clamp(x / wSum))
      u = uNum.map(x => clamp(x / (total - wSum)))
    }
    FsParams(lambda, m, u)
  }

  /** Histogram + EM in one call (the histogram collect is ≤ 2^K rows). */
  def fit(pairs: DataFrame, gammaCols: Seq[String], iters: Int = 20,
          lambda0: Double = 0.1, m0: Double = 0.9, u0: Double = 0.1): FsParams = {
    val pats = agreementPatterns(pairs, gammaCols).collect().toSeq
      .map(r => (gammaCols.indices.map(i => r.getInt(i)), r.getLong(gammaCols.length)))
    emFit(pats, iters, lambda0, m0, u0)
  }

  /**
   * Posterior P(match | γ) as a pure column expression with the fitted
   * parameters inlined as literals — codegen'd, shuffle-free. The null-γ
   * default (disagreement) matches [[agreementPatterns]], so fit-then-
   * score is self-consistent out of the box; pass
   * `nullAsDisagreement = false` to score nulls as uninformative
   * (factor 1 to both classes) — then ALSO fit on three-valued gammas
   * you pre-projected, or the model and the scorer disagree on missing
   * fields.
   */
  def posterior(params: FsParams, gammaCols: Seq[String],
                nullAsDisagreement: Boolean = true): Column =
    posteriorTf(params, gammaCols, Map.empty, nullAsDisagreement)

  /**
   * [[posterior]] with term-frequency adjustment (Winkler 1988†; the
   * mechanism Splink calls tf adjustment†): for a field whose gamma
   * column appears in `tfCols`, agreement on a SPECIFIC value v swaps
   * the global u_k for that value's relative frequency f_v — under
   * class-conditional independence, f_v IS P(the other record also
   * carries v | non-match) — so agreeing on a rare name is worth more
   * than agreeing on a frequent one. `tfCols(g)` must be a column
   * holding f_v for the pair's shared value (attach it with a broadcast
   * join against [[valueFrequencies]]); it is clamped into
   * [1e-6, 1-1e-6] and falls back to the global u_k when null. The
   * m-side and the disagreement branch are unchanged.
   */
  def posteriorTf(params: FsParams, gammaCols: Seq[String],
                  tfCols: Map[String, Column],
                  nullAsDisagreement: Boolean = true): Column = {
    def side(prior: Double, p: Int => Double, useTf: Boolean) =
      gammaCols.zipWithIndex.foldLeft(lit(prior)) {
        case (acc, (g, i)) =>
          // coalesce BEFORE clamping: least/greatest skip nulls (both
          // engines), so clamping a null tf first would yield the clamp
          // bound instead of the u_k fallback
          val agree = tfCols.get(g).filter(_ => useTf) match {
            case Some(tf) =>
              greatest(least(coalesce(tf, lit(p(i))), lit(1.0 - Eps)), lit(Eps))
            case None => lit(p(i))
          }
          acc * when(col(g).isNull,
              lit(if (nullAsDisagreement) 1.0 - p(i) else 1.0))
            .when(col(g).cast("int") === 1, agree)
            .otherwise(lit(1.0 - p(i)))
      }
    val pm = side(params.lambda, params.m, useTf = false)
    val pu = side(1.0 - params.lambda, params.u, useTf = true)
    pm / (pm + pu)
  }

  /**
   * Per-value relative frequencies of `field` over the record table:
   * `(value, tf_freq)` with Σ tf_freq = 1 over non-null values. The
   * output is vocabulary-sized — orders of magnitude smaller than the
   * records — so the attach join onto pairs broadcasts.
   */
  def valueFrequencies(records: DataFrame, field: String): DataFrame = {
    val nn = records.filter(col(field).isNotNull)
    val counts = nn.groupBy(col(field).as("value")).agg(count(lit(1)).as("cnt"))
    // global N rides a broadcast 1-row crossJoin — no driver collect
    val total = nn.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("value"),
        (col("cnt").cast("double") / col("total")).as("tf_freq"))
  }
}
