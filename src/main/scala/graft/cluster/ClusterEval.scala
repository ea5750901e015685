package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Chance-corrected agreement between two entity labelings.
 *
 * [[Crosswalk]] answers "WHICH entities moved between two runs"; this
 * answers "HOW MUCH do two labelings agree, beyond luck" — the standard
 * clustering-comparison statistic (Rand index + the Hubert-Arabie
 * adjusted Rand index, ARI†) over pair co-membership. Use cases at
 * crawl cadence: regression-gate a re-clustering against the previous
 * snapshot, compare a cheap blocking config against the reference one,
 * or quantify drift across model versions.
 *
 * Everything reduces to the contingency table of the two labelings —
 * one id-keyed join + one groupBy(count) — and three pair-count sums,
 * each a map-side-combinable aggregate. Pair counts C(x,2) are summed
 * in DECIMAL(38,0): at 10^12 rows a single cluster's C(n,2) is ~10^23,
 * far past long range; the exact integer sums feed one scalar double
 * expression at the end. The diagnostic sum columns are emitted as
 * longs for oracle comparability (ANSI mode turns a cast overflow into
 * an error, never a silent wrap — select `ari`/`ri` only at scales
 * where the raw sums exceed long).
 */
object ClusterEval {

  private def c2(c: Column): Column =
    (c.cast(DecimalType(38, 0)) * (c - 1) / 2).cast(DecimalType(38, 0))

  /**
   * @param a (id, component) labeling A
   * @param b (id, component) labeling B — compared over ids present in
   *          BOTH (inner join; callers wanting set-difference policing
   *          run [[Crosswalk]] first)
   * @return one row: n, s_both (pairs co-clustered in A and B), s_a,
   *         s_b (pairs co-clustered per side), ri, ari (rounded 1e-6).
   *         Degenerate chance denominator (both labelings all-
   *         singletons or all-one-cluster) → ari = 1.0 by convention.
   */
  def adjustedRand(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.toDF("id", "ca").join(b.toDF("id", "cb"), "id")
    val cont = j.groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("nij"))
    val sBoth = cont.agg(coalesce(sum(c2(col("nij"))), lit(0)).as("s_both"))
    val sA = cont.groupBy("ca").agg(sum(col("nij")).as("na"))
      .agg(coalesce(sum(c2(col("na"))), lit(0)).as("s_a"),
        coalesce(sum(col("na")), lit(0L)).as("n"))
    val sB = cont.groupBy("cb").agg(sum(col("nij")).as("nb"))
      .agg(coalesce(sum(c2(col("nb"))), lit(0)).as("s_b"))
    val one = sBoth.crossJoin(sA).crossJoin(sB)
    val totalPairs = c2(col("n")).cast("double")
    val exp = col("s_a").cast("double") * col("s_b").cast("double") / totalPairs
    val half = (col("s_a").cast("double") + col("s_b").cast("double")) / 2.0
    val ariRaw = (col("s_both").cast("double") - exp) / (half - exp)
    val ri = lit(1.0) -
      (col("s_a").cast("double") + col("s_b").cast("double")
        - lit(2.0) * col("s_both").cast("double")) / totalPairs
    one.select(
      col("n"),
      col("s_both").cast("long").as("s_both"),
      col("s_a").cast("long").as("s_a"),
      col("s_b").cast("long").as("s_b"),
      round(when(totalPairs === 0.0, 1.0).otherwise(ri), 6).as("ri"),
      round(when(half === exp, 1.0).otherwise(ariRaw), 6).as("ari"))
  }
}
