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

  /**
   * B-cubed precision/recall/F1 (Bagga & Baldwin 1998†; the
   * extended-metric analysis is Amigó et al. 2009†) — the per-RECORD
   * agreement statistic the ER literature pairs with pairwise F1:
   * a record's precision is the fraction of its predicted cluster
   * sharing its truth cluster, recall the dual, both averaged over
   * records. Unlike pairwise F1 it doesn't square-weight big clusters,
   * so one giant merged entity can't mask many small mistakes.
   *
   * Same contingency backbone as [[adjustedRand]]: every sum is over
   * (pred, truth) cells — precision = (1/n)·Σ nij²/n_c, recall =
   * (1/n)·Σ nij²/n_t — so the whole metric is one join, one
   * groupBy(count), two cluster-size joins (cluster-count-sized,
   * broadcastable) and one map-side-combinable aggregate. Per-cell
   * contributions are quantized to exact 1e-6 micro-units before the
   * final sum (the [[graft.textops.Retrieval]] idiom), making the
   * result independent of partitioning/summation order — reproducible
   * across AQE re-plans and engines.
   *
   * @param pred  (id, component) predicted labeling
   * @param truth (id, component) reference labeling (inner join on id)
   * @return one row: n, bcubed_precision, bcubed_recall, bcubed_f1
   *         (rounded 1e-6; empty input → all 1.0 by convention)
   */
  def bcubed(pred: DataFrame, truth: DataFrame): DataFrame = {
    val j = pred.toDF("id", "cp").join(truth.toDF("id", "ct"), "id")
    val cont = j.groupBy(col("cp"), col("ct")).agg(count(lit(1)).as("nij"))
    val nc = cont.groupBy("cp").agg(sum(col("nij")).as("nc"))
    val nt = cont.groupBy("ct").agg(sum(col("nij")).as("nt"))
    val cells = cont.join(nc, "cp").join(nt, "ct")
    val nij2 = col("nij").cast("double") * col("nij").cast("double")
    val pCell = round(nij2 / col("nc") * lit(1e6), 0).cast("long")
    val rCell = round(nij2 / col("nt") * lit(1e6), 0).cast("long")
    val agg = cells.agg(
      coalesce(sum(col("nij")), lit(0L)).as("n"),
      coalesce(sum(pCell), lit(0L)).as("pm"),
      coalesce(sum(rCell), lit(0L)).as("rm"))
    val denom = col("n").cast("double") * lit(1e6)
    val p = col("pm").cast("double") / denom
    val r = col("rm").cast("double") / denom
    agg.select(
      col("n"),
      round(when(col("n") === 0L, 1.0).otherwise(p), 6).as("bcubed_precision"),
      round(when(col("n") === 0L, 1.0).otherwise(r), 6).as("bcubed_recall"),
      round(when(col("n") === 0L, 1.0)
        .otherwise(lit(2.0) * p * r / (p + r)), 6).as("bcubed_f1"))
  }
}
