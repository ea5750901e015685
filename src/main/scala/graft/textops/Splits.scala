package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Leakage-safe train/eval corpus splitting — assign splits by DUPLICATE
 * CLUSTER, never by document. Splitting a crawl corpus row-wise leaks:
 * near-duplicate pages land on both sides and the eval set silently
 * overlaps training (the contamination q_decontaminate hunts after the
 * fact; this operator prevents the self-inflicted variant up front —
 * standard practice in LLM data pipelines, e.g. the dedup-then-split
 * protocol of Lee et al. "Deduplicating Training Data Makes Language
 * Models Better", ACL 2022†).
 *
 * Mechanism: split = deterministic hash of the CLUSTER key, so every
 * member of a cluster inherits the same side. The hash is md5 (same
 * bytes → same hex in every engine), and the eval test is a plain
 * lexicographic compare of the hex digest against a literal threshold —
 * fixed-width lowercase hex makes string order = numeric order, so the
 * whole assignment is one codegen'd column expression: NO shuffle, no
 * RNG, reproducible across engines (the DuckDB twin runs the identical
 * expression) and across runs. `salt` re-rolls the assignment without
 * touching cluster identity (fold an experiment name in).
 *
 * Cluster-key choices, increasingly strict:
 *   - exact-dup guard: `md5(text)` (or `TextOps.textHash`) — a column
 *     expression, zero extra cost;
 *   - near-dup guard: the entity id from minhash/simhash pairs + CC
 *     (`cluster/ConnectedComponents`), joined on by id — the join is the
 *     only shuffle and it is id-keyed;
 *   - either way the invariant is the same and spec-asserted: no cluster
 *     straddles splits.
 *
 * At 10^12 documents the expected eval fraction concentrates hard
 * (Chernoff over ~n independent cluster coin-flips); per-run exact
 * fractions are a `groupBy(split).count()` away.
 */
object Splits {

  /** 32-char lexicographic threshold encoding `frac` of md5-hex space:
    * 13 hex digits (52 bits — exact in a double) + 19 trailing zeros. */
  def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac < 1.0, s"eval fraction must be in [0,1), got $frac")
    val scaled = math.floor(frac * math.pow(16.0, 13)).toLong
    f"$scaled%013x" + "0" * 19
  }

  /** Split label ('eval' | 'train') for a cluster-key column. NULL key
    * (unclustered row) → NULL label: silently defaulting an unclustered
    * row to 'train' would mask an upstream clustering bug. */
  def splitLabel(clusterKey: Column, evalFrac: Double,
                 salt: String = ""): Column = {
    val digest = md5(concat(lit(salt), clusterKey.cast("string")).cast("binary"))
    when(clusterKey.isNull, lit(null).cast("string"))
      .when(digest < lit(hexThreshold(evalFrac)), lit("eval"))
      .otherwise(lit("train"))
  }

  /** Convenience: append a `split` column keyed on `clusterCol`. */
  def splitByCluster(df: DataFrame, clusterCol: String, evalFrac: Double,
                     salt: String = ""): DataFrame =
    df.withColumn("split", splitLabel(col(clusterCol), evalFrac, salt))
}
