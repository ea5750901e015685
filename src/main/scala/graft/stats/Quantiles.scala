package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.QuantileKey
import graft.gfunctions.double_ordered_bits

/**
 * EXACT distributed order statistics over a double column, without a
 * global sort — the corpus-statistics primitive behind every cutoff
 * this engine otherwise takes as a literal (CCNet's per-language 33rd/
 * 66th perplexity percentiles†, quality-score selection thresholds,
 * DSIR's top-fraction boundary). `approx_percentile` is Spark's native
 * answer but its error bound is rank-relative, which at 10^12 rows can
 * move a cutoff by millions of documents; this operator returns the
 * exact k-th smallest element (duplicates counted) for any set of ks.
 *
 * Algorithm: most-significant-digit radix SELECTION on an
 * order-preserving 64-bit key (expr.QuantileKey: unsigned integer
 * order == IEEE double order, NaN excluded as null). Four rounds, one
 * 16-bit digit per round: each round is one map-side-combinable
 * `groupBy(digit).count` census over the rows matching the surviving
 * key prefix, the driver walks the ≤ 65 536-row census to pick each
 * search's next digit and residual rank, and after round 4 the full
 * key IS the answer (decoded bit-exactly — the returned double is an
 * actual element of the column, not an interpolation).
 *
 * Scale shape (100 TB): no sort, no shuffle of row data at all — every
 * round moves only (digit, count) pairs, bounded by 2^16 · |searches|
 * rows; driver state is the same census (bounded-by-construction
 * collect, the packShards pattern). Four full-column scans total (the
 * level-0 census doubles as the row count that turns quantile
 * fractions into ranks), each behind the parquet column scan of ONE
 * double — at 1000 executors the census all-reduces in one stage.
 * Skew-free by construction: a hot VALUE only inflates one census
 * count, never a partition.
 */
object Quantiles {

  /** k-th smallest (1-based rank, duplicates counted) for every k in
    * `ks`, exact. Returns Map(k → value). NULL and NaN rows are
    * excluded from the population. Throws if some k exceeds the
    * comparable-row count. */
  def kthSmallest(df: DataFrame, valueCol: String, ks: Seq[Long]): Map[Long, Double] = {
    require(ks.nonEmpty && ks.forall(_ >= 1L), s"ranks must be >= 1: $ks")
    run(df, valueCol, None, _ => ks)._2
  }

  /** Discrete quantiles: for each q the element at 1-based rank
    * ceil(q·n) (SQL's row_number contract — the value is always an
    * actual element). Returns (q, k, value) as a DataFrame for
    * pipeline composition. */
  def quantilesDisc(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1]: $qs")
    val (n, values) =
      run(df, valueCol, None, n => qs.map(q => math.ceil(q * n).toLong.max(1L)))
    val withK = qs.map(q => q -> math.ceil(q * n).toLong.max(1L))
    import df.sparkSession.implicits._
    withK.map { case (q, k) => (q, k, values(k)) }.toDF("q", "k", "value")
  }

  /**
   * WEIGHT-quantiles — the cutoff question corpus curation actually
   * asks: "below which quality score do q% of the TOKENS (not the
   * documents) sit?" Each row counts `weightCol` times (a positive
   * integer budget — token count, byte size); the returned value for
   * fraction q is the element at cumulative-weight rank ceil(q·W),
   * W = Σ weights. Same radix walk with weight-sum censuses — a row's
   * weight only ever inflates one census cell, so the scale shape and
   * the driver bounds are unchanged. Returns (q, k, value); k is the
   * weight rank. Rows with null/NaN value or null/non-positive weight
   * are excluded.
   */
  def weightedQuantilesDisc(df: DataFrame, valueCol: String,
                            weightCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1]: $qs")
    val (w, values) = run(df, valueCol, Some(weightCol),
      w => qs.map(q => math.ceil(q * w).toLong.max(1L)))
    val withK = qs.map(q => q -> math.ceil(q * w).toLong.max(1L))
    import df.sparkSession.implicits._
    withK.map { case (q, k) => (q, k, values(k)) }.toDF("q", "k", "value")
  }

  /** Shared radix walk. `mkKs` sees the population count (or total
    * weight) from the level-0 census — no separate count scan — and
    * returns the ranks. */
  private def run(df: DataFrame, valueCol: String, weightCol: Option[String],
                  mkKs: Long => Seq[Long]): (Long, Map[Long, Double]) = {
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val keyed = df
      .select(double_ordered_bits(col(valueCol).cast("double")).as("u"),
        w.as("w"))
      .filter(col("u").isNotNull && col("w").isNotNull && col("w") > 0L)
    // level-0 census over the top 16 bits; its total is the population
    // (or total weight)
    val census0 = keyed
      .groupBy(shiftrightunsigned(col("u"), 48).as("hi"))
      .agg(sum(col("w")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = census0.map(_._2).sum
    require(n > 0, "no comparable (non-null, non-NaN) rows")
    val ks = mkKs(n)
    require(ks.nonEmpty && ks.forall(k => k >= 1L && k <= n),
      s"ranks out of range [1, $n]: $ks")
    // rank → (key prefix so far, residual rank within that prefix)
    var active: Map[Long, (Long, Long)] =
      ks.distinct.map(k => k -> pick(census0, k)).toMap
    for (level <- 1 to 3) {
      val shift = 48 - 16 * level
      val prefixes = active.values.map(_._1).toSeq.distinct
      val census = keyed
        .filter(shiftrightunsigned(col("u"), shift + 16).isin(prefixes: _*))
        .groupBy(shiftrightunsigned(col("u"), shift).as("hi"))
        .agg(sum(col("w")).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      active = active.map { case (k, (prefix, rem)) =>
        val mine = census.filter { case (hi, _) => (hi >>> 16) == prefix }
        k -> pick(mine, rem)
      }
    }
    (n, active.map { case (k, (u, rem)) =>
      assert(rem >= 1, s"radix walk lost rank $k")
      k -> QuantileKey.decode(u)
    })
  }

  /**
   * Per-GROUP exact discrete quantiles — the shape CCNet's cutoffs
   * actually take (33rd/66th perplexity percentile PER LANGUAGE†).
   * Returns (groupCol, q, k, value) with k = ceil(q·n_group).
   *
   * Same radix walk, with the active (group, prefix) frontier pushed
   * down as a broadcast left-semi join instead of an `isin` literal.
   * Census volume is bounded by |active prefixes| · 2^16, so groups
   * are processed in chunks of `groupChunk` to keep every driver
   * collect bounded regardless of group count; rounds = 4 · ⌈|groups|
   * / groupChunk⌉. Designed for language/source-cardinality groupings
   * (tens to thousands), not for high-cardinality keys — a quantile
   * per USER-like key wants the t-digest/approx family instead.
   */
  def quantilesDiscByGroup(df: DataFrame, groupCol: String, valueCol: String,
                           qs: Seq[Double], groupChunk: Int = 64): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1]: $qs")
    require(groupChunk >= 1, "groupChunk must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(groupCol).cast("string").as("g"),
        double_ordered_bits(col(valueCol).cast("double")).as("u"))
      .filter(col("g").isNotNull && col("u").isNotNull)
    val census0 = keyed
      .groupBy(col("g"), shiftrightunsigned(col("u"), 48).as("hi"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val groups = census0.map(_._1).distinct.sorted
    val rows = groups.grouped(groupChunk).flatMap { chunk =>
      val chunkSet = chunk.toSet
      val byGroup = census0.filter(t => chunkSet(t._1))
        .groupBy(_._1).map { case (g, ts) =>
          g -> ts.map(t => (t._2, t._3)).sortBy(_._1)
        }
      // (group, q) → (prefix so far, residual rank, rank k)
      var active: Map[(String, Double), (Long, Long, Long)] =
        byGroup.toSeq.flatMap { case (g, cen) =>
          val n = cen.map(_._2).sum
          qs.map { q =>
            val k = math.ceil(q * n).toLong.max(1L)
            val (p, rem) = pick(cen, k)
            (g, q) -> (p, rem, k)
          }
        }.toMap
      for (level <- 1 to 3) {
        val shift = 48 - 16 * level
        // .toSeq BEFORE .map: mapping the Map directly would rebuild a
        // Map keyed by g and silently collapse a group's multiple
        // quantile prefixes to one
        val frontier = active.toSeq
          .map { case ((g, _), (p, _, _)) => (g, p) }
          .distinct.toDF("g", "p")
        val census = keyed
          .withColumn("p", shiftrightunsigned(col("u"), shift + 16))
          .join(broadcast(frontier), Seq("g", "p"), "left_semi")
          .groupBy(col("g"), shiftrightunsigned(col("u"), shift).as("hi"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .groupBy(_._1)
        active = active.map { case ((g, q), (prefix, rem, k)) =>
          val mine = census(g).filter(t => (t._2 >>> 16) == prefix)
            .map(t => (t._2, t._3)).sortBy(_._1)
          val (p2, rem2) = pick(mine, rem)
          (g, q) -> (p2, rem2, k)
        }
      }
      active.toSeq.map { case ((g, q), (u, rem, k)) =>
        assert(rem >= 1, s"radix walk lost ($g, $q)")
        (g, q, k, QuantileKey.decode(u))
      }
    }.toSeq
    rows.sortBy(t => (t._1, t._2))
      .toDF(groupCol, "q", "k", "value")
  }

  /** Walk a sorted (key, count) census to the digit containing rank
    * `rem`; returns (key, residual rank within that key). */
  private def pick(census: Array[(Long, Long)], rem: Long): (Long, Long) = {
    var left = rem
    var i = 0
    while (i < census.length && left > census(i)._2) {
      left -= census(i)._2; i += 1
    }
    require(i < census.length, "census exhausted before rank — concurrent input change?")
    (census(i)._1, left)
  }
}
