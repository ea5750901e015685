package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Greedy maximum-weight one-to-one matching over scored pairs — the
 * reference's unique-assignment record linkage (`dedupe:matching — the
 * one-to-one option of RecordLink†`, where each record of either side
 * joins at most one match; contrast G8's top-n gazetteer, which allows
 * fan-out). Sequential greedy — repeatedly take the best remaining pair
 * and retire both endpoints — is inherently serial, so we run the
 * locally-dominant-pair formulation (Preis, STACS 1999†; distributed
 * treatment Manne & Bisseling 2007†): a pair is matched iff it is the
 * best incident pair of BOTH endpoints; matched endpoints' other pairs
 * drop; iterate. Under a TOTAL order — (score desc, id1 asc, id2 asc),
 * no ties possible — this reproduces the sequential greedy matching
 * EXACTLY (every greedy pick is locally dominant when it is taken, and
 * locally dominant pairs never conflict), so the result is
 * deterministic and engine-independent, which is what the fixture
 * oracle checks.
 *
 * Scale shape per iteration: one union (role explode), one bounded
 * per-node window (partitioned by node — never global), one
 * two-row-per-pair count, two anti-joins. Matched pairs leave the
 * frontier immediately, so the live edge set shrinks monotonically;
 * iterations are checkpointed like CC to truncate lineage. Expected
 * rounds are O(log n) on similarity graphs (most nodes' best pairs are
 * mutual in round 1 — dedupe scores are concentrated near the
 * decision boundary's extremes).
 */
object OneToOne {

  case class MatchResult(pairs: DataFrame, iterations: Int)

  /**
   * @param scored (id1, id2, score) — distinct pairs. For record LINKAGE
   *               (two datasets) keep `bipartite = true`: the id1 and id2
   *               namespaces are tracked separately, so messy id 5 and
   *               canon id 5 never collide. For same-universe matching
   *               (self-dedupe one-to-one) set `bipartite = false`;
   *               reflexive pairs (id1 == id2) are dropped there — a
   *               record cannot be its own match, and a self-loop can
   *               never become locally dominant (its two node rows share
   *               one window partition), so keeping it would stall the
   *               drain.
   * @param maxIter runaway bound only — each round matches at least the
   *               globally best live pair, so progress is guaranteed;
   *               rounds needed are ~the longest score-descending CHAIN
   *               (Θ(k) on a k-edge path, not O(log n) — adversarial
   *               chains converge slowly by the algorithm's nature),
   *               while similarity graphs with mutual best matches
   *               drain in a handful.
   * @return matched (id1, id2, score) — a one-to-one matching equal to
   *         the sequential greedy matching under (score desc, id1, id2)
   */
  def greedyMatch(scored: DataFrame, bipartite: Boolean = true,
      maxIter: Int = 256): MatchResult = {
    val spark = scored.sparkSession
    val base = scored.select("id1", "id2", "score")
    val side2 = if (bipartite) lit(1) else lit(0)
    def nodes(p: DataFrame): DataFrame =
      p.select(struct(lit(0).as("s"), col("id1").as("i")).as("node"),
          col("id1"), col("id2"), col("score"))
        .unionByName(
          p.select(struct(side2.as("s"), col("id2").as("i")).as("node"),
            col("id1"), col("id2"), col("score")))

    val byNode = Window.partitionBy("node")
      .orderBy(col("score").desc, col("id1").asc, col("id2").asc)

    var live = Checkpoints.checkpointed(
      (if (bipartite) base else base.filter(col("id1") =!= col("id2")))
        .distinct(), spark)
    // per-round dominants accumulate here and union ONCE at the end —
    // re-checkpointing a growing matched set every round is O(rounds²)
    val roundMatches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var iter = 0
    var done = live.isEmpty
    while (!done && iter < maxIter) {
      // locally dominant = this pair is rank-1 for BOTH of its endpoints
      // ⇔ it appears twice among the per-node rank-1 rows. Materialized
      // once per round: both the result and the endpoint retirement
      // consume it.
      val dominant = Checkpoints.checkpointed(
        nodes(live)
          .withColumn("rn", row_number().over(byNode))
          .filter(col("rn") === 1)
          .groupBy("id1", "id2", "score").agg(count(lit(1)).as("c"))
          .filter(col("c") === 2)
          .select("id1", "id2", "score"), spark)
      roundMatches += dominant
      // retire both endpoints of every matched pair
      val taken = nodes(dominant).select("node")
      live = Checkpoints.checkpointed(
        nodes(live)
          .join(taken, Seq("node"), "left_anti")
          .groupBy("id1", "id2", "score").agg(count(lit(1)).as("c"))
          .filter(col("c") === 2) // both endpoints still free
          .select("id1", "id2", "score"), spark)
      iter += 1
      done = live.isEmpty
    }
    require(done, s"one-to-one matching did not drain in $maxIter iterations")
    // empty case: same schema/types as the input, not a fabricated one
    MatchResult(roundMatches.reduceOption(_ unionByName _)
      .getOrElse(base.limit(0)), iter)
  }
}
