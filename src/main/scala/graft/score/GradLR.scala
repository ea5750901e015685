package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gfunctions.tokens
import graft.cluster.Checkpoints

/**
 * Distributed full-batch logistic regression over bag-of-token features
 * — the corpus-scale quality/language classifier of LLM data pipelines
 * (the fastText-style linear text classifier, Joulin et al. 2016†, is
 * the standard public recipe for "quality filtering" crawl corpora).
 * The engine's existing trainers are driver-side by design
 * (`Training.fitLogistic` over human-sized labeled pairs; FellegiSunter
 * EM over 2^K pattern statistics); this one trains where the LABELS are
 * corpus-sized — every gradient step is two map-side-combinable
 * distributed aggregations, and only the weight vector ever reaches the
 * driver's control flow (it stays a DataFrame end to end).
 *
 * Determinism contract (the BM25/PageRank pattern): weights live in
 * exact 1e-6 micro-units (bigint). A doc's margin Σ w_j·x_dj is then an
 * EXACT integer; σ(margin/1e6) is one libm call; each per-(doc,feature)
 * gradient contribution x_dj·(σ−y) is quantized to micro-units before
 * the feature-keyed sum, and the update w' = w − round(lr·g/n) maps
 * exact integers through one IEEE product. Training is therefore
 * bit-reproducible across partitionings and AQE re-plans, and a whole
 * unrolled 2-step training run + prediction is DuckDB-oracle-checked
 * (q_lr_quality).
 *
 * Scale shape per step: margins = one feature-keyed equi-join against
 * the weight table (vocabulary-sized — broadcastable whenever features
 * are hashed into a bounded space, see [[hashFeatures]]) + one id-keyed
 * sum; gradients = one id-keyed join of residuals back onto features +
 * one feature-keyed sum. No window, no collect, weights checkpointed
 * per step. Full-batch GD is the deliberately-simple optimizer: at
 * 10^9 labels a *pass* is cheap and deterministic, and LR's loss is
 * convex so plain GD with a sane rate converges without per-row state
 * (mini-batch SGD would serialize on the driver and lose determinism).
 */
object GradLR {

  /** Bag-of-token features (id, feature, x=tf) + a "__bias__" row per
    * doc. Lowercased unicode tokens — the langId/LangModel tokenizer. */
  def tokenFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(tokens(lower(col(textCol)))).as("feature"))
      .groupBy("id", "feature").agg(count(lit(1)).as("x"))
      .unionByName(docs.select(col(idCol).as("id"),
        lit("__bias__").as("feature"), lit(1L).as("x")))

  /** Hash features into 2^bits buckets (the fastText trick†): the weight
    * table gets a hard size bound, so it broadcasts at any corpus scale.
    * Collisions fold features together — standard, and harmless at the
    * default 2^18 for natural vocabularies. Non-oracle path (xxhash64). */
  def hashFeatures(feats: DataFrame, bits: Int = 18): DataFrame =
    feats.select(col("id"),
        pmod(xxhash64(col("feature")), lit(1L << bits)).cast("string").as("feature"),
        col("x"))
      .groupBy("id", "feature").agg(sum("x").as("x"))

  /** Per-doc margin in micro-units: Σ w_j·x_dj (exact integers). Missing
    * weights count as 0, so a fresh model starts at margin 0. */
  private def margins(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(weights, Seq("feature"), "left")
      .groupBy("id")
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("m"))

  /** σ(margin) as a column (margin in micro-units). */
  private def sigmoid(m: org.apache.spark.sql.Column) =
    lit(1.0) / (lit(1.0) + exp(-m / lit(1e6)))

  /** One full-batch GD step: weights (feature, w) → updated weights over
    * every feature seen in `feats` (unseen-this-step features keep their
    * weight). `labels` = (id, y) with y ∈ {0,1}. */
  def step(feats: DataFrame, labels: DataFrame, weights: DataFrame,
           learnRate: Double): DataFrame = {
    val n = labels.agg(count(lit(1)).as("n"))
    val resid = margins(feats, weights)
      .join(labels, "id")
      .select(col("id"), (sigmoid(col("m")) - col("y")).as("r"))
    val grad = feats.join(resid, "id")
      .groupBy("feature")
      .agg(sum(round(col("x") * col("r") * lit(1e6), 0).cast("long")).as("g"))
    // full outer: a feature absent from this step's feats (possible when
    // callers step on a different batch) keeps its weight with g = 0
    grad.join(weights, Seq("feature"), "full")
      .crossJoin(broadcast(n))
      .select(col("feature"),
        (coalesce(col("w"), lit(0L)) -
          round(lit(learnRate) * coalesce(col("g"), lit(0L)) / col("n"), 0)
            .cast("long")).as("w"))
  }

  /** Train `iters` full-batch steps from zero weights; returns the
    * weight table (feature, w micro-units). */
  def fit(feats: DataFrame, labels: DataFrame, iters: Int,
          learnRate: Double): DataFrame = {
    require(iters >= 1, "need at least one step")
    val spark = feats.sparkSession
    val f = Checkpoints.checkpointed(feats, spark)
    val l = Checkpoints.checkpointed(labels, spark)
    var w = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("feature",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType))))
    for (_ <- 1 to iters)
      w = Checkpoints.checkpointed(step(f, l, w, learnRate), spark)
    w
  }

  /** Predict P(y=1) per doc: (id, score) with score rounded to 6. */
  def predict(feats: DataFrame, weights: DataFrame): DataFrame =
    margins(feats, weights)
      .select(col("id"), round(sigmoid(col("m")), 6).as("score"))
}
