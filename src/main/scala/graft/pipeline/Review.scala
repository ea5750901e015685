package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Human-review workflow over the entity map — the reference's review
 * endpoints (`dedupe-api:api/app.py (routes /get-review-cluster,
 * /mark-cluster)†` + entity_map flags†; SURVEY.md §2.6 G7).
 *
 * Review state is a plain Dataset (id, component, confidence, reviewed,
 * accepted, checked_out_at); accept/reject are joins, "next cluster to
 * review" is a window rank, checkout expiry is a timestamp filter —
 * no mutable store needed.
 */
object Review {

  /** Initialize review state from an entity map. */
  def init(entityMap: DataFrame): DataFrame =
    entityMap.select(
      col("id"), col("component"), col("confidence"),
      lit(false).as("reviewed"), lit(false).as("accepted"),
      lit(null).cast("timestamp").as("checked_out_at"))

  /** Per-cluster review queue stats (G9 counters). */
  def counts(state: DataFrame): DataFrame =
    state.groupBy("component")
      .agg(
        count("*").as("cluster_size"),
        min("confidence").as("min_confidence"),
        max(col("reviewed").cast("int")).cast("boolean").as("any_reviewed"))

  /**
   * Next clusters to review: lowest-confidence unreviewed clusters first
   * (the reference orders review by ascending confidence†), skipping
   * clusters checked out within the TTL. Deterministic tie-break by
   * component id.
   */
  def nextClusters(state: DataFrame, n: Int = 1,
      checkoutTtlMinutes: Int = 10): DataFrame = {
    val clusters = state
      .filter(!col("reviewed"))
      .filter(col("checked_out_at").isNull ||
        col("checked_out_at") < current_timestamp() - expr(s"INTERVAL $checkoutTtlMinutes MINUTES"))
      .groupBy("component")
      .agg(min("confidence").as("min_confidence"), count("*").as("cluster_size"))
    // top-n FIRST (distributed TakeOrdered — per-partition heaps, no
    // global window over the full cluster list), THEN rank the n
    // survivors; the partition-less window only ever sees n rows
    import org.apache.spark.sql.expressions.Window
    val top = clusters.orderBy(col("min_confidence").asc, col("component")).limit(n)
    val w = Window.orderBy(col("min_confidence").asc, col("component"))
    top.withColumn("review_rank", row_number().over(w))
  }

  /** Mark a set of components accepted/rejected (the /mark-cluster call). */
  def mark(state: DataFrame, decisions: DataFrame): DataFrame = {
    // decisions: (component, accept: boolean)
    state.join(broadcast(decisions), Seq("component"), "left")
      .select(
        col("id"), col("component"), col("confidence"),
        (col("reviewed") || col("accept").isNotNull).as("reviewed"),
        coalesce(col("accept"), col("accepted")).as("accepted"),
        col("checked_out_at"))
  }
}
