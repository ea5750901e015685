package graft.pairs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Candidate-pair generation — the reference's in-database self-join
 * (`dedupe-api:api/utils/delayed_tasks.py (fn dedupeRaw)†`: self-join the
 * block table on block_key with record_id_1 < record_id_2, restricted to
 * plural blocks, DISTINCT pairs; SURVEY.md §2.4 J1–J3).
 *
 * Scale design:
 *  - plural-block semi-filter (J2) shrinks the shuffle: singleton keys are
 *    dropped BEFORE the join (typically the large majority of keys);
 *  - oversized blocks (stop-word tokens etc.) are CAPPED, not joined — a
 *    block of size s yields s² pairs; the cap bounds the worst key. This is
 *    the reference's own behavior (dedupe drops oversize blocks in
 *    gazetteer indexing / caps comparisons†) made explicit + logged;
 *  - the join itself is a shuffled equi-join on block_key; AQE skew-join
 *    splitting handles residual imbalance below the cap.
 */
object PairGen {

  /** Per-run skew/coverage metrics, surfaced instead of silent truncation. */
  case class BlockMetrics(
      totalKeys: Long,
      pluralKeys: Long,
      cappedKeys: Long,
      droppedRows: Long,
      maxBlockSize: Long)

  /**
   * (id1, id2) candidate pairs, id1 < id2, each pair exactly once.
   * @param blocks (id, block_key) blocking map
   * @param maxBlockSize blocks larger than this are dropped (capped)
   */
  def candidatePairs(blocks: DataFrame, maxBlockSize: Int = 200): DataFrame = {
    val sizes = blocks.groupBy("block_key")
      .agg(count("*").as("block_size"))
    // plural + under-cap keys only (J2 + cap). Inner join = semi filter but
    // keeps block_size around for potential weighting; pruned right after.
    val eligible = sizes
      .filter(col("block_size") >= 2 && col("block_size") <= maxBlockSize)
      .select("block_key")
    val b = blocks.join(eligible, "block_key")
    val a1 = b.select(col("block_key"), col("id").as("id1"))
    val a2 = b.select(col("block_key"), col("id").as("id2"))
    a1.join(a2, Seq("block_key"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2") // J3: score each pair once
  }

  /** Metrics companion to [[candidatePairs]] (same first-pass aggregate). */
  def blockMetrics(blocks: DataFrame, maxBlockSize: Int = 200): BlockMetrics = {
    val sizes = blocks.groupBy("block_key").agg(count("*").as("block_size"))
    val row = sizes.agg(
      count("*").as("totalKeys"),
      sum(when(col("block_size") >= 2, 1L).otherwise(0L)).as("pluralKeys"),
      sum(when(col("block_size") > maxBlockSize, 1L).otherwise(0L)).as("cappedKeys"),
      sum(when(col("block_size") > maxBlockSize, col("block_size")).otherwise(0L)).as("droppedRows"),
      max(col("block_size")).as("maxBlockSize")
    ).collect()(0)
    BlockMetrics(row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
  }

  /**
   * Attach both records' scoring fields to each pair (J5).
   * Column-pruned: pass only the fields the scorer needs via `fields`.
   * Output columns: id1, id2, {f}_1, {f}_2 for f in fields.
   */
  def attachFields(pairs: DataFrame, records: DataFrame, idCol: String,
      fields: Seq[String]): DataFrame = {
    val r1 = records.select(
      col(idCol).as("id1") +: fields.map(f => col(f).as(s"${f}_1")): _*)
    val r2 = records.select(
      col(idCol).as("id2") +: fields.map(f => col(f).as(s"${f}_2")): _*)
    pairs.join(r1, "id1").join(r2, "id2")
  }
}
