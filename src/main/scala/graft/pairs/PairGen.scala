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
   *
   * Skew-proof by construction (the north rule's explicit skew handling —
   * BASELINE.json:14): a plain self-join on block_key computes a block of
   * size s inside ONE join group (s² pair expansion in one task; AQE can't
   * split it because the map-side stats are tiny — the blowup happens
   * inside the join). Instead each block's records are hashed into
   * m = ceil(s / chunkTarget) chunks and the join key becomes
   * (block_key, chunkI, chunkJ) with i <= j — the "triangle" grid
   * decomposition. Every pair lands in exactly ONE grid cell:
   * cell (min(ra,rb), max(ra,rb)); cells are ~chunkTarget² pairs each, so
   * parallelism scales with block size instead of collapsing on hot keys
   * (stop-word tokens on crawl text). Replication cost: each row of a
   * block is emitted m times — linear, vs the quadratic join output.
   *
   * @param blocks (id, block_key) blocking map
   * @param maxBlockSize blocks larger than this are dropped entirely
   *                     (dedupe's gazetteer oversize-block behavior†, made
   *                     explicit; count it via blockMetrics, never silent)
   * @param chunkTarget  target records per sub-block chunk
   */
  def candidatePairs(blocks: DataFrame, maxBlockSize: Int = 200,
      chunkTarget: Int = 256): DataFrame = {
    val (perBlock, cells) = perBlockPairs(blocks, maxBlockSize, chunkTarget)
    perBlock
      // same reasoning as the cell repartition: keep the pair set spread
      // at full width so every downstream comparator pass is parallel
      .repartition(cells, col("id1"), col("id2"))
      .dropDuplicates("id1", "id2") // J3: score each pair once
  }

  /**
   * The pre-dedup pair stream: one (id1, id2) row PER SHARED ELIGIBLE
   * BLOCK (each block emits a pair in exactly one of its grid cells), so
   * downstream can either dedup ([[candidatePairs]], J3) or COUNT the
   * multiplicity — the CBS comparison weight meta-blocking prunes on
   * (block.MetaBlocking.weightedPairs). Also returns the explicit
   * partition width for callers' follow-up shuffles.
   */
  private[graft] def perBlockPairs(blocks: DataFrame, maxBlockSize: Int,
      chunkTarget: Int): (DataFrame, Int) = {
    val sizes = blocks.groupBy("block_key")
      .agg(count("*").as("block_size"))
    // plural + under-cap keys only (J2 + cap)
    val eligible = sizes
      .filter(col("block_size") >= 2 && col("block_size") <= maxBlockSize)
      .select(col("block_key"),
        ceil(col("block_size").cast("double") / chunkTarget).cast("int").as("m"))
    val b = blocks.join(eligible, "block_key")
      .select(col("block_key"), col("id"),
        pmod(xxhash64(col("id")), col("m")).cast("int").as("r"), col("m"))
    // left leg: row in chunk r participates as the FIRST element of grid
    // cells (r, j) for all j >= r; right leg: as SECOND element of (i, r).
    val left = b.select(col("block_key"), col("id").as("id1"), col("r").as("i"),
        explode(sequence(col("r"), col("m") - 1)).as("j"))
    val right = b.select(col("block_key"), col("id").as("id2"), col("r").as("j"),
        explode(sequence(lit(0), col("r"))).as("i"))
    // EXPLICIT repartition on the cell key, fixed width: AQE sizes
    // post-shuffle partitions by INPUT bytes, but this join's cost is its
    // OUTPUT — each cell expands to ~chunkTarget² pairs. A few MB of block
    // rows coalesce to 1-2 partitions and the entire quadratic expansion
    // serializes through them (measured: 345 s for a 47M-pair generation
    // that runs in ~30 s spread across cells). User-specified repartition
    // is exempt from AQE coalescing and the join reuses the partitioning.
    val cells = math.max(4 * blocks.sparkSession.sparkContext.defaultParallelism, 16)
    val cellKey = Seq(col("block_key"), col("i"), col("j"))
    // canonicalize to id1 < id2 AFTER the join: a pair whose smaller id
    // hashes to the LARGER chunk meets only as (bigger, smaller) — a plain
    // id1 < id2 filter would drop it. Exception: in a DIAGONAL cell
    // (i == j, both records in the same chunk) the join produces BOTH
    // orientations, so there — and only there — the ordered filter is
    // exactly the dedup that makes multiplicity = one row per shared
    // block (the CBS contract; also halves the J3 dedup's input).
    val perBlock = left.repartition(cells, cellKey: _*)
      .join(right.repartition(cells, cellKey: _*), Seq("block_key", "i", "j"))
      .filter(col("id1") =!= col("id2"))
      .filter(col("i") =!= col("j") || col("id1") < col("id2"))
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
    (perBlock, cells)
  }

  /** Metrics companion to [[candidatePairs]] (same first-pass aggregate). */
  def blockMetrics(blocks: DataFrame, maxBlockSize: Int = 200): BlockMetrics = {
    val sizes = blocks.groupBy("block_key").agg(count("*").as("block_size"))
    // coalesce: sum/max over an EMPTY key set are null (an empty crawl
    // shard is a legitimate input at scale) — getLong on null throws
    val row = sizes.agg(
      count("*").as("totalKeys"),
      coalesce(sum(when(col("block_size") >= 2, 1L).otherwise(0L)), lit(0L)).as("pluralKeys"),
      coalesce(sum(when(col("block_size") > maxBlockSize, 1L).otherwise(0L)), lit(0L)).as("cappedKeys"),
      coalesce(sum(when(col("block_size") > maxBlockSize, col("block_size")).otherwise(0L)), lit(0L)).as("droppedRows"),
      coalesce(max(col("block_size")), lit(0L)).as("maxBlockSize")
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
