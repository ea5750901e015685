package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.textops.TextOps
import graft.textops.TextOps.CorpusBloom

/**
 * Streaming corpus ingestion — the continuous form of
 * [[TextOps.dedupeAgainstCorpus]]: a stream of crawled pages is
 * exact-deduped per micro-batch against the corpus-so-far, kept rows are
 * appended to the corpus, and the dedup state advances with them. The
 * batch operator is the semantics oracle (its DuckDB twins,
 * q_incr_dedup[_bloom]); this wrapper only adds the state plumbing a
 * 24/7 crawl needs.
 *
 * Scale shape — what the corpus-so-far costs per batch:
 *  - the corpus is NEVER rescanned as text. Dedup state is a persistent
 *    HASH INDEX (one th column, parquet, batch-id subdirs) plus a bloom
 *    filter over it. Per batch the bloom eliminates almost every fresh
 *    page map-side; only the survivors face the hash-index semi-join —
 *    a narrow scan of 8/32-byte values, not the 100 TB of text.
 *  - each batch's text hashes exactly ONCE: the (id, th) projection is
 *    pinned and reused for the verdict, the index append, and the bloom
 *    merge (no per-consumer re-hash, no scratch snapshots to leak on a
 *    never-exiting driver).
 *  - the bloom advances by OR-merge with the kept rows' own bloom
 *    (identical sizing, see [[CorpusBloom.merge]]) — O(filter bytes) of
 *    driver work per batch, amortized by the (configurable) trigger.
 *  - appends are idempotent per micro-batch: each batch OVERWRITES its
 *    own `batch=<id>` subdir, and the dedup probe reads ONLY subdirs of
 *    earlier batches (`batch <= id`), so a crash-replayed batch neither
 *    sees its own half-committed output (which would flip every verdict
 *    to in_corpus and overwrite the committed rows with empty frames)
 *    nor duplicates rows. Batch ids are stable across restarts via the
 *    stream checkpoint — which is why `checkpointDir` is REQUIRED: an
 *    un-checkpointed restart renumbers batches from 0 and would
 *    silently overwrite earlier commits with different data.
 *
 * Restart: the bloom is driver state, not checkpointed — rebuild it from
 * the hash index with [[rebuildBloom]] (identical key domain) and pass it
 * as `bloom`. The hash index and corpus dirs ARE the durable state;
 * Spark's own checkpoint replays any half-finished batch into its
 * idempotent subdir.
 */
object StreamIngest {

  /** Durable dedup state under `stateDir`: kept pages (full rows) and the
    * th hash index, both in batch-id subdirs. */
  private def corpusDir(stateDir: String) = s"$stateDir/corpus"
  private def indexDir(stateDir: String) = s"$stateDir/hash_index"

  /** Seed the state dirs (batch=0 is reserved for the seed; stream
    * batches land at batch=id+1). An EMPTY seed frame is fine — it pins
    * the parquet schema so the first micro-batch can read the index. */
  def init(spark: SparkSession, stateDir: String, seed: DataFrame,
      textCol: String, strongHash: Boolean = true): Unit = {
    seed.filter(col(textCol).isNotNull)
      .write.mode("overwrite").parquet(s"${corpusDir(stateDir)}/batch=0")
    seed.filter(col(textCol).isNotNull)
      .select(TextOps.textHash(col(textCol), strongHash).as("th"))
      .write.mode("overwrite").parquet(s"${indexDir(stateDir)}/batch=0")
  }

  /** Current hash index, optionally bounded to batches <= `upTo` (the
    * crash-replay guard: a replayed batch must not probe its own
    * half-committed subdir). */
  def hashIndex(spark: SparkSession, stateDir: String,
      upTo: Option[Long] = None): DataFrame = {
    val all = spark.read.parquet(indexDir(stateDir))
    upTo.fold(all)(b => all.filter(col("batch") <= b)).select("th")
  }

  /** Rebuild the probe bloom from the durable hash index — the restart
    * path. Sizing must match what start() will use for per-batch merges.
    * After a crash the index may hold one uncommitted-batch subdir the
    * checkpoint will replay; its hashes make the rebuilt bloom a
    * SUPERSET, which is safe (bloom false positives die at the exact
    * join — only false negatives would be wrong, and supersets cannot
    * create those). */
  def rebuildBloom(spark: SparkSession, stateDir: String,
      expectedItems: Long, fpp: Double = 0.01,
      strongHash: Boolean = true): CorpusBloom =
    TextOps.hashBloom(hashIndex(spark, stateDir), "th",
      expectedItems, fpp, strongHash)

  /**
   * Start the ingestion stream. Per micro-batch, `sink` receives the full
   * dedupe verdict frame (idCol, in_corpus, rep, keep) before the batch's
   * kept rows are committed to the state dirs.
   *
   * `expectedItems`/`fpp` size the per-batch merge blooms and MUST match
   * the sizing of `bloom` (merge rejects mismatched layouts loudly).
   */
  def start(spark: SparkSession, pagesStream: DataFrame,
      idCol: String, textCol: String, stateDir: String,
      bloom: CorpusBloom, expectedItems: Long, fpp: Double = 0.01,
      strongHash: Boolean = true, queryName: String = "graft_stream_ingest",
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(bloom.strongHash == strongHash,
      "bloom hash mode must match the stream's strongHash setting")
    var state = bloom
    pagesStream.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-sized frames, each pinned once: b feeds the kept-rows
        // join; bh (the batch's ONLY text-hash pass) feeds the verdict,
        // the index append and the bloom merge
        val b = batch.localCheckpoint(true)
        val bh = b.filter(col(textCol).isNotNull)
          .select(col(idCol),
            TextOps.textHash(col(textCol), strongHash).as("th"))
          .localCheckpoint(true)
        val verdict = TextOps.dedupeAgainstCorpus(
            bh, hashIndex(spark, stateDir, upTo = Some(batchId)),
            idCol, textCol, strongHash = strongHash,
            corpusBloom = Some(state),
            corpusHashCol = Some("th"), batchHashCol = Some("th"))
          .localCheckpoint(true)
        sink(verdict, batchId)
        val keptIds = verdict.filter(col("keep")).select(col(idCol))
        // idempotent per-batch commit: overwrite THIS batch's subdirs
        b.join(keptIds, Seq(idCol)).write.mode("overwrite")
          .parquet(s"${corpusDir(stateDir)}/batch=${batchId + 1}")
        val keptTh = bh.join(keptIds, Seq(idCol)).select("th")
          .localCheckpoint(true)
        keptTh.write.mode("overwrite")
          .parquet(s"${indexDir(stateDir)}/batch=${batchId + 1}")
        // advance the bloom ONLY after the durable commit: a crash
        // between commit and merge replays the batch (idempotent), while
        // the reverse order could advance the bloom past a lost commit
        // and silently re-admit those texts' duplicates forever
        state = state.merge(
          TextOps.hashBloom(keptTh, "th", expectedItems, fpp, strongHash))
      }
      .start()
  }

  /** Kept corpus so far (all batches). */
  def corpus(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(corpusDir(stateDir))
}
