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
 *  - the bloom advances by OR-merge with the kept rows' own bloom
 *    (identical sizing, see [[CorpusBloom.merge]]) — O(filter bytes) of
 *    driver work per batch, amortized by the trigger interval.
 *  - appends are idempotent per micro-batch: each batch OVERWRITES its
 *    own `batch=<id>` subdir, so foreachBatch's at-least-once redelivery
 *    after a failure rewrites the same rows instead of duplicating them
 *    (batch ids are stable across restarts via the stream checkpoint).
 *
 * Restart: the bloom is driver state, not checkpointed — rebuild it from
 * the hash index with [[TextOps.hashBloom]] (identical key domain) and
 * pass it as `bloom`. The hash index and corpus dirs ARE the durable
 * state; Spark's own checkpoint replays any half-finished batch into its
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
    val th =
      if (strongHash) unhex(sha2(col(textCol), 256)) else xxhash64(col(textCol))
    seed.filter(col(textCol).isNotNull)
      .write.mode("overwrite").parquet(s"${corpusDir(stateDir)}/batch=0")
    seed.filter(col(textCol).isNotNull).select(th.as("th"))
      .write.mode("overwrite").parquet(s"${indexDir(stateDir)}/batch=0")
  }

  /** Current hash index (all batches). */
  def hashIndex(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(indexDir(stateDir)).select("th")

  /** Rebuild the probe bloom from the durable hash index — the restart
    * path. Sizing must match what start() will use for per-batch merges. */
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
      checkpointDir: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(bloom.strongHash == strongHash,
      "bloom hash mode must match the stream's strongHash setting")
    var state = bloom
    val writer = pagesStream.writeStream
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-sized frame feeding two consumers (verdict + kept rows):
        // pin it so the stream source is read once per batch
        val b = batch.localCheckpoint(true)
        val verdict = TextOps.dedupeAgainstCorpus(
            b, hashIndex(spark, stateDir), idCol, textCol,
            strongHash = strongHash, corpusBloom = Some(state),
            corpusHashCol = Some("th"))
          .localCheckpoint(true)
        sink(verdict, batchId)
        val kept = b.join(
          verdict.filter(col("keep")).select(col(idCol)), Seq(idCol))
        // idempotent per-batch commit: overwrite THIS batch's subdirs
        kept.write.mode("overwrite")
          .parquet(s"${corpusDir(stateDir)}/batch=${batchId + 1}")
        val th = if (strongHash) unhex(sha2(col(textCol), 256))
                 else xxhash64(col(textCol))
        kept.select(th.as("th")).write.mode("overwrite")
          .parquet(s"${indexDir(stateDir)}/batch=${batchId + 1}")
        // advance the bloom ONLY after the durable commit: a crash
        // between commit and merge replays the batch (idempotent), while
        // the reverse order could advance the bloom past a lost commit
        // and silently re-admit those texts' duplicates forever
        state = state.merge(TextOps.corpusTextBloom(
          kept, textCol, expectedItems, fpp, strongHash))
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** Kept corpus so far (all batches). */
  def corpus(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(corpusDir(stateDir))
}
