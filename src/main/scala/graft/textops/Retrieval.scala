package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gfunctions._

/**
 * BM25 inverted-index retrieval over a documents table — the search-side
 * companion to the dedup toolkit (a training-data pipeline needs corpus
 * search for decontamination audits, targeted sampling, and eval-set
 * neighbor checks, not just pairwise dedup).
 *
 * Two-phase by design, mirroring a production index lifecycle:
 *   1. [[bm25Index]] builds a self-contained postings DataFrame
 *      `(term, doc_id, tf, dl, idf, avgdl)` — persistable to parquet and
 *      reusable across query batches. idf/dl/avgdl are denormalized onto
 *      every posting row — Lucene stores the same data as term-dictionary
 *      entries + norms; columnar RLE compresses the repetition away, and
 *      the payoff is that SCORING needs no corpus-sized join at all. The
 *      build pays two one-time amortized shuffles for it (term-keyed idf
 *      attach — AQE skew-split handles the frequent-term head — and
 *      doc-keyed dl attach).
 *   2. [[bm25TopK]] scores a (small) query table against it.
 *
 * Scale shape: the postings build is one explode + two hash aggregates
 * (doc-term tf, then per-term df) — shuffles keyed on (doc, term) and
 * term respectively, both map-side-combined. Scoring never shuffles the
 * postings by term at all: the query-term list is broadcast, so the big
 * side streams through a BroadcastHashJoin and the only shuffle is the
 * per-(query, doc) score aggregation, whose size is bounded by
 * Σ_q Σ_{t∈q} df(t). The `maxDfRatio` prune keeps that bound useful:
 * a stopword term with df ≈ N would otherwise drag the whole corpus into
 * the aggregation for every query containing it (Lucene drops nothing but
 * pays with skip lists; in a shuffle engine, df-pruning is the honest
 * equivalent and standard practice for web-scale corpora).
 *
 * Scoring formula (Lucene's non-negative BM25 variant):
 *   idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
 *   s(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))
 * Repeated query terms count once (distinct), like Lucene's default.
 * Every input to the formula is exact integer arithmetic (tf, dl, df, N
 * and avgdl = exact-integer-sum / count), so each PER-TERM contribution
 * is a bit-identical double up to `ln`'s 1-ulp licence. The per-doc SUM
 * of those doubles would still be summation-order-dependent (partial
 * aggregation order varies with AQE and differs from any other engine),
 * so contributions are quantized to 1e-6 micro-units (bigint) and summed
 * as exact integers — order-independent, map-side combinable, and
 * reproducible across retries/re-plans; score = micros/1e6. Ranking ties
 * break on (score, doc_id) so the top-k cutoff is engine-independent.
 */
object Retrieval {

  /**
   * Build the postings index: one row per (doc, term) with the
   * term-frequency, the doc length, the corpus-level BM25 idf, and the
   * corpus average doc length. `maxDfRatio` drops terms appearing in
   * more than that fraction of documents (df-pruning; see class doc).
   */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String,
                maxDfRatio: Double = 0.5): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // Global scalars ride a broadcast 1-row crossJoin (no driver collect,
    // one job): N docs and avgdl = exact integer sum / count.
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val terms = dfreq
      .crossJoin(broadcast(stats))
      .filter(col("df") <= col("n_docs") * lit(maxDfRatio))
      .select(col("term"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"),
        col("avgdl"))
    tf.join(terms, "term")
      .join(dl, "doc_id")
      .select("term", "doc_id", "tf", "dl", "idf", "avgdl")
  }

  /**
   * Score a query table against a [[bm25Index]] postings DataFrame and
   * return the top-k docs per query: `(qid, doc_id, rank, score)`.
   * The query side is broadcast (query batches are human-sized; the
   * corpus is not) — asserted in RetrievalSpec's plan test.
   */
  def bm25TopK(index: DataFrame, queries: DataFrame, qidCol: String,
               qtextCol: String, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // per-row array_distinct (one text per qid) — no shuffle anywhere on
    // the query side; a dedup-by-distinct() would hash-partition by term
    val qterms = queries
      .select(col(qidCol).as("qid"),
        explode(array_distinct(tokens(col(qtextCol)))).as("term"))
    val contrib = col("idf") * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    // quantize per-term contributions to 1e-6 micro-units and sum exact
    // integers: the score (and thus the rank cutoff) is independent of
    // summation order — see class doc
    val scored = index
      .join(broadcast(qterms), "term")
      .groupBy("qid", "doc_id")
      .agg((sum(round(contrib * lit(1e6), 0).cast("long")) / lit(1e6)).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "rank", "score")
  }

  /** Convenience: index + search in one call. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, qidCol: String, qtextCol: String,
                 k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                 maxDfRatio: Double = 0.5): DataFrame =
    bm25TopK(bm25Index(docs, idCol, textCol, maxDfRatio),
      queries, qidCol, qtextCol, k, k1, b)
}
