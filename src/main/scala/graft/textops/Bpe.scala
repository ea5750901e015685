package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gfunctions.{bpe_apply, char_ngrams, tokens}
import graft.cluster.Checkpoints

/**
 * Distributed BPE vocabulary training (Sennrich et al., "Neural Machine
 * Translation of Rare Words with Subword Units", ACL 2016†) — learn the
 * subword tokenizer ON the corpus the engine curates, the step every
 * LLM data pipeline runs between cleaning and token counting. The
 * engine's `bpeishCount` is a regex approximation; this is the real
 * algorithm.
 *
 * Structure: the corpus is scanned ONCE into a word census (map-side-
 * combined groupBy — the explode never shuffles raw text). Training
 * then iterates over the census, which is vocabulary-sized (big enough
 * to stay distributed at crawl scale — 10^9 distinct tokens — but
 * never corpus-sized): each merge step is (1) one map-side-combinable
 * pair-count aggregation over adjacent symbol pairs weighted by word
 * count, (2) a 1-row TakeOrdered argmax to the driver (count desc,
 * pair asc — the deterministic tie-break), (3) one codegen'd kernel
 * pass rewriting symbol arrays (expr.BpeApplyExpr). Counts are exact
 * integers, so every merge decision is bit-reproducible across
 * partitionings and AQE re-plans. Lineage is truncated on the shared
 * Checkpoints policy every few steps; the census is cached between
 * steps so step i never replays steps 1..i-1.
 *
 * Word boundary: the classic end-of-word marker `</w>` appended to
 * each word's character sequence†, so merges can learn suffixes
 * without crossing words.
 */
object Bpe {

  val EndOfWord = "</w>"

  /** Corpus scan → (word, cnt) census over lowercased unicode tokens. */
  def wordCensus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence: single characters + the end-of-word mark. */
  private def initSyms(word: Column): Column =
    concat(char_ngrams(word, 1), array(lit(EndOfWord)))

  /** Adjacent symbol pairs of an array: zip(s[0..n-2], s[1..n-1]). */
  private def adjacentPairs(syms: Column): Column =
    zip_with(slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** One learned merge: step (1-based), the pair, its frequency when
    * chosen, and the resulting symbol. */
  final case class Merge(step: Int, left: String, right: String, freq: Long)

  /**
   * Learn up to `k` merges from a word census. Stops early when the
   * best remaining pair occurs < `minFreq` times. Returns the ordered
   * merge list and the final (word, cnt, syms) table.
   */
  def train(census: DataFrame, k: Int, minFreq: Long = 2L,
            checkpointEvery: Int = 8): (Seq[Merge], DataFrame) = {
    require(k >= 1, "need k >= 1 merges")
    val spark = census.sparkSession
    var syms = census
      .select(col("word"), col("cnt"), initSyms(col("word")).as("syms"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var step = 1
    while (step <= k && !done) {
      val top = syms
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, a, b, c)
        val next0 = syms.withColumn("syms",
          bpe_apply(col("syms"), Seq((a, b))))
        val next =
          if (step % checkpointEvery == 0) Checkpoints.checkpointed(next0, spark)
          else next0
        val prev = syms
        syms = next.persist()
        syms.count() // materialize before dropping the parent cache
        prev.unpersist()
        step += 1
      }
    }
    (merges.toSeq, syms)
  }

  /** Tokenize text with a learned merge list: one kernel pass applies
    * every rule in order (id, word, bpe array<string>, n_bpe). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val rules = merges.sortBy(_.step).map(m => (m.left, m.right))
    docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("word"))
      .withColumn("bpe", bpe_apply(initSyms(col("word")), rules))
      .withColumn("n_bpe", size(col("bpe")))
  }
}
