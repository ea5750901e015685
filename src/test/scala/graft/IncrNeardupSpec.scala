package graft

import org.apache.spark.sql.functions._
import graft.textops.TextOps

/**
 * Incremental MinHash near-dup vs a persisted corpus signature index
 * (TextOps.minhashSignatures / minhashBandKeys / neardupAgainstCorpus).
 */
class IncrNeardupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away " +
      "into the deep green forest before the sun finally sets tonight"

  private def corpus = Seq(
    (10L, base),
    (11L, "completely different corpus content about spark shuffles and " +
      "partitions written for the second corpus entry here today"),
    (12L, "a third unrelated corpus document covering sailing knots and " +
      "maritime navigation across the northern atlantic passage route"),
    (13L, "error 404"))  // shingle-less (< 3 tokens): must match nothing
    .toDF("doc_id", "text")

  test("neardupAgainstCorpus: exact, near, novel, null-text and " +
      "shingle-less batches — one row per batch doc") {
    val batch = Seq(
      (1L, base),                               // exact dup of 10 → est 1.0
      (2L, base.replace("lazy", "sleepy")),     // near dup of 10
      (3L, "entirely novel text about quantum chemistry simulations on " +
        "distributed accelerator clusters with tensor contraction engines"),
      (4L, null),                               // null text → novel, kept
      // shingle-less: must NOT alias to corpus doc 13 (the all-sentinel
      // signature both sides would share without the null-sig guard)
      (5L, "ok thanks"))
      .toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(corpus, "doc_id", "text")
    val got = TextOps.neardupAgainstCorpus(batch, sigs, "doc_id", "text",
        estThreshold = 0.5)
      .as[(Long, Boolean, Option[Long], Option[Double], Boolean)]
      .collect().sortBy(_._1)
    assert(got.length == 5, s"one row per batch doc, got ${got.toSeq}")
    val Array(exact, near, novel, nullText, shingleless) = got
    assert(exact == ((1L, true, Some(10L), Some(1.0), false)))
    assert(near._2 && near._3.contains(10L) && !near._5)
    assert(near._4.exists(e => e >= 0.5 && e < 1.0),
      s"near-dup estimate out of band: $near")
    assert(novel == ((3L, false, None, None, true)))
    assert(nullText == ((4L, false, None, None, true)))
    assert(shingleless == ((5L, false, None, None, true)),
      "shingle-less docs must never match (sentinel aliasing)")
  }

  test("a pre-built band-key index finds exactly what derived keys find") {
    val batch = Seq((1L, base), (2L, base + " with a small tail change"))
      .toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(corpus, "doc_id", "text")
    val idx = TextOps.minhashBandKeys(sigs)
    val derived = TextOps.neardupAgainstCorpus(batch, sigs, "doc_id", "text",
      estThreshold = 0.4).collect().toSet
    val prebuilt = TextOps.neardupAgainstCorpus(batch, sigs, "doc_id", "text",
      estThreshold = 0.4, corpusIndex = Some(idx)).collect().toSet
    assert(derived == prebuilt)
  }

  test("hot-bucket guard: boilerplate bands above the cap stop matching") {
    // 30 corpus docs sharing identical text → every band bucket holds 30
    val hot = (100L to 129L).map(i => (i, base)).toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(hot, "doc_id", "text")
    val batch = Seq((1L, base)).toDF("doc_id", "text")
    val capped = TextOps.neardupAgainstCorpus(batch, sigs, "doc_id", "text",
      maxBucketSize = 10)
      .as[(Long, Boolean, Option[Long], Option[Double], Boolean)].collect()
    assert(capped.toSeq == Seq((1L, false, None, None, true)),
      "all bands are hot: the guard must suppress every candidate")
    val uncapped = TextOps.neardupAgainstCorpus(batch, sigs, "doc_id", "text",
      maxBucketSize = 200).collect()
    assert(uncapped.head.getBoolean(1), "with the cap lifted the dup is found")
  }

  test("est tie at equal estimate breaks to the largest corpus id") {
    // two identical corpus docs: batch doc estimates 1.0 against both
    val twoSame = Seq((20L, base), (21L, base)).toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(twoSame, "doc_id", "text")
    val batch = Seq((1L, base)).toDF("doc_id", "text")
    val got = TextOps.neardupAgainstCorpus(batch, sigs, "doc_id", "text")
      .select("dup_of").as[Long].collect()
    assert(got.toSeq == Seq(21L))
  }

  test("index lifecycle: appending a batch's novel rows catches the " +
      "next batch's recrawl of them") {
    val corpusSigs = TextOps.minhashSignatures(corpus, "doc_id", "text")
    val novelText = "entirely new page about container scheduling and " +
      "bin packing heuristics for heterogeneous accelerator fleets"
    val b1 = Seq((100L, novelText)).toDF("doc_id", "text")
    val r1 = TextOps.neardupAgainstCorpus(b1, corpusSigs, "doc_id", "text")
      .as[(Long, Boolean, Option[Long], Option[Double], Boolean)].collect()
    assert(r1.toSeq == Seq((100L, false, None, None, true)))
    // the documented caller workflow: keep ids' signatures append to the
    // corpus signature table (and their band keys to the index)
    val b1Sigs = TextOps.minhashSignatures(b1, "doc_id", "text")
    val grown = corpusSigs.unionByName(b1Sigs)
    val idx2 = TextOps.minhashBandKeys(grown, carrySig = true)
    val b2 = Seq((200L, novelText),                       // recrawl of 100
      (201L, base.replace("dog", "cat")))                 // near dup of 10
      .toDF("doc_id", "text")
    val r2 = TextOps.neardupAgainstCorpus(b2, grown, "doc_id", "text",
        estThreshold = 0.5, corpusIndex = Some(idx2))
      .as[(Long, Boolean, Option[Long], Option[Double], Boolean)]
      .collect().sortBy(_._1)
    assert(r2.length == 2, s"one row per batch doc, got ${r2.toSeq}")
    assert(r2(0) == ((200L, true, Some(100L), Some(1.0), false)),
      s"appended index must catch the recrawl: ${r2.toSeq}")
    assert(r2(1)._2 && r2(1)._3.contains(10L),
      s"pre-existing corpus must still match: ${r2.toSeq}")
  }

  test("the corpus side of the probe join is never shuffled") {
    val sigs = TextOps.minhashSignatures(corpus, "doc_id", "text")
    val batch = Seq((1L, base)).toDF("doc_id", "text")
    val out = TextOps.neardupAgainstCorpus(batch, sigs, "doc_id", "text")
    val phys = out.queryExecution.executedPlan.toString
    // every join the corpus participates in is a broadcast join: the
    // plan may contain no sort-merge join and no shuffled hash join
    assert(!phys.contains("SortMergeJoin"), phys.take(2000))
    assert(!phys.contains("ShuffledHashJoin"), phys.take(2000))
  }
}
