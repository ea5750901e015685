package graft

import org.apache.spark.sql.functions._
import graft.block.MetaBlocking
import graft.pairs.PairGen

/** Meta-blocking (block filtering → CBS weighting → WNP pruning). */
class MetaBlockingSpec extends SparkSpec {
  import spark.implicits._

  test("filterBlocks: each record keeps its ceil(ratio*n) smallest " +
      "blocks, ties on size break by key") {
    // sizes: a=3 {1,2,3}, b=2 {1,2}, c=2 {1,2}, d=1 {1}, e=2 {3,4}, f=2 {4,5}
    val blocks = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "e"),
      (4L, "e"), (4L, "f"),
      (5L, "f")).toDF("id", "block_key")
    val got = MetaBlocking.filterBlocks(blocks, 0.75)
      .as[(Long, String)].collect().toSet
    // id 1 has 4 blocks, keeps ceil(3)=3 smallest: d(1), b(2), c(2) — a(3) dropped
    // ids 2..5 keep everything (ceil(3*.75)=3, ceil(2*.75)=2, ceil(1*.75)=1)
    assert(got == Set(
      (1L, "d"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "e"),
      (4L, "e"), (4L, "f"),
      (5L, "f")))
  }

  // (1,2) share p,q,r; (2,3) share s,t,u; (1,3) share only v; (8,9)
  // share x — an isolated pair whose weight IS its nodes' mean
  private def weightFixture = Seq(
    (1L, "p"), (2L, "p"), (1L, "q"), (2L, "q"), (1L, "r"), (2L, "r"),
    (2L, "s"), (3L, "s"), (2L, "t"), (3L, "t"), (2L, "u"), (3L, "u"),
    (1L, "v"), (3L, "v"),
    (8L, "x"), (9L, "x")).toDF("id", "block_key")

  test("weightedPairs: CBS = number of shared plural under-cap blocks") {
    val got = MetaBlocking.weightedPairs(weightFixture)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (2L, 3L, 3L), (1L, 3L, 1L), (8L, 9L, 1L)))
  }

  test("weightedPairs: multiplicity is chunking-invariant (one emission " +
      "per shared block under any grid width)") {
    val wide = MetaBlocking.weightedPairs(weightFixture).collect().toSet
    val narrow = MetaBlocking.weightedPairs(weightFixture, chunkTarget = 1)
      .collect().toSet
    assert(wide == narrow)
  }

  test("weightedPairs' pair set equals candidatePairs' (the J3 dedup " +
      "and the count aggregate see the same stream)") {
    val viaCount = MetaBlocking.weightedPairs(weightFixture)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val viaDedup = PairGen.candidatePairs(weightFixture)
      .as[(Long, Long)].collect().toSet
    assert(viaCount == viaDedup)
  }

  test("wnpPrune: keeps a pair reaching either endpoint's mean, prunes " +
      "when both ends are above it; integer boundary (w*n == s) keeps") {
    // node means: 1 -> (3+1)/2=2, 2 -> (3+3)/2=3, 3 -> (3+1)/2=2,
    // 8/9 -> 1. (1,3) w=1 fails both ends (1<2, 1<2) -> pruned; the
    // isolated (8,9) w=1 sits exactly ON its mean -> kept.
    val got = MetaBlocking.prune(weightFixture, ratio = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (2L, 3L, 3L), (8L, 9L, 1L)))
  }

  test("prune composes with block filtering without changing this " +
      "fixture (every record's block count is within ratio 0.75)") {
    // each id holds <= 7 blocks; ceil(n*0.75) drops at most the largest
    // blocks — here all blocks have size 2, ties keep smallest keys, and
    // weights can only drop. Sanity: output is a subset of the unfiltered
    // prune and the strong pairs survive.
    val pruned = MetaBlocking.prune(weightFixture, ratio = 0.75)
      .as[(Long, Long, Long)].collect().toSet
    val unfiltered = MetaBlocking.prune(weightFixture, ratio = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pruned.map(p => (p._1, p._2)).subsetOf(
      unfiltered.map(p => (p._1, p._2)) + ((1L, 3L))))
    assert(pruned.exists(p => (p._1, p._2) == ((1L, 2L))))
    assert(pruned.exists(p => (p._1, p._2) == ((2L, 3L))))
  }
}
