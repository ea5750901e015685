package graft

import org.apache.spark.sql.functions._
import graft.cluster.Hierarchical
import graft.expr.AffineGap
import graft.gfunctions._
import graft.model.PredicateSpec
import graft.score.Training

class TrainingSpec extends SparkSpec {
  import spark.implicits._

  test("fitLR separates an obviously separable labeled set") {
    // feature x: dups ~0.95, non-dups ~0.1
    val labeled = (Seq.fill(40)((0.95, 1.0)) ++ Seq.fill(40)((0.9, 1.0)) ++
      Seq.fill(40)((0.1, 0.0)) ++ Seq.fill(40)((0.15, 0.0)))
      .toDF("f_x", "label")
    val (w, b) = Training.fitLR(labeled, Seq("f_x"), l2 = 0.01)
    val pDup = 1.0 / (1.0 + math.exp(-(b + w("f_x") * 0.92)))
    val pNon = 1.0 / (1.0 + math.exp(-(b + w("f_x") * 0.12)))
    assert(pDup > 0.7, s"pDup=$pDup")
    assert(pNon < 0.3, s"pNon=$pNon")
  }

  test("fitLRQuantized matches a hand-unrolled 2-step micro-unit fit") {
    // 2 rows, 1 feature: x=(0.5 -> y=1), (0.25 -> y=0). Step 1 from zero
    // weights: r = 0.5 - y, contributions round(xq*r):
    //   g_f = round(5e5*-0.5) + round(2.5e5*0.5) = -250000 + 125000
    //       = -125000;  g_b = round(1e6*-0.5) + round(1e6*0.5) = 0
    // update (lr=2, n=2): w_f = -round(2*-125000/2) = 125000; w_b = 0.
    val labeled = Seq((0.5, 1.0), (0.25, 0.0)).toDF("f", "y")
    val w1 = Training.fitLRQuantized(labeled, Seq("f"), "y",
      iters = 1, learnRate = 2.0)
    assert(w1("f") == 125000L, s"w_f=${w1("f")}")
    assert(w1("__bias__") == 0L, s"w_b=${w1("__bias__")}")
    // step 2 by hand: margins m = xq*125000 -> 6.25e10 / 3.125e10;
    // sigma(m/1e12) = sigma(0.0625)/sigma(0.03125)
    val s1 = 1.0 / (1.0 + math.exp(-0.0625))
    val s2 = 1.0 / (1.0 + math.exp(-0.03125))
    val gf = math.round(5e5 * (s1 - 1.0)) + math.round(2.5e5 * s2)
    val gb = math.round(1e6 * (s1 - 1.0)) + math.round(1e6 * s2)
    val w2 = Training.fitLRQuantized(labeled, Seq("f"), "y",
      iters = 2, learnRate = 2.0)
    assert(w2("f") == 125000L - math.round(2.0 * gf / 2.0), s"w_f=${w2("f")}")
    assert(w2("__bias__") == 0L - math.round(2.0 * gb / 2.0), s"w_b=${w2("__bias__")}")
    // determinism across partitionings: same answer from 1 and 8 slices
    val w2r = Training.fitLRQuantized(labeled.repartition(8), Seq("f"), "y",
      iters = 2, learnRate = 2.0)
    assert(w2 == w2r)
  }

  test("greedyPredicateCover picks the discriminating predicate") {
    val recs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), // dup pair blocked by token
      (3L, "gamma delta"), (4L, "gamma delta"),
      (5L, "unrelated one"), (6L, "second thing")).toDF("id", "name")
    val dupes = Seq((1L, 2L), (3L, 4L)).toDF("id1", "id2")
    val chosen = Training.greedyPredicateCover(
      recs, dupes,
      Seq(PredicateSpec("token", "name"), PredicateSpec("exists", "name")),
      maxPredicates = 1)
    assert(chosen.map(_.kind) == Seq("token")) // exists covers dups but costs 15 pairs
  }

  test("uncertainBatch picks mutual-rank least-certain pairs deterministically") {
    // |z|: (1,3)=0.05 < (1,2)=0.1 < (4,5)=0.2 < (2,3)=0.5
    val scored = Seq(
      (1L, 2L, 0.1), (1L, 3L, -0.05), (2L, 3L, 0.5), (4L, 5L, 0.2))
      .toDF("id1", "id2", "z")
    // cap=1: record 1 keeps (1,3), record 3 keeps (1,3) → mutual; record 2
    // keeps (1,2) but record 1 already spent its slot → (1,2) dropped;
    // (4,5) mutual trivially. Order: |−0.05| < 0.2.
    val b1 = Training.uncertainBatch(scored, batchSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(b1.toSeq == Seq((1L, 3L), (4L, 5L)))
    // cap=2 admits (1,2) (rank 2 for record 1, rank 1 for record 2) and
    // (2,3) (rank 2 for records 2 and 3)
    val b2 = Training.uncertainBatch(scored, batchSize = 10, perRecordCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(b2.toSeq == Seq((1L, 3L), (1L, 2L), (4L, 5L), (2L, 3L)))
    // batchSize truncates after the global uncertainty sort
    val b3 = Training.uncertainBatch(scored, batchSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(b3.toSeq == Seq((1L, 3L)))
  }

  test("samplePairsForLabeling is deterministic and bounded") {
    val recs = spark.range(100).select(col("id"))
    val blocked = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id1", "id2")
    val s1 = Training.samplePairsForLabeling(recs, blocked, 3, 5).collect().toSet
    val s2 = Training.samplePairsForLabeling(recs, blocked, 3, 5).collect().toSet
    assert(s1 == s2) // seeded
    assert(s1.nonEmpty)
  }

  test("affine gap: identity, and one long gap beats two split gaps") {
    assert(AffineGap.distance("same", "same") == 4 * AffineGap.matchWeight)
    // the affine property: inserting XY contiguously is cheaper than
    // inserting X and Y at separate positions (one gap-open vs two)
    val oneGap = AffineGap.distance("abcdef", "abcXYdef")
    val twoGaps = AffineGap.distance("abcdef", "abXcdYef")
    assert(oneGap < twoGaps, s"$oneGap !< $twoGaps")
    assert(AffineGap.distance("", "") == 0.0)
    assert(AffineGap.normalized("", "") == 0.0)
    assert(AffineGap.distance("", "ab") ==
      AffineGap.gapWeight + 2 * AffineGap.spaceWeight)
  }

  test("metaphone predicate blocks homophones together") {
    val df = Seq("smith", "smyth", "jones").toDF("f")
    val keys = df.select(explode(metaphone_tokens(tokens($"f"))).as("k"))
      .as[String].collect()
    assert(keys(0) == keys(1)) // smith/smyth share a code
    assert(keys(0) != keys(2))
  }

  test("haversine spot value: Paris-London ~343 km") {
    val df = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("la1", "lo1", "la2", "lo2")
    val d = df.select(haversine_km($"la1", $"lo1", $"la2", $"lo2")).as[Double].collect()(0)
    assert(math.abs(d - 343.5) < 2.0, s"got $d")
  }

  test("hierarchical refinement splits a weakly-bridged component") {
    // two tight pairs bridged by one weak edge: CC merges all four; HAC at
    // cut=0.5 splits them (bridge distance 0.45 < 0.5 merges though...
    // use bridge 0.35 score → distance 0.65 > cut → split)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("id", "component")
    val pairs = Seq(
      (1L, 2L, 0.95), (3L, 4L, 0.95), (2L, 3L, 0.35))
      .toDF("id1", "id2", "score")
    val refined = Hierarchical.refine(labels, pairs, cut = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined(1L) == refined(2L))
    assert(refined(3L) == refined(4L))
    assert(refined(1L) != refined(3L), s"expected split, got $refined")
  }

  test("refine ignores cross-component candidate pairs (one label per id)") {
    // Dedupe passes ALL candidate pairs, including sub-threshold
    // cross-component ones; (2,3) here links components 1 and 3 at score
    // 0.2 — it must NOT pull 3 into component 1's HAC group (that emitted
    // duplicate conflicting labels before the fix).
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("id", "component")
    val pairs = Seq(
      (1L, 2L, 0.95), (3L, 4L, 0.95), (2L, 3L, 0.2))
      .toDF("id1", "id2", "score")
    val out = Hierarchical.refine(labels, pairs, cut = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 4, s"duplicate labels: ${out.toSeq}")
    val m = out.toMap
    assert(m(1L) == m(2L) && m(3L) == m(4L) && m(1L) != m(3L))
  }

  test("Lance-Williams HAC handles a 1000-node component in seconds") {
    // 1000 nodes in one CC component: a chain of strong edges. The naive
    // average-linkage recomputation was O(n^3)-O(n^4); Lance-Williams
    // updates finish quickly, labels unchanged (all merge: distances 0.1).
    val n = 1000
    val labels = (1 to n).map(i => (i.toLong, 1L)).toDF("id", "component")
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong, 0.9))
      .toDF("id1", "id2", "score")
    val t0 = System.nanoTime()
    val out = Hierarchical.refine(labels, pairs, cut = 0.5,
      maxComponentSize = 2000).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length == n)
    assert(sec < 60.0, s"HAC too slow: $sec s")
    // chain at distance 0.1 merges fully under average linkage? no — the
    // average distance between growing clusters includes many unobserved
    // (=1.0) pairs, so the chain fragments; assert structure is stable
    // instead: every node labeled exactly once
    assert(out.map(_.getLong(0)).distinct.length == n)
  }

  test("hierarchical refinement keeps a tight component whole") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "component")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.85), (1L, 3L, 0.8))
      .toDF("id1", "id2", "score")
    val refined = Hierarchical.refine(labels, pairs, cut = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined.values.toSet.size == 1)
  }
}
