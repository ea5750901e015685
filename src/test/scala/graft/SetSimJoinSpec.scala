package graft

import org.apache.spark.sql.functions._
import graft.pairs.SetSimJoin
import graft.block.BlockingEval
import graft.expr.ExprKernels2
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def toks(xs: (Long, Seq[String])*) =
    xs.toDF("id", "toks")

  /** brute-force reference: every pair with q·|∩| >= p·(|a∪b|)-form */
  private def brute(rows: Seq[(Long, Seq[String])], p: Int, q: Int) =
    (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      inter = a.toSet.intersect(b.toSet).size
      if q * inter >= p * (a.toSet.size + b.toSet.size - inter)
    } yield (i, j, inter.toLong, a.toSet.size.toLong, b.toSet.size.toLong)).toSet

  test("jaccardSelfJoin equals brute force on a mixed corpus") {
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("alpha", "beta", "gamma", "delta"),
      2L -> Seq("alpha", "beta", "gamma", "epsilon"),
      3L -> Seq("alpha", "beta"),
      4L -> Seq("zeta", "eta", "theta"),
      5L -> Seq("zeta", "eta", "theta", "iota"),
      6L -> Seq("kappa"),
      7L -> Seq.empty, // empty sets never match
      8L -> Seq("alpha", "beta", "gamma", "delta")) // exact dup of 1
    for ((p, q) <- Seq((1, 2), (3, 4), (1, 1))) {
      val got = SetSimJoin.jaccardSelfJoin(toks(rows: _*), p, q)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == brute(rows, p, q), s"theta=$p/$q")
    }
  }

  test("prefix filter loses nothing when every token is frequent (worst case)") {
    // all records share a hot token; rare-prefix assumption degenerates
    val rows = (1L to 30L).map(i => i -> Seq("hot", s"t${i % 3}", s"u${i % 5}"))
    val got = SetSimJoin.jaccardSelfJoin(toks(rows: _*), 1, 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == brute(rows, 1, 2))
  }

  test("theta=1 returns exactly the identical-set pairs") {
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b"), 2L -> Seq("b", "a"), 3L -> Seq("a", "b", "c"))
    val got = SetSimJoin.jaccardSelfJoin(toks(rows: _*), 1, 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("setIntersect kernel dedups defensively") {
    def arr(xs: String*) =
      new GenericArrayData(xs.map(x => UTF8String.fromString(x): Any).toArray)
    assert(ExprKernels2.setIntersect(arr("a", "a", "b"), arr("a", "b", "b")) == 2L)
    assert(ExprKernels2.setIntersect(arr(), arr("a")) == 0L)
  }

  test("mongeElkan: exact match is 1.0, asymmetric, null on empty") {
    val df = Seq(
      (Seq("acme", "corp"), Seq("acme", "corp")),
      (Seq("acme"), Seq("acme", "corp", "worldwide")),
      (Seq("acme", "corp", "worldwide"), Seq("acme"))
    ).toDF("a", "b").select(gfunctions.monge_elkan(col("a"), col("b")).as("me"))
    val got = df.as[Option[Double]].collect()
    assert(got(0).contains(1.0))
    // one perfect token match out of one -> 1.0; out of three -> < 1.0
    assert(got(1).contains(1.0))
    assert(got(2).exists(v => v < 1.0 && v > 0.3))
    val empty = Seq((Seq.empty[String], Seq("x"))).toDF("a", "b")
      .select(gfunctions.monge_elkan(col("a"), col("b")).as("me"))
      .as[Option[Double]].collect()
    assert(empty(0).isEmpty)
  }

  test("softTfidf: identical vectors sum to ~1, theta gates, null on empty") {
    // identical L2-normalized vectors: every term self-matches at jw=1,
    // so stf = Σ w·w·1 = |v|² = 1
    val v = Map("acme" -> 0.8, "corp" -> 0.6)
    val df = Seq((v, v)).toDF("a", "b")
      .select(gfunctions.soft_tfidf(col("a"), col("b"), 0.9).as("stf"))
    assert(math.abs(df.as[Option[Double]].collect()(0).get - 1.0) < 1e-12)
    // below-theta best matches contribute nothing
    val far = Seq((Map("acme" -> 1.0), Map("zzz" -> 1.0))).toDF("a", "b")
      .select(gfunctions.soft_tfidf(col("a"), col("b"), 0.9).as("stf"))
    assert(far.as[Option[Double]].collect()(0).contains(0.0))
    // fuzzy term match: jw(acme, acmee) > 0.9 → contributes w_a·w_b·jw
    val fuzzy = Seq((Map("acme" -> 1.0), Map("acmee" -> 1.0))).toDF("a", "b")
      .select(gfunctions.soft_tfidf(col("a"), col("b"), 0.9).as("stf"))
    val got = fuzzy.as[Option[Double]].collect()(0).get
    assert(got > 0.9 && got < 1.0)
    val empty = Seq((Map.empty[String, Double], Map("x" -> 1.0))).toDF("a", "b")
      .select(gfunctions.soft_tfidf(col("a"), col("b"), 0.9).as("stf"))
      .as[Option[Double]].collect()
    assert(empty(0).isEmpty)
  }

  test("softTfidf: argmax tie resolves to the largest weight") {
    // both b-terms match 'acme' at jw == 1? no — craft equal sims via
    // duplicate-sim tokens: b has two terms equidistant from a's term;
    // the kernel must take the LARGER weight deterministically.
    // jw('ab', 'abx') == jw('ab', 'aby') — same structure, same score.
    val a = Map("ab" -> 1.0)
    val b1 = Map("abx" -> 0.25, "aby" -> 0.75) // map key order varies
    val b2 = Map("aby" -> 0.75, "abx" -> 0.25)
    val df = Seq((a, b1), (a, b2)).toDF("a", "b")
      .select(gfunctions.soft_tfidf(col("a"), col("b"), 0.5).as("stf"))
    val got = df.as[Option[Double]].collect()
    assert(got(0) == got(1) && got(0).isDefined)
    // contribution uses weight 0.75, not 0.25
    assert(got(0).get > 0.5 * 0.75 && got(0).get < 0.75)
  }

  test("sibling kernel expressions share one codegen scope without collision") {
    // two monge_elkan + a cosine in ONE projection over NON-NULLABLE
    // columns: nullSafeExec emits no scoping braces there, so fixed local
    // names would collide (janino error -> silent interpreted fallback).
    // fallback=false turns that silent downgrade into a test failure.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Seq("acme", "corp"), Seq("acme", "inc"), Seq(1.0, 0.0), Seq(1.0, 0.0)))
        .toDF("a", "b", "v1", "v2")
        .select(
          gfunctions.monge_elkan(col("a"), col("b")).as("me1"),
          gfunctions.monge_elkan(col("b"), col("a")).as("me2"),
          gfunctions.cosine_sim(col("v1"), col("v2")).as("cos"))
      val row = df.collect()(0)
      assert(row.getDouble(0) > 0.5 && row.getDouble(1) > 0.5)
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("blocking quality metrics on a known fixture") {
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val truth = Seq((1L, 2L), (4L, 5L), (6L, 7L)).toDF("id1", "id2")
    val row = BlockingEval.quality(cand, truth, nRecords = 10).collect()(0)
    assert(row.getAs[Long]("n_candidates") == 4L)
    assert(row.getAs[Long]("n_truth") == 3L)
    assert(row.getAs[Long]("n_hit") == 2L)
    assert(math.abs(row.getAs[Double]("reduction_ratio") - (1.0 - 4.0 / 45.0)) < 1e-12)
    assert(math.abs(row.getAs[Double]("pair_completeness") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(row.getAs[Double]("pairs_quality") - 0.5) < 1e-12)
  }
}
