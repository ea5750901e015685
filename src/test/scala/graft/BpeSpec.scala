package graft

import org.apache.spark.sql.functions._
import graft.gfunctions.bpe_apply
import graft.textops.Bpe

/** Distributed BPE training (textops/Bpe) against the hand-derived
  * merge sequence of the classic Sennrich corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word frequencies: low:5 lower:2 newest:6 widest:3 (Sennrich ACL16†)
  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))).toDF("id", "text")

  test("merge sequence matches the hand-derived pair counts and tie-breaks") {
    val census = Bpe.wordCensus(corpus, "text")
    val (merges, _) = Bpe.train(census, k = 5)
    // (e,s):9 ties (s,t):9 (t,</w>):9 -> lexicographic; then cascades;
    // then (l,o):7 ties (o,w):7 -> lexicographic; then (lo,w):7
    assert(merges.map(m => (m.step, m.left, m.right, m.freq)) == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)))
  }

  test("training stops when the best pair drops under minFreq") {
    val census = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt")
    val (merges, _) = Bpe.train(census, k = 10, minFreq = 2L)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("encode applies the learned rules in order") {
    val census = Bpe.wordCensus(corpus, "text")
    val (merges, _) = Bpe.train(census, k = 5)
    val out = Bpe.encode(Seq((9L, "lowest low")).toDF("id", "text"),
        "id", "text", merges)
      .orderBy("word").select("word", "bpe").as[(String, Seq[String])]
      .collect().toSeq
    // lowest: l o w e s t </w> --(e,s)(es,t)(est,</w>)--> l o w est</w>
    //         --(l,o)--> lo w est</w> --(lo,w)--> low est</w>
    assert(out == Seq(
      ("low", Seq("low", "</w>")),
      ("lowest", Seq("low", "est</w>"))))
  }

  test("greedy left-to-right merge handles overlaps non-recursively") {
    val out = Seq(Tuple1(Seq("a", "a", "a", "a", "a")))
      .toDF("syms")
      .select(bpe_apply(col("syms"), Seq(("a", "a"))).as("m"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "aa", "a"))
  }

  test("kernel output is stable under repartitioning (exact counts)") {
    val census = Bpe.wordCensus(corpus.repartition(7), "text")
    val (merges, finalSyms) = Bpe.train(census, k = 3)
    assert(merges.map(_.freq) == Seq(9L, 9L, 9L))
    val syms = finalSyms.orderBy("word").select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(syms("newest") == Seq("n", "e", "w", "est</w>"))
    assert(syms("widest") == Seq("w", "i", "d", "est</w>"))
  }
}
