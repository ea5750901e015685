package graft

import org.apache.spark.sql.functions._
import graft.graphops.PageRank

/** Integer-mass PageRank (graphops/PageRank) vs an in-memory reference. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Independent single-threaded implementation of the exact update. */
  private def reference(links: Seq[(String, String)], iters: Int,
      damping: Double = 0.85, total: Long = 1000000000000L): Map[String, Long] = {
    val nodes = (links.map(_._1) ++ links.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outd = links.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> total / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outd.contains).map(r).sum
      val in = links.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outd(u) }.sum).toMap
      r = nodes.map { v =>
        v -> (math.floor((1.0 - damping) * total.toDouble / n).toLong +
          math.floor(damping * (in.getOrElse(v, 0L) + dang / n)).toLong)
      }.toMap
    }
    r
  }

  private def runSpark(links: Seq[(String, String)], iters: Int): Map[String, Long] =
    PageRank.run(links.toDF("s", "d"), "s", "d", iters = iters)
      .select("node", "rank_mass").as[(String, Long)].collect().toMap

  test("hand graph with a dangling sink matches the reference") {
    // a <-> b, b -> c (c dangling)
    val links = Seq(("a", "b"), ("b", "a"), ("b", "c"))
    assert(runSpark(links, 3) == reference(links, 3))
  }

  test("multigraph + self-loop semantics match the reference") {
    // parallel edges count in outdeg and shares; self-loop is legal
    val links = Seq(("a", "b"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "a"))
    assert(runSpark(links, 4) == reference(links, 4))
  }

  test("seeded random graphs match the reference bit for bit") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 12 + rnd.nextInt(8)
      val links = Seq.fill(60)((s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      assert(runSpark(links, 3) == reference(links, 3))
    }
  }

  test("mass is conserved up to integer-division floor leakage") {
    val rnd = new scala.util.Random(7)
    val links = Seq.fill(80)((s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
    val out = PageRank.run(links.toDF("s", "d"), "s", "d", iters = 5)
    val total = out.agg(sum("rank_mass")).head().getLong(0)
    assert(total <= 1000000000000L)
    assert(total > 999999990000L, s"leaked too much: $total") // < 1e-8 relative
  }

  test("hostLinks extracts hrefs with the production regex") {
    val pages = Seq(
      ("h.example", """<a href="https://a.example/x">1</a> <a href="http://b.example">2</a> plain https://c.example/skip"""),
      ("j.example", """<a href="https://d.example:8080/x">port</a> <a href="https://u:p@e.example/">userinfo</a> <a href="https://f.example?q=1">query</a>"""),
      ("i.example", "no links here")).toDF("host", "html")
    val out = PageRank.hostLinks(pages, "host", "html")
      .as[(String, String)].collect().toSet
    assert(out == Set(("h.example", "a.example"), ("h.example", "b.example"),
      ("j.example", "d.example"), ("j.example", "e.example"),
      ("j.example", "f.example")))
  }
}
