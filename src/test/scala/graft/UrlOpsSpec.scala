package graft

import org.apache.spark.sql.functions._
import graft.textops.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalUrl($"url")).as[String].collect().toSeq

  test("canonicalUrl: case, default port, fragment, tracking params, slashes") {
    assert(canon("HTTP://Host.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag") ==
      Seq("http://host.example.com/a/b?a=1&b=2"))
    assert(canon("https://X.com:443/") == Seq("https://x.com/"))
    // non-default port survives; path case survives (only authority lowers)
    assert(canon("https://x.com:8443/Pp") == Seq("https://x.com:8443/Pp"))
    assert(canon("http://x.com") == Seq("http://x.com/"))
    assert(canon("http://x.com/?utm_campaign=z") == Seq("http://x.com/"))
    assert(canon("http://x.com/p#sec") == Seq("http://x.com/p"))
    // utmx is NOT a tracking prefix (utm_ only); params sort
    assert(canon("http://x.com/p?z=9&utmx=1") == Seq("http://x.com/p?utmx=1&z=9"))
    // https default port only strips on https scheme
    assert(canon("http://x.com:443/p") == Seq("http://x.com:443/p"))
  }

  test("latestCapture: newest ts wins, raw url breaks ties, census counts") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("http://a.com/p?x=1#f", t("2017-07-14 10:00:00"), "pay1"),
      ("HTTP://A.com:80/p?x=1", t("2017-07-14 10:00:00"), "pay2"),
      ("http://a.com/p/?x=1", t("2017-07-14 11:00:00"), "pay3"),
      ("http://b.com/q", t("2017-07-14 09:00:00"), "pay4"))
      .toDF("url", "warc_ts", "text")
    val got = UrlOps.latestCapture(df)
      .select($"canon_url", $"url", $"text", $"n_captures")
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(
      ("http://a.com/p?x=1", "http://a.com/p/?x=1", "pay3", 3L),
      ("http://b.com/q", "http://b.com/q", "pay4", 1L)))
    // all-equal timestamps: the greatest raw url string wins
    val tied = df.withColumn("warc_ts", lit(t("2017-07-14 10:00:00")))
    val w = UrlOps.latestCapture(tied).filter($"canon_url" === "http://a.com/p?x=1")
      .select($"url").as[String].collect().toSeq
    assert(w == Seq("http://a.com/p?x=1#f"))
  }

  test("host: authority minus userinfo/port, lowercased") {
    val h = (u: String) =>
      Seq(u).toDF("url").select(UrlOps.host($"url")).as[String].head()
    assert(h("HTTP://User:pw@Host.Example.COM:8080/p?q#f") == "host.example.com")
    assert(h("https://x.com/") == "x.com")
    assert(h("https://x.com") == "x.com")
    // no parseable authority -> null, never ''
    assert(h("//cdn.example/x") == null)
    assert(h("mailto:a@b.c") == null)
    assert(h("example.com/path") == null)
  }

  test("domainCap: unparseable URLs are quota'd per raw URL, not lumped " +
      "into one pseudo-host") {
    val df = ((0 until 40).map(i => (i.toLong, s"rel/path/$i", 1L)) :+
        (99L, "https://real.example/p", 1L)).toDF("id", "url", "score")
    val out = UrlOps.domainCap(df, "url", "id", $"score", maxPerHost = 2)
    // all 40 distinct unparseable URLs survive (each its own quota group)
    assert(out.count() == 41)
    assert(out.filter($"host".isNull).count() == 40)
    assert(out.filter($"host" === "real.example").count() == 1)
    // identical unparseable URLs DO share a quota group
    val dup = (0 until 10).map(i => (i.toLong, "rel/same", (i % 3).toLong))
      .toDF("id", "url", "score")
    assert(UrlOps.domainCap(dup, "url", "id", $"score", maxPerHost = 2)
      .count() == 2)
    // namespace collision: a schemeless raw url EQUAL to a real hostname
    // must not share that host's quota bucket
    val clash = ((0 until 5).map(i =>
        (i.toLong, s"http://collide.example/p$i", 10L)) :+
        (50L, "collide.example", 0L)).toDF("id", "url", "score")
    val capped = UrlOps.domainCap(clash, "url", "id", $"score", maxPerHost = 5)
    assert(capped.count() == 6, "the raw-url row must keep its own bucket")
    assert(capped.filter($"id" === 50L).count() == 1)
  }

  test("domainCap: two-stage salted top-k equals the single-window top-k") {
    // Skewed synthetic crawl: host 0 gets half the rows; score collides
    // heavily so the id tie-break is exercised.
    val rows = (0 until 2000).map { i =>
      val host = if (i % 2 == 0) 0 else i % 13 + 1
      (i.toLong, s"https://h$host.example/p/$i", (i * 7 % 19).toLong)
    }
    val df = rows.toDF("id", "url", "score")
    def run(salts: Int) =
      UrlOps.domainCap(df, "url", "id", $"score", maxPerHost = 7, salts = salts)
        .select($"host", $"host_rank", $"id", $"score")
        .as[(String, Int, Long, Long)].collect().toSet
    val oneStage = run(0)
    assert(run(4) == oneStage && run(16) == oneStage)
    // exactness: per host, the kept set is exactly the top-7 by
    // (score desc, id asc) of ALL that host's rows
    val byHost = rows.groupBy(r => UrlOpsSpecHelp.hostOf(r._2))
    for ((h, rs) <- byHost) {
      val want = rs.sortBy(r => (-r._3, r._1)).take(7)
        .zipWithIndex.map { case (r, i) => (h, i + 1, r._1, r._3) }.toSet
      assert(oneStage.filter(_._1 == h) == want, s"host $h")
    }
    // every kept row ranks within the cap
    assert(oneStage.forall(_._2 <= 7))
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-text rows") {
    val oldSnap = Seq(
      ("http://a.com/1", "alpha"),
      ("http://a.com/2", "beta"),
      ("http://a.com/3", "gamma"),
      ("http://a.com/4", null),
      ("http://a.com/5", null)).toDF("url", "text")
    val newSnap = Seq(
      ("http://a.com/1", "alpha"),          // unchanged
      ("http://a.com/2", "beta v2"),        // changed
      // /3 absent → removed
      ("http://a.com/4", null),             // null == null → unchanged
      ("http://a.com/5", "now has text"),   // null → text = changed
      ("http://a.com/6", "fresh")).toDF("url", "text") // added
    val got = UrlOps.snapshotDiff(oldSnap, newSnap)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("http://a.com/1", "unchanged"),
      ("http://a.com/2", "changed"),
      ("http://a.com/3", "removed"),
      ("http://a.com/4", "unchanged"),
      ("http://a.com/5", "changed"),
      ("http://a.com/6", "added")))
  }

  test("snapshotDiff: the join shuffles digests, not page text") {
    val oldSnap = Seq(("u1", "x" * 64)).toDF("url", "text")
    val newSnap = Seq(("u1", "y" * 64)).toDF("url", "text")
    val plan = UrlOps.snapshotDiff(oldSnap, newSnap)
      .queryExecution.optimizedPlan
    // the md5 projection must sit BELOW the join: no raw `text`
    // attribute may enter the join from either side
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty, "expected a join in the optimized plan")
    for (j <- joins; c <- j.children)
      assert(!c.output.exists(_.name == "text"),
        s"raw text column crossed the join: ${c.output.mkString(", ")}")
  }
}

private object UrlOpsSpecHelp {
  def hostOf(url: String): String =
    url.stripPrefix("https://").takeWhile(c => c != '/' && c != ':')
}
