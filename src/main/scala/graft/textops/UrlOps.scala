package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL curation operators for Common-Crawl-style page tables
 * (url, warc_ts, html, text, lang) — the capture-dedup step a crawl
 * pipeline runs before any content-level dedup: multiple WARC captures
 * of the same logical page (recrawls, tracking-param variants,
 * case/port/slash spelling differences) collapse to one canonical URL,
 * keeping the newest capture.
 *
 * Pure built-in column compositions — no UDFs — so canonicalization
 * fuses into scan-side codegen and the per-URL pick is a map-side
 * partial `max_by` hash aggregate (one shuffle on the canonical key;
 * no window sort). At crawl scale the canonical key is also the natural
 * bucketing/partition key for everything downstream.
 */
object UrlOps {

  /**
   * Practical URL canonicalization (the widely-published normal form†:
   * RFC 3986 §6 case/port normalization plus the crawl-dedup extras):
   *  - drop the fragment;
   *  - lowercase scheme + authority;
   *  - strip the default port (:80 for http, :443 for https);
   *  - collapse trailing slashes on the path; empty path → "/";
   *  - drop tracking params (utm_*, fbclid, gclid), sort the rest.
   * Deterministic and byte-stable: equal inputs give equal outputs on
   * any engine with binary string collation.
   */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme://authority — everything before the first /, ? or # past //
    val head = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = noFrag.substr(length(head) + lit(1), length(noFrag))
    val headLc = lower(head)
    val headNp = when(headLc.startsWith("http://"), regexp_replace(headLc, ":80$", ""))
      .when(headLc.startsWith("https://"), regexp_replace(headLc, ":443$", ""))
      .otherwise(headLc)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val trimmed = regexp_replace(path, "/+$", "")
    val pathNorm = when(length(trimmed) === 0, lit("/")).otherwise(trimmed)
    val q = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(q, "&"),
      p => length(p) > 0 && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)="))
    val sortedQ = array_join(array_sort(params), "&")
    concat(headNp, pathNorm,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /**
   * Host of a URL: lowercase authority minus userinfo and port. Works on
   * raw or canonical URLs (canonicalization already lowercases). NULL
   * when the URL has no parseable scheme://authority (relative,
   * protocol-relative, mailto:) — callers must not lump those together.
   */
  def host(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))
    when(length(h) > 0, h)
  }

  /**
   * Per-host quota sampling — the crawl-curation domain-balancing step:
   * keep at most `maxPerHost` pages per host, preferring the highest
   * `score`, ties broken by ascending id (total order given unique ids,
   * so the result is deterministic and engine-independent).
   *
   * Scale shape: a single `row_number` window over host would sort each
   * host on one reducer — and crawl host frequencies are zipf, so the
   * hottest host (~10^8 pages at 100 TB) becomes a straggler. With
   * `salts > 1` the top-k runs in two stages: a local top-k per
   * (host, salt) shard — bounding any one sort partition to ~1/salts of
   * the hottest host — then the exact top-k over the ≤ salts·maxPerHost
   * survivors per host. Because the (score desc, id asc) order is total,
   * two-stage equals one-stage exactly (any global top-k row is also in
   * its shard's top-k).
   *
   * Adds `host` and `host_rank` (1-based, the global per-host rank).
   * URLs with no parseable authority get `host` NULL and are quota'd by
   * their raw URL string instead — identical raw URLs are the same page,
   * but a million distinct unparseable URLs are NOT one pseudo-host to
   * be capped collectively. `salts = 0` (or 1) disables the shard stage;
   * the default keeps the skew-proof path on, since it is exact either
   * way and the extra pass over already-pruned shards is cheap.
   */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
      score: Column, maxPerHost: Int, salts: Int = 16): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be positive: $maxPerHost")
    val clash = Seq("host", "host_rank", "_shard_rank").filter(df.columns.contains)
    require(clash.isEmpty,
      s"domainCap adds ${clash.mkString(", ")}; input already has it — " +
        "rename or drop it first")
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(score.desc, col(idCol).asc)
    val withHost = df.withColumn("host", host(col(urlCol)))
    // disjoint namespaces: a schemeless raw url 'example.com' must NOT
    // share a quota bucket with the real host example.com
    val key = coalesce(concat(lit("h:"), col("host")),
      concat(lit("u:"), col(urlCol)))
    val pruned = if (salts > 1) {
      val shard = Window.partitionBy(key,
        pmod(xxhash64(col(idCol)), lit(salts))).orderBy(ord: _*)
      withHost.withColumn("_shard_rank", row_number().over(shard))
        .filter(col("_shard_rank") <= maxPerHost)
        .drop("_shard_rank")
    } else withHost
    val global = Window.partitionBy(key).orderBy(ord: _*)
    pruned.withColumn("host_rank", row_number().over(global))
      .filter(col("host_rank") <= maxPerHost)
  }

  /**
   * Latest-capture-per-canonical-URL dedup: adds `canon_url`, keeps the
   * row with the greatest (tsCol, urlCol) per canonical key — the raw
   * URL string breaks timestamp ties deterministically — plus an
   * `n_captures` census. All original columns survive on the winner.
   */
  def latestCapture(df: DataFrame, urlCol: String = "url",
      tsCol: String = "warc_ts"): DataFrame = {
    require(!df.columns.contains("canon_url") && !df.columns.contains("n_captures"),
      "latestCapture adds canon_url/n_captures; input already has one " +
        "(re-running over its own output?) — rename or drop it first")
    val all = struct(df.columns.map(col): _*)
    val ord = struct(col(tsCol), col(urlCol))
    df.withColumn("canon_url", canonicalUrl(col(urlCol)))
      .groupBy("canon_url")
      .agg(max_by(all, ord).as("w"), count(lit(1)).as("n_captures"))
      .select(col("canon_url") +: df.columns.map(c => col(s"w.$c")) :+
        col("n_captures"): _*)
  }

  /**
   * Crawl-to-crawl snapshot diff: classify every URL across two corpus
   * snapshots as `added` (new crawl only), `removed` (old crawl only),
   * `changed` (both, different text) or `unchanged` (both, identical
   * text) — the change-detection step that decides which pages re-enter
   * the curation pipeline after an incremental recrawl, and the census a
   * crawl operator watches for coverage regressions.
   *
   * Scale shape: each side projects to (url, md5(text)) BEFORE the
   * full-outer join, so the shuffle carries a 32-char digest per row
   * instead of multi-KB page text — at 10^12 URLs the join is the
   * unavoidable url-keyed shuffle and this projection is the minimum
   * possible width for it. Presence is tracked with explicit flags, not
   * hash nullability, so rows with NULL text still classify by presence
   * (two NULL texts compare `unchanged` via null-safe equality).
   *
   * PRECONDITION: one row per URL per snapshot (run [[latestCapture]]
   * first); duplicate URLs multiply through the join like any key join.
   */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      urlCol: String = "url", textCol: String = "text"): DataFrame = {
    val o = oldSnap.select(col(urlCol).as("url"),
      md5(col(textCol)).as("old_h"), lit(true).as("in_old"))
    val n = newSnap.select(col(urlCol).as("url"),
      md5(col(textCol)).as("new_h"), lit(true).as("in_new"))
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"),
        when(!coalesce(col("in_old"), lit(false)), lit("added"))
          .when(!coalesce(col("in_new"), lit(false)), lit("removed"))
          .when(col("old_h") <=> col("new_h"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
