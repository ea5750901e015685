package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cluster.Checkpoints

/**
 * PageRank over the host link graph (Brin & Page 1998†) — the classic
 * web-scale URL/host quality signal a crawl-curation pipeline ranks and
 * filters by (host-level PageRank / harmonic centrality is how the
 * public CommonCrawl rankings are produced†). The reference engine has
 * no graph operator; this joins ConnectedComponents as the second
 * iterative DataFrame algorithm, same checkpoint discipline.
 *
 * Determinism contract: ranks are EXACT INTEGER micro-mass (the initial
 * total mass `totalMass` is split by integer division; per-edge shares
 * and the dangling redistribution use integer division; the damping
 * multiply is one IEEE double product of an exact integer, floored back
 * to an integer). Every iteration's state is therefore bit-identical
 * across partitionings, AQE re-plans, and engines — the DuckDB twin
 * (q_pagerank) UNROLLS the same update k times and matches hash-exact.
 * Mass leaks a few units per node per iteration to the division floors
 * (bounded by outdeg + 2 units per node); nothing renormalizes, both
 * engines leak identically.
 *
 * Update (multigraph semantics — parallel links count; a self-loop is a
 * legal edge):
 *   in(v)    = Σ_{links u→v} (r(u) div outdeg(u))
 *   dang     = Σ_{u: outdeg(u)=0} r(u)
 *   r'(v)    = floor((1−d)·totalMass/n) + floor(d·(in(v) + dang div n))
 *
 * Scale shape: the outdeg-attached link snapshot is built ONCE and
 * persisted; each iteration is one src-keyed equi-join + one dst-keyed
 * map-side-combinable sum + a 1-row dangling aggregate broadcast back —
 * no window, no collect; lineage is cut per iteration
 * (localCheckpoint / checkpointDir, the CC pattern). Hub hosts skew the
 * dst aggregation; AQE skew handling + the map-side combine absorb it.
 */
object PageRank {

  /** @return one row per node: (node, rank_mass long, rank double) where
    *         rank = rank_mass/totalMass rounded to 9 decimals. */
  def run(links: DataFrame, srcCol: String, dstCol: String,
          iters: Int = 5, damping: Double = 0.85,
          totalMass: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val spark = links.sparkSession
    val l = links.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = l.select(col("src").as("node"))
      .union(l.select(col("dst").as("node"))).distinct()
    // outdegree census materialized ONCE — the per-iteration dangling
    // anti-join would otherwise re-derive it from the caller's raw link
    // lineage (scan + extraction) every iteration
    val outd = Checkpoints.checkpointed(
      l.groupBy("src").agg(count(lit(1)).as("d")), spark)
    // outdeg-attached link snapshot, reused by every iteration
    val linksD = Checkpoints.checkpointed(l.join(outd, "src"), spark)
    val nDf = nodes.agg(count(lit(1)).as("n"))
    val withN = Checkpoints.checkpointed(nodes.crossJoin(broadcast(nDf)), spark)

    var ranks = withN
      .select(col("node"), col("n"), expr(s"CAST($totalMass AS BIGINT) div n").as("r"))
    for (_ <- 1 to iters) {
      val dang = ranks
        .join(outd, ranks("node") === outd("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dang"))
      val in = linksD
        .join(ranks.select(col("node"), col("r")), col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div d")).as("in_sum"))
      ranks = Checkpoints.checkpointed(
        withN
          .crossJoin(broadcast(dang))
          .join(in, Seq("node"), "left")
          .select(col("node"), col("n"),
            (floor(lit(1.0 - damping) * lit(totalMass.toDouble) / col("n"))
              .cast("long")
              + floor(lit(damping) *
                  (coalesce(col("in_sum"), lit(0L)) + expr("dang div n")))
                .cast("long")).as("r")),
        spark)
    }
    ranks.select(col("node"), col("r").as("rank_mass"),
      round(col("r") / lit(totalMass.toDouble), 9).as("rank"))
  }

  /** href target-host pattern: optional userinfo is skipped
    * (`[^/?#"]*@` cannot cross into the path), the host capture stops at
    * the first char outside `[a-zA-Z0-9.-]` — so ports, paths, queries
    * and fragments all terminate it correctly. RE2/Java-identical; the
    * q_pagerank oracle interpolates this exact string. */
  val hrefHostRe: String =
    "href=\"https?://(?:[^/?#\"]*@)?([a-zA-Z0-9.-]+)"

  /** Host-to-host link edges from pages: one row per href (multigraph;
    * callers dedup or drop self-loops if their semantics need it). */
  def hostLinks(pages: DataFrame, hostCol: String, htmlCol: String): DataFrame =
    pages.select(col(hostCol).as("src_host"),
      explode(regexp_extract_all(col(htmlCol), lit(hrefHostRe), lit(1)))
        .as("dst_host"))
}
