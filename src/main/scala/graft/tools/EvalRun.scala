package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.PagesGen
import graft.model.{Model, PredicateSpec}
import graft.pipeline.{Dedupe, Eval}

/**
 * Pairwise/clustering-F1 evidence run (BASELINE.json:2 — "pairwise F1 ≥
 * 0.99 vs dedupe reference clusters on labeled pairs at shared blocking
 * keys"): runs the flagship pipeline over the golden-fixture generator
 * (PagesGen.generate — the labeled corpus whose family ids are the
 * ground-truth clusters, FIXTURES.md) at one or more sizes and prints ONE
 * JSON line per size with the pairwise and clustering precision / recall /
 * F1 plus the raw confusion counts. The committed artifact quoting this
 * output backs the F1 row of BASELINE.md the same way BENCH_local_r3.json
 * backs the scaling row.
 *
 * Pairs are judged AT SHARED BLOCKING KEYS (the candidate set itself),
 * matching the north rule's phrasing — block-cap drops therefore do not
 * count against recall, exactly like the reference's evaluation over
 * labeled pairs†.
 */
object EvalRun {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(120, 2000, 10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-eval-run")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the PipelineSpec model — token + simhash blocking, JW+Lev+exact LR
    val model = Model(
      bias = -13.0,
      weights = Map(
        "jw_text_norm" -> 6.0,
        "lev_text_norm" -> 9.0,
        "exact_lang" -> 0.4),
      threshold = 0.5,
      predicates = Seq(
        PredicateSpec("token", "text_norm"),
        PredicateSpec("simhash", "text", bands = 4)))
    sizes.foreach { nBase =>
      val (pages, truth) = PagesGen.generate(spark, nBase = nBase, seed = 42L)
      val result = Dedupe.run(spark, pages.toDF(),
        Dedupe.Config(model, maxBlockSize = 500, collectMetrics = false))
      val idTruth = Dedupe.prepare(pages.toDF())
        .select(col("id"), col("url"))
        .join(truth.toDF(), "url")
        .select(col("id"), col("cluster_id").as("cluster"))
      // scoredPairs is already an ephemeral parquet snapshot (run-scoped
      // scratch), so the two PRF consumers below re-read columnar data,
      // not the block+score DAG
      val scored = result.scoredPairs.select("id1", "id2", "score")
      val prf = Eval.pairwiseF1(scored, idTruth, model.threshold)
      val cprf = Eval.clusteringF1(
        scored.select("id1", "id2"),
        result.entityMap.select(col("id"), col("component")), idTruth)
      val rows = pages.count()
      // ALL candidate pairs are judged (truth covers every page): tp+fp+fn
      // alone would omit the correctly-rejected true negatives
      val judged = scored.count()
      val tn = judged - prf.tp - prf.fp - prf.fn
      println(
        f"""EVAL {"n_base":$nBase,"rows":$rows,"pairs_judged":$judged,"tn":$tn,""" +
        f""""pairwise":{"precision":${prf.precision}%.6f,"recall":${prf.recall}%.6f,"f1":${prf.f1}%.6f,""" +
        f""""tp":${prf.tp},"fp":${prf.fp},"fn":${prf.fn}},""" +
        f""""clustering":{"precision":${cprf.precision}%.6f,"recall":${cprf.recall}%.6f,"f1":${cprf.f1}%.6f,""" +
        f""""tp":${cprf.tp},"fp":${cprf.fp},"fn":${cprf.fn}},"theta":${model.threshold}}""")
      Dedupe.cleanupScratch(spark, result)
    }
    spark.stop()
  }
}
