package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gfunctions._
import graft.fixtures.PagesGen
import graft.model.PredicateSpec
import graft.pipeline.{Dedupe, Eval}
import graft.score.FellegiSunter

/** Scratch diagnostic: pairwise F1 of FULLY UNSUPERVISED Fellegi–Sunter
  * weights (EM, no labels) on the labeled golden-fixture corpus, at the
  * same blocking keys the supervised flagship model uses. */
object FsProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-fs-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (pages, truth) = PagesGen.generate(spark, nBase = nBase, seed = 42L)
    val recs = Dedupe.prepare(pages.toDF())
    val blocks = graft.block.Blocking.blockingMap(recs, Seq(
      PredicateSpec("token", "text_norm"),
      PredicateSpec("simhash", "text", bands = 4)), "id")
    val pairs = graft.pairs.PairGen.candidatePairs(blocks, maxBlockSize = 500)
    val attached = graft.pairs.PairGen.attachFields(pairs, recs, "id",
      Seq("text_norm", "lang"))
    val gcols = Seq("g_jw", "g_lev", "g_lang")
    val gammas = attached.select(col("id1"), col("id2"),
      (jaro_winkler(col("text_norm_1"), col("text_norm_2")) >= 0.9).cast("int").as("g_jw"),
      (levenshtein_sim(col("text_norm_1"), col("text_norm_2")) >= 0.75).cast("int").as("g_lev"),
      (col("lang_1") === col("lang_2")).cast("int").as("g_lang"))
      .localCheckpoint()
    val params = FellegiSunter.fit(gammas, gcols)
    println(s"FS lambda=${params.lambda} m=${params.m.mkString(",")} u=${params.u.mkString(",")}")
    val scored = gammas.withColumn("score", FellegiSunter.posterior(params, gcols))
    val idTruth = recs.select(col("id"), col("url"))
      .join(truth.toDF(), "url")
      .select(col("id"), col("cluster_id").as("cluster"))
    for (theta <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val prf = Eval.pairwiseF1(scored.select("id1", "id2", "score"), idTruth, theta)
      println(f"FSPROBE n=$nBase theta=$theta p=${prf.precision}%.6f r=${prf.recall}%.6f f1=${prf.f1}%.6f tp=${prf.tp} fp=${prf.fp} fn=${prf.fn}")
    }
    spark.stop()
  }
}
