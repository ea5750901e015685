package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries in isolation (bench-identical
  * session); args = query names. Scratch diagnostics. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qtime")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_metaphone_block", "q_text_stats", "q_hac_refine", "q_media_features",
      "q_haversine_pairs", "q_tfidf_cosine", "q_minhash_dedup", "q_gazetteer")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(s"QTIME $n=${(System.nanoTime() - t0) / 1e9}")
      } catch { case e: Throwable => println(s"QTIME $n FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
