package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Stage timing for q_lm_perplexity's cost profile (scratch diagnostic). */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    import graft.textops.LangModel
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32).select(col("doc_id"), col("text"))
    docs.cache().count()
    t("fit") { val lm = LangModel.fit(docs.filter(col("doc_id") % 5 =!= 0), "text", 3); lm.grams.count() }
    val lm = LangModel.fit(docs.filter(col("doc_id") % 5 =!= 0), "text", 3)
    t("vocab") { lm.vocab.count() }
    t("contexts") { lm.contexts.count() }
    t("crossEntropy") { LangModel.crossEntropy(docs, "doc_id", "text", lm, 0.1).count() }
    t("crossEntropy2") { LangModel.crossEntropy(docs, "doc_id", "text", lm, 0.1).count() }
    spark.stop()
  }
}
