package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-split timing for q_edit_join (scratch diagnostic). */
object EdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-edprobe")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"EDPROBE $label=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val recs = spark.read.parquet(s"$sfDir/part.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("p_partkey").as("id"),
        graft.gfunctions.normalize_text(col("p_name")).as("s"))
    t("warmup_count") { recs.count() }
    val joined = graft.pairs.EditDistJoin.selfJoin(recs, 2, 2)
    t("join_noop") { joined.write.format("noop").mode("overwrite").save() }
    t("join_noop2") { joined.write.format("noop").mode("overwrite").save() }
    t("ordered_noop") {
      joined.orderBy(col("id1"), col("id2"))
        .write.format("noop").mode("overwrite").save()
    }
    println(s"EDPROBE rows=${joined.count()}")
    spark.stop()
  }
}
