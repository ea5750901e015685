package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.PagesGen
import graft.pipeline.Dedupe

/** Data-volume scaling run: the flagship pipeline over PagesGen.scaled at
  * increasing replica counts, reporting rows / candidate pairs / wall
  * seconds / rows-per-second per point (scratch diagnostics; the measured
  * points are quoted in BASELINE.md). */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val replicaPoints =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10, 40)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-scale-run")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    replicaPoints.foreach { r =>
      val pages = PagesGen.scaled(spark, sfDir, r)
      val t0 = System.nanoTime()
      val res = Dedupe.run(spark, pages, Dedupe.Config(
        graft.SparkEntry.demoModel, collectMetrics = true))
      // force the full result surface (entity map + canon), like a real run
      res.entityMap.write.format("noop").mode("overwrite").save()
      res.canon.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val m = res.metrics
      println(f"""SCALE {"replicas":$r,"rows":${m.records},"pairs":${m.candidatePairs},""" +
        f""""entities":${m.entities},"secs":$secs%.1f,"rows_per_sec":${(m.records / secs).toLong}}""")
    }
    spark.stop()
  }
}
