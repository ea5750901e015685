package graft

import org.apache.spark.sql.functions._
import graft.fixtures.PagesGen
import graft.pipeline.Dedupe

/** Resumability contract (BASELINE.json:6,14): the pipeline restarts from
  * the scored-pairs parquet snapshot and produces identical clustering. */
class ResumeSpec extends SparkSpec {

  test("resumeFromPairs reproduces the full run's entity map exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (pages, _) = PagesGen.generate(spark, nBase = 60, seed = 7L)
    val config = Dedupe.Config(SparkEntry.demoModel,
      checkpointDir = Some(dir), collectMetrics = false)

    val full = Dedupe.run(spark, pages.toDF(), config)
    val fullMap = full.entityMap.select("url", "component")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(new java.io.File(s"$dir/pairs").exists(), "pairs snapshot written")

    // resume: no blocking/scoring re-run — clustering from the snapshot
    val resumed = Dedupe.resumeFromPairs(spark, pages.toDF(), config)
    val resumedMap = resumed.entityMap.select("url", "component")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(resumedMap == fullMap)
  }

  test("resume validates the snapshot through the Hadoop FileSystem API " +
      "(file:-scheme checkpoint dir)") {
    val local = java.nio.file.Files.createTempDirectory("graft_ckpt_fs").toString
    val dir = s"file://$local" // URI form a java.io.File check would mangle
    val (pages, _) = PagesGen.generate(spark, nBase = 20, seed = 11L)
    val config = Dedupe.Config(SparkEntry.demoModel,
      checkpointDir = Some(dir), collectMetrics = false)
    val full = Dedupe.run(spark, pages.toDF(), config)
    val resumed = Dedupe.resumeFromPairs(spark, pages.toDF(), config)
    assert(resumed.entityMap.count() == full.entityMap.count())
  }

  test("bucketed entity sink writes bucket=N partition layout (S4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("component", col("id") % 37)
    graft.io.TableIO.writeBucketed(df, graft.io.TableIO.Path(dir),
      bucketCol = "component", numBuckets = 8)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")).sorted
    assert(subdirs.nonEmpty && subdirs.forall(_.matches("bucket=\\d+")))
    // round-trips with the bucket column readable as a partition column
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.columns.contains("bucket"))
  }

  test("resume without a checkpoint dir is rejected") {
    val (pages, _) = PagesGen.generate(spark, nBase = 5, seed = 7L)
    intercept[IllegalArgumentException] {
      Dedupe.resumeFromPairs(spark, pages.toDF(),
        Dedupe.Config(SparkEntry.demoModel))
    }
  }
}
