package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Optimization-round instrumentation main (guide §1.4/§1.5) — NOT part of
 * the frozen driver contract (Bench.scala is the measured surface; this
 * exists so per-query isolation numbers and plan dumps can be cited in
 * OPTIMIZATION_r06.md without touching the frozen harness).
 *
 * Usage:
 *   runMain graft.BenchExtra time q_a q_b ...   — per-query noop-sink wall
 *     time plus executed job/stage/task counts and summed task time (a
 *     per-query orchestration-overhead profile the driver bench can't show)
 *   runMain graft.BenchExtra explain OUTDIR [suffix] q_a q_b ... — write
 *     each query's .explain("formatted") to OUTDIR/<q>_<suffix>.txt
 *
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
 */
object BenchExtra {

  private final class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs += 1
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += e.stageInfo.numTasks
      taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
    }
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum",
        (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    args.toList match {
      case "time" :: names =>
        // one untimed warm-up pass absorbs JIT + parquet footer caching,
        // mirroring Bench's protocol
        names.foreach { n =>
          try force(SparkEntry.queries(n)(spark, sfDir))
          catch { case t: Throwable => println(s"WARMUP FAIL $n: $t") }
        }
        SparkEntry.clearSnapshotCaches()
        names.foreach { n =>
          val c = new Counts
          spark.sparkContext.addSparkListener(c)
          spark.sparkContext.setJobDescription(n)
          val t0 = System.nanoTime()
          try force(SparkEntry.queries(n)(spark, sfDir))
          catch { case t: Throwable => println(s"FAIL $n: $t") }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.setJobDescription(null)
          // listener events drain asynchronously; settle before reading
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(c)
          println(f"TIMED $n%-28s ${sec}%8.3f s  jobs=${c.jobs}%-4d " +
            f"stages=${c.stages}%-5d tasks=${c.tasks}%-6d taskTime=${c.taskTimeMs / 1000.0}%9.2f s")
        }
      case "jobs" :: names =>
        // per-JOB attribution: duration, tasks, summed task time and the
        // job's first stage name — pinpoints which of a query's many
        // small jobs actually cost (AQE turns each shuffle stage into a
        // job, so this is effectively a per-shuffle-stage profile)
        names.foreach { n =>
          try force(SparkEntry.queries(n)(spark, sfDir))
          catch { case t: Throwable => println(s"WARMUP FAIL $n: $t") }
          SparkEntry.clearSnapshotCaches()
          val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          val done = java.util.Collections.synchronizedList(
            new java.util.ArrayList[(Int, Double, Int, Double, String)]())
          val l = new SparkListener {
            override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              val desc = Option(e.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description")))
              jobs.put(e.jobId, (e.time, desc.getOrElse(
                e.stageInfos.map(_.name.takeWhile(_ != '\n')).headOption.getOrElse("?"))))
            }
            override def onJobEnd(e: SparkListenerJobEnd): Unit = {
              val (t0, nm) = jobs.getOrDefault(e.jobId, (e.time, "?"))
              done.add((e.jobId, (e.time - t0) / 1e3, 0, 0.0, nm))
            }
            override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
          }
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          try force(SparkEntry.queries(n)(spark, sfDir))
          catch { case t: Throwable => println(s"FAIL $n: $t") }
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(400)
          spark.sparkContext.removeSparkListener(l)
          println(f"JOBPROFILE $n total ${sec}%.3f s, ${done.size} jobs")
          done.forEach { case (id, dur, _, _, nm) =>
            if (dur >= 0.05) println(f"  job $id%-4d ${dur}%7.3f s  $nm")
          }
        }
      case "explain" :: outDir :: rest =>
        val (suffix, names) = rest match {
          case s :: ns if s.startsWith("_") => (s, ns)
          case ns => ("", ns)
        }
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { n =>
          val df = SparkEntry.queries(n)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"EXPLAINED $n -> $outDir/$n$suffix.txt")
        }
      case other =>
        System.err.println(s"unknown args: $other — use 'time q...' or 'explain DIR q...'")
        sys.exit(2)
    }
    spark.stop()
  }
}
