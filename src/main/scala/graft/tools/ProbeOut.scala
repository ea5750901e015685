package graft.tools

/** Shared probe-output sink: println the measurement line AND append it
  * to the file named by SPARK_GRAFT_SCALE_OUT when set (stdout of a
  * forked sbt run is lossy under output redirection — the reason the
  * scale artifacts are collected from a results file, not a log grep). */
object ProbeOut {
  def emit(line: String): Unit = {
    println(line)
    sys.env.get("SPARK_GRAFT_SCALE_OUT").foreach { f =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
        line + "\n", java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }
}
