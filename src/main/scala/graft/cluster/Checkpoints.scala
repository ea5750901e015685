package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared lineage-truncation policy for iterative cluster algorithms
  * (CC, one-to-one matching): reliable checkpoint when a checkpoint dir
  * is set — the resume contract — else localCheckpoint. One copy, so
  * the policy cannot silently fork between algorithms. */
private[graft] object Checkpoints {
  def checkpointed(df: DataFrame, spark: SparkSession): DataFrame =
    if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
