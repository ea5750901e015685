package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Storage seam (SURVEY.md §7 hard part e): the production deployment targets
 * Iceberg tables (BASELINE.json:6,14 — snapshot checkpoints, per-partition
 * lineage), but no Iceberg runtime jar ships in this sandbox's
 * /opt/spark/jars. So the FORMAT IS CONFIG, NOT CODE: everything reads and
 * writes through this object; `GRAFT_TABLE_FORMAT=iceberg` plus the usual
 * Iceberg catalog session configs is a deploy-time switch with zero code
 * change (catalog tables resolve via spark.read.table / writeTo, paths via
 * format handlers).
 */
object TableIO {

  sealed trait Target
  /** A filesystem path (sandbox default: parquet dirs). */
  case class Path(path: String) extends Target
  /** A catalog table name (production: Iceberg via catalog config). */
  case class Table(name: String) extends Target

  def format: String = sys.env.getOrElse("GRAFT_TABLE_FORMAT", "parquet")

  def read(spark: SparkSession, t: Target): DataFrame = t match {
    case Path(p) => spark.read.format(format).load(p)
    case Table(n) => spark.read.table(n)
  }

  def write(df: DataFrame, t: Target, mode: String = "overwrite"): Unit = t match {
    case Path(p) => df.write.format(format).mode(mode).save(p)
    case Table(n) =>
      if (mode == "overwrite") df.writeTo(n).createOrReplace()
      else df.writeTo(n).append()
  }

  /** Snapshot checkpoint: write + read back so downstream stages consume
    * the materialized snapshot (the resume point — BASELINE.json:6).
    * Under Iceberg this is a table snapshot; under parquet, a directory. */
  def checkpoint(spark: SparkSession, df: DataFrame, t: Target): DataFrame = {
    write(df, t)
    read(spark, t)
  }

  /**
   * Entity/canon sink partitioned by a hash bucket of the entity id
   * (SURVEY.md §2.1 S4): downstream consumers (review UI, incremental
   * match) look up single entities — bucket layout turns that into one
   * partition read instead of a full scan, and bounds per-file size at
   * 10^12-row scale. Path targets write `bucket=N/` directories; catalog
   * targets use DataSourceV2 bucket transforms (Iceberg bucket
   * partitioning in production).
   *
   * HASH-FAMILY DIVERGENCE (known, deliberate): path mode buckets by
   * `pmod(xxhash64(col), n)` while the catalog transform uses the
   * catalog's own hash (Iceberg: 32-bit Murmur3 per its spec) — the SAME
   * entity id lands in DIFFERENT bucket numbers under the two layouts.
   * Point-lookup code must therefore resolve the bucket through
   * [[bucketOf]] for path layouts and through the catalog's metadata for
   * table layouts, never assume the numbers are interchangeable. We do
   * not replicate Iceberg's bucket hash here: no Iceberg jar ships in
   * this sandbox, so a reimplementation would be unverifiable.
   */
  def writeBucketed(df: DataFrame, t: Target, bucketCol: String,
      numBuckets: Int = 256, saveMode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions._
    t match {
      case Path(p) =>
        df.withColumn("bucket", bucketOf(col(bucketCol), numBuckets))
          .repartition(numBuckets, col("bucket")) // one file per bucket dir
          .write.format(format).mode(saveMode).partitionBy("bucket").save(p)
      case Table(n) =>
        val w = df.writeTo(n).partitionedBy(bucket(numBuckets, col(bucketCol)))
        if (saveMode == "overwrite") w.createOrReplace() else w.append()
    }
  }

  /** Path-layout bucket number of a key — the single source of truth for
    * path-mode point lookups (`.../bucket=<N>/`). */
  def bucketOf(key: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    pmod(xxhash64(key), lit(numBuckets.toLong))
  }

  /** Read a path-mode bucketed sink back WITHOUT the layout-private
    * `bucket` partition column, so consumers see one schema regardless of
    * whether the sink was a path or a catalog table (catalog bucket
    * transforms add no column). */
  def readBucketed(spark: SparkSession, t: Target): DataFrame = t match {
    case Path(p) => spark.read.format(format).load(p).drop("bucket")
    case Table(n) => spark.read.table(n)
  }
}
