package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gfunctions._

/**
 * Upload ingest — the reference's CSV session flow (`dedupe-api:api/utils/
 * db_functions.py (fn writeRawTable / writeProcessedTable)†`, SURVEY.md
 * §3.1): an uploaded CSV becomes `raw_{sid}` (one TEXT column per header +
 * a synthetic record id) and `processed_{sid}` (every value preProcessed).
 *
 * Differences by design:
 *  - the record id is `xxhash64` of the whole raw row (all columns, with a
 *    per-duplicate-row sequence number mixed in), NOT a serial PK — serial
 *    ids are driver-side state a distributed ingest cannot mint without a
 *    global sort or a single task; a content hash is reproducible across
 *    re-ingests of the same file and partition-parallel.
 *  - processed values live in `<col>_norm` columns NEXT TO the raw values
 *    (the raw/derived split honored per-column), not in a second table —
 *    one columnar table with pruned reads replaces the reference's two
 *    Postgres tables.
 */
object Ingest {

  /** raw_{sid}: header-schema CSV → all-text columns + deterministic
    * `record_id`. Exact duplicate ROWS each get a distinct id (the
    * reference's serial PK also distinguishes them): the id hashes the row
    * content plus the row's ordinal among its identical copies. */
  def rawTable(spark: SparkSession, csvPath: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      // everything lands as text, like the reference's raw table — no
      // inference surprises between uploads
      .option("inferSchema", "false")
      .csv(csvPath)
    val cols = raw.columns.toSeq
    // reserved names: withColumn would silently REPLACE a user column
    // called record_id (leaving two identical synthetic columns after the
    // final select → AMBIGUOUS_REFERENCE downstream) and drop("_dup_seq")
    // would delete user data — fail fast with a clear message instead
    // case-INSENSITIVE: withColumn/drop resolve case-insensitively under
    // the default spark.sql.caseSensitive=false, so 'Record_ID' would
    // slip a case-sensitive guard and still get silently replaced. The
    // names stay reserved under caseSensitive=true too (simpler contract
    // than a conf-dependent schema). Report the USER'S spelling so the
    // message matches their header.
    val reservedCanon = Seq("record_id", "_dup_seq")
    val reserved = cols.filter(c => reservedCanon.exists(_.equalsIgnoreCase(c)))
    require(reserved.isEmpty,
      s"CSV header uses reserved column name(s) ${reserved.mkString(", ")}; " +
        "rename them before upload (record_id is synthesized from content)")
    // unambiguous null encoding: xxhash64 SKIPS null args (("a", null) and
    // (null, "a") would collide), and any in-band sentinel string could be
    // a legitimate cell value — so hash each cell as (is-null flag, value)
    // pairs, which no cell content can imitate
    val contentHash = xxhash64(
      cols.flatMap(c => Seq(
        when(col(c).isNull, lit("0")).otherwise(lit("1")),
        coalesce(col(c), lit("")))): _*)
    // distinguish identical rows deterministically: ordinal within the
    // content-hash group (ordered by the group's partition arrival is NOT
    // deterministic — use row_number over a content-only ordering, which
    // ties identical rows arbitrarily but then any assignment is
    // equivalent by symmetry: the rows are byte-identical)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(contentHash).orderBy(contentHash)
    raw.withColumn("_dup_seq", row_number().over(w).cast("long"))
      .withColumn("record_id", xxhash64(contentHash, col("_dup_seq")))
      .drop("_dup_seq")
      .select(col("record_id") +: cols.map(col): _*)
  }

  /** processed: every string column gains a `<col>_norm` sibling with the
    * reference's preProcess chain (NFKC-normalize, lower, collapse
    * whitespace, empty→NULL — `normalize_text`); raw columns are carried
    * through untouched (per-row invariant). */
  def processedTable(raw: DataFrame, idCol: String = "record_id"): DataFrame = {
    // ONE projection, not a withColumn chain: Catalyst re-analyzes the
    // growing plan per withColumn, O(cols^2) for the wide CSVs the
    // reference flow accepts
    val normCols = raw.columns.filter(_ != idCol)
      .map(c => normalize_text(col(c)).as(s"${c}_norm"))
    raw.select(raw.columns.map(col) ++ normCols: _*)
  }

  /** One-call ingest: CSV → processed table ready for a Model whose
    * predicates/features reference the `<col>_norm` columns. */
  def ingestCsv(spark: SparkSession, csvPath: String): DataFrame =
    processedTable(rawTable(spark, csvPath))
}
