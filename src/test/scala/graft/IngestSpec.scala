package graft

import org.apache.spark.sql.functions._
import graft.io.Ingest

/** CSV session ingest (reference writeRawTable/writeProcessedTable flow†,
  * SURVEY.md §3.1): header-schema raw table + per-column preProcess. */
class IngestSpec extends SparkSpec {

  private def writeCsv(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "upload.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  private val csv = Seq(
    "name,address,phone",
    "Acme  Corp,11 Main St,555-0100",
    "ACME CORP,11 main st,",          // near-dup w/ missing phone
    "Zenith Ltd,5 Oak Blvd,555-0199",
    "Zenith Ltd,5 Oak Blvd,555-0199", // exact duplicate ROW
    ",11 Main St,555-0100")           // null first column

  test("rawTable: all-text columns, one distinct record_id per row") {
    val raw = Ingest.rawTable(spark, writeCsv(csv))
    assert(raw.columns.toSeq == Seq("record_id", "name", "address", "phone"))
    assert(raw.schema.filter(_.name != "record_id")
      .forall(_.dataType.typeName == "string"), "raw columns must all be text")
    assert(raw.count() == 5)
    assert(raw.select("record_id").distinct().count() == 5,
      "exact-duplicate rows must still get distinct ids")
  }

  test("rawTable rejects reserved header names instead of silently " +
      "replacing (record_id) or deleting (_dup_seq) user columns") {
    val e = intercept[IllegalArgumentException] {
      Ingest.rawTable(spark, writeCsv(Seq(
        "record_id,name", "x1,Acme", "x2,Zenith")))
    }
    assert(e.getMessage.contains("record_id"))
    val e2 = intercept[IllegalArgumentException] {
      Ingest.rawTable(spark, writeCsv(Seq(
        "_dup_seq,name", "1,Acme")))
    }
    assert(e2.getMessage.contains("_dup_seq"))
    // case-INSENSITIVE: withColumn resolves case-insensitively, so
    // 'Record_ID' would be silently replaced too — the guard must catch it
    val e3 = intercept[IllegalArgumentException] {
      Ingest.rawTable(spark, writeCsv(Seq(
        "Record_ID,name", "x1,Acme")))
    }
    // the message reports the USER'S spelling, not the canonical name
    assert(e3.getMessage.contains("Record_ID"))
  }

  test("record ids are reproducible across re-ingests of the same file") {
    val path = writeCsv(csv)
    val a = Ingest.rawTable(spark, path).select("record_id")
    val b = Ingest.rawTable(spark, path).select("record_id")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("null and empty-string cells produce different row hashes") {
    val p = writeCsv(Seq("a,b", "x,", "x,\"\""))
    // DuckDB/Spark CSV: unquoted empty = null, quoted empty = "" — the
    // sentinel must keep the two rows distinct beyond the dup-seq ordinal
    val raw = Ingest.rawTable(spark, p)
    assert(raw.count() == 2 && raw.select("record_id").distinct().count() == 2)
  }

  test("processedTable: <col>_norm siblings, raw carried through untouched") {
    val proc = Ingest.ingestCsv(spark, writeCsv(csv))
    val rows = proc.filter(col("phone").isNull && col("name").isNotNull)
      .select("name", "name_norm", "address_norm", "phone_norm").collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "ACME CORP", "raw value must be untouched")
    assert(rows(0).getString(1) == "acme corp")
    assert(rows(0).getString(2) == "11 main st")
    assert(rows(0).isNullAt(3), "null stays null through preProcess")
    // whitespace collapse on the other acme row
    val acme = proc.filter(col("name") === "Acme  Corp")
      .select("name_norm").collect()
    assert(acme(0).getString(0) == "acme corp")
  }

  test("ingested records drive the generic dedupe stack end to end") {
    import graft.model.{Model, PredicateSpec}
    val proc = Ingest.ingestCsv(spark, writeCsv(csv))
      .withColumnRenamed("record_id", "id")
    val m = Model(bias = -6.0, weights = Map("jw_name_norm" -> 10.0),
      threshold = 0.5, predicates = Seq(PredicateSpec("token", "name_norm")))
    val blocks = graft.block.Blocking.blockingMap(
      proc.filter(col("name_norm").isNotNull), m.predicates, "id")
    val pairs = graft.pairs.PairGen.candidatePairs(blocks, 100)
    val attached = graft.pairs.PairGen.attachFields(pairs, proc, "id", Seq("name_norm"))
    val scored = graft.score.Scoring.scorePairs(attached, m)
    // the two acme rows and the two zenith rows must each pair above θ
    assert(scored.filter(col("score") >= m.threshold).count() == 2)
  }
}
