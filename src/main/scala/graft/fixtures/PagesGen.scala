package graft.fixtures

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.PageRow

/**
 * Deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1).
 * Seeded PRNG, no wall-clock, no external data — the driver's input-table
 * hint mandates exactly this shape (BASELINE.json:15):
 * (url string, warc_ts timestamp, html binary, text string, lang string).
 *
 * Ground truth: base page i spawns a seeded number of near-duplicate
 * variants (whitespace doubling, token swap, boilerplate suffix) plus
 * occasional exact duplicates; every row of family i carries ground-truth
 * cluster i via `GroundTruth` (urls encode the family for test joins —
 * the ENGINE never looks at the url structure).
 */
object PagesGen {

  private val vocab: Array[String] = Array(
    "data", "spark", "query", "table", "join", "scan", "merge", "sort",
    "index", "shard", "block", "key", "hash", "group", "filter", "window",
    "stream", "batch", "row", "column", "vector", "cache", "store", "fetch",
    "crawl", "page", "link", "text", "token", "model", "score", "match",
    "entity", "record", "field", "value", "label", "train", "test", "bench")

  private val langs = Array("en", "de", "fr")

  case class TruthRow(url: String, cluster_id: Long)

  def baseText(rnd: scala.util.Random, nTokens: Int): String =
    Seq.fill(nTokens)(vocab(rnd.nextInt(vocab.length))).mkString(" ")

  /** Perturbations mirror crawl near-dups: the derived text stays close,
    * tokens mostly shared — blockable + high string similarity. */
  def perturb(rnd: scala.util.Random, text: String, kind: Int): String = kind match {
    case 0 => text.replaceFirst(" ", "  ") + " " // whitespace noise
    case 1 => // swap two adjacent tokens
      val t = text.split(" ")
      if (t.length < 4) text
      else {
        val i = 1 + rnd.nextInt(t.length - 2)
        val tmp = t(i); t(i) = t(i + 1); t(i + 1) = tmp
        t.mkString(" ")
      }
    case 2 => text + " © example inc" // boilerplate suffix
    case 3 => text // exact duplicate
    case _ => text.split(" ").drop(1).mkString(" ") // drop leading token
  }

  /** @return (pages, groundTruth) — pages shuffled deterministically so
    *         family members are not adjacent. */
  def generate(spark: SparkSession, nBase: Int, seed: Long = 42L)
      : (Dataset[PageRow], Dataset[TruthRow]) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val epoch = 1500000000L // fixed, not wall-clock
    val rows = (0 until nBase).flatMap { i =>
      val text = baseText(rnd, 12 + rnd.nextInt(30))
      val lang = langs(rnd.nextInt(langs.length))
      val nVariants = rnd.nextInt(4) // 0..3
      val base = PageRow(
        url = s"https://host${i % 97}.example/${java.lang.Long.toString(i.toLong, 36)}",
        warc_ts = new Timestamp((epoch + i * 37L) * 1000L),
        html = s"<html><body>$text</body></html>".getBytes("UTF-8"),
        text = text, lang = lang)
      val variants = (0 until nVariants).map { v =>
        val vt = perturb(rnd, text, rnd.nextInt(5))
        PageRow(
          url = s"https://host${(i + v + 1) % 97}.example/${java.lang.Long.toString(i.toLong, 36)}-v$v",
          warc_ts = new Timestamp((epoch + i * 37L + v + 1) * 1000L),
          html = s"<html><body>$vt</body></html>".getBytes("UTF-8"),
          text = vt, lang = lang)
      }
      (base +: variants).map(p => (p, TruthRow(p.url, i.toLong)))
    }
    val shuffled = new scala.util.Random(seed + 1).shuffle(rows)
    (spark.createDataset(shuffled.map(_._1)),
     spark.createDataset(shuffled.map(_._2)))
  }

  /** Pages-shaped table derived deterministically from the driver's
    * read-only documents.parquet (doc_id,text,lang,...) plus injected
    * variants — used by SparkEntry queries so sfDir scaling carries over. */
  def fromDocuments(spark: SparkSession, sfDir: String, variantsPerDoc: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    // the driver's documents.parquet is one row group → a 1-partition scan
    // that would serialize every downstream per-row kernel; spread it once
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val base = docs.select(
      concat(lit("https://docs.example/"), col("doc_id")).as("url"),
      to_timestamp(lit("2017-07-14 02:40:00")).as("warc_ts"),
      encode(col("text"), "UTF-8").as("html"),
      col("text"), col("lang"))
    val variants = (1 to variantsPerDoc).map { v =>
      docs.select(
        concat(lit("https://docs.example/"), col("doc_id"), lit(s"-v$v")).as("url"),
        to_timestamp(lit("2017-07-14 02:41:00")).as("warc_ts"),
        encode(col("text"), "UTF-8").as("html"),
        // deterministic near-dup: double the first space, append boilerplate
        concat(regexp_replace(col("text"), "^(\\S+) ", "$1  "), lit(" © example inc")).as("text"),
        col("lang"))
    }
    variants.foldLeft(base)(_ unionByName _)
  }

  /** Volume-scaled pages: the documents corpus crossed with `replicas`
    * deterministic salts, entirely distributed (no driver-side Seq) — for
    * data-volume scaling runs. EVERY TOKEN is prefixed with the replica
    * id, so replicas are mutually dissimilar sub-corpora each structurally
    * identical to the base (constant family size {base, near-dup variant},
    * per-replica vocabulary): total work should scale ~linearly with
    * `replicas`, which is exactly what a volume-scaling run must isolate —
    * a corpus whose true-pair count grew quadratically with volume would
    * conflate engine scaling with corpus structure. */
  def scaled(spark: SparkSession, sfDir: String, replicas: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val reps = spark.range(replicas).select(col("id").as("rep"))
    // prefix EVERY token — including the v1 boilerplate suffix: an
    // unprefixed shared token ('©', 'inc') would sit on all ~rows/2 v1
    // pages corpus-wide, a token block growing linearly with volume, and
    // the linear-pairs-by-construction claim would silently lean on the
    // pipeline's oversize-block drop instead of holding by construction.
    // The source is split with the SAME separator class the blocking
    // tokenizer uses and the prefix joiner is alphanumeric ('x', not '_'
    // — underscore is a separator under [^\p{L}\p{N}]+), so every emitted
    // token re-tokenizes as exactly one per-replica token; a '_' joiner
    // would shed the bare suffix token back into a corpus-wide shared
    // vocabulary and void the per-replica disjointness this run relies on
    def prefixed(c: org.apache.spark.sql.Column) = concat(
      array_join(
        transform(
          filter(split(c, "[^\\p{L}\\p{N}]+"), t => length(t) > 0),
          t => concat(lit("r"), col("rep"), lit("x"), t)), " "),
      // a rare family-identifier token (the SKU/phone-number analog real
      // near-dup pages share): guarantees each {base, v1} family blocks
      // together regardless of how formulaic the synthetic vocabulary
      // is, so the scoring stage sees ~rows/2 true pairs at every volume
      lit(" fam"), col("doc_id"), lit("r"), col("rep"))
    val crossed = docs.crossJoin(broadcast(reps))
      .repartition(spark.sparkContext.defaultParallelism * 4)
      .withColumn("rtext", prefixed(col("text")))
      .withColumn("rtext_v1", // near-dup: doubled space + (prefixed) boilerplate
        regexp_replace(prefixed(concat(col("text"), lit(" © example inc"))),
          "^(\\S+) ", "$1  "))
    def page(suffix: String, text: org.apache.spark.sql.Column) = crossed.select(
      concat(lit("https://docs.example/"), col("doc_id"),
        lit("/r"), col("rep"), lit(suffix)).as("url"),
      to_timestamp(lit("2017-07-14 02:40:00")).as("warc_ts"),
      encode(col("rtext"), "UTF-8").as("html"),
      text.as("text"), col("lang"))
    page("", col("rtext")).unionByName(page("-v1", col("rtext_v1")))
  }
}
