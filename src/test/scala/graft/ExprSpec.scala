package graft

import org.apache.spark.sql.functions._
import graft.gfunctions._

/** Expressions evaluated through Spark plans (codegen path) must agree
  * with the static kernels (interpreted path). */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("jaro_winkler through a plan matches kernel") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("", "x"))
      .toDF("a", "b")
    val got = df.select(jaro_winkler($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(got(1) - 0.8400000000000001) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("null propagation") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
    val got = df.select(
      jaro_winkler($"a", $"b"),
      levenshtein_sim($"a", $"b"),
      normalize_text($"b")).collect()(0)
    assert(got.isNullAt(0) && got.isNullAt(1) && got.isNullAt(2))
  }

  test("char_ngrams / token_shingles / suffixes / simhash as columns") {
    val df = Seq("ab cd ef").toDF("s")
    val row = df.select(
      char_ngrams($"s", 4).as("g"),
      token_shingles(tokens($"s"), 2).as("sh"),
      suffixes(lit("abcdef"), 3, 10).as("su"),
      simhash64(tokens($"s")).as("h")).collect()(0)
    assert(row.getSeq[String](0) == Seq("ab c", "b cd", " cd ", "cd e", "d ef"))
    assert(row.getSeq[String](1) == Seq("ab cd", "cd ef"))
    assert(row.getSeq[String](2) == Seq("abcdef", "bcdef", "cdef", "def"))
    assert(row.getLong(3) == graft.expr.Sim.simhash64(Array("ab", "cd", "ef")))
  }

  test("normalize_text collapses + nulls empties") {
    val df = Seq("  Foo   BAR ", "   ", "ok").toDF("s")
    val got = df.select(normalize_text($"s")).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("foo bar"), None, Some("ok")))
  }

  test("tokens drops empties") {
    val got = Seq(" a,b  c ").toDF("s").select(tokens($"s")).as[Seq[String]].collect()(0)
    assert(got == Seq("a", "b", "c"))
  }

  test("tokens keeps unicode word chars intact (not ASCII-\\w shredded)") {
    val got = Seq("café naïve_test 42 mötley-crüe 東京 data")
      .toDF("s").select(tokens($"s")).as[Seq[String]].collect()(0)
    // matches DuckDB RE2 on the same [^\p{L}\p{N}]+ class (verified):
    // underscore splits, accented letters and CJK stay whole
    assert(got == Seq("café", "naïve", "test", "42", "mötley", "crüe", "東京", "data"))
  }

  test("cosine_sim on float arrays") {
    val df = Seq((Array(1.0, 2.0), Array(2.0, 4.0)), (Array(1.0, 0.0), Array(0.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
  }

  test("SQL registration works") {
    gfunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA','MARHTA') AS jw").as[Double].collect()(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-12)
  }
}
