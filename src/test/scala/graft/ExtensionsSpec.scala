package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._
import graft.gfunctions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("builder-path wiring: the zero-arg class injects every function " +
    "and the optimizer rule into a fresh SparkSessionExtensions") {
    import org.apache.spark.sql.GraftBridge
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = GraftBridge.builtinRegistryClone()
    GraftBridge.extensionsRegisterInto(ext, reg)
    for (name <- Seq("graft_jaro_winkler", "graft_levenshtein_sim",
        "graft_normalize", "graft_simhash64")) {
      assert(reg.functionExists(FunctionIdentifier(name)), s"missing $name")
    }
    assert(GraftBridge.extensionsOptimizerRules(ext, spark)
      .contains(GraftExtensions.CollapseIdempotentNormalize))
  }

  test("retrofit path: SQL functions reach the native kernels on an " +
    "existing session") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS jw, " +
      "graft_levenshtein_sim('kitten', 'sitting') AS lev, " +
      "graft_normalize('  Héllo  World ') AS norm").collect()(0)
    val viaCol = Seq(("martha", "marhta", "kitten", "sitting", "  Héllo  World "))
      .toDF("a", "b", "c", "d", "e")
      .select(jaro_winkler($"a", $"b"), levenshtein_sim($"c", $"d"),
        normalize_text($"e")).collect()(0)
    assert(viaSql.getDouble(0) == viaCol.getDouble(0))
    assert(viaSql.getDouble(1) == viaCol.getDouble(1))
    assert(viaSql.getString(2) == viaCol.getString(2))
    // arity misuse fails analysis instead of silently misbehaving
    intercept[Exception](spark.sql("SELECT graft_jaro_winkler('a')").collect())
  }

  test("normalize kernel is idempotent (rule precondition): fuzz 300 " +
    "strings incl. NFKC compat chars, whitespace runs, and empties") {
    val rnd = new scala.util.Random(7)
    val alphabet = "aA zZ\t\n  ﬁｱ①é½Åß.,-".toCharArray
    val strs = (1 to 300).map { _ =>
      (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "   "
    val df = strs.toDF("s")
      .select(normalize_text($"s").as("once"),
        normalize_text(normalize_text($"s")).as("twice"))
    assert(df.filter(!($"once" <=> $"twice")).count() == 0)
  }

  test("optimizer rule collapses nested normalize to one kernel pass " +
    "with unchanged results") {
    GraftExtensions.register(spark) // idempotent — appends the rule once
    GraftExtensions.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ == GraftExtensions.CollapseIdempotentNormalize) == 1)
    // range source: a literal-backed LocalRelation would be folded whole
    // by ConvertToLocalRelation, leaving no expression to count
    val src = spark.range(3)
      .select(concat(lit("  DoUble  Norm "), $"id".cast("string")).as("s"))
    val df = src.select(normalize_text(normalize_text($"s")).as("n"))
    val optimized = df.queryExecution.optimizedPlan
    var kernels = 0
    optimized.transformAllExpressions {
      case e: graft.expr.NormalizeNFKCExpr => kernels += 1; e
    }
    assert(kernels == 1, s"expected 1 normalize kernel after collapse, saw $kernels")
    assert(df.as[String].collect().toSeq ==
      Seq("double norm 0", "double norm 1", "double norm 2"))
  }
}
