package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.expr.{DamerauExpr, JaroWinklerExpr, LevenshteinSimExpr, NormalizeNFKCExpr, SimHash64Expr}

/**
 * The library's `SparkSessionExtensions` hook — the deployment seam the
 * Spark docs prescribe for custom Catalyst work. Two injections:
 *
 *  1. SQL functions for the native comparator kernels, so `spark.sql`
 *     users (and downstream BI/ad-hoc tooling) reach the same codegen'd
 *     expressions the DataFrame API uses — `graft_jaro_winkler`,
 *     `graft_levenshtein_sim`, `graft_normalize`, `graft_simhash64`.
 *  2. An optimizer rule, [[GraftExtensions.CollapseIdempotentNormalize]]:
 *     `graft_normalize(graft_normalize(x))` → `graft_normalize(x)`.
 *     NFKC-normalize + lowercase + whitespace-collapse + empty→null is
 *     idempotent by construction (fuzz-asserted in ExtensionsSpec), and
 *     the nesting arises naturally when a pipeline stage defensively
 *     re-normalizes a `*_norm` column another stage already produced —
 *     the rule removes the redundant per-row kernel pass instead of
 *     relying on every call site to know the column's provenance.
 *
 * Wire-up: `spark.sql.extensions=graft.GraftExtensions` on spark-submit
 * (zero-arg class, the standard config path), or
 * `GraftExtensions.register(spark)` to retrofit an ALREADY-RUNNING
 * session (the embedded/test path — builder extensions cannot attach to
 * an existing session).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => GraftExtensions.CollapseIdempotentNormalize)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => mk(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${args.length}")
  }

  private def unary(name: String, mk: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => mk(a)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.length}")
  }

  /** (identifier, info, builder) triples for every exposed SQL function. */
  val functionDescriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler", "_FUNC_(a, b) - Jaro-Winkler similarity " +
        "(DuckDB-bit-exact kernel)"),
      binary("graft_jaro_winkler", JaroWinklerExpr(_, _))),
    (FunctionIdentifier("graft_levenshtein_sim"),
      info("graft_levenshtein_sim", "_FUNC_(a, b) - normalized Levenshtein " +
        "similarity (Myers bit-parallel kernel)"),
      binary("graft_levenshtein_sim", LevenshteinSimExpr(_, _))),
    (FunctionIdentifier("graft_normalize"),
      info("graft_normalize", "_FUNC_(s) - NFKC + lowercase + collapse " +
        "whitespace; empty to NULL (the preProcess kernel)"),
      unary("graft_normalize", NormalizeNFKCExpr(_))),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "_FUNC_(tokens) - 64-bit Charikar simhash " +
        "of a token array"),
      unary("graft_simhash64", SimHash64Expr(_))),
    (FunctionIdentifier("graft_damerau"),
      info("graft_damerau", "_FUNC_(a, b) - unrestricted Damerau-" +
        "Levenshtein distance (DuckDB-parity kernel)"),
      binary("graft_damerau", DamerauExpr(_, _))))

  /** `graft_normalize(graft_normalize(x))` → `graft_normalize(x)` —
    * safe because the kernel is idempotent (null→null, empty→null,
    * normalized text is a fixed point; fuzz-asserted in ExtensionsSpec). */
  object CollapseIdempotentNormalize extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case NormalizeNFKCExpr(inner: NormalizeNFKCExpr) => inner
      }
  }

  /** Retrofit an existing session: register the SQL functions into its
    * function registry (via the private[sql] bridge) and append the
    * optimizer rule through the public experimental-methods hook,
    * idempotently. */
  def register(spark: SparkSession): Unit = {
    functionDescriptions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, ident, inf, builder)
    }
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(CollapseIdempotentNormalize)) {
      spark.experimental.extraOptimizations = extra :+ CollapseIdempotentNormalize
    }
  }
}
