package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bridge into `private[sql]` surface: wrap a Catalyst Expression into a
  * public Column (Spark 4.x hides the Column(expr) constructor behind
  * `classic.ExpressionUtils`). This is the only file outside the `graft`
  * namespace. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Bloom-filter aggregate over a LongType column (the same Catalyst
    * aggregate Spark's own InjectRuntimeFilter builds its runtime join
    * filters from — not exposed in the public functions API, hence this
    * bridge). Returns the serialized filter as one binary value. */
  def bloomAgg(child: Column, expectedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(expression(child),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Membership probe against a driver-collected serialized bloom filter,
    * shipped to executors as a literal (the same way runtime join filters
    * travel: a scalar result, broadcast with the task binary). May return
    * false positives, never false negatives. */
  def bloomMightContain(bloom: Array[Byte], value: Column): Column =
    column(BloomFilterMightContain(Literal(bloom, BinaryType), expression(value)))

  /** Register a SQL function into an EXISTING session's function registry
    * (`sessionState` is private[sql]; builder-time
    * `SparkSessionExtensions` cannot attach to a session that already
    * exists — this is the retrofit path GraftExtensions.register uses). */
  def registerFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)

  /** Test-support views over private[sql] SparkSessionExtensions state:
    * apply injected functions to a registry / list built optimizer rules
    * — lets ExtensionsSpec verify the builder-path wiring without
    * constructing a second SparkSession. */
  def extensionsRegisterInto(ext: SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)

  def extensionsOptimizerRules(ext: SparkSessionExtensions, spark: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  def builtinRegistryClone(): org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
}
