package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.rules.UWheelRule

/** Session wiring. Two ways to enable the wheel optimizer, mirroring the
  * reference's `SessionStateBuilder::with_optimizer_rules` registration
  * (`/root/reference/examples/nyc_taxi/src/main.rs:70-75`) — except that we
  * *add* our rule to Spark's optimizer instead of replacing the rule set:
  *
  *  1. `spark.sql.extensions=graft.GraftExtensions` at session build, or
  *  2. `Graft.enable(spark)` on a live session (uses
  *     `spark.experimental.extraOptimizations`, which Spark applies as a
  *     post-hoc optimizer batch on every query).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => UWheelRule)
    ext.injectOptimizerRule(_ => graft.rules.NanosTimePushdown)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VecDot(exprs(0), exprs(1))))
  }
}

object Graft {
  /** Global kill-switch for the rewrite rule (used by Bench to time the
    * same queries with and without the index). */
  @volatile var rewritesEnabled: Boolean = true

  /** Idempotently installs the wheel rewrite + nanos pushdown rules and the
    * native vector functions on a live session (UWheelRule first: plans it
    * answers never reach the scan-path pushdown). */
  def enable(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = cs.experimental.extraOptimizations
    val add = Seq(UWheelRule, graft.rules.NanosTimePushdown).filterNot(cur.contains)
    if (add.nonEmpty) cs.experimental.extraOptimizations = cur ++ add
    registerFunctions(spark)
  }

  def registerFunctions(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => graft.functions.VecDot(exprs(0), exprs(1)),
      "scala_udf")
  }
}
