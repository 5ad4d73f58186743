package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/**
 * SparkSessionExtensions entry point: makes every graft function
 * available in SQL for sessions built with
 * `.withExtensions(new GraftExtensions)` or via
 * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way to
 * ship a function library to a cluster without per-session
 * registration calls.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // The function table is SHARED with GraftFunctions.register — the
    // per-session and cluster-extension surfaces are one definition,
    // arity-checked with Column-API defaults for trailing arguments.
    GraftFunctions.sqlBuilders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    // rank-k window idiom -> bounded top-k aggregate (map-side combine
    // instead of a full shuffle+sort per group).
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}
