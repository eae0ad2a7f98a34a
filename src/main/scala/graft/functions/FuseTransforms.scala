package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: fuse nested per-cell array maps
  *
  *   transform(transform(tile, x -> f(x)), y -> g(y))
  *     ==>  transform(tile, x -> g(f(x)))
  *
  * Each `RasterLayer.localMap` adds one ArrayTransform; a chain of k
  * local-algebra ops otherwise materializes k-1 intermediate tile
  * arrays per row. After fusion the whole chain is a single pass over
  * the cells inside whole-stage codegen. Injected via
  * GraftExtensions (spark.sql.extensions).
  */
object FuseTransformsRule extends Rule[LogicalPlan] {

  private def fuse(expr: Expression): Expression = expr.transformUp {
    case outer @ ArrayTransform(
          inner @ ArrayTransform(input, LambdaFunction(fBody, Seq(fArg: NamedLambdaVariable), fHidden)),
          LambdaFunction(gBody, Seq(gArg: NamedLambdaVariable), gHidden))
        // index-using lambdas (2 args) are not fused; hidden refs opt
        // out; avoid work duplication when g uses its argument more
        // than once and f is non-trivial (the CollapseProject lesson)
        if !fHidden && !gHidden && {
          val uses = gBody.collect {
            case v: NamedLambdaVariable if v.exprId == gArg.exprId => v
          }.size
          uses <= 1 || fBody.collectLeaves().size <= 2
        } =>
      // g(f(x)): replace g's argument with f's body (f's own argument
      // keeps binding to the source array element)
      val composed = gBody.transformUp {
        case v: NamedLambdaVariable if v.exprId == gArg.exprId => fBody
      }
      ArrayTransform(input, LambdaFunction(composed, Seq(fArg), hidden = false))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case e if e.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION) =>
        fuse(e)
    }
}
