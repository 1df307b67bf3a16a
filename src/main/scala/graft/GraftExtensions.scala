package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{FloatDotProduct, NfcNormalize, ZOrder2}

/** Session extension registering the engine's native expressions so SQL
  * users get them without touching the Scala API:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT graft_dot_f(a.embedding, b.embedding) FROM ...
  *
  * (The Scala surface registers the same functions lazily per session via
  * [[graft.functions.VectorFunctions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot_f"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot_f"),
      exprs => {
        require(exprs.length == 2,
          s"graft_dot_f requires exactly 2 arguments, got ${exprs.length}")
        FloatDotProduct(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      exprs => {
        require(exprs.length == 1,
          s"graft_nfc requires exactly 1 argument, got ${exprs.length}")
        NfcNormalize(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder2"),
      exprs => {
        require(exprs.length == 2,
          s"graft_zorder2 requires exactly 2 arguments, got ${exprs.length}")
        ZOrder2(exprs.head, exprs(1))
      }))
    e.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.WindowToTopKRule)
  }
}
