package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §4.3): the engine
  * deliberately ships ZERO custom optimizer rules or strategies —
  * every operator compiles to stock Catalyst plans — so the only
  * injection is SQL registration of the native expressions.
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or spark.sql.extensions=graft.plans.GraftExtensions, after which
  *   SELECT dot_product(a.embedding, b.embedding) ... works in SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotProduct)
    e.injectFunction(GraftExtensions.charBigrams)
    e.injectFunction(GraftExtensions.cassToken)
  }
}

object GraftExtensions {
  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product expects exactly 2 arguments, got ${children.length}")
      DotProductExpr(children(0), children(1))
    }
  )

  val charBigrams: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_bigrams"),
    new ExpressionInfo(classOf[CharBigramsExpr].getName, "char_bigrams"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"char_bigrams expects exactly 1 argument, got ${children.length}")
      CharBigramsExpr(children.head)
    }
  )

  val cassToken: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cass_token"),
    new ExpressionInfo(classOf[CassTokenExpr].getName, "cass_token"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"cass_token expects exactly 1 argument, got ${children.length}")
      CassTokenExpr(children.head)
    }
  )

  /** Register on an existing session (tests / notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    for ((id, info, builder) <- Seq(dotProduct, charBigrams, cassToken))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
