package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character bigrams of a string as one native expression
  * (SURVEY.md §4.3, same pattern as [[DotProductExpr]]): a single
  * tight loop per row replacing the
  * `array_distinct(zip_with(slice(split(t,"")...)))` composition,
  * whose per-element interpreted lambdas cost ~300 µs per 200-char
  * document (measured: the dominant cost of text_langid). Output
  * order is first occurrence — identical to the composition it
  * replaces — so results are deterministic.
  */
case class CharBigramsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"char_bigrams expects a string column, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CharBigramsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharBigramsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharBigramsExpr =
    copy(child = newChild)
}

object CharBigramsExpr {
  /** One pass over the decoded string; first-occurrence-ordered
    * distinct set. Called once per row from generated code. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.min(n, 256))
    var i = 0
    while (i < n - 1) {
      seen.add(str.substring(i, i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Column-level entry point: distinct char bigrams with codegen. */
  def bigrams(c: Column): Column =
    ColumnBridge.column(CharBigramsExpr(ColumnBridge.expression(c)))
}
