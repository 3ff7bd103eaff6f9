package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The curation normalizer
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))`
  * as ONE fused pass (the [[CharBigramsExpr]] native-hot-loop
  * pattern): lowercase once via Spark's own [[UTF8String#toLowerCase]]
  * (so unicode case mapping is bit-identical to `lower()`), then a
  * single character walk that keeps [a-z0-9], collapses space runs,
  * drops everything else, and never emits a leading/trailing space.
  *
  * Semantics proof against the regex chain: a stripped character is
  * DELETED (adjacent text joins — "a-b" → "ab"), so the walk drops it
  * without marking a space; a space run becomes a single pending
  * space emitted only before the next kept character and only when
  * output is non-empty (≡ collapse + trim); surrogate-pair units are
  * both non-matching, so the whole codepoint disappears exactly as
  * the codepoint regex deletes it. The three regex passes (each a
  * full engine scan with per-char NFA dispatch) become one branchy
  * loop — the clean gate rides text_clean, quality_funnel,
  * pipeline_curation, pipeline_sft and pipeline_rag, so this is the
  * single hottest scalar in the text family. Output is bit-identical
  * (the full oracle suite re-verifies hash-exact). */
case class CleanTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"clean_text expects a string column, got ${t.sql}")
  }

  /** One fused pass; called from both eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else if (c == ' ') {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("cleanText", this, this.getClass.getName)
      s"${ev.value} = $self.compute($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): CleanTextExpr =
    copy(child = newChild)
}

object CleanTextExpr {
  def clean(text: Column): Column =
    ColumnBridge.column(CleanTextExpr(ColumnBridge.expression(text)))
}
