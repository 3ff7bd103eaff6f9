package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word → bounded-vocabulary id as one native expression (SURVEY.md
  * §4.3, the [[SrpBucketsExpr]] reference-object pattern): an O(1)
  * hash probe per row against the ≤(vocab size) literal table that
  * rides along as a referenced object, so generated code stays
  * constant-size no matter how large the vocabulary.
  *
  * Why not `element_at(typedlit(map), w)`? Catalyst's GetMapValue on
  * a literal map is a LINEAR scan over the keys — ~1024 string
  * compares per token row at the trigram-LM vocabulary, exactly the
  * interpreted-dispatch class [[CharBigramsExpr]] was built to kill.
  * Why not `when(isin(...))` + a join for the id? The InSet probe
  * answers membership only; attaching the id through a join would put
  * a corpus-sized shuffle where a row-local lookup suffices.
  *
  * Keys are stored as [[UTF8String]] so the probe runs on Spark's
  * native string representation — no per-row decode. Misses map to
  * `missingId` (the `<unk>` contract: total function, any input). */
case class VocabIdExpr(child: Expression, vocab: Seq[String], missingId: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vocab_id expects a string column, got ${t.sql}")
  }

  @transient private lazy val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(i))
    }
    m
  }

  /** One hash probe; called from both eval and generated code. */
  def compute(w: UTF8String): Int = {
    val v = table.get(w)
    if (v == null) missingId else v.intValue()
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      val self = ctx.addReferenceObj("vocabId", this, this.getClass.getName)
      s"${ev.value} = $self.compute($w);"
    })

  override protected def withNewChildInternal(newChild: Expression): VocabIdExpr =
    copy(child = newChild)
}

object VocabIdExpr {
  /** Column-level entry point: the id of `w` in `vocab` (list order),
    * or `missingId` when absent. */
  def id(w: Column, vocab: Seq[String], missingId: Int): Column =
    ColumnBridge.column(VocabIdExpr(ColumnBridge.expression(w), vocab, missingId))
}
