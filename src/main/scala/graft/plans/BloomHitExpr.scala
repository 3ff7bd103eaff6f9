package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as one native expression (the
  * [[VocabIdExpr]] reference-object pattern): the filter rides along
  * as a referenced object and each row costs two Murmur3 passes over
  * the string's UTF-8 bytes — no join, no shuffle, no per-row decode
  * beyond the byte view Spark already holds.
  *
  * Why a Bloom filter and not the broadcast hash join the exact
  * contamination face uses? The hash side is O(items·bytes) memory;
  * a Bloom filter is O(items·bits). At a production benchmark-suite
  * scale (GPT-3's 13-gram decontamination set: ~10⁸ grams) the exact
  * map stops fitting next to the executor's working set while the
  * ~1.2 GB bloom still broadcasts — membership with NO false
  * negatives is exactly the prefilter contract (FPs are confirmed or
  * killed downstream on the flagged subset only).
  *
  * The probe consumes the string's native UTF-8 bytes
  * ([[UTF8String#getBytes]]), matching `putString`'s encoding on the
  * build side, so driver build and executor probe agree bit-for-bit. */
case class BloomHitExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_hit expects a string column, got ${t.sql}")
  }

  /** One probe; called from both eval and generated code. */
  def compute(g: UTF8String): Boolean = bloom.mightContainBinary(g.getBytes)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val self = ctx.addReferenceObj("bloomHit", this, this.getClass.getName)
      s"${ev.value} = $self.compute($g);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomHitExpr =
    copy(child = newChild)
}

object BloomHitExpr {
  /** Column-level entry point: true iff `g` MAY be in the set the
    * filter was built over (never false for a true member). */
  def hit(g: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomHitExpr(ColumnBridge.expression(g), bloom))
}
