package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert index of a 2-D point at `order` bits per dimension — the
  * clustering key behind `sink_hilbert` (same pattern as
  * [[CassTokenExpr]]: a native expression evaluated inside
  * whole-stage codegen).
  *
  * Why an Expression and not Columns: the iterative xy2d recurrence
  * rotates (x, y) at every level, and each level's rotated x/y
  * references the previous level's x AND y up to three times — an
  * unrolled when()-chain grows ~3^order nodes (the 12-level tree
  * OOM'd Catalyst), while here the loop is twelve integer ops per
  * row in generated Java. KernelSpec pins the expression against an
  * independent driver-side reimplementation on the full 64×64 grid
  * (bijection onto 0..4095 + unit-step adjacency — the defining curve
  * property, which a rotation-order bug breaks immediately).
  */
case class HilbertExpr(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert expects two bigint columns, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertExpr.xy2d(order, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.HilbertExpr.xy2d($order, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertExpr {

  /** Iterative (x, y) → d on the order-`order` Hilbert curve: per
    * level, take the quadrant's curve digit, then flip+swap the
    * coordinate frame into that quadrant's orientation. Pure integer
    * ops; called per row from generated code. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = (1L << order) / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Column-level entry point with codegen. */
  def hilbert(x: Column, y: Column, order: Int): Column =
    ColumnBridge.column(HilbertExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y), order))
}
