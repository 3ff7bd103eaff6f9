package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All sign-random-projection band buckets of one vector in ONE fused
  * loop (SURVEY.md §4.3, the same upgrade path as [[DotProductExpr]]).
  *
  * Why not compose 8 × nbits `when(dot >= 0, …)` columns? Because the
  * composed form inlines every hyperplane as a literal and every dot
  * as its own generated loop: at production band widths (8 bands ×
  * 16 bits at a 200 k corpus) the whole-stage-codegen method grows
  * past HotSpot's huge-method JIT limit and the entire projection
  * drops to BYTECODE-INTERPRETED execution — measured 155 s for the
  * band projection of 200 k × 64-dim vectors (≈50× slower than the
  * arithmetic). This expression keeps the generated code SIZE constant
  * regardless of band count/width: the plane matrix rides along as a
  * referenced `float[]` object and one triple loop computes every
  * bucket — same measurement: 3 s.
  *
  * Per-plane semantics are bit-identical to
  * `when(DotProductExpr(v, plane) >= 0, 1<<i)`: float products
  * accumulated left-to-right into a double, sign test `>= 0` — so the
  * banded candidate sets (and therefore the verified LSH outputs) are
  * unchanged. A vector whose length differs from the planes' dim
  * yields null (the composed form yielded bucket 0 via null dots — an
  * explicit null is the stricter, saner contract; embeddings are
  * fixed-dim by schema).
  *
  * planes(b)(i)(j) = coordinate j of hyperplane i of band b; all bands
  * must share nbits and dim. Result: array<int> of length nBands,
  * element b = OR over i of (dot(v, planes(b)(i)) >= 0 ? 1<<i : 0).
  */
case class SrpBucketsExpr(child: Expression, planes: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  private val nBands = planes.length
  private val nBits = planes.head.length
  private val dim = planes.head.head.length
  require(planes.forall(b => b.length == nBits && b.forall(_.length == dim)),
    "all bands must share nbits and dim")
  require(nBits <= 31, "bucket bits must fit an int")

  // Flattened [band][bit][coord] for cache-linear access in both the
  // interpreted and generated loops.
  @transient private lazy val flat: Array[Float] = {
    val a = new Array[Float](nBands * nBits * dim)
    var k = 0
    for (b <- planes; p <- b; x <- p) { a(k) = x; k += 1 }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // Dim-mismatched input yields null even for a non-nullable child.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets expects array<float>, got ${t.sql}")
  }

  /** Shared by eval and the generated code (called via the reference
    * object) — one body, zero semantic drift between modes. */
  def compute(v: ArrayData): Array[Int] = {
    if (v.numElements() != dim) return null
    val out = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0
      var i = 0
      while (i < nBits) {
        val base = (b * nBits + i) * dim
        var acc = 0.0
        var j = 0
        while (j < dim) {
          if (v.isNullAt(j)) return null
          acc += v.getFloat(j) * flat(base + j)
          j += 1
        }
        if (acc >= 0) bucket |= 1 << i
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val r = compute(input.asInstanceOf[ArrayData])
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // The heavy loop lives in THIS expression object (JIT-compiled
      // once); generated code just calls it — constant code size no
      // matter how many planes ride along.
      val self = ctx.addReferenceObj("srpBuckets", this, this.getClass.getName)
      val arr = ctx.freshName("srpArr")
      s"""
         |final int[] $arr = $self.compute($v);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBucketsExpr =
    copy(child = newChild)
}

object SrpBucketsExpr {
  /** Column-level entry point: every band bucket of `v` in one pass. */
  def buckets(v: Column, planes: Seq[Seq[Seq[Float]]]): Column =
    ColumnBridge.column(SrpBucketsExpr(ColumnBridge.expression(v), planes))
}
