package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `token(partition_key)` as a native expression (SURVEY.md §4.3,
  * same pattern as [[DotProductExpr]]): the Cassandra
  * Murmur3Partitioner ring position of a partition key, computed
  * inside whole-stage codegen via [[graft.functions.CassandraMurmur3]].
  *
  * Accepts the three CQL key shapes the test tables use and hashes
  * their CQL serialization:
  *   - bigint → 8-byte big-endian
  *   - text   → UTF-8 bytes
  *   - blob   → raw bytes
  *
  * Powers `fn_token` (token projection) and `scan_token_range`
  * (`WHERE token(pk) > a AND token(pk) <= b` — the range-scan shape
  * drivers and bulk readers use to split the ring), replacing the
  * earlier xxhash64 stand-in with the real placement function, so a
  * token range computed by this engine selects the same keys a
  * Cassandra cluster would own in that range.
  */
case class CassTokenExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | BinaryType | _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"cass_token expects a bigint, string, or binary column, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => graft.functions.CassandraMurmur3.tokenOfLong(input.asInstanceOf[Long])
    case BinaryType => graft.functions.CassandraMurmur3.token(input.asInstanceOf[Array[Byte]])
    case _: StringType =>
      graft.functions.CassandraMurmur3.token(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.functions.CassandraMurmur3"
    child.dataType match {
      case LongType => defineCodeGen(ctx, ev, c => s"$m.tokenOfLong($c)")
      case BinaryType => defineCodeGen(ctx, ev, c => s"$m.token($c)")
      case _: StringType => defineCodeGen(ctx, ev, c => s"$m.token($c.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CassTokenExpr =
    copy(child = newChild)
}

object CassTokenExpr {
  /** Column-level entry point: `token(pk)` with codegen. */
  def token(c: Column): Column =
    ColumnBridge.column(CassTokenExpr(ColumnBridge.expression(c)))
}
