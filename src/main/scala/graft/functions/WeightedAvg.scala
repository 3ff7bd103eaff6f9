package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Buffer for [[WeightedAvg]]: exact integer cents + integer weight. */
case class WAvgBuf(cents: Long, qty: Long)

/** CQL `CREATE AGGREGATE` equivalent (SURVEY.md §2.D `agg_udaf`):
  * weighted average of a 2-dp monetary value by an integral weight,
  * e.g. avg price per unit weighted by quantity.
  *
  * The SFUNC/FINALFUNC state machine maps onto Aggregator's
  * reduce/merge/finish. State is exact integer cents so the aggregate
  * is commutative + associative — order-independent, hence
  * deterministic under any partitioning, and merge-safe for partial
  * (map-side) aggregation at 100 TB.
  */
object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0L, 0L)
  override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf =
    WAvgBuf(b.cents + Math.round(a._1 * 100.0) * Math.round(a._2), b.qty + Math.round(a._2))
  override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
    WAvgBuf(x.cents + y.cents, x.qty + y.qty)
  override def finish(b: WAvgBuf): Double =
    if (b.qty == 0L) Double.NaN else (b.cents / 100.0) / b.qty
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
