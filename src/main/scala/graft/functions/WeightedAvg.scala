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
  *
  * PRECONDITIONS (enforced by the caller, asserted nowhere hot):
  *  - the VALUE has at most 2 decimal places and the WEIGHT is
  *    integral — both are then represented exactly and the per-row
  *    `Math.round` is the identity. A fractional weight would be
  *    rounded per ROW here but post-sum in a SQL mirror, and the two
  *    disagree; use a decimal-typed aggregate for fractional weights.
  *  - |Σ value_cents × weight| must fit a signed 64-bit long
  *    (~9.2e18): at ~1e9 cent-units per row that allows ~1e9 rows per
  *    GROUP before overflow — fine for real keyed groups; a single
  *    global average over 100 TB should pre-aggregate per partition
  *    key first (or switch the buffer to BigInt/decimal).
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
