package graft.udf

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Input row for the weighted-average aggregator: price in exact integer
  * cents + integer quantity (SURVEY §2.4 A10 / §2.11 X2). Integer buffers
  * make the aggregation order-insensitive → bit-deterministic. */
case class WAIn(cents: Long, qty: Long)

/** Typed Aggregator: Σ(price·qty) / Σ(qty).
  *
  * 100 TB note: Aggregator lowers to a 2-phase ObjectHashAggregate with a
  * 16-byte buffer; merge is associative/commutative so partial aggregation
  * works across any partitioning. Long arithmetic cannot overflow until
  * ~9e18 cents·qty per group (≫ 100 TB of lineitem per group).
  */
object WeightedAvgAggregator extends Aggregator[WAIn, (Long, Long), Double] {
  def zero: (Long, Long) = (0L, 0L)
  def reduce(b: (Long, Long), a: WAIn): (Long, Long) =
    (b._1 + a.cents * a.qty, b._2 + a.qty)
  def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  // identical op order to the oracle SQL: double / 100.0 / double
  def finish(r: (Long, Long)): Double = r._1.toDouble / 100.0 / r._2.toDouble
  def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedAvg {
  private lazy val u = udaf(WeightedAvgAggregator, Encoders.product[WAIn])
  def fn(cents: Column, qty: Column): Column = u(cents, qty)
}
