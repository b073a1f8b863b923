package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (`Aggregator[IN,BUF,OUT]`) — the engine's UDAF
  * surface. Exact 2-dp money sum: each double is rounded to cents
  * (HALF_UP, matching `CAST(double AS DECIMAL(p,2))`), accumulated as an
  * unscaled long (associative integer addition — safe under partial
  * aggregation and any merge order), and finished with the same
  * decimal→double conversion as [[Exact.dsum]]. So
  * `udaf(CentsSum)(value)` must agree bit-for-bit with
  * `CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE)` — which is exactly
  * how the oracle checks it.
  */
object CentsSum extends Aggregator[Double, Long, Double] {
  override def zero: Long = 0L

  override def reduce(b: Long, a: Double): Long =
    b + BigDecimal(a).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  override def merge(b1: Long, b2: Long): Long = b1 + b2

  override def finish(cents: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(cents), 2).doubleValue

  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
