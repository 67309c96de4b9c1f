package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.7: absent in the reference, listed as the
  * Spark extension point). WeightedAvg demonstrates the full
  * Aggregator[IN, BUF, OUT] machinery with DETERMINISTIC numerics: the
  * inputs are fixed-point by construction (prices ≤2 decimals, quantities
  * ≤1 decimal), so both running sums accumulate as unscaled longs — cents ×
  * quantity-tenths for the numerator (scale 3), quantity-tenths for the
  * denominator (scale 1). Long addition is associative + commutative, so
  * partition/merge order cannot change the result, and the per-row cost is
  * two primitive multiplies — no object allocation (the earlier BigDecimal
  * buffer allocated 2+ objects per row and made this the slowest aggregate
  * in the bench). Only `finish` touches BigDecimal, once per group, so the
  * decimal→double rounding matches the DuckDB oracle bit-exactly.
  *
  * Range: |Σ price·qty| < 9.2e15 (2^63 / 10^3). At TPC-H sf100 the largest
  * per-group numerator is ~1e14–6e14 — roughly 15–30× of headroom, so a few
  * hundred times more data per group would overflow; addExact then faults
  * loudly instead of wrapping silently. For larger scales, widen the buffer
  * to a two-long (128-bit) accumulator.
  */
case class WavgBuf(num: Long, den: Long)

object WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {

  override def zero: WavgBuf = WavgBuf(0L, 0L)

  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf = {
    // inputs are ≤2dp / ≤1dp doubles; *100 / *10 can land on x.9999…, round
    // recovers the exact fixed-point value
    val cents = Math.round(in._1 * 100)
    val tenths = Math.round(in._2 * 10)
    WavgBuf(Math.addExact(b.num, Math.multiplyExact(cents, tenths)),
      Math.addExact(b.den, tenths))
  }

  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(Math.addExact(a.num, b.num), Math.addExact(a.den, b.den))

  override def finish(b: WavgBuf): Double =
    if (b.den == 0L) Double.NaN
    else // exact decimals -> two correctly-rounded doubles -> one IEEE divide,
         // same as the oracle's CAST(sum AS DOUBLE)/CAST(sum AS DOUBLE)
      java.math.BigDecimal.valueOf(b.num, 3).doubleValue() /
        java.math.BigDecimal.valueOf(b.den, 1).doubleValue()

  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
