package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.7: absent in the reference, listed as the
  * Spark extension point). WeightedAvg demonstrates the full
  * Aggregator[IN, BUF, OUT] machinery with DETERMINISTIC numerics: both
  * running sums accumulate in exact BigDecimal (associative + commutative,
  * so partition/merge order cannot change the result) and only the final
  * division happens in double — the same shape as the engine's decimal
  * money-math convention, so a DuckDB oracle can reproduce it bit-exactly.
  */
case class WavgBuf(num: BigDecimal, den: BigDecimal)

object WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {

  private def dec(d: Double): BigDecimal =
    BigDecimal(JBigDecimal.valueOf(d)) // exact for values printed from <=2dp

  override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0))

  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf =
    WavgBuf(b.num + dec(in._1) * dec(in._2), b.den + dec(in._2))

  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.num + b.num, a.den + b.den)

  override def finish(b: WavgBuf): Double =
    if (b.den.signum == 0) Double.NaN
    else b.num.toDouble / b.den.toDouble // exact decimals -> one IEEE divide

  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
