package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator examples — the `Aggregator[IN, BUF, OUT]` surface
  * (SURVEY §2B UDAF row), written to be exactly reproducible by the DuckDB
  * oracle: accumulation happens in exact decimals (order-independent), the
  * final division in double. */
object Aggregators {

  final case class WAvgBuf(num: java.math.BigDecimal, den: java.math.BigDecimal)

  /** Weighted average: sum(x·w) / sum(w), decimal-exact partial aggregation.
    * Each product is rounded to 6 decimals exactly like a Spark
    * `CAST(x*w AS DECIMAL(28,6))` (shortest-repr double → decimal, HALF_UP),
    * so `CAST(SUM(CAST(x*w AS DECIMAL(28,6))) AS DOUBLE) / …` in SQL yields
    * the identical bits. */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    private def dec(d: Double, scale: Int): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d).setScale(scale, java.math.RoundingMode.HALF_UP)

    override def zero: WAvgBuf =
      WAvgBuf(java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)

    override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
      val (x, w) = in
      WAvgBuf(b.num.add(dec(x * w, 6)), b.den.add(dec(w, 6)))
    }

    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.num.add(b.num), a.den.add(b.den))

    override def finish(b: WAvgBuf): Double =
      if (b.den.signum() == 0) Double.NaN
      else b.num.doubleValue() / b.den.doubleValue()

    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
