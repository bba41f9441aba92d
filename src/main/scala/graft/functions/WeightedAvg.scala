package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF demonstration (SURVEY.md §2 "UDF/UDAF surface"): exact
  * weighted average. The buffer accumulates in BigDecimal so the result is
  * independent of partial-aggregation order (same discipline as the dec2
  * money sums) and bit-comparable to the DuckDB oracle's decimal sums.
  */
object WeightedAvg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private def dec2(d: Double): JBigDecimal =
    // valueOf (shortest decimal string) — matches Spark's double→decimal
    // cast; new BigDecimal(d) would expand the exact binary value and round
    // differently at scale-2 boundaries (0.615 → 0.61 instead of 0.62)
    JBigDecimal.valueOf(d).setScale(2, RoundingMode.HALF_UP)

  /** (weight, value) → buffer (Σ w·x, Σ w); inputs are 2-decimal fixed
    * point, so both sums are exact. */
  override def zero: (JBigDecimal, JBigDecimal) = (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)): (JBigDecimal, JBigDecimal) =
    (b._1.add(dec2(in._1).multiply(dec2(in._2))), b._2.add(dec2(in._1)))

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum() == 0) 0.0 else b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
