package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (org.apache.spark.sql.expressions.Aggregator
  * — the public typed-agg API, SURVEY §1.2 "Dataset[T] where typed state
  * helps"): weighted mean with a two-field commutative buffer, so
  * map-side partial aggregation and AQE work exactly as for built-ins.
  * Used by q_agg_weighted (oracled: sum(x·w)/sum(w)).
  */
final case class WAvgBuf(num: Double, den: Double)

class WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, java.lang.Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
    WAvgBuf(b.num + in._1 * in._2, b.den + in._2)
  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.num + b.num, a.den + b.den)
  // NULL (not 0/0 = NaN) for an all-zero-weight group — the semantics
  // SQL's Divide gives the oracle formulation sum(x*w)/sum(w), so any
  // caller beyond q_agg_weighted stays hash-comparable (r12 review)
  override def finish(b: WAvgBuf): java.lang.Double =
    if (b.den == 0.0) null else b.num / b.den
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
