package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregator producing a full latency-histogram bucket vector per
  * group in ONE pass — the columnar analogue of the reference's
  * prometheus HistogramVec observe loop (reference:
  * assertsprocessor/metric_helper.go:64-68, buckets factory.go:38).
  *
  * Compared to the CASE-chain + groupBy(le) form (Aggregates
  * .latencyHistogram) this emits one row per group with the cumulative
  * vector — the natural shape for writing a metrics table where each row
  * is a complete series sample. The buffer is a fixed Array[Long]
  * (buckets + count + sum encoded separately), merged associatively, so
  * Spark runs it as partial aggregation with map-side combine.
  */
class HistogramAgg(buckets: Array[Double])
    extends Aggregator[Double, Array[Long], HistogramResult] {

  override def zero: Array[Long] = new Array[Long](buckets.length + 1)

  override def reduce(buf: Array[Long], latency: Double): Array[Long] = {
    // smallest bucket whose upper bound >= latency; last slot = +Inf
    var i = 0
    while (i < buckets.length && latency > buckets(i)) i += 1
    buf(i) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): HistogramResult = {
    val cumulative = new Array[Long](buf.length)
    var acc = 0L
    var i = 0
    while (i < buf.length) { acc += buf(i); cumulative(i) = acc; i += 1 }
    HistogramResult(buf, cumulative, acc)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[HistogramResult] = Encoders.product[HistogramResult]
}

final case class HistogramResult(counts: Array[Long], cumulative: Array[Long], total: Long)

object HistogramAgg {
  /** Column-level entry point: histogram_vec(latency) per group. */
  def histogramVec(buckets: Seq[Double])(latency: Column): Column =
    udaf(new HistogramAgg(buckets.toArray)).apply(latency)
}
