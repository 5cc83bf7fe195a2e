package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Operator telemetry: candidate-pair / output-pair counters for the
  * bucketed similarity joins, collected via named `observe` nodes
  * (CollectMetrics — zero extra passes, the counters ride the rows
  * already flowing) and drained by a QueryExecutionListener.
  *
  * Why: every LSH/multi-index operator here bounds quadratic work per
  * bucket, but a skewed corpus can still blow a bucket up (a hot shingle,
  * a dense simhash chunk). At 100 TB the first sign must be a COUNTER,
  * not a dead executor — candidate_pairs >> output_pairs is the alarm
  * that bucket widths need retuning (the reference logs the analogous
  * "Too many request contexts" warning, metric_helper.go:134-139).
  */
object Telemetry {

  private val seq = new AtomicInteger(0)

  /** Attach a row-count observation under a unique node name; `metric` is
    * the stable field name the collector aggregates by. */
  def observeCount(df: DataFrame, metric: String): DataFrame =
    df.observe(s"${metric}_${seq.incrementAndGet()}", count(lit(1)).as(metric))

  /** Collects every observed metric of every completed action, keyed by
    * the metric FIELD name (stable across operator instantiations). */
  final class Collector extends QueryExecutionListener {
    val metrics = new scala.collection.concurrent.TrieMap[String, Long]()
    // monotone update counter: a late event re-putting an EXISTING key
    // leaves the map size unchanged, so size-stability is not quiescence
    private val updates = new java.util.concurrent.atomic.AtomicLong(0)
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.values.foreach { row =>
        row.schema.fieldNames.zip(row.toSeq).foreach {
          case (f, v: Long) => metrics.put(f, v); updates.incrementAndGet()
          case (f, v: java.lang.Number) => metrics.put(f, v.longValue()); updates.incrementAndGet()
          case _ => ()
        }
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()

    /** Listener delivery is async; settle = wait until no new PUTS (not
      * just new keys) arrive for one poll interval (bounded). */
    def settled(maxWaitMs: Long = 3000): Map[String, Long] = {
      var last = -1L
      var waited = 0L
      while (updates.get() != last && waited < maxWaitMs) {
        last = updates.get()
        Thread.sleep(200)
        waited += 200
      }
      metrics.toMap
    }

    def toJson: String =
      settled().toSeq.sorted
        .map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
  }

  def register(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }
}
