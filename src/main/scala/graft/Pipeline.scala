package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.PipelineConfig
import graft.operators.{Aggregates, Enrich, Route}

/** End-to-end parse -> enrich -> route -> aggregate pipeline over a
  * transcript table — the batch re-expression of the reference's
  * per-batch consume path + periodic flush
  * (reference: assertsprocessor/processor.go:58-76, sampler.go:215-276).
  *
  * One logical plan per output; the enriched intermediate is shared.
  * At cluster scale the intermediate would be checkpointed to a staging
  * table so the fan-out writes are exactly-once and resumable; locally we
  * cache it.
  */
final case class PipelineOutputs(
    enriched: DataFrame,
    routing: DataFrame,
    routedTurns: DataFrame,
    traceCounts: DataFrame,
    sampledTraceCounts: DataFrame,
    spanCounts: DataFrame,
    redRollup: DataFrame,
    latencyHistogram: DataFrame
)

object Pipeline {

  def run(
      spark: SparkSession,
      turns: DataFrame,
      cfg: PipelineConfig = PipelineConfig.default,
      cache: Boolean = true
  ): PipelineOutputs = {
    val enriched0 = Enrich.enriched(turns, spark, cfg)
    val enriched = if (cache) enriched0.cache() else enriched0
    val routing0 = Route.convRouting(enriched, cfg)
    val routing = if (cache) routing0.cache() else routing0
    PipelineOutputs(
      enriched = enriched,
      routing = routing,
      routedTurns = Route.routedTurns(turns, routing),
      traceCounts = Aggregates.traceCounts(routing),
      sampledTraceCounts = Aggregates.sampledTraceCounts(routing),
      spanCounts = Aggregates.spanCounts(enriched),
      redRollup = Aggregates.redRollup(enriched),
      latencyHistogram = Aggregates.latencyHistogram(enriched, cfg)
    )
  }

  /** Fan-out sink writes from one cached intermediate: errors / slow /
    * normal routed turns + metric tables, each an ordered parquet write
    * (Iceberg `writeTo(...).append()` on a real cluster). Returns per-sink
    * row counts (the reference's sampled-count counters).
    */
  def writeSinks(out: PipelineOutputs, outDir: String): Map[String, Long] = {
    val routed = out.routedTurns.cache()
    val sinks = Seq("errors", "slow", "normal").map { s =>
      val rows = routed.filter(col("sink") === s).orderBy("conv_id", "turn_idx")
      rows.write.mode("overwrite").parquet(s"$outDir/sink_$s")
      s -> rows.count()
    }
    val metrics = Seq(
      "metrics_trace_counts" -> out.traceCounts,
      "metrics_sampled_counts" -> out.sampledTraceCounts,
      "metrics_span_counts" -> out.spanCounts,
      "metrics_red" -> out.redRollup,
      "metrics_histogram" -> out.latencyHistogram
    ).map { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      name -> df.count()
    }
    routed.unpersist()
    (sinks ++ metrics).toMap
  }
}
