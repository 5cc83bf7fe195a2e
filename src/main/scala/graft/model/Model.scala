package graft.model

import java.sql.Timestamp

/** Core row types of the engine.
  *
  * The input shape follows the transcript table contract
  * (conv_id, turn_idx, role, text, tool, ts) — the Spark analogue of the
  * reference's span stream (reference: assertsprocessor/utils.go:35-98, a
  * span has trace_id / kind / name / attributes / timestamps).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Pipeline configuration, mirroring the reference's processor defaults
  * (reference: assertsprocessor/factory.go:32-47, config.go:18-37).
  * All knobs that shape routing/aggregation semantics live here so tests
  * can tighten them (e.g. a small `limitPerService` to exercise the cap).
  */
final case class PipelineConfig(
    env: String = "dev",
    site: String = "us-west-2",
    /** Global slow-latency threshold in seconds (factory.go:40 default 3s;
      * the reference sample config and its sampler tests use 0.5s). */
    defaultLatencyThresholdSecs: Double = 0.5,
    /** Max distinct request contexts tracked per service (factory.go:41). */
    limitPerService: Int = 100,
    /** Top-K retained traces per (entity, request) per class per flush:
      * min(5, LimitPerRequestPerService) (service_queue.go:58). */
    topKPerRequest: Int = 3,
    /** One healthy sample per (entity, request) per window (factory.go:44). */
    normalSamplingFrequencyMinutes: Int = 5,
    /** Drop `client_errors`-typed error spans from error routing
      * (sampler.go:195-198). */
    ignoreClientErrors: Boolean = true,
    /** Latency histogram bucket upper bounds in seconds (factory.go:38). */
    histogramBuckets: Seq[Double] = PipelineConfig.DefaultBuckets,
    /** Capture the latency histogram at all (config.go `capture_metrics`,
      * processor.go gate). */
    captureMetrics: Boolean = true,
    /** Extra span/resource attribute columns captured as metric labels
      * (config.go `attributes_as_metric_labels`, metric_helper.go:143-183).
      * Names are resolved against the enriched relation's columns; prom
      * normalization applies to the label name. */
    captureAttributesInMetric: Seq[String] = Nil,
    /** TTL of the per-service request-context cache guarding metric
      * cardinality (config.go `request_context_cache_ttl_minutes`,
      * factory.go default 60). */
    requestContextCacheTTLMinutes: Int = 60,
    /** Flush cadence of the streaming variant (config.go
      * `trace_flush_frequency_seconds`, factory.go default 30). */
    traceFlushFrequencySeconds: Int = 30,
    /** `sample_traces = false` bypasses the sampler entirely: every
      * conversation forwards unsampled (sink "forward"), and the
      * trace/sampled counters are not incremented — metrics capture
      * still runs (processor.go:70-74, sampler.go:115). */
    sampleTraces: Boolean = true
)

object PipelineConfig {
  val DefaultBuckets: Seq[Double] =
    Seq(.005, .01, .025, .05, .1, .25, .5, 1, 2.5, 5, 10, 30, 60, 90, 120)
  val default: PipelineConfig = PipelineConfig()
}
