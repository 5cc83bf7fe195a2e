package graft

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml
import graft.model.PipelineConfig
import graft.functions.Rules
import graft.functions.Rules.AttributeRule

/** Job-config loading: the spark-submit analogue of the reference's
  * factory + config-refresh control path (reference:
  * assertsprocessor/factory.go:49-138, config.go:18-77,
  * config_refresh.go:28-84).
  *
  * - Parses BOTH key dialects for every field: the builder's short names
  *   (`env`, `default_latency_threshold`, `replacement`, ...) and the
  *   reference's mapstructure tags (`asserts_env`,
  *   `sampling_latency_threshold_seconds`, `value_expr`, ... —
  *   config.go:18-37, custom_attribute.go:10-15), so the reference's own
  *   `sample-collector-config.yaml` loads verbatim, including the
  *   `processors.assertsprocessor` wrapper.
  * - Replacements read `value_expr` first (custom_attribute.go:14), then
  *   `replacement`; collector-escaped `$$n` captures are unescaped to
  *   `$n` (sample-collector-config.yaml:58-64 — the OTel collector uses
  *   `$$` to escape `$` in config values).
  * - Reference span kinds are normalized to the transcript model's
  *   span_class domain: Server->entry, Client->exit, Internal->internal
  *   (span classification, trace.go:22-35).
  * - Validates fail-fast: an invalid regex aborts job submission, exactly
  *   like `Config.Validate()` (config.go:41-77) — enforced by the
  *   AttributeRule constructor compiling every pattern.
  * - `merge` implements the startup precedence (factory.go:69-82): the
  *   server-side config overrides local values for capture_metrics,
  *   metric labels, threshold, rules, and client-error handling; buckets
  *   only when non-empty.
  *
  * Batch jobs read the config once per run; the streaming variant re-reads
  * per micro-batch in foreachBatch (C2/C3 re-expression).
  */
object ConfigLoader {

  /** `specified` records which merge-relevant keys the YAML actually set,
    * so [[merge]] only lets a remote config override fields it names.
    * (The reference unmarshals the remote JSON into a zero-valued struct
    * and copies unconditionally — factory.go:73-82 + config_refresh.go:
    * 53-57 — which silently resets omitted fields to Go zero values; we
    * treat "omitted" as "not specified" instead, a documented divergence
    * that avoids the zero-value reset.) */
  final case class JobConfig(
      pipeline: PipelineConfig,
      rules: Rules.RuleTable,
      specified: Set[String] = Set.empty
  )

  def fromYaml(yaml: String): JobConfig = {
    val root0 = new Yaml().load[Any](yaml)
    val root = asMap(root0).getOrElse(Map.empty)
    // unwrap: processors.assertsprocessor (collector layout), or a bare
    // asserts_processor / assertsprocessor block, or the root itself
    val processors = asMap(root.getOrElse("processors", null)).getOrElse(Map.empty)
    val p = asMap(processors.getOrElse("assertsprocessor", null))
      .orElse(asMap(root.getOrElse("asserts_processor", null)))
      .orElse(asMap(root.getOrElse("assertsprocessor", null)))
      .getOrElse(root)

    val base = PipelineConfig.default
    val cfg = PipelineConfig(
      env = str2(p, "env", "asserts_env").getOrElse(base.env),
      site = str2(p, "site", "asserts_site").getOrElse(base.site),
      defaultLatencyThresholdSecs =
        num2(p, "default_latency_threshold", "sampling_latency_threshold_seconds")
          .getOrElse(base.defaultLatencyThresholdSecs),
      limitPerService = num2(p, "limit_per_service", "trace_rate_limit_per_service")
        .map(_.toInt).getOrElse(base.limitPerService),
      topKPerRequest = math.min(
        5,
        num2(p, "limit_per_request_per_service", "trace_rate_limit_per_service_per_request")
          .map(_.toInt).getOrElse(base.topKPerRequest)
      ), // min(5, limit) per service_queue.go:58
      normalSamplingFrequencyMinutes =
        num2(p, "normal_sampling_frequency_minutes", "normal_trace_sampling_rate_minutes")
          .map(_.toInt).getOrElse(base.normalSamplingFrequencyMinutes),
      ignoreClientErrors = bool(p, "ignore_client_errors").getOrElse(base.ignoreClientErrors),
      histogramBuckets = seq(p, "latency_histogram_buckets")
        .map(_.flatMap(anyNum)).filter(_.nonEmpty).getOrElse(base.histogramBuckets),
      captureMetrics = bool(p, "capture_metrics").getOrElse(base.captureMetrics),
      captureAttributesInMetric = seq(p, "attributes_as_metric_labels")
        .map(_.map(_.toString)).getOrElse(base.captureAttributesInMetric),
      requestContextCacheTTLMinutes = num(p, "request_context_cache_ttl_minutes")
        .map(_.toInt).getOrElse(base.requestContextCacheTTLMinutes),
      traceFlushFrequencySeconds = num(p, "trace_flush_frequency_seconds")
        .map(_.toInt).getOrElse(base.traceFlushFrequencySeconds),
      sampleTraces = bool(p, "sample_traces").getOrElse(base.sampleTraces)
    )
    // span_attributes, when present, REPLACES the legacy block — the
    // reference compiles one or the other, never both
    // (span_enrichment.go:43-49 buildCompiledConfig if/else)
    val spanAttrRules = parseSpanAttributes(p)
    val specified = Seq(
      "capture_metrics" -> bool(p, "capture_metrics").isDefined,
      "attributes_as_metric_labels" -> seq(p, "attributes_as_metric_labels").isDefined,
      "default_latency_threshold" ->
        num2(p, "default_latency_threshold", "sampling_latency_threshold_seconds").isDefined,
      "ignore_client_errors" -> bool(p, "ignore_client_errors").isDefined,
      "latency_histogram_buckets" ->
        seq(p, "latency_histogram_buckets").exists(_.flatMap(anyNum).nonEmpty)
    ).collect { case (k, true) => k }.toSet
    JobConfig(cfg, if (spanAttrRules.nonEmpty) spanAttrRules else parseLegacyRules(p), specified)
  }

  /** Reference span kinds -> transcript span_class domain: Consumer is an
    * entry kind and Producer an exit kind exactly like Server/Client
    * (utils.go:128-135 isEntry/isExit kind sets; rule span_kind gating
    * accepts any kind string, custom_attribute.go:79-83). */
  private def normKind(k: String): String = k match {
    case "Server" | "Consumer" => "entry"
    case "Client" | "Producer" => "exit"
    case "Internal" => "internal"
    case other => other
  }

  /** Replacement value: `value_expr` (custom_attribute.go:14) first, then
    * the builder's `replacement`; `$$` unescapes to `$` (OTel collector
    * config escaping, sample-collector-config.yaml:58-64). Empty compiles
    * to the "$1" default (custom_attribute.go:60-63). */
  private def replacementOf(r: Map[String, Any]): String =
    str2(r, "value_expr", "replacement").map(_.replace("$$", "$")).getOrElse("$1")

  private def ruleOf(r: Map[String, Any], key: String, target: String): AttributeRule =
    AttributeRule(
      serviceKey = key,
      spanKinds = seq(r, "span_kinds").getOrElse(Nil).map(k => normKind(k.toString)) match {
        case Nil => Seq("entry") // reference default ["Server"]
        case ks => ks
      },
      sourceAttrs = seq(r, "source_attributes").getOrElse(Nil).map(_.toString),
      regex = str(r, "regex").getOrElse(
        throw new IllegalArgumentException(s"rule under $target missing regex")
      ),
      replacement = replacementOf(r)
    )

  /** Newer dialect: span_attributes: [{attr_name, attr_configs: [{namespace?,
    * service?, rules: [{source_attributes, span_kinds?, regex, value_expr?}]}]}] */
  private def parseSpanAttributes(p: Map[String, Any]): Rules.RuleTable =
    seq(p, "span_attributes").getOrElse(Nil).flatMap(asMap).flatMap { attr =>
      val target = str(attr, "attr_name")
      val rules = seq(attr, "attr_configs").getOrElse(Nil).flatMap(asMap).flatMap { ac =>
        val ns = str(ac, "namespace").getOrElse("")
        val svc = str(ac, "service").getOrElse("")
        val key =
          if (ns.nonEmpty && svc.nonEmpty) s"$ns#$svc"
          else if (ns.nonEmpty) ns
          else if (svc.nonEmpty) svc
          else "default"
        seq(ac, "rules").getOrElse(Nil).flatMap(asMap).map(ruleOf(_, key, target.getOrElse("?")))
      }
      target.map(_ -> rules)
    }.toMap

  /** Older dialect: custom_attributes / custom_attribute_configs:
    * {target: {serviceKey: [rule]}} (config.go:24 mapstructure tag is
    * `custom_attributes`). */
  private def parseLegacyRules(p: Map[String, Any]): Rules.RuleTable = {
    val block = asMap(p.getOrElse("custom_attributes", null))
      .orElse(asMap(p.getOrElse("custom_attribute_configs", null)))
      .getOrElse(Map.empty)
    block.map { case (target, byKey) =>
      target -> asMap(byKey).getOrElse(Map.empty).toSeq.sortBy(_._1).flatMap {
        case (key, ruleList) =>
          ruleList.asInstanceOf[java.util.List[Any]].asScala.toSeq.flatMap(asMap)
            .map(ruleOf(_, key, target))
      }
    }
  }

  /** Startup precedence (factory.go:69-82): `remote` wins for the control
    * fields it actually SETS (see [[JobConfig.specified]]); buckets only
    * when the remote list is non-empty (factory.go:79-81 length check). */
  def merge(local: JobConfig, remote: JobConfig): JobConfig = {
    def has(k: String) = remote.specified.contains(k)
    JobConfig(
      local.pipeline.copy(
        captureMetrics =
          if (has("capture_metrics")) remote.pipeline.captureMetrics
          else local.pipeline.captureMetrics,
        captureAttributesInMetric =
          if (has("attributes_as_metric_labels")) remote.pipeline.captureAttributesInMetric
          else local.pipeline.captureAttributesInMetric,
        defaultLatencyThresholdSecs =
          if (has("default_latency_threshold")) remote.pipeline.defaultLatencyThresholdSecs
          else local.pipeline.defaultLatencyThresholdSecs,
        ignoreClientErrors =
          if (has("ignore_client_errors")) remote.pipeline.ignoreClientErrors
          else local.pipeline.ignoreClientErrors,
        histogramBuckets =
          if (has("latency_histogram_buckets")) remote.pipeline.histogramBuckets
          else local.pipeline.histogramBuckets
      ),
      if (remote.rules.nonEmpty) remote.rules else local.rules,
      local.specified ++ remote.specified
    )
  }

  // ---- minimal dynamic-YAML helpers ----
  private def asMap(a: Any): Option[Map[String, Any]] = a match {
    case m: java.util.Map[_, _] =>
      Some(m.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap)
    case _ => None
  }
  private def seq(m: Map[String, Any], k: String): Option[Seq[Any]] =
    m.get(k).collect { case l: java.util.List[_] => l.asScala.toSeq }
  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).filter(_ != null).map(_.toString).filter(_.nonEmpty)
  private def str2(m: Map[String, Any], k1: String, k2: String): Option[String] =
    str(m, k1).orElse(str(m, k2))
  private def bool(m: Map[String, Any], k: String): Option[Boolean] =
    m.get(k).collect { case b: java.lang.Boolean => b.booleanValue() }
  private def num(m: Map[String, Any], k: String): Option[Double] =
    m.get(k).flatMap(anyNum)
  private def num2(m: Map[String, Any], k1: String, k2: String): Option[Double] =
    num(m, k1).orElse(num(m, k2))
  private def anyNum(a: Any): Option[Double] = a match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }
}
