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
  * - Parses the reference's YAML dialects: the newer `span_attributes`
  *   list (config.go:24, custom_attribute.go:10-15) and the older
  *   `custom_attribute_configs` map (config.go:7-16) — both compile to the
  *   same internal rule table (span_enrichment.go:43-105).
  * - Validates fail-fast: an invalid regex aborts job submission, exactly
  *   like `Config.Validate()` (config.go:41-77) — enforced by the
  *   AttributeRule constructor compiling every pattern.
  * - `merge` implements the startup precedence (factory.go:69-82): the
  *   server-side config overrides local values for the sampling/enrich
  *   fields, buckets only when non-empty.
  *
  * Batch jobs read the config once per run; the streaming variant re-reads
  * per micro-batch in foreachBatch (C2/C3 re-expression).
  */
object ConfigLoader {

  final case class JobConfig(pipeline: PipelineConfig, rules: Rules.RuleTable)

  def fromYaml(yaml: String): JobConfig = {
    val root0 = new Yaml().load[Any](yaml)
    val root = asMap(root0).getOrElse(Map.empty)
    val p = asMap(root.getOrElse("asserts_processor", root)).getOrElse(Map.empty)

    val base = PipelineConfig.default
    val cfg = PipelineConfig(
      env = str(p, "env").getOrElse(base.env),
      site = str(p, "site").getOrElse(base.site),
      defaultLatencyThresholdSecs =
        num(p, "default_latency_threshold").getOrElse(base.defaultLatencyThresholdSecs),
      limitPerService = num(p, "limit_per_service").map(_.toInt).getOrElse(base.limitPerService),
      topKPerRequest = math.min(
        5,
        num(p, "limit_per_request_per_service").map(_.toInt).getOrElse(base.topKPerRequest)
      ), // min(5, limit) per service_queue.go:58
      normalSamplingFrequencyMinutes = num(p, "normal_sampling_frequency_minutes")
        .map(_.toInt).getOrElse(base.normalSamplingFrequencyMinutes),
      ignoreClientErrors = bool(p, "ignore_client_errors").getOrElse(base.ignoreClientErrors),
      histogramBuckets = seq(p, "latency_histogram_buckets")
        .map(_.flatMap(anyNum)).filter(_.nonEmpty).getOrElse(base.histogramBuckets)
    )
    JobConfig(cfg, parseSpanAttributes(p) ++ parseLegacyRules(p))
  }

  /** Newer dialect: span_attributes: [{attr_name, attr_configs: [{namespace?,
    * service?, rules: [{source_attributes, span_kinds?, regex, replacement?}]}]}] */
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
        seq(ac, "rules").getOrElse(Nil).flatMap(asMap).map { r =>
          AttributeRule(
            serviceKey = key,
            spanKinds = seq(r, "span_kinds").getOrElse(Nil).map(_.toString) match {
              case Nil => Seq("entry") // reference default ["Server"]
              case ks => ks
            },
            sourceAttrs = seq(r, "source_attributes").getOrElse(Nil).map(_.toString),
            regex = str(r, "regex").getOrElse(
              throw new IllegalArgumentException(s"rule under $target missing regex")
            ),
            replacement = str(r, "replacement").getOrElse("$1")
          )
        }
      }
      target.map(_ -> rules)
    }.toMap

  /** Older dialect: custom_attribute_configs: {target: {serviceKey: [rule]}} */
  private def parseLegacyRules(p: Map[String, Any]): Rules.RuleTable =
    asMap(p.getOrElse("custom_attribute_configs", null)).getOrElse(Map.empty).map {
      case (target, byKey) =>
        target -> asMap(byKey).getOrElse(Map.empty).toSeq.sortBy(_._1).flatMap {
          case (key, ruleList) =>
            ruleList.asInstanceOf[java.util.List[Any]].asScala.toSeq.flatMap(asMap).map { r =>
              AttributeRule(
                serviceKey = key,
                spanKinds = seq(r, "span_kinds").getOrElse(Nil).map(_.toString) match {
                  case Nil => Seq("entry")
                  case ks => ks
                },
                sourceAttrs = seq(r, "source_attributes").getOrElse(Nil).map(_.toString),
                regex = str(r, "regex").getOrElse(
                  throw new IllegalArgumentException(s"rule under $target missing regex")
                ),
                replacement = str(r, "replacement").getOrElse("$1")
              )
            }
        }
    }

  /** Startup precedence (factory.go:69-82): `remote` wins for the control
    * fields; buckets only when the remote list is non-empty. */
  def merge(local: JobConfig, remote: JobConfig, remoteYamlHadBuckets: Boolean): JobConfig =
    JobConfig(
      local.pipeline.copy(
        defaultLatencyThresholdSecs = remote.pipeline.defaultLatencyThresholdSecs,
        ignoreClientErrors = remote.pipeline.ignoreClientErrors,
        histogramBuckets =
          if (remoteYamlHadBuckets) remote.pipeline.histogramBuckets
          else local.pipeline.histogramBuckets
      ),
      if (remote.rules.nonEmpty) remote.rules else local.rules
    )

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
  private def bool(m: Map[String, Any], k: String): Option[Boolean] =
    m.get(k).collect { case b: java.lang.Boolean => b.booleanValue() }
  private def num(m: Map[String, Any], k: String): Option[Double] =
    m.get(k).flatMap(anyNum)
  private def anyNum(a: Any): Option[Double] = a match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }
}
