package graft

import graft.ConfigLoader

/** Config parse / validate / merge (reference: config.go:41-77,
  * factory.go:69-82, sample-collector-config.yaml dialects). */
class ConfigLoaderSpec extends SparkTestBase {

  private val yamlNew =
    """asserts_processor:
      |  env: prod
      |  site: us-east-1
      |  default_latency_threshold: 0.5
      |  limit_per_service: 10
      |  limit_per_request_per_service: 7
      |  normal_sampling_frequency_minutes: 3
      |  ignore_client_errors: false
      |  span_attributes:
      |    - attr_name: request_context
      |      attr_configs:
      |        - namespace: platform
      |          service: api-server
      |          rules:
      |            - source_attributes: [url]
      |              span_kinds: [entry, exit]
      |              regex: "https?://.+?((/[^/?]+){1,3}).*"
      |        - rules:
      |            - source_attributes: [url]
      |              regex: "https?://.+?((/[^/?]+){1,2}).*"
      |              replacement: "$1"
      |""".stripMargin

  test("parses the span_attributes dialect with defaults") {
    val jc = ConfigLoader.fromYaml(yamlNew)
    assert(jc.pipeline.env == "prod")
    assert(jc.pipeline.limitPerService == 10)
    assert(jc.pipeline.topKPerRequest == 5) // min(5, 7) per service_queue.go:58
    assert(jc.pipeline.normalSamplingFrequencyMinutes == 3)
    assert(!jc.pipeline.ignoreClientErrors)
    val rules = jc.rules("request_context")
    assert(rules.size == 2)
    assert(rules.head.serviceKey == "platform#api-server")
    assert(rules.head.spanKinds == Seq("entry", "exit"))
    assert(rules(1).serviceKey == "default")
    assert(rules(1).spanKinds == Seq("entry")) // reference default
    assert(rules(1).replacement == "$1")
  }

  test("parses the legacy custom_attribute_configs dialect") {
    val yaml =
      """asserts_processor:
        |  custom_attribute_configs:
        |    error_type:
        |      default:
        |        - source_attributes: [status]
        |          regex: "^(4..)$"
        |          replacement: client_errors
        |""".stripMargin
    val jc = ConfigLoader.fromYaml(yaml)
    val r = jc.rules("error_type").head
    assert(r.serviceKey == "default" && r.replacement == "client_errors")
  }

  test("invalid regex fails job submission (Config.Validate semantics)") {
    val bad = yamlNew.replace("https?://.+?((/[^/?]+){1,3}).*", "(unclosed")
    intercept[java.util.regex.PatternSyntaxException](ConfigLoader.fromYaml(bad))
  }

  test("merge precedence: server config wins for control fields; buckets only if non-empty") {
    val local = ConfigLoader.fromYaml(yamlNew)
    val remote = ConfigLoader.fromYaml(
      """asserts_processor:
        |  default_latency_threshold: 2.0
        |  ignore_client_errors: true
        |""".stripMargin)
    val merged = ConfigLoader.merge(local, remote, remoteYamlHadBuckets = false)
    assert(merged.pipeline.defaultLatencyThresholdSecs == 2.0)
    assert(merged.pipeline.ignoreClientErrors)
    assert(merged.pipeline.histogramBuckets == local.pipeline.histogramBuckets)
    assert(merged.rules == local.rules) // remote had none
  }

  test("loaded rules drive the parse stage end-to-end") {
    import org.apache.spark.sql.functions._
    val jc = ConfigLoader.fromYaml(yamlNew)
    val turns = turnsDf(Seq(
      turn("c1", 1, "user", "api-server", 100, url = "https://h/a/b/c/d"),
      turn("c2", 1, "user", "web", 100, url = "https://h/a/b/c/d")
    ))
    val parsed = graft.operators.Parse.parsed(
      graft.operators.Enrich.withServiceDim(turns, spark),
      rules = jc.rules ++ graft.operators.Parse.defaultRules.view.filterKeys(_ != "request_context").toMap
    )
    val got = parsed.select("conv_id", "request_context").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // api-server: 3-segment service-specific rule (backend#api-server falls
    // back to... config key is platform#api-server, row key backend#api-server
    // -> svc fallback misses -> default 2-segment)
    assert(got("c2") == "/a/b")
    assert(got("c1") == "/a/b")
  }
}
