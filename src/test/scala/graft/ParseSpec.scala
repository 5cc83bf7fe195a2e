package graft

import org.apache.spark.sql.functions._
import graft.operators.{Enrich, Parse}
import graft.model.PipelineConfig

/** Port of the reference's enrichment assertions
  * (reference: span_enrichment_test.go:98-204).
  */
class ParseSpec extends SparkTestBase {

  private def parse(turns: Seq[graft.model.Turn]) =
    Parse.parsed(Enrich.withServiceDim(turnsDf(turns), spark))

  test("request context: first two URL path segments; query params stripped") {
    val t = Seq(
      turn("c1", 0, "user", "api-server", 100, url = "https://some.domain.com/foo/bar/baz?a=b"),
      turn("c2", 0, "user", "api-server", 100, url = "https://some.domain.com/foo")
    )
    val got = parse(t).select("conv_id", "request_context").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("c1") == "/foo/bar")
    assert(got("c2") == "/foo")
  }

  test("request context falls back to span name (tool) when no URL") {
    // span_enrichment.go:225-228
    val t = Seq(
      graft.model.Turn("c1", 0, "user", "plain text, nothing to extract", "payments", ts(1))
    )
    val got = parse(t).select("request_context").collect().head.getString(0)
    assert(got == "payments")
  }

  test("error type: 4xx client_errors, 5xx server_errors, 2xx none") {
    // span_enrichment_test.go:26-37
    val t = Seq(
      turn("c1", 0, "user", "api-server", 100, status = 404),
      turn("c2", 0, "user", "api-server", 100, status = 504),
      turn("c3", 0, "user", "api-server", 100, status = 200)
    )
    val got = parse(t).select("conv_id", "error_type").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("c1").contains("client_errors"))
    assert(got("c2").contains("server_errors"))
    assert(got("c3").isEmpty)
  }

  test("request type: entry/root inbound, exit outbound, internal internal") {
    // span_enrichment.go:243-253
    val t = Seq(
      turn("c1", 0, "user", "api-server", 100), // root
      turn("c1", 1, "user", "api-server", 100), // entry
      turn("c1", 2, "tool", "api-server", 100), // exit
      turn("c1", 3, "assistant", "api-server", 100) // internal
    )
    val got = parse(t).orderBy("turn_idx").select("request_type").collect().map(_.getString(0))
    assert(got.toSeq == Seq("inbound", "inbound", "outbound", "internal"))
  }

  test("internal spans are not rule-enriched (P1 non-internal filter)") {
    val t = Seq(turn("c1", 1, "assistant", "api-server", 100, status = 500))
    val row = parse(t).select("error_type", "request_context").collect().head
    assert(row.isNullAt(0))
    assert(row.getString(1) == "api-server") // fallback, not URL-extracted
  }

  test("latency seconds from the dur signal") {
    val t = Seq(turn("c1", 0, "user", "api-server", 730))
    assert(parse(t).select("latency_secs").collect().head.getDouble(0) == 0.73)
  }

  test("entity key canonical form with sorted scope keys") {
    // keys.go:13-30, keys_test.go:8-16
    val enriched = Enrich.enriched(
      turnsDf(Seq(turn("c1", 0, "user", "api-server", 100))), spark, PipelineConfig.default)
    val key = enriched.select("entity_key").collect().head.getString(0)
    assert(key == "{env=dev, namespace=backend, site=us-west-2}#Service#api-server")
  }

  test("unknown service: empty namespace, svc-only service key") {
    // utils.go:9-15
    val enriched = Enrich.enriched(
      turnsDf(Seq(turn("c1", 0, "user", "mystery", 100))), spark, PipelineConfig.default)
    val row = enriched.select("service_key", "namespace").collect().head
    assert(row.getString(0) == "mystery")
    assert(row.getString(1) == "")
  }

  test("threshold resolution: exact request -> entity default -> global default") {
    // thresholds.go:34-48, thresholds_test.go:14-111
    val cfg = PipelineConfig.default
    val t = Seq(
      turn("c1", 0, "user", "payments", 100, url = "https://h/purchase/v3"), // exact 0.3
      turn("c2", 0, "user", "payments", 100, url = "https://h/other/x"), // entity default 0.9
      turn("c3", 0, "user", "web", 100, url = "https://h/other/x") // global 0.5
    )
    val got = Enrich.enriched(turnsDf(t), spark, cfg)
      .select("conv_id", "threshold").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("c1" -> 0.3, "c2" -> 0.9, "c3" -> 0.5))
  }
}
