package graft

import org.apache.spark.sql.functions._
import graft.model.PipelineConfig
import graft.operators.{Aggregates, Enrich, Route}

/** Counter/histogram semantics (reference: metrics.go:138-184,
  * metric_helper.go:64-68) + whole-pipeline count invariants.
  */
class AggregatesSpec extends SparkTestBase {

  private val cfg = PipelineConfig(defaultLatencyThresholdSecs = 0.5)

  private lazy val enriched =
    Enrich.enriched(
      graft.sources.Transcripts.fromEvents(spark, "/root/testdata/sf0.001"),
      spark, cfg).cache()
  private lazy val routing = Route.convRouting(enriched, cfg).cache()

  test("trace count equals distinct conversations") {
    val total = Aggregates.traceCounts(routing)
      .agg(sum("trace_count")).collect().head.getLong(0)
    assert(total == enriched.select("conv_id").distinct().count())
  }

  test("sampled counts partition the kept conversations by sample type") {
    val sampled = Aggregates.sampledTraceCounts(routing)
      .agg(sum("sampled_count")).collect().head.getLong(0)
    assert(sampled == routing.filter(col("kept")).count())
  }

  test("span counts cover every span, internal included (getSpanCount)") {
    val total = Aggregates.spanCounts(enriched)
      .agg(sum("span_count")).collect().head.getLong(0)
    assert(total == enriched.count())
    // consistency invariant: sampled span counts can never exceed totals
    val sampledTotal = Aggregates.sampledSpanCounts(enriched, routing)
      .agg(sum("sampled_span_count")).collect().head.getLong(0)
    assert(sampledTotal <= total)
  }

  test("RED rollup: requests/errors/duration per window and service") {
    val red = Aggregates.redRollup(enriched).cache()
    val reqTotal = red.agg(sum("requests")).collect().head.getLong(0)
    assert(reqTotal == enriched.filter(col("span_class") =!= "internal").count())
    val errTotal = red.agg(sum("errors")).collect().head.getLong(0)
    assert(errTotal == enriched
      .filter(col("span_class") =!= "internal" && col("is_error")).count())
    red.unpersist()
  }

  test("histogram cumulative counts are monotone and end at the span total") {
    val hist = Aggregates.latencyHistogram(enriched, cfg).cache()
    val perService = hist.groupBy("service")
      .agg(max("cumulative_count").as("total"), sum("bucket_count").as("s"))
      .collect()
    perService.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    val grand = hist.agg(sum("bucket_count")).collect().head.getLong(0)
    assert(grand == enriched.filter(col("span_class") =!= "internal").count())
    hist.unpersist()
  }

  test("capped labeled histogram: over-cap contexts dropped, config labels present, missing label -> empty") {
    // mirrors metric_helper_test.go:15-59 (label build: configured attr
    // present -> value, absent -> "") and :108-141 (cap: only the first
    // LimitPerService distinct request contexts per service get metrics)
    val capCfg = cfg.copy(
      limitPerService = 1,
      captureAttributesInMetric = Seq("call_service", "no.such.attr")
    )
    val hist = Aggregates.cappedLabeledHistogram(enriched, capCfg).cache()
    val cols = hist.columns.toSet
    assert(Set("asserts_env", "asserts_site", "span_kind", "status_code",
      "call_service", "no_such_attr", "asserts_request_type",
      "asserts_request_context", "asserts_error_type").subsetOf(cols))
    // unknown configured attribute -> "" for every series
    assert(hist.select("no_such_attr").distinct().collect().map(_.getString(0)).toSeq == Seq(""))
    // with limit 1, exactly one request context per (namespace, service)
    val perSvc = hist.select("namespace", "service", "asserts_request_context").distinct()
      .groupBy("namespace", "service").count().collect()
    assert(perSvc.nonEmpty && perSvc.forall(_.getLong(2) == 1L))
    // and it is the FIRST-SEEN context for that service key
    val firstSeen = enriched.filter(col("span_class") =!= "internal")
      .groupBy("service_key", "request_context").agg(min("ts").as("t"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("service_key")
          .orderBy(col("t"), col("request_context"))))
      .filter(col("rn") === 1)
      .select("service_key", "request_context").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val captured = enriched.select("service_key", "namespace", "service").distinct()
      .join(hist.select("namespace", "service", "asserts_request_context").distinct(),
        Seq("namespace", "service"))
      .select("service_key", "asserts_request_context").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(captured == firstSeen)
    // capture_metrics = false -> empty, same schema
    val off = Aggregates.cappedLabeledHistogram(enriched, capCfg.copy(captureMetrics = false))
    assert(off.columns.sameElements(hist.columns) && off.count() == 0)
    hist.unpersist()
  }

  test("fineRollup metric cap: over-cap request contexts emit no metric rows; captureMetrics=false disables") {
    val tight = cfg.copy(limitPerService = 1)
    val rollup = Aggregates.fineRollup(enriched, tight)
    val perSvc = rollup.select("namespace", "service", "request_context").distinct()
      .groupBy("namespace", "service").count().collect()
    assert(perSvc.nonEmpty && perSvc.forall(_.getLong(2) == 1L))
    // uncapped config covers every non-internal (svc, ctx) combination
    val full = Aggregates.fineRollup(enriched, cfg)
    val allCtx = enriched.filter(col("span_class") =!= "internal")
      .select("namespace", "service", "request_context").distinct().count()
    assert(full.select("namespace", "service", "request_context").distinct().count() == allCtx)
    // span counts are NOT capped (incrTotalCounts counts every span)
    assert(Aggregates.spanCounts(enriched).agg(sum("span_count")).collect().head.getLong(0)
      == enriched.count())
    assert(Aggregates.fineRollup(enriched, cfg.copy(captureMetrics = false)).count() == 0)
  }

  test("TTL cap (batch): idle context evicted at window boundary, late context admitted") {
    // batch mirror of metric_helper_test.go:142-179: limit 1, TTL 60 min.
    // Window 0: /a first-seen -> admitted, /b over-cap -> no metric rows.
    // Window 1: /a idle -> slot free -> /b admitted.
    val ttlCfg = cfg.copy(limitPerService = 1, requestContextCacheTTLMinutes = 60)
    val t = turnsDf(Seq(
      turn("c1", 1, "user", "web", 100, url = "https://h/a", tSecs = 0),
      turn("c2", 1, "user", "web", 100, url = "https://h/b", tSecs = 600), // win 0, over cap
      turn("c3", 1, "user", "web", 100, url = "https://h/b", tSecs = 3700) // win 1, admitted
    ))
    val red = Aggregates.ttlCappedRed(Enrich.enriched(t, spark, ttlCfg), ttlCfg)
    val got = red.select("request_context", "win_start_us").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("/a", 0L), ("/b", 3600L * 1000000L)))
  }

  test("prometheus text exposition: name{labels} value lines, nulls omitted, values escaped") {
    val table = Aggregates.prometheusTable(
      Aggregates.traceCounts(routing),
      Aggregates.sampledTraceCounts(routing),
      Aggregates.spanCounts(enriched),
      Aggregates.redRollup(enriched),
      Aggregates.latencyHistogram(enriched, cfg),
      Aggregates.sampledSpanCounts(enriched, routing)
    )
    val lines = Aggregates.prometheusText(table).collect().map(_.getString(0))
    assert(lines.nonEmpty)
    // every line matches the exposition grammar
    val shape = """[a-z_][a-z0-9_]*\{[^}]*\} -?[0-9.E+-]+""".r
    lines.foreach(l => assert(shape.pattern.matcher(l).matches(), l))
    // trace counter carries only env/site labels; no null-label leakage
    val trace = lines.filter(_.startsWith("asserts_trace_count_total"))
    assert(trace.nonEmpty && trace.forall(l =>
      l.contains("asserts_env=\"") && l.contains("asserts_site=\"")
        && !l.contains("service=") && !l.contains("le=")))
    // histogram lines carry le
    assert(lines.exists(l => l.startsWith("otel_span_latency_seconds_bucket") && l.contains("le=\"")))
  }

  test("histogram buckets: latency lands in the smallest bucket >= value") {
    val t = turnsDf(Seq(
      turn("c1", 0, "user", "api-server", 5), // 0.005 -> le 0.005
      turn("c2", 0, "user", "api-server", 6), // 0.006 -> le 0.01
      turn("c3", 0, "user", "api-server", 200000) // 200s -> +Inf
    ))
    val hist = Aggregates.latencyHistogram(Enrich.enriched(t, spark, cfg), cfg)
      .select("le", "bucket_count").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(hist(0.005) == 1)
    assert(hist(0.01) == 1)
    assert(hist(Double.PositiveInfinity) == 1)
  }
}
