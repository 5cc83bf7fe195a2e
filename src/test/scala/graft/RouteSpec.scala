package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.{PipelineConfig, Turn}
import graft.operators.{Enrich, Route}

/** Port of the reference sampler's behavioral assertions
  * (reference: sampler_test.go:39-519, priority_queue_test.go:11-121,
  * service_queue_test.go) — FIXTURES.md §3 canonical cases.
  */
class RouteSpec extends SparkTestBase {

  private val cfg = PipelineConfig(defaultLatencyThresholdSecs = 0.5)

  private def route(turns: Seq[Turn], c: PipelineConfig = cfg): DataFrame =
    Route.convRouting(Enrich.enriched(turnsDf(turns), spark, c), c)

  private def one(df: DataFrame, conv: String): Row =
    df.filter(col("conv_id") === conv).collect().head

  test("error routing: error span routes the whole conv once with the segment's latency") {
    // sampler_test.go:81-147 — root latency 0.1, error on exit span;
    // routed as error with latency 0.1, slow count 0
    val turns = Seq(
      turn("c1", 0, "user", "api-server", durMs = 100, status = 200, tSecs = 10),
      turn("c1", 1, "tool", "api-server", durMs = 50, status = 503, tSecs = 11)
    )
    val r = route(turns)
    assert(r.count() == 1)
    val row = one(r, "c1")
    assert(row.getAs[String]("sample_type") == "error")
    assert(row.getAs[Double]("latency") == 0.1)
    assert(row.getAs[String]("sink") == "errors")
  }

  test("slow routing: main-span latency 0.7 > 0.5 threshold") {
    // sampler_test.go:217-283
    val turns = Seq(
      turn("c1", 0, "user", "api-server", durMs = 700, status = 200, tSecs = 10),
      turn("c1", 1, "tool", "api-server", durMs = 100, status = 200, tSecs = 11)
    )
    val row = one(route(turns), "c1")
    assert(row.getAs[String]("sample_type") == "slow")
    assert(row.getAs[Double]("latency") == 0.7)
    assert(row.getAs[String]("sink") == "slow")
  }

  test("latency 0.4 under threshold is not slow (falls to normal sampling)") {
    // sampler_test.go:39-79: 0.6 slow, 0.4 not
    val turns = Seq(turn("c1", 0, "user", "api-server", durMs = 400, tSecs = 10))
    val row = one(route(turns), "c1")
    assert(row.getAs[String]("sample_type") == "normal")
  }

  test("client errors are ignored when configured; conv may be normal-sampled") {
    // sampler_test.go:148-215
    val turns = Seq(
      turn("c1", 0, "user", "api-server", durMs = 100, status = 200, tSecs = 10),
      turn("c1", 1, "tool", "api-server", durMs = 50, status = 404, tSecs = 11)
    )
    val row = one(route(turns), "c1")
    assert(row.getAs[String]("sample_type") == "normal")

    val noIgnore = cfg.copy(ignoreClientErrors = false)
    val row2 = one(route(turns, noIgnore), "c1")
    assert(row2.getAs[String]("sample_type") == "error")
  }

  test("two segments: error in second segment routes conv once, keyed by that segment") {
    // sampler_test.go:285-386
    val turns = Seq(
      turn("c1", 0, "user", "payments", durMs = 100, status = 200,
        url = "https://host/payment/pay/123", tSecs = 10),
      turn("c1", 1, "tool", "payments", durMs = 50, status = 200,
        url = "https://host/payment/pay/123", tSecs = 11),
      turn("c1", 2, "tool", "api-server", durMs = 80, status = 503,
        url = "https://host/check/fraud", tSecs = 12)
    )
    val r = route(turns)
    assert(r.count() == 1)
    val row = one(r, "c1")
    assert(row.getAs[String]("sample_type") == "error")
    // routed key comes from the flagged span's segment (api-server)
    assert(row.getAs[String]("service") == "api-server")
    assert(row.getAs[String]("request_context") == "/check/fraud")
    assert(row.getAs[Double]("latency") == 0.08)
  }

  test("error precedence is by span order, not class: earlier slow span wins") {
    // sampler.go:82-110 — first matching span in iteration order wins
    val turns = Seq(
      turn("c1", 0, "user", "api-server", durMs = 900, status = 200, tSecs = 10), // slow root
      turn("c1", 1, "tool", "api-server", durMs = 50, status = 503, tSecs = 11) // error exit
    )
    val row = one(route(turns), "c1")
    assert(row.getAs[String]("sample_type") == "slow")
  }

  test("normal sampling: one conv per (entity, request) per window") {
    // sampler_test.go:388-452 + periodic_sampler.go:13-31
    val turns = (1 to 3).flatMap { i =>
      Seq(turn(s"c$i", 0, "user", "api-server", durMs = 100, tSecs = 10 + i))
    } ++ Seq(turn("c9", 0, "user", "api-server", durMs = 100, tSecs = 400)) // next 5-min window
    val r = route(turns)
    val normals = r.filter(col("sample_type") === "normal").collect().map(_.getAs[String]("conv_id")).sorted
    assert(normals.toSeq == Seq("c1", "c9")) // first of each window
    assert(r.filter(col("sample_type").isNull).count() == 2)
  }

  test("cardinality cap: requests beyond limitPerService are dropped") {
    // sampler_test.go:474-519, service_queue.go:39-75 — limit 2, 3rd request dropped
    val small = cfg.copy(limitPerService = 2)
    val turns = Seq(
      turn("c1", 0, "user", "api-server", durMs = 700, url = "https://h/a/1", tSecs = 10),
      turn("c2", 0, "user", "api-server", durMs = 700, url = "https://h/b/2", tSecs = 20),
      turn("c3", 0, "user", "api-server", durMs = 700, url = "https://h/c/3", tSecs = 30)
    )
    val r = route(turns, small)
    assert(one(r, "c1").getAs[String]("sample_type") == "slow")
    assert(one(r, "c2").getAs[String]("sample_type") == "slow")
    assert(one(r, "c3").getAs[String]("sample_type") == null)
  }

  test("top-K keeps the K highest-latency convs per (entity, request, class)") {
    // priority_queue_test.go:54-121 — K=3, keep highest latencies
    val turns = (1 to 5).flatMap { i =>
      Seq(turn(s"c$i", 0, "user", "api-server", durMs = 500 + i * 100, tSecs = 10 + i))
    }
    val r = route(turns)
    val kept = r.filter(col("kept")).collect().map(_.getAs[String]("conv_id")).sorted
    assert(kept.toSeq == Seq("c3", "c4", "c5")) // latencies 0.8, 0.9, 1.0
    assert(r.filter(col("sample_type") === "slow").count() == 5)
  }

  test("normal samples share the slow queue for top-K") {
    // sampler.go:171: normal samples push into the slow queue
    val slowTurns = (1 to 3).flatMap { i =>
      Seq(turn(s"s$i", 0, "user", "api-server", durMs = 800 + i, tSecs = 10 + i))
    }
    // healthy conv, same (entity, request), earliest in window -> sampled
    // normal but evicted from the shared queue by higher-latency slows
    val normalTurn = Seq(turn("n1", 0, "user", "api-server", durMs = 100, tSecs = 5))
    val r = route(slowTurns ++ normalTurn)
    val n1 = one(r, "n1")
    assert(n1.getAs[String]("sample_type") == "normal")
    assert(!n1.getAs[Boolean]("kept"))
  }

  test("NULL request_context conversations survive the cardinality-cap join") {
    // Parse's request_context coalesce ends at `tool`, which can be NULL
    // (no URL rule match + null tool). The cap join must be NULL-SAFE:
    // convRouting stays row-identical to convDims on such data instead of
    // silently dropping the conversation (and desyncing the q06 trace
    // counter from the q04/q07 routing counts).
    val nullCtx = graft.model.Turn(
      conv_id = "cnull", turn_idx = 0, role = "user",
      text = "status=200 dur=700ms", tool = null, ts = ts(10))
    val turns = Seq(
      turn("c1", 0, "user", "api-server", durMs = 700, tSecs = 20)
    )
    val enr = Enrich.enriched(turnsDf(turns :+ nullCtx), spark, cfg)
    val dims = Route.convDims(enr)
    val routed = Route.convRouting(enr, cfg)
    assert(dims.count() == routed.count())
    val row = one(routed, "cnull")
    assert(row.getAs[String]("request_context") == null)
    // it routes like any other conversation (slow: 0.7 > 0.5 threshold)
    assert(row.getAs[String]("sample_type") == "slow")
  }

  test("sinks partition routed conversations; counts invariant") {
    val sf = "/root/testdata/sf0.001"
    val turns = graft.sources.Transcripts.fromEvents(spark, sf)
    val r = Route.convRouting(Enrich.enriched(turns, spark, cfg), cfg).cache()
    val total = r.count()
    val byType = r.groupBy("sample_type").count().collect()
      .map(x => Option(x.getString(0)).getOrElse("none") -> x.getLong(1)).toMap
    assert(byType.values.sum == total)
    // kept rows have a sink, evicted/unrouted do not
    assert(r.filter(col("kept") && col("sink").isNull).count() == 0)
    assert(r.filter(!col("kept") && col("sink").isNotNull).count() == 0)
    r.unpersist()
  }
}
