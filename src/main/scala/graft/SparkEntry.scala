package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.PipelineConfig
import graft.operators.{Aggregates, Enrich, Parse, Route}
import graft.sources.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and reads only the driver-generated
  * parquet under sfDir; the transcript table is derived deterministically
  * from `events` (see [[graft.sources.Transcripts]]) so the DuckDB oracle
  * can reproduce it from the same parquet.
  */
object SparkEntry {

  private val cfg = PipelineConfig.default

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_routing")(spark, "/root/testdata/sf0.001")

  private def transcripts(spark: SparkSession, dir: String): DataFrame =
    Transcripts.fromEvents(spark, dir)

  private def enriched(spark: SparkSession, dir: String): DataFrame =
    Enrich.enriched(transcripts(spark, dir), spark, cfg)

  private def routing(spark: SparkSession, dir: String): DataFrame =
    Route.convRouting(enriched(spark, dir), cfg)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 source + per-turn text equality under stable (conv_id, turn_idx)
    // ordering (utils.go:109-126 re-serialization invariant)
    "q01_transcripts" -> ((s, dir) =>
      transcripts(s, dir).orderBy("conv_id", "turn_idx")),
    // P2-P11 parse scalar stage (regex rule fold, classification)
    "q02_parse" -> ((s, dir) =>
      Parse
        .parsed(Enrich.withServiceDim(transcripts(s, dir), s))
        .select(
          "conv_id", "turn_idx", "span_class", "request_type", "status_code",
          "error_type", "request_context", "call_service", "call_method",
          "dur_ms", "latency_secs"
        )
        .orderBy("conv_id", "turn_idx")),
    // J1/J2 broadcast enrichment: entity keys, threshold resolution, flags
    "q03_enrich" -> ((s, dir) =>
      enriched(s, dir)
        .select(
          "conv_id", "turn_idx", "service_key", "entity_key", "threshold",
          "is_error", "error_routable", "is_slow_span"
        )
        .orderBy("conv_id", "turn_idx")),
    // R1/R2/T1/T2/G6 conversation routing, sampling, caps, top-K
    "q04_routing" -> ((s, dir) =>
      routing(s, dir)
        .select(
          col("conv_id"), col("entity_key"), col("request_context"),
          col("sample_type"), col("latency"), col("n_turns"),
          col("request_rank").cast("int").as("request_rank"),
          col("queue_rn").cast("int").as("queue_rn"),
          col("kept"), col("sink")
        )
        .orderBy("conv_id")),
    // S3/S4/T3 sink fan-out rows with stable ordering + text equality
    "q05_sink_rows" -> ((s, dir) =>
      Route
        .routedTurns(transcripts(s, dir), routing(s, dir))
        .select("conv_id", "turn_idx", "role", "text", "tool", "sink", "sample_type")
        .orderBy("sink", "conv_id", "turn_idx")),
    // G4 trace counters
    "q06_trace_counts" -> ((s, dir) =>
      Aggregates.traceCounts(routing(s, dir)).orderBy("env", "site")),
    "q07_sampled_counts" -> ((s, dir) =>
      Aggregates
        .sampledTraceCounts(routing(s, dir))
        .orderBy("env", "site", "sample_type")),
    "q08_span_counts" -> ((s, dir) =>
      Aggregates
        .spanCounts(enriched(s, dir))
        .orderBy("env", "site", "namespace", "service")),
    // G5 RED rollups per tumbling window
    "q09_red" -> ((s, dir) =>
      Aggregates
        .redRollup(enriched(s, dir))
        .orderBy("win_start_us", "service", "request_context")),
    // G5 latency histogram buckets (cumulative, prometheus-style)
    "q10_histogram" -> ((s, dir) =>
      Aggregates
        .latencyHistogram(enriched(s, dir), cfg)
        .orderBy("service", "le"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_transcripts" -> Transcripts.oracle(
      "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts ORDER BY conv_id, turn_idx"
    ),
    "q02_parse" -> OracleSql.parsedQuery(
      """SELECT conv_id, turn_idx, span_class, request_type, status_code, error_type,
        |  request_context, call_service, call_method, dur_ms, latency_secs
        |FROM parsed2 ORDER BY conv_id, turn_idx""".stripMargin
    ),
    "q03_enrich" -> OracleSql.enrichedQuery(
      """SELECT conv_id, turn_idx, service_key, entity_key, threshold,
        |  is_error, error_routable, is_slow_span
        |FROM enr ORDER BY conv_id, turn_idx""".stripMargin
    ),
    "q04_routing" -> OracleSql.routingQuery(
      """SELECT conv_id, entity_key, request_context, sample_type, latency, n_turns,
        |  CAST(request_rank AS INT) AS request_rank,
        |  CAST(queue_rn AS INT) AS queue_rn, kept, sink
        |FROM routing ORDER BY conv_id""".stripMargin
    ),
    "q05_sink_rows" -> OracleSql.routingQuery(
      """SELECT t.conv_id, t.turn_idx, t.role, t.text, t.tool, r.sink, r.sample_type
        |FROM transcripts t JOIN routing r ON t.conv_id = r.conv_id
        |WHERE r.kept ORDER BY r.sink, t.conv_id, t.turn_idx""".stripMargin
    ),
    "q06_trace_counts" -> OracleSql.routingQuery(
      """SELECT env, site, CAST(count(*) AS BIGINT) AS trace_count
        |FROM routing GROUP BY env, site ORDER BY env, site""".stripMargin
    ),
    "q07_sampled_counts" -> OracleSql.routingQuery(
      """SELECT env, site, sample_type, CAST(count(*) AS BIGINT) AS sampled_count
        |FROM routing WHERE kept GROUP BY env, site, sample_type
        |ORDER BY env, site, sample_type""".stripMargin
    ),
    "q08_span_counts" -> OracleSql.enrichedQuery(
      """SELECT env, site, namespace, service, CAST(count(*) AS BIGINT) AS span_count
        |FROM enr WHERE span_class <> 'internal'
        |GROUP BY env, site, namespace, service
        |ORDER BY env, site, namespace, service""".stripMargin
    ),
    "q09_red" -> OracleSql.enrichedQuery(
      s"""SELECT (epoch_us(ts) // ${5L * 60L * 1000000L}) * ${5L * 60L * 1000000L} AS win_start_us,
         |  service, request_context,
         |  CAST(count(*) AS BIGINT) AS requests,
         |  CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS errors,
         |  CAST(sum(dur_ms) AS DOUBLE) / 1000.0 AS duration_sum_secs,
         |  max(latency_secs) AS duration_max_secs
         |FROM enr WHERE span_class <> 'internal'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    ),
    "q10_histogram" -> OracleSql.enrichedQuery {
      val buckets = cfg.histogramBuckets
      val leCase = buckets
        .map(b => s"WHEN latency_secs <= $b THEN CAST($b AS DOUBLE)")
        .mkString("CASE ", " ", " ELSE 'infinity'::DOUBLE END")
      s"""SELECT service, le, bucket_count,
         |  CAST(sum(bucket_count) OVER (PARTITION BY service ORDER BY le) AS BIGINT) AS cumulative_count
         |FROM (
         |  SELECT service, $leCase AS le, CAST(count(*) AS BIGINT) AS bucket_count
         |  FROM enr WHERE span_class <> 'internal' GROUP BY 1, 2
         |) ORDER BY service, le""".stripMargin
    }
  )
}
