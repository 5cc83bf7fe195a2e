package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Transcripts
import graft.operators.Parse

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and reads only the driver-generated
  * parquet under sfDir; the transcript table is derived deterministically
  * from `events` (see [[graft.sources.Transcripts]]) so the DuckDB oracle
  * can reproduce it from the same parquet.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_parse")(spark, "/root/testdata/sf0.001")

  private def transcripts(spark: SparkSession, dir: String): DataFrame =
    Transcripts.fromEvents(spark, dir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 source + per-turn text equality under stable (conv_id, turn_idx)
    // ordering (utils.go:109-126 re-serialization invariant)
    "q01_transcripts" -> ((s, dir) =>
      transcripts(s, dir).orderBy("conv_id", "turn_idx")),
    // P2-P9 parse/enrich scalar stage
    "q02_parse" -> ((s, dir) =>
      Parse
        .parsed(transcripts(s, dir))
        .select(
          "conv_id", "turn_idx", "span_class", "request_type", "status_code",
          "error_type", "request_context", "call_service", "call_method",
          "dur_ms", "latency_secs"
        )
        .orderBy("conv_id", "turn_idx"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_transcripts" -> Transcripts.oracle(
      "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts ORDER BY conv_id, turn_idx"
    ),
    "q02_parse" -> Transcripts.oracle(
      """SELECT conv_id, turn_idx, span_class, request_type, status_code,
        |  CASE WHEN span_class IN ('root','entry','exit') THEN
        |    CASE WHEN status_code BETWEEN 400 AND 499 THEN 'client_errors'
        |         WHEN status_code BETWEEN 500 AND 599 THEN 'server_errors'
        |         ELSE NULL END
        |  ELSE NULL END AS error_type,
        |  CASE WHEN span_class IN ('root','entry','exit') AND url IS NOT NULL
        |       THEN regexp_replace(url, 'https?://.+?((/[^/?]+){1,2}).*', '\1')
        |       ELSE tool END AS request_context,
        |  call_service, call_method, dur_ms, CAST(dur_ms AS DOUBLE) / 1000.0 AS latency_secs
        |FROM (
        |  SELECT *,
        |    CASE WHEN turn_idx = 0 THEN 'root' WHEN role = 'user' THEN 'entry'
        |         WHEN role = 'tool' THEN 'exit' ELSE 'internal' END AS span_class,
        |    CASE WHEN turn_idx = 0 OR role = 'user' THEN 'inbound'
        |         WHEN role = 'tool' THEN 'outbound' ELSE 'internal' END AS request_type,
        |    CAST(regexp_extract(text, 'status=([0-9]+)', 1) AS INT) AS status_code,
        |    NULLIF(regexp_extract(text, '(https?://[^ ]+)', 1), '') AS url,
        |    NULLIF(regexp_extract(text, 'call=([A-Za-z0-9_-]+)\.', 1), '') AS call_service,
        |    NULLIF(regexp_extract(text, 'call=[A-Za-z0-9_-]+\.([A-Za-z0-9_]+)', 1), '') AS call_method,
        |    CAST(regexp_extract(text, 'dur=([0-9]+)ms', 1) AS BIGINT) AS dur_ms
        |  FROM transcripts
        |) ORDER BY conv_id, turn_idx""".stripMargin
    )
  )
}
