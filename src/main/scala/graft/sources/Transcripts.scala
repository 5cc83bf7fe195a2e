package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The transcript source table: multi-turn conversation / agent transcripts
  * with columns (conv_id string, turn_idx int, role string, text string,
  * tool string, ts timestamp) — the Spark analogue of the reference's OTLP
  * span batches (reference: assertsprocessor/processor.go:52-76).
  *
  * Because the driver's correctness oracle (DuckDB) runs over the SAME
  * parquet tables as our queries, the transcript table is *derived
  * deterministically* from the `events` parquet with arithmetic that both
  * engines evaluate identically (integer math, string concat of ints,
  * regexp on digits). `duckDbCte` is the byte-for-byte-equivalent DuckDB SQL
  * of `fromEvents`, used as the CTE prefix in every oracle query.
  *
  * The generated `text` embeds the signals the reference's enrichment rules
  * extract from span attributes (reference: span_enrichment_test.go:17-37):
  *   - a URL whose first 1-2 path segments form the request context,
  *   - `status=NNN` where 4.. => client_errors, 5.. => server_errors,
  *   - `call=<service>.<method>` tool-call marker,
  *   - `dur=NNNms` span latency signal.
  */
object Transcripts {

  /** Deterministic events -> transcripts mapping (pure Catalyst, no UDF).
    * One event row = one turn; conv = (user, utc-day); all derived values
    * are functions of (user_id, event_id, ts, event_type, k) where k is the
    * integer in `props`.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    deriveTurns(spark.read.parquet(s"$sfDir/events.parquet"))

  /** service.name analogue per event type (utils.go:42-53). */
  def svcOf(eventType: Column): Column =
    when(eventType === "signup", "auth")
      .when(eventType === "view", "catalog")
      .when(eventType === "click", "web")
      .when(eventType === "purchase", "payments")
      .otherwise("api-server")

  def statusOf(eventType: Column, k: Column): Column =
    when(
      eventType === "error",
      when(k % 2 === 0, lit(500) + k % 20).otherwise(lit(400) + k % 20)
    ).otherwise(lit(200))

  def roleOf(eventType: Column): Column =
    when(eventType.isin("signup", "view"), "user")
      .when(eventType === "click", "assistant")
      .otherwise("tool")

  def textOf(svc: Column, eventType: Column, k: Column, status: Column): Column =
    concat(
      lit("call="), svc, lit(".m"), (k % 5).cast("string"),
      lit(" url=https://svc.example.com/"), eventType,
      lit("/v"), (k % 10).cast("string"),
      lit("/tail?q="), k.cast("string"),
      lit(" status="), status.cast("string"),
      lit(" dur="), (k * 10).cast("string"), lit("ms")
    )

  def deriveTurns(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = nullif(regexp_extract(col("props"), "([0-9]+)", 1), lit("")).cast("int")
    // events.ts is parquet TIMESTAMP_NTZ; session TZ is UTC so the cast is
    // wall-clock-identical and matches DuckDB's naive epoch_us
    val day = expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    val withK = events
      .withColumn("k", k)
      .withColumn("day", day)
      .withColumn("svc", svcOf(col("event_type")))
      .withColumn("status", statusOf(col("event_type"), col("k")))
    val convWindow =
      Window.partitionBy(col("user_id"), col("day")).orderBy(col("ts"), col("event_id"))
    withK
      .withColumn(
        "conv_id",
        concat(lit("c"), col("user_id").cast("string"), lit("d"), col("day").cast("string"))
      )
      .withColumn("turn_idx", (row_number().over(convWindow) - 1).cast("int"))
      .withColumn("role", roleOf(col("event_type")))
      .withColumn("text", textOf(col("svc"), col("event_type"), col("k"), col("status")))
      .select(
        col("conv_id"),
        col("turn_idx"),
        col("role"),
        col("text"),
        col("svc").as("tool"),
        col("ts")
      )
  }

  /** DuckDB CTE producing the identical `transcripts` relation from the
    * `events` table registered by the driver. Keep in lockstep with
    * [[deriveTurns]] — every expression here must evaluate identically in
    * DuckDB and Spark (integer division via `//`, int->varchar casts,
    * row_number ties broken by unique event_id).
    */
  val duckDbCte: String =
    """WITH ev AS (
      |  SELECT *,
      |    CAST(NULLIF(regexp_extract(props, '[0-9]+'), '') AS INT) AS k,
      |    epoch_us(ts) // 86400000000 AS day,
      |    CASE event_type WHEN 'signup' THEN 'auth' WHEN 'view' THEN 'catalog'
      |      WHEN 'click' THEN 'web' WHEN 'purchase' THEN 'payments'
      |      ELSE 'api-server' END AS svc,
      |    CASE WHEN event_type = 'error' THEN
      |      CASE WHEN k % 2 = 0 THEN 500 + k % 20 ELSE 400 + k % 20 END
      |    ELSE 200 END AS status
      |  FROM events
      |),
      |transcripts AS (
      |  SELECT
      |    'c' || CAST(user_id AS VARCHAR) || 'd' || CAST(day AS VARCHAR) AS conv_id,
      |    CAST(row_number() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |    CASE WHEN event_type IN ('signup','view') THEN 'user'
      |      WHEN event_type = 'click' THEN 'assistant' ELSE 'tool' END AS role,
      |    'call=' || svc || '.m' || CAST(k % 5 AS VARCHAR)
      |      || ' url=https://svc.example.com/' || event_type
      |      || '/v' || CAST(k % 10 AS VARCHAR)
      |      || '/tail?q=' || CAST(k AS VARCHAR)
      |      || ' status=' || CAST(status AS VARCHAR)
      |      || ' dur=' || CAST(k * 10 AS VARCHAR) || 'ms' AS text,
      |    svc AS tool,
      |    ts
      |  FROM ev
      |)""".stripMargin

  /** Prefix an oracle query body with the transcripts CTE. The body must
    * start with SELECT and may reference `transcripts`.
    */
  def oracle(body: String): String = duckDbCte + "\n" + body
}
