package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small lookup dimensions (broadcast-join sides): the service/entity dim
  * and the latency-threshold dim — the Spark re-expression of the
  * reference's REST-fetched config and thresholds
  * (reference: assertsprocessor/asserts_client.go:14-17,
  * thresholds.go:12-21). In a real deployment these are small Iceberg/JSON
  * dimension tables read once at job start; here they are deterministic
  * constants shared between the Spark plan and the DuckDB oracle (the
  * oracle VALUES SQL is generated from the same data, so they cannot
  * drift).
  */
object Dims {

  final case class ServiceDim(service: String, namespace: String, env: String, site: String)

  /** entity_key uses the canonical sorted-scope form
    * `{env=…, namespace=…, site=…}#Service#name` (keys.go:13-30). */
  final case class ThresholdDim(entity_key: String, request_context: String, upper_threshold: Double)

  val services: Seq[ServiceDim] = Seq(
    ServiceDim("auth", "frontend", "dev", "us-west-2"),
    ServiceDim("web", "frontend", "dev", "us-west-2"),
    ServiceDim("catalog", "backend", "dev", "us-west-2"),
    ServiceDim("payments", "backend", "dev", "us-west-2"),
    ServiceDim("api-server", "backend", "dev", "us-west-2")
  )

  def entityKey(env: String, namespace: String, site: String, service: String): String =
    s"{env=$env, namespace=$namespace, site=$site}#Service#$service"

  /** Threshold rows exercising all three resolution levels
    * (thresholds.go:34-48): exact request, per-entity default (request
    * context ""), and — for everything else — the global config default. */
  val thresholds: Seq[ThresholdDim] = Seq(
    ThresholdDim(entityKey("dev", "backend", "us-west-2", "payments"), "", 0.9),
    ThresholdDim(entityKey("dev", "backend", "us-west-2", "payments"), "/purchase/v3", 0.3),
    ThresholdDim(entityKey("dev", "backend", "us-west-2", "api-server"), "/error/v2", 0.2)
  )

  /** A loaded pair of dimension tables. Dims are config-sized by contract
    * (broadcast-join sides), so the driver-side Seq representation also
    * feeds the oracle VALUES SQL — one source of truth per load. */
  final case class DimTables(services: Seq[ServiceDim], thresholds: Seq[ThresholdDim]) {
    def serviceDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      spark.createDataset(services).toDF()
    }
    def thresholdDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      spark.createDataset(thresholds).toDF()
    }
    /** DuckDB VALUES clause for the service dim. */
    def serviceValuesSql: String =
      services
        .map(s => s"(${sqlStr(s.service)}, ${sqlStr(s.namespace)}, ${sqlStr(s.env)}, ${sqlStr(s.site)})")
        .mkString("(SELECT * FROM (VALUES ", ", ", ") AS t(service, namespace, env, site))")
    /** DuckDB VALUES clause for the threshold dim. */
    def thresholdValuesSql: String =
      thresholds
        .map(t => s"(${sqlStr(t.entity_key)}, ${sqlStr(t.request_context)}, CAST(${t.upper_threshold} AS DOUBLE))")
        .mkString("(SELECT * FROM (VALUES ", ", ", ") AS t(entity_key, request_context, upper_threshold))")
  }

  /** Built-in deterministic dims — the no-`--dims` fallback. */
  val default: DimTables = DimTables(services, thresholds)

  /** Load dims from `<dir>/services.parquet` and `<dir>/thresholds.parquet`
    * — the batch analogue of the reference's per-run REST fetch
    * (asserts_client.go:14-17, thresholds.go:57-122). A missing file
    * falls back to the built-in table (startup-merge semantics: remote
    * wins only when present, factory.go:69-82). Schemas:
    * services(service, namespace, env, site),
    * thresholds(entity_key, request_context, upper_threshold). */
  def load(spark: SparkSession, dir: String): DimTables = {
    import spark.implicits._
    def tryRead[T: org.apache.spark.sql.Encoder](path: String, cols: Seq[String]): Option[Seq[T]] =
      if (new java.io.File(path).exists())
        Some(spark.read.parquet(path).select(cols.head, cols.tail: _*).as[T].collect().toSeq)
      else None
    DimTables(
      tryRead[ServiceDim](s"$dir/services.parquet", Seq("service", "namespace", "env", "site"))
        .getOrElse(services),
      tryRead[ThresholdDim](s"$dir/thresholds.parquet", Seq("entity_key", "request_context", "upper_threshold"))
        .getOrElse(thresholds)
    )
  }

  def serviceDf(spark: SparkSession): DataFrame = default.serviceDf(spark)

  def thresholdDf(spark: SparkSession): DataFrame = default.thresholdDf(spark)

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB VALUES clause for the built-in service dim. */
  def serviceValuesSql: String = default.serviceValuesSql

  /** DuckDB VALUES clause for the built-in threshold dim. */
  def thresholdValuesSql: String = default.thresholdValuesSql
}
