package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.PipelineConfig
import graft.sources.Dims

/** Enrich stage: broadcast-hash-join the parsed turns against the small
  * service/threshold dimensions and derive entity keys, resolved latency
  * thresholds, and error/slow flags.
  *
  * Reference analogues:
  *   - entity key canonical string with sorted scope keys
  *     (assertsprocessor/keys.go:13-30, utils.go:17-25)
  *   - threshold resolution exact request -> per-entity default ("") ->
  *     global default (thresholds.go:34-48)
  *   - client-error ignore predicate (sampler.go:195-198)
  *   - slow predicate latency > threshold (sampler.go:200-209)
  *
  * Scale notes: both joins are `broadcast()` (dims are config-sized);
  * everything else is a codegen'd projection — no shuffle in this stage.
  */
object Enrich {

  /** Join the service dim to attach (namespace, env, site) and build the
    * service/entity keys. Left join: unknown services keep namespace "" and
    * fall back to the svc-only service key (utils.go:9-15).
    */
  def withServiceDim(
      turns: DataFrame,
      spark: SparkSession,
      dims: Dims.DimTables = Dims.default
  ): DataFrame = {
    val dim = broadcast(dims.serviceDf(spark))
    turns
      .withColumn("service", col("tool"))
      .join(dim, Seq("service"), "left")
      .withColumn("namespace", coalesce(col("namespace"), lit("")))
      .withColumn("env", coalesce(col("env"), lit("dev")))
      .withColumn("site", coalesce(col("site"), lit("us-west-2")))
      .withColumn(
        "service_key",
        when(col("namespace") =!= "", concat(col("namespace"), lit("#"), col("service")))
          .otherwise(col("service"))
      )
      .withColumn(
        "entity_key",
        concat(
          lit("{env="), col("env"),
          lit(", namespace="), col("namespace"),
          lit(", site="), col("site"),
          lit("}#Service#"), col("service")
        )
      )
  }

  /** Resolve the per-span latency threshold: exact (entity, request) match,
    * else the entity default row (request_context = ""), else the global
    * config default. Two broadcast left-joins + coalesce.
    */
  def withThreshold(
      df: DataFrame,
      spark: SparkSession,
      cfg: PipelineConfig,
      dims: Dims.DimTables = Dims.default
  ): DataFrame = {
    val th = dims.thresholdDf(spark)
    val exact = broadcast(
      th.filter(col("request_context") =!= "")
        .withColumnRenamed("upper_threshold", "threshold_exact")
    )
    val entityDefault = broadcast(
      th.filter(col("request_context") === "")
        .select(col("entity_key"), col("upper_threshold").as("threshold_entity"))
    )
    df.join(exact, Seq("entity_key", "request_context"), "left")
      .join(entityDefault, Seq("entity_key"), "left")
      .withColumn(
        "threshold",
        coalesce(col("threshold_exact"), col("threshold_entity"), lit(cfg.defaultLatencyThresholdSecs))
      )
      .drop("threshold_exact", "threshold_entity")
  }

  /** Error / slow span flags. `is_error` mirrors spanHasError (utils.go:31)
    * — in the transcript model an extracted 4xx/5xx signature;
    * `error_routable` additionally applies the client-error ignore rule;
    * `is_slow_span` the threshold predicate on the span's own latency and
    * request context (sampler.go:200-209).
    */
  def withFlags(df: DataFrame, cfg: PipelineConfig): DataFrame =
    df.withColumn("is_error", col("error_type").isNotNull)
      .withColumn(
        "error_routable",
        col("is_error") &&
          !(lit(cfg.ignoreClientErrors) && col("error_type") === "client_errors")
      )
      .withColumn("is_slow_span", col("latency_secs") > col("threshold"))

  /** Full parse+enrich stage over raw transcript turns: service-dim join
    * (resource attributes) -> regex parse/rules -> thresholds -> flags.
    */
  def enriched(
      turns: DataFrame,
      spark: SparkSession,
      cfg: PipelineConfig = PipelineConfig.default,
      dims: Dims.DimTables = Dims.default
  ): DataFrame = {
    val parsed = Parse.parsed(withServiceDim(turns, spark, dims))
    withFlags(withThreshold(parsed, spark, cfg, dims), cfg)
  }
}
