package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Rules
import graft.functions.Rules.AttributeRule

/** Parse stage: vectorized regex extraction of tool-call spans, latencies
  * and error signatures from `text`, plus span classification — pure
  * Catalyst expressions (whole-stage-codegen'd), no UDFs.
  *
  * Reference analogues:
  *   - span classification root/entry/exit/internal from kind + parent
  *     (assertsprocessor/utils.go:128-138, utils.go:79-87)
  *   - request type inbound/outbound/internal (span_enrichment.go:243-253)
  *   - regex capture rules with service-key fallback
  *     (custom_attribute.go:79-100, span_enrichment.go:194-241)
  *   - request-context default to span name (span_enrichment.go:225-228)
  *   - latency seconds from span timestamps (utils.go:27-29) — here the
  *     `dur=NNNms` signal embedded in the turn text
  */
object Parse {

  /** Default URL request-context rule from the reference sample config
    * (span_enrichment_test.go:17: `https?://.+?((/[^/?]+){1,2}).*`). */
  val UrlContextRegex = "https?://.+?((/[^/?]+){1,2}).*"

  /** Default rule table: extract the request context from the URL in the
    * turn text for entry spans of any service ("default" key); error type
    * from the status code. Mirrors sample-collector-config.yaml's
    * request_context_regex + error-type rules.
    */
  val defaultRules: Rules.RuleTable = Map(
    "request_context" -> Seq(
      AttributeRule(
        serviceKey = "default",
        spanKinds = Seq("root", "entry", "exit"),
        sourceAttrs = Seq("url"),
        regex = UrlContextRegex,
        replacement = "$1"
      )
    ),
    "error_type" -> Seq(
      AttributeRule(
        serviceKey = "default",
        spanKinds = Seq("root", "entry", "exit"),
        sourceAttrs = Seq("status_str"),
        regex = "^(4..)$",
        replacement = "client_errors"
      ),
      AttributeRule(
        serviceKey = "default",
        spanKinds = Seq("root", "entry", "exit"),
        sourceAttrs = Seq("status_str"),
        regex = "^(5..)$",
        replacement = "server_errors"
      )
    )
  )

  /** Classify turns into root/entry/exit/internal: the first turn of a
    * conversation is the root (parent-less span analogue); `user` turns are
    * entry spans (Server/Consumer), `tool` turns exit spans
    * (Client/Producer), everything else internal.
    */
  def withSpanClass(turns: DataFrame): DataFrame =
    turns.withColumn(
      "span_class",
      when(col("turn_idx") === 0, "root")
        .when(col("role") === "user", "entry")
        .when(col("role") === "tool", "exit")
        .otherwise("internal")
    )

  /** Full parse stage over the raw transcript columns. */
  def parsed(turns: DataFrame, rules: Rules.RuleTable = defaultRules): DataFrame = {
    // expects service / namespace / service_key already attached (see
    // Enrich.withServiceDim — the resource-attribute analogue)
    val classified = withSpanClass(turns)
      .withColumn("url", nullif(regexp_extract(col("text"), "(https?://[^ ]+)", 1), lit("")))
      // nullif before cast: regexp_extract yields "" on no match, and a
      // bare ANSI cast of "" would FAIL THE JOB on the first malformed
      // row — null is the correct parse result for an absent signal
      .withColumn("status_code", nullif(regexp_extract(col("text"), "status=([0-9]+)", 1), lit("")).cast("int"))
      .withColumn("status_str", nullif(regexp_extract(col("text"), "status=([0-9]+)", 1), lit("")))
      .withColumn("call_service", nullif(regexp_extract(col("text"), "call=([A-Za-z0-9_-]+)\\.", 1), lit("")))
      .withColumn("call_method", nullif(regexp_extract(col("text"), "call=[A-Za-z0-9_-]+\\.([A-Za-z0-9_]+)", 1), lit("")))
      .withColumn("dur_ms", nullif(regexp_extract(col("text"), "dur=([0-9]+)ms", 1), lit("")).cast("long"))
      .withColumn("latency_secs", col("dur_ms").cast("double") / 1000.0)
      .withColumn(
        "request_type",
        when(col("span_class") === "exit", "outbound")
          .when(col("span_class").isin("root", "entry"), "inbound")
          .otherwise("internal")
      )

    val compiled = Rules.compile(
      rules,
      attr = classified.col,
      kindCol = col("span_class"),
      serviceKeyCol = col("service_key"),
      nsCol = col("namespace"),
      svcCol = col("service")
    )
    val withAttrs = compiled.toSeq.sortBy(_._1).foldLeft(classified) {
      case (df, (target, expr)) => df.withColumn(target, expr)
    }
    // request-context default: span name analogue = the turn's tool
    // (span_enrichment.go:225-228)
    withAttrs
      .withColumn("request_context", coalesce(col("request_context"), col("tool")))
      .drop("status_str")
  }
}
