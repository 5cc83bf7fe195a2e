package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Config-driven regex attribute-extraction rules, compiled once (driver
  * side) into a single Catalyst expression tree per target attribute —
  * the Spark-first re-expression of the reference's span-enrichment rule
  * machinery (reference: assertsprocessor/custom_attribute.go:79-100,
  * span_enrichment.go:194-241, config validation config.go:41-77).
  *
  * Semantics preserved:
  *   - a rule fires only when the span kind is in `spanKinds`
  *     (default ["Server"], custom_attribute.go:53-58) and ALL source
  *     attributes are present (custom_attribute.go:83-90);
  *   - multiple source values are joined with ";" before matching
  *     (custom_attribute.go:91);
  *   - on regex match the replacement (default "$1") is applied via
  *     replace-all (custom_attribute.go:92-99);
  *   - per target attribute, the rule list is chosen by service-key
  *     fallback `ns#svc` -> `ns` -> `svc` (span_enrichment.go:231-241),
  *     first non-empty rule result wins, then the "default" list
  *     (span_enrichment.go:199-218);
  *   - the target attribute is only set when the result is non-empty.
  *
  * Invalid regexes fail at compile time on the driver — the analogue of
  * the reference's fail-fast `Config.Validate()`.
  */
object Rules {

  final case class AttributeRule(
      /** config key this rule is registered under: "ns#svc", "ns", "svc",
        * or "default" */
      serviceKey: String,
      spanKinds: Seq[String] = Seq("entry"), // reference default ["Server"]
      sourceAttrs: Seq[String],
      regex: String,
      replacement: String = "$1"
  ) {
    require(sourceAttrs.nonEmpty, "rule needs at least one source attribute")
    // fail fast on invalid pattern, mirroring Config.Validate()
    java.util.regex.Pattern.compile(regex)
  }

  /** target attribute -> ordered rule list */
  type RuleTable = Map[String, Seq[AttributeRule]]

  /** Compile one rule into a Column producing the extracted value or NULL.
    * `attr` resolves a source-attribute name to its Column; `kindCol` is
    * the span-kind analogue column (our `span_class`).
    */
  private def compileRule(
      rule: AttributeRule,
      attr: String => Column,
      kindCol: Column
  ): Column = {
    val sources = rule.sourceAttrs.map(attr)
    val allPresent = sources.map(_.isNotNull).reduce(_ && _)
    val joined = concat_ws(";", sources: _*)
    val kindOk = kindCol.isin(rule.spanKinds: _*)
    val matched = joined.rlike(rule.regex)
    val value = regexp_replace(joined, rule.regex, rule.replacement)
    // NULL unless kind-gated, all sources present, regex matches, non-empty
    nullif(when(kindOk && allPresent && matched, value), lit(""))
  }

  private def firstNonEmpty(cols: Seq[Column]): Column =
    if (cols.isEmpty) lit(null).cast("string") else coalesce(cols: _*)

  /** Compile the rules registered for one target attribute into a single
    * Column. `serviceKeyCol`/`nsCol`/`svcCol` carry the row's service
    * identity for the fallback chain.
    */
  def compileTarget(
      rules: Seq[AttributeRule],
      attr: String => Column,
      kindCol: Column,
      serviceKeyCol: Column,
      nsCol: Column,
      svcCol: Column
  ): Column = {
    val byKey = rules.groupBy(_.serviceKey)
    val defaultResult =
      firstNonEmpty(byKey.getOrElse("default", Nil).map(compileRule(_, attr, kindCol)))
    val specificKeys = (byKey.keySet - "default").toSeq.sorted
    def resultFor(key: String): Column =
      firstNonEmpty(byKey(key).map(compileRule(_, attr, kindCol)))
    // "first config key that exists" chain: ns#svc -> ns -> svc. A key list
    // that exists but yields empty does NOT fall through to the next key —
    // only to "default" (span_enrichment.go:199-218).
    val chain: Column = {
      val whens = Seq(serviceKeyCol, nsCol, svcCol).map { idCol =>
        specificKeys.foldLeft(lit(null).cast("string")) { (acc, key) =>
          when(idCol === lit(key), resultFor(key)).otherwise(acc)
        } -> idCol
      }
      // pick the first identity column that HAS config, then its result
      whens.foldRight(lit(null).cast("string")) { case ((res, idCol), acc) =>
        when(idCol.isin(specificKeys: _*), res).otherwise(acc)
      }
    }
    coalesce(chain, defaultResult)
  }

  /** Compile a full rule table: target attribute name -> value Column. */
  def compile(
      table: RuleTable,
      attr: String => Column,
      kindCol: Column,
      serviceKeyCol: Column,
      nsCol: Column,
      svcCol: Column
  ): Map[String, Column] =
    table.map { case (target, rules) =>
      target -> compileTarget(rules, attr, kindCol, serviceKeyCol, nsCol, svcCol)
    }
}
