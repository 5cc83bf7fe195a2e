package graft

import org.apache.spark.sql.functions._
import graft.functions.Rules
import graft.functions.Rules.AttributeRule

/** Port of the reference's custom-attribute rule assertions
  * (reference: custom_attribute_test.go:183-241, span_enrichment_test.go).
  */
class RulesSpec extends SparkTestBase {
  import spark.implicits._

  private def eval(
      rules: Seq[AttributeRule],
      rows: Seq[(String, String, String, String, String, String)]
  ): Seq[Option[String]] = {
    // columns: kind, service_key, ns, svc, attr_a, attr_b
    val df = rows.toDF("kind", "service_key", "ns", "svc", "attr_a", "attr_b")
    val out = Rules.compileTarget(
      rules,
      attr = df.col,
      kindCol = col("kind"),
      serviceKeyCol = col("service_key"),
      nsCol = col("ns"),
      svcCol = col("svc")
    )
    df.select(out.as("v")).collect().toSeq.map(r => Option(r.getString(0)))
  }

  test("kind gating: rule fires only for configured span kinds") {
    val rules = Seq(AttributeRule("default", Seq("entry"), Seq("attr_a"), "(.+)", "$1"))
    val got = eval(
      rules,
      Seq(
        ("entry", "ns#svc", "ns", "svc", "value", ""),
        ("exit", "ns#svc", "ns", "svc", "value", "")
      )
    )
    assert(got == Seq(Some("value"), None))
  }

  test("all source attributes required; values joined with ';'") {
    // custom_attribute_test.go: two sources joined with ";", "$1:$2"
    val rules = Seq(
      AttributeRule("default", Seq("entry"), Seq("attr_a", "attr_b"), "(.+);(.+)", "$1:$2")
    )
    val got = eval(
      rules,
      Seq(
        ("entry", "k", "n", "s", "GET", "/users"),
        ("entry", "k", "n", "s", "GET", null) // missing source -> no value
      )
    )
    assert(got == Seq(Some("GET:/users"), None))
  }

  test("service-key fallback chain ns#svc -> ns -> svc -> default") {
    val rules = Seq(
      AttributeRule("ns#svc", Seq("entry"), Seq("attr_a"), "(.+)", "exact-$1"),
      AttributeRule("ns", Seq("entry"), Seq("attr_a"), "(.+)", "ns-$1"),
      AttributeRule("svc", Seq("entry"), Seq("attr_a"), "(.+)", "svc-$1"),
      AttributeRule("default", Seq("entry"), Seq("attr_a"), "(.+)", "def-$1")
    )
    val got = eval(
      rules,
      Seq(
        ("entry", "ns#svc", "ns", "svc", "x", ""), // exact key wins
        ("entry", "ns#other", "ns", "other", "x", ""), // falls to ns
        ("entry", "other#svc", "other", "svc", "x", ""), // falls to svc
        ("entry", "a#b", "a", "b", "x", "") // falls to default
      )
    )
    assert(got == Seq(Some("exact-x"), Some("ns-x"), Some("svc-x"), Some("def-x")))
  }

  test("a matching key that yields empty does NOT fall to the next key, only to default") {
    // span_enrichment.go:199-218: serviceConfig chosen once; empty result
    // falls through to the "default" list, not to cfg[ns]/cfg[svc]
    val rules = Seq(
      AttributeRule("ns#svc", Seq("entry"), Seq("attr_a"), "^match-(.+)$", "$1"),
      AttributeRule("ns", Seq("entry"), Seq("attr_a"), "(.+)", "ns-$1"),
      AttributeRule("default", Seq("entry"), Seq("attr_a"), "(.+)", "def-$1")
    )
    val got = eval(rules, Seq(("entry", "ns#svc", "ns", "svc", "nomatch", "")))
    assert(got == Seq(Some("def-nomatch")))
  }

  test("first non-empty rule wins within a key's list") {
    val rules = Seq(
      AttributeRule("default", Seq("entry"), Seq("attr_a"), "^a-(.+)$", "first-$1"),
      AttributeRule("default", Seq("entry"), Seq("attr_a"), "(.+)", "second-$1")
    )
    val got = eval(
      rules,
      Seq(("entry", "k", "n", "s", "a-hit", ""), ("entry", "k", "n", "s", "other", ""))
    )
    assert(got == Seq(Some("first-hit"), Some("second-other")))
  }

  test("invalid regex fails at rule construction (config validation)") {
    intercept[java.util.regex.PatternSyntaxException] {
      AttributeRule("default", Seq("entry"), Seq("attr_a"), "(unclosed", "$1")
    }
  }

  test("URL request-context rule extracts first two path segments") {
    // span_enrichment_test.go:17: https?://.+?((/[^/?]+){1,2}).*
    val rules = Seq(
      AttributeRule("default", Seq("entry"), Seq("attr_a"), "https?://.+?((/[^/?]+){1,2}).*", "$1")
    )
    val got = eval(
      rules,
      Seq(
        ("entry", "k", "n", "s", "https://some.domain.com/foo/bar/baz?a=b", ""),
        ("entry", "k", "n", "s", "https://some.domain.com/foo", "")
      )
    )
    assert(got == Seq(Some("/foo/bar"), Some("/foo")))
  }
}
