package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.functions.Rules
import graft.functions.Rules.AttributeRule
import graft.model.{PipelineConfig, Turn}
import graft.operators.{Enrich, Route}

/** Generative properties (SURVEY §5): the compiled Catalyst expression
  * trees and the routing composition are checked against straightforward
  * sequential reference models over seeded random inputs — the
  * property-based mirror of the reference's unit fixtures
  * (span_enrichment tests, priority_queue_test.go:11-121,
  * sampler_test.go:521-676).
  */
class PropertySpec extends SparkTestBase {

  private def checkProp(prop: Prop, minSuccessful: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withWorkers(1)
      .withInitialSeed(Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  // ---- property 1: rule fold == first-match-wins sequential model ----

  private val regexPool = Seq("(x+)", "([ab]+)", "([0-9]+)", "x(y+)z", "(p.q)", "(;)")
  private val replacementPool = Seq("$1", "R$1R", "lit")
  private val keyPool = Seq("default", "ns1#svcA", "ns1", "svcA", "svcB")
  private val valuePool = Seq("", "xx", "ab1", "xyz", "p;q", "aa;bb", "zzz")

  private val genRule: Gen[AttributeRule] = for {
    key <- Gen.oneOf(keyPool)
    kinds <- Gen.atLeastOne(Seq("entry", "exit"))
    srcs <- Gen.atLeastOne(Seq("a1", "a2"))
    re <- Gen.oneOf(regexPool)
    repl <- Gen.oneOf(replacementPool)
  } yield AttributeRule(key, kinds.toSeq, srcs.toSeq.sorted, re, repl)

  private case class RuleRow(
      span_class: String,
      namespace: String,
      service: String,
      a1: Option[String],
      a2: Option[String]
  ) {
    def serviceKey: String = if (namespace.nonEmpty) s"$namespace#$service" else service
  }

  private val genRuleRow: Gen[RuleRow] = for {
    kind <- Gen.oneOf("entry", "exit", "internal")
    ns <- Gen.oneOf("", "ns1", "ns2")
    svc <- Gen.oneOf("svcA", "svcB")
    a1 <- Gen.option(Gen.oneOf(valuePool))
    a2 <- Gen.option(Gen.oneOf(valuePool))
  } yield RuleRow(kind, ns, svc, a1, a2)

  /** Sequential model of one rule (custom_attribute.go:79-100). */
  private def modelRule(r: AttributeRule, row: RuleRow): Option[String] = {
    if (!r.spanKinds.contains(row.span_class)) return None
    val vals = r.sourceAttrs.map { case "a1" => row.a1; case "a2" => row.a2 }
    if (vals.exists(_.isEmpty)) return None
    val joined = vals.map(_.get).mkString(";")
    val p = java.util.regex.Pattern.compile(r.regex)
    if (!p.matcher(joined).find()) None
    else Option(joined.replaceAll(r.regex, r.replacement)).filter(_.nonEmpty)
  }

  /** Sequential model of the target fold: first configured identity key
    * (ns#svc -> ns -> svc), first non-empty rule result within it, then
    * the "default" list (span_enrichment.go:199-241). */
  private def modelTarget(rules: Seq[AttributeRule], row: RuleRow): Option[String] = {
    val byKey = rules.groupBy(_.serviceKey)
    val specific = byKey.keySet - "default"
    val chainKey = Seq(row.serviceKey, row.namespace, row.service).find(specific.contains)
    val chainRes = chainKey.flatMap(k => byKey(k).view.flatMap(modelRule(_, row)).headOption)
    chainRes.orElse(
      byKey.get("default").flatMap(_.view.flatMap(modelRule(_, row)).headOption)
    )
  }

  test("property: compiled rule fold == first-match-wins sequential model") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(genRule).map(_.take(6)),
      Gen.nonEmptyListOf(genRuleRow).map(_.take(8))
    ) { (rules, rows) =>
      val df = rows.zipWithIndex.map { case (r, i) =>
        (i, r.span_class, r.namespace, r.service, r.serviceKey, r.a1.orNull, r.a2.orNull)
      }.toDF("id", "span_class", "namespace", "service", "service_key", "a1", "a2")
      val compiled = Rules.compileTarget(
        rules, name => col(name), col("span_class"),
        col("service_key"), col("namespace"), col("service"))
      val got = df.select(col("id"), compiled.as("v")).collect()
        .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
      rows.zipWithIndex.forall { case (row, i) => got(i) == modelTarget(rules, row) }
    }
    checkProp(prop, minSuccessful = 25)
  }

  // ---- properties 2+3: routing top-K and sink partition invariant ----

  private val genTurnList: Gen[List[Turn]] = for {
    nConvs <- Gen.choose(1, 12)
    convs <- Gen.sequence[List[List[Turn]], List[Turn]]((1 to nConvs).toList.map { c =>
      for {
        nTurns <- Gen.choose(1, 5)
        turns <- Gen.sequence[List[Turn], Turn]((0 until nTurns).toList.map { i =>
          for {
            role <- Gen.oneOf("user", "assistant", "tool")
            tool <- Gen.oneOf("web", "api-server", "db")
            dur <- Gen.choose(1L, 2000L)
            status <- Gen.oneOf(200, 200, 404, 503)
            path <- Gen.oneOf("/a", "/b", "/c", "/d")
            tMin <- Gen.choose(0, 120)
          } yield turn(s"c$c", i, role, tool, dur, status, s"https://h$path", tMin * 60.0)
        })
      } yield turns
    })
  } yield convs.flatten

  private val routeCfg = PipelineConfig(
    defaultLatencyThresholdSecs = 0.5,
    limitPerService = 2,
    topKPerRequest = 2
  )

  test("property: routing satisfies conv coverage, sink partition, request cap, and top-K == sorted-take-K") {
    val prop = Prop.forAll(genTurnList) { turns =>
      val df = turnsDf(turns)
      val routing = Route.convRouting(Enrich.enriched(df, spark, routeCfg), routeCfg)
      val rows = routing.select(
        "conv_id", "entity_key", "request_context", "sample_type",
        "latency", "kept", "sink", "main_ts", "request_rank"
      ).collect().map { r =>
        (r.getString(0), r.getString(1), r.getString(2), Option(r.getString(3)),
          r.getDouble(4), r.getBoolean(5), Option(r.getString(6)),
          r.getTimestamp(7), r.getInt(8))
      }

      // (a) exactly one routing row per conversation that has a main span
      // anywhere (a non-internal turn: idx 0 = root, user = entry,
      // tool = exit); conversations of only-internal turns are skipped
      val expectConvs = turns.groupBy(_.conv_id).collect {
        case (c, ts) if ts.exists(t => t.turn_idx == 0 || t.role == "user" || t.role == "tool") => c
      }.toSet
      val convCoverage =
        rows.map(_._1).toSet == expectConvs && rows.length == expectConvs.size

      // (b) sink partition: kept <=> sink set; sink matches sample_type;
      // |errors| + |slow| + |normal| + |unrouted| == |convs|
      val sinkPartition = rows.forall { case (_, _, _, st, _, kept, sink, _, _) =>
        if (kept) sink.contains(st.get match {
          case "error" => "errors"
          case "slow" => "slow"
          case "normal" => "normal"
        })
        else sink.isEmpty
      } && {
        val bySink = rows.flatMap(_._7).groupBy(identity).view.mapValues(_.length).toMap
        bySink.values.sum + rows.count(_._7.isEmpty) == rows.length
      }

      // (c) request-cardinality cap: kept conversations only route to the
      // first `limitPerService` contexts per entity in first-seen order
      val rankOk = rows.filter(_._6).forall(_._9 <= routeCfg.limitPerService)
      val capOk = {
        val firstSeen = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._8).min).toMap
        rows.groupBy(_._2).forall { case (_, entityRows) =>
          val admitted = entityRows.map(r => (r._2, r._3)).distinct
            .sortBy { case (e, ctx) => (firstSeen((e, ctx)), ctx) }
            .take(routeCfg.limitPerService)
            .map(_._2).toSet
          entityRows.filter(_._6).forall(r => admitted.contains(r._3))
        }
      }

      // (d) top-K == sorted-take-K per (entity, request, queue): the error
      // queue and the shared slow queue (slow + normal) each keep the K
      // highest-latency conversations (priority_queue.go:38-96)
      val topKOk = rows
        .flatMap { case t @ (_, e, ctx, st, _, _, _, _, _) =>
          st.collect {
            case "error" => ((e, ctx, "error"), t)
            case "slow" | "normal" => ((e, ctx, "slow"), t)
          }
        }
        .groupBy(_._1)
        .forall { case (_, members) =>
          val expectKept = members.map(_._2)
            .sortBy { case (c, _, _, _, lat, _, _, _, _) => (-lat, c) }
            .take(routeCfg.topKPerRequest)
            .map(_._1).toSet
          members.map(_._2).forall { case (c, _, _, _, _, kept, _, _, _) =>
            kept == expectKept.contains(c)
          }
        }

      convCoverage && sinkPartition && rankOk && capOk && topKOk
    }
    checkProp(prop, minSuccessful = 10)
  }
}
