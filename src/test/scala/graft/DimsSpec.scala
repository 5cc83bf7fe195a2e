package graft

import org.apache.spark.sql.functions._
import graft.model.PipelineConfig
import graft.sources.Dims

/** Loadable dimension tables (reference: asserts_client.go:14-17 per-run
  * fetch; thresholds.go:14-111 resolution order). */
class DimsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDims(dir: String): Unit = {
    spark.createDataset(Seq(
      Dims.ServiceDim("web", "edge", "prod", "eu-1")
    )).toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/services.parquet")
    val entity = Dims.entityKey("prod", "edge", "eu-1", "web")
    spark.createDataset(Seq(
      Dims.ThresholdDim(entity, "", 0.8), // entity default
      Dims.ThresholdDim(entity, "/api/call", 0.25) // exact request
    )).toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/thresholds.parquet")
  }

  test("load reads parquet dims; missing file falls back to built-ins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dims").toString
    writeDims(dir)
    val loaded = Dims.load(spark, dir)
    assert(loaded.services == Seq(Dims.ServiceDim("web", "edge", "prod", "eu-1")))
    assert(loaded.thresholds.size == 2)
    // empty dir -> both fall back
    val fallback = Dims.load(spark, java.nio.file.Files.createTempDirectory("graft_nodims").toString)
    assert(fallback.services == Dims.services && fallback.thresholds == Dims.thresholds)
    // oracle VALUES come from the loaded rows (single source of truth)
    assert(loaded.serviceValuesSql.contains("'edge'"))
    assert(loaded.thresholdValuesSql.contains("0.25"))
  }

  test("loaded dims drive enrichment: exact > entity-default > global resolution") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dims2").toString
    writeDims(dir)
    val dims = Dims.load(spark, dir)
    val cfg = PipelineConfig.default.copy(defaultLatencyThresholdSecs = 3.0)
    val turns = turnsDf(Seq(
      turn("c1", 1, "user", "web", 300, url = "https://h/api/call"), // exact 0.25 -> slow
      turn("c2", 1, "user", "web", 300, url = "https://h/other/x"), // entity default 0.8 -> not slow
      turn("c3", 1, "user", "unknown-svc", 300, url = "https://h/other/x") // global 3.0 -> not slow
    ))
    val got = graft.operators.Enrich.enriched(turns, spark, cfg, dims)
      .select("conv_id", "threshold", "is_slow_span", "namespace", "env")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2), r.getString(3), r.getString(4)))).toMap
    assert(got("c1") == ((0.25, true, "edge", "prod")))
    assert(got("c2") == ((0.8, false, "edge", "prod")))
    assert(got("c3") == ((3.0, false, "", "dev")))
  }
}
