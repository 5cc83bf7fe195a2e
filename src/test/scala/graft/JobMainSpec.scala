package graft

/** End-to-end CLI driver: args -> config/dims loading -> pipeline ->
  * sink fan-out -> lineage/resume (factory.go startup-path analogue). */
class JobMainSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("full job run with --config and --dims; --resume skips written sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_job").toString
    val cfgPath = s"$dir/cfg.yaml"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(cfgPath),
      """asserts_processor:
        |  asserts_env: prod
        |  sampling_latency_threshold_seconds: 0.2
        |""".stripMargin)
    val dimDir = s"$dir/dims"
    import spark.implicits._
    spark.createDataset(Seq(graft.sources.Dims.ServiceDim("web", "edge", "prod", "eu-1")))
      .toDF().coalesce(1).write.mode("overwrite").parquet(s"$dimDir/services.parquet")

    val outDir = s"$dir/out"
    // --resume placed MID-ARGS on purpose: the scan parser must not
    // mispair the later --out (the round-1 sliding-pair bug)
    val args = Array(
      "--input", "events:/root/testdata/sf0.001",
      "--config", cfgPath,
      "--resume",
      "--dims", dimDir,
      "--out", outDir)
    val json = JobMain.run(args, spark)
    assert(json.contains(""""job":"graft""""))
    assert(json.contains(""""turns_enriched":1000"""))
    // sinks written and partitioned by sink value
    val sinks = spark.read.parquet(s"$outDir/sinks")
    assert(sinks.count() > 0)
    // the loaded dim drove enrichment: web got namespace=edge
    // (visible through the sink rows' conversations only indirectly;
    // check the metrics table instead, which carries namespace)
    val metrics = spark.read.parquet(s"$outDir/metrics")
    assert(metrics.filter(col("namespace") === "edge").count() > 0)
    // lineage manifest exists with per-file rows
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/_lineage.jsonl"))
    assert(manifest.contains("\"sink\": \"sinks\"") && manifest.contains("\"files\""))

    // resume: re-run must skip both sinks (counts identical, no rewrite)
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$outDir/sinks"))
    val json2 = JobMain.run(args, spark)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$outDir/sinks")) == mtime)
    def sinkCounts(j: String) =
      "\"sink_counts\":\\{([^}]*)\\}".r.findFirstMatchIn(j).map(_.group(1))
    assert(sinkCounts(json2) == sinkCounts(json))
  }
}
