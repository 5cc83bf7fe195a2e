package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.TranscriptGen
import graft.model.PipelineConfig
import graft.operators.{Enrich, Route}

object DevProfile3 {
  def run(cores: Int): Unit = {
    val localDir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-spark-local")).toString
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = PipelineConfig.default
    val gen = TranscriptGen.synthetic(spark, 1000000L, 5, hotConvs = 5, hotFactor = 10000)
    def t(name: String)(f: => Any): Unit = {
      val (_, sec) = Bench.timed(f); println(f"RT[$cores] $name%-22s $sec%8.2f s")
    }
    val enriched = Enrich.enriched(gen, spark, cfg).select(
      "conv_id", "turn_idx", "service", "namespace", "env", "site",
      "entity_key", "span_class", "request_context", "latency_secs",
      "dur_ms", "is_error", "error_routable", "is_slow_span", "threshold", "ts").cache()
    enriched.count(); enriched.count() // warm cache
    val seg = Route.withSpanFlag(Route.withSegmentInfo(enriched))
    t("seg_join_flag")(seg.count())
    t("seg_join_flag2")(seg.count())
    val fold = Route.convFold(seg)
    t("fold")(fold.count())
    t("fold2")(fold.count())
    val routing = Route.convRouting(enriched, cfg)
    t("routing_full")(routing.count())
    t("routing_full2")(routing.count())
    spark.stop()
  }
  def main(args: Array[String]): Unit = args.foreach(a => run(a.toInt))
}
