package graft

import org.apache.spark.sql.SparkSession
import graft.model.PipelineConfig
import graft.operators.{Enrich, Route}
import graft.sources.TranscriptGen

/** Dev-only stage profiler for the generated pipeline input. */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = PipelineConfig.default
    val gen = TranscriptGen.synthetic(spark, 390000L, 5, hotConvs = 5, hotFactor = 10000)

    def t(name: String)(f: => Long): Unit = {
      val (n, sec) = Bench.timed(f)
      println(f"STAGE $name%-22s $sec%8.2f s  rows=$n")
    }

    t("gen_count")(gen.count())
    val enr = Enrich.enriched(gen, spark, cfg)
    t("enrich_count")(enr.count())
    val seg = Route.withSegmentInfo(enr)
    t("segment_join")(seg.count())
    val fold = Route.convFold(Route.withSpanFlag(seg))
    t("conv_fold")(fold.count())
    val routing = Route.convRouting(enr, cfg)
    t("conv_routing")(routing.count())
    t("routed_turns")(Route.routedTurns(gen, routing).count())
    t("full_pipeline")(Bench.forceAll(Pipeline.run(spark, gen, cfg)))
    spark.stop()
  }
}
