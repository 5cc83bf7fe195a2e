package graft

import org.apache.spark.sql.SparkSession
import graft.sources.TranscriptGen

/** Two-parallelism scaling evidence for the north rule: run the identical
  * full pipeline on the identical generated input at N and 4N cores
  * (local[8] vs local[32] — no real cluster in this sandbox) and report
  * throughput at both plus scaling efficiency = thr(4N) / (4 * thr(N)).
  *
  * Usage: runMain graft.ScalingBench [nConvs] [turnsPerConv] [repeats]
  */
object ScalingBench {

  def runAt(master: String, cores: Int, nConvs: Long, turnsPerConv: Int, repeats: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val gen = TranscriptGen.synthetic(spark, nConvs, turnsPerConv,
        hotConvs = 5, hotFactor = 10000)
      // the measured job is the real pipeline: enrich -> route -> fan-out
      // parquet sink + metric writes. Warm-up pass first (JIT, codegen).
      def job(): Long = {
        val dir = java.nio.file.Files.createTempDirectory("graft_scale").toString
        val out = Pipeline.run(spark, gen)
        val turns = out.enriched.count() // materialize cache once, observed
        Pipeline.writeSinks(out, dir, lineage = false)
        out.unpersistAll()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        turns
      }
      Bench.timed(job())
      val runs = (1 to repeats).map(_ => Bench.timed(job()))
      (runs.head._1, runs.map(_._2).min)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 390000L
    val turnsPerConv = if (args.length > 1) args(1).toInt else 5
    val repeats = if (args.length > 2) args(2).toInt else 2
    val nLow = if (args.length > 3) args(3).toInt else 8
    val nHigh = if (args.length > 4) args(4).toInt else nLow * 4
    require(nHigh == nLow * 4, "scaling pairs must be N and 4N")

    val (turnsLow, secLow) = runAt(s"local[$nLow]", nLow, nConvs, turnsPerConv, repeats)
    val (turnsHigh, secHigh) = runAt(s"local[$nHigh]", nHigh, nConvs, turnsPerConv, repeats)
    require(turnsLow == turnsHigh, "same input must yield same turn count")
    val thrLow = turnsLow / secLow
    val thrHigh = turnsHigh / secHigh
    val eff = thrHigh / (4.0 * thrLow)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","turns":$turnsLow,"n_low":$nLow,"n_high":$nHigh,"sec_n_low":$secLow%.2f,"sec_n_high":$secHigh%.2f,"turns_per_sec_n_low":${thrLow.toLong},"turns_per_sec_n_high":${thrHigh.toLong}}"""
    )
  }
}
