package graft

import org.apache.spark.sql.SparkSession
import graft.sources.TranscriptGen
import graft.model.PipelineConfig

object DevProfile2 {
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
    val gen = TranscriptGen.synthetic(spark, 1000000L, 5, hotConvs = 5, hotFactor = 10000)
    def t(name: String)(f: => Any): Unit = {
      val (_, sec) = Bench.timed(f); println(f"PH[$cores] $name%-22s $sec%8.2f s")
    }
    // full warm-up job
    {
      val dir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(localDir), "g").toString
      val out = Pipeline.run(spark, gen); out.enriched.count()
      Pipeline.writeSinks(out, dir, lineage = false); out.unpersistAll()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    val dir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(localDir), "g").toString
    val t0 = System.nanoTime()
    val out = Pipeline.run(spark, gen)
    t("enriched_cache")(out.enriched.count())
    t("routing_cache")(out.routing.count())
    t("sinks_write")(out.routedTurns
      .repartition(org.apache.spark.sql.functions.col("sink"), org.apache.spark.sql.functions.col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .write.mode("overwrite").partitionBy("sink").parquet(s"$dir/sinks"))
    t("m_trace")(out.traceCounts.write.mode("overwrite").parquet(s"$dir/m1"))
    t("m_sampled")(out.sampledTraceCounts.write.mode("overwrite").parquet(s"$dir/m2"))
    t("m_span")(out.spanCounts.write.mode("overwrite").parquet(s"$dir/m3"))
    t("m_red")(out.redRollup.write.mode("overwrite").parquet(s"$dir/m4"))
    t("m_hist")(out.latencyHistogram.write.mode("overwrite").parquet(s"$dir/m5"))
    println(f"PH[$cores] TOTAL ${(System.nanoTime()-t0)/1e9}%8.2f s")
    out.unpersistAll()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
  def main(args: Array[String]): Unit = args.foreach(a => run(a.toInt))
}
