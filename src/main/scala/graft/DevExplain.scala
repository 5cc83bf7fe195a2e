package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one driver-contract query and dump its final
  * (AQE-resolved) physical plan — the `.explain` feedback loop for plan
  * audits (exchange reuse, pushdown, codegen spans).
  *
  * Usage: dev/run.sh graft.DevExplain q04_routing [sfDir] [cores]
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q04_routing")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cores = if (args.length > 2) args(2) else "4"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.collect().length // materialize THIS plan so AQE finalizes it
    val plan = df.queryExecution.executedPlan.toString
    println(s"=== $name rows=$n ===")
    println(s"ReusedExchange nodes: ${plan.linesIterator.count(_.contains("ReusedExchange"))}")
    println(s"Exchange nodes: ${plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))}")
    println(s"WholeStageCodegen spans: ${"\\*\\(\\d+\\)".r.findAllIn(plan).map(_.toString).toSet.size}")
    println(plan)
    spark.stop()
  }
}
