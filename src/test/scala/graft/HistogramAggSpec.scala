package graft

import org.apache.spark.sql.functions._
import graft.functions.HistogramAgg
import graft.model.PipelineConfig
import graft.operators.{Aggregates, Enrich}

/** One-pass typed histogram aggregator vs the CASE-chain groupBy form. */
class HistogramAggSpec extends SparkTestBase {

  private val cfg = PipelineConfig.default
  private val buckets = cfg.histogramBuckets

  test("bucket vector matches the CASE-chain histogram on real data") {
    val enriched = Enrich.enriched(
      graft.sources.Transcripts.fromEvents(spark, "/root/testdata/sf0.001"),
      spark, cfg
    ).filter(col("span_class") =!= "internal").cache()

    val vec = enriched
      .groupBy("service")
      .agg(HistogramAgg.histogramVec(buckets)(col("latency_secs")).as("h"))
      .select(col("service"), col("h.cumulative").as("cumulative"), col("h.total").as("total"))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2)))
      .toMap

    val caseForm = Aggregates.latencyHistogram(enriched, cfg)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(3)))
      .groupBy(_._1)

    caseForm.foreach { case (service, rows) =>
      val (cumulative, total) = vec(service)
      rows.foreach { case (_, le, cum) =>
        val idx =
          if (le.isPosInfinity) buckets.length
          else buckets.indexWhere(b => b == le)
        assert(idx >= 0, s"unknown bucket $le")
        assert(cumulative(idx) == cum, s"service=$service le=$le")
      }
      assert(total == rows.map(_._3).max)
    }
    enriched.unpersist()
  }

  test("merge is associative: partition count does not change results") {
    import spark.implicits._
    val data = (1 to 1000).map(i => ("s", (i % 130) / 10.0))
    val df1 = data.toDF("service", "latency_secs").repartition(1)
    val df32 = data.toDF("service", "latency_secs").repartition(32)
    def h(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("service")
      .agg(HistogramAgg.histogramVec(buckets)(col("latency_secs")).as("h"))
      .select("h.counts").collect().head.getSeq[Long](0)
    assert(h(df1) == h(df32))
  }
}
