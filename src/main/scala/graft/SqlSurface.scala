package graft

import org.apache.spark.sql.SparkSession
import graft.model.PipelineConfig
import graft.operators.{Aggregates, Dedup, Enrich, Route, Similarity, TextAnalysis}
import graft.sources.Transcripts

/** SQL-facing surface: register the engine's relations as temp views and
  * its native expressions as SQL functions, so every operator composes
  * from `spark.sql(...)` — the "query the processor's tables" surface the
  * reference exposes through its Prometheus endpoint and sink topics
  * (reference: assertsprocessor/metrics_exporter.go:22-56, the sinks of
  * sampler.go:215-276), re-expressed as Spark SQL catalog objects.
  *
  * Views are LAZY logical plans: registration costs nothing until a view
  * is queried, and Catalyst prunes/pushes through them exactly as through
  * the DataFrame API — `SELECT service FROM graft_enriched WHERE ...`
  * reads the same columns/filters a hand-built plan would. On a real
  * cluster these become permanent views (or Iceberg tables) in the
  * catalog; `local` temp views are the sandbox stand-in.
  */
object SqlSurface {

  /** Register the native codegen expressions under their SQL names:
    * `md5lower64`, `simhash64`, `grok_extract`, `dotq`. */
  def registerFunctions(spark: SparkSession): Unit = {
    graft.functions.Hash64.register(spark)
    graft.functions.SimHash.register(spark)
    graft.functions.Grok.register(spark)
    graft.functions.VecOps.register(spark)
  }

  /** Register the transcript-side pipeline relations over `sfDir` as
    * `graft_*` temp views (turns, enriched, routing, metric tables). */
  def registerPipeline(
      spark: SparkSession,
      sfDir: String,
      cfg: PipelineConfig = PipelineConfig.default
  ): Unit = {
    registerFunctions(spark)
    val turns = Transcripts.fromEvents(spark, sfDir)
    val enriched = Enrich.enriched(turns, spark, cfg)
    val routing = Route.convRouting(enriched, cfg)
    val rollup = Aggregates.fineRollup(enriched, cfg)
    turns.createOrReplaceTempView("graft_turns")
    enriched.createOrReplaceTempView("graft_enriched")
    Route.convDims(enriched).createOrReplaceTempView("graft_conversations")
    routing.createOrReplaceTempView("graft_routing")
    Route.routedTurns(turns, routing).createOrReplaceTempView("graft_sink_rows")
    graft.operators.Sessions
      .sessionize(spark.read.parquet(s"$sfDir/events.parquet"))
      .createOrReplaceTempView("graft_sessions")
    Aggregates.redRollupFrom(rollup).createOrReplaceTempView("graft_red")
    Aggregates.latencyHistogramFrom(rollup).createOrReplaceTempView("graft_histogram")
    Aggregates
      .prometheusText(
        Aggregates.prometheusTable(
          Aggregates.traceCounts(Route.convDims(enriched)),
          Aggregates.sampledTraceCounts(routing),
          Aggregates.spanCounts(enriched),
          Aggregates.redRollupFrom(rollup),
          Aggregates.latencyHistogramFrom(rollup),
          Aggregates.sampledSpanCounts(enriched, routing)
        )
      )
      .createOrReplaceTempView("graft_prom_text")
  }

  /** Register the training-data operator relations over the documents /
    * embeddings tables of `sfDir` as `graft_*` temp views. */
  def registerDocOps(spark: SparkSession, sfDir: String): Unit = {
    registerFunctions(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.createOrReplaceTempView("graft_documents")
    embs.createOrReplaceTempView("graft_embeddings")
    Dedup.exact(docs).createOrReplaceTempView("graft_dedup_exact")
    Dedup.minhashLshPairs(docs).createOrReplaceTempView("graft_minhash_pairs")
    Dedup
      .duplicateClusters(docs, Dedup.minhashLshPairs(docs))
      .createOrReplaceTempView("graft_dup_clusters")
    Dedup.trainSplit(docs).createOrReplaceTempView("graft_train_split")
    Dedup.decontaminationPairs(docs).createOrReplaceTempView("graft_decontam")
    TextAnalysis.tokenStats(docs).createOrReplaceTempView("graft_token_stats")
    TextAnalysis.duplicatePassages(docs).createOrReplaceTempView("graft_dup_passages")
    TextAnalysis.vocabStats(docs).createOrReplaceTempView("graft_vocab")
    TextAnalysis.qualityScore(docs).createOrReplaceTempView("graft_quality")
    TextAnalysis.languageId(docs).createOrReplaceTempView("graft_langid")
    Similarity
      .nearDupPairs(embs, threshold = 0.4)
      .createOrReplaceTempView("graft_cosine_pairs")
  }
}
