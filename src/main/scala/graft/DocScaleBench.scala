package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Assemble, Dedup, TextAnalysis}

/** Scale harness for the document operators: a generated corpus far
  * beyond the sf tables (ground-truth near-dup groups, no files), each
  * bucketed operator timed by forcing its count, candidate counters via
  * the telemetry listener. Usage:
  *   SPARK_DRIVER_MEM=24g dev/run.sh graft.DocScaleBench 100000 32
  */
object DocScaleBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 100000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val telemetry = Telemetry.register(spark)

    val docs = graft.sources.DocGen.synthetic(spark, nDocs).cache()
    val nd = docs.count() // generation outside the timed ops

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      results(name) = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[docscale] $name: $n rows in ${results(name)}%.2fs")
    }

    t("exact_dedup") { Dedup.exact(docs).filter(col("is_duplicate")).count() }
    // mega-duplicate-group skew case: plant ONE fingerprint group holding
    // half the corpus (the 10^8x-duplicated boilerplate page of a real
    // crawl). The groupBy+join-back form must stay flat — the former
    // raw-row window over `fingerprint` funneled the whole group through
    // a single task.
    t("exact_dedup_megagroup") {
      val planted = docs.withColumn(
        "text",
        when(pmod(col("doc_id"), lit(2)) === 0, lit("same boilerplate page"))
          .otherwise(col("text")))
      Dedup.exact(planted).filter(col("is_duplicate")).count()
    }
    t("minhash_pairs") { Dedup.minhashLshPairs(docs, w = 3, minEstimate = 0.5).count() }
    t("simhash_pairs") { Dedup.simhashPairs(docs, maxHamming = 6).count() }
    t("jaccard_pairs") { Dedup.ngramJaccardPairs(docs, w = 3, minJaccard = 0.5, maxDocFreq = 50).count() }
    t("winnowing") { Dedup.winnowingFingerprints(docs).count() }
    t("dup_clusters") {
      Dedup.duplicateClusters(docs, Dedup.minhashLshPairs(docs, w = 3, minEstimate = 0.5))
        .filter(!col("is_canonical")).count()
    }
    t("decontam") { Dedup.decontaminationPairs(docs, maxDocFreq = 50).count() }
    t("pack") { Assemble.packSequences(docs).count() }
    t("chunks") { Assemble.chunk(docs).count() }
    t("token_stats") { TextAnalysis.tokenStats(docs).count() }
    t("dup_span_removal") {
      TextAnalysis.removeDuplicateSpans(docs).filter(col("n_tokens_removed") > 0).count()
    }
    t("top_ngrams") { TextAnalysis.topNgrams(docs).count() }
    t("len_percentiles") { TextAnalysis.lengthPercentiles(docs).count() }
    t("token_budget") {
      graft.operators.Corpus.tokenBudgetSample(docs, budgetTokens = nDocs * 40L)
        .filter(col("kept")).count()
    }
    // planted near-dup groups span sources (consecutive doc_ids, mod-20
    // source) so cross-source shared fingerprints exist by construction
    val srcDocs = docs.withColumn(
      "source", concat(lit("s"), pmod(col("doc_id"), lit(20)).cast("string")))
    t("source_overlap") {
      graft.operators.Corpus.sourceOverlap(srcDocs, maxDocFreq = 50).count()
    }

    // embedding-side operators at the same scale (planted-group vectors)
    val embs = graft.sources.DocGen.syntheticEmbeddings(spark, nDocs).cache()
    embs.count()
    val queries = embs.filter(col("vec_id") < 50)
    // bucket count must track corpus size: nPlanes ~ log2(n) keeps the
    // expected bucket occupancy (and so the candidate volume) flat — the
    // default 6 planes = 64 buckets is a test-scale setting
    val nPlanes = math.max(6, (math.log(nDocs.toDouble / 10) / math.log(2)).ceil.toInt)
    t("ann_lsh_topk") { graft.operators.Similarity.lshTopK(embs, queries, k = 5).count() }
    t("ann_ivf_topk") { graft.operators.Similarity.ivfTopK(embs, queries, k = 5).count() }
    t("cosine_pairs") {
      graft.operators.Similarity.nearDupPairs(embs, threshold = 0.9, nPlanes = nPlanes).count()
    }
    t("semantic_clusters") {
      graft.operators.Similarity
        .semanticClusters(embs, threshold = 0.9, nPlanes = nPlanes)
        .filter(!col("is_canonical")).count()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(
      s"""{"metric":"doc_scale","n_docs":$nd,"ops_sec":$qs,"telemetry":${telemetry.toJson}}"""
    )
    spark.stop()
  }
}
