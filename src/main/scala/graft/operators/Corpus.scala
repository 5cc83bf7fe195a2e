package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus selection: the single call that composes
  * the quality gate ([[TextAnalysis.qualityScore]]), exact dedup
  * ([[Dedup.exact]]), the deterministic split ([[Dedup.trainSplit]]) and
  * benchmark decontamination ([[Dedup.decontaminationPairs]]) into the
  * final keep/drop decision per document — the decision table a corpus
  * build materializes before tokenization (reference analogue: the
  * sampler's multi-signal keep/drop routing, sampler.go:215-276, applied
  * to documents instead of traces).
  *
  * kept = in the train split AND passes quality AND not an exact
  * duplicate (non-canonical copy) AND not contaminated by test-split
  * overlap. Every input is a projection or an equi-join on doc_id; the
  * decontamination drop list is tiny (benchmark-sized) so its join back
  * broadcasts at any corpus scale.
  */
object Corpus {

  def corpusFilter(docs: DataFrame, minShared: Long = 2): DataFrame = {
    val qual = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("passes_quality"))
    val dup = Dedup.exact(docs).select(col("doc_id"), col("is_duplicate").as("is_exact_dup"))
    val split = Dedup.trainSplit(docs).select(col("doc_id"), col("split"))
    val contam = Dedup
      .decontaminationPairs(docs, minShared = minShared)
      .select(col("train_doc_id").as("doc_id"))
      .distinct()
      .withColumn("contam_hit", lit(true))
    docs
      .select(col("doc_id"))
      .join(split, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .join(dup, Seq("doc_id"))
      .join(broadcast(contam), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("split"),
        col("passes_quality"),
        col("is_exact_dup"),
        coalesce(col("contam_hit"), lit(false)).as("is_contaminated"),
        (col("split") === "train" && col("passes_quality") &&
          !col("is_exact_dup") && coalesce(col("contam_hit"), lit(false)) === false)
          .as("kept")
      )
  }

  /** Corpus-build report: per (lang, split) document and token counts
    * before and after [[corpusFilter]]'s gates — the rollup a corpus
    * build publishes as its data card. One equi-join of two per-doc
    * relations on doc_id, then a partial-aggregable groupBy over a
    * (langs x 3)-row result; at 100 TB this is the cheapest query in
    * the family (pure map-side combine into a tiny key space).
    */
  def corpusReport(docs: DataFrame): DataFrame = {
    val decisions = corpusFilter(docs)
    val tokens = TextAnalysis.tokenStats(docs).select(col("doc_id"), col("n_tokens"))
    decisions
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .join(tokens, Seq("doc_id"))
      .groupBy("lang", "split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        sum(when(col("kept"), col("n_tokens").cast("long")).otherwise(0L)).as("n_kept_tokens")
      )
  }
}
