package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators: sequence packing and context-window
  * chunking — the steps between a cleaned corpus and model-ready
  * examples.
  */
object Assemble {

  /** Sequence packing (concatenate-then-chunk): documents are laid out
    * contiguously in doc_id order and tiled into fixed token-capacity
    * training sequences; each doc reports its sequence id, its token
    * offset inside the sequence, and whether it straddles a boundary.
    *
    * Scale shape: a GLOBAL running sum would serialize on one task
    * (window with a global ORDER BY has a single partition), so packing
    * is sharded — docs pack within `shardSize`-sized doc_id ranges,
    * each shard independent and deterministic (embarrassingly parallel;
    * the cost is at most one partial sequence per shard boundary, the
    * standard distributed layout for corpus concatenation). The window
    * partitions by shard and is bounded by shard size.
    */
  def packSequences(
      docs: DataFrame,
      capacityTokens: Int = 2048,
      shardSize: Int = 1000
  ): DataFrame = {
    val nTok = size(TextAnalysis.tokens(col("text"))).cast("long")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col("doc_id"),
        expr(s"doc_id div $shardSize").as("shard"),
        nTok.as("n_tokens")
      )
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(
        col("doc_id"),
        col("shard"),
        col("n_tokens"),
        (col("shard") * 1000000L + expr(s"cum_before div $capacityTokens")).as("seq_id"),
        (col("cum_before") % capacityTokens).as("seq_offset"),
        (col("cum_before") % capacityTokens + col("n_tokens") > capacityTokens)
          .as("straddles")
      )
  }

  /** Context-window chunking: split each document into fixed-size
    * character windows with `overlap` characters of context carried
    * between consecutive chunks (chunk i starts at i*(size-overlap)).
    * One row per chunk — the explode shape; per-doc chunk counts are
    * bounded by document length, so the Generate distributes evenly.
    */
  def chunk(docs: DataFrame, size: Int = 256, overlap: Int = 32): DataFrame = {
    require(overlap < size, "overlap must be smaller than the chunk size")
    val stride = size - overlap
    val nChunks = // ceil((len - overlap) / stride), at least 1
      greatest(ceil((length(col("text")) - overlap).cast("double") / stride).cast("int"), lit(1))
    docs
      .select(
        col("doc_id"),
        col("text"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx")
      )
      .select(
        col("doc_id"),
        col("chunk_idx"),
        substring(col("text"), (col("chunk_idx") * stride + 1).cast("int"), lit(size))
          .as("chunk_text")
      )
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
