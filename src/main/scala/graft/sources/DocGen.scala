package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic document corpus for scale testing the
  * dedup/similarity/assembly operators beyond the driver's sf tables.
  *
  * Shape: documents come in near-dup GROUPS of `groupSize` — token i of
  * doc d is a hash of (group, i) shared by the whole group, except a
  * deterministic ~1-in-`mutationMod` subset keyed by (d, i) that mutates
  * per document. So each group is a planted near-dup cluster (Jaccard
  * roughly (mutationMod-1)/mutationMod between siblings) and documents
  * from different groups are unrelated — known ground truth, generated
  * distributively by `spark.range` (no driver-side data, no files).
  *
  * A ~quarter of positions carry a COMMON token from a small pool keyed
  * by position alone — shared across the WHOLE corpus, the Zipf head
  * that makes ubiquitous shingles (df ~ nDocs) and forces the
  * hot-shingle/fingerprint document-frequency caps to bind, exactly the
  * skew a real corpus throws at the inverted-index joins.
  */
object DocGen {

  def synthetic(
      spark: SparkSession,
      nDocs: Long,
      groupSize: Int = 4,
      mutationMod: Int = 20,
      minTokens: Int = 60,
      tokenSpread: Int = 40
  ): DataFrame = {
    spark.range(nDocs)
      .select(
        col("id").as("doc_id"),
        (col("id") % 7).cast("int").as("lang_i"),
        expr(s"id div $groupSize").as("grp"),
        (lit(minTokens) + pmod(col("id"), lit(tokenSpread))).cast("int").as("n_tok")
      )
      .select(
        col("doc_id"),
        element_at(
          array(lit("en"), lit("en"), lit("en"), lit("de"), lit("fr"), lit("es"), lit("en")),
          col("lang_i") + 1
        ).as("lang"),
        concat_ws(
          " ",
          transform(
            sequence(lit(0), col("n_tok") - 1),
            i =>
              when(
                pmod(crc32(concat(col("doc_id").cast("string"), lit("#"), i.cast("string"))), lit(mutationMod)) === 0,
                substring(md5(concat(lit("d"), col("doc_id").cast("string"), lit(":"), i.cast("string"))), 1, 6)
              ).when(
                pmod(crc32(concat(lit("c"), i.cast("string"))), lit(4)) === 0,
                concat(lit("the"), pmod(crc32(concat(lit("p"), i.cast("string"))), lit(100)).cast("string"))
              ).otherwise(
                substring(md5(concat(lit("g"), col("grp").cast("string"), lit(":"), i.cast("string"))), 1, 6)
              )
          )
        ).as("text")
      )
      .withColumn("n_chars", length(col("text")).cast("int"))
  }

  /** Deterministic synthetic embeddings with the same planted-group
    * structure: vectors in a near-dup group share a base direction with
    * small per-vector perturbation (high cosine within a group, random
    * cosine across groups) — ground truth for the ANN/near-dup
    * operators at scale, generated distributively. */
  def syntheticEmbeddings(
      spark: SparkSession,
      nVecs: Long,
      dims: Int = 64,
      groupSize: Int = 4
  ): DataFrame = {
    spark.range(nVecs)
      .select(col("id").as("vec_id"), expr(s"id div $groupSize").as("grp"))
      .select(
        col("vec_id"),
        transform(
          sequence(lit(0), lit(dims - 1)),
          j =>
            ((pmod(crc32(concat(lit("b"), col("grp").cast("string"), lit(":"), j.cast("string"))), lit(2000))
              - 1000).cast("float") / 1000.0f
              + (pmod(crc32(concat(lit("n"), col("vec_id").cast("string"), lit(":"), j.cast("string"))), lit(200))
                - 100).cast("float") / 2000.0f)
              .cast("float")
        ).as("embedding")
      )
  }
}
