package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, a random-hyperplane
  * LSH-bucketed variant as the scale path, and cosine near-dup pairs.
  *
  * Determinism / oracle parity: embeddings are quantized to integer
  * milli-units first, so dot products are exact integers and the final
  * cosine is one IEEE division — bit-identical across engines and
  * partitionings. The LSH hyperplanes come from a fixed-seed generator.
  *
  * Scale design: the query side of top-k is broadcast (queries << corpus);
  * the corpus scan stays a projection; top-k is a windowed row_number
  * (WindowGroupLimit — no global sort). The LSH variant buckets the corpus
  * once (shuffle on bucket id) and only scans matching buckets.
  */
object Similarity {

  /** Quantize a float vector to integer milli-units (exact arithmetic). */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine from quantized vectors: int dot / sqrt(int norms). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") / sqrt((dotQ(a, a) * dotQ(b, b)).cast("double"))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself), ties broken by neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"), quantize(col("embedding")).as("nv"))
    val q = queries.select(col("vec_id").as("q_id"), quantize(col("embedding")).as("qv"))
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosineQ(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cosine")
  }

  /** Fixed-seed random hyperplanes for sign-bit LSH. */
  def hyperplanes(nPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dims)(rnd.nextGaussian())
  }

  /** Sign-bit LSH bucket id: bit j set iff dot(vec, plane_j) > 0. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x
      )
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: a candidate must share the query's
    * bucket in at least one of `nTables` independent hyperplane tables
    * (standard multi-table LSH — each table is a (table_idx, bucket)
    * partition, so the corpus is scanned per-bucket, never in full).
    * Recall/cost trade-off: more tables or fewer planes -> higher recall,
    * more candidates.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nPlanes: Int = 6,
      dims: Int = 64,
      nTables: Int = 8
  ): DataFrame = {
    val tables = (0 until nTables).map(t => t -> hyperplanes(nPlanes, dims, seed = 42L + t))
    def bucketed(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(
        col("vec_id").as(idCol),
        quantize(col("embedding")).as(vecCol),
        explode(array(tables.map { case (t, planes) =>
          struct(lit(t).as("table_idx"), lshBucket(col("embedding"), planes).as("bucket"))
        }: _*)).as("tb")
      ).select(col(idCol), col(vecCol), col("tb.table_idx"), col("tb.bucket"))
    val c = bucketed(corpus, "n_id", "nv")
    val q = bucketed(queries, "q_id", "qv")
    val scored = c
      .join(broadcast(q), Seq("table_idx", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("cosine", cosineQ(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs (cosine >= threshold). Exact
    * pairwise here; at corpus scale, restrict to LSH-bucket candidates
    * first (same bucket column as lshTopK).
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double = 0.9): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), quantize(col("embedding")).as("va"))
    val b = corpus.select(col("vec_id").as("id_b"), quantize(col("embedding")).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosineQ(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
