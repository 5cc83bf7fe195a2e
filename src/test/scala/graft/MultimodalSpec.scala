package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Binary-column multimodal plumbing: schema contract, deterministic
  * payloads, partition-batch feature extraction, frame sampling.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.syntheticMedia(docs).cache()

  test("synthetic media: binary payloads with typed metadata, deterministic") {
    val rows = media.orderBy("doc_id").limit(3).collect()
    assert(rows.map(_.getAs[String]("media_type")).toSeq == Seq("image", "audio", "video"))
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length == 64) // 4 x md5 blocks
      assert(r.getAs[Int]("width") >= 32)
    }
    // determinism: regenerating yields identical payloads
    val again = Multimodal.syntheticMedia(docs).orderBy("doc_id").limit(3).collect()
    assert(rows.zip(again).forall { case (a, b) =>
      java.util.Arrays.equals(a.getAs[Array[Byte]]("payload"), b.getAs[Array[Byte]]("payload"))
    })
  }

  test("feature extraction: mapPartitions batch produces stable feature schema") {
    val feats = Multimodal.extractFeatures(spark, media).cache()
    assert(feats.count() == media.count())
    val f = feats.filter(col("doc_id") === 0).collect().head
    assert(f.n_bytes == 64)
    assert(f.feature.length == 8)
    assert(f.mean_byte > 0 && f.mean_byte < 255)
    assert(f.entropy > 0 && f.entropy <= 8.0)
    // determinism across runs
    val f2 = Multimodal.extractFeatures(spark, media).filter(col("doc_id") === 0).collect().head
    assert(f.feature.toSeq == f2.feature.toSeq && f.entropy == f2.entropy)
    feats.unpersist()
  }

  test("frame sampling: one row per sampled offset for video rows only") {
    val frames = Multimodal.sampleFrames(media, everyNthByte = 32)
    val perDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.nonEmpty)
    assert(perDoc.values.forall(_ == 2)) // 64 bytes / 32 per frame
    val videoIds = media.filter(col("media_type") === "video")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(perDoc.keySet == videoIds)
  }
}
