package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Co-located joins via bucketing: both sides bucketed+sorted by the
  * join key -> sort-merge join with zero exchanges. */
class BucketingSpec extends SparkTestBase {

  test("equi-join of two tables bucketed on the key runs with no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '$wh'")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val meta = docs.select(col("doc_id"), length(col("text")).as("len"))
    Bucketing.writeBucketed(docs.select("doc_id", "text"), "bdemo.docs_b", 4, Seq("doc_id"))
    Bucketing.writeBucketed(meta, "bdemo.meta_b", 4, Seq("doc_id"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // force a merge join so the test pins the exchange-free property
      // (a broadcast join would hide it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val bucketedJoin = Bucketing.table(spark, "bdemo.docs_b")
        .join(Bucketing.table(spark, "bdemo.meta_b"), Seq("doc_id"))
      assert(!Bucketing.hasShuffle(bucketedJoin), "bucketed join must not shuffle")
      assert(bucketedJoin.count() == docs.count())

      // control: the same join over plain parquet DOES shuffle both sides
      val plainJoin = docs.select("doc_id", "text").join(meta, Seq("doc_id"))
      assert(Bucketing.hasShuffle(plainJoin), "non-bucketed join should shuffle (control)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
