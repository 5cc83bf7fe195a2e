package graft

import org.apache.spark.sql.functions._

/** The SQL surface: operators compose from `spark.sql` over the
  * registered `graft_*` views and native SQL functions, returning the
  * same results as the Scala API. */
class SqlSurfaceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("pipeline views: routing + enriched compose in SQL and match the API") {
    SqlSurface.registerPipeline(spark, sfDir)
    // operator 1 via SQL: trace counts from the routing view
    val sqlCounts = spark
      .sql("SELECT env, site, count(*) AS trace_count FROM graft_routing GROUP BY env, site")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val apiCounts = graft.operators.Aggregates
      .traceCounts(graft.operators.Route.convRouting(
        graft.operators.Enrich.enriched(
          graft.sources.Transcripts.fromEvents(spark, sfDir), spark)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sqlCounts == apiCounts && sqlCounts.nonEmpty)
    // operator 2 via SQL: a JOIN across two registered views (sampled
    // span counts re-expressed in SQL over enriched x routing)
    val sampled = spark.sql(
      """SELECT e.service, count(*) AS n
        |FROM graft_enriched e
        |JOIN (SELECT conv_id FROM graft_routing WHERE kept) r USING (conv_id)
        |GROUP BY e.service""".stripMargin)
    assert(sampled.count() > 0)
    // the scrape view renders exposition lines
    val lines = spark.sql(
      "SELECT line FROM graft_prom_text WHERE line LIKE 'asserts_trace_count_total%'")
    assert(lines.count() > 0)
  }

  test("doc-op views + native SQL functions match the API") {
    SqlSurface.registerDocOps(spark, sfDir)
    val sqlDups = spark
      .sql("SELECT count(*) FROM graft_dedup_exact WHERE is_duplicate")
      .collect().head.getLong(0)
    val apiDups = graft.operators.Dedup
      .exact(spark.read.parquet(s"$sfDir/documents.parquet"))
      .filter(col("is_duplicate")).count()
    assert(sqlDups == apiDups)
    // native codegen expressions are SQL-callable
    val h = spark.sql("SELECT md5lower64('abc') AS h, simhash64('a b c') AS s").collect().head
    assert(h.schema.fieldNames.toSeq == Seq("h", "s"))
    // grok_extract composes in SQL with named-capture struct output
    val g = spark.sql(
      """SELECT grok_extract('dur=12ms', 'dur=(?<ms>[0-9]+)ms').ms AS ms""").collect().head
    assert(g.getString(0) == "12")
  }
}
