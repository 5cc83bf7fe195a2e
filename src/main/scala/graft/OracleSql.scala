package graft

import graft.model.PipelineConfig
import graft.sources.{Dims, Transcripts}

/** DuckDB oracle SQL for each pipeline stage, layered as CTE fragments so
  * every `SparkEntry.oracleSql` entry is `Transcripts.duckDbCte` + the
  * fragments it needs + a final SELECT. Config constants (thresholds,
  * caps, K) are injected from [[PipelineConfig.default]] and the dims from
  * [[Dims]], so the oracle and the Spark plan share one source of truth.
  */
object OracleSql {

  private val cfg = PipelineConfig.default
  private val winMicros = cfg.normalSamplingFrequencyMinutes.toLong * 60L * 1000000L

  /** parse stage columns (mirrors operators.Parse) */
  val parsedCte: String =
    """parsed AS (
      |  SELECT *,
      |    CASE WHEN turn_idx = 0 THEN 'root' WHEN role = 'user' THEN 'entry'
      |         WHEN role = 'tool' THEN 'exit' ELSE 'internal' END AS span_class,
      |    CAST(NULLIF(regexp_extract(text, 'status=([0-9]+)', 1), '') AS INT) AS status_code,
      |    NULLIF(regexp_extract(text, '(https?://[^ ]+)', 1), '') AS url,
      |    NULLIF(regexp_extract(text, 'call=([A-Za-z0-9_-]+)\.', 1), '') AS call_service,
      |    NULLIF(regexp_extract(text, 'call=[A-Za-z0-9_-]+\.([A-Za-z0-9_]+)', 1), '') AS call_method,
      |    CAST(NULLIF(regexp_extract(text, 'dur=([0-9]+)ms', 1), '') AS BIGINT) AS dur_ms
      |  FROM transcripts
      |),
      |parsed2 AS (
      |  SELECT *,
      |    CAST(dur_ms AS DOUBLE) / 1000.0 AS latency_secs,
      |    CASE WHEN span_class IN ('root','entry','exit') THEN
      |      CASE WHEN status_code BETWEEN 400 AND 499 THEN 'client_errors'
      |           WHEN status_code BETWEEN 500 AND 599 THEN 'server_errors' END
      |    END AS error_type,
      |    CASE WHEN span_class IN ('root','entry','exit') AND url IS NOT NULL
      |         THEN regexp_replace(url, 'https?://.+?((/[^/?]+){1,2}).*', '\1')
      |         ELSE tool END AS request_context,
      |    CASE WHEN span_class = 'exit' THEN 'outbound'
      |         WHEN span_class IN ('root','entry') THEN 'inbound'
      |         ELSE 'internal' END AS request_type
      |  FROM parsed
      |)""".stripMargin

  /** enrich stage: service dim join, entity key, threshold resolution,
    * error/slow flags (mirrors operators.Enrich) */
  val enrichedCte: String =
    s"""svc AS (
       |  SELECT p.*, p.tool AS service,
       |    COALESCE(d.namespace, '') AS namespace,
       |    COALESCE(d.env, 'dev') AS env,
       |    COALESCE(d.site, 'us-west-2') AS site,
       |    CASE WHEN COALESCE(d.namespace, '') <> '' THEN d.namespace || '#' || p.tool
       |         ELSE p.tool END AS service_key,
       |    '{env=' || COALESCE(d.env, 'dev') || ', namespace=' || COALESCE(d.namespace, '')
       |      || ', site=' || COALESCE(d.site, 'us-west-2') || '}#Service#' || p.tool AS entity_key
       |  FROM parsed2 p LEFT JOIN ${Dims.serviceValuesSql} d ON p.tool = d.service
       |),
       |enr AS (
       |  SELECT s.*,
       |    COALESCE(te.upper_threshold, td.upper_threshold, ${cfg.defaultLatencyThresholdSecs}) AS threshold,
       |    (s.error_type IS NOT NULL) AS is_error,
       |    (s.error_type IS NOT NULL AND NOT (${cfg.ignoreClientErrors} AND s.error_type = 'client_errors')) AS error_routable,
       |    (s.latency_secs > COALESCE(te.upper_threshold, td.upper_threshold, ${cfg.defaultLatencyThresholdSecs})) AS is_slow_span
       |  FROM svc s
       |  LEFT JOIN ${Dims.thresholdValuesSql} te
       |    ON s.entity_key = te.entity_key AND s.request_context = te.request_context AND te.request_context <> ''
       |  LEFT JOIN ${Dims.thresholdValuesSql} td
       |    ON s.entity_key = td.entity_key AND td.request_context = ''
       |)""".stripMargin

  /** route stage conv-level table (mirrors operators.Route.convRouting) */
  val routingCte: String =
    s"""seg AS (
       |  SELECT *,
       |    CASE span_class WHEN 'root' THEN 0 WHEN 'entry' THEN 1 WHEN 'exit' THEN 2 ELSE 3 END AS class_rank,
       |    min(turn_idx) OVER (PARTITION BY conv_id, service) AS seg_first_idx
       |  FROM enr
       |),
       |seg2 AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY conv_id, service ORDER BY class_rank, turn_idx) AS seg_rn,
       |    max(CASE WHEN class_rank < 3 THEN 1 ELSE 0 END) OVER (PARTITION BY conv_id, service) AS seg_has_main_i
       |  FROM seg
       |),
       |seg3 AS (
       |  SELECT *,
       |    max(CASE WHEN seg_rn = 1 AND class_rank < 3 THEN latency_secs END) OVER (PARTITION BY conv_id, service) AS seg_latency,
       |    max(CASE WHEN seg_rn = 1 AND class_rank < 3 THEN request_context END) OVER (PARTITION BY conv_id, service) AS seg_request,
       |    max(CASE WHEN seg_rn = 1 AND class_rank < 3 THEN ts END) OVER (PARTITION BY conv_id, service) AS seg_main_ts
       |  FROM seg2
       |),
       |flagged AS (
       |  SELECT *,
       |    CASE WHEN seg_has_main_i = 1 AND class_rank < 3 THEN
       |      CASE WHEN error_routable THEN 'error' WHEN is_slow_span THEN 'slow' END
       |    END AS span_flag
       |  FROM seg3
       |),
       |flag_pick AS (
       |  SELECT conv_id, span_flag AS flag_type, entity_key, seg_request, seg_latency, seg_main_ts,
       |         env, site, namespace, service,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY seg_first_idx, class_rank, turn_idx) AS rn
       |  FROM flagged WHERE span_flag IS NOT NULL
       |),
       |seg_pick AS (
       |  SELECT conv_id, entity_key, seg_request, seg_latency, seg_main_ts,
       |         env, site, namespace, service,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY seg_first_idx, class_rank, turn_idx) AS rn
       |  FROM flagged WHERE seg_has_main_i = 1 AND class_rank < 3
       |),
       |convs AS (
       |  SELECT g.conv_id, g.conv_start_ts, g.n_turns,
       |    f.flag_type,
       |    COALESCE(f.entity_key, s.entity_key) AS entity_key,
       |    COALESCE(f.seg_request, s.seg_request) AS request_context,
       |    COALESCE(f.seg_latency, s.seg_latency) AS latency,
       |    COALESCE(f.seg_main_ts, s.seg_main_ts) AS main_ts,
       |    COALESCE(f.env, s.env) AS env, COALESCE(f.site, s.site) AS site,
       |    COALESCE(f.namespace, s.namespace) AS namespace,
       |    COALESCE(f.service, s.service) AS service
       |  FROM (SELECT conv_id, min(ts) AS conv_start_ts, CAST(count(*) AS BIGINT) AS n_turns
       |        FROM flagged GROUP BY conv_id) g
       |  LEFT JOIN (SELECT * FROM flag_pick WHERE rn = 1) f ON g.conv_id = f.conv_id
       |  LEFT JOIN (SELECT * FROM seg_pick WHERE rn = 1) s ON g.conv_id = s.conv_id
       |  WHERE f.conv_id IS NOT NULL OR s.conv_id IS NOT NULL
       |),
       |capped AS (
       |  SELECT *,
       |    dense_rank() OVER (PARTITION BY entity_key ORDER BY request_first_ts, request_context) AS request_rank
       |  FROM (SELECT *, min(main_ts) OVER (PARTITION BY entity_key, request_context) AS request_first_ts FROM convs) c0
       |),
       |sampled AS (
       |  SELECT *,
       |    (request_rank > ${cfg.limitPerService}) AS request_capped,
       |    CASE WHEN flag_type IS NULL AND request_rank <= ${cfg.limitPerService}
       |         THEN epoch_us(main_ts) // $winMicros END AS sample_win
       |  FROM capped
       |),
       |sampled2 AS (
       |  SELECT *,
       |    CASE WHEN sample_win IS NOT NULL THEN
       |      row_number() OVER (PARTITION BY entity_key, request_context, sample_win ORDER BY main_ts, conv_id)
       |    END AS normal_rn
       |  FROM sampled
       |),
       |sampled3 AS (
       |  SELECT *,
       |    CASE WHEN request_capped THEN NULL
       |         WHEN flag_type IS NOT NULL THEN flag_type
       |         WHEN normal_rn = 1 THEN 'normal' END AS sample_type
       |  FROM sampled2
       |),
       |queued AS (
       |  SELECT *,
       |    CASE WHEN sample_type = 'error' THEN 'error'
       |         WHEN sample_type IN ('slow','normal') THEN 'slow' END AS queue_class
       |  FROM sampled3
       |),
       |topk AS (
       |  SELECT *,
       |    CASE WHEN queue_class IS NOT NULL THEN
       |      row_number() OVER (PARTITION BY entity_key, request_context, queue_class ORDER BY latency DESC, conv_id)
       |    END AS queue_rn
       |  FROM queued
       |),
       |routing AS (
       |  SELECT *,
       |    (queue_rn IS NOT NULL AND queue_rn <= ${cfg.topKPerRequest}) AS kept,
       |    CASE WHEN queue_rn IS NOT NULL AND queue_rn <= ${cfg.topKPerRequest} THEN
       |      CASE WHEN sample_type = 'error' THEN 'errors'
       |           WHEN sample_type = 'slow' THEN 'slow' ELSE 'normal' END
       |    END AS sink
       |  FROM topk
       |)""".stripMargin

  /** q13 oracle: the capped, config-labeled latency histogram (mirrors
    * Aggregates.cappedLabeledHistogram — metric_helper.go:85-183 cap +
    * label building, metrics.go:79-103 label registration). */
  def cappedHistogramOracle(
      limit: Int,
      extraLabels: Seq[String],
      buckets: Seq[Double]
  ): String = {
    val leCase = buckets
      .map(b => s"WHEN latency_secs <= $b THEN CAST($b AS DOUBLE)")
      .mkString("CASE ", " ", " ELSE 'infinity'::DOUBLE END")
    val extraSel = extraLabels
      .map(n => s"COALESCE(CAST(e.$n AS VARCHAR), '') AS ${graft.functions.Norm.promName(n)}")
    val labelNames = Seq("asserts_env", "asserts_site", "namespace", "service", "span_kind", "status_code") ++
      extraLabels.map(graft.functions.Norm.promName) ++
      Seq("asserts_request_type", "asserts_request_context", "asserts_error_type")
    val labelList = labelNames.mkString(", ")
    val ctes =
      s"""mrank AS (
         |  SELECT service_key, request_context,
         |    dense_rank() OVER (PARTITION BY service_key ORDER BY ctx_first_ts, request_context) AS ctx_rank
         |  FROM (SELECT service_key, request_context, min(ts) AS ctx_first_ts
         |        FROM enr WHERE span_class <> 'internal' GROUP BY 1, 2)
         |),
         |met AS (
         |  SELECT e.env AS asserts_env, e.site AS asserts_site, e.namespace, e.service,
         |    e.span_class AS span_kind,
         |    COALESCE(CAST(e.status_code AS VARCHAR), '') AS status_code,
         |    ${extraSel.map(_ + ",").mkString("\n    ")}
         |    COALESCE(e.request_type, '') AS asserts_request_type,
         |    COALESCE(e.request_context, '') AS asserts_request_context,
         |    COALESCE(e.error_type, '') AS asserts_error_type,
         |    $leCase AS le
         |  FROM enr e JOIN mrank r
         |    ON e.service_key = r.service_key AND e.request_context = r.request_context
         |  WHERE e.span_class <> 'internal' AND r.ctx_rank <= $limit
         |),
         |hist AS (
         |  SELECT $labelList, le, CAST(count(*) AS BIGINT) AS bucket_count
         |  FROM met GROUP BY ALL
         |)""".stripMargin
    query(
      s"""SELECT *, CAST(sum(bucket_count) OVER (PARTITION BY $labelList ORDER BY le) AS BIGINT) AS cumulative_count
         |FROM hist
         |ORDER BY $labelList, le""".stripMargin,
      parsedCte, enrichedCte, ctes
    )
  }

  /** Metric-path cardinality cap over `enr` (mirrors the fineRollup cap:
    * first LimitPerService distinct request contexts per service_key —
    * getServiceKey, metric_helper.go:87 — in first-seen order; over-cap
    * contexts emit no metrics). Keyed by service_key, the same key every
    * cap in the engine now uses (Aggregates.firstSeenRank). */
  val cappedEnrCte: String =
    s"""ctxrank AS (
       |  SELECT service_key, request_context,
       |    dense_rank() OVER (PARTITION BY service_key ORDER BY ctx_first_ts, request_context) AS ctx_rank
       |  FROM (SELECT service_key, request_context, min(ts) AS ctx_first_ts
       |        FROM enr WHERE span_class <> 'internal' GROUP BY 1, 2)
       |),
       |capped_enr AS (
       |  SELECT e.* FROM enr e JOIN ctxrank m
       |    ON e.service_key = m.service_key
       |   AND e.request_context = m.request_context
       |  WHERE e.span_class <> 'internal' AND m.ctx_rank <= ${cfg.limitPerService}
       |)""".stripMargin

  /** q15 oracle: RED rollup under the TTL-expiring cardinality cap
    * (mirrors Aggregates.ttlCappedRed — metric_helper.go:91-116 TTL
    * cache; eviction frees a slot for a later context). Event time tiled
    * into TTL windows; rank per (service_key, ttl window). */
  def ttlCappedRedOracle(limit: Int, ttlMinutes: Int, windowMinutes: Int): String = {
    val ttlMicros = ttlMinutes.toLong * 60L * 1000000L
    val winMicros = windowMinutes.toLong * 60L * 1000000L
    val ctes =
      s"""ttlcap AS (
         |  SELECT service_key, request_context, ttl_win FROM (
         |    SELECT service_key, request_context, ttl_win,
         |      dense_rank() OVER (PARTITION BY service_key, ttl_win
         |                         ORDER BY ctx_first_ts, request_context) AS ctx_rank
         |    FROM (SELECT service_key, request_context,
         |            epoch_us(ts) // $ttlMicros AS ttl_win, min(ts) AS ctx_first_ts
         |          FROM enr WHERE span_class <> 'internal' GROUP BY 1, 2, 3))
         |  WHERE ctx_rank <= $limit
         |),
         |ttl_enr AS (
         |  SELECT e.* FROM enr e JOIN ttlcap m
         |    ON e.service_key = m.service_key AND e.request_context = m.request_context
         |   AND epoch_us(e.ts) // $ttlMicros = m.ttl_win
         |  WHERE e.span_class <> 'internal'
         |)""".stripMargin
    query(
      s"""SELECT (epoch_us(ts) // $winMicros) * $winMicros AS win_start_us, service, request_context,
         |  CAST(count(*) AS BIGINT) AS requests,
         |  CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS errors,
         |  CAST(sum(dur_ms) AS DOUBLE) / 1000.0 AS duration_sum_secs,
         |  max(latency_secs) AS duration_max_secs
         |FROM ttl_enr GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
      parsedCte, enrichedCte, ctes
    )
  }

  /** q17 oracle: Prometheus text-exposition lines for the two
    * integer-valued metric families (trace counter + capped latency
    * histogram) — mirrors Aggregates.prometheusText label order,
    * le="+Inf" convention, and double-cast value formatting. */
  def promTextOracle(buckets: Seq[Double]): String = {
    val leCase = buckets
      .map(b => s"WHEN latency_secs <= $b THEN CAST($b AS DOUBLE)")
      .mkString("CASE ", " ", " ELSE 'infinity'::DOUBLE END")
    query(
      s"""SELECT line FROM (
         |  SELECT 'asserts_otelcol_build_info{version="${graft.operators.Aggregates.BuildVersion}"} 1.0' AS line
         |  UNION ALL
         |  SELECT 'asserts_trace_count_total{asserts_env="' || env || '",asserts_site="' || site
         |    || '"} ' || CAST(CAST(count(*) AS BIGINT) AS VARCHAR) || '.0' AS line
         |  FROM routing GROUP BY env, site
         |  UNION ALL
         |  SELECT 'otel_span_latency_seconds_bucket{service="' || service || '",le="'
         |    || CASE WHEN isinf(le) THEN '+Inf' ELSE CAST(le AS VARCHAR) END
         |    || '"} ' || CAST(cumulative_count AS VARCHAR) || '.0' AS line
         |  FROM (
         |    SELECT service, le,
         |      CAST(sum(bucket_count) OVER (PARTITION BY service ORDER BY le) AS BIGINT) AS cumulative_count
         |    FROM (SELECT service, $leCase AS le, CAST(count(*) AS BIGINT) AS bucket_count
         |          FROM capped_enr GROUP BY 1, 2)
         |  )
         |) ORDER BY line""".stripMargin,
      parsedCte, enrichedCte, routingCte, cappedEnrCte
    )
  }

  /** Assemble an oracle query: transcripts CTE + the given fragments +
    * final SELECT body. */
  def query(body: String, fragments: String*): String =
    (Transcripts.duckDbCte +: fragments).mkString(",\n") + "\n" + body

  def parsedQuery(body: String): String = query(body, parsedCte)
  def enrichedQuery(body: String): String = query(body, parsedCte, enrichedCte)
  def cappedEnrQuery(body: String): String = query(body, parsedCte, enrichedCte, cappedEnrCte)
  def routingQuery(body: String): String = query(body, parsedCte, enrichedCte, routingCte)

  // ---- documents / embeddings oracle fragments (training-data ops) ----

  private def sqlList(words: Seq[String]): String =
    words.map(w => "'" + w.replace("'", "''") + "'").mkString("[", ", ", "]")

  /** tokens + distinct word-3-gram shingles over `documents` (mirrors
    * TextAnalysis.tokens / Dedup.shingles) */
  val docShinglesCte: String =
    """WITH toks AS (
      |  SELECT *, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |  FROM toks
      |)""".stripMargin

  /** MinHash signature components (mirrors Dedup.minhashSignature) */
  val docMinhashCte: String = {
    val comps = (0 until graft.operators.Dedup.NumHashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i:' || s)))")
      .mkString("[", ", ", "]")
    val bands = (0 until graft.operators.Dedup.NumBands)
      .map { b =>
        val key = (0 until graft.operators.Dedup.BandSize)
          .map(r => s"sig[${b * graft.operators.Dedup.BandSize + r + 1}]")
          .mkString(" || '|' || ")
        s"SELECT doc_id, sig, $b AS band_idx, $key AS band_key FROM sig"
      }
      .mkString(" UNION ALL ")
    s"""sig AS (SELECT doc_id, $comps AS sig FROM sh),
       |bands AS ($bands)""".stripMargin
  }

  /** quantized embeddings (mirrors Similarity.quantize) */
  val embQuantCte: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |  FROM embeddings
      |)""".stripMargin

  /** Multi-table LSH bucket rows over the quantized embeddings `e` —
    * mirrors Similarity.bucketed with the identical quantized hyperplane
    * constants (one UNION ALL arm per table). */
  def lshBucketsCte(nTables: Int = 8, nPlanes: Int = 6, dims: Int = 64): String = {
    val arms = graft.operators.Similarity.planeTables(nTables, nPlanes, dims)
      .map { case (t, planes) =>
        s"  SELECT vec_id, v, $t AS table_idx, ${graft.operators.Similarity.bucketSql("v", planes)} AS bucket FROM e"
      }
      .mkString("\n  UNION ALL\n")
    s"tb AS (\n$arms\n)"
  }

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / sqrt(list_dot_product($a, $a) * list_dot_product($b, $b))"

  /** q31 oracle: multi-table LSH candidates -> exact cosine -> top-k. */
  def annLshOracle(k: Int): String =
    embQuantCte + ",\n" + lshBucketsCte() + s""",
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
       |  FROM tb c JOIN tb q
       |    ON c.table_idx = q.table_idx AND c.bucket = q.bucket
       |   AND q.vec_id < 5 AND q.vec_id <> c.vec_id
       |),
       |scored AS (
       |  SELECT q_id, n_id, ${cosSql("eq.v", "en.v")} AS cosine
       |  FROM cand JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id
       |),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
       |  FROM scored
       |)
       |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** q32 oracle: LSH-bucketed candidate pairs -> exact cosine filter. */
  def cosinePairsOracle(threshold: Double): String =
    embQuantCte + ",\n" + lshBucketsCte() + s""",
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM tb a JOIN tb b
       |    ON a.table_idx = b.table_idx AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |)
       |SELECT id_a, id_b, ${cosSql("ea.v", "eb.v")} AS cosine
       |FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
       |WHERE ${cosSql("ea.v", "eb.v")} >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** q56 oracle: recursive transitive closure over the q32 cosine
    * near-dup edge set (identical bucket geometry + quantized cosine),
    * then min reachable id per node — mirrors
    * Similarity.semanticClusters' min-label CC. */
  def semanticClustersOracle(threshold: Double): String =
    (embQuantCte + ",\n" + lshBucketsCte() + s""",
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM tb a JOIN tb b
       |    ON a.table_idx = b.table_idx AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |),
       |pairs AS (
       |  SELECT id_a, id_b
       |  FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
       |  WHERE ${cosSql("ea.v", "eb.v")} >= $threshold
       |),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT vec_id AS src, vec_id AS dst FROM embeddings
       |  UNION
       |  SELECT r.src, g.b FROM reach r JOIN edges g ON r.dst = g.a
       |)
       |SELECT src AS vec_id, min(dst) AS cluster_id, (src = min(dst)) AS is_canonical
       |FROM reach GROUP BY src ORDER BY vec_id""".stripMargin)
      .replaceFirst("^WITH ", "WITH RECURSIVE ")

  /** q33 oracle: IVF top-k (mirrors Similarity.ivfTopK — fixed centroid
    * vectors, nearest-centroid inverted lists, nProbe query probing). */
  def ivfOracle(k: Int, nCentroids: Int, nProbe: Int): String =
    embQuantCte + s""",
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $nCentroids),
       |ca AS (
       |  SELECT n_id, nv, c_id FROM (
       |    SELECT e.vec_id AS n_id, e.v AS nv, c.c_id,
       |      row_number() OVER (
       |        PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.c_id) AS rn
       |    FROM e, cent c
       |  ) WHERE rn = 1
       |),
       |qp AS (
       |  SELECT q_id, qv, c_id FROM (
       |    SELECT e.vec_id AS q_id, e.v AS qv, c.c_id,
       |      row_number() OVER (
       |        PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.c_id) AS rn
       |    FROM e, cent c WHERE e.vec_id < 5
       |  ) WHERE rn <= $nProbe
       |),
       |scored AS (
       |  SELECT q.q_id, a.n_id, ${cosSql("q.qv", "a.nv")} AS cosine
       |  FROM qp q JOIN ca a ON q.c_id = a.c_id AND q.q_id <> a.n_id
       |),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
       |  FROM scored
       |)
       |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** q48 oracle: IVF + int8 scalar quantization (mirrors
    * Similarity.ivfInt8TopK — full-precision centroid assignment on both
    * sides, int8 compressed-domain scoring inside the probed lists). */
  def ivfInt8Oracle(k: Int, nCentroids: Int, nProbe: Int): String =
    embQuantCte + s""",
       |e8 AS (
       |  SELECT vec_id,
       |    CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
       |         ELSE list_transform(v, x -> CAST(round(127.0 * x / m) AS BIGINT))
       |    END AS v8
       |  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM e)
       |),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $nCentroids),
       |ca AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT e.vec_id AS n_id, c.c_id,
       |      row_number() OVER (
       |        PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.c_id) AS rn
       |    FROM e, cent c
       |  ) WHERE rn = 1
       |),
       |qp AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT e.vec_id AS q_id, c.c_id,
       |      row_number() OVER (
       |        PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.c_id) AS rn
       |    FROM e, cent c WHERE e.vec_id < 5
       |  ) WHERE rn <= $nProbe
       |),
       |scored AS (
       |  SELECT q.q_id, a.n_id, ${cosSql("q8.v8", "n8.v8")} AS cosine_q8
       |  FROM qp q JOIN ca a ON q.c_id = a.c_id AND q.q_id <> a.n_id
       |  JOIN e8 q8 ON q8.vec_id = q.q_id
       |  JOIN e8 n8 ON n8.vec_id = a.n_id
       |),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine_q8 DESC, n_id) AS INT) AS rank
       |  FROM scored
       |)
       |SELECT q_id, n_id, rank, cosine_q8 FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** q27 oracle: md5-lower-64 token-hash SimHash (bit-identical to the
    * SimHash64Expr kernel), 2-chunk-agreement multi-index candidates
    * (mirrors Dedup.simhashChunkCombos), exact hamming. */
  def simhashOracle(maxHamming: Int): String = {
    val (bits, combos) = graft.operators.Dedup.simhashChunkCombos(maxHamming)
    val mask = (1L << bits) - 1
    val sums = (0 until 64)
      .map(b => s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    val assemble = (0 until 64).map { b =>
      val v = java.lang.Long.toUnsignedString(1L << b)
      s"CASE WHEN COALESCE(s$b, 0) > 0 THEN CAST('$v' AS UBIGINT) ELSE CAST(0 AS UBIGINT) END"
    }.mkString("(", "\n    + ", ")")
    val chunkArms = combos
      .map { case (i, j) =>
        s"  SELECT doc_id, sh64, $i AS c1, $j AS c2, (sh64 >> ${i * bits}) & $mask AS v1, (sh64 >> ${j * bits}) & $mask AS v2 FROM sim"
      }
      .mkString("\n  UNION ALL\n")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[ \\t\\n\\r]+'), x -> x <> '')) AS t
       |  FROM documents
       |),
       |hh AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok),
       |bitsums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM hh GROUP BY doc_id
       |),
       |sim AS (
       |  SELECT d.doc_id,
       |    $assemble AS sh64
       |  FROM documents d LEFT JOIN bitsums USING (doc_id)
       |),
       |chunks AS (
       |$chunkArms
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh64 AS ha, b.sh64 AS hb
       |  FROM chunks a JOIN chunks b
       |    ON a.c1 = b.c1 AND a.c2 = b.c2 AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(ha, hb)) <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin
  }

  val stopwordList: String = sqlList(graft.operators.TextAnalysis.stopwordsEn)

  /** Winnowing fingerprint sets (mirrors Dedup.winnowingFingerprints
    * with k=8, w=4) — fragments ending in `wfps(doc_id, fp)`. */
  val winnowingCte: String =
    """WITH wg AS (
      |  SELECT doc_id, CAST(unnest(range(1, greatest(len(text) - 7, 1) + 1)) AS INT) AS i, text
      |  FROM documents
      |),
      |wh AS (
      |  SELECT doc_id, i,
      |    md5_number_lower(substr(text, i, 8)) & CAST(9223372036854775807 AS UBIGINT) AS hh
      |  FROM wg
      |),
      |wfps AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id, min(hh) OVER (
      |      PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |    FROM wh
      |  )
      |)""".stripMargin

  /** Deterministic hash split (mirrors Dedup.trainSplit) — fragment
    * `spl(doc_id, split)`. */
  val trainSplitCte: String =
    """spl AS (
      |  SELECT doc_id,
      |    CASE WHEN (md5_number_lower(CAST(doc_id AS VARCHAR) || ':split')
      |               & CAST(9223372036854775807 AS UBIGINT)) % 100 < 90 THEN 'train'
      |         WHEN (md5_number_lower(CAST(doc_id AS VARCHAR) || ':split')
      |               & CAST(9223372036854775807 AS UBIGINT)) % 100 < 95 THEN 'validation'
      |         ELSE 'test' END AS split
      |  FROM documents
      |)""".stripMargin

  /** Synthetic media rows (mirrors Multimodal.syntheticMedia): payload as
    * a hex string so frame slicing stays byte-aligned in SQL (DuckDB 1.0
    * has no BLOB substring); unhex at the edges. */
  val syntheticMediaCte: String =
    """WITH media AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    CAST(32 + (doc_id % 32) * 8 AS INT) AS width,
      |    CAST(32 + ((doc_id * 7) % 32) * 8 AS INT) AS height,
      |    md5(CAST(doc_id AS VARCHAR) || ':0') || md5(CAST(doc_id AS VARCHAR) || ':1')
      |      || md5(CAST(doc_id AS VARCHAR) || ':2') || md5(CAST(doc_id AS VARCHAR) || ':3') AS hex
      |  FROM documents
      |)""".stripMargin

  /** DuckDB expression mirroring Norm.promName (utils.go:140-158). */
  def duckPromName(inner: String): String = {
    val base = s"replace($inner, '%', '_percent')"
    val repl = " ,\t/\\.-:=“@<>".foldLeft(base) { (acc, ch) =>
      ch match {
        case '\t' => s"replace($acc, chr(9), '_')"
        case c => s"replace($acc, '$c', '_')"
      }
    }
    s"lower($repl)"
  }

  def langScoreExprs: Seq[(String, String)] =
    graft.operators.TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> s"len(list_filter(toks, x -> list_contains(${sqlList(words)}, x)))"
    }
}
