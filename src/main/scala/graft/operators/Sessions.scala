package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event sessionization: group each user's events into sessions separated
  * by MORE THAN `gapMinutes` of inactivity (session end = last event +
  * gap, INCLUSIVE: an event exactly at the gap boundary merges —
  * spec-pinned) — the session-boundary step of a
  * behavioral / agent-trace pipeline (the reference's per-conversation
  * grouping is the fixed-key analogue; sessions are the event-time-gap
  * generalization, reference trace grouping: assertsprocessor/trace.go).
  *
  * Uses Spark's native `session_window` aggregation: a first-class
  * event-time session operator (merging windows inside the aggregation,
  * no self-join, no window-function pass) that also runs UNCHANGED as a
  * watermarked Structured Streaming aggregation — the batch and
  * streaming plans share this exact declaration.
  *
  * Scale shape: one partial-aggregable session aggregation keyed by
  * (user_id); Spark merges overlapping session fragments at shuffle
  * time, so a user's events need not be pre-sorted and a hot user is
  * still one post-merge group, never a per-event window partition.
  * Session end follows the session_window convention: last event time +
  * gap.
  */
object Sessions {

  /** `watermark`: set for the streaming form (e.g. `Some("10 minutes")`)
    * — sessions finalize and emit once (Append) when the watermark passes
    * their end; batch callers leave it None. Same declaration otherwise. */
  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: Option[String] = None
  ): DataFrame = {
    val base = events.withColumn("ts_t", col("ts").cast("timestamp"))
    watermark
      .map(w => base.withWatermark("ts_t", w))
      .getOrElse(base)
      .groupBy(col("user_id"), session_window(col("ts_t"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        expr("unix_micros(w.start)").as("session_start_us"),
        expr("unix_micros(w.end)").as("session_end_us"),
        col("n_events")
      )
  }
}
