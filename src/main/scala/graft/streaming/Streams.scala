package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/**
 * Structured Streaming surface over the `events` table shape
 * (event_id, ts, user_id, event_type, value, props).
 *
 * The reference engine has no streaming at all (SURVEY.md §1.3); this
 * module is the forward-looking half of the north rule's ingest story: the
 * same co-occurrence edge derivation the batch ingest performs, expressed
 * incrementally — watermarked windows instead of full-table groupBys, so a
 * 100 TB/day event firehose feeds the link graph without re-scanning
 * history. All transforms are watermark-bounded: state is dropped once an
 * event-time window closes, which is what makes them runnable forever.
 */
object Streams {

  /** Schema-locked streaming read over a parquet events directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Tumbling-window per-type aggregates with a late-event watermark —
   *  the canonical readStream → withWatermark → window → agg shape. */
  def windowedTypeCounts(events: DataFrame,
      window: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("events"), col("total_value"))

  /**
   * Incremental co-occurrence edges: two users active in the same window
   * become an edge (u1 < u2 canonical) — the streaming counterpart of the
   * batch commit-co-occurrence derivation. Implemented as a watermarked
   * stream-stream self-join on the window key; Spark buffers only
   * in-watermark windows of per-user activity.
   */
  def cooccurrenceEdges(events: DataFrame,
      window: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val active = events
      .withWatermark("ts", watermark)
      .select(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("user_id"), col("ts"))
      .dropDuplicates("w", "user_id")
    val l = active.select(col("w").as("wl"), col("user_id").as("u1"), col("ts").as("tsl"))
    val r = active.select(col("w").as("wr"), col("user_id").as("u2"), col("ts").as("tsr"))
    l.join(r, expr("wl = wr AND u1 < u2"))
      .select(col("u1").as("src"), col("u2").as("dst"),
        col("wl.start").as("window_start"), lit(1.0).as("weight"))
  }

  /** Watermarked exact dedup on event_id — duplicates beyond the
   *  watermark horizon are already impossible, so state stays bounded. */
  def dedupedEvents(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id", "ts")

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class SessionState(start: Long, last: Long, events: Int, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, events: Int, total_value: Double)

  /**
   * Gap-based session windows per user: a session closes after
   * `gapMillis` of inactivity (event-time, enforced by the state timeout).
   * The KeyValueGroupedDataset.flatMapGroupsWithState form — custom state
   * the built-in window() cannot express.
   */
  def sessionize(events: Dataset[Event], gapMillis: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start), new Timestamp(s.last),
              s.events, s.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMillis =>
                  cur = Some(s.copy(last = t, events = s.events + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= Session(user, new Timestamp(s.start),
                    new Timestamp(s.last), s.events, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }
}
