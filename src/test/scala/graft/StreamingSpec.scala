package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming surface: windowed aggs, stream-stream edges,
  * watermarked dedup, stateful sessionization. */
class StreamingSpec extends SparkSpec {

  private def ts(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  private def ev(id: Long, min: Int, user: Long, typ: String = "click",
      value: Double = 1.0): Streams.Event =
    Streams.Event(id, ts(min), user, typ, value, "{}")

  private def runBatches[T](q: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val query = q.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination(60000)
    ()
  }

  test("windowed type counts aggregate per tumbling window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(ev(1, 0, 1), ev(2, 5, 2), ev(3, 12, 1, "buy", 5.0), ev(4, 200, 9))
    val out = Streams.windowedTypeCounts(mem.toDF(), "10 minutes", "30 minutes")
    val q = out.writeStream.format("memory").queryName("wtc")
      .outputMode("append").start()
    mem.addData() // advance
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wtc").collect()
    // windows [0,10) click=2, [10,20) buy=1 are closed by the t=200 event's watermark
    val byKey = rows.map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byKey((ts(0), "click")) == 2L)
    assert(byKey((ts(10), "buy")) == 1L)
  }

  test("co-occurrence edges emit canonical pairs per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    // users 1,2,3 share window [0,10); user 7 alone later; t=300 closes all
    mem.addData(ev(1, 1, 1), ev(2, 2, 2), ev(3, 3, 3), ev(4, 15, 7), ev(5, 300, 8))
    val edges = Streams.cooccurrenceEdges(mem.toDF(), "10 minutes", "30 minutes")
    val q = edges.writeStream.format("memory").queryName("cooc")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("cooc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("watermarked dedup drops duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(ev(1, 0, 1), ev(1, 0, 1), ev(2, 1, 2), ev(3, 120, 3))
    val q = Streams.dedupedEvents(mem.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("sessionization closes sessions after the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    // user 1: events at 0,10 (one session), then 120 (new session);
    // watermark pushed far ahead by user 9 at t=600
    mem.addData(ev(1, 0, 1), ev(2, 10, 1), ev(3, 120, 1), ev(4, 600, 9))
    val q = Streams.sessionize(mem.toDS(), gapMillis = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    q.processAllAvailable()
    mem.addData(ev(5, 610, 9)) // extra batch lets timed-out state flush
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess")
      .where(col("user_id") === 1L).collect()
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
    assert(sessions.nonEmpty)
    // first session: [0, 10] with 2 events
    assert(sessions.exists { case (s, e, n) => s == ts(0) && e == ts(10) && n == 2 })
  }
}
