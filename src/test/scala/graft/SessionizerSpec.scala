package graft

import graft.streaming.Sessionizer
import graft.streaming.Sessionizer.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Event-time session windows via flatMapGroupsWithState: sessions close
  * on an in-stream gap AND on watermark timeout, matching the batch
  * sessionize_events gap rule evaluated incrementally. */
class SessionizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600_000L * 10 + min * 60_000L)
  private val GapMs = 10 * 60_000L // 10 minutes

  test("sessions close on gap within the stream and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionizer.closedSessions(
      input.toDS().withWatermark("ts", "0 seconds").as[Event], GapMs)

    val q = sessions.writeStream.format("memory").queryName("closed_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // one user, two bursts 30min apart: the second burst closes the first
      input.addData(Event(1L, 1L, ts(0)), Event(1L, 2L, ts(5)))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0, "session still open")

      input.addData(Event(1L, 3L, ts(35)))
      q.processAllAvailable()
      val afterGap = spark.table("closed_sessions")
        .as[Sessionizer.ClosedSession].collect()
      assert(afterGap.length == 1)
      assert(afterGap.head.user_id == 1L && afterGap.head.n_events == 2)
      assert(afterGap.head.session_start == ts(0) && afterGap.head.session_end == ts(5))

      // another user's much-later event advances the watermark past
      // user 1's (35min burst) end + gap → event-time timeout fires
      input.addData(Event(2L, 4L, ts(120)))
      q.processAllAvailable()
      input.addData(Event(2L, 5L, ts(121))) // one more batch so timeouts run
      q.processAllAvailable()
      val timedOut = spark.table("closed_sessions")
        .as[Sessionizer.ClosedSession].collect()
        .filter(s => s.user_id == 1L && s.n_events == 1)
      assert(timedOut.length == 1, "second session must close by timeout")
      assert(timedOut.head.session_start == ts(35))
    } finally q.stop()
  }

  test("an event exactly at the gap boundary extends the session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionizer.closedSessions(
      input.toDS().withWatermark("ts", "0 seconds").as[Event], GapMs)
    val q = sessions.writeStream.format("memory").queryName("boundary_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // Δ == gap extends (<=); Δ == gap + 1min closes
      input.addData(Event(3L, 1L, ts(0)), Event(3L, 2L, ts(10)), Event(3L, 3L, ts(21)))
      q.processAllAvailable()
      val closed = spark.table("boundary_sessions")
        .as[Sessionizer.ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed.head.n_events == 2 && closed.head.session_end == ts(10),
        "the exactly-at-gap event must belong to the first session")
    } finally q.stop()
  }

  test("unordered events inside one batch still form ordered sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionizer.closedSessions(
      input.toDS().withWatermark("ts", "0 seconds").as[Event], GapMs)
    val q = sessions.writeStream.format("memory").queryName("unordered_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // delivered out of order: (25), (0), (5) — one gap between 5 and 25
      input.addData(Event(7L, 3L, ts(25)), Event(7L, 1L, ts(0)), Event(7L, 2L, ts(5)))
      q.processAllAvailable()
      val closed = spark.table("unordered_sessions")
        .as[Sessionizer.ClosedSession].collect()
      assert(closed.length == 1, "first burst closes when 25min event is seen")
      assert(closed.head.n_events == 2 && closed.head.session_end == ts(5))
    } finally q.stop()
  }
}
