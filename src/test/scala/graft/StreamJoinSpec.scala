package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Stream-stream interval joins — the streaming twin of
  * `range_join_purchases_1h`: views matched to clicks that land within
  * one hour, with watermarks bounding the join state on both sides
  * (without them the runtime would buffer both streams forever). Covers
  * the inner form (matches only) and the left-outer form (the unmatched
  * view emits a null-click row once the watermark passes the end of its
  * join window — conversion-funnel drop-off detection as a stream).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner interval join matches clicks within 1h, rejects later ones") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val v = views.toDF().toDF("v_id", "v_ts").withWatermark("v_ts", "2 hours")
    val c = clicks.toDF().toDF("c_id", "c_ts").withWatermark("c_ts", "2 hours")
    val joined = v.join(
      c, expr("v_id = c_id AND c_ts >= v_ts AND c_ts <= v_ts + interval 1 hour"))
      .select($"v_id", $"c_ts")

    val q = joined.writeStream
      .format("memory").queryName("ssj_inner").outputMode("append").start()
    try {
      views.addData((1L, ts("2024-05-01 10:00:00")), (2L, ts("2024-05-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-05-01 10:30:00")), // inside the hour → match
        (2L, ts("2024-05-01 12:30:00"))) // 2.5 h later → no match
      q.processAllAvailable()
      val rows = spark.table("ssj_inner").as[(Long, Timestamp)].collect().toSet
      assert(rows == Set((1L, ts("2024-05-01 10:30:00"))))
    } finally q.stop()
  }

  test("left-outer interval join emits the unmatched view after the watermark closes its window") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val v = views.toDF().toDF("v_id", "v_ts").withWatermark("v_ts", "1 hour")
    val c = clicks.toDF().toDF("c_id", "c_ts").withWatermark("c_ts", "1 hour")
    val joined = v.join(
      c, expr("v_id = c_id AND c_ts >= v_ts AND c_ts <= v_ts + interval 1 hour"),
      "left_outer")
      .select($"v_id", $"v_ts", $"c_ts")

    val q = joined.writeStream
      .format("memory").queryName("ssj_outer").outputMode("append").start()
    try {
      views.addData((1L, ts("2024-05-01 10:00:00")), (2L, ts("2024-05-01 10:00:00")))
      clicks.addData((1L, ts("2024-05-01 10:15:00")))
      q.processAllAvailable()
      // matched row may emit immediately; the unmatched view (id 2) must
      // NOT have a null row yet — its join window is still open
      val early = spark.table("ssj_outer")
        .filter($"v_id" === 2L).count()
      assert(early == 0L, "outer row emitted before the watermark closed the window")

      // advance both watermarks well past v_ts + 1h join window + 1h delay
      views.addData((9L, ts("2024-05-01 15:00:00")))
      clicks.addData((9L, ts("2024-05-01 15:00:01")))
      q.processAllAvailable()
      // one more micro-batch so the state-store eviction emits outer rows
      views.addData((10L, ts("2024-05-01 16:00:00")))
      clicks.addData((10L, ts("2024-05-01 16:00:01")))
      q.processAllAvailable()

      val out = spark.table("ssj_outer")
        .select($"v_id", $"c_ts").as[(Long, Option[Timestamp])].collect().toSet
      assert(out.contains((1L, Some(ts("2024-05-01 10:15:00")))))
      assert(out.contains((2L, None)), s"missing outer null row in $out")
    } finally q.stop()
  }
}
