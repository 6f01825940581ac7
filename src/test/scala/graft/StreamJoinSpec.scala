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

  test("stream-static join: events enrich from the part dim, stateless") {
    // The S5 enrichment shape as a stream: each micro-batch joins the
    // bounded dim — broadcast, no streaming state, no watermark needed
    // (the static side never changes within the query's lifetime).
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.part(spark, TestSpark.sf0001)
      .select($"p_partkey", $"p_brand")
    val events = MemoryStream[Long]
    val enriched = events.toDF().toDF("p_partkey")
      .join(broadcast(dim), Seq("p_partkey"), "left")

    val q = enriched.writeStream
      .format("memory").queryName("ss_static").outputMode("append").start()
    try {
      events.addData(1L, 2L, 999999L) // two real parts, one unknown
      q.processAllAvailable()
      val out = spark.table("ss_static")
        .as[(Long, Option[String])].collect().toMap
      val expected = dim.filter($"p_partkey".isin(1L, 2L))
        .as[(Long, String)].collect().toMap
      assert(out(1L) == Some(expected(1L)) && out(2L) == Some(expected(2L)))
      assert(out(999999L).isEmpty, "unknown key must keep the event with null dim")
    } finally q.stop()
  }
}
