package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Custom per-key streaming state via mapGroupsWithState — the engine
  * piece the reference's queue status machine would need if its workers
  * tracked per-task retry counts across batches (SURVEY §2.9 T4/T6). */
class StatefulStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-key attempt counter survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)] // (task_id, outcome)

    def track(taskId: Long, events: Iterator[(Long, String)],
        state: GroupState[Int]): (Long, Int, String) = {
      val attempts = state.getOption.getOrElse(0) + events.size
      state.update(attempts)
      (taskId, attempts, if (attempts >= 3) "erro_permanente" else "pendente")
    }

    val out = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(track)
      .toDF("task_id", "attempts", "status")

    val q = out.writeStream.format("memory").queryName("task_state")
      .outputMode(OutputMode.Update()).start()

    input.addData((1L, "fail"), (2L, "fail"))
    q.processAllAvailable()
    input.addData((1L, "fail"))
    q.processAllAvailable()
    input.addData((1L, "fail"), (2L, "fail"))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("task_state")
      .groupBy("task_id").agg(org.apache.spark.sql.functions.max("attempts").as("attempts"))
      .as[(Long, Int)].collect().toMap
    assert(last(1L) == 3, "task 1 seen three times across batches")
    assert(last(2L) == 2)
    val statuses = spark.table("task_state")
      .filter($"attempts" === 3).select("status").as[String].collect()
    assert(statuses.forall(_ == "erro_permanente"))
  }
}
