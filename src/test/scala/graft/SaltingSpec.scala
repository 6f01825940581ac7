package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale pattern: salted two-level aggregation for skewed keys — the
  * same decomposition w6/ANN use for top-k, shown for a plain aggregate.
  * A key holding 90% of rows turns one reducer into the job's critical
  * path; salting spreads the partial aggregation over N subkeys and the
  * final level combines N partials per key. Results must be identical —
  * the partial/final split of sum/count is exact (and money sums stay
  * exact through the decimal path). */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-level aggregate equals the direct aggregate on a skewed key") {
    // 90% of rows on key "hot"
    val df = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 37}", i.toDouble))
    val skewed = df.toDF("key", "v").repartition(8)

    val direct = skewed.groupBy($"key")
      .agg(Exprs.dsum($"v").as("total"), count(lit(1)).as("n"))

    val salted = skewed
      .withColumn("salt", pmod(hash($"v"), lit(16)))
      .groupBy($"key", $"salt")
      .agg(sum($"v".cast("decimal(38,6)")).as("ptotal"), count(lit(1)).as("pn"))
      .groupBy($"key")
      .agg(sum($"ptotal").cast("double").as("total"), sum($"pn").as("n"))

    val d = direct.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val s = salted.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(d == s)
    assert(d("hot")._2 == 9000L)
  }
}
