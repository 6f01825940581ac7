package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY §7 scale posture).
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both
  * sides. Writing each side bucketed (and sorted) BY THE JOIN KEY into
  * the warehouse pre-partitions the data on disk: a later join of two
  * tables bucketed on the same key with the same bucket count planfully
  * skips both exchanges — a sort-merge join straight off the scan. This
  * is the pay-once-shuffle-many-reads trade every recurring pipeline
  * (the reference's nightly consolidation) wants.
  *
  * Parquet bucketed tables are catalog-backed (`saveAsTable`) — the
  * bucket spec lives in table metadata, which is why this writes tables,
  * not bare directories. `BucketedJoinSpec` pins the no-Exchange plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted warehouse table. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket keys. With equal
    * bucket counts the planner elides both shuffles (and with sorted
    * buckets, both sorts). */
  def cobucketedJoin(
      spark: SparkSession,
      leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
