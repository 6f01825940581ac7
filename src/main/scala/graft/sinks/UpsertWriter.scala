package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Real write-path for the reference's sink operators (SURVEY §2.2):
  *
  *  - K1 `INSERT … ON DUPLICATE KEY UPDATE` → [[upsert]]: keyed
  *    keep-latest merge into a parquet table. When the table is
  *    partitioned, only partitions touched by the updates are rewritten
  *    (dynamic partition overwrite — the 100 TB behavior: a daily restate
  *    rewrites days, not the table). Unpartitioned tables are rewritten
  *    via a staging directory + atomic-ish swap, since parquet can't be
  *    read and overwritten in one job.
  *  - K5 `TRUNCATE TABLE` → [[truncate]]: overwrite with empty.
  *
  * On a lakehouse this is `MERGE INTO` (Delta/Iceberg); plain parquet is
  * the driver-fixture contract here and the merge semantics are the same:
  * last-write-wins per key, ties broken to the update side.
  */
object UpsertWriter {

  /** A table "exists" only when its last write COMMITTED (_SUCCESS
    * marker). A directory left by a crashed partial write is treated as
    * absent and re-initialized rather than merged — the crash-safe
    * contract QueueWorker's idempotent acks rely on. */
  private def exists(path: String): Boolean =
    Files.exists(Paths.get(path, "_SUCCESS"))

  /** Merge `updates` into the keyed table at `path`.
    *
    * @param keys       merge key columns (the reference PK)
    * @param versionCol highest value wins per key; updates win ties
    *                   (the reference's last-write-wins upsert)
    * @param partitionBy optional partition columns → dynamic overwrite of
    *                    touched partitions only
    */
  def upsert(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keys: Seq[String],
      versionCol: String,
      partitionBy: Seq[String] = Nil): Unit = {

    val merged: DataFrame = if (!exists(path)) {
      dedup(updates.withColumn("__upd", lit(1)), keys, versionCol)
    } else {
      val existing = spark.read.parquet(path)
      val scoped =
        if (partitionBy.isEmpty) existing
        else // only partitions the updates touch participate in the rewrite
          existing.join(
            broadcast(updates.select(partitionBy.map(col): _*).distinct()),
            partitionBy, "left_semi")
      dedup(
        scoped.withColumn("__upd", lit(0))
          .unionByName(updates.withColumn("__upd", lit(1))),
        keys, versionCol)
    }

    if (partitionBy.nonEmpty && exists(path)) {
      // Dynamic partition overwrite: replaces exactly the partitions
      // present in `merged`, leaves the rest of the table untouched.
      // Session conf is restored afterwards — leaking `dynamic` would
      // silently change the meaning of every later Overwrite write in
      // this session.
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        merged.write.mode(SaveMode.Overwrite)
          .partitionBy(partitionBy: _*).parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    } else if (partitionBy.nonEmpty) {
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionBy: _*).parquet(path)
    } else {
      // Unpartitioned: stage the merged state, then swap directories.
      val staging = path + ".__staging"
      merged.write.mode(SaveMode.Overwrite).parquet(staging)
      val target = Paths.get(path)
      if (Files.exists(target)) {
        import scala.jdk.CollectionConverters._
        Files.walk(target).iterator().asScala.toSeq.reverse
          .foreach(Files.delete)
      }
      Files.move(Paths.get(staging), target)
    }
  }

  private def dedup(unioned: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__upd").desc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__upd")
  }

  /** K5: truncate = overwrite the table with an empty slice of itself. */
  def truncate(spark: SparkSession, path: String): Unit = {
    val empty = spark.read.parquet(path).limit(0)
    val staging = path + ".__staging"
    empty.write.mode(SaveMode.Overwrite).parquet(staging)
    val target = Paths.get(path)
    import scala.jdk.CollectionConverters._
    Files.walk(target).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    Files.move(Paths.get(staging), target)
  }
}
