package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet star-schema loaders for the driver fixtures (TESTDATA.md).
  *
  * Every query reads `"$sfDir/<table>.parquet"`. The events table carries
  * nanosecond-precision timestamps, which Spark's vectorized parquet reader
  * rejects by default — [[Sessions.tune]] flips the legacy nanos-as-long
  * switch so we can read it and normalize explicitly (see [[Tables.events]]).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")

  /** events.parquet stores TIMESTAMP(NANOS). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` Spark surfaces it as a
    * LongType nanos-since-epoch column; we convert to a microsecond
    * TimestampType here (same truncation DuckDB applies reading NS into
    * its microsecond TIMESTAMP).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast(LongType)))
      case _ => raw
    }
  }
}

object Sessions {
  /** Session tuning every entry point applies. Idempotent. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}

/** Expression helpers shared by queries and their DuckDB oracle twins. */
object Exprs {
  /** Order-independent exact money sum.
    *
    * Summing raw doubles is non-associative, so a shuffle-order change (or
    * an engine change: Spark vs DuckDB) can flip low bits and break the
    * driver's hash compare. Casting each addend to DECIMAL(38,6) first makes
    * the aggregation exact and order-free; no IEEE double is exactly halfway
    * between two scale-6 decimals (that would need a factor 5^7 denominator),
    * so the per-row rounding is also engine-independent. The final cast back
    * to double is IEEE round-to-nearest in both engines.
    *
    * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  /** Windowed variant of [[dsum]] — exact partition-wide sum. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(38, 6))).over(w).cast(DoubleType)

  /** SQL fragment twin of [[dsum]] for oracle authoring. */
  def dsumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"
}
