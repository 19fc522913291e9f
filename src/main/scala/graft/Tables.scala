package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader for the driver's parquet fixtures (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned scans over a data lake; the
  * library keeps every downstream operator agnostic of the physical layout
  * by always going through `spark.read.parquet` (columnar, vectorized,
  * pushdown-capable). Nothing below this line ever sees a file path.
  */
object Tables {
  // per-(session, path) plan cache: a DataFrame is an immutable logical
  // plan, so reusing it skips re-listing files and re-reading footers on
  // every one of the ~57 queries that touch the same ten tables.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (micros) cannot hold; read it as raw nanos and rebuild a timestamp.
    * The fixture data is micro-precision (verified: every ts has ns%1000
    * == 0), so `ts div 1000` is lossless. Integer `div`, not `/`: epoch
    * nanos ≈ 1.7e18 exceeds double's exact-integer range.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
