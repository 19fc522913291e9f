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

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every declared query reaches its data through here with the
    // session that will ANALYZE its plan — the one deterministic spot
    // to register the vector natives Vectors.dot/normSq and Pq.l2sq
    // now emit (a thread-inherited getActiveSession fallback proved
    // unreliable under multi-session test JVMs). Idempotent per session.
    graft.expressions.FloatDot.register(spark)
    graft.expressions.FloatL2sq.register(spark)
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))
  }

  /** `events.ts` arrives in whatever physical type the fixture generator
    * chose, so resolve it by SCHEMA, not by assumption:
    *  - parquet TIMESTAMP(NANOS) (older fixtures): Spark's TimestampType
    *    (micros) cannot hold it; `nanosAsLong` reads raw nanos and
    *    `ts div 1000` rebuilds a timestamp — lossless because the data
    *    is micro-precision (every ts has ns%1000 == 0). Integer `div`,
    *    not `/`: epoch nanos ≈ 1.7e18 exceeds double's exact range.
    *  - parquet TIMESTAMP without timezone (current fixtures): Spark
    *    reads TIMESTAMP_NTZ; cast to the session-zone TimestampType the
    *    operators expect — the session zone is pinned to UTC everywhere
    *    (Bench/Verify/specs), so the wall clock is preserved exactly as
    *    the DuckDB oracle sees it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Try the plain read first: current fixtures are micro-precision and
    // need no flag. Only a TIMESTAMP(NANOS) fixture fails here — for
    // those, nanosAsLong must be set AND STAY set (the scan re-resolves
    // it at every execution, so scoping/restoring it would break later
    // actions on the cached plan). The flip is session-global by
    // necessity: any other nanos-timestamp parquet read on the same
    // session will then also see raw longs — acceptable only because it
    // happens solely when a nanos events fixture is in play.
    val raw =
      try table(spark, dir, "events")
      catch {
        // retry ONCE with the flag on ANY read failure, not just ones
        // whose message pattern-matches a nanos complaint: error text
        // shifts across Spark versions, and a nanos fixture whose error
        // matched neither sniffed pattern would fail outright where it
        // used to read fine. The error class, when the exception carries
        // one, is logged for the diagnosable case; the retry itself is
        // unconditional. A NON-nanos failure (missing file, corrupt
        // footer) fails the retry identically — the flag is undone and
        // the ORIGINAL error propagates, so nothing is masked.
        case e: Exception =>
          val cls = e match {
            case t: org.apache.spark.SparkThrowable => String.valueOf(t.getCondition)
            case _ => "(no error class)"
          }
          System.err.println(
            s"[tables] events read failed ($cls); retrying with nanosAsLong=true")
          // the failed read never enters the cache, so this re-read with
          // the flag set is what gets cached; if the retry fails too the
          // failure wasn't the nanos type — RESTORE the prior flag value
          // rather than unsetting: a prior successful nanos read from a
          // different dir may have set it, and its cached plan
          // re-resolves the conf at every execution, so clobbering it
          // would break that table retroactively
          val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try table(spark, dir, "events")
          catch {
            case _: Exception =>
              prior match {
                case Some(v) =>
                  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
                case None =>
                  spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
              }
              throw e
          }
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // explicit TimestampType, not cast("timestamp"): the string form
        // resolves via spark.sql.timestampType and would silently become
        // a no-op NTZ cast if that conf were ever switched
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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
