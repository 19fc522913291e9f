package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Humio-style log-analytics surface the reference connector feeds
  * (SURVEY.md §2.3-B: timechart, sliding windows, sessionization, top-k,
  * distinct, percentiles, dedup, late-data policy), as reusable Spark
  * operators over an event table (`ts` timestamp, keyed columns).
  *
  * Scale notes (100 TB): every operator here is a single hash shuffle on
  * its grouping key with map-side partial aggregation, or a single window
  * shuffle on its partition key. None buffers unbounded state per key
  * except the window sorts, which Tungsten spills. Skewed keys (one hot
  * user) are the risk for the window ops — at cluster scale mitigate with
  * AQE skew handling; the operators take the partition key as a Column so
  * callers can salt.
  */
object LogAnalytics {

  /** Tumbling-window counts ("timechart"): bucket event-time to `unit`
    * (e.g. "hour") × a dimension. Partial-aggregates map-side; output
    * cardinality is buckets×dims, tiny at any input scale.
    */
  def timechart(events: DataFrame, unit: String, dim: Column): DataFrame =
    events.groupBy(
        unix_millis(date_trunc(unit, col("ts"))).as("bucket_ms"),
        dim.as("dim"))
      .agg(count(lit(1)).as("n"))

  /** Sliding average of `valueCol` over the trailing `windowMs` of
    * event-time within each `part` group. RANGE frame on epoch millis so
    * frame membership depends only on timestamp values (deterministic
    * under ties). The sum runs over exact integer cents (fixture values
    * are 2-decimal) with one final division — float-summation order then
    * cannot perturb the result, engine to engine.
    */
  def slidingAvg(events: DataFrame, part: Column, valueCol: Column, windowMs: Long): Column = {
    // order by epoch millis derived from ts directly — no hidden
    // precondition of a pre-computed ts_ms column
    val w = Window.partitionBy(part).orderBy(unix_millis(col("ts")))
      .rangeBetween(-windowMs, Window.currentRow)
    val cents = round(valueCol * 100).cast("bigint")
    sum(cents).over(w) / (count(lit(1)).over(w) * 100.0)
  }

  /** Gaps-and-islands sessionization: a new session starts when the gap
    * to the previous event of the same key exceeds `gapMs` (batch twin of
    * streaming `session_window`). One shuffle on the key; the running sum
    * is computed within each sorted partition.
    */
  def sessionize(events: DataFrame, key: Column, gapMs: Long,
                 order: Seq[Column] = Seq(col("ts"), col("event_id"))): DataFrame = {
    val wOrd  = Window.partitionBy(key).orderBy(order: _*)
    val prevMs = lag(unix_millis(col("ts")), 1).over(wOrd)
    val isBreak = when(prevMs.isNull, lit(0))
      .when(unix_millis(col("ts")) - prevMs > gapMs, lit(1))
      .otherwise(lit(0))
    events
      .withColumn("brk", isBreak)
      .withColumn("session_id",
        sum(col("brk")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("bigint"))
      .drop("brk")
  }

  /** Top-k values of `dim` by count. Spark plans the global phase as
    * TakeOrderedAndProject over the (tiny) aggregated set — no full sort.
    */
  def topK(events: DataFrame, dim: Column, k: Int): DataFrame =
    events.groupBy(dim.as("dim")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("dim"))
      .limit(k)

  /** Exact + approximate (HLL) distinct users per dimension. At 100 TB
    * prefer the HLL column: it partial-aggregates to a fixed-size sketch
    * instead of shuffling every distinct key occurrence.
    */
  def distinctUsers(events: DataFrame, dim: Column, user: Column): DataFrame =
    events.groupBy(dim.as("dim"))
      .agg(count_distinct(user).as("n_exact"),
           approx_count_distinct(user).as("n_approx"))

  /** Sketch resolution shared by every approximate-percentile surface
    * (this operator and the DSL's percentile(approx=true)): relative
    * rank error ≤ 1/accuracy. One policy constant so the two can't
    * drift apart.
    */
  val ApproxPercentileAccuracy = 10000

  // the one grouped-percentile shape both twins share: detRound4 (not
  // round(): cross-engine rounding convention — engine round() semantics
  // differ on edge doubles vs the DuckDB oracle), p*100 column names,
  // one hash aggregate per dim
  private def pctByDim(events: DataFrame, dim: Column, ps: Seq[Double],
                       agg: Double => Column): DataFrame = {
    val aggs = ps.map(p => graft.functions.Det
      .detRound4(agg(p)).as(s"p${(p * 100).toInt}"))
    events.groupBy(dim.as("dim")).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact interpolated percentiles of `v` per dimension (DuckDB
    * `quantile_cont` twin). Exact percentile holds all values per group —
    * fine for bounded dims; at 100 TB with high-cardinality groups switch
    * to `percentile_approx` ([[percentilesApprox]]).
    */
  def percentiles(events: DataFrame, dim: Column, v: Column, ps: Seq[Double]): DataFrame =
    pctByDim(events, dim, ps, p => percentile(v, lit(p)))

  /** Approximate percentiles per dimension — the 100 TB twin of
    * [[percentiles]]. The exact `percentile` aggregate's merge buffer
    * holds EVERY distinct value of the group; with continuous doubles
    * and few groups that is ~corpus-sized on one reducer at scale.
    * `percentile_approx` instead keeps a FIXED-SIZE mergeable quantile
    * summary (Greenwald–Khanna) per group: partials are sketch-sized,
    * combine map-side, and merge associatively on the reducer — the
    * same partial-aggregate shape that makes approx_count_distinct the
    * scale plan for [[distinctUsers]]. Error is bounded by 1/accuracy
    * relative rank. Approximate by design → no cross-engine hash
    * oracle; callers declare it rows-only (the q_approx precedent).
    */
  def percentilesApprox(events: DataFrame, dim: Column, v: Column,
                        ps: Seq[Double],
                        accuracy: Int = ApproxPercentileAccuracy): DataFrame =
    pctByDim(events, dim, ps, p => percentile_approx(v, lit(p), lit(accuracy)))

  /** Keep-first dedup: first event per key set by (ts, tiebreak) order —
    * the deterministic batch twin of streaming
    * `dropDuplicatesWithinWatermark`. Single window shuffle on the keys.
    */
  def dedupKeepFirst(events: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    events.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  /** Late-data policy replay (batch twin of `withWatermark`): drop events
    * more than `latenessMs` behind the running max event-time of their
    * partition, in arrival (offset) order.
    */
  def dropLate(events: DataFrame, part: Column, arrivalOrder: Column, latenessMs: Long): DataFrame = {
    val w = Window.partitionBy(part).orderBy(arrivalOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("max_ts_ms", max(unix_millis(col("ts"))).over(w))
      .where(unix_millis(col("ts")) >= col("max_ts_ms") - latenessMs)
      .drop("max_ts_ms")
  }
}
