package graft.queries

import graft.Tables
import graft.query.HumioQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipe-language queries compiled by [[graft.query.HumioQuery]] and
  * checked against plain-SQL oracles — a differential proof that the
  * compiler's filters/aggregations/buckets mean what the SQL means.
  */
object HumioQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  def hqFilter(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "value > 450.0 | select(event_id, event_type) | sort(event_id)")

  def hqGroup(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type != error | groupBy(event_type) | sort(event_type)")

  def hqWildcard(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = c* | groupBy(event_type) | sort(event_type)")

  /** extract + typed filter on the promoted field — R3's parse surfaced
    * as a pipe stage.
    */
  def hqExtract(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "extract(props, k) | k >= 95 | select(event_id, k) | sort(event_id)")

  /** regex filter over event_type. */
  def hqRegex(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = /^(click|view)$/ | groupBy(event_type) | sort(event_type)")

  def hqTimechart(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "timechart(event_type, span=6h) | sort(_bucket_ms, event_type)")

  /** computed fields, both forms: eval(f = expr) and the `:=` stage. */
  def hqEval(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(bucket = user_id % 16) | b2 := bucket * 2 + 1 | b2 = 7 " +
        "| groupBy(event_type) | sort(event_type)")

  /** case block: first matching arm assigns, non-matching events drop. */
  def hqCase(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      """case { event_type = click | kind := "interactive" ;
        |       event_type = purchase | kind := "interactive" ;
        |       event_type = view | kind := "passive" }
        || groupBy(kind) | sort(kind)""".stripMargin.replace("\n", " "))

  /** top(percent=true): count share of the PRE-limit total per value. */
  def hqTopPct(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "value < 100 | top(event_type, limit=3, percent=true)")

  /** collect(): distinct values gathered into one sorted space-joined
    * field, limit-capped after the sort.
    */
  def hqCollect(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "value >= 300 | collect(event_type, limit=3, as=types)")

  /** multi-assignment case arms: first match wins, assignments run
    * sequentially within the arm, exact integer cents keep the summed
    * measure order-independent.
    */
  def hqCaseMulti(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      """case { event_type = click | kind := "i" | cents := round(value * 100) * 2 ;
        |       event_type = purchase | kind := "i" | cents := round(value * 100) * 10 ;
        |       event_type = view | kind := "p" | cents := round(value * 100) ;
        |       * | kind := "other" | cents := 0 }
        || groupBy(kind, function=[count(), sum(cents)]) | sort(kind)"""
        .stripMargin.replace("\n", " "))

  /** parseJson promotes several keys; absent keys become NULL columns. */
  def hqParsejson(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "parseJson(props, k, missing) | k >= 95 | select(event_id, k, missing) | sort(event_id)")

  /** named-capture regex extraction (drops non-matching events). */
  def hqRegexExtract(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      """regex(/"k": (?<knum>[0-9]+)/, field=props) | knum >= 95 """ +
        "| select(event_id, knum) | sort(event_id)")

  /** scalar functions inside eval expressions. */
  def hqEvalfn(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(tag = concat(upper(event_type), \"-\", length(event_type))) " +
        "| et_len := length(event_type) | et_len >= 5 " +
        "| groupBy(tag) | sort(tag)")

  /** top(field): most frequent values, count-desc with tie-break. */
  def hqTop(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir), "user_id < 50 | top(event_type, limit=3)")

  /** if() conditional eval — nested branches band `value`, a second arm
    * exercises `and` + a parenthesized condition group; NULL conditions
    * take the else branch (CASE WHEN semantics in both engines).
    */
  def hqIf(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(band = if(value >= 100, then=\"high\", " +
        "else=if(value >= 10, then=\"mid\", else=\"low\"))) " +
        "| mid2 := if((value >= 10 and value < 55) or value >= 300, then=1, else=0) " +
        "| groupBy(band, mid2) | sort(band, mid2)")

  /** stdDev() aggregate — exact integer second moments (DECIMAL sums of
    * round(x·2^20) quantized values), so the sample stddev is
    * partition-order-independent and the DuckDB oracle replays the same
    * formula bit-for-bit (its own stddev_samp would float-sum in row
    * order).
    */
  def hqStddev(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "groupBy(event_type, function=[count(), stdDev(value)]) | sort(event_type)")

  /** string predicates startsWith/endsWith/contains — truthiness strings
    * standalone, boolean conditions inside if().
    */
  def hqStrpred(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(cls = if(startsWith(event_type, \"p\") or contains(event_type, \"iew\"), " +
        "then=\"pv\", else=\"other\")) " +
        "| hit := endsWith(event_type, \"up\") " +
        "| groupBy(cls, hit) | sort(cls, hit)")

  /** multi-aggregate groupBy (function=[…] list form). */
  def hqMultiagg(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type != error | groupBy(event_type, function=[count(), sum(user_id), max(value)]) " +
        "| sort(event_type)")

  /** accumulate(): running per-user spend in (ts, event_id) sequence
    * order — exact integer cents keep the running sum engine-invariant
    * (a float running sum would drift with association order).
    */
  def hqAccumulate(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 50 | cents := round(value * 100) " +
        "| accumulate(field=cents, function=sum, by=user_id, as=run) " +
        "| select(user_id, event_id, cents, run) | sort(user_id, event_id)")

  /** neighbor(): previous event's value per user, one sequence lag; the
    * first event of each user surfaces NULL (and a NULL delta).
    */
  def hqNeighbor(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 30 | cents := round(value * 100) " +
        "| neighbor(cents, distance=1, by=user_id, as=prev) " +
        "| delta := cents - prev " +
        "| select(user_id, event_id, cents, prev, delta) | sort(user_id, event_id)")

  /** slidingWindow(): 3-event moving spend per user over the RAW event
    * sequence (window() smooths aggregated buckets; this rides events).
    */
  def hqSlidingwin(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 40 | cents := round(value * 100) " +
        "| slidingWindow(field=cents, function=sum, events=3, by=user_id, as=w3) " +
        "| select(user_id, event_id, cents, w3) | sort(user_id, event_id)")

  /** partition(): 1-based sub-sequence index per user, incremented at
    * every event_type change in sequence order — the value-change
    * gaps-and-islands twin of session()'s time-gap split.
    */
  def hqPartition(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 40 | partition(field=event_type, by=user_id, as=part) " +
        "| select(user_id, event_id, event_type, part) | sort(user_id, event_id)")

  /** series(): the ordered per-user event-type timeline (first 5) —
    * collect() gathers distinct values, this keeps order and repeats.
    */
  def hqSeries(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 30 | series(field=event_type, by=user_id, limit=5, as=seq) " +
        "| sort(user_id)")

  /** Windowed series(): the span= form — per-user per-DAY event
    * timeline, one row per (bucket, user). This is the variant that
    * also STREAMS (each bucket's series emits when the watermark closes
    * it — HumioStreamSpec proves batch-twin agreement per bucket).
    */
  def hqSeriesSpan(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 20 | series(field=event_type, by=user_id, span=1d, " +
        "limit=5, as=seq) | sort(_bucket_ms, user_id)")

  /** Windowed fieldstats(): the span= form — per-DAY presence +
    * exact cardinality per column; the streaming twin computes the
    * same stats per closed bucket (cardinality via collect_set —
    * streaming forbids DISTINCT aggregates).
    */
  def hqFieldstatsSpan(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 50 | fields(ts, event_type, value) | " +
        "fieldstats(span=1d) | sort(_bucket_ms, field)")

  /** slidingTimeWindow(): trailing-24h spend per user at each event —
    * the time-span moving aggregate (slidingWindow counts events).
    */
  def hqSlidingtime(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 40 | cents := round(value * 100) " +
        "| slidingTimeWindow(field=cents, span=1d, function=sum, by=user_id, as=w1d) " +
        "| select(user_id, event_id, cents, w1d) | sort(user_id, event_id)")

  /** top(rest=): the top-3 event types plus one labeled remainder row
    * folding the rest — the bounded-cardinality report shape.
    */
  def hqTopRest(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "value < 100 | top(event_type, limit=3, rest=other, percent=true)")

  /** range() aggregate: per-group max − min spread in exact cents. */
  def hqRange(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "cents := round(value * 100) " +
        "| groupBy(event_type, function=[count(), range(cents)]) | sort(event_type)")

  /** fieldstats(): per-field presence + exact cardinality of a
    * projected relation — the schema-introspection report.
    */
  def hqFieldstats(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "user_id < 50 | select(event_type, user_id, value) " +
        "| fieldstats() | sort(field)")

  /** bitfield(): low bits of user_id as named truthiness flags, grouped
    * — the flag-decode + aggregate composition.
    */
  def hqBitfield(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "bitfield(user_id, flags=[f0, f1, f2]) " +
        "| groupBy(f0, f1, f2) | sort(f0, f1, f2)")

  /** in(): OR'd equality + wildcard membership, one pushed-down filter. */
  def hqIn(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "in(event_type, values=[click, pu*]) | groupBy(event_type) | sort(event_type)")

  /** rename + printf-style format composed into a derived tag. */
  def hqFormat(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "rename(field=event_type, as=etype) | format(\"%s#%d\", field=[etype, user_id], as=tag) " +
        "| tag = click#7 | select(event_id, tag) | sort(event_id)")

  /** regex replace into a new column, original dropped. */
  def hqReplace(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "replace(/^cl/, with=CL, field=event_type, as=et2) | drop(event_type, props) " +
        "| groupBy(et2) | sort(et2)")

  /** default(): NULL fill on a parsed-but-absent key, plus creating a
    * field that never existed.
    */
  def hqDefault(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "parseJson(props, missing) | default(field=missing, value=none) " +
        "| default(field=extra, value=added) | groupBy(missing, extra) | sort(missing)")

  /** standalone one-row aggregate (no grouping). */
  def hqStats(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir), "event_type = click | sum(user_id, as=total)")

  /** percentile(): exact interpolated percentiles, one row. */
  def hqPctile(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = click | percentile(value, percentiles=[50, 90, 99])")

  /** percentile(approx=true): the mergeable-sketch twin of [[hqPctile]]
    * — fixed-size Greenwald–Khanna partials instead of the exact
    * aggregate's every-distinct-value merge buffer, the form that
    * replaces it at 100 TB. Approximate by design → rows-only
    * correctness entry (the q_approx precedent).
    */
  def hqPctileApprox(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = click | percentile(value, percentiles=[50, 90, 99], approx=true)")

  /** Error-bound audit of [[hqPctileApprox]] — the DSL face of the
    * l_pctile_approx_err rank bracket: the DSL's approx percentiles
    * (Greenwald–Khanna at default accuracy) are unpivoted and each
    * estimate's true rank interval in the click stream is asserted
    * inside the documented ⌈p·n⌉ ± (⌊n/10000⌋ + 1) window, in integer
    * arithmetic. The oracle pins within_bound = 1 over the exact
    * (pct, n) frame, so a DSL-sketch regression fails the hash gate
    * rather than hiding behind the rows-only twin.
    */
  def hqPctileApproxErr(s: SparkSession, dir: String): DataFrame = {
    val approx = HumioQuery.run(ev(s, dir),
      "event_type = click | percentile(value, percentiles=[50, 90, 99], approx=true)")
    val ests = approx.select(explode(map(
      lit(50L), col("_50").cast("double"),
      lit(90L), col("_90").cast("double"),
      lit(99L), col("_99").cast("double"))).as(Seq("pct", "est")))
    Tables.events(s, dir).where(col("event_type") === "click")
      .select(col("value"))
      .crossJoin(broadcast(ests))
      .groupBy("pct")
      .agg(count(lit(1)).as("n"),
        sum((col("value") < col("est")).cast("long")).as("rlo"),
        sum((col("value") <= col("est")).cast("long")).as("rhi"))
      .withColumn("target", expr("(pct * n + 99) DIV 100"))
      .withColumn("eps", expr("n DIV 10000"))
      .select(col("pct"), col("n"),
        (!(col("rhi") < col("target") - col("eps") - 1 ||
          col("rlo") + 1 > col("target") + col("eps") + 1))
          .cast("bigint").as("within_bound"))
      .orderBy("pct")
  }

  /** bucket(): timechart's generic sibling, named _bucket. */
  def hqBucket(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "bucket(span=12h, function=sum(user_id)) | sort(_bucket)")

  /** sort(limit=): the fused top-n path (TakeOrderedAndProject). */
  def hqSortlimit(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "sort(value, event_id, order=desc, limit=7) | select(event_id, value) | sort(event_id)")

  /** tail(): most recent events by ts (TakeOrderedAndProject plan). */
  def hqTail(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "tail(5) | select(event_id, event_type) | sort(event_id)")

  /** join(): events of heavy users — inner join against an aggregate
    * subquery over the same stream; the subquery side broadcasts.
    */
  def hqJoin(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "join({groupBy(user_id, function=count())}, field=user_id) " +
        "| _count >= 80 | select(event_id, user_id, _count) | sort(event_id)")

  /** join(within=): the banded self-correlate — clicks by the same user
    * within ±1 h of each event, counted per event. Compiles to the
    * equi-plus-band join (same condition shape the stream-stream twin
    * runs; HumioStreamSpec proves batch agreement on a drained stream).
    * The band is compared at Spark's native microsecond timestamp
    * precision, so the oracle uses epoch_us, not epoch_ms.
    */
  def hqJoinWithin(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "join({event_type = click | select(ts, user_id)}, field=user_id, within=1h) " +
        "| groupBy(event_id, function=count()) | sort(event_id)")

  /** join(mode=left): per-event purchase count with NULL for users who
    * never purchased — unmatched events survive the enrichment.
    */
  def hqJoinLeft(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "join({event_type = purchase | groupBy(user_id, function=count())}, " +
        "field=user_id, mode=left) " +
        "| select(event_id, user_id, _count) | sort(event_id)")

  /** percentile inside groupBy: per-type p50/p95 latencies — the
    * per-key tail-latency table, exact interpolated percentiles.
    */
  def hqGroupPctile(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "groupBy(event_type, function=[percentile(value, 50), percentile(value, 95)]) " +
        "| sort(event_type)")

  /** percentile as the timechart measure: p90 latency per 6h bucket —
    * the SLO chart. Same shared aggregate parser as groupBy.
    */
  def hqTimechartPct(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "timechart(span=6h, function=percentile(value, 90)) | sort(_bucket_ms)")

  /** session(): per-user gaps-and-islands sessions sized by groupBy. */
  def hqSession(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "session(field=user_id, maxpause=30m) | groupBy(user_id, _session) " +
        "| sort(user_id, _session)")

  /** match(): dimension-table enrichment from inside the pipe language —
    * events matched against the customer table (broadcast), segment
    * sized by groupBy. The most common LogScale enrichment verb after
    * constants: a lookup join the event side never shuffles for.
    */
  /** splitString + split: tokenize a string field into an array, then fan
    * one event out per element — the LogScale event-splitting pair. Counts
    * every numeric token seen in props across the stream.
    */
  def hqSplit(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "splitString(field=props, by=\"[^0-9]+\", as=parts) | split(parts) " +
        "| parts != \"\" | groupBy(parts) | sort(parts)")

  /** format → parseCsv round-trip: serialize fields to a CSV line, then
    * promote them back to named (string) columns and filter on one — the
    * typed-filter-on-promoted-text path shared with extract().
    */
  def hqParsecsv(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "format(\"%s,%d\", field=[event_type, user_id], as=line) " +
        "| parseCsv(line, columns=[t, u]) | u >= 90 | groupBy(t) | sort(t)")

  /** math scalar functions in the expression language: sqrt under floor
    * buckets values; ln/exp round-trip in the filter (exact-boundary-free
    * on the fixture's 2-decimal values).
    */
  def hqMath(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "value > 0 | eval(b = floor(sqrt(value))) | eval(lv = ln(exp(1) * value)) " +
        "| lv >= 3.0 | groupBy(b) | sort(b)")

  /** cidr(): IPv4 subnet filtering — the firewall-log staple. The ip is
    * derived in the expression language (the fixture has no IP column),
    * then filtered by integer prefix match; /11 keeps second octets
    * 32-63, half the synthetic space.
    */
  def hqCidr(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "ip := concat(\"10.\", user_id % 64, \".0.\", user_id % 4) " +
        "| cidr(ip, subnet=\"10.32.0.0/11\") | groupBy(ip) | sort(ip)")

  /** window(): the timechart series smoother — per-series 3-bucket
    * moving average over 6h buckets. The moving window runs over the
    * already-aggregated (bounded) timechart relation.
    */
  def hqWindow(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "timechart(event_type, span=6h) " +
        "| window(field=_count, function=avg, buckets=3, by=event_type, as=avg3) " +
        "| sort(_bucket_ms, event_type)")

  /** transpose(): the result-table pivot — per-type counts as one wide
    * row. columns= keeps the output schema static (no inference job).
    */
  def hqTranspose(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "groupBy(event_type) " +
        "| transpose(header=event_type, columns=[click, error, purchase, signup, view])")

  /** counterAsRate(): per-user rate of the event_id counter — the
    * monotonic-counter-to-rate conversion (network bytes, log offsets).
    * event_id is the fixture's only true counter.
    */
  def hqRate(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "counterAsRate(event_id, by=user_id, as=rate) " +
        "| select(event_id, user_id, rate) | sort(event_id)")

  /** formatTime(): strftime-subset timestamp rendering — daily event
    * rollup keyed by the formatted day string.
    */
  def hqFormattime(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "formatTime(\"%Y-%m-%d\", field=ts, as=day) | groupBy(day) | sort(day)")

  /** parseTimestamp(): the strptime inverse — render each event's hour
    * as text, parse it BACK to a timestamp, and count per reparsed hour
    * (epoch ms). The round trip through pattern space is exactly what a
    * log with textual timestamps pays on ingest.
    */
  def hqParsetime(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "formatTime(\"%Y-%m-%d %H\", field=ts, as=hr) " +
        "| parseTimestamp(\"%Y-%m-%d %H\", field=hr, as=t)")
      .groupBy(unix_millis(col("t")).as("t_ms"))
      .agg(count(lit(1)).as("_count"))
      .orderBy("t_ms")

  /** sample(): deterministic 10% md5-bucket sample, then per-type
    * counts — replayable sampling from inside the pipe language.
    */
  def hqSample(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "sample(10, by=event_id) | groupBy(event_type) | sort(event_type)")

  /** selfJoinFilter(): events of users who BOTH clicked and purchased —
    * the correlated-behavior filter, as one presence-flag aggregate +
    * semi join (never a self cross join).
    */
  def hqSelfjoin(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "selfJoinFilter(field=user_id, where=event_type, having=[click, purchase]) " +
        "| groupBy(event_type) | sort(event_type)")

  def hqLookup(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "match(customer, field=user_id, column=c_custkey, include=[c_mktsegment]) " +
        "| groupBy(c_mktsegment) | sort(c_mktsegment)",
      Map("customer" -> Tables.table(s, dir, "customer")))

  /** dedup(): the most recent event per user — one windowed keep-latest
    * from inside the pipe language (ties broken by event_id like tail()).
    */
  def hqDedup(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "dedup(user_id) | select(event_id, user_id, event_type) | sort(event_id)")

  /** top(field, sum=f): the weighted form — heaviest purchasers by total
    * spend, not by event count. Summed over exact integer CENTS derived
    * in the expression language (distributed double sums are
    * accumulation-order-dependent; longs are not — the engine's money
    * discipline, reachable from inside the DSL).
    */
  def hqTopSum(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = purchase | cents := floor(value * 100 + 0.5) " +
        "| top(user_id, limit=5, sum=cents)")

  /** count(field, distinct=true): standalone distinct count. */
  def hqCountDistinct(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = c* | count(user_id, distinct=true, as=n_users)")

  /** crypto:md5 / crypto:sha256 scalar digests (hex strings, compared
    * byte-for-byte by the oracle) — the event-fingerprint surface.
    */
  def hqHash(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(h = crypto:md5(event_type)) " +
        "| h2 := crypto:sha256(concat(event_type, \"|\", h)) " +
        "| groupBy(h, h2) | sort(h)")

  /** base64Encode → base64Decode round-trip (the parseCsv discipline:
    * construct in-query, decode back, compare typed).
    */
  def hqBase64(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_id < 500 | eval(b = base64Encode(props)) " +
        "| rt := base64Decode(b) | select(event_id, b, rt) | sort(event_id)")

  /** parseUrl(): scheme/host/path/query promotion — URL built in-query
    * from event fields, then parsed back (the differential proof that
    * parse inverts construction).
    */
  def hqParseurl(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "parseJson(props, k) " +
        "| eval(u = concat(\"https://svc-\", event_type, \".example.com/u/\", user_id % 10, \"?k=\", k)) " +
        "| parseUrl(u) | groupBy(host, path) | sort(host, path)")

  /** kvParse(): k=v pair promotion with a typed filter on the promoted
    * value — the KV sibling of parseJson/parseCsv.
    */
  def hqKvparse(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "parseJson(props, k) | eval(kv = concat(\"ty=\", event_type, \" kn=\", k)) " +
        "| kvParse(kv, keys=[ty, kn]) | kn >= 95 | groupBy(ty) | sort(ty)")

  /** shannonEntropy(): per-event character entropy in bits, bucketed at
    * 4 decimals via round(ent·10⁴) — the randomness/DGA signal. The
    * quantized-term sum makes the oracle's unnest+group replay exact.
    */
  def hqEntropy(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(ent = shannonEntropy(props)) | e4 := round(ent * 10000) " +
        "| groupBy(e4) | sort(e4)")

  /** array:length / array:contains over a splitString array, with the
    * LogScale string-truthiness filter (`hit = true`).
    */
  def hqArray(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(kv = concat(event_type, \" u\", user_id % 4)) " +
        "| splitString(field=kv, by=\" \", as=parts) " +
        "| hit := array:contains(parts, \"u1\") | hit = true " +
        "| n := array:length(parts) | groupBy(event_type, n) | sort(event_type)")

  /** time:hour / time:dayOfWeek / time:month extraction — the
    * when-does-it-happen panel (ISO day-of-week, Monday=1).
    */
  def hqTimefns(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(h = time:hour(ts)) | dw := time:dayOfWeek(ts) " +
        "| m := time:month(ts) | groupBy(h, dw, m) | sort(h, dw, m)")

  /** parseInt(x, 16) over a substr of a digest — the hex-ID promotion
    * (session ids, trace ids) every log pipeline does somewhere.
    */
  def hqParseint(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "eval(hx = crypto:md5(event_type)) | n := parseInt(substr(hx, 1, 4), 16) " +
        "| groupBy(event_type, n) | sort(event_type)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hq_parseint"  -> hqParseint _,
    "hq_timefns"   -> hqTimefns _,
    "hq_hash"      -> hqHash _,
    "hq_base64"    -> hqBase64 _,
    "hq_parseurl"  -> hqParseurl _,
    "hq_kvparse"   -> hqKvparse _,
    "hq_entropy"   -> hqEntropy _,
    "hq_array"     -> hqArray _,
    "hq_split"     -> hqSplit _,
    "hq_math"      -> hqMath _,
    "hq_cidr"      -> hqCidr _,
    "hq_window"    -> hqWindow _,
    "hq_transpose" -> hqTranspose _,
    "hq_rate"      -> hqRate _,
    "hq_formattime" -> hqFormattime _,
    "hq_parsetime" -> hqParsetime _,
    "hq_sample"    -> hqSample _,
    "hq_selfjoin"  -> hqSelfjoin _,
    "hq_join_left" -> hqJoinLeft _,
    "hq_group_pctile" -> hqGroupPctile _,
    "hq_timechart_pct" -> hqTimechartPct _,
    "hq_parsecsv"  -> hqParsecsv _,
    "hq_top_sum"   -> hqTopSum _,
    "hq_count_distinct" -> hqCountDistinct _,
    "hq_dedup"     -> hqDedup _,
    "hq_lookup"    -> hqLookup _,
    "hq_session"   -> hqSession _,
    "hq_in"        -> hqIn _,
    "hq_format"    -> hqFormat _,
    "hq_replace"   -> hqReplace _,
    "hq_default"   -> hqDefault _,
    "hq_stats"     -> hqStats _,
    "hq_pctile"    -> hqPctile _,
    "hq_pctile_approx" -> hqPctileApprox _,
    "hq_pctile_approx_err" -> hqPctileApproxErr _,
    "hq_bucket"    -> hqBucket _,
    "hq_sortlimit" -> hqSortlimit _,
    "hq_tail"      -> hqTail _,
    "hq_join"      -> hqJoin _,
    "hq_join_within" -> hqJoinWithin _,
    "hq_filter"    -> hqFilter _,
    "hq_group"     -> hqGroup _,
    "hq_wildcard"  -> hqWildcard _,
    "hq_extract"   -> hqExtract _,
    "hq_regex"     -> hqRegex _,
    "hq_timechart" -> hqTimechart _,
    "hq_eval"      -> hqEval _,
    "hq_case"      -> hqCase _,
    "hq_case_multi" -> hqCaseMulti _,
    "hq_collect"   -> hqCollect _,
    "hq_top_pct"   -> hqTopPct _,
    "hq_parsejson" -> hqParsejson _,
    "hq_regex_extract" -> hqRegexExtract _,
    "hq_top"       -> hqTop _,
    "hq_evalfn"    -> hqEvalfn _,
    "hq_if"        -> hqIf _,
    "hq_strpred"   -> hqStrpred _,
    "hq_stddev"    -> hqStddev _,
    "hq_multiagg"  -> hqMultiagg _,
    "hq_accumulate" -> hqAccumulate _,
    "hq_neighbor"  -> hqNeighbor _,
    "hq_slidingwin" -> hqSlidingwin _,
    "hq_partition" -> hqPartition _,
    "hq_series"    -> hqSeries _,
    "hq_series_span" -> hqSeriesSpan _,
    "hq_fieldstats_span" -> hqFieldstatsSpan _,
    "hq_slidingtime" -> hqSlidingtime _,
    "hq_top_rest"  -> hqTopRest _,
    "hq_fieldstats" -> hqFieldstats _,
    "hq_range"     -> hqRange _,
    "hq_bitfield"  -> hqBitfield _)

  val oracle: Map[String, String] = Map(
    "hq_accumulate" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |             CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE user_id < 50)
        |SELECT user_id, event_id, cents,
        |       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "hq_neighbor" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |             CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE user_id < 30),
        |n AS (SELECT user_id, event_id, cents,
        |        lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM e)
        |SELECT user_id, event_id, cents, prev,
        |       CAST(cents - prev AS BIGINT) AS delta
        |FROM n ORDER BY user_id, event_id""".stripMargin,
    "hq_slidingwin" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |             CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE user_id < 40)
        |SELECT user_id, event_id, cents,
        |       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS w3
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "hq_range" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count,
        |       CAST(max(CAST(round(value * 100) AS BIGINT))
        |            - min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS _range_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_fieldstats" ->
      """WITH e AS (SELECT event_type, user_id, value FROM events WHERE user_id < 50)
        |SELECT 'event_type' AS field, CAST(count(event_type) AS BIGINT) AS n,
        |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct FROM e
        |UNION ALL
        |SELECT 'user_id', CAST(count(user_id) AS BIGINT),
        |       CAST(count(DISTINCT user_id) AS BIGINT) FROM e
        |UNION ALL
        |SELECT 'value', CAST(count(value) AS BIGINT),
        |       CAST(count(DISTINCT value) AS BIGINT) FROM e
        |ORDER BY field""".stripMargin,
    "hq_top_rest" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |           FROM events WHERE value < 100 GROUP BY event_type),
        |tot AS (SELECT sum(_count) AS t FROM g),
        |t3 AS (SELECT g.event_type, g._count,
        |         floor((CAST(g._count AS DOUBLE) * 100.0 / CAST(tot.t AS DOUBLE))
        |               * 10000.0 + 0.5) / 10000.0 AS _percent
        |       FROM g CROSS JOIN tot
        |       ORDER BY g._count DESC, g.event_type LIMIT 3),
        |r AS (SELECT 'other' AS event_type,
        |        CAST(tot.t - (SELECT sum(_count) FROM t3) AS BIGINT) AS _count,
        |        floor((CAST(tot.t - (SELECT sum(_count) FROM t3) AS DOUBLE)
        |               * 100.0 / CAST(tot.t AS DOUBLE)) * 10000.0 + 0.5)
        |          / 10000.0 AS _percent
        |      FROM tot
        |      WHERE tot.t > (SELECT coalesce(sum(_count), 0) FROM t3))
        |SELECT * FROM (SELECT * FROM t3 UNION ALL SELECT * FROM r)
        |ORDER BY _count DESC, event_type""".stripMargin,
    "hq_slidingtime" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms,
        |             CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE user_id < 40)
        |SELECT user_id, event_id, cents,
        |       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY tms
        |            RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW) AS BIGINT) AS w1d
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "hq_series" ->
      """SELECT user_id,
        |       array_to_string(list_slice(
        |         list(event_type ORDER BY ts, event_id), 1, 5), ' ') AS seq
        |FROM events WHERE user_id < 30
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "hq_series_span" ->
      """SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000) * 86400000 AS _bucket_ms,
        |       user_id,
        |       array_to_string(list_slice(
        |         list(event_type ORDER BY ts, event_id), 1, 5), ' ') AS seq
        |FROM events WHERE user_id < 20
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "hq_fieldstats_span" ->
      """WITH e AS (SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000) * 86400000 AS b,
        |             CAST(ts AS TIMESTAMP) AS ts2, event_type, value
        |           FROM events WHERE user_id < 50),
        |u AS (
        |  SELECT b, 'ts' AS field, CAST(count(ts2) AS BIGINT) AS n,
        |         CAST(count(DISTINCT ts2) AS BIGINT) AS n_distinct FROM e GROUP BY b
        |  UNION ALL
        |  SELECT b, 'event_type', CAST(count(event_type) AS BIGINT),
        |         CAST(count(DISTINCT event_type) AS BIGINT) FROM e GROUP BY b
        |  UNION ALL
        |  SELECT b, 'value', CAST(count(value) AS BIGINT),
        |         CAST(count(DISTINCT value) AS BIGINT) FROM e GROUP BY b)
        |SELECT b AS _bucket_ms, field, n, n_distinct FROM u
        |ORDER BY _bucket_ms, field""".stripMargin,
    "hq_partition" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type
        |           FROM events WHERE user_id < 40),
        |c AS (SELECT user_id, event_id, ts, event_type,
        |        CASE WHEN row_number() OVER (PARTITION BY user_id
        |                  ORDER BY ts, event_id) = 1 THEN 1
        |             WHEN lag(event_type) OVER (PARTITION BY user_id
        |                  ORDER BY ts, event_id) IS DISTINCT FROM event_type
        |             THEN 1 ELSE 0 END AS chg
        |      FROM e)
        |SELECT user_id, event_id, event_type,
        |       CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS part
        |FROM c ORDER BY user_id, event_id""".stripMargin,
    "hq_bitfield" ->
      """SELECT CASE WHEN (user_id >> 0) & 1 = 1 THEN 'true' ELSE 'false' END AS f0,
        |       CASE WHEN (user_id >> 1) & 1 = 1 THEN 'true' ELSE 'false' END AS f1,
        |       CASE WHEN (user_id >> 2) & 1 = 1 THEN 'true' ELSE 'false' END AS f2,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2, 3 ORDER BY f0, f1, f2""".stripMargin,
    "hq_if" ->
      """SELECT CASE WHEN value >= 100 THEN 'high'
        |            WHEN value >= 10 THEN 'mid' ELSE 'low' END AS band,
        |       CAST(CASE WHEN (value >= 10 AND value < 55) OR value >= 300
        |            THEN 1 ELSE 0 END AS BIGINT) AS mid2,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY band, mid2""".stripMargin,
    "hq_strpred" ->
      """SELECT CASE WHEN event_type LIKE 'p%' OR strpos(event_type, 'iew') > 0
        |            THEN 'pv' ELSE 'other' END AS cls,
        |       CASE WHEN event_type LIKE '%up' THEN 'true' ELSE 'false' END AS hit,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY cls, hit""".stripMargin,
    "hq_top_pct" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |           FROM events WHERE value < 100 GROUP BY event_type),
        |t AS (SELECT sum(_count) AS total FROM g)
        |SELECT event_type, _count,
        |       floor((CAST(_count AS DOUBLE) * 100.0 / CAST(total AS DOUBLE))
        |             * 10000.0 + 0.5) / 10000.0 AS _percent
        |FROM g CROSS JOIN t
        |ORDER BY _count DESC, event_type LIMIT 3""".stripMargin,
    "hq_collect" ->
      """SELECT array_to_string(
        |  list_slice(list_sort(list(DISTINCT event_type)), 1, 3), ' ') AS types
        |FROM events WHERE value >= 300""".stripMargin,
    "hq_case_multi" ->
      """SELECT CASE WHEN event_type = 'click' THEN 'i'
        |            WHEN event_type = 'purchase' THEN 'i'
        |            WHEN event_type = 'view' THEN 'p' ELSE 'other' END AS kind,
        |       CAST(count(*) AS BIGINT) AS _count,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN round(value * 100) * 2
        |                     WHEN event_type = 'purchase' THEN round(value * 100) * 10
        |                     WHEN event_type = 'view' THEN round(value * 100)
        |                     ELSE 0 END) AS BIGINT) AS _sum_cents
        |FROM events GROUP BY 1 ORDER BY kind""".stripMargin,
    "hq_stddev" ->
      """WITH q AS (SELECT event_type, value,
        |             CAST(round(value * 1048576) AS HUGEINT) AS q
        |           FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS _count,
        |       CASE WHEN count(value) > 1 THEN
        |         floor((sqrt(CAST(count(value) * sum(q * q) - sum(q) * sum(q) AS DOUBLE)
        |                     / (count(value) * (count(value) - 1))) / 1048576.0)
        |               * 10000.0 + 0.5) / 10000.0
        |       ELSE NULL END AS _stddev_value
        |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_parseint" ->
      """SELECT event_type,
        |       CAST(('0x' || substr(md5(event_type), 1, 4))::BIGINT AS BIGINT) AS n,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY event_type""".stripMargin,
    "hq_timefns" ->
      """SELECT CAST(date_part('hour', ts) AS BIGINT) AS h,
        |       CAST(isodow(ts) AS BIGINT) AS dw,
        |       CAST(date_part('month', ts) AS BIGINT) AS m,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2, 3 ORDER BY h, dw, m""".stripMargin,
    "hq_hash" ->
      """SELECT md5(event_type) AS h,
        |       sha256(event_type || '|' || md5(event_type)) AS h2,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY h""".stripMargin,
    "hq_base64" ->
      """SELECT event_id, to_base64(encode(props)) AS b, props AS rt
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,
    "hq_parseurl" ->
      """SELECT 'svc-' || event_type || '.example.com' AS host,
        |       '/u/' || CAST(user_id % 10 AS VARCHAR) AS path,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY host, path""".stripMargin,
    "hq_kvparse" ->
      """SELECT event_type AS ty, CAST(count(*) AS BIGINT) AS _count
        |FROM events
        |WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) >= 95
        |GROUP BY 1 ORDER BY ty""".stripMargin,
    "hq_entropy" ->
      """WITH ch AS (SELECT event_id, unnest(string_split(props, '')) AS c
        |            FROM events),
        |cnt AS (SELECT event_id, c, CAST(count(*) AS DOUBLE) AS n
        |        FROM ch GROUP BY event_id, c),
        |tot AS (SELECT event_id, sum(n) AS t FROM cnt GROUP BY event_id),
        |q AS (SELECT c.event_id,
        |        CAST(round((c.n / t.t) * ln(c.n / t.t) / ln(2) * 1099511627776) AS BIGINT) AS tq
        |      FROM cnt c JOIN tot t USING (event_id)),
        |ent AS (SELECT event_id, -(CAST(sum(tq) AS DOUBLE) / 1099511627776) AS e
        |        FROM q GROUP BY event_id)
        |SELECT CAST(round(e * 10000) AS BIGINT) AS e4,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM ent GROUP BY 1 ORDER BY e4""".stripMargin,
    "hq_array" ->
      """SELECT event_type,
        |       CAST(len(string_split(event_type || ' u' || CAST(user_id % 4 AS VARCHAR), ' ')) AS BIGINT) AS n,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE user_id % 4 = 1
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin,
    "hq_math" ->
      """SELECT CAST(floor(sqrt(value)) AS BIGINT) AS b,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE value > 0 AND ln(exp(1) * value) >= 3.0
        |GROUP BY b ORDER BY b""".stripMargin,
    "hq_timechart_pct" ->
      """SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 21600000) * 21600000 AS _bucket_ms,
        |       floor((quantile_cont(value, 0.9)) * 10000.0 + 0.5) / 10000.0 AS _p90
        |FROM events GROUP BY 1 ORDER BY _bucket_ms""".stripMargin,
    "hq_group_pctile" ->
      """SELECT event_type,
        |       floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS _p50_value,
        |       floor((quantile_cont(value, 0.95)) * 10000.0 + 0.5) / 10000.0 AS _p95_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_join_left" ->
      """SELECT e.event_id, e.user_id, CAST(c._count AS BIGINT) AS _count
        |FROM events e
        |LEFT JOIN (SELECT user_id, count(*) AS _count FROM events
        |           WHERE event_type = 'purchase' GROUP BY user_id) c
        |  ON e.user_id = c.user_id
        |ORDER BY e.event_id""".stripMargin,
    "hq_selfjoin" ->
      """WITH k AS (
        |  SELECT user_id FROM events GROUP BY user_id
        |  HAVING max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
        |     AND max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events JOIN k USING (user_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_sample" ->
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events
        |WHERE ${PipelineQueries.hashBucketSql("event_id")} % 100 < 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_formattime" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "hq_parsetime" ->
      """SELECT epoch_ms(strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H'),
        |                         '%Y-%m-%d %H')) AS t_ms,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1 ORDER BY t_ms""".stripMargin,
    "hq_rate" ->
      """WITH o AS (
        |  SELECT event_id, user_id, ts,
        |         lag(event_id) OVER w AS pid, lag(ts) OVER w AS pts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id,
        |  CASE WHEN pid IS NULL OR event_id - pid < 0
        |            OR epoch_ms(CAST(ts AS TIMESTAMP)) = epoch_ms(CAST(pts AS TIMESTAMP))
        |       THEN NULL
        |       ELSE CAST(event_id - pid AS DOUBLE)
        |            / ((epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(pts AS TIMESTAMP))) / 1000.0)
        |  END AS rate
        |FROM o ORDER BY event_id""".stripMargin,
    "hq_transpose" ->
      """SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events""".stripMargin,
    "hq_window" ->
      """WITH b AS (
        |  SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 21600000) * 21600000 AS _bucket_ms,
        |         event_type, CAST(count(*) AS BIGINT) AS _count
        |  FROM events GROUP BY 1, 2)
        |SELECT _bucket_ms, event_type, _count,
        |       avg(_count) OVER (PARTITION BY event_type ORDER BY _bucket_ms
        |                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3
        |FROM b ORDER BY _bucket_ms, event_type""".stripMargin,
    "hq_cidr" ->
      """WITH i AS (SELECT concat('10.', user_id % 64, '.0.', user_id % 4) AS ip
        |           FROM events),
        |n AS (SELECT ip,
        |        CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
        |        + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
        |        + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
        |        + CAST(split_part(ip, '.', 4) AS BIGINT) AS ipnum
        |      FROM i)
        |SELECT ip, CAST(count(*) AS BIGINT) AS _count FROM n
        |WHERE (ipnum >> 21) = ((10 * 16777216 + 32 * 65536) >> 21)
        |GROUP BY ip ORDER BY ip""".stripMargin,
    "hq_split" ->
      """WITH p AS (SELECT unnest(string_split_regex(props, '[^0-9]+')) AS parts
        |           FROM events)
        |SELECT parts, CAST(count(*) AS BIGINT) AS _count
        |FROM p WHERE parts <> '' GROUP BY parts ORDER BY parts""".stripMargin,
    "hq_parsecsv" ->
      """SELECT event_type AS t, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE user_id >= 90
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_top_sum" ->
      """SELECT user_id,
        |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS _sum
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY _sum DESC, user_id LIMIT 5""".stripMargin,
    "hq_count_distinct" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE event_type LIKE 'c%'""".stripMargin,
    "hq_dedup" ->
      """WITH r AS (
        |  SELECT event_id, user_id, event_type,
        |         -- CAST truncates nanos to the engine's micros precision
        |         -- so the keep-latest boundary can't disagree
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_id, user_id, event_type FROM r
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "hq_lookup" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS _count
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "hq_session" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
        |                   - lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER w > 1800000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), se AS (
        |  SELECT user_id,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS _session
        |  FROM g)
        |SELECT user_id, CAST(_session AS BIGINT) AS _session,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM se GROUP BY 1, 2 ORDER BY user_id, _session""".stripMargin,
    "hq_in" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE event_type = 'click' OR event_type LIKE 'pu%'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_format" ->
      """SELECT event_id, event_type || '#' || CAST(user_id AS VARCHAR) AS tag
        |FROM events WHERE event_type = 'click' AND user_id = 7
        |ORDER BY event_id""".stripMargin,
    "hq_replace" ->
      """SELECT regexp_replace(event_type, '^cl', 'CL') AS et2,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY et2 ORDER BY et2""".stripMargin,
    "hq_default" ->
      """SELECT coalesce(props->>'$.missing', 'none') AS missing,
        |       'added' AS extra, CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY missing""".stripMargin,
    "hq_stats" ->
      """SELECT CAST(sum(user_id) AS BIGINT) AS total
        |FROM events WHERE event_type = 'click'""".stripMargin,
    "hq_pctile_approx_err" ->
      """SELECT CAST(p.pct AS BIGINT) AS pct, CAST(count(*) AS BIGINT) AS n,
        |       CAST(1 AS BIGINT) AS within_bound
        |FROM events CROSS JOIN (SELECT unnest([50, 90, 99]) AS pct) p
        |WHERE event_type = 'click'
        |GROUP BY p.pct ORDER BY pct""".stripMargin,
    "hq_pctile" ->
      """SELECT floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS "_50",
        |       floor((quantile_cont(value, 0.9)) * 10000.0 + 0.5) / 10000.0 AS "_90",
        |       floor((quantile_cont(value, 0.99)) * 10000.0 + 0.5) / 10000.0 AS "_99"
        |FROM events WHERE event_type = 'click'""".stripMargin,
    "hq_bucket" ->
      """SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 43200000) * 43200000 AS _bucket,
        |       CAST(sum(user_id) AS BIGINT) AS _sum
        |FROM events GROUP BY 1 ORDER BY _bucket""".stripMargin,
    "hq_sortlimit" ->
      """WITH t AS (
        |  SELECT event_id, value FROM events
        |  ORDER BY value DESC, event_id DESC LIMIT 7)
        |SELECT event_id, value FROM t ORDER BY event_id""".stripMargin,
    "hq_tail" ->
      """WITH t AS (
        |  SELECT event_id, event_type FROM events
        |  -- CAST truncates the nanos column to micros, matching the
        |  -- engine's timestamp precision, so the tail boundary can't
        |  -- disagree on sub-microsecond ordering
        |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC LIMIT 5)
        |SELECT event_id, event_type FROM t ORDER BY event_id""".stripMargin,
    "hq_join" ->
      """SELECT e.event_id, e.user_id, CAST(c._count AS BIGINT) AS _count
        |FROM events e
        |JOIN (SELECT user_id, count(*) AS _count FROM events GROUP BY user_id) c
        |  ON e.user_id = c.user_id
        |WHERE c._count >= 80 ORDER BY e.event_id""".stripMargin,
    "hq_join_within" ->
      """WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS cts
        |           FROM events WHERE event_type = 'click'),
        |     e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ets
        |           FROM events)
        |SELECT e.event_id, CAST(count(*) AS BIGINT) AS _count
        |FROM e JOIN c ON e.user_id = c.user_id
        |              AND abs(c.cts - e.ets) <= 3600000000
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "hq_filter" ->
      """SELECT event_id, event_type FROM events
        |WHERE value > 450.0 ORDER BY event_id""".stripMargin,
    "hq_group" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE event_type <> 'error'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_wildcard" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE event_type LIKE 'c%'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_extract" ->
      """SELECT event_id, props->>'$.k' AS k FROM events
        |WHERE CAST(props->>'$.k' AS BIGINT) >= 95
        |ORDER BY event_id""".stripMargin,
    "hq_regex" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE regexp_matches(event_type, '^(click|view)$')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_timechart" ->
      """SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 21600000) * 21600000 AS _bucket_ms,
        |       event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY _bucket_ms, event_type""".stripMargin,
    "hq_eval" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE (user_id % 16) * 2 + 1 = 7
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_case" ->
      """SELECT kind, CAST(count(*) AS BIGINT) AS _count FROM (
        |  SELECT CASE WHEN event_type = 'click' THEN 'interactive'
        |              WHEN event_type = 'purchase' THEN 'interactive'
        |              WHEN event_type = 'view' THEN 'passive' END AS kind
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase', 'view'))
        |GROUP BY kind ORDER BY kind""".stripMargin,
    "hq_parsejson" ->
      """SELECT event_id, props->>'$.k' AS k, props->>'$.missing' AS missing
        |FROM events WHERE CAST(props->>'$.k' AS BIGINT) >= 95
        |ORDER BY event_id""".stripMargin,
    "hq_regex_extract" ->
      """SELECT event_id, regexp_extract(props, '"k": ([0-9]+)', 1) AS knum
        |FROM events
        |WHERE regexp_matches(props, '"k": ([0-9]+)')
        |  AND CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) >= 95
        |ORDER BY event_id""".stripMargin,
    "hq_evalfn" ->
      """SELECT upper(event_type) || '-' || CAST(length(event_type) AS VARCHAR) AS tag,
        |       CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE length(event_type) >= 5
        |GROUP BY tag ORDER BY tag""".stripMargin,
    "hq_top" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE user_id < 50
        |GROUP BY event_type ORDER BY _count DESC, event_type LIMIT 3""".stripMargin,
    "hq_multiagg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count,
        |       CAST(sum(user_id) AS BIGINT) AS _sum_user_id,
        |       max(value) AS _max_value
        |FROM events WHERE event_type <> 'error'
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
