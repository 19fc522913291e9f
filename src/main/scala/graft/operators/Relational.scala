package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond what a single built-in call expresses —
  * chiefly a scale-correct as-of join. Everything else in the C-pack
  * (broadcast/SMJ joins, semi/anti, rollup, set ops, top-k) composes
  * Spark built-ins directly in the query layer; re-wrapping those would
  * only hide the planner.
  */
object Relational {

  /** As-of join: for each left row, the most recent right row of the same
    * key with `right.ts <(=) left.ts`.
    *
    * Implemented with the union + ordered-window pattern rather than a
    * range join: both sides are tagged and unioned, then a single window
    * sorted by (ts, side) carries the last right-side payload forward
    * within each key. Cost = ONE shuffle on the key + a sorted window —
    * no O(left × right-per-key) range-join blowup, no driver collect; at
    * 100 TB this is the standard trick that keeps as-of linear and fully
    * distributed (AQE handles skewed keys).
    *
    * @param leftCols  columns of `left` to carry through (must exist in left)
    * @param payload   single column of `right` to surface, already named
    * @param strict    true → right.ts strictly before left.ts; false → at-or-before
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: Column, rightTs: Column,
               leftTie: Column, rightTie: Column,
               leftCols: Seq[String], payload: Column, strict: Boolean): DataFrame = {
    val payloadName = "__asof_payload"
    // side marker breaks the (ts, tie) tie between a row's left and right
    // copies: strict → right copy sorts after its left twin (self-match
    // excluded from the frame); inclusive → before (self-match included).
    val rightSide = if (strict) lit(1) else lit(-1)
    val l = left.select(
      (col(key).as("__k") +: leftTs.as("__ts") +: leftTie.as("__tie")
        +: lit(0).as("__side")
        +: lit(null).cast("double").as(payloadName)
        +: leftCols.map(col)): _*)
    val r = right.select(
      (col(key).as("__k") +: rightTs.as("__ts") +: rightTie.as("__tie")
        +: rightSide.as("__side")
        +: payload.cast("double").as(payloadName)
        +: leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tie"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(payloadName + "_ff", last(col(payloadName), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select((leftCols.map(col) :+ col(payloadName + "_ff").as("asof_value")): _*)
  }

  /** Running total with an explicit ROWS frame — exact over integer cents
    * so parallel accumulation order can't perturb the value.
    */
  def runningCentsSum(value: Column, part: Column, order: Seq[Column]): Column = {
    val w = Window.partitionBy(part).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(round(value * 100).cast("bigint")).over(w) / 100.0
  }

  /** Band (interval) join by time-binning: pair each left row with every
    * right row whose timestamp lies within ±`bandWidth` — WITHOUT the
    * BroadcastNestedLoopJoin Spark plans for a bare non-equi predicate.
    *
    * The trick: quantize both sides to `bandWidth`-sized bins. A right
    * row within ±bandWidth of a left row in bin b can only sit in bins
    * b-1, b, b+1, so replicating the RIGHT side into its three adjacent
    * bins turns the band predicate into an EQUI-join on bin plus an
    * exact |Δt| ≤ bandWidth residual filter. Each (left, right) pair
    * meets in exactly one bin (the left row's), so no dedup is needed.
    *
    * Scale shape: both sides hash-partition by bin — a shuffle join
    * that AQE can size and skew-split — at 3× replication of one side,
    * versus the nested-loop's O(left × right) comparisons which no
    * cluster survives. This is the standard band-join decomposition
    * (cf. the epsilon-join literature); bandWidth doubles as the recall
    * window and the bin size, so candidate volume per bin stays
    * proportional to the band's true selectivity.
    *
    * Left rows with no partner survive with a NULL right timestamp
    * (left-outer on the bin; bin-mates outside the band are nulled, not
    * dropped), so zero-match groups stay countable via count(rts).
    * Returns leftCols ++ (lts, rts = matching right epoch-millis or NULL).
    */
  def bandJoinBinned(left: DataFrame, leftTsMs: Column, right: DataFrame,
                     rightTsMs: Column, bandWidthMs: Long,
                     leftCols: Seq[String]): DataFrame = {
    val l = left.select(leftCols.map(col) :+ leftTsMs.as("lts"): _*)
      .withColumn("bin", floor(col("lts") / bandWidthMs))
    val r = right.select(rightTsMs.as("rts"))
      .select(col("rts"), explode(array(lit(-1L), lit(0L), lit(1L))).as("d"))
      .select(col("rts"), (floor(col("rts") / bandWidthMs) + col("d")).as("bin"))
    l.join(r, Seq("bin"), "left_outer")
      .withColumn("rts",
        when(col("rts").isNotNull &&
          abs(col("rts") - col("lts")) <= bandWidthMs, col("rts")))
      .drop("bin")
  }

  /** ntile + lead-of-key + first_value-of-key over a LOW-CARDINALITY
    * partition key, without the single-task-per-key sort that
    * `Window.partitionBy(lowCardKey)` plans (a permanent parallelism
    * cap: at 100 TB one task would sort a whole key's share). Instead:
    *
    *  1. broadcast per-key (min, max) of the order value → each row's
    *     deterministic descending range bucket (pure arithmetic, no
    *     percentile pass; equal values share a bucket, so bucket order
    *     refines the (value desc, key asc) total order);
    *  2. ONE tiny aggregate (≤ |keys|·`buckets` rows) yields per-bucket
    *     counts + first keys → cumulative rank offsets, boundary
    *     successor keys, the per-key top key, and the per-key row count
    *     (windows over this bounded relation are free);
    *  3. per (key, bucket) local row_number + broadcast offset = the
    *     exact in-key rank; `lead` patches bucket-boundary rows with the
    *     next non-empty bucket's first key; the tile comes from SQL
    *     ntile's closed form (first n%tiles tiles carry ceil(n/tiles)).
    *
    * Max task sort ≈ n/(|keys|·`buckets`); `buckets` is a constant
    * fan-out knob, not a data-dependent cap. Output: input columns +
    * (tile LONG, next_key, top_key). Semantics are bit-identical to the
    * plain window formulation — [[graft.queries.RelationalQueries.qNtile]]'s
    * DuckDB oracle is the standing differential proof.
    *
    * `valueCol` is ordered DESCENDING; `keyCol` must be unique per
    * `partCol` group (the deterministic tiebreak, ascending).
    */
  def scalableNtile(df: DataFrame, partCol: String, valueCol: String,
                    keyCol: String, tiles: Int, buckets: Int = 64): DataFrame = {
    // staged: bounded (|keys| rows) but corpus-lineage — it feeds both
    // bucketed consumers (the tiny aggregate and the final rank pass),
    // and unstaged each would re-scan the corpus for the min/max
    val span = Scale.stage(df.groupBy(partCol)
      .agg(min(valueCol).as("__pmin"), max(valueCol).as("__pmax")))
    val bucketed = df.join(broadcast(span), partCol)
      .withColumn("__bkt",
        when(col("__pmax") === col("__pmin"), lit(0)).otherwise(
          least(lit(buckets - 1),
            floor((col("__pmax") - col(valueCol)) /
              ((col("__pmax") - col("__pmin")) / buckets)).cast("int"))))
      .drop("__pmin", "__pmax")
    // negate() keeps the value's exact type (decimal stays decimal,
    // long stays long): a `* -1.0` here would coerce to DOUBLE and two
    // distinct long/decimal values beyond 2^53 could collapse, letting
    // the key tiebreak pick the wrong bucket-first row. Residual edge:
    // Long.MinValue cannot negate (ANSI overflow) — no column in this
    // repo carries it, and it fails loudly rather than silently.
    val bagg = bucketed.groupBy(partCol, "__bkt")
      .agg(count(lit(1)).as("__bc"),
        min_by(col(keyCol),
          struct(negate(col(valueCol)).as("nv"),
            col(keyCol).as("k"))).as("__first"))
    val wb = Window.partitionBy(partCol).orderBy("__bkt")
    val binfo = bagg
      .withColumn("__off", coalesce(
        sum("__bc").over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__nextf", lead("__first", 1).over(wb))
      .withColumn("top_key", first("__first").over(wb))
      .withColumn("__n", sum("__bc").over(Window.partitionBy(partCol)))
      .select(col(partCol), col("__bkt"), col("__off"), col("__nextf"),
        col("top_key"), col("__n"))
    val wloc = Window.partitionBy(partCol, "__bkt")
      .orderBy(col(valueCol).desc, col(keyCol))
    bucketed.join(broadcast(binfo), Seq(partCol, "__bkt"))
      .withColumn("__r", col("__off") + row_number().over(wloc))
      // in-bucket lead is null exactly on each bucket's last row, where
      // the true successor is the next non-empty bucket's first key
      .withColumn("next_key",
        coalesce(lead(col(keyCol), 1).over(wloc), col("__nextf")))
      .withColumn("__base", expr(s"__n DIV $tiles"))
      .withColumn("__rem", col("__n") % tiles)
      .withColumn("tile",
        when(col("__r") <= col("__rem") * (col("__base") + 1),
          expr("(__r - 1) DIV (__base + 1) + 1"))
          .otherwise(expr(
            "__rem + (__r - __rem * (__base + 1) - 1) DIV __base + 1"))
          .cast("bigint"))
      .drop("__bkt", "__off", "__nextf", "__n", "__r", "__base", "__rem")
  }

  /** Running total (and per-key grand total) over a LOW-CARDINALITY
    * partition key, without the single-task-per-key sort of
    * `sum(v) OVER (PARTITION BY lowCardKey ORDER BY o)` — the
    * [[scalableNtile]] skeleton applied to prefix sums:
    *
    *  1. broadcast per-key (min, max) of the UNIQUE integer order
    *     column → each row's deterministic ascending range bucket
    *     (pure integer arithmetic: (o − min) DIV (span DIV buckets + 1)
    *     — divide-first so the derivation cannot overflow Long even
    *     when the key's order span approaches Long.MaxValue);
    *  2. ONE tiny aggregate (≤ |keys|·`buckets` rows) of per-bucket
    *     value sums → cumulative bucket offsets and the per-key grand
    *     total (windows over this bounded relation are free);
    *  3. per (key, bucket) local running sum + broadcast offset = the
    *     exact corpus-wide prefix sum.
    *
    * Max task sort ≈ n/(|keys|·`buckets`). Output: input columns +
    * (`cumName` = inclusive running total, `totName` = per-key total),
    * bit-identical to the plain window formulation — the callers'
    * DuckDB oracles (plain windowed SQL) are standing differential
    * proofs, and ScaleSpec pins bit-equality on adversarial shapes.
    *
    * `orderCol` must be integer-typed and unique per `partCol` group
    * (a running total under ties has no deterministic definition);
    * `valueCol` must be integer-typed (the exactness contract).
    */
  def scalablePrefixSum(df: DataFrame, partCol: String, orderCol: String,
                        valueCol: String, cumName: String, totName: String,
                        buckets: Int = 64): DataFrame = {
    // the documented preconditions are cheap to assert at the schema
    // level — a violation must fail loudly, not produce silently wrong
    // prefix sums (uniqueness per key is data-level and asserted in
    // ScaleSpec's adversarial fixtures instead)
    def integral(c: String) = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral(orderCol) && integral(valueCol),
      s"scalablePrefixSum: `$orderCol` and `$valueCol` must be integer-typed, got " +
        s"${df.schema(orderCol).dataType}/${df.schema(valueCol).dataType}")
    val reserved = df.columns.toSet.intersect(Set("__omin", "__omax", "__bkt", "__off", "__tot"))
    require(reserved.isEmpty,
      s"scalablePrefixSum: input already has reserved column(s) ${reserved.mkString(", ")}")
    val span = Scale.stage(df.groupBy(partCol)
      .agg(min(orderCol).as("__omin"), max(orderCol).as("__omax")))
    val bucketed = df.join(broadcast(span), partCol)
      // DIV (integer division): `/` on longs is DOUBLE division in
      // Spark SQL and would put a float in the bucket id; the DIV form
      // keeps the bucket derivation exact. Divide-FIRST (bucket width
      // w = span DIV B + 1, bucket = (o − min) DIV w): the multiply-first
      // form ((o−min)·B) overflows Long once the key's order span
      // exceeds Long.MaxValue/B. Still lands in [0, buckets): with
      // span = kB + r (r < B), w = k+1 and span DIV w ≤ (B(k+1)−1) DIV
      // (k+1) ≤ B−1; monotone in o, so bucket order = order order.
      .withColumn("__bkt",
        expr(s"(`$orderCol` - __omin) DIV ((__omax - __omin) DIV $buckets + 1)")
          .cast("int"))
      .drop("__omin", "__omax")
    val bagg = bucketed.groupBy(partCol, "__bkt")
      .agg(sum(valueCol).as("__bsum"))
    val wb = Window.partitionBy(partCol).orderBy("__bkt")
    val binfo = bagg
      .withColumn("__off", coalesce(
        sum("__bsum").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__tot", sum("__bsum").over(Window.partitionBy(partCol)))
      .select(col(partCol), col("__bkt"), col("__off"), col("__tot"))
    val wloc = Window.partitionBy(partCol, "__bkt").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(binfo), Seq(partCol, "__bkt"))
      .withColumn(cumName, col("__off") + sum(valueCol).over(wloc))
      .withColumn(totName, col("__tot"))
      .drop("__bkt", "__off", "__tot")
  }
}
