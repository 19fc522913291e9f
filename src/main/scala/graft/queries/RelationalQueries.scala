package graft.queries

import graft.Tables
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3-C — relational backbone over the TPC-H-ish star schema.
  *
  * Scale notes baked into each query: dimension sides are `broadcast()`
  * so fact-table joins never shuffle the big side; money aggregates sum
  * exact integer cents (fixture values are 2-decimal) so parallel
  * accumulation order cannot perturb results vs the oracle; every output
  * is BIGINT/DOUBLE/VARCHAR with a total ORDER BY.
  */
object RelationalQueries {
  import ConnectorQueries.{detRound4, detRound4Sql}

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("bigint")

  /** TPC-H Q1-style sort-agg: one shuffle of 4-ish grouped rows after
    * map-side partial agg over the full lineitem scan.
    */
  def qPricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("bigint")) / 10000.0).as("sum_disc_price"),
        detRound4(sum(cents(col("l_extendedprice"))) / (count(lit(1)) * 100.0))
          .as("avg_price"),
        detRound4(sum(cents(col("l_discount"))) / (count(lit(1)) * 100.0))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Broadcast-hash equi join: filtered customer dim (small) is broadcast
    * to the orders fact scan; aggregation shuffles only custkey groups.
    */
  def qJoinBcast(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    Tables.orders(s, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("sum_total"))
      .orderBy("c_custkey")
  }

  /** 4-way join: lineitem ⋈ orders (big-big, shuffled hash/SMJ under AQE)
    * with customer⋈nation pre-joined and broadcast as one small dim.
    */
  def qJoinMulti(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("bigint")) / 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  /** Left-semi: customers having at least one order. The orders side is
    * reduced to distinct keys by the semi join itself — no payload moves.
    */
  def qSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti: customers with no high-value order (every customer has
    * SOME order in the fixture, so the filter keeps the result non-empty
    * and the anti join meaningful).
    */
  def qAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** row_number top-1 order per customer, with the customer's order count. */
  def qWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_orders",
        count(lit(1)).over(Window.partitionBy("o_custkey")))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice", "n_orders")
      .orderBy("o_custkey")
  }

  /** Window-function breadth beyond ranks and frames: ntile quartiles,
    * lead, and first_value over one deterministic (price desc, key)
    * order per `o_orderpriority` — computed WITHOUT a per-priority
    * single-task sort. A naive `Window.partitionBy(o_orderpriority)`
    * caps parallelism at the key's 5 distinct values forever (one task
    * sorts ~20 TB at 100 TB); [[graft.operators.Relational.scalableNtile]]
    * splits each priority into deterministic price-range sub-buckets
    * and reassembles ntile/lead/first_value from broadcast per-bucket
    * offsets. The oracle stays the PLAIN windowed SQL — the driver
    * hash-match is a differential proof the rewrite preserves the
    * window semantics exactly (the [[qWindowSalted]] discipline).
    */
  def qNtile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Relational.scalableNtile(
        Tables.orders(s, dir)
          .select("o_orderkey", "o_orderpriority", "o_totalprice"),
        partCol = "o_orderpriority", valueCol = "o_totalprice",
        keyCol = "o_orderkey", tiles = 4)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("tile").as("quartile"), col("next_key"), col("top_key"))
      .orderBy("o_orderkey")

  /** The same top-1-per-customer as q_window, but through the two-phase
    * SALTED top-k ([[graft.operators.Scale.saltedTopKPerKey]]) — the skew
    * path for hot keys. The oracle is the PLAIN windowed SQL: the driver
    * hash-match is a differential proof that salting preserves semantics.
    */
  def qWindowSalted(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.saltedTopKPerKey(
        Tables.orders(s, dir), col("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")),
        k = 1, salts = 8, tiebreak = col("o_orderkey"))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")

  /** Explicit ROWS frame: per-customer running total in order-date order. */
  def qRunning(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("running_total",
        Relational.runningCentsSum(col("o_totalprice"), col("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey"))))
      .select("o_custkey", "o_orderkey", "running_total")
      .orderBy("o_custkey", "o_orderkey")

  /** rollup(n_name, c_mktsegment) subtotal grid; NULL grouping slots are
    * coalesced to a sentinel so Spark/DuckDB NULL-ordering differences
    * can't bite.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    // DataFrame-API rollup hits an ambiguous-column quirk when the
    // grouping columns are re-selected through coalesce (the Expand node
    // re-exposes the join child's attributes); the SQL form is clean.
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_mktsegment", "c_acctbal")
      .createOrReplaceTempView("graft_rollup_in")
    s.sql(
      """SELECT coalesce(n_name, '__ALL__') AS nation,
        |       coalesce(c_mktsegment, '__ALL__') AS segment,
        |       count(*) AS n_cust,
        |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_bal
        |FROM graft_rollup_in
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin)
  }

  /** GROUPING SETS: independent subtotal rows by nation and by segment —
    * the general form rollup/cube specialize.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_mktsegment", "c_acctbal")
      .createOrReplaceTempView("graft_gsets_in")
    s.sql(
      """SELECT coalesce(n_name, '__ALL__') AS nation,
        |       coalesce(c_mktsegment, '__ALL__') AS segment,
        |       count(*) AS n_cust
        |FROM graft_gsets_in
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        |ORDER BY nation, segment""".stripMargin)
  }

  /** Correlated scalar subquery: each order's price (in exact cents)
    * minus its customer's average order price. Catalyst DECORRELATES the
    * subquery into an aggregate + join — the plan scales like a groupBy,
    * never a per-row loop — and integer-cents division keeps the average
    * exact on both engines (positive operands, so truncating and floor
    * integer division agree).
    */
  def qCorr(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_corr_orders")
    s.sql(
      """SELECT o_orderkey,
        |       CAST(round(o_totalprice * 100) AS BIGINT) -
        |       (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) DIV count(*)
        |        FROM graft_corr_orders o2
        |        WHERE o2.o_custkey = o1.o_custkey) AS cents_vs_cust_avg
        |FROM graft_corr_orders o1
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** LATERAL correlated subquery with LIMIT: top-2 orders per customer —
    * the per-row-subquery formulation of a grouped top-k; Spark plans the
    * lateral as a join with a per-group limit, never a driver loop.
    * Customers without orders drop (inner lateral), matching DuckDB.
    */
  def qLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_lat_c")
    Tables.orders(s, dir).createOrReplaceTempView("graft_lat_o")
    s.sql(
      """SELECT c_custkey, l.o_orderkey, l.cents
        |FROM graft_lat_c c, LATERAL (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM graft_lat_o
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY cents DESC, o_orderkey LIMIT 2) l
        |ORDER BY c_custkey, cents DESC, o_orderkey""".stripMargin)
  }

  /** Correlated EXISTS + NOT EXISTS: Catalyst decorrelates into one
    * left-semi and one left-anti join — never a per-row subquery loop.
    */
  def qExists(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_ex_c")
    Tables.orders(s, dir).createOrReplaceTempView("graft_ex_o")
    s.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM graft_ex_c c
        |WHERE EXISTS (SELECT 1 FROM graft_ex_o o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM graft_ex_o o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Set algebra: (AUTOMOBILE customers ∪ big spenders) ∖ F-status customers. */
  def qSetops(s: SparkSession, dir: String): DataFrame = {
    val auto = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey").as("k"))
    val big = Tables.orders(s, dir)
      .where(col("o_totalprice") > 400000.0).select(col("o_custkey").as("k"))
    val fstat = Tables.orders(s, dir)
      .where(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    auto.union(big).except(fstat).orderBy("k")
  }

  /** Intersect: AUTOMOBILE customers who also placed an URGENT order. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    val auto = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey").as("k"))
    val urgent = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("k"))
    auto.intersect(urgent).orderBy("k")
  }

  /** Global top-10 by price — Spark plans TakeOrderedAndProject: each
    * partition keeps 10 rows, no full sort materializes.
    */
  def qSortlimit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

  /** Scalar-function batch: string, date, conditional, arithmetic. */
  def qScalar(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        lower(col("o_orderstatus")).as("status_lc"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
          .cast("bigint").as("days_since"),
        when(col("o_totalprice") > 300000.0, "high")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("low").as("bucket"),
        (col("o_orderpriority") === "1-URGENT").cast("bigint").as("is_urgent"))
      .orderBy("o_orderkey")

  /** Pivot (long → wide): per-user event-type counts as columns — the
    * generalized form of the reference's KV-array flatten for a FIXED key
    * set (SURVEY R5 note). Map-side partial agg; output one row per user.
    */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** cube(returnflag, linestatus): the full subtotal lattice. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("bigint")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("__ALL__")).as("rf"),
        coalesce(col("l_linestatus"), lit("__ALL__")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  /** HLL sketch distinct counts (no oracle — approximate by design; the
    * driver records a rows-only check). At 100 TB this replaces exact
    * distinct: fixed-size sketch per group, partial-merged map-side.
    */
  def qApprox(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("n_approx"))
      .orderBy("event_type")

  /** Error-bound audit of [[qApprox]] — the measured bracket that makes
    * the rows-only estimate auditable: ONE aggregate computes the exact
    * distinct count and the HLL++ estimate side by side, and asserts
    * the estimate inside the documented 3-standard-error band
    * (relativeSD defaults to 0.05; +1 absolute slack covers integer
    * rounding at tiny cardinalities). The oracle replays the exact
    * count and pins within_3se = 1 — Spark MEASURES the claim, so a
    * sketch regression fails the hash gate rather than hiding behind
    * the rows-only twin.
    */
  def qApproxErr(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id")).as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") <=
          lit(0.15) * col("n_exact").cast("double") + lit(1.0))
          .cast("bigint").as("within_3se"))
      .orderBy("event_type")

  /** As-of join via the union+window pattern ([[Relational.asofJoin]]):
    * for each event, the value of the same user's most recent purchase
    * strictly before it.
    */
  def qAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.where(col("event_type") === "purchase")
    Relational.asofJoin(
        left = ev, right = purchases, key = "user_id",
        leftTs = col("ts_us"), rightTs = col("ts_us"),
        leftTie = col("event_id"), rightTie = col("event_id"),
        leftCols = Seq("event_id"), payload = col("value"), strict = true)
      .select(col("event_id"),
        detRound4(col("asof_value")).as("last_purchase_value"))
      .orderBy("event_id")
  }

  /** Band join: for each error event, how many clicks landed within
    * ±30 s — the temporal-correlation probe (errors near click bursts)
    * that is a pure NON-equi join. [[Relational.bandJoinBinned]] turns
    * it into an equi-join on 30 s bins (3× replication of the click
    * side) so the plan is a shuffle join AQE can manage, not the
    * BroadcastNestedLoopJoin a bare |Δt| ≤ w predicate plans — the
    * difference between O(n·m) comparisons and band-selectivity cost
    * at 100 TB. RangeJoinSpec asserts the no-nested-loop plan shape.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.where(col("event_type") === "error")
    val clicks = ev.where(col("event_type") === "click")
    Relational.bandJoinBinned(
        errors, unix_millis(col("ts")), clicks, unix_millis(col("ts")),
        bandWidthMs = 30000L, leftCols = Seq("event_id"))
      .groupBy("event_id")
      .agg(count(col("rts")).as("n_clicks_30s"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> qRangeJoin _,
    "q_pricing"    -> qPricing _,
    "q_join_bcast" -> qJoinBcast _,
    "q_join_multi" -> qJoinMulti _,
    "q_semi"       -> qSemi _,
    "q_anti"       -> qAnti _,
    "q_window"     -> qWindow _,
    "q_ntile"      -> qNtile _,
    "q_window_salted" -> qWindowSalted _,
    "q_running"    -> qRunning _,
    "q_rollup"     -> qRollup _,
    "q_gsets"      -> qGroupingSets _,
    "q_setops"     -> qSetops _,
    "q_corr"       -> qCorr _,
    "q_exists"     -> qExists _,
    "q_lateral"    -> qLateral _,
    "q_intersect"  -> qIntersect _,
    "q_sortlimit"  -> qSortlimit _,
    "q_scalar"     -> qScalar _,
    "q_pivot"      -> qPivot _,
    "q_cube"       -> qCube _,
    "q_approx"     -> qApprox _,
    "q_approx_err" -> qApproxErr _,
    "q_asof"       -> qAsof _)

  val oracle: Map[String, String] = Map(
    "q_approx_err" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       CAST(1 AS BIGINT) AS within_3se
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
        |       CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS sum_disc_price,
        |       ${detRound4Sql("CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/(count(*)*100.0)")} AS avg_price,
        |       ${detRound4Sql("CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/(count(*)*100.0)")} AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_bcast" ->
      """SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name,
        |       CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_window" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |         CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, n_orders
        |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       lead(o_orderkey, 1) OVER w AS next_key,
        |       first_value(o_orderkey) OVER w AS top_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_salted" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice
        |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_running" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100.0 AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(n_name, '__ALL__') AS nation,
        |       coalesce(c_mktsegment, '__ALL__') AS segment,
        |       CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin,
    "q_gsets" ->
      """SELECT coalesce(n_name, '__ALL__') AS nation,
        |       coalesce(c_mktsegment, '__ALL__') AS segment,
        |       CAST(count(*) AS BIGINT) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        |ORDER BY nation, segment""".stripMargin,
    "q_lateral" ->
      """SELECT c_custkey, l.o_orderkey, l.cents
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey = c.c_custkey
        |  ORDER BY cents DESC, o_orderkey LIMIT 2) l
        |ORDER BY c_custkey, cents DESC, o_orderkey""".stripMargin,
    "q_corr" ->
      """SELECT o_orderkey,
        |       CAST(round(o_totalprice * 100) AS BIGINT) -
        |       (SELECT CAST(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT) // count(*)
        |        FROM orders o2 WHERE o2.o_custkey = o1.o_custkey) AS cents_vs_cust_avg
        |FROM orders o1
        |ORDER BY o_orderkey""".stripMargin,
    "q_exists" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_setops" ->
      """(SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        | UNION ALL
        | SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0)
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY k""".stripMargin,
    "q_sortlimit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin,
    "q_scalar" ->
      """SELECT o_orderkey,
        |       substring(o_orderpriority, 1, 1) AS prio_code,
        |       lower(o_orderstatus) AS status_lc,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |       CASE WHEN o_totalprice > 300000.0 THEN 'high'
        |            WHEN o_totalprice > 100000.0 THEN 'mid'
        |            ELSE 'low' END AS bucket,
        |       CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS is_urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
        |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, '__ALL__') AS rf,
        |       coalesce(l_linestatus, '__ALL__') AS ls,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_asof" ->
      s"""WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT event_id,
        |       ${detRound4Sql(
             """last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin)} AS last_purchase_value
        |FROM e ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      """WITH l AS (SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS lts
        |           FROM events WHERE event_type = 'error'),
        |     r AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS rts
        |           FROM events WHERE event_type = 'click')
        |SELECT l.event_id, CAST(count(r.rts) AS BIGINT) AS n_clicks_30s
        |FROM l LEFT JOIN r ON abs(r.rts - l.lts) <= 30000
        |GROUP BY l.event_id ORDER BY l.event_id""".stripMargin)
}
