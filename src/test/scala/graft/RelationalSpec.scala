package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (1L, 200L, 12L), (2L, 50L, 13L))
    .toDF("k", "ts", "id")
  // right rows at ts 100 and 200 for key 1
  private val right = Seq(
    (1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0))
    .toDF("k", "ts", "id", "v")

  test("asof strict: a row at the same (ts, tie) does NOT match itself") {
    val out = Relational.asofJoin(left, right, "k",
        col("ts"), col("ts"), col("id"), col("id"),
        Seq("id"), col("v"), strict = true)
      .as[(Long, Option[Double])].collect().toMap
    assert(out(10L).isEmpty, "first event has nothing strictly before it")
    assert(out(11L).contains(1.0), "same (ts,id) right row excluded; previous one matches")
    assert(out(12L).contains(2.0), "later tiebreak sees the (200,11) right row")
    assert(out(13L).isEmpty, "different key never matches")
  }

  test("band join: exact window edges, zero-match rows survive, no nested loop") {
    // right rows planted exactly ON and just past the ±500 ms band edges
    val lSrc = Seq((1L, 1000L), (2L, 2000L), (3L, 500000L)).toDF("id", "t")
    val rSrc = Seq(500L, 1500L, 1501L, 2000L, 2499L, 2501L).toDF("t")
    val joined = Relational.bandJoinBinned(
      lSrc, col("t"), rSrc, col("t"), 500L, Seq("id"))
    val counts = joined.groupBy("id")
      .agg(count(col("rts")).as("n")).as[(Long, Long)].collect().toMap
    // id 1 (t=1000): matches 500 (|Δ|=500, inclusive) and 1500; not 1501
    assert(counts(1L) == 2L, s"edge-inclusive band around 1000: $counts")
    // id 2 (t=2000): matches 1500, 2000, 2499; not 1501? |2000-1501|=499 → matches!
    assert(counts(2L) == 4L, s"band around 2000: $counts")
    // id 3: nothing within 500 ms → survives with zero
    assert(counts(3L) == 0L, "zero-match left row must survive the left-outer")

    // plan shape: equi-join on bin, never a nested loop / cartesian
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "band join must plan as an equi-join on the bin key")
  }

  test("asof inclusive: a row at the same (ts, tie) matches itself") {
    val out = Relational.asofJoin(left, right, "k",
        col("ts"), col("ts"), col("id"), col("id"),
        Seq("id"), col("v"), strict = false)
      .as[(Long, Option[Double])].collect().toMap
    assert(out(10L).contains(1.0))
    assert(out(11L).contains(2.0))
    assert(out(12L).contains(2.0))
  }

  private def plainNtile(df: org.apache.spark.sql.DataFrame, tiles: Int) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p")
      .orderBy(col("v").desc, col("k"))
    df.select(col("p"), col("k"),
      ntile(tiles).over(w).cast("bigint").as("tile"),
      lead(col("k"), 1).over(w).as("next_key"),
      first_value(col("k")).over(w).as("top_key"))
  }

  test("scalableNtile: bit-identical to the plain window on adversarial shapes") {
    // shapes that stress every reassembly seam: a key with fewer rows
    // than tiles (n=2 < 4), n%tiles in {0,1,2,3}, heavy VALUE TIES that
    // straddle bucket boundaries, a constant-value key (pmin == pmax),
    // and a negative-value key
    val rows = Seq.tabulate(37)(i => ("a", i.toLong, (i % 5).toDouble)) ++
      Seq(("b", 100L, 7.0), ("b", 101L, 7.0)) ++
      Seq.tabulate(8)(i => ("c", 200L + i, 3.25)) ++
      Seq.tabulate(12)(i => ("d", 300L + i, -1.0 * i)) ++
      Seq.tabulate(16)(i => ("e", 400L + i, i.toDouble))
    val df = rows.toDF("p", "k", "v").repartition(7)
    for (buckets <- Seq(1, 3, 64)) {
      val got = Relational.scalableNtile(df, "p", "v", "k", 4, buckets)
        .select("p", "k", "tile", "next_key", "top_key")
        .orderBy("p", "k").collect().toSeq
      val want = plainNtile(df, 4).orderBy("p", "k").collect().toSeq
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("scalableNtile plan: no window partitioned on the low-card key alone") {
    val df = Seq.tabulate(64)(i => ("a", i.toLong, i.toDouble)).toDF("p", "k", "v")
    val out = Relational.scalableNtile(df, "p", "v", "k", 4)
    out.collect()
    // AQE wraps stages as leaf nodes — flatten through them by hand
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val windows = flatten(out.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the corpus-scale window must partition on (p, __bkt); only the
    // bounded ≤|keys|·buckets bucket-info relation may window on p alone
    val corpusWide = windows.filter(_.partitionSpec.map(_.sql) == Seq("p"))
    assert(windows.nonEmpty, "expected window operators in the plan")
    assert(corpusWide.forall(w =>
        w.child.toString.contains("__bc") || w.toString.contains("__bc")),
      s"a full-width window partitions on p alone:\n${corpusWide.mkString}")
  }

  test("scalablePrefixSum: bit-identical to the plain running window") {
    import spark.implicits._
    // seams: a 1-row key, a key whose order ids are sparse/clustered
    // (all 37 rows land in few buckets), negative values, and a key
    // with omin == omax
    val rows = Seq.tabulate(37)(i => ("a", i.toLong * 97, (i % 7).toLong - 3)) ++
      Seq(("b", 5L, 42L)) ++
      Seq.tabulate(16)(i => ("c", 1000L + i, i.toLong)) ++
      Seq(("d", 9L, 1L), ("d", 9000000L, 2L))
    val df = rows.toDF("p", "o", "v").repartition(5)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p").orderBy("o")
    val want = df
      .withColumn("cum", sum("v").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("tot", sum("v").over(
        org.apache.spark.sql.expressions.Window.partitionBy("p")))
      .orderBy("p", "o").collect().toSeq
    for (buckets <- Seq(1, 3, 64)) {
      val got = Relational.scalablePrefixSum(df, "p", "o", "v", "cum", "tot",
        buckets).orderBy("p", "o").collect().toSeq
      assert(got == want, s"buckets=$buckets")
    }
    // the fixtures above (and every production caller) also satisfy the
    // documented uniqueness-per-key precondition — assert it so a future
    // fixture edit that breaks it fails here, not as a silent wrong sum
    assert(df.groupBy("p", "o").count().where(col("count") > 1).isEmpty,
      "spec fixture must keep orderCol unique per key")
  }

  test("scalablePrefixSum: near-Long.MaxValue order span (divide-first bucket math)") {
    import spark.implicits._
    // a span this wide overflows the multiply-first bucket form
    // ((o − min)·64 > Long.MaxValue); the divide-first form is exact
    val big = Long.MaxValue - 3
    val rows = Seq(("k", 0L, 1L), ("k", big / 2, 2L), ("k", big, 3L),
      ("k", 17L, 5L), ("k", big - 17L, 7L))
    val df = rows.toDF("p", "o", "v")
    val got = Relational.scalablePrefixSum(df, "p", "o", "v", "cum", "tot", 64)
      .orderBy("o").select("o", "cum", "tot").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 18L), (17L, 6L, 18L), (big / 2, 8L, 18L),
      (big - 17L, 15L, 18L), (big, 18L, 18L)))
  }

  test("scalablePrefixSum: precondition violations fail loudly") {
    import spark.implicits._
    val nonInt = Seq(("a", 1.5, 1L)).toDF("p", "o", "v")
    val ex = intercept[IllegalArgumentException] {
      Relational.scalablePrefixSum(nonInt, "p", "o", "v", "cum", "tot")
    }
    assert(ex.getMessage.contains("integer-typed"))
    val clobber = Seq(("a", 1L, 1L, 0)).toDF("p", "o", "v", "__bkt")
    val ex2 = intercept[IllegalArgumentException] {
      Relational.scalablePrefixSum(clobber, "p", "o", "v", "cum", "tot")
    }
    assert(ex2.getMessage.contains("reserved"))
  }
}
