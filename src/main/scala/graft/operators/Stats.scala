package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators: distribution-law fits and summary
  * moments a curation pipeline reads before choosing thresholds.
  *
  * Exactness discipline: anything order-dependent (sums of doubles)
  * quantizes to integers first — ln() runs only on BOUNDED relations
  * (the x_dsir rule), per-value results quantize at 2^20, and all
  * sums accumulate exactly as DECIMAL(38,0); doubles reappear in ONE
  * final assembly per output column.
  */
object Stats {

  /** 2^20 — the per-value quantum for [[zipfFit]]'s ln values. */
  val LnQ: Long = 1L << 20

  /** Zipf-law fit over a frequency relation: take the top-`k` items by
    * count (the head — where Zipf's law is classically read), rank
    * them 1..k, and fit ln(cnt) = intercept + slope·ln(rank) by OLS.
    * A natural-language corpus sits near slope ≈ −1; the slope and r²
    * are the repetitiveness / vocabulary-health numbers a pipeline
    * alerts on (word-salad → flat slope, low r²; template spam →
    * cliff-shaped head, low r²).
    *
    * One row out: (n_head, slope, intercept_ln, r2).
    *
    * SCALE SHAPE: the count relation aggregates map-side; TakeOrdered
    * bounds the head at k rows, and everything after — the rank
    * window, the ln quantization, the five sums — runs on that bounded
    * relation (the empty-partition window is legal here for exactly
    * that reason). EXACTNESS: x = round(ln rank·2^20) and
    * y = round(ln cnt·2^20) are non-negative integers; Σx, Σy, Σx²,
    * Σy², Σxy accumulate as DECIMAL(38,0); slope/intercept/r² each
    * assemble in one double expression from those exact sums, so the
    * result is independent of partitioning and bit-equal across
    * engines (ln itself runs on ≤k rows — the bounded-table rule).
    */
  def zipfFit(counts: DataFrame, item: Column, cnt: Column, k: Int): DataFrame = {
    val head = counts.select(item.as("item"), cnt.as("cnt"))
      .orderBy(col("cnt").desc, col("item")).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("item"))
    lnOlsFit(head.withColumn("rank", row_number().over(w)),
      col("rank"), col("cnt"))
      .withColumnRenamed("n_pts", "n_head")
  }

  /** Pearson correlation for every pair of integer metric columns —
    * the redundancy check a pipeline runs before composing quality
    * features into one gate (two metrics at |r| ≈ 1 carry one signal).
    *
    * One pass: a single aggregate computes n, each Σm and every
    * pairwise Σm_i·m_j as exact DECIMAL(38,0) sums (order-independent
    * at any partitioning); each correlation then assembles in one
    * double expression — the variance product multiplies as DOUBLE
    * (two ~n²·max² decimals would overflow DECIMAL(38,0) at corpus
    * scale). Zero variance on either side → r = 0 by convention (and
    * Spark ANSI would otherwise throw on the double /0).
    *
    * Returns one row per unordered metric pair:
    * (pair "a~b", n_docs, corr).
    */
  def corrPairs(df: DataFrame, metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.size >= 2, "corrPairs needs at least two metrics")
    val names = metrics.map(_._1)
    val base = df.select(metrics.map { case (n, c) => c.cast("long").as(n) }: _*)
    val aggs = names.map(n => sum(col(n).cast("decimal(38,0)")).as(s"s_$n")) ++
      (for { i <- names.indices; j <- i until names.size } yield
        // decimal BEFORE the multiply: a per-row metric product of two
        // ~3e9-scale longs (chars of a multi-GB doc) overflows long*long
        // before a post-hoc cast could widen it
        sum(col(names(i)).cast("decimal(38,0)") * col(names(j)))
          .as(s"p_${names(i)}_${names(j)}"))
    val s = base.agg(count(lit(1)).as("n"), aggs: _*)
    val pairRows = for { i <- names.indices; j <- (i + 1) until names.size } yield {
      val (a, b) = (names(i), names(j))
      def varOf(x: String) = s"(n * p_${x}_$x - s_$x * s_$x)"
      struct(lit(s"$a~$b").as("pair"),
        expr(s"CASE WHEN ${varOf(a)} = 0 OR ${varOf(b)} = 0 THEN 0.0 ELSE " +
          s"CAST(n * p_${a}_$b - s_$a * s_$b AS DOUBLE)" +
          s" / sqrt(CAST(${varOf(a)} AS DOUBLE) * CAST(${varOf(b)} AS DOUBLE)) END")
          .as("corr0"))
    }
    s.select(col("n"), explode(array(pairRows: _*)).as("pr"))
      .select(col("pr.pair").as("pair"), col("n").cast("bigint").as("n_docs"),
        graft.functions.Det.detRound4(col("pr.corr0")).as("corr"))
  }

  /** OLS fit of ln(y) against ln(x) over positive integer pairs — the
    * shared core of [[zipfFit]] and the Heaps'-law fit. Non-positive
    * pairs are outside the log-log domain and are dropped (both
    * engines apply the same filter). One row out:
    * (n_pts, slope, intercept_ln, r2), with the degenerate-variance
    * guards described on [[zipfFit]].
    */
  def lnOlsFit(pairs: DataFrame, xv: Column, yv: Column): DataFrame = {
    val Q = LnQ
    val xy = pairs.where(xv > 0 && yv > 0)
      .select(round(log(xv.cast("double")) * Q).cast("long").as("x"),
        round(log(yv.cast("double")) * Q).cast("long").as("y"))
    // the long products are provably bounded: |x|,|y| ≤ ln(2^63)·2^20
    // ≈ 4.6e7, so every pairwise product ≤ ~2.2e15 ≪ 2^63 — exact in
    // long; the decimal cast protects only the corpus-sized SUM
    val sums = xy.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
    // degenerate-head guards (Spark ANSI: even DOUBLE /0 throws; DuckDB
    // /0 is inf — the CASE makes both engines emit the same 0.0):
    // zero x-variance (head of <= 1 row) -> slope/intercept 0; zero
    // y-variance (all-tied counts) -> r2 0
    sums.select(col("n").as("n_pts"),
      graft.functions.Det.detRound4(expr(
        "CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE " +
          "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) END"))
        .as("slope"),
      graft.functions.Det.detRound4(expr(
        s"CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE " +
          s"CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / $Q END"))
        .as("intercept_ln"),
      graft.functions.Det.detRound4(expr(
        "CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0.0 ELSE " +
          "CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)" +
          " / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) END"))
        .as("r2"))
  }
}
