package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("zipf fit recovers slope -1 and r2 ~ 1 on an exact power law") {
    // cnt(r) = round(C / r): the textbook Zipf head
    val counts = (1 to 300).map(r => (f"item$r%04d", math.round(1e6 / r)))
      .toDF("item", "cnt")
    val row = Stats.zipfFit(counts, col("item"), col("cnt"), 300)
      .as[(Long, Double, Double, Double)].head()
    val (n, slope, intercept, r2) = row
    assert(n == 300L)
    assert(math.abs(slope + 1.0) < 0.01, s"slope $slope should be ~ -1")
    assert(math.abs(intercept - math.log(1e6)) < 0.05,
      s"intercept $intercept should be ~ ln(C)")
    assert(r2 > 0.9999, s"r2 $r2 should be ~ 1 on an exact law")
  }

  test("zipf fit slope is flat on a near-uniform head (word-salad signature)") {
    // near-uniform frequencies: after rank-sorting, ln(cnt) is still
    // monotone (rank is DEFINED by the sort, so r2 stays highish) but
    // the SLOPE — the signal a quality gate reads — collapses to ~0,
    // nowhere near a natural corpus's -1
    val counts = (1 to 100).map(r => (f"u$r%03d", 500L + (r * 37) % 5))
      .toDF("item", "cnt")
    val (_, slope, _, _) = Stats.zipfFit(counts, col("item"), col("cnt"), 100)
      .as[(Long, Double, Double, Double)].head()
    assert(math.abs(slope) < 0.01, s"slope $slope should be ~ 0 on uniform counts")
  }

  test("lnOlsFit recovers a planted Heaps exponent and drops non-positive pairs") {
    // V(n) = 3 * n^0.75 sampled at 16 growing checkpoints, plus junk
    // rows outside the log-log domain that the fit must ignore
    val pts = (1 to 16).map { i =>
      val n = i * 10000L
      (n, math.round(3.0 * math.pow(n.toDouble, 0.75)))
    } ++ Seq((0L, 5L), (100L, 0L), (-3L, 7L))
    val (np, slope, intercept, r2) = Stats.lnOlsFit(
        pts.toDF("tokens", "vocab"), col("tokens"), col("vocab"))
      .as[(Long, Double, Double, Double)].head()
    assert(np == 16L, "non-positive pairs are outside the log-log domain")
    assert(math.abs(slope - 0.75) < 0.005, s"slope $slope should be ~ beta")
    assert(math.abs(intercept - math.log(3.0)) < 0.05,
      s"intercept $intercept should be ~ ln K")
    assert(r2 > 0.9999, s"r2 $r2 should be ~ 1 on an exact law")
  }

  test("corrPairs: planted perfect, anti, and zero-variance relationships") {
    val df = (1 to 200).map { i =>
      (i.toLong, i * 2L + 5L, 300L - i, 7L)
    }.toDF("a", "b", "c", "d")
    val out = Stats.corrPairs(df, Seq(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "d" -> col("d")))
      .as[(String, Long, Double)].collect()
      .map { case (p, _, r) => p -> r }.toMap
    assert(out.size == 6)
    assert(out("a~b") == 1.0, "exact linear relation -> r = 1")
    assert(out("a~c") == -1.0, "exact negative relation -> r = -1")
    assert(out("a~d") == 0.0, "constant metric -> zero-variance convention 0")
    assert(out("b~c") == -1.0)
  }

  test("corrPairs matches a scalar Pearson on random integers") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(_ => (rnd.nextInt(1000).toLong,
      rnd.nextInt(1000).toLong))
    val got = Stats.corrPairs(rows.toDF("x", "y"),
        Seq("x" -> col("x"), "y" -> col("y")))
      .as[(String, Long, Double)].head()._3
    val n = rows.size.toDouble
    val (sx, sy) = (rows.map(_._1).sum.toDouble, rows.map(_._2).sum.toDouble)
    val sxx = rows.map(r => r._1 * r._1).sum.toDouble
    val syy = rows.map(r => r._2 * r._2).sum.toDouble
    val sxy = rows.map(r => r._1 * r._2).sum.toDouble
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got - want) < 1e-4, s"$got vs $want")
  }

  private def plantDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_docs").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("x_kl is exactly zero on identical parity halves") {
    // doc 2i and 2i+1 carry the SAME text: every gram has c0 == c1, so
    // the quantized KL terms cancel exactly (not just approximately)
    val texts = (0 until 20).map(i => s"alpha beta gamma delta epsilon t$i u$i v$i w$i")
    val dir = plantDocs(texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((2L * i, t), (2L * i + 1, t))
    })
    val (v, n0, n1, kl01, kl10, tv) = graft.queries.PipelineQueries
      .queries("x_kl")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(n0 == n1 && v > 0)
    assert(kl01 == 0.0 && kl10 == 0.0 && tv == 0.0,
      s"identical halves must have zero drift: $kl01 $kl10 $tv")
  }

  test("x_keyness surfaces the planted odd-half marker gram first") {
    val base = "one two three four five six seven"
    val rows = (0 until 40).map { i =>
      val t = if (i % 2 == 1) s"$base marker xx yy" else base
      (i.toLong, t)
    }
    val dir = plantDocs(rows)
    val top = graft.queries.PipelineQueries.queries("x_keyness")(spark, dir)
      .orderBy(col("chi2").desc, col("gram"))
      .as[(String, Long, Long, Double, Long)].collect()
    val markerRows = top.filter(_._1.contains("marker"))
    assert(markerRows.nonEmpty, s"marker grams must rank in the top: ${top.toSeq}")
    markerRows.foreach { case (g, c0, c1, chi2, d) =>
      assert(c0 == 0L && c1 == 20L && d == -1L && chi2 > 10.0,
        s"$g should be odd-half exclusive: c0=$c0 c1=$c1 dir=$d chi2=$chi2")
    }
    // drift is now nonzero in both directions
    val (_, _, _, kl01, kl10, tv) = graft.queries.PipelineQueries
      .queries("x_kl")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(kl01 > 0.0 && kl10 > 0.0 && tv > 0.0)
    // the G2 view agrees: marker grams rank with positive keyness
    // toward the odd half, and balanced grams score ~0
    val llr = graft.queries.PipelineQueries.queries("x_llr")(spark, dir)
      .as[(String, Long, Long, Double, Long)].collect()
    val markerLlr = llr.filter(_._1.contains("marker"))
    assert(markerLlr.nonEmpty, s"marker grams must make the G2 top: ${llr.toSeq}")
    markerLlr.foreach { case (g, c0, c1, g2, d) =>
      assert(c0 == 0L && d == -1L && g2 > 10.0, s"$g: c0=$c0 g2=$g2 dir=$d")
    }
    val balanced = llr.filter(r => r._2 > 0 && r._3 > 0)
    balanced.foreach { case (g, _, _, g2, _) =>
      assert(g2 >= 0.0, s"G2 is non-negative, got $g2 for $g")
    }
  }

  test("x_bootstrap collapses to a point interval on a constant-length corpus") {
    // every doc the same length: every replica mean equals the corpus
    // mean no matter which docs the Poisson weights pick — lo == hi ==
    // mean, se == 0
    val dir = plantDocs((0 until 60).map(i => (i.toLong, "a b c d e")))
    val (n, mean, lo, hi, se) = graft.queries.PipelineQueries
      .queries("x_bootstrap")(spark, dir)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(n == 60L && mean == 5.0)
    assert(lo == 5.0 && hi == 5.0 && se == 0.0,
      s"constant metric must bootstrap to a point: $lo $hi $se")
  }

  test("x_bootstrap brackets the mean on a mixed-length corpus") {
    val texts = (0 until 100).map { i =>
      (i.toLong, (0 to (i % 10)).map(k => s"w$k").mkString(" "))
    }
    val dir = plantDocs(texts)
    val (n, mean, lo, hi, se) = graft.queries.PipelineQueries
      .queries("x_bootstrap")(spark, dir)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(n == 100L)
    assert(lo < mean && mean < hi, s"interval [$lo, $hi] must bracket $mean")
    assert(se > 0.0 && se < 1.0, s"se $se should be small but positive")
  }

  test("x_kl satisfies Gibbs and TV bounds on random planted corpora") {
    val rnd = new scala.util.Random(19)
    (1 to 3).foreach { trial =>
      val vocab = (0 until 30).map(k => s"w$trial-$k")
      val rows = (0 until 30).map { i =>
        val words = (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size)))
        (i.toLong, words.mkString(" "))
      }
      val dir = plantDocs(rows)
      val (v, n0, n1, kl01, kl10, tv) = graft.queries.PipelineQueries
        .queries("x_kl")(spark, dir)
        .as[(Long, Long, Long, Double, Double, Double)].head()
      assert(v > 0 && n0 > 0 && n1 > 0)
      // Gibbs: true KL >= 0; the 2^-20 ln quantization can dip a
      // rounded-to-4-decimals result at most one ulp below zero
      assert(kl01 >= -0.0002 && kl10 >= -0.0002,
        s"trial $trial: KL must be (quantization-)non-negative: $kl01 $kl10")
      assert(tv >= 0.0 && tv <= 1.0, s"trial $trial: TV in [0,1]: $tv")
    }
  }

  test("x_dedup_eval scores planted exact duplicates at full recall") {
    // 20 distinct docs plus one exact duplicate pair: truth = 1 pair,
    // and identical texts share every minhash band, so the banded tier
    // must surface it -> recall 1.0, n_hit >= 1
    val rows = (0 until 20).map { i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
    } :+ ((20L, "alpha7 beta7 gamma7 delta7 epsilon7 zeta7"))
    val dir = plantDocs(rows)
    val (nt, nc, nh, p, r, f1) = graft.queries.PipelineQueries
      .queries("x_dedup_eval")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(nt == 1L, s"exactly the planted duplicate pair is truth, got $nt")
    assert(nh == 1L && r == 1.0, s"bands must surface an exact duplicate: hit=$nh r=$r")
    assert(nc >= 1L && p > 0.0 && f1 > 0.0)
  }

  test("dp noise magnitude follows the geometric law P(k) = 2^-(k+1)") {
    // golden-ratio low-discrepancy walk over [0, 2^63) — deterministic,
    // near-uniform, so empirical masses sit tight around the law
    val phi = java.lang.Long.parseUnsignedLong("7046029254386353131")
    val us = (1 to 20000).map(i => (i * phi) & ((1L << 63) - 1)).toDF("u")
    val freq = us.selectExpr(s"(${queries.PipelineQueries.dpMagSql}) AS mag")
      .groupBy("mag").count().as[(Int, Long)].collect().toMap
    def share(k: Int) = freq.getOrElse(k, 0L).toDouble / 20000
    assert(math.abs(share(0) - 0.5) < 0.02, s"P(0)=0.5: ${share(0)}")
    assert(math.abs(share(1) - 0.25) < 0.02, s"P(1)=0.25: ${share(1)}")
    assert(math.abs(share(2) - 0.125) < 0.02, s"P(2)=0.125: ${share(2)}")
    assert(freq.keys.max <= queries.PipelineQueries.DP_MAG_CAP, "capped magnitude")
  }

  test("linear probe recovers an exact line and guards a degenerate design") {
    // y = 3 + 2·x1 + 5·x2 exactly → weights recovered, r2 = 1
    val line = (0 until 40).map { i =>
      val (x1, x2) = (i.toLong % 7, (i.toLong * 3) % 11)
      (x1, x2, 3L + 2L * x1 + 5L * x2)
    }.toDF("x1", "x2", "y")
    val (_, w0, w1, w2, r2) = queries.PipelineQueries.linearProbe3(line)
      .as[(Long, Double, Double, Double, Double)].head()
    assert((w0, w1, w2) == ((3.0, 2.0, 5.0)), s"exact line: ($w0, $w1, $w2)")
    assert(r2 == 1.0)
    // collinear design (x2 = 2·x1): det = 0 → zero weights, not a throw
    val degen = (0 until 20).map { i =>
      val x1 = i.toLong % 5
      (x1, 2L * x1, x1 + 1L)
    }.toDF("x1", "x2", "y")
    val (_, d0, d1, d2, _) = queries.PipelineQueries.linearProbe3(degen)
      .as[(Long, Double, Double, Double, Double)].head()
    assert((d0, d1, d2) == ((0.0, 0.0, 0.0)), "singular normal matrix guards to 0")
  }

  test("zipf fit survives degenerate heads: all-tied counts and a 1-row head") {
    // all counts equal: y-variance 0 -> r2 guard (Spark ANSI would
    // otherwise throw DIVIDE_BY_ZERO on the double division)
    val tied = (1 to 50).map(r => (s"t$r", 10L)).toDF("item", "cnt")
    val (n, _, _, r2) = Stats.zipfFit(tied, col("item"), col("cnt"), 20)
      .as[(Long, Double, Double, Double)].head()
    assert(n == 20L, "head is capped at k")
    assert(r2 == 0.0, "all-tied head has no fit: r2 convention 0")
    // one row: x-variance 0 -> slope/intercept guard
    val one = Seq(("only", 42L)).toDF("item", "cnt")
    val (n1, s1, i1, r21) = Stats.zipfFit(one, col("item"), col("cnt"), 20)
      .as[(Long, Double, Double, Double)].head()
    assert(n1 == 1L && s1 == 0.0 && i1 == 0.0 && r21 == 0.0)
  }
}
