package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Rule semantics of x_gopher_rules the fixture corpus can't exercise
  * (no punctuation, word lengths always inside Gopher's [3,10] band),
  * plus DSIR / MRL / epoch-planning invariants the hash oracle proves
  * only in aggregate.
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Write a synthetic documents table and return its dir. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("gopher").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("each gopher rule fires individually; pass is their conjunction") {
    val varied = (1 to 60).map(i => f"word$i%02d").mkString(" ")
    val rows = Seq(
      // 0: all rules pass (varied words, 2 stopwords, normal lengths)
      0L -> s"the a $varied",
      // 1: too short — r_words fails, everything else holds
      1L -> "the a word01 word02 word03",
      // 2: 12-char words push mean length above 10 — r_wordlen fails
      2L -> ("the a " + (1 to 60).map(i => f"longlongw$i%03d").mkString(" ")),
      // 3: no stopwords — r_stop fails
      3L -> varied,
      // 4: three words looped — duplicate 3-grams dominate, r_dup fails
      4L -> ("the a " + Seq.fill(20)("xx yy zz").mkString(" ")),
      // 5: digit words — alpha fraction 2/62 < 0.8, r_alpha fails
      5L -> ("the a " + (1 to 60).map(i => f"${i * 111}%03d").mkString(" ")))
    val out = PipelineQueries.xGopherRules(spark, docsDir(rows))
      .select("doc_id", "r_words", "r_wordlen", "r_stop", "r_dup",
        "r_alpha", "pass")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out(0L) == ((1L, 1L, 1L, 1L, 1L, 1L)))
    assert(out(1L) == ((0L, 1L, 1L, 1L, 1L, 0L)))
    assert(out(2L)._2 == 0L && out(2L)._6 == 0L)
    assert(out(3L) == ((1L, 1L, 0L, 1L, 1L, 0L)))
    assert(out(4L)._4 == 0L && out(4L)._6 == 0L)
    assert(out(5L)._5 == 0L && out(5L)._6 == 0L)
  }

  test("gopher display columns agree with the integer rule forms") {
    val out = PipelineQueries.xGopherRules(spark, dir)
      .select("mean_word_len", "r_wordlen", "dup3_frac", "r_dup",
        "alpha_frac", "r_alpha").collect()
    out.foreach { r =>
      val (mwl, rw) = (r.getDouble(0), r.getLong(1))
      // rounded display within 1e-4 of the rule boundary can disagree
      // with the exact integer form; away from it they must match
      if (mwl > 3.001 && mwl < 9.999) assert(rw == 1L)
      val (d3, rd) = (r.getDouble(2), r.getLong(3))
      if (d3 > 0.0201) assert(rd == 0L)
      if (d3 < 0.0199) assert(rd == 1L)
      val (af, ra) = (r.getDouble(4), r.getLong(5))
      if (af > 0.8001) assert(ra == 1L)
      if (af < 0.7999) assert(ra == 0L)
    }
  }

  test("dsir ranks the target language up; ranks are dense and ordered") {
    val out = PipelineQueries.xDsir(spark, dir).collect()
    assert(out.length == PipelineQueries.DSIR_TOP ||
      out.length == Tables.documents(spark, dir).count().toInt)
    // dense ranks 1..n in output order
    assert(out.map(_.getLong(3)).toSeq == (1L to out.length).toSeq)
    // weights non-increasing in rank order
    val ws = out.map(_.getDouble(2)).toSeq
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // the en target is enriched vs its corpus share
    val enSel = out.count(_.getString(1) == "en").toDouble / out.length
    val docs = Tables.documents(spark, dir)
    val enAll = docs.where(col("lang") === "en").count().toDouble /
      docs.count()
    assert(enSel > enAll,
      s"target-language share must grow under DSIR ($enSel vs $enAll)")
  }

  test("mrl recall: hit is exactly nn-agreement; neighbors never probe") {
    val out = PipelineQueries.xMrlRecall(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p, m, e, h) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(m != p && e != p, "a probe must not be its own neighbor")
      assert(h == (if (m == e) 1L else 0L))
    }
  }

  test("epoch plan: cap and deficit are consistent; budget is uniform") {
    val out = PipelineQueries.xMixEpochs(spark, dir).collect()
    assert(out.map(_.getLong(3)).distinct.length == 1,
      "uniform per-cell budget")
    out.foreach { r =>
      val (est, tgt) = (r.getLong(2), r.getLong(3))
      val (ep, cap, deficit) =
        (r.getDouble(4), r.getDouble(5), r.getLong(6))
      assert(cap <= ep + 1e-9 && cap <= PipelineQueries.MIX_MAX_EPOCHS)
      val expectDeficit =
        math.max(0L, tgt - est * PipelineQueries.MIX_MAX_EPOCHS)
      assert(deficit == expectDeficit)
      if (deficit > 0) assert(ep > PipelineQueries.MIX_MAX_EPOCHS - 1e-9)
    }
  }
}
