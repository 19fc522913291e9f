package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Dataset-curation semantics the fixtures can't force: partitioning
  * independence of hash sampling, split totality, chunk coverage at
  * budget boundaries, and the empty-string tokenizer edge.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic and partitioning-independent") {
    val df = spark.range(1000).toDF("doc_id")
    val a = Sampling.samplePct(df, col("doc_id"), 10)
      .as[Long].collect().toSet
    val b = Sampling.samplePct(df.repartition(7), col("doc_id"), 10)
      .as[Long].collect().toSet
    assert(a == b, "membership must not depend on physical layout")
    // ~10% with hash-uniform slack
    assert(a.size > 50 && a.size < 200, s"expected ~100 of 1000, got ${a.size}")
    // p=0 and p=100 are the degenerate bounds
    assert(Sampling.samplePct(df, col("doc_id"), 0).count() == 0)
    assert(Sampling.samplePct(df, col("doc_id"), 100).count() == 1000)
  }

  test("split assignment is total, disjoint, and roughly proportioned") {
    val counts = spark.range(2000).toDF("doc_id")
      .select(Sampling.splitAssign(col("doc_id"), 80, 10).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000, "every key lands in exactly one split")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("train") < 1800,
      s"~80% train expected, got ${counts("train")}")
  }

  test("stratified sampling takes exactly n per stratum, small strata whole") {
    val df = spark.range(300).toDF("doc_id")
      .withColumn("stratum", when(col("doc_id") < 280, "big").otherwise("small"))
    val out = Sampling.stratifiedN(df, col("stratum"), col("doc_id"), 25)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(out == Map("big" -> 25L, "small" -> 20L), s"got $out")
    // deterministic: same members on a different layout
    val a = Sampling.stratifiedN(df, col("stratum"), col("doc_id"), 25)
      .as[(Long, String)].collect().toSet
    val b = Sampling.stratifiedN(df.repartition(13), col("stratum"), col("doc_id"), 25)
      .as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("chunking covers every token exactly once, budget boundaries exact") {
    val docs = Seq(
      (1L, "a b c d e"),   // 5 tokens, budget 2 → chunks of 2, 2, 1
      (2L, "p q"),         // exact multiple → one full chunk
      (3L, "z")            // single token → one chunk of 1
    ).toDF("doc_id", "text")
    val out = Sampling.chunked(docs, col("text"), 2)
      .orderBy("doc_id", "chunk")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 2L, "a b"), (1L, 1L, 2L, "c d"), (1L, 2L, 1L, "e"),
      (2L, 0L, 2L, "p q"),
      (3L, 0L, 1L, "z")), s"got $out")
  }

  test("empty text is ONE empty token under the whitespace tokenizer") {
    // split('', ' ') = [''] in both Spark and DuckDB — the engines agree,
    // so the oracle stays aligned if empty docs ever appear
    val out = Sampling.chunked(Seq((1L, "")).toDF("doc_id", "text"), col("text"), 4)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 0L, 1L, "")), s"got $out")
  }
}
