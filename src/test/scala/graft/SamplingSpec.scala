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

  test("chunkedOverlap: full coverage, stride starts, no redundant tail") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"),                                  // under window
      (3L, (1 to 32).map(_.toString).mkString(" ")),  // exactly window
      (4L, (1 to 33).map(_.toString).mkString(" ")))  // one past window
      .toDF("doc_id", "text")
    val out = Sampling.chunkedOverlap(docs, col("text"), 32, 24)
      .select("doc_id", "chunk", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq.groupBy(_._1)
    assert(out(2L) == Seq((2L, 0L, 0L, 3L)))
    assert(out(3L) == Seq((3L, 0L, 0L, 32L)))
    // 33 tokens: a second chunk exists (9 new tokens from start 24)
    assert(out(4L).sortBy(_._2).map(t => (t._3, t._4)) == Seq((0L, 32L), (24L, 9L)))
    // long doc: starts advance by the stride, every token is covered,
    // and no chunk exceeds the window
    val c1 = out(1L).sortBy(_._2)
    assert(c1.map(_._3) == c1.indices.map(_ * 24L))
    assert(c1.last._3 + c1.last._4 == 100L)
    assert(c1.forall(_._4 <= 32L))
    // invariant: consecutive chunks overlap by window - stride = 8
    assert(c1.sliding(2).forall {
      case Seq(a, b) => (a._3 + a._4) - b._3 == 8L || a._3 + a._4 == 100L
      case _ => true
    })
    intercept[IllegalArgumentException] {
      Sampling.chunkedOverlap(docs, col("text"), 32, 32)
    }
  }

  test("stratifiedN (salted two-phase) equals the direct per-stratum window") {
    import spark.implicits._
    // strata smaller than, equal to, and larger than n; keys spread so
    // the 64 salt shards are exercised
    val rows = (1 to 500).map(i => (s"s${i % 3}", i.toLong)) ++
      Seq(("tiny", 9999L))
    val df = rows.toDF("stratum", "key").repartition(5)
    val got = Sampling.stratifiedN(df, col("stratum"), col("key"), 7)
      .orderBy("stratum", "key").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy(Sampling.hashBucket(col("key")), col("key"))
    val want = df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 7).drop("__rn")
      .orderBy("stratum", "key").collect().toSeq
    assert(got == want)
    assert(got.groupBy(_.getString(0)).forall(_._2.size <= 7))
    assert(got.count(_.getString(0) == "tiny") == 1)
  }
}
