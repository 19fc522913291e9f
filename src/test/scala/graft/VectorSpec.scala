package graft

import graft.functions.Vectors
import graft.operators.{Knn, Multimodal}
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
                 (Array(1.0f, 1.0f, 0.0f), Array(1.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val sims = df.select(Vectors.cosine(col("a"), col("b"), 3)).as[Double].collect()
    assert(math.abs(sims(0)) < 1e-12)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
  }

  test("brute-force KNN finds the planted nearest neighbor first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.14f)),   // 1 ≈ 0
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Knn.bruteForceTopK(vecs.where(col("vec_id") === 0), vecs, 2, 1)
      .select("cand_id").as[Long].head()
    assert(top == 1L)
  }

  test("LSH buckets: identical vectors collide, opposite vectors do not") {
    val planes = Vectors.signPlanes(8, 4)
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f, -4.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Vectors.lshBucket(col("embedding"), planes, 4).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(df(0L) == df(1L))
    assert(df(0L) != df(2L), "antipodal vectors flip every sign bit")
  }

  test("multimodal stub pipeline: packetize → decode → features is deterministic") {
    val docs = Seq((1L, "abc"), (2L, "abcd")).toDF("doc_id", "text")
    val decoded = Multimodal.decode(Multimodal.packetize(docs, "image/fake"))
      .collect().map(d => d.doc_id -> d).toMap
    assert(decoded(1L).byte_len == 3L)
    assert(decoded(2L).byte_len == 4L)
    assert(decoded(1L).width >= 1 && decoded(1L).height >= 1)
    // determinism: same bytes → same checksum
    val again = Multimodal.decode(Multimodal.packetize(docs, "image/fake"))
      .collect().map(d => d.doc_id -> d.checksum).toMap
    assert(again(1L) == decoded(1L).checksum)
    val feats = Multimodal.byteFeatures(Multimodal.packetize(docs, "x"), 16)
    assert(feats.groupBy("doc_id").agg(sum("n")).as[(Long, Long)].collect().toMap
      == Map(1L -> 3L, 2L -> 4L))
  }
}
