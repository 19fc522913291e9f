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

  test("multimodal resize preserves aspect ratio within the bounding box") {
    val docs = Seq((1L, "x" * 5000)).toDF("doc_id", "text")
    val decoded = Multimodal.decode(Multimodal.packetize(docs, "image/fake"))
    val r = Multimodal.resize(decoded, 100, 100).collect().head
    val d = decoded.collect().head
    assert(r.width <= 100 && r.height <= 100)
    assert(r.width >= 1 && r.height >= 1)
    // aspect ratio preserved to integer rounding
    assert(math.abs(r.width.toDouble / r.height - d.width.toDouble / d.height) < 0.2)
  }

  test("multimodal frame sampling: every stride-th fixed-size chunk, indexed") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")  // 10 bytes
    val frames = Multimodal.frameSample(Multimodal.packetize(docs, "video/fake"),
        frameBytes = 2, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4), "frames 0,2,4 of 5")
    assert(frames.forall(_.frame_bytes.length == 2))
    assert(new String(frames.head.frame_bytes) == "ab")
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
