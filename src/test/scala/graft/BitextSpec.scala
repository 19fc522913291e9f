package graft

import graft.operators.Knn
import org.apache.spark.sql.functions._

/** Margin-based bitext mining ([[Knn.bitextMine]]): the margin must
  * demote a target-space HUB (uniformly close to every source vector)
  * below a genuine mutual-nearest pair — the exact failure mode raw
  * cosine retrieval has and the reason the margin criterion exists.
  */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private val DIM = 4
  private def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")

  test("hub target is margin-demoted below a genuine mutual pair") {
    val src = df(Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),         // has a true translation y1
      (2L, Seq(0f, 1f, 0f, 0f)),         // its best raw-cosine target is the hub
      (3L, Seq(0.9f, 0.1f, 0f, 0f))))
    val h = 0.5f
    val tgt = df(Seq(
      (11L, Seq(0.95f, 0.05f, 0f, 0f)),  // y1: mutual NN of src 1
      (12L, Seq(h, h, h, h))))           // hub: cos 0.5 with every basis vector
    val out = Knn.bitextMine(src, src, tgt, DIM, k = 2, q = 1L << 40, tau = 2.0)
      .select("src_id", "tgt_id", "sim", "margin")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val (_, t1, s1, m1) = out(1L)
    val (_, t2, s2, m2) = out(2L)
    assert(t1 == 11L, "src 1 must pair with its true translation")
    assert(t2 == 12L && s2 > 0.4,
      s"src 2's best RAW target is the hub with high cosine ($s2)")
    assert(m1 > m2,
      s"the margin must rank the mutual pair above the hub pair ($m1 vs $m2)")
    // a tau between the two margins separates them: the hub pair is
    // rejected, the genuine pair accepted
    val tau = (m1 + m2) / 2
    val flags = Knn.bitextMine(src, src, tgt, DIM, k = 2, q = 1L << 40, tau = tau)
      .select("src_id", "accept").as[(Long, Long)].collect().toMap
    assert(flags(1L) == 1L && flags(2L) == 0L, flags.toString)
  }
}
