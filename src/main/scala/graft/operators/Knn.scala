package graft.operators

import graft.expressions.FloatDot
import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Two tiers, mirroring what survives at scale:
  *  - [[bruteForceTopK]]: probe × candidate broadcast cross join — exact,
  *    O(|probe|·|candidates|); correct baseline, bounded probe set.
  *  - [[lshTopK]]: sign-LSH bucket equi-join — each vector hashes to one
  *    bucket key, the join only pairs same-bucket vectors. At 100 TB the
  *    bucket count scales with data while per-bucket work stays local;
  *    recall is tunable via plane count (here 8 planes → 256 buckets).
  */
object Knn {

  /** Exact top-k cosine neighbors for each probe vector. `candidates`
    * should be the smaller / broadcastable side at scale.
    */
  def bruteForceTopK(probes: DataFrame, candidates: DataFrame, dim: Int, k: Int): DataFrame = {
    FloatDot.register(probes.sparkSession)
    // norms once per row, not once per pair — the pair loop then does a
    // single codegen'd primitive dot and one division
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
      Vectors.norm(col("embedding"), dim).as("pn"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
      Vectors.norm(col("embedding"), dim).as("cn"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    p.join(broadcast(c), col("probe_id") =!= col("cand_id"))
      .withColumn("sim", expr("graft_dot(pe, ce)") / (col("pn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("probe_id", "cand_id", "rank", "sim")
  }

  /** Sign-LSH top-1 neighbor within the probe's bucket. Vectors alone in
    * their bucket get no row (inner join) — the recall/cost trade of LSH.
    */
  def lshTopK(vectors: DataFrame, planes: Seq[Seq[Double]], dim: Int, k: Int): DataFrame = {
    FloatDot.register(vectors.sparkSession)
    val bucketed = vectors.select(col("vec_id"), col("embedding"),
      Vectors.lshBucket(col("embedding"), planes, dim).as("bucket"),
      Vectors.norm(col("embedding"), dim).as("nrm"))
    val a = bucketed.select(col("bucket"), col("vec_id").as("probe_id"),
      col("embedding").as("pe"), col("nrm").as("pn"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cand_id"))
    a.join(b, Seq("bucket"))
      .where(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", expr("graft_dot(pe, ce)") / (col("pn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("probe_id", "cand_id", "rank", "sim")
  }
}
