package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-training step of an
  * LLM data pipeline (Sennrich et al. 2016's learn_bpe, re-expressed as
  * a Spark iterative job).
  *
  * Algorithm: start from per-character symbol sequences of every
  * DISTINCT word (weighted by word frequency); each round counts
  * adjacent symbol pairs, fuses the globally most frequent pair
  * (lexicographic tie-break, so training is bit-deterministic), and
  * rewrites the sequences. The learned artifact is the ordered merge
  * table a tokenizer replays.
  *
  * Scale shape — the same discipline as [[Knn.kmeans]] and
  * [[Dedup.dupClusters]]:
  *  - the corpus is touched ONCE, to build the (word, freq) dictionary;
  *    every round after runs over the VOCABULARY, which is zipf-bounded
  *    (type/token ratio: ~10^6-10^7 types at 100 TB, not 10^12 tokens);
  *  - the per-round argmax is a partial-aggregating pair count plus a
  *    TakeOrdered(1) — the driver sees ONE (left, right) pair per
  *    round, never data (the flag-only-driver loop rule);
  *  - sequence rewriting is a narrow map over the staged vocabulary;
  *    [[Scale.stage]] breaks lineage each round (and routes through
  *    durable checkpoints under `spark.graft.checkpoint.reliable`).
  */
object Bpe {

  /** One merge applied to a symbol sequence: every non-overlapping
    * adjacent (l, r) becomes l+r, scanning left to right — the
    * reference semantics of BPE's merge step ("aaa" under (a,a) gives
    * ["aa", "a"], not ["a", "aa"]).
    */
  def applyMerge(syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` BPE merges from a (word, freq) dictionary.
    * Returns the merge table (merge_idx, left_sym, right_sym,
    * pair_freq) in training order. Stops early (fewer rows) when no
    * adjacent pair remains. `freq` must be a bigint column.
    */
  def train(words: DataFrame, nMerges: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    // the merge table is a bounded collected artifact (nMerges rows):
    // memoize it per (session, words-plan, nMerges) — the
    // kmeansTrain-codebook discipline — so a session's repeat trainings
    // over the same dictionary (x_bpe_train and x_bpe_apply, plus warm
    // bench runs) run the convergence loop once
    val learned = Scale.memoArtifact(words, s"bpe_train_$nMerges") {
      trainLoop(words, nMerges)
    }
    learned.toDF("merge_idx", "left_sym", "right_sym", "pair_freq")
  }

  private def trainLoop(words: DataFrame,
                        nMerges: Int): Seq[(Long, String, String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Seq[String], Long)] = words
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, n) => (w.map(_.toString): Seq[String], n) }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // stage each round: bounds lineage growth across the loop and
      // materializes the rewritten vocabulary exactly once
      vocab = Scale.stage(vocab.toDF("syms", "freq"))
        .as[(Seq[String], Long)]
      val top = vocab.flatMap { case (syms, n) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, n) }
        }
        .toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("cnt"))
        // TakeOrdered(1): the only driver-visible row of the round
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          merges += ((round.toLong, l, r, cnt))
          vocab = vocab.map { case (syms, n) =>
            (applyMerge(syms.toIndexedSeq, l, r): Seq[String], n)
          }
          round += 1
      }
    }
    merges.result()
  }

  /** Tokenizer APPLY — the serving half of the lifecycle [[train]]
    * learns for: replay the ordered merge table over every word of a
    * (word, freq) dictionary, emitting (word, tokens, freq).
    *
    * Scale shape: the merge table is the learned artifact — vocabulary-
    * sized (32k-100k entries for real tokenizers), so it rides an
    * explicit `sparkContext.broadcast` while the map itself is a narrow
    * per-row pass over the DISTINCT-word dictionary; the corpus is
    * never re-touched (token counts weight by `freq`). Replay order is
    * `merge_idx` ascending — BPE apply is order-sensitive by
    * definition.
    */
  def tokenize(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    words
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, n) =>
        var syms: IndexedSeq[String] = w.map(_.toString)
        bc.value.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        (w, syms: Seq[String], n)
      }
      .toDF("word", "tokens", "freq")
  }
}
