package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset-curation operators for training pipelines:
  * portable hash sampling, train/val/test split assignment, and
  * context-window chunking.
  *
  * Scale shape: every operator here is per-row and narrow — no shuffle,
  * no state, co-located with the scan. The md5-derived bucket is
  * identical across engines, partition counts, and cluster sizes, so a
  * "10% sample" or a split assignment is REPRODUCIBLE: re-running on a
  * 1000-executor cluster yields byte-identical membership, unlike
  * `df.sample()` whose membership depends on partitioning and seed
  * plumbing.
  */
object Sampling {

  /** First 4 hex chars of md5(key) as an integer 0..65535 —
    * engine-portable (DuckDB computes the same value from the same hex),
    * uniform, and independent of physical layout.
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Hash percentile 0..99 of a key — the sampling/splitting primitive. */
  def pct(key: Column): Column = hashBucket(key) % 100

  /** Deterministic p% sample: membership is a pure function of the key. */
  def samplePct(df: DataFrame, key: Column, p: Int): DataFrame =
    df.where(pct(key) < p)

  /** train/val/test assignment by hash percentile: [0, trainPct) →
    * train, [trainPct, trainPct+valPct) → val, rest → test. Stable under
    * data growth: a document keeps its split forever, so no test-set
    * leakage when the corpus is re-ingested or extended.
    */
  def splitAssign(key: Column, trainPct: Int, valPct: Int): Column = {
    val p = pct(key)
    when(p < trainPct, "train")
      .when(p < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Stratified deterministic sampling: exactly `n` rows per stratum
    * (fewer if the stratum is smaller), chosen by hash order so the
    * selection is reproducible and unbiased within each stratum — the
    * balanced-corpus builder (e.g. N docs per language). Two-phase
    * SALTED top-k ([[Scale.saltedTopKPerKey]]): strata are
    * low-cardinality by nature, so the direct
    * `row_number() OVER (PARTITION BY stratum)` would sort each
    * stratum's whole corpus share in one task forever (the q_ntile
    * disease — PlanGuardSpec rejects the shape); the salted form
    * spreads each stratum over 64 shard sorts and re-ranks only the
    * ≤ 64·n survivors. Result rows are identical to the direct window.
    */
  def stratifiedN(df: DataFrame, stratum: Column, key: Column, n: Int): DataFrame =
    Scale.saltedTopKPerKey(df, stratum, Seq(hashBucket(key), key), n,
      salts = 64, tiebreak = key)

  /** Fixed-budget context-window chunking: each document's token stream
    * is cut into ⌈n/budget⌉ contiguous chunks of ≤ `budget` tokens.
    * Output: (doc_id, chunk, n_tok, chunk_text), one row per chunk.
    * Zero-token documents produce no chunks.
    *
    * Per-row explode — fan-out bounded by document length, no shuffle;
    * the downstream training loader groups by chunk size if it packs.
    */
  def chunked(docs: DataFrame, text: Column, budget: Int): DataFrame = {
    val b = lit(budget)
    docs
      .select(col("doc_id"), Text.tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .where(col("__n") > 0)
      .select(col("doc_id"), col("__toks"), col("__n"),
        explode(sequence(lit(0),
          (floor((col("__n") + budget - 1) / b)).cast("int") - 1)).as("chunk"))
      .select(col("doc_id"),
        col("chunk").cast("bigint").as("chunk"),
        least(b, col("__n") - col("chunk") * b).cast("bigint").as("n_tok"),
        concat_ws(" ", slice(col("__toks"), col("chunk") * b + 1, b)).as("chunk_text"))
  }

  /** OVERLAPPING context windows — [[chunked]] with a stride smaller
    * than the budget (the standard retrieval/pretraining chunker:
    * window w, stride s < w, consecutive chunks share w−s tokens so no
    * boundary context is ever lost). Chunk i covers tokens
    * [i·s, i·s + w); the last chunk starts at the last stride position
    * that still adds NEW tokens (start < n − (w − s), plus chunk 0),
    * so every token is covered and no fully-redundant tail chunk is
    * emitted. Same per-row explode shape as [[chunked]] — fan-out
    * n/s per doc, no shuffle.
    */
  def chunkedOverlap(docs: DataFrame, text: Column, window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && stride < window,
      s"chunkedOverlap: need 1 <= stride < window, got stride=$stride window=$window")
    val w = lit(window)
    val s = lit(stride)
    // number of chunks: 1 + ceil(max(0, n - window) / stride)
    val nChunks = lit(1) +
      ceil(greatest(col("__n") - w, lit(0)).cast("double") / s).cast("int")
    docs
      .select(col("doc_id"), Text.tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .where(col("__n") > 0)
      .select(col("doc_id"), col("__toks"), col("__n"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk"))
      .select(col("doc_id"),
        col("chunk").cast("bigint").as("chunk"),
        (col("chunk") * s).cast("bigint").as("start_tok"),
        least(w, col("__n") - col("chunk") * s).cast("bigint").as("n_tok"),
        concat_ws(" ", slice(col("__toks"), col("chunk") * s + 1, w)).as("chunk_text"))
  }
}
